"""Break down win.build cost at bench scale."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sphax
from sphax.ics import turbulence
from sphax.neighbors import window as win


def timeit(f, *a, reps=5, **kw):
    out = f(*a, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*a, **kw)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    ic = turbulence.build(n_side=n_side)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    dom = sphax.box(jnp.zeros(3, jnp.float32), f32(ic["box"]))
    st = sphax.make_state(*(f32(ic[k]) for k in ("pos", "vel", "mass", "u", "h")))
    spec = win.plan_measured(st.pos, dom, h_max=float(st.h.max()) * 1.15,
                             dim=3, cutoff_scale=1.2, ghost_safety=1.4)
    pos = st.pos
    n, dim = pos.shape
    dtype = pos.dtype
    lo = dom.lo.astype(dtype)
    ext = dom.extent.astype(dtype)
    res = jnp.asarray(spec.res, dtype)
    cell = ext / res

    # ghosts stage — the per-axis two-face pass build() actually performs
    # (each pass images BOTH faces of the ACCUMULATED array, so edge/corner
    # images arise as ghosts-of-ghosts; see win.build)
    def ghosts(pos):
        idx = jnp.arange(n, dtype=jnp.int32)
        cut = jnp.asarray(spec.cutoff, dtype)
        cur_pos, cur_orig = pos, idx
        for d in range(dim):
            cap = spec.ghost_caps[d]
            if cap == 0:
                continue
            nc = cur_pos.shape[0]
            rows_c = jnp.arange(nc, dtype=jnp.int32)
            off = jnp.zeros((dim,), dtype).at[d].set(ext[d])
            new_pos, new_orig = [], []
            for sgn, m in ((1.0, cur_pos[:, d] < lo[d] + cut),
                           (-1.0, cur_pos[:, d] > lo[d] + ext[d] - cut)):
                m = m & (cur_orig < n)
                take, _ = win._pack_offset(m, rows_c, cap, nc)
                tk = jnp.minimum(take, nc - 1)
                new_pos.append(cur_pos[tk] + sgn * off)
                new_orig.append(jnp.where(take >= nc, n, cur_orig[tk]))
            cur_pos = jnp.concatenate([cur_pos] + new_pos)
            cur_orig = jnp.concatenate([cur_orig] + new_orig)
        return cur_orig

    t, orig = timeit(jax.jit(ghosts), pos)
    n_pass = len([c for c in spec.ghost_caps if c])
    print(f"ghost packing ({n_pass} axis passes): {t*1e3:8.2f} ms")

    n_raw = orig.shape[0]
    print("n_raw", n_raw, "n_sorted", spec.n_sorted)

    # key + sort stage
    key = jax.random.randint(jax.random.PRNGKey(0), (spec.n_sorted,), 0,
                             2**28, jnp.int32)
    t, order = timeit(jax.jit(jnp.argsort), key)
    print(f"argsort int32 {spec.n_sorted}: {t*1e3:8.2f} ms")

    t, _ = timeit(jax.jit(lambda k, o: k[o]), key, order)
    print(f"one int32 gather:    {t*1e3:8.2f} ms")

    # sort with values instead
    t, _ = timeit(jax.jit(lambda k: jax.lax.sort_key_val(k, jnp.arange(
        spec.n_sorted, dtype=jnp.int32))), key)
    print(f"sort_key_val:        {t*1e3:8.2f} ms")

    res_ext = tuple(r + 2 for r in spec.res)
    ncells_ext = int(np.prod(res_ext))

    def starts(key_s):
        rows = jnp.arange(spec.n_sorted, dtype=jnp.int32)
        first = jnp.full((ncells_ext + 1,), spec.n_sorted, jnp.int32)
        first = first.at[jnp.minimum(key_s, ncells_ext)].min(
            jnp.where(key_s < ncells_ext, rows, spec.n_sorted), mode="drop")
        return jax.lax.associative_scan(jnp.minimum, first, reverse=True)

    t, _ = timeit(jax.jit(starts), key)
    print(f"cell-start table:    {t*1e3:8.2f} ms")

    full = jax.jit(lambda p: win.build(p, dom, spec))
    t, wd = timeit(full, pos)
    print(f"FULL build:          {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
