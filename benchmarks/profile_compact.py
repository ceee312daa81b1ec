"""Stage profile of the compact candidate walk at the bench config.

Decomposes the round-4 compaction attack's measured 3x LOSS (bench
BENCH_COMPACT=1: 1.97e6 vs 5.89e6 pss): gather cost vs transpose cost vs
the actual compact-walk kernel time vs the production block walk.

Usage: python benchmarks/profile_compact.py [n_side] [rgroups]
"""
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
from sphax.physics import pallas_kernels as pk


def timed(fn, *a, reps=5):
    out = fn(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rgroups = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    ic = turbulence.build(n_side=n_side)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    dom = sphax.box(jnp.zeros(3, jnp.float32), f32(ic["box"]))
    pos = f32(ic["pos"])
    vel = 0.3 * jax.random.normal(jax.random.PRNGKey(0), pos.shape,
                                  jnp.float32)
    mass = f32(ic["mass"])
    h0 = f32(ic["h"])
    h_max = float(jnp.max(h0)) * 1.05
    cfg = dataclasses.replace(sphax.configs.TURB, newton_iters=1,
                              fast_math=True, h_predict=True)

    spec = win.plan_compact(pos, dom, h_max=h_max, dim=3, cutoff_scale=1.05,
                            ghost_safety=1.4, fast_sub=3, rgroups=rgroups)
    base = dataclasses.replace(spec, cwidth=0)
    print(f"cwidth={spec.cwidth} wseg={spec.wseg}")

    build = jax.jit(win.build, static_argnums=2)
    t, wd = timed(build, pos, dom, spec)
    t0, wd0 = timed(build, pos, dom, base)
    nG, C = wd.c_idx.shape
    M = nG * C
    print(f"build: compact {t*1e3:.1f} ms  baseline {t0*1e3:.1f} ms  "
          f"M={M/1e6:.1f}M rows (x{M/spec.n_sorted:.1f} dup)")

    pos_s = win.refresh_pos(pos, wd)
    mass_s = win.gather_sorted(mass, wd)
    h_s = win.gather_sorted(h0, wd, fill=1.0)
    vel_s = win.gather_sorted(vel, wd)
    cols = jnp.stack([pos_s[:, 0], pos_s[:, 1], pos_s[:, 2], mass_s,
                      vel_s[:, 0], vel_s[:, 1], vel_s[:, 2]], axis=-1)

    t, gath = timed(jax.jit(lambda c: win.gather_cands(c, wd, 3)), cols)
    print(f"gather_cands 7-field: {t*1e3:.1f} ms "
          f"({M * 7 * 4 / t / 1e9:.0f} GB/s eff)")
    tT, _ = timed(jax.jit(lambda g: jnp.zeros((8, 1, M), jnp.float32)
                          .at[:7, 0, :].set(g.T)), gath)
    print(f"transpose+pack:       {tT*1e3:.1f} ms")

    walkA = jax.jit(lambda w, p, m, h, v: pk.solve_h_density(
        w, spec, p, m, h, cfg, vel_s=v))
    walkA0 = jax.jit(lambda w, p, m, h, v: pk.solve_h_density(
        w, base, p, m, h, cfg, vel_s=v))
    t, _ = timed(walkA, wd, pos_s, mass_s, h_s, vel_s)
    t0, _ = timed(walkA0, wd0, pos_s, mass_s, h_s, vel_s)
    print(f"kernel A end-to-end: compact {t*1e3:.1f} ms  "
          f"block-walk {t0*1e3:.1f} ms")


if __name__ == "__main__":
    main()
