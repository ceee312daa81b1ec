"""Mesh-stage timing: scatter CIC (pm) vs sorted brick-matmul CIC
(pm_sorted) at bench scale (N=1e6, M=128), plus the full mesh_accel pair.

Run on the TPU from the repo root: python benchmarks/bench_mesh.py
"""
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
from sphax.physics import pm, pm_sorted


def timeit(f, *a, reps=5):
    out = f(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = f(*a)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return float(np.median(ts)), out


def main():
    n_side = int(os.environ.get("BENCH_NSIDE", 100))
    M = int(os.environ.get("BENCH_MESH", 128))
    ic = turbulence.build(n_side=n_side)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    dom = sphax.box(jnp.zeros(3, jnp.float32), f32(ic["box"]))
    pos, mass = f32(ic["pos"]), f32(ic["mass"])
    cfg = sphax.SPHConfig(dim=3, gravity=True, grav_solver="p3m", G=1.0,
                          grav_mesh=M)
    spec = win.plan_measured(pos, dom, h_max=float(ic["h"].max()) * 1.05,
                             dim=3, cutoff_scale=1.05, ghost_safety=1.4,
                             fast_sub=3, rgroups=2)
    wd = jax.jit(lambda p: win.build(p, dom, spec))(pos)
    plan = pm_sorted.plan_mesh(spec, M)
    print(f"N={pos.shape[0]:.3g} M={M} plan={plan} n_prog="
          f"{-(-spec.n_sorted // plan.G)}")
    mass_s = win.gather_sorted(mass, wd)
    w = jnp.where(wd.is_real, mass_s, 0.0)
    n_fb, drop = pm_sorted.fallback_stats(wd.pos_s, w > 0, dom, M, True,
                                          plan)
    print(f"fallback rows: {int(n_fb)} ({int(n_fb)/pos.shape[0]:.2%}), "
          f"dropped {int(drop)}")

    lo, cell = dom.lo, dom.extent / M
    dep_old = jax.jit(lambda p, m: pm._deposit(dom.wrap(p), m, lo, cell, M,
                                               True))
    dep_new = jax.jit(lambda p, m: pm_sorted.deposit_sorted(p, m, dom, M,
                                                            True, plan))
    t_old, g_old = timeit(dep_old, pos, mass)
    t_new, (g_new, d) = timeit(dep_new, wd.pos_s, w)
    err = float(jnp.abs(g_new - g_old).max() / jnp.abs(g_old).max())
    print(f"deposit: scatter {t_old*1e3:7.1f} ms | sorted {t_new*1e3:7.1f} "
          f"ms ({t_old/t_new:.1f}x)  rel err {err:.2e} dropped {int(d)}")

    rng = np.random.default_rng(0)
    grids = f32(rng.standard_normal((3, M, M, M)))
    itp_old = jax.jit(lambda p: pm._interp(list(grids), dom.wrap(p), lo,
                                           cell, M, True))
    itp_new = jax.jit(lambda p: pm_sorted.interp_sorted(grids, p,
                                                        wd.is_real, dom, M,
                                                        True, plan))
    t_old, a_old = timeit(itp_old, pos)
    t_new, (a_new, d) = timeit(itp_new, wd.pos_s)
    err = float(jnp.abs(a_new[wd.inv] - a_old).max() / jnp.abs(a_old).max())
    print(f"interp:  gather  {t_old*1e3:7.1f} ms | sorted {t_new*1e3:7.1f} "
          f"ms ({t_old/t_new:.1f}x)  rel err {err:.2e} dropped {int(d)}")

    full_old = jax.jit(lambda p, m: pm.mesh_accel(p, m, cfg, dom))
    full_new = jax.jit(lambda p, m: pm.mesh_accel_sorted(p, m, wd.is_real,
                                                         cfg, dom, plan))
    t_old, _ = timeit(full_old, pos, mass)
    t_new, _ = timeit(full_new, wd.pos_s, mass_s)
    print(f"mesh_accel: old {t_old*1e3:7.1f} ms | sorted {t_new*1e3:7.1f} "
          f"ms ({t_old/t_new:.1f}x)")


if __name__ == "__main__":
    main()
