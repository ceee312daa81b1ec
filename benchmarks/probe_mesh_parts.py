"""Variant timing of the pm_sorted deposit scan body (what dominates?)."""
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
from sphax.physics import pm_sorted


def timeit(f, *a, reps=5):
    out = jax.block_until_ready(f(*a))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(f(*a))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    M = 128
    ic = turbulence.build(n_side=100)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    dom = sphax.box(jnp.zeros(3, jnp.float32), f32(ic["box"]))
    pos, mass = f32(ic["pos"]), f32(ic["mass"])
    spec = win.plan_measured(pos, dom, h_max=float(ic["h"].max()) * 1.05,
                             dim=3, cutoff_scale=1.05, ghost_safety=1.4,
                             fast_sub=3, rgroups=2)
    wd = jax.jit(lambda p: win.build(p, dom, spec))(pos)
    plan = pm_sorted.plan_mesh(spec, M)
    w = jnp.where(wd.is_real, win.gather_sorted(mass, wd), 0.0)
    Bx, By, G = plan.Bx, plan.By, plan.G
    geo = pm_sorted._geometry(wd.pos_s, w > 0, dom, M, True, plan)
    Ns = wd.pos_s.shape[0]
    wv = jnp.where(geo["valid"],
                   jnp.pad(w, (0, geo["npr"] * G - Ns)).reshape(
                       geo["npr"], G), 0.0)
    i0p, fp = geo["i0p"], geo["fp"]
    xs = (geo["xl"], geo["yl"], i0p[:, :, 2], fp[:, :, 0], fp[:, :, 1],
          fp[:, :, 2], wv, geo["ox"], geo["oy"])
    print(f"plan {plan} n_prog {geo['npr']}")

    def mk(variant, prec):
        def body(grid, x):
            xl_g, yl_g, iz, fx, fy, fz, wg, oxg, oyg = x
            z0 = jnp.zeros((), jnp.int32)
            if variant == "noW":
                W = jnp.full((Bx * By, G), 1e-9, jnp.float32)
            else:
                W = pm_sorted._onehot_xy(xl_g, yl_g, fx, fy, Bx, By,
                                         jnp.float32)
            Z = pm_sorted._onehot_z(iz, fz, M, True, (1.0 - fz) * wg,
                                    fz * wg, jnp.float32)
            if variant == "nomm":
                brick = (jnp.sum(W, axis=1, keepdims=True)
                         + jnp.sum(Z, axis=0, keepdims=True))
            else:
                brick = jax.lax.dot(W, Z, precision=prec)
            if variant == "nodus":
                return grid, jnp.sum(brick)
            reg = jax.lax.dynamic_slice(grid, (oxg, oyg, z0), (Bx, By, M))
            return jax.lax.dynamic_update_slice(
                grid, reg + brick.reshape(Bx, By, M), (oxg, oyg, z0)), None

        @jax.jit
        def run(xs):
            g0 = jnp.zeros((M + Bx, M + By, M), jnp.float32)
            g, _ = jax.lax.scan(body, g0, xs)
            return g

        return run

    HI = jax.lax.Precision.HIGHEST
    for name, variant, prec in [("full-HI", "full", HI),
                                ("full-DEF", "full", None),
                                ("no-onehot", "noW", HI),
                                ("no-matmul", "nomm", HI),
                                ("no-dus", "nodus", HI)]:
        t = timeit(mk(variant, prec), xs)
        print(f"{name:10s} {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
