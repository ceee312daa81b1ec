"""Time the individual pieces of one window-engine step at bench scale."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import sphax
from sphax.ics import turbulence
from sphax.neighbors import window as win
from sphax.physics import wengine, pallas_kernels as pk


def timeit(f, *a, reps=5, **kw):
    out = f(*a, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*a, **kw)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def main():
    n_side = 100
    ic = turbulence.build(n_side=n_side)
    cfg = dataclasses.replace(sphax.configs.TURB, newton_iters=1)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    dom = sphax.box(jnp.zeros(3, jnp.float32), f32(ic["box"]))
    st = sphax.make_state(*(f32(ic[k]) for k in ("pos", "vel", "mass", "u", "h")))
    st = st._replace(vel=0.3 * jax.random.normal(jax.random.PRNGKey(0),
                                                 st.vel.shape, jnp.float32))
    cutoff_scale = float(os.environ.get("BENCH_CUTOFF_SCALE", 1.05))
    h_margin = float(os.environ.get("BENCH_HMARGIN", 1.05))
    fast_sub = int(os.environ.get("BENCH_FAST_SUB", 3))
    rgroups = int(os.environ.get("BENCH_RGROUPS", 2))
    spec = win.plan_measured(st.pos, dom, h_max=float(st.h.max()) * h_margin,
                             dim=3, cutoff_scale=cutoff_scale,
                             ghost_safety=1.4, fast_sub=fast_sub,
                             rgroups=rgroups)
    print("spec: wseg", spec.wseg, "n_tiles", spec.n_tiles, "n_sorted",
          spec.n_sorted, "res", spec.res)
    st = wengine.update_derived(st, cfg, dom, spec, use_pallas=True)

    build = jax.jit(lambda p: win.build(p, dom, spec))
    t_build, wd = timeit(build, st.pos)
    print(f"window build:        {t_build*1e3:8.2f} ms")
    import numpy as np
    na = np.asarray(wd.w_nact)
    print(f"w_nact: mean {na.mean():.2f} of {spec.wseg//128} blocks "
          f"(p50 {np.percentile(na,50):.0f}, p95 {np.percentile(na,95):.0f}, "
          f"max {na.max()}) -> active cand/row "
          f"{na.mean()*128*spec.n_seg:.0f}")

    pos_s = win.refresh_pos(st.pos, wd)
    vel_s = win.gather_sorted(st.vel, wd)
    mass_s = win.gather_sorted(st.mass, wd)
    u_s = win.gather_sorted(st.u, wd)
    h_s = win.gather_sorted(st.h, wd, fill=1.0)

    gath = jax.jit(lambda: (win.refresh_pos(st.pos, wd),
                            win.gather_sorted(st.vel, wd),
                            win.gather_sorted(st.mass, wd),
                            win.gather_sorted(st.u, wd),
                            win.gather_sorted(st.h, wd, fill=1.0)))
    t_g, _ = timeit(gath)
    print(f"sorted gathers:      {t_g*1e3:8.2f} ms")

    kA = jax.jit(lambda: pk.solve_h_density(wd, spec, pos_s, mass_s, h_s, cfg,
                                            vel_s=vel_s, u_s=u_s))
    t_a, outs = timeit(kA)
    print(f"kernel A (+balsara): {t_a*1e3:8.2f} ms")
    h2, rho_s, drdh, div_s, curl_s = outs

    from sphax.physics.eos import eos
    from sphax.physics import pairs
    rho_s = jnp.maximum(rho_s, 1e-15)
    om_s = 1.0 + h2 / (3 * rho_s) * drdh
    P_s, cs_s = eos(rho_s, u_s, cfg)
    bf_s = pairs.balsara_factor(-div_s / rho_s, curl_s / rho_s, cs_s, h2)

    kC = jax.jit(lambda: pk.forces(wd, spec, pos_s, vel_s, mass_s, h2, rho_s,
                                   P_s, cs_s, om_s, bf_s, cfg))
    t_c, _ = timeit(kC)
    print(f"kernel C (forces):   {t_c*1e3:8.2f} ms")

    full = jax.jit(lambda s: wengine.update_derived(s, cfg, dom, spec,
                                                    use_pallas=True))
    t_f, _ = timeit(full, st)
    print(f"full derived step:   {t_f*1e3:8.2f} ms")
    n = st.n
    print(f"-> per-step pss at rebuild_every=4: "
          f"{n / (t_f + t_build / 4):,.0f}")


if __name__ == "__main__":
    main()
