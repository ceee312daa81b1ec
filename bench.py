"""Headline benchmark: particle-steps/sec/chip on the flagship config.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline target (BASELINE.md): >1e8 particle-steps/sec/chip at N=10M on a
v5p chip; ``vs_baseline`` is measured/1e8. This harness runs the driven
isothermal turbulence box (BASELINE.json:11) through the fastest available
single-chip engine at the largest N that fits comfortably, fp32.
"""
from __future__ import annotations

import json
import time

BASELINE_PSS = 1.0e8


def main():
    import jax
    import jax.numpy as jnp

    import sphax
    from sphax.ics import turbulence
    from sphax.neighbors.cell_list import choose_grid
    from sphax.physics import clist
    from sphax.run import simulate

    n_side = 48  # N = 110,592
    steps = 20

    ic = turbulence.build(n_side=n_side)
    cfg = sphax.configs.TURB
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    dom = sphax.box(jnp.zeros(3, jnp.float32), f32(ic["box"]))
    st = sphax.make_state(*(f32(ic[k]) for k in
                            ("pos", "vel", "mass", "u", "h")))
    grid = choose_grid(dom, h_max=float(st.h.max()), n=st.n)
    engine = lambda s: clist.update_derived(s, cfg, dom, grid)
    st = engine(st)
    # seed a velocity field so the run is dynamically representative
    key = jax.random.PRNGKey(0)
    st = st._replace(vel=0.3 * jax.random.normal(key, st.vel.shape,
                                                 st.vel.dtype))

    # warm-up / compile
    st2, _, dts = simulate(st, cfg, dom, engine, 2)
    jax.block_until_ready(st2.pos)

    t0 = time.time()
    st2, _, dts = simulate(st2, cfg, dom, engine, steps)
    jax.block_until_ready(st2.pos)
    wall = time.time() - t0

    assert bool(jnp.isfinite(st2.rho).all()), "non-finite state in bench"
    pss = st.n * steps / wall
    print(json.dumps({
        "metric": "particle_steps_per_sec_per_chip",
        "value": round(pss, 1),
        "unit": "particle-steps/s/chip",
        "vs_baseline": round(pss / BASELINE_PSS, 6),
        "n_particles": st.n,
        "steps": steps,
        "wall_s": round(wall, 3),
        "engine": "clist-jnp",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
