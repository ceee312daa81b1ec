"""Headline benchmark: particle-steps/sec/chip on the flagship config.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline target (BASELINE.md): >1e8 particle-steps/sec/chip at N=10M on a
v5p chip; ``vs_baseline`` is measured/1e8. This harness runs the driven
isothermal turbulence box (BASELINE.json:11) through the Pallas sorted-window
engine (the production single-chip path): fused Newton-h/density, Balsara,
and force kernels, window rebuild every 2 steps, whole run one lax.scan.
"""
from __future__ import annotations

import dataclasses
import json
import time

BASELINE_PSS = 1.0e8


def main():
    import jax
    import jax.numpy as jnp

    import sphax
    from sphax.ics import turbulence
    from sphax.neighbors import window as win
    from sphax.physics import wengine

    import os

    # env knobs for A/B perf experiments (defaults = recorded production
    # config; BASELINE.md documents measured variants)
    n_side = int(os.environ.get("BENCH_NSIDE", 100))  # N = n_side^3
    steps = int(os.environ.get("BENCH_STEPS", 16))
    rebuild_every = int(os.environ.get("BENCH_REBUILD", 2))
    cutoff_scale = float(os.environ.get("BENCH_CUTOFF_SCALE", 1.05))
    h_margin = float(os.environ.get("BENCH_HMARGIN", 1.05))
    fast_sub = int(os.environ.get("BENCH_FAST_SUB", 3))
    rgroups = int(os.environ.get("BENCH_RGROUPS", 2))
    # candidate compaction (round 4): walk build-time-compacted per-group
    # candidate lists instead of the in-place sorted windows
    compact = bool(int(os.environ.get("BENCH_COMPACT", 0)))
    # drift-gated rebuilds (round 4): cap K steps of staleness, rebuild on
    # the measured Verlet-skin gate instead of a fixed worst-case cadence
    # (same physics to summation-order roundoff; BENCH_REBUILD is ignored)
    adaptive = int(os.environ.get("BENCH_ADAPTIVE", 0))

    ic = turbulence.build(n_side=n_side)
    # production settings: h warm-starts from the previous step (one Newton
    # iteration keeps the consistency residual ~4e-4; physics configs keep
    # 6 iters for cold solves) and fast_math approximates the two per-pair
    # reciprocals in the viscosity term (~1e-3 rel error on an O(1)-
    # calibrated dissipation term; parity suites run with it off)
    h_pred = bool(int(os.environ.get("BENCH_HPRED", 1)))
    cfg = dataclasses.replace(sphax.configs.TURB, newton_iters=1,
                              fast_math=True, h_predict=h_pred)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    dom = sphax.box(jnp.zeros(3, jnp.float32), f32(ic["box"]))
    st = sphax.make_state(*(f32(ic[k]) for k in
                            ("pos", "vel", "mass", "u", "h")))
    # dynamically representative: seeded velocity field
    st = st._replace(vel=0.3 * jax.random.normal(jax.random.PRNGKey(0),
                                                 st.vel.shape, jnp.float32))
    plan = win.plan_compact if compact else win.plan_measured
    spec = plan(st.pos, dom, h_max=float(st.h.max()) * h_margin,
                dim=3, cutoff_scale=cutoff_scale,
                ghost_safety=1.4, fast_sub=fast_sub,
                rgroups=rgroups)
    st = wengine.update_derived(st, cfg, dom, spec, use_pallas=True)

    run = lambda s: wengine.simulate(s, cfg, dom, spec, steps,
                                     rebuild_every=rebuild_every,
                                     use_pallas=True,
                                     adaptive_rebuild=adaptive)
    st2, _, dts, ovf = run(st)  # compile + warm
    jax.block_until_ready(st2.pos)

    # median of 3 timed reps; guard against async-timing anomalies
    walls = []
    for _ in range(3):
        t0 = time.time()
        st2, _, dts, ovf = run(st2)
        jax.block_until_ready(st2.pos)
        walls.append(time.time() - t0)
    walls = [w for w in sorted(walls) if w > 0.05] or sorted(walls)
    wall = walls[len(walls) // 2]

    assert bool(jnp.isfinite(st2.rho).all()), "non-finite state in bench"
    assert bool(jnp.all(dts > 0)), "non-positive dt in bench"
    assert int(ovf) == 0, f"window structure overflow in bench: {int(ovf)}"
    h_residual = float(jnp.max(
        jnp.abs(st2.rho - st2.mass * (cfg.eta / st2.h) ** 3) / st2.rho))
    assert h_residual < 5e-3, f"h not converged: {h_residual}"
    pss = st.n * steps / wall
    print(json.dumps({
        "metric": "particle_steps_per_sec_per_chip",
        "value": round(pss, 1),
        "unit": "particle-steps/s/chip",
        "vs_baseline": round(pss / BASELINE_PSS, 6),
        "n_particles": st.n,
        "steps": steps,
        "wall_s": round(wall, 3),
        "engine": "pallas-window",
        "wseg": spec.wseg,
        "h_residual": round(h_residual, 8),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
