"""Throughput sweep over N for the production engine (SURVEY.md §4.2.6).

Writes one JSON line per size to stdout and benchmarks/sweep_results.jsonl;
compare runs across commits to catch perf regressions vs BASELINE.md.

    python benchmarks/sweep.py            # default sizes
    python benchmarks/sweep.py 32 64 100  # custom n_side list
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

# repo root on sys.path when invoked as `python benchmarks/sweep.py` (the
# axon TPU plugin forbids PYTHONOPATH overrides on this machine)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_one(n_side: int, steps: int = 16, rebuild_every: int = 2) -> dict:
    import jax
    import jax.numpy as jnp

    import sphax
    from sphax.ics import turbulence
    from sphax.neighbors import window as win
    from sphax.physics import wengine

    ic = turbulence.build(n_side=n_side)
    cfg = dataclasses.replace(sphax.configs.TURB, newton_iters=2)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    dom = sphax.box(jnp.zeros(3, jnp.float32), f32(ic["box"]))
    st = sphax.make_state(*(f32(ic[k]) for k in
                            ("pos", "vel", "mass", "u", "h")))
    st = st._replace(vel=0.3 * jax.random.normal(jax.random.PRNGKey(0),
                                                 st.vel.shape, jnp.float32))
    # production window config (BASELINE.md round-3 A/B): per-row-group
    # windows over shared tile-union DMA + fine fast cells + tight slack
    spec = win.plan_measured(st.pos, dom, h_max=float(st.h.max()) * 1.05,
                             dim=3, cutoff_scale=1.05, ghost_safety=1.4,
                             fast_sub=3, rgroups=2)
    st = wengine.update_derived(st, cfg, dom, spec, use_pallas=True)
    run = lambda s: wengine.simulate(s, cfg, dom, spec, steps,
                                     rebuild_every=rebuild_every,
                                     use_pallas=True)
    s2, _, _, ovf = run(st)
    jax.block_until_ready(s2.pos)
    assert int(ovf) == 0, "window structure overflow"
    walls = []
    for _ in range(2):
        t0 = time.time()
        s2, _, _, ovf = run(s2)
        jax.block_until_ready(s2.pos)
        walls.append(time.time() - t0)
    wall = min(w for w in walls if w > 0.05) if any(
        w > 0.05 for w in walls) else min(walls)
    assert bool(jnp.isfinite(s2.rho).all())
    return dict(n=st.n, n_side=n_side, wseg=spec.wseg,
                particle_steps_per_sec=round(st.n * steps / wall, 1),
                wall_s=round(wall, 3), steps=steps,
                device=str(jax.devices()[0]))


def gate() -> int:
    """Perf regression gate (SURVEY.md §4.2.6): measured throughput must not
    fall below the stored floor (benchmarks/perf_floor.json, set to ~80% of
    the current BASELINE.md numbers so noise passes but a real regression —
    e.g. a deliberate 2x slowdown — fails loudly). Returns a shell rc."""
    floor_path = os.path.join(os.path.dirname(__file__), "perf_floor.json")
    with open(floor_path) as f:
        floors = json.load(f)
    rc = 0
    for key, floor in floors.items():
        n_side = int(key.split("=")[1])
        rec = bench_one(n_side)
        pss = rec["particle_steps_per_sec"]
        ok = pss >= floor
        print(json.dumps(dict(gate=key, measured=pss, floor=floor, ok=ok)),
              flush=True)
        if not ok:
            rc = 1
    print("PERF GATE:", "PASS" if rc == 0 else "FAIL", flush=True)
    return rc


def main():
    if "--gate" in sys.argv:
        raise SystemExit(gate())
    sizes = [int(a) for a in sys.argv[1:]] or [32, 48, 64, 100]
    out = os.path.join(os.path.dirname(__file__), "sweep_results.jsonl")
    with open(out, "a") as f:
        for n_side in sizes:
            rec = bench_one(n_side)
            line = json.dumps(rec)
            print(line, flush=True)
            f.write(line + "\n")


if __name__ == "__main__":
    main()
