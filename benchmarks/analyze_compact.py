"""Probe the per-group candidate-compaction statistics at the bench config.

Round-4 attack on the candidate over-read (VERDICT round-3 Next #1): the
round-3 analysis (analyze_candidates.py) measured ~2,040 computed candidate
rows per row at R=2 against ~90 true neighbors, with the 9-segment x
128-lane block quantum as the structural floor (~1,150). Build-time
compaction concatenates the clipped segment runs into ONE dense per-group
list, removing the per-segment quantum, the 128-alignment slop, and the
duplicates — this script measures what's left.

Usage:  python benchmarks/analyze_compact.py [n_side] [rgroups]
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


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rgroups = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    ic = turbulence.build(n_side=n_side)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    dom = sphax.box(jnp.zeros(3, jnp.float32), f32(ic["box"]))
    pos = f32(ic["pos"])
    h_max = float(jnp.max(f32(ic["h"]))) * 1.05
    spec = win.plan_measured(pos, dom, h_max=h_max, dim=3,
                             cutoff_scale=1.05, ghost_safety=1.4,
                             fast_sub=3, rgroups=rgroups)
    probe = dataclasses.replace(spec, cwidth=128)
    t0 = time.time()
    wd = jax.jit(win.build, static_argnums=2)(pos, dom, probe)
    jax.block_until_ready(wd.c_n)
    t_probe = time.time() - t0

    c_n = np.asarray(wd.c_n)
    nact = np.asarray(wd.w_nact)  # [nG, n_seg] active 128-blocks
    live = c_n > 0
    computed_now = nact.sum(axis=1) * 128  # rows/row under the block walk
    print(f"n={pos.shape[0]}  Ns={spec.n_sorted}  groups={len(c_n)} "
          f"(live {live.sum()})  wseg={spec.wseg}  rgroups={rgroups} "
          f"probe_build={t_probe:.2f}s")
    print(f"compacted c_n: mean {c_n[live].mean():.0f}  p50 "
          f"{np.percentile(c_n[live], 50):.0f}  p99 "
          f"{np.percentile(c_n[live], 99):.0f}  max {c_n.max()}")
    print(f"block-walk computed rows/row now: mean "
          f"{computed_now[live].mean():.0f}  max {computed_now.max()}")
    for hr in (1.1, 1.2, 1.3):
        C = int(np.ceil(c_n.max() * hr / 128.0) * 128)
        padded = np.maximum(np.ceil(c_n[live] / 128.0) * 128, 128)
        print(f"  headroom {hr}: cwidth={C}  mean padded compute rows/row "
              f"{padded.mean():.0f}  diet vs block-walk "
              f"{computed_now[live].mean() / padded.mean():.2f}x  "
              f"buffer MB (16 fld) "
              f"{len(c_n) * C * 16 * 4 / 1e6:.0f}")


if __name__ == "__main__":
    main()
