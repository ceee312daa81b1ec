"""Structured JSONL metrics + profiling hooks (SURVEY.md §5 observability).

The reference prints/plots ad hoc; here every diagnostic interval appends one
JSON line (t, dt, energies, momentum, Mach, throughput) to a run log, and a
``--profile`` style hook wraps a step window in a jax.profiler trace for
XProf/TensorBoard.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax

from sphax.configs import SPHConfig
from sphax.core.state import ParticleState
from sphax.diag import conservation


class MetricsLogger:
    """Append-only JSONL logger with throughput bookkeeping."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                        exist_ok=True)
        self._last_wall = time.time()
        self._last_step = 0
        self.records = []

    def log(self, state: ParticleState, cfg: SPHConfig, t: float, step: int,
            **extra) -> dict:
        return self.log_record(conservation.summary(state, cfg, t),
                               step, state.n, **extra)

    def log_record(self, rec: dict, step: int, n: int, **extra) -> dict:
        """Append a pre-computed record (e.g. the distributed runner's
        psum'd summary) with throughput bookkeeping added."""
        now = time.time()
        rec = dict(rec)
        dsteps = step - self._last_step
        dwall = now - self._last_wall
        rec.update(step=int(step),
                   particle_steps_per_sec=(n * dsteps / dwall
                                           if dwall > 0 and dsteps > 0 else 0.0),
                   **extra)
        self._last_wall, self._last_step = now, step
        self.records.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec


def profile_trace(dirname: str):
    """Context manager: wrap a step window in a jax.profiler trace.

    Usage: ``with metrics.profile_trace("/tmp/trace"): run_steps(...)``; view
    with TensorBoard/XProf. Named Pallas kernels (solve_h_density, balsara,
    forces) show up as separate ops.
    """
    return jax.profiler.trace(dirname)
