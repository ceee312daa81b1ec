"""Checkpoint / resume (SURVEY.md §5 "Checkpoint/resume").

The reference at most ``np.save``s snapshots; here the FULL simulation state
(ParticleState pytree + optional driving state + step counter + time) is
written as a single compressed npz with a schema version and restored
bitwise. npz (not orbax) keeps checkpoints dependency-free, portable, and
greppable; arrays are host-gathered on save and re-placed on load.
"""
from __future__ import annotations

import json
import os
import tempfile
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sphax.core.state import ParticleState
from sphax.physics.driving import DriveState

SCHEMA = 2  # v2: + ParticleState.divv (Morris-Monaghan source term)


def save(path: str, state: ParticleState, t: float, step: int,
         drive: Optional[DriveState] = None, extra: Optional[dict] = None):
    """Atomically write a checkpoint (tmp file + rename)."""
    payload = {f"state/{k}": np.asarray(getattr(state, k))
               for k in state._fields}
    if drive is not None:
        payload["drive/amp_re"] = np.asarray(drive.amp_re)
        payload["drive/amp_im"] = np.asarray(drive.amp_im)
        payload["drive/key"] = np.asarray(drive.key)
    meta = dict(schema=SCHEMA, t=float(t), step=int(step),
                has_drive=drive is not None, extra=extra or {})
    payload["meta"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load(path: str) -> Tuple[ParticleState, float, int, Optional[DriveState],
                             dict]:
    """Load a checkpoint -> (state, t, step, drive, extra)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        if meta["schema"] > SCHEMA:
            raise ValueError(
                f"checkpoint schema {meta['schema']} is newer than this "
                f"build's {SCHEMA}; upgrade the framework to resume it")
        # older schemas migrate forward: fields added since (alpha in v1-era
        # files without it, divv in v2) default to their make_state values,
        # which is exactly the state a fresh run would carry before the
        # first derived pass (advisor round-2 low #1)
        fields = {}
        n = z["state/pos"].shape[0]
        dtype = z["state/pos"].dtype
        defaults = {"alpha": np.ones((n,), dtype),
                    "divv": np.zeros((n,), dtype)}
        for k in ParticleState._fields:
            key = f"state/{k}"
            if key in z:
                fields[k] = jnp.asarray(z[key])
            elif k in defaults:
                fields[k] = jnp.asarray(defaults[k])
            else:
                raise ValueError(f"checkpoint missing required field {k}")
        state = ParticleState(**fields)
        drive = None
        if meta["has_drive"]:
            drive = DriveState(amp_re=jnp.asarray(z["drive/amp_re"]),
                               amp_im=jnp.asarray(z["drive/amp_im"]),
                               key=jnp.asarray(z["drive/key"]))
    return state, meta["t"], meta["step"], drive, meta.get("extra", {})


def verify_integrity(state: ParticleState) -> Optional[str]:
    """NaN/shape guard (fault detection, SURVEY.md §5): returns a reason
    string if the state is corrupt, else None."""
    for k in state._fields:
        v = np.asarray(getattr(state, k))
        if not np.all(np.isfinite(v)):
            return f"non-finite values in {k}"
    if np.any(np.asarray(state.h) <= 0):
        return "non-positive smoothing length"
    if np.any(np.asarray(state.mass) < 0):
        return "negative mass"
    return None
