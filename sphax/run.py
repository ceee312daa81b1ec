"""Production run loop: whole-epoch jit, zero host round-trips per step.

The reference advances time in a host-level Python ``for`` loop (SURVEY.md
§3.1); here an entire chunk of KDK steps is one compiled ``lax.scan``
(BASELINE.json:5 "the whole step is jit-compiled with no host round-trips").
Host sync happens only between chunks (snapshot/diagnostic cadence).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from sphax.configs import SPHConfig
from sphax.core.state import Domain, ParticleState
from sphax.integrate import leapfrog
from sphax.integrate.timestep import local_dt
from sphax.physics import driving as drv_mod


class DriveSpec(NamedTuple):
    """Static description of turbulence driving (SURVEY.md C13)."""

    modes: tuple          # tuple-of-tuples of ints (hashable, static)
    tau: float
    accel_rms: float
    box_size: float = 1.0


def _with_drive(state: ParticleState, drive, spec: DriveSpec):
    modes = jnp.asarray(spec.modes, state.pos.dtype)
    a = drv_mod.acceleration(state.pos, drive, modes, spec.box_size)
    return state._replace(acc=state.acc + a)


@partial(jax.jit, static_argnames=("cfg", "engine_fn", "nsteps", "drive_spec"))
def simulate(state: ParticleState, cfg: SPHConfig, domain: Domain,
             engine_fn: Callable, nsteps: int,
             drive=None, drive_spec: Optional[DriveSpec] = None):
    """Advance ``nsteps`` KDK steps on-device. Returns (state, drive, dts).

    engine_fn: static callable (state -> state with fresh derived fields),
    e.g. ``lambda s: clist.update_derived(s, cfg, dom, grid)``. If driving is
    enabled, its acceleration is added to every derived evaluation and the OU
    amplitudes advance once per step with the step's dt.
    """

    def body(carry, _):
        st, dr = carry
        dt = local_dt(st, cfg)
        if drive_spec is not None:
            modes = jnp.asarray(drive_spec.modes, st.pos.dtype)
            dr = drv_mod.update(dr, modes, dt, drive_spec.tau,
                                drive_spec.accel_rms, drive_spec.box_size)
            derived = lambda s: _with_drive(engine_fn(s), dr, drive_spec)
        else:
            derived = engine_fn
        st, dt = leapfrog.step(st, cfg, domain, derived, dt=dt)
        return (st, dr), dt

    if drive is None:
        drive = drv_mod.DriveState(jnp.zeros((1, 3)), jnp.zeros((1, 3)),
                                   jax.random.PRNGKey(0))
    (state, drive), dts = jax.lax.scan(body, (state, drive), None,
                                       length=nsteps)
    return state, drive, dts


def simulate_until(state, cfg, domain, engine_fn, t_end, chunk: int = 16,
                   drive=None, drive_spec=None, max_steps: int = 100_000,
                   callback=None):
    """Run chunks of jitted steps until t >= t_end (host sync per chunk only).

    Returns (state, drive, t, nsteps). ``callback(state, t, nsteps)`` runs at
    chunk cadence (diagnostics/snapshots — SURVEY.md §3.2 host boundary).
    """
    t, n = 0.0, 0
    while t < t_end and n < max_steps:
        state, drive, dts = simulate(state, cfg, domain, engine_fn, chunk,
                                     drive, drive_spec)
        t += float(jnp.sum(dts))
        n += chunk
        if callback is not None:
            callback(state, t, n)
    return state, drive, t, n
