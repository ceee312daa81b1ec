"""Global timestep criteria (SURVEY.md §2.1.8).

Identical formulae to ``reference_cpu.timestep``; here the min-reduction is a
jnp op so it stays on-device (and becomes a ``lax.pmin`` over ICI in the
distributed step, SURVEY.md §3.5 / C17).
"""
from __future__ import annotations

import jax.numpy as jnp

from sphax.configs import SPHConfig
from sphax.core.state import ParticleState

_TINY = 1e-30


def particle_dt(state: ParticleState, cfg: SPHConfig):
    """Per-PARTICLE dt [n]: min of the CFL and force criteria, clamped to
    cfg.dt_max. ``local_dt`` is its global min (the reference's global-dt
    scheme); the block-timestep integrator (integrate/rungs.py) consumes the
    vector directly to assign power-of-two rungs."""
    vsig = state.cs + 0.6 * (cfg.alpha_visc * state.cs + cfg.beta_visc * state.cs)
    dt_cfl = cfg.cfl * state.h / jnp.maximum(vsig, _TINY)
    amag = jnp.sqrt(jnp.sum(state.acc * state.acc, axis=-1))
    dt_f = cfg.dt_force * jnp.sqrt(state.h / jnp.maximum(amag, _TINY))
    return jnp.minimum(jnp.minimum(dt_cfl, dt_f),
                       jnp.asarray(cfg.dt_max, state.h.dtype))


def local_dt(state: ParticleState, cfg: SPHConfig):
    """Per-run scalar dt before any cross-device reduction."""
    return jnp.min(particle_dt(state, cfg))
