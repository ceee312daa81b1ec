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


def local_dt(state: ParticleState, cfg: SPHConfig):
    """Per-run scalar dt before any cross-device reduction."""
    vsig = state.cs + 0.6 * (cfg.alpha_visc * state.cs + cfg.beta_visc * state.cs)
    dt_cfl = cfg.cfl * state.h / jnp.maximum(vsig, _TINY)
    amag = jnp.sqrt(jnp.sum(state.acc * state.acc, axis=-1))
    dt_f = cfg.dt_force * jnp.sqrt(state.h / jnp.maximum(amag, _TINY))
    return jnp.minimum(
        jnp.minimum(jnp.min(dt_cfl), jnp.min(dt_f)),
        jnp.asarray(cfg.dt_max, state.h.dtype),
    )
