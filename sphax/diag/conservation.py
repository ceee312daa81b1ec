"""Conservation and flow diagnostics (SURVEY.md §5 metrics; §4.2.3 gates)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sphax.configs import SPHConfig
from sphax.core.state import ParticleState


def momentum(state: ParticleState):
    return jnp.sum(state.mass[:, None] * state.vel, axis=0)


def kinetic_energy(state: ParticleState):
    return 0.5 * jnp.sum(state.mass * jnp.sum(state.vel**2, axis=-1))


def internal_energy(state: ParticleState):
    return jnp.sum(state.mass * state.u)


def gravitational_energy(state: ParticleState, cfg: SPHConfig):
    """Direct-sum softened potential energy (matches the Plummer force law)."""
    dx = state.pos[:, None, :] - state.pos[None, :, :]
    r2 = jnp.sum(dx * dx, axis=-1) + cfg.grav_eps**2
    inv_r = 1.0 / jnp.sqrt(r2)
    inv_r = inv_r - jnp.diag(jnp.diag(inv_r))
    mm = state.mass[:, None] * state.mass[None, :]
    return -0.5 * cfg.G * jnp.sum(mm * inv_r)


def total_energy(state: ParticleState, cfg: SPHConfig):
    e = kinetic_energy(state) + internal_energy(state)
    if cfg.gravity:
        e = e + gravitational_energy(state, cfg)
    return e


def mach_rms(state: ParticleState):
    v2 = jnp.sum(state.vel**2, axis=-1)
    return jnp.sqrt(jnp.mean(v2 / jnp.maximum(state.cs, 1e-30) ** 2))


def summary(state: ParticleState, cfg: SPHConfig, t: float) -> dict:
    """JSONL-ready scalar record (SURVEY.md §5 observability)."""
    p = momentum(state)
    rec = dict(
        t=float(t),
        e_kin=float(kinetic_energy(state)),
        e_int=float(internal_energy(state)),
        px=float(p[0]), py=float(p[1]),
        max_v=float(jnp.max(jnp.sqrt(jnp.sum(state.vel**2, -1)))),
        max_rho=float(jnp.max(state.rho)),
        min_rho=float(jnp.min(state.rho)),
        mean_h=float(jnp.mean(state.h)),
        mach_rms=float(mach_rms(state)),
    )
    if state.dim == 3:
        rec["pz"] = float(p[2])
    if cfg.gravity:
        rec["e_grav"] = float(gravitational_energy(state, cfg))
    rec["e_total"] = rec["e_kin"] + rec["e_int"] + rec.get("e_grav", 0.0)
    rec["finite"] = bool(np.isfinite(rec["e_total"]) and rec["max_rho"] > 0)
    return rec
