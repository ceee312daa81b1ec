"""Equations of state (SURVEY.md §2.1.4; reference: BASELINE.json:7,11)."""
from __future__ import annotations

import jax.numpy as jnp

from sphax.configs import SPHConfig


def eos(rho, u, cfg: SPHConfig):
    """Return (P, cs). Ideal gamma-law gas or isothermal."""
    if cfg.isothermal:
        P = cfg.cs_iso**2 * rho
        cs = jnp.full_like(rho, cfg.cs_iso)
    else:
        P = (cfg.gamma - 1.0) * rho * u
        cs = jnp.sqrt(cfg.gamma * jnp.maximum(P, 0.0) / rho)
    return P, cs
