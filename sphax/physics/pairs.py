"""Per-pair SPH interaction math, shared by every execution engine.

Each function takes *broadcastable* arrays of pair quantities — the dense
O(N^2) engine calls them with [B, N] row-block shapes, the neighbor-list
engine with [N, K] gathered shapes, and the Pallas kernels inline the same
formulae — so the physics is written once (SURVEY.md §2.1 items 2, 5-7).

Self-pairs (r = 0, dx = 0, dv = 0) contribute exactly zero to every force and
energy term by construction (the r->0 limit is taken analytically in
``kernels.grad_W_over_r``), so engines never need to mask the diagonal; they
only mask *invalid padding* entries. The density self-term W(0, h_i) m_i is
physical and wanted.
"""
from __future__ import annotations

import jax.numpy as jnp

from sphax.configs import SPHConfig
from sphax.physics import kernels as K


def density_terms(r, h_i, m_j, dim: int):
    """Per-pair density and d rho/d h contributions: (m_j W, m_j dW/dh)."""
    return m_j * K.W(r, h_i, dim), m_j * K.dW_dh(r, h_i, dim)


def force_terms(dx, r, dv, h_i, h_j, rho_i, rho_j, P_i, P_j, cs_i, cs_j,
                om_i, om_j, m_j, cfg: SPHConfig, bf_i=None, bf_j=None):
    """Per-pair force/energy contributions.

    Returns (fcoef, du) where
        acc_i   = -sum_j fcoef * dx          (vector, dx = x_i - x_j)
        du_dt_i =  sum_j du
    implementing (SURVEY.md §2.1.5-7):
        fcoef = m_j [ P_i/(Om_i rho_i^2) g(h_i) + P_j/(Om_j rho_j^2) g(h_j)
                      + Pi_ij * (g(h_i)+g(h_j))/2 ]
        du    = m_j [ P_i/(Om_i rho_i^2) g(h_i)
                      + 1/2 Pi_ij (g(h_i)+g(h_j))/2 ] * (v_ij . r_ij)
    with g the scalar gradient factor grad_W = g * dx and Monaghan viscosity
        Pi_ij = (-alpha cbar mu + beta mu^2)/rhobar,
        mu = hbar (v.r) / (r^2 + eps hbar^2), active only when v.r < 0,
    optionally limited by the Balsara factors bf.
    """
    dim = cfg.dim
    gi = K.grad_W_over_r(r, h_i, dim)
    gj = K.grad_W_over_r(r, h_j, dim)
    gbar = 0.5 * (gi + gj)

    ci = P_i / (om_i * rho_i * rho_i)
    cj = P_j / (om_j * rho_j * rho_j)

    vdotr = jnp.sum(dv * dx, axis=-1)
    hbar = 0.5 * (h_i + h_j)
    mu = hbar * vdotr / (r * r + cfg.eps_visc * hbar * hbar)
    mu = jnp.where(vdotr < 0.0, mu, 0.0)
    cbar = 0.5 * (cs_i + cs_j)
    rhobar = 0.5 * (rho_i + rho_j)
    Pi = (-cfg.alpha_visc * cbar * mu + cfg.beta_visc * mu * mu) / rhobar
    if bf_i is not None:
        Pi = Pi * (0.5 * (bf_i + bf_j))

    fcoef = m_j * (ci * gi + cj * gj + Pi * gbar)
    du = m_j * (ci * gi + 0.5 * Pi * gbar) * vdotr
    return fcoef, du


def balsara_terms(dx, r, dv, h_i, m_j, dim: int):
    """Per-pair div/curl estimator contributions (gather form, gradW(h_i)).

    Returns (divv_pair, curl_pair) where
        divv_i = -sum_j divv_pair / rho_i            (scalar)
        curl_i =  sum_j curl_pair / rho_i            (vector / pseudo-scalar)
    """
    g = K.grad_W_over_r(r, h_i, dim)
    mw = m_j * g
    vdotr = jnp.sum(dv * dx, axis=-1)
    divv_pair = mw * vdotr
    if dim == 3:
        cross = jnp.stack([
            dv[..., 1] * dx[..., 2] - dv[..., 2] * dx[..., 1],
            dv[..., 2] * dx[..., 0] - dv[..., 0] * dx[..., 2],
            dv[..., 0] * dx[..., 1] - dv[..., 1] * dx[..., 0],
        ], axis=-1)
        curl_pair = mw[..., None] * cross
    elif dim == 2:
        cz = dv[..., 0] * dx[..., 1] - dv[..., 1] * dx[..., 0]
        curl_pair = mw * cz
    else:
        curl_pair = jnp.zeros_like(mw)
    return divv_pair, curl_pair


def balsara_factor(divv, curl_mag, cs, h):
    """f_i = |div v| / (|div v| + |curl v| + 1e-4 c/h) (Balsara 1995).

    The 1e-30 floor keeps isolated zero-velocity particles (e.g. zero-mass
    padding in the distributed engine) at f=0 instead of NaN — a NaN here
    poisons real particles through 0-mass * NaN pair terms.
    """
    return jnp.abs(divv) / (jnp.abs(divv) + curl_mag + 1e-4 * cs / h + 1e-30)


def visc_factor(cfg: SPHConfig, bf=None, alpha=None):
    """Combine the per-particle viscosity multipliers into ONE pair channel.

    force_terms applies 0.5 (vf_i + vf_j) to Pi_ij; with the standard
    beta = 2 alpha convention the Morris-Monaghan alpha IS such a multiplier
    (Pi proportional to alpha when beta/alpha is fixed), so both switches
    share the channel: vf = balsara_f * alpha(t).
    """
    vf = None
    if cfg.balsara:
        vf = bf
    if cfg.mm_visc:
        vf = alpha if vf is None else vf * alpha
    return vf


def mm_alpha_update(alpha, divv, h, cs, dt, cfg: SPHConfig):
    """One explicit-Euler step of the Morris-Monaghan (1997) alpha equation:

        d alpha/dt = S - (alpha - alpha_min) / tau
        S   = max(-div v, 0) * (alpha_max - alpha)
        tau = h / (sigma * c)

    clipped to [alpha_min, alpha_max]. Called by the integrator AFTER the
    closing half-kick, using the step's dt and the freshly derived divv
    (same convention in reference_cpu.step).
    """
    src = jnp.maximum(-divv, 0.0) * (cfg.mm_alpha_max - alpha)
    decay = (alpha - cfg.mm_alpha_min) * (cfg.mm_sigma * cs
                                          / jnp.maximum(h, 1e-30))
    return jnp.clip(alpha + dt * (src - decay), cfg.mm_alpha_min,
                    cfg.mm_alpha_max)


def gravity_terms(dx, r, m_j, cfg: SPHConfig):
    """Per-pair softened gravity: acc_i = -G sum_j gcoef * dx."""
    inv = (r * r + cfg.grav_eps**2) ** (-1.5)
    return cfg.G * m_j * inv
