"""Dense O(N^2) jnp engine — row-blocked all-pairs, fully jit-compatible.

This is the TPU-native replacement for the reference's Python O(N^2) neighbor
loops (BASELINE.json:5, SURVEY.md §3.1): instead of a double ``for`` loop, the
pair interactions are evaluated as row-blocked [B, N] vector ops streamed
through ``lax.map``, so memory stays O(B*N) and XLA fuses the whole pass into
a handful of VPU loops. It is exact (no neighbor truncation) and serves as:

  * the parity bridge between ``reference_cpu`` (float64 NumPy) and the
    neighbor-list / Pallas engines (SURVEY.md §4.2.2);
  * the production path for small N where a cell list does not pay off.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sphax.configs import SPHConfig
from sphax.core.state import Domain, ParticleState
from sphax.physics import pairs
from sphax.physics.eos import eos


def _pad_rows(x, n_pad):
    """Pad leading axis with copies of row 0 (valid data, discarded later)."""
    if n_pad == 0:
        return x
    pad = jnp.broadcast_to(x[0:1], (n_pad,) + x.shape[1:])
    return jnp.concatenate([x, pad], axis=0)


def _row_blocks(arrays, block):
    """Reshape a pytree of [N, ...] arrays into [nb, B, ...] row blocks."""
    n = arrays[0].shape[0]
    nb = -(-n // block)
    n_pad = nb * block - n
    return [
        _pad_rows(a, n_pad).reshape((nb, block) + a.shape[1:]) for a in arrays
    ], n


def _blocked(body, row_arrays, block):
    """Map ``body`` over row blocks; returns outputs sliced back to [N, ...]."""
    blocks, n = _row_blocks(row_arrays, block)
    out = jax.lax.map(body, tuple(blocks))
    return jax.tree_util.tree_map(
        lambda o: o.reshape((-1,) + o.shape[2:])[:n], out
    )


def _geom(pos_i, pos_j, domain: Domain):
    """dx [B, N, D] (min-image) and r [B, N] for a row block vs all columns."""
    dx = domain.displacement(pos_i[:, None, :] - pos_j[None, :, :])
    r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
    return dx, r


# ---------------------------------------------------------------------------
# density + adaptive h
# ---------------------------------------------------------------------------


def density_pass(pos, mass, h, cfg: SPHConfig, domain: Domain, block: int):
    """Blocked rho_i = sum_j m_j W(r_ij, h_i) and drho/dh_i."""

    def body(args):
        pos_i, h_i = args
        _, r = _geom(pos_i, pos, domain)
        w, dwdh = pairs.density_terms(r, h_i[:, None], mass[None, :], cfg.dim)
        return jnp.sum(w, axis=-1), jnp.sum(dwdh, axis=-1)

    return _blocked(body, [pos, h], block)


def solve_h(pos, mass, h0, cfg: SPHConfig, domain: Domain, block: int):
    """Fixed-iteration Newton solve of rho_sum(h) = m (eta/h)^d.

    Same iteration as ``reference_cpu.solve_h`` (bounded Newton step), but a
    static unroll count (cfg.newton_iters) instead of a convergence test —
    data-dependent while loops don't belong under jit (SURVEY.md §7 hard
    parts). Newton is quadratic: from the previous step's h, a handful of
    iterations reaches float precision.
    """
    dim = cfg.dim

    def it(_, h):
        rho, drho_dh = density_pass(pos, mass, h, cfg, domain, block)
        rho_h = mass * (cfg.eta / h) ** dim
        phi = rho - rho_h
        dphi = drho_dh + dim * rho_h / h
        dphi = jnp.where(jnp.abs(dphi) < 1e-300, -1e-300, dphi)
        dh = jnp.clip(-phi / dphi, -0.5 * h, 0.5 * h)
        return h + dh

    return jax.lax.fori_loop(0, cfg.newton_iters, it, h0)


# ---------------------------------------------------------------------------
# balsara switch
# ---------------------------------------------------------------------------


def divcurl_pass(pos, vel, mass, h, rho, cfg: SPHConfig, domain: Domain,
                 block: int):
    """SPH div/curl gather estimators: returns (div v, |curl v|) per row."""
    dim = cfg.dim

    def body(args):
        pos_i, vel_i, h_i = args
        dx, r = _geom(pos_i, pos, domain)
        dv = vel_i[:, None, :] - vel[None, :, :]
        divv_p, curl_p = pairs.balsara_terms(dx, r, dv, h_i[:, None],
                                             mass[None, :], dim)
        divv = -jnp.sum(divv_p, axis=-1)
        if dim == 3:
            curl = jnp.sum(curl_p, axis=-2)
            curl_mag = jnp.sqrt(jnp.sum(curl * curl, axis=-1))
        elif dim == 2:
            curl_mag = jnp.abs(jnp.sum(curl_p, axis=-1))
        else:
            curl_mag = jnp.zeros_like(divv)
        return divv, curl_mag

    divv, curl_mag = _blocked(body, [pos, vel, h], block)
    return divv / rho, curl_mag / rho


# ---------------------------------------------------------------------------
# forces (+ optional fused gravity)
# ---------------------------------------------------------------------------


def force_pass(pos, vel, mass, h, rho, P, cs, omega, bf, cfg: SPHConfig,
               domain: Domain, block: int):
    use_vf = bf is not None

    def body(args):
        pos_i, vel_i, h_i, rho_i, P_i, cs_i, om_i, bf_i = args
        dx, r = _geom(pos_i, pos, domain)
        dv = vel_i[:, None, :] - vel[None, :, :]
        fcoef, du = pairs.force_terms(
            dx, r, dv,
            h_i[:, None], h[None, :],
            rho_i[:, None], rho[None, :],
            P_i[:, None], P[None, :],
            cs_i[:, None], cs[None, :],
            om_i[:, None], omega[None, :],
            mass[None, :], cfg,
            bf_i=(bf_i[:, None] if use_vf else None),
            bf_j=(bf[None, :] if use_vf else None),
        )
        if cfg.gravity and cfg.grav_solver == "direct":
            fcoef = fcoef + pairs.gravity_terms(dx, r, mass[None, :], cfg)
        acc = -jnp.sum(fcoef[..., None] * dx, axis=-2)
        return acc, jnp.sum(du, axis=-1)

    one = jnp.ones_like(h)
    return _blocked(
        body, [pos, vel, h, rho, P, cs, omega, bf if bf is not None else one],
        block,
    )


# ---------------------------------------------------------------------------
# full derived pass
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "block"))
def update_derived(state: ParticleState, cfg: SPHConfig, domain: Domain,
                   block: int = 128) -> ParticleState:
    """density (+Newton-h) -> EOS -> (Balsara) -> forces (+gravity).

    Mirrors ``reference_cpu.update_derived`` exactly (same operation order,
    same formulae), returning a state with fresh derived fields.
    """
    if state.dim != cfg.dim:
        raise ValueError(
            f"state has dim={state.dim} but cfg.dim={cfg.dim}; kernel "
            "normalisation and curl estimators are dimension-specific")
    pos, vel, mass, u = state.pos, state.vel, state.mass, state.u
    h = state.h
    if cfg.adaptive_h:
        h = solve_h(pos, mass, h, cfg, domain, block)
    rho, drho_dh = density_pass(pos, mass, h, cfg, domain, block)
    if cfg.grad_h:
        omega = 1.0 + h / (cfg.dim * rho) * drho_dh
    else:
        omega = jnp.ones_like(rho)
    P, cs = eos(rho, u, cfg)
    if cfg.need_divv:
        divv, curl = divcurl_pass(pos, vel, mass, h, rho, cfg, domain, block)
        bf = (pairs.balsara_factor(divv, curl, cs, h)
              if cfg.balsara else None)
    else:
        divv, bf = jnp.zeros_like(rho), None
    vf = pairs.visc_factor(cfg, bf=bf, alpha=state.alpha)
    acc, du = force_pass(pos, vel, mass, h, rho, P, cs, omega, vf, cfg,
                         domain, block)
    if cfg.gravity and cfg.grav_solver == "p3m":
        from sphax.physics import pm

        acc = acc + pm.p3m_accel_dense(pos, mass, cfg, domain)
    return state._replace(h=h, rho=rho, P=P, cs=cs, acc=acc, du_dt=du,
                          omega=omega, divv=divv)
