"""Cell-list jnp engine: O(N) neighbor-limited physics passes.

This is the production jnp path (SURVEY.md §3.2): particles are Morton-sorted
per rebuild, interactions are evaluated cell-block vs stacked 27-neighbor-cell
candidates with fully static shapes — the TPU-native replacement for the
reference's O(N^2) loops (BASELINE.json:5). Invalid candidate slots carry a
zero-mass sentinel particle, so every pair term vanishes without explicit
masking (see sphax/physics/pairs.py for why self-pairs are also harmless).

Exactness: provided no cell overflows its static capacity (``CellList.
overflow == 0``) and the cell size covers the kernel support (2 h_max), the
candidate set is a superset of the true neighbor set, and results equal the
dense engine bit-for-fp-roundoff (SURVEY.md §4.2.2: "must agree ... proving
the neighbor structure finds the same pairs").

Self-gravity is long-range and cannot use the cell list; it runs as a dense
row-blocked pass over all pairs (direct sum, BASELINE.json:10).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sphax.configs import SPHConfig
from sphax.core.state import Domain, ParticleState
from sphax.neighbors import cell_list as cl_mod
from sphax.neighbors.cell_list import CellList, Grid
from sphax.physics import pairs
from sphax.physics.eos import eos


def _sentinel_pad(arr, value):
    """Append one sentinel row holding ``value``."""
    row = jnp.full((1,) + arr.shape[1:], value, arr.dtype)
    return jnp.concatenate([arr, row], axis=0)


def _run_cell_pass(kernel_fn, cl: CellList, grid: Grid, periodic: bool,
                   n: int, cell_block: int, i_fields, j_fields):
    """Map ``kernel_fn`` over blocks of cells; return per-particle outputs.

    i_fields / j_fields: tuples of sentinel-padded ``[N+1, ...]`` arrays in
    sorted order. kernel_fn(gi, gj, own_idx, cand_idx) receives gathered
    ``[B, C, ...]`` own and ``[B, M, ...]`` candidate fields and returns a
    pytree of ``[B, C, ...]`` per-own-particle reductions.
    """
    ncells, cap = grid.ncells, grid.capacity
    nblk = -(-ncells // cell_block)

    def body(blk):
        cids = blk * cell_block + jnp.arange(cell_block, dtype=jnp.int32)
        cids = jnp.minimum(cids, ncells - 1)
        own = cl.table[cids]                                   # [B, C]
        ncids, okc = cl_mod.neighbor_cids(cids, grid, periodic)
        cand = cl.table[ncids]                                 # [B, n_off, C]
        cand = jnp.where(okc[..., None], cand, n)
        cand = cand.reshape(cand.shape[0], -1)                 # [B, M]
        gi = tuple(f[own] for f in i_fields)
        gj = tuple(f[cand] for f in j_fields)
        return kernel_fn(gi, gj)

    out = jax.lax.map(body, jnp.arange(nblk, dtype=jnp.int32))
    # back to sorted particle order: particle k lives at (cid[k], slot[k])
    pick = cl.cid * cap + jnp.minimum(cl.slot, cap - 1)

    def gather(o):
        flat = o.reshape((nblk * cell_block * cap,) + o.shape[3:])
        return flat[pick]

    return jax.tree_util.tree_map(gather, out)


def _geom(pos_i, pos_j, domain: Domain):
    dx = domain.displacement(pos_i[:, :, None, :] - pos_j[:, None, :, :])
    r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
    return dx, r


# ---------------------------------------------------------------------------
# passes (sorted order, sentinel-padded fields)
# ---------------------------------------------------------------------------


def density_pass(cl, grid, domain, n, cell_block, pos_p, h_s, mass_p, dim,
                 bin_per=None):
    def kfn(gi, gj):
        (pos_i, h_i), (pos_j, m_j) = gi, gj
        _, r = _geom(pos_i, pos_j, domain)
        w, dwdh = pairs.density_terms(r, h_i[..., None], m_j[:, None, :], dim)
        return jnp.sum(w, -1), jnp.sum(dwdh, -1)

    per = domain.periodic if bin_per is None else bin_per
    return _run_cell_pass(kfn, cl, grid, per, n, cell_block,
                          (pos_p, _sentinel_pad(h_s, 1.0)), (pos_p, mass_p))


def solve_h(cl, grid, domain, n, cell_block, pos_p, mass_p, h0_s,
            cfg: SPHConfig, bin_per=None):
    """Newton-h on the cell candidates (same iteration as dense.solve_h)."""
    dim = cfg.dim
    mass_s = mass_p[:-1]

    def it(_, h_s):
        rho, drho_dh = density_pass(cl, grid, domain, n, cell_block,
                                    pos_p, h_s, mass_p, dim, bin_per)
        rho_h = mass_s * (cfg.eta / h_s) ** dim
        phi = rho - rho_h
        dphi = drho_dh + dim * rho_h / h_s
        dphi = jnp.where(jnp.abs(dphi) < 1e-300, -1e-300, dphi)
        dh = jnp.clip(-phi / dphi, -0.5 * h_s, 0.5 * h_s)
        return h_s + dh

    return jax.lax.fori_loop(0, cfg.newton_iters, it, h0_s)


def divcurl_pass(cl, grid, domain, n, cell_block, pos_p, vel_p, mass_p,
                 h_s, rho_s, cfg: SPHConfig, bin_per=None):
    """SPH div/curl gather estimators: returns (div v, |curl v|)."""
    dim = cfg.dim

    def kfn(gi, gj):
        (pos_i, vel_i, h_i), (pos_j, vel_j, m_j) = gi, gj
        dx, r = _geom(pos_i, pos_j, domain)
        dv = vel_i[:, :, None, :] - vel_j[:, None, :, :]
        divv_p, curl_p = pairs.balsara_terms(dx, r, dv, h_i[..., None],
                                             m_j[:, None, :], dim)
        divv = -jnp.sum(divv_p, -1)
        if dim == 3:
            curl = jnp.sum(curl_p, -2)
            curl_mag = jnp.sqrt(jnp.sum(curl * curl, -1))
        elif dim == 2:
            curl_mag = jnp.abs(jnp.sum(curl_p, -1))
        else:
            curl_mag = jnp.zeros_like(divv)
        return divv, curl_mag

    per = domain.periodic if bin_per is None else bin_per
    divv, curl_mag = _run_cell_pass(
        kfn, cl, grid, per, n, cell_block,
        (pos_p, vel_p, _sentinel_pad(h_s, 1.0)), (pos_p, vel_p, mass_p))
    rho_safe = jnp.maximum(rho_s, 1e-15)
    return divv / rho_safe, curl_mag / rho_safe


def force_pass(cl, grid, domain, n, cell_block, pos_p, vel_p, mass_p,
               h_s, rho_s, P_s, cs_s, om_s, bf_s, cfg: SPHConfig,
               bin_per=None):
    pad = _sentinel_pad
    h_p, rho_p = pad(h_s, 1.0), pad(rho_s, 1.0)
    P_p, cs_p = pad(P_s, 0.0), pad(cs_s, 0.0)
    om_p = pad(om_s, 1.0)
    bf_p = pad(bf_s, 0.0) if cfg.visc_factor_on else None

    def kfn(gi, gj):
        if cfg.visc_factor_on:
            (pos_i, vel_i, h_i, rho_i, P_i, cs_i, om_i, bf_i) = gi
            (pos_j, vel_j, m_j, h_j, rho_j, P_j, cs_j, om_j, bf_j) = gj
        else:
            (pos_i, vel_i, h_i, rho_i, P_i, cs_i, om_i) = gi
            (pos_j, vel_j, m_j, h_j, rho_j, P_j, cs_j, om_j) = gj
            bf_i = bf_j = None
        dx, r = _geom(pos_i, pos_j, domain)
        dv = vel_i[:, :, None, :] - vel_j[:, None, :, :]
        e = lambda a: a[..., None]        # [B,C] -> [B,C,1]
        f = lambda a: a[:, None, :]       # [B,M] -> [B,1,M]
        fcoef, du = pairs.force_terms(
            dx, r, dv, e(h_i), f(h_j), e(rho_i), f(rho_j), e(P_i), f(P_j),
            e(cs_i), f(cs_j), e(om_i), f(om_j), f(m_j), cfg,
            bf_i=(e(bf_i) if cfg.visc_factor_on else None),
            bf_j=(f(bf_j) if cfg.visc_factor_on else None))
        acc = -jnp.sum(fcoef[..., None] * dx, axis=-2)
        return acc, jnp.sum(du, -1)

    ifields = [pos_p, vel_p, h_p, rho_p, P_p, cs_p, om_p]
    jfields = [pos_p, vel_p, mass_p, h_p, rho_p, P_p, cs_p, om_p]
    if cfg.visc_factor_on:
        ifields.append(bf_p)
        jfields.append(bf_p)
    per = domain.periodic if bin_per is None else bin_per
    return _run_cell_pass(kfn, cl, grid, per, n, cell_block,
                          tuple(ifields), tuple(jfields))


def gravity_dense(pos_s, mass_s, cfg: SPHConfig, domain: Domain,
                  block: int = 128):
    """Direct-sum softened gravity, row-blocked over ALL pairs (long-range)."""
    from sphax.physics.dense import _blocked

    def body(args):
        (pos_i,) = args
        dx = domain.displacement(pos_i[:, None, :] - pos_s[None, :, :])
        r = jnp.sqrt(jnp.sum(dx * dx, -1))
        g = pairs.gravity_terms(dx, r, mass_s[None, :], cfg)
        return -jnp.sum(g[..., None] * dx, axis=-2)

    return _blocked(body, [pos_s], block)


# ---------------------------------------------------------------------------
# full derived pass
# ---------------------------------------------------------------------------


def auto_cell_block(grid: Grid, dim: int, budget_bytes: int = 8 << 20) -> int:
    """Cells per map block so the [B, C, M, D] pair intermediates stay small."""
    per_cell = grid.capacity * grid.n_candidates * dim * 4
    return max(1, min(128, budget_bytes // max(per_cell, 1)))


@partial(jax.jit, static_argnames=("cfg", "grid", "cell_block"))
def update_derived(state: ParticleState, cfg: SPHConfig, domain: Domain,
                   grid: Grid, cell_block: int = 0) -> ParticleState:
    """Cell-list analogue of dense.update_derived (same math, same order).

    Results return in the caller's original particle order; the Morton sort
    is an internal locality optimisation here (the distributed production
    loop keeps states permanently sorted instead — SURVEY.md §3.5).
    """
    if state.dim != cfg.dim:
        raise ValueError(f"state dim {state.dim} != cfg.dim {cfg.dim}")
    if cell_block <= 0:
        cell_block = auto_cell_block(grid, cfg.dim)
    n = state.n
    cl = cl_mod.build(state.pos, domain, grid)
    perm = cl.perm

    pos_s = state.pos[perm]
    vel_s = state.vel[perm]
    mass_s = state.mass[perm]
    u_s = state.u[perm]
    h_s = state.h[perm]

    pos_p = _sentinel_pad(pos_s, 0.0)
    vel_p = _sentinel_pad(vel_s, 0.0)
    mass_p = _sentinel_pad(mass_s, 0.0)  # zero-mass sentinel kills all terms

    if cfg.adaptive_h:
        h_s = solve_h(cl, grid, domain, n, cell_block, pos_p, mass_p, h_s, cfg)
    rho_s, drho_dh = density_pass(cl, grid, domain, n, cell_block,
                                  pos_p, h_s, mass_p, cfg.dim)
    if cfg.grad_h:
        om_s = 1.0 + h_s / (cfg.dim * rho_s) * drho_dh
    else:
        om_s = jnp.ones_like(rho_s)
    P_s, cs_s = eos(rho_s, u_s, cfg)
    bf_s = None
    if cfg.need_divv:
        divv_s, curl_s = divcurl_pass(cl, grid, domain, n, cell_block, pos_p,
                                      vel_p, mass_p, h_s, rho_s, cfg)
        if cfg.balsara:
            bf_s = pairs.balsara_factor(divv_s, curl_s, cs_s, h_s)
    else:
        divv_s = jnp.zeros_like(rho_s)
    vf_s = pairs.visc_factor(cfg, bf=bf_s, alpha=(state.alpha[perm]
                                                  if cfg.mm_visc else None))
    if vf_s is None:
        vf_s = jnp.ones_like(rho_s)
    acc_s, du_s = force_pass(cl, grid, domain, n, cell_block, pos_p, vel_p,
                             mass_p, h_s, rho_s, P_s, cs_s, om_s, vf_s, cfg)
    if cfg.gravity:
        acc_s = acc_s + gravity_dense(pos_s, mass_s, cfg, domain)

    # scatter back to original order
    def unsort(v):
        return jnp.zeros_like(v).at[perm].set(v)

    return state._replace(
        h=unsort(h_s), rho=unsort(rho_s), P=unsort(P_s), cs=unsort(cs_s),
        acc=unsort(acc_s), du_dt=unsort(du_s), omega=unsort(om_s),
        divv=unsort(divv_s))


@partial(jax.jit, static_argnames=("grid",))
def h_saturation_count(state: ParticleState, domain: Domain, grid: Grid):
    """Particles whose solved h outgrew the cell structure (must be 0).

    The 27-cell candidate superset is only exact while the kernel support
    2h fits one cell; adaptive-h growth past the planning h_max silently
    shrinks the candidate set (round-1 advisor finding #3). Counterpart of
    the window engine's structural cap counter (wengine.capped_count) —
    the cell list has NO cap, so this counter is the only guard."""
    cell = jnp.min(domain.extent / jnp.asarray(grid.res, state.h.dtype))
    return jnp.sum(2.0 * state.h > cell)


@partial(jax.jit, static_argnames=("grid",))
def overflow_count(state: ParticleState, domain: Domain, grid: Grid):
    """Particles that did not fit their cell (must be 0 for exactness)."""
    return cl_mod.build(state.pos, domain, grid).overflow
