r"""Distributed block (individual) timesteps over the 2D PENCIL decomposition.

The pencil twin of ``dist/wrungs.py`` (which documents the scheme: global
pmin'd tick schedule, per-shard activity masking via ``rungs.mask_structure``
on this shard's sorted tables, phase-2 ghosts shipping CURRENT-BEST hydro so
the GADGET-class stale-neighbor approximation crosses shard boundaries with
zero extra communication). Everything rung-specific is identical; what
changes is the exchange topology, inherited from ``dist/pencil.py``:

* phase-1 kinematics and the phase-2 current-best hydro ride the TWO-HOP
  x-then-y ring exchanges (corner ghosts arrive via the intermediate
  shard, whose x-ghost slots were just filled with current-best values —
  so a corner ghost's j-fields are exactly its owner's current-best, the
  same guarantee the one-hop slab protocol gives);
* the tick schedule pmin and the health/closing-count psums run over BOTH
  mesh axes (``AXES``).

Scope matches integrate/rungs.py: window engine, no self-gravity, no OU
driving, ``h_predict`` off. SURVEY.md §2.1.8 (the reference integrates at
the global minimum dt; rungs are the production upgrade) + §3.5 (scale-out
decomposition).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sphax.configs import SPHConfig
from sphax.core.state import Domain, ParticleState
from sphax.dist.pencil import (AX0, AX1, AXES, PencilSpec, _exchange_and_build,
                               _psum2, _ship_hydro, _ship_kinematics,
                               _wrap_other)
from sphax.integrate.rungs import mask_structure
from sphax.integrate.timestep import particle_dt
from sphax.neighbors import window as win
from sphax.physics import wengine
from sphax.physics.eos import eos

__all__ = ["make_chunk_rungs"]


def _local_derived_rungs(st: ParticleState, bf_prev, wd, routes, lo0, lo1,
                         cfg: SPHConfig, domain: Domain, spec: PencilSpec,
                         close_m, tile_block: int, use_pallas: bool):
    """One-pencil rung derived pass: kernels A/C on the activity-masked
    structure, phase-2 two-hop exchange of current-best hydro (the
    ``pencil._local_derived`` body with the rung changes of
    ``wrungs._local_derived_rungs``). ``close_m`` [nl] bool must already
    exclude padding rows. Returns (state', bf_now)."""
    nG = 2 * (spec.ghost_cap0 + spec.ghost_cap1)
    nl = st.n
    dim = st.dim
    dtype = st.pos.dtype
    wspec = spec.wspec
    comb_pos, comb_vel, comb_mass = _ship_kinematics(st, routes, lo0, lo1,
                                                     domain, spec)
    comb_u = jnp.concatenate([st.u, jnp.zeros((nG,), dtype)])
    comb_h = jnp.concatenate([st.h, jnp.ones((nG,), dtype)])
    # activity flag rides the packed gather; ghost rows are inactive by
    # construction (their owners close them on the same global tick)
    comb_flag = jnp.concatenate([close_m.astype(dtype),
                                 jnp.zeros((nG,), dtype)])
    cols = [comb_flag[:, None], comb_pos, comb_vel, comb_mass[:, None],
            comb_u[:, None], comb_h[:, None]]
    fills = [0.0] + [0.0] * (2 * dim) + [0.0, 0.0, 1.0]
    if cfg.mm_visc:
        cols.append(jnp.concatenate([st.alpha,
                                     jnp.ones((nG,), dtype)])[:, None])
        fills.append(1.0)
    g_s = win.gather_sorted_cols(jnp.concatenate(cols, axis=-1), wd, fills)
    act_s = g_s[:, 0] > 0.5
    wd_act = mask_structure(wd, wspec, act_s)
    pos_s = g_s[:, 1:1 + dim] + wd.shift_s
    vel_s = g_s[:, 1 + dim:1 + 2 * dim]
    c0 = 1 + 2 * dim
    mass_s, u_s = g_s[:, c0], g_s[:, c0 + 1]
    h_s = jnp.where(mass_s > 0, g_s[:, c0 + 2], 1.0)
    alpha_s = g_s[:, c0 + 3] if cfg.mm_visc else None

    # ---- kernel A on closing-local tiles only ----
    h_f, rho_f, om_f, bf_f, divv_f = wengine.stage_density(
        wd_act, wspec, cfg, pos_s, vel_s, mass_s, u_s, h_s, tile_block,
        use_pallas, alpha_s=alpha_s)
    fresh = jnp.stack([h_f, rho_f, om_f, bf_f, divv_f],
                      axis=-1)[wd.inv][:nl]                       # [nl, 5]

    # current-best LOCAL hydro: fresh where this row closed, stale otherwise
    cm = close_m
    h_cb = jnp.where(cm, fresh[:, 0], st.h)
    rho_cb = jnp.where(cm, fresh[:, 1], st.rho)
    om_cb = jnp.where(cm, fresh[:, 2], st.omega)
    bf_cb = jnp.where(cm, fresh[:, 3], bf_prev)
    divv_cb = jnp.where(cm, fresh[:, 4], st.divv)
    # predicted-u EOS on the current-best rho (st.u was advanced at each
    # particle's last half-kick) — the GADGET-class neighbor prediction
    P_cb, cs_cb = eos(rho_cb, st.u, cfg)

    # ---- phase 2: CURRENT-BEST owner hydro over the two-hop routes ----
    ph2 = ((h_cb, 1.0), (rho_cb, 1.0), (P_cb, 0.0), (cs_cb, 0.0),
           (om_cb, 1.0), (bf_cb, 0.0))
    hyd_cols = _ship_hydro(ph2, routes, spec)
    hyd = jnp.stack(hyd_cols, axis=-1)                            # [nc, 6]
    hyd_s = win.gather_sorted(hyd, wd)
    h_s2 = jnp.where(mass_s > 0, hyd_s[:, 0], 1.0)
    rho_s2 = jnp.maximum(hyd_s[:, 1], 1e-15)
    om_s2 = jnp.where(mass_s > 0, hyd_s[:, 4], 1.0)

    # ---- kernel C on the same masked structure ----
    acc_s, du_s = wengine.stage_forces(
        wd_act, wspec, cfg, pos_s, vel_s, mass_s, h_s2, rho_s2, hyd_s[:, 2],
        hyd_s[:, 3], om_s2, hyd_s[:, 5], tile_block, use_pallas)
    out = jnp.stack([du_s] + [acc_s[:, d] for d in range(dim)],
                    axis=-1)[wd.inv][:nl]                         # [nl, 1+D]
    return st._replace(
        h=h_cb, rho=rho_cb, P=P_cb, cs=cs_cb, omega=om_cb,
        du_dt=jnp.where(cm, out[:, 0], st.du_dt),
        acc=jnp.where(cm[:, None], out[:, 1:1 + dim], st.acc),
        divv=divv_cb), bf_cb


def _visc_factor_seed(st: ParticleState, cuts0, cuts1, domain: Domain,
                      spec: PencilSpec, cfg: SPHConfig, tile_block: int,
                      use_pallas: bool):
    """One full (unmasked) kernel-A pass to seed the stale viscosity-factor
    carry — the pencil twin of wrungs._visc_factor_seed."""
    if not cfg.visc_factor_on:
        return jnp.ones_like(st.h)
    # the seed's dropped-ghost count is intentionally discarded: the first
    # in-chunk rebuild runs on identical state/cuts and reports the same
    # drop via the health carry, aborting the chunk (wrungs pattern)
    nG = 2 * (spec.ghost_cap0 + spec.ghost_cap1)
    dim = st.dim
    dtype = st.pos.dtype
    wd, routes, lo0, lo1, _ = _exchange_and_build(st, cuts0, cuts1, domain,
                                                  spec)
    comb_pos, comb_vel, comb_mass = _ship_kinematics(st, routes, lo0, lo1,
                                                     domain, spec)
    cols = [comb_pos, comb_vel, comb_mass[:, None],
            jnp.concatenate([st.u, jnp.zeros((nG,), dtype)])[:, None],
            jnp.concatenate([st.h, jnp.ones((nG,), dtype)])[:, None]]
    fills = [0.0] * (2 * dim) + [0.0, 0.0, 1.0]
    if cfg.mm_visc:
        cols.append(jnp.concatenate([st.alpha,
                                     jnp.ones((nG,), dtype)])[:, None])
        fills.append(1.0)
    g_s = win.gather_sorted_cols(jnp.concatenate(cols, axis=-1), wd, fills)
    pos_s = g_s[:, :dim] + wd.shift_s
    mass_s = g_s[:, 2 * dim]
    h_s = jnp.where(mass_s > 0, g_s[:, 2 * dim + 2], 1.0)
    _, _, _, bf_s, _ = wengine.stage_density(
        wd, spec.wspec, cfg, pos_s, g_s[:, dim:2 * dim], mass_s,
        g_s[:, 2 * dim + 1], h_s, tile_block, use_pallas,
        alpha_s=(g_s[:, 2 * dim + 3] if cfg.mm_visc else None))
    return bf_s[wd.inv][:st.n]


def make_chunk_rungs(mesh: Mesh, cfg: SPHConfig, spec: PencilSpec,
                     nspans: int, n_rungs: int = 4, rebuild_every: int = 2,
                     use_pallas: Optional[bool] = None, tile_block: int = 16):
    """Jitted pencil block-timestep chunk: ``nspans`` spans of
    2^{n_rungs-1} globally-synchronized base ticks (see module docstring;
    same rung discipline as ``wrungs.make_chunk_rungs``, same structure-
    reuse/health contract as ``pencil.make_chunk``).

    Returns (state, cuts0, cuts1, domain) -> (state, dts, nacts, health,
    dt_viol) with the wrungs output contract (health psum'd over AXES).
    """
    if cfg.gravity:
        raise NotImplementedError(
            "block timesteps + self-gravity: the PM/direct mesh stage is a "
            "global solve with no tile skipping to exploit — run global-dt")
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    span_ticks = 1 << (n_rungs - 1)
    if span_ticks % rebuild_every:
        raise ValueError("rebuild_every must divide 2^(n_rungs-1)")

    def local_chunk(st: ParticleState, cuts0, cuts1, domain: Domain):
        dtype = st.pos.dtype
        real = st.mass > 0
        bf0 = _visc_factor_seed(st, cuts0, cuts1, domain, spec, cfg,
                                tile_block, use_pallas)

        def span(carry, _):
            st, bf_prev, hmax = carry
            # span sync: padding rows pin to dt_max so the pmin ignores them
            dt_des0 = jnp.where(real, particle_dt(st, cfg), cfg.dt_max)
            dt_min = jax.lax.pmin(jnp.min(dt_des0), AXES)
            rung0 = jnp.clip(
                jnp.floor(jnp.log2(jnp.maximum(dt_des0 / dt_min, 1.0))),
                0, n_rungs - 1).astype(jnp.int32)

            def tick(carry_t, k):
                st, bf_prev, rung, wd, routes, lo0, lo1 = carry_t
                dt_r = dt_min * jnp.exp2(rung.astype(dtype))
                period_mask = (1 << rung) - 1      # k % 2^r == k & mask
                open_m = (k & period_mask) == 0
                half = jnp.where(open_m, 0.5 * dt_r, 0.0)
                vel = st.vel + half[:, None] * st.acc
                u = jnp.maximum(st.u + half * st.du_dt, cfg.u_floor)
                st = st._replace(pos=st.pos + dt_min * vel, vel=vel, u=u)

                close_m = (((k + 1) & period_mask) == 0) & real
                if cfg.h_predict and cfg.adaptive_h:
                    # per-closer continuity predictor (integrate/rungs.py
                    # close_tick); local rows only — ghost closers are
                    # re-predicted by their owners (phase-2 current-best)
                    fac = jnp.clip(1.0 + (dt_r / cfg.dim) * st.divv,
                                   0.9, 1.1)
                    st = st._replace(h=jnp.where(close_m, st.h * fac,
                                                 st.h))
                st, bf_now = _local_derived_rungs(
                    st, bf_prev, wd, routes, lo0, lo1, cfg, domain, spec,
                    close_m, tile_block, use_pallas)
                half = jnp.where(close_m, 0.5 * dt_r, 0.0)
                vel = st.vel + half[:, None] * st.acc
                u = jnp.maximum(st.u + half * st.du_dt, cfg.u_floor)
                st = st._replace(vel=vel, u=u)
                if cfg.mm_visc:
                    from sphax.physics import pairs

                    a_new = pairs.mm_alpha_update(st.alpha, st.divv, st.h,
                                                  st.cs, dt_r, cfg)
                    st = st._replace(alpha=jnp.where(close_m, a_new,
                                                     st.alpha))

                # rung update on closers (Hernquist-Katz alignment) + the
                # dt-violation counter (psum'd once at chunk end)
                dt_des = jnp.where(real, particle_dt(st, cfg), cfg.dt_max)
                mid = (k + 1) < span_ticks
                viol = jnp.sum(
                    (close_m & (dt_des < dt_min)).astype(jnp.int32)
                    ) * mid.astype(jnp.int32)
                r_des = jnp.clip(
                    jnp.floor(jnp.log2(jnp.maximum(dt_des / dt_min, 1.0))),
                    0, n_rungs - 1).astype(jnp.int32)
                kp = k + 1
                align = sum(((kp & ((1 << j) - 1)) == 0).astype(jnp.int32)
                            for j in range(1, n_rungs))
                r_new = jnp.where(r_des < rung, r_des,
                                  jnp.minimum(r_des, align))
                rung = jnp.where(close_m, r_new, rung)
                nact = jnp.sum(close_m.astype(jnp.int32))
                return (st, bf_now, rung, wd, routes, lo0, lo1), (
                    dt_min, nact, viol)

            def rebuild_blk(carry_r, r):
                st, bf_prev, rung, hmax = carry_r
                st = st._replace(pos=_wrap_other(st.pos, domain))
                wd, routes, lo0, lo1, dropped = _exchange_and_build(
                    st, cuts0, cuts1, domain, spec)
                ks = r * rebuild_every + jnp.arange(rebuild_every,
                                                    dtype=jnp.int32)
                (st, bf_prev, rung, _, _, _, _), outs = jax.lax.scan(
                    tick, (st, bf_prev, rung, wd, routes, lo0, lo1), ks)
                health = (jnp.asarray(dropped, jnp.int32),
                          wd.overflow.astype(jnp.int32))
                hmax = tuple(jnp.maximum(a, b)
                             for a, b in zip(hmax, health))
                return (st, bf_prev, rung, hmax), outs

            (st, bf_prev, _, hmax), (dts, nacts, viols) = jax.lax.scan(
                rebuild_blk, (st, bf_prev, rung0, hmax),
                jnp.arange(span_ticks // rebuild_every, dtype=jnp.int32))
            return (st, bf_prev, hmax), (dts.reshape(-1), nacts.reshape(-1),
                                         jnp.sum(viols))

        zero = jax.lax.pcast(jnp.zeros((), jnp.int32), AXES, to="varying")
        (st, _, hmax), (dts, nacts, viol) = jax.lax.scan(
            span, (st, bf0, (zero, zero)), None, length=nspans)
        health = tuple(_psum2(hh) for hh in hmax)
        nacts = _psum2(nacts.reshape(-1))
        return st, dts.reshape(-1), nacts, health, _psum2(jnp.sum(viol))

    sm = jax.shard_map(local_chunk, mesh=mesh,
                       in_specs=(P((AX0, AX1)), P(), P(), P()),
                       out_specs=(P((AX0, AX1)), P(), P(), (P(), P()), P()),
                       check_vma=False)  # pallas out_shapes have no vma
    return jax.jit(sm)
