"""Sorted-window execution engine (SURVEY.md §3.4 realised; hot path).

Consumes the structure from sphax.neighbors.window: tiles of T consecutive
Morton-sorted rows interact with a contiguous candidate window of ``wmax``
sorted rows. Because images are pre-shifted, pair displacement is a plain
subtraction (no min-image), and window overruns are provably outside kernel
support or zero-mass, so the inner loops are maskless dense [T, W] vector
ops — exactly the shape the Pallas kernels consume (physics/pallas_kernels).

This module provides the jnp fallback implementation (used for CPU tests and
as the Pallas reference); ``update_derived`` dispatches to Pallas on TPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sphax.configs import SPHConfig
from sphax.core.state import Domain, ParticleState
from sphax.neighbors import window as win
from sphax.neighbors.window import WindowData, WindowSpec
from sphax.physics import pairs
from sphax.physics.eos import eos


def dedup_mask(w_lo_block, n_seg: int, S: int):
    """First-occurrence mask over a tile's stacked segments.

    Tiles spanning several pencils produce OVERLAPPING segment ranges (the
    per-tile union widens each range); a candidate row must count exactly
    once, so segment s keeps row k only if no earlier segment's clamped
    window [w_lo[s'], w_lo[s']+S) already contains k. With this mask the
    fixed-width windows are exact: every kept extra row is provably beyond
    the kernel support (next-but-one cells in row-major order).
    """
    ar = jnp.arange(S, dtype=jnp.int32)
    k = w_lo_block[..., None] + ar                       # [TB, n_seg, S]
    keep = jnp.ones(k.shape, bool)
    for s in range(1, n_seg):
        dup = jnp.zeros(k.shape[:-2] + (S,), bool)
        for sp in range(s):
            lo = w_lo_block[..., sp, None]
            dup |= (k[..., s, :] >= lo) & (k[..., s, :] < lo + S)
        keep = keep.at[..., s, :].set(~dup)
    return keep.reshape(k.shape[:-2] + (n_seg * S,))


def _tile_pass(kernel_fn, wd: WindowData, spec: WindowSpec, own_fields,
               win_fields, tile_block: int, mass_axis: int = None):
    """Map kernel_fn over blocks of tiles.

    own_fields/win_fields: [Ns, ...] sorted arrays. kernel_fn(own, winf)
    gets own [TB, T, ...] and window [TB, n_seg*S, ...] gathers, returns a
    pytree of [TB, T, ...]. ``mass_axis`` names the win_fields entry that
    carries the pair weight; it is zeroed on duplicate candidates.
    """
    # the jnp path maps over row-GROUPS (= tiles when spec.rgroups == 1):
    # w_lo/w_nact are per-group, and treating each group as an independent
    # "tile" of spec.group rows reproduces the kernels' per-group windows
    T, S, nt = spec.group, spec.wseg, spec.n_groups
    n_seg = spec.n_seg
    # clamp the block so the live [TB, n_seg * S] per-field intermediates
    # stay cache-sized: tiny problems plan whole-array segments (wseg ~
    # n_sorted), where TB=16 was measured 20x slower than TB=4 on this
    # path (pure cache thrash, not compile)
    TB = max(1, min(tile_block, 600_000 // (n_seg * S)))
    nb = -(-nt // TB)

    def slice_win(f, lo):
        return jax.lax.dynamic_slice_in_dim(f, lo, S, axis=0)

    def compute(t0):
        own = tuple(
            jax.lax.dynamic_slice_in_dim(f, t0 * T, TB * T, axis=0)
            .reshape((TB, T) + f.shape[1:]) for f in own_fields)
        w_lo = jax.lax.dynamic_slice_in_dim(wd.w_lo, t0, TB, axis=0)
        # [TB, n_seg] starts -> per field [TB, n_seg * S] stacked candidates
        winf = [
            jax.vmap(jax.vmap(lambda lo, ff=f: slice_win(ff, lo)))(w_lo)
            .reshape((TB, n_seg * S) + f.shape[1:])
            for f in win_fields]
        if mass_axis is not None and n_seg > 1:
            keep = dedup_mask(w_lo, n_seg, S)
            winf[mass_axis] = jnp.where(keep, winf[mass_axis], 0.0)
        return kernel_fn(own, tuple(winf))

    zshape = jax.eval_shape(compute, jax.ShapeDtypeStruct((), jnp.int32))
    # a zero that carries the INPUTS' device-variance: under shard_map the
    # cond branches must agree on varying-ness, and plain jnp.zeros would
    # be replicated while compute's outputs vary per shard
    zvar = own_fields[0].reshape(-1)[0] * 0

    def body(b):
        t0 = jnp.minimum(b * TB, nt - TB)
        # Every _tile_pass output channel multiplies the candidate masses,
        # and a block whose tiles have no ACTIVE candidate range sums only
        # zero-mass / beyond-support rows — its outputs are exactly zero.
        # Skipping those blocks (lax.cond: one branch executes) is therefore
        # value-identical, and in the distributed slab engine, where ~half
        # of n_local is trash-band padding plus empty ghost capacity, it
        # roughly halves the jnp-path pair math (the Pallas kernels get the
        # same effect per-segment from w_nact predication).
        nact = jax.lax.dynamic_slice_in_dim(wd.w_nact, t0, TB, axis=0)
        return jax.lax.cond(
            jnp.any(nact > 0), compute,
            lambda _: jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype) + zvar.astype(s.dtype),
                zshape), t0)

    out = jax.lax.map(body, jnp.arange(nb, dtype=jnp.int32))

    def unblock(o):  # [nb, TB, T, ...] -> [Ns, ...] (overlap-safe: rows
        # recomputed by the clamped final block hold identical values)
        flat = o.reshape((nb * TB * T,) + o.shape[3:])
        if nb * TB == nt:
            return flat
        # last block was clamped to start at nt-TB; reassemble
        head = flat[: (nb - 1) * TB * T]
        tail = flat[(nb - 1) * TB * T:]
        keep = nt * T - (nb - 1) * TB * T
        return jnp.concatenate([head, tail[-keep:]])

    return jax.tree_util.tree_map(unblock, out)


def _geom(pos_own, pos_win):
    """Plain displacement — images are pre-shifted, no min-image needed."""
    dx = pos_own[:, :, None, :] - pos_win[:, None, :, :]
    r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
    return dx, r


# ---------------------------------------------------------------------------
# jnp tile passes (the Pallas kernels implement the same contracts)
# ---------------------------------------------------------------------------


def density_pass(wd, spec, pos_s, mass_s, h_s, dim, tile_block):
    def kfn(own, winf):
        (pos_i, h_i), (pos_j, m_j) = own, winf
        _, r = _geom(pos_i, pos_j)
        w, dwdh = pairs.density_terms(r, h_i[..., None], m_j[:, None, :], dim)
        return jnp.sum(w, -1), jnp.sum(dwdh, -1)

    return _tile_pass(kfn, wd, spec, (pos_s, h_s), (pos_s, mass_s),
                      tile_block, mass_axis=1)


def solve_h(wd, spec, pos_s, mass_s, h0_s, cfg: SPHConfig, tile_block):
    dim = cfg.dim

    def it(_, h_s):
        rho, drho_dh = density_pass(wd, spec, pos_s, mass_s, h_s, dim,
                                    tile_block)
        rho = jnp.maximum(rho, 1e-30)
        m_safe = jnp.maximum(mass_s, 1e-30)
        rho_h = m_safe * (cfg.eta / h_s) ** dim
        phi = rho - rho_h
        dphi = drho_dh + dim * rho_h / h_s
        dphi = jnp.where(jnp.abs(dphi) < 1e-300, -1e-300, dphi)
        dh = jnp.clip(-phi / dphi, -0.5 * h_s, 0.5 * h_s)
        # structural cap: the window covers neighbours to spec.cutoff only
        return jnp.minimum(h_s + dh, 0.5 * spec.cutoff)

    return jax.lax.fori_loop(0, cfg.newton_iters, it, h0_s)


def divcurl_pass(wd, spec, pos_s, vel_s, mass_s, h_s, rho_s, cfg,
                 tile_block):
    """SPH div/curl gather estimators per sorted row (jnp tile pass)."""
    dim = cfg.dim

    def kfn(own, winf):
        (pos_i, vel_i, h_i), (pos_j, vel_j, m_j) = own, winf
        dx, r = _geom(pos_i, pos_j)
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

    divv, curl_mag = _tile_pass(kfn, wd, spec, (pos_s, vel_s, h_s),
                                (pos_s, vel_s, mass_s), tile_block,
                                mass_axis=2)
    rho_safe = jnp.maximum(rho_s, 1e-15)
    return divv / rho_safe, curl_mag / rho_safe


def gravity_short_pass(wd, spec, pos_s, mass_s, cfg: SPHConfig,
                       domain: Domain, tile_block):
    """Screened P3M short-range gravity over the window candidates (the
    4.5 r_s tail provably fits inside spec.cutoff — pm.rs_traced clamps the
    split scale, so no pair is ever silently truncated)."""
    from sphax.physics import pm

    rs = pm.rs_traced(cfg, domain, pos_s.dtype, cutoff=spec.cutoff)
    eps = jnp.asarray(cfg.grav_eps, pos_s.dtype)

    def kfn(own, winf):
        (pos_i,), (pos_j, m_j) = own, winf
        dx, r = _geom(pos_i, pos_j)
        f = pm.short_range_factor(r, rs, eps)
        # hard-cut at the structure's coverage radius: unlike the SPH
        # kernels, the erfc screening is not exactly zero there, and junk
        # window rows beyond the true range must contribute exactly nothing
        # (the discontinuity is the split residual ~erfc(2.25) ~ 1e-3)
        f = jnp.where((r > 0.0) & (r <= spec.cutoff), f, 0.0)
        f = f * m_j[:, None, :]
        return -float(cfg.G) * jnp.sum(f[..., None] * dx, axis=-2)

    return _tile_pass(kfn, wd, spec, (pos_s,), (pos_s, mass_s), tile_block,
                      mass_axis=1)


def force_pass(wd, spec, pos_s, vel_s, mass_s, h_s, rho_s, P_s, cs_s, om_s,
               bf_s, cfg: SPHConfig, tile_block):
    def kfn(own, winf):
        if cfg.visc_factor_on:
            (pos_i, vel_i, h_i, rho_i, P_i, cs_i, om_i, bf_i) = own
            (pos_j, vel_j, m_j, h_j, rho_j, P_j, cs_j, om_j, bf_j) = winf
        else:
            (pos_i, vel_i, h_i, rho_i, P_i, cs_i, om_i) = own
            (pos_j, vel_j, m_j, h_j, rho_j, P_j, cs_j, om_j) = winf
            bf_i = bf_j = None
        dx, r = _geom(pos_i, pos_j)
        dv = vel_i[:, :, None, :] - vel_j[:, None, :, :]
        e = lambda a: a[..., None]
        f = lambda a: a[:, None, :]
        fcoef, du = pairs.force_terms(
            dx, r, dv, e(h_i), f(h_j), e(rho_i), f(rho_j), e(P_i), f(P_j),
            e(cs_i), f(cs_j), e(om_i), f(om_j), f(m_j), cfg,
            bf_i=(e(bf_i) if cfg.visc_factor_on else None),
            bf_j=(f(bf_j) if cfg.visc_factor_on else None))
        acc = -jnp.sum(fcoef[..., None] * dx, axis=-2)
        return acc, jnp.sum(du, -1)

    ofields = [pos_s, vel_s, h_s, rho_s, P_s, cs_s, om_s]
    wfields = [pos_s, vel_s, mass_s, h_s, rho_s, P_s, cs_s, om_s]
    if cfg.visc_factor_on:
        ofields.append(bf_s)
        wfields.append(bf_s)
    return _tile_pass(kfn, wd, spec, tuple(ofields), tuple(wfields),
                      tile_block, mass_axis=2)


# ---------------------------------------------------------------------------
# full derived pass
# ---------------------------------------------------------------------------


def stage_density(wd, spec: WindowSpec, cfg: SPHConfig, pos_s, vel_s, mass_s,
                  u_s, h_s, tile_block: int = 16, use_pallas: bool = False,
                  alpha_s=None):
    """Density stage: Newton-h + density + Omega + viscosity factor.

    Returns (h, rho, om, vf, divv) in SORTED order, valid on OWNER rows only
    (ghost rows ran on junk windows) — the caller fixes ghosts with one
    packed mirror gather (single device) or a phase-2 exchange + re-gather
    (distributed slab engine, sphax/dist/wslab.py). ``vf`` is the combined
    per-particle viscosity multiplier (Balsara and/or Morris-Monaghan
    alpha(t), see pairs.visc_factor); ``divv`` the SPH div-v estimate (zeros
    unless cfg.need_divv).
    """
    if cfg.h_predict and cfg.adaptive_h:
        # the continuity predictor (leapfrog.step) multiplies h by up to 1.1
        # AFTER the previous walk's clamp, so the incoming h can exceed the
        # structural cap — and windows only cover neighbours to spec.cutoff,
        # so walking at h > cutoff/2 silently truncates the sums for
        # cap-pinned particles (round-3 advisor). Clamp BEFORE the walk, on
        # both the Pallas and jnp paths — real rows only (trash/pad rows
        # must pass through untouched; their h=1 fill only feeds their own
        # discarded outputs).
        h_s = jnp.where(mass_s > 0,
                        jnp.minimum(h_s, 0.5 * spec.cutoff), h_s)
    if use_pallas:
        from sphax.physics import pallas_kernels as pk

        if cfg.need_divv:
            (h_s, rho_s, drho_dh, div_sum,
             curl_sum) = pk.solve_h_density(wd, spec, pos_s, mass_s, h_s,
                                            cfg, vel_s=vel_s, u_s=u_s)
        else:
            h_s, rho_s, drho_dh = pk.solve_h_density(wd, spec, pos_s,
                                                     mass_s, h_s, cfg)
    else:
        if cfg.adaptive_h and not cfg.h_predict:
            h_s = solve_h(wd, spec, pos_s, mass_s, h_s, cfg, tile_block)
        rho_s, drho_dh = density_pass(wd, spec, pos_s, mass_s, h_s, cfg.dim,
                                      tile_block)
    rho_s = jnp.maximum(rho_s, 1e-15)
    if cfg.grad_h:
        om_s = 1.0 + h_s / (cfg.dim * rho_s) * drho_dh
    else:
        om_s = jnp.ones_like(rho_s)
    bf_s = None
    if cfg.need_divv:
        if use_pallas:
            # div/curl sums came fused out of kernel A (windows reused)
            divv_s = -div_sum / rho_s
            curl_s = curl_sum / rho_s
        else:
            divv_s, curl_s = divcurl_pass(wd, spec, pos_s, vel_s, mass_s,
                                          h_s, rho_s, cfg, tile_block)
        if cfg.balsara:
            _, cs_pre = eos(rho_s, u_s, cfg)
            bf_s = pairs.balsara_factor(divv_s, curl_s, cs_pre, h_s)
    else:
        divv_s = jnp.zeros_like(rho_s)
    vf_s = pairs.visc_factor(cfg, bf=bf_s, alpha=alpha_s)
    if vf_s is None:
        vf_s = jnp.ones_like(rho_s)
    if cfg.h_predict and cfg.adaptive_h:
        # lagged Newton correction (the elementwise twin of kernel A's
        # newton_update, same clamps): one update toward consistency from
        # THIS walk's sums, applied to the h that is carried/used forward.
        # rho/om/divv stay evaluated at the predicted h — the O(dh)
        # inconsistency is the documented h_predict approximation.
        m_safe = jnp.maximum(mass_s, 1e-30)
        eta_d = float(cfg.eta) ** cfg.dim
        hcap = 0.5 * float(spec.cutoff)
        rho_c = jnp.maximum(rho_s, 1e-30)
        rho_h = m_safe * eta_d / h_s ** cfg.dim
        phi = rho_c - rho_h
        dphi = drho_dh + cfg.dim * rho_h / h_s
        dphi = jnp.where(jnp.abs(dphi) < 1e-30, -1e-30, dphi)
        dh = jnp.clip(-phi / dphi, -0.5 * h_s, 0.5 * h_s)
        # real rows only: trash/pad rows (mass 0, rho floored) would be
        # driven to h = 0.5, breaking the trash-rows-inert invariant the
        # kernels maintain (round-3 advisor) — pass them through untouched
        h_s = jnp.where(mass_s > 0, jnp.minimum(h_s + dh, hcap), h_s)
    return h_s, rho_s, om_s, vf_s, divv_s


def stage_forces(wd, spec: WindowSpec, cfg: SPHConfig, pos_s, vel_s, mass_s,
                 h_s, rho_s, P_s, cs_s, om_s, bf_s, tile_block: int = 16,
                 use_pallas: bool = False, grav=None):
    """Force stage: symmetrized pressure + viscosity + du/dt (sorted order).

    All j-side inputs must already be owner-correct on every sorted row.
    ``grav=(rs, eps)`` fuses the screened P3M short-range gravity into the
    Pallas pair walk (Pallas path only — the jnp path keeps the separate
    ``gravity_short_pass``; callers pass grav only when use_pallas)."""
    if use_pallas:
        from sphax.physics import pallas_kernels as pk

        return pk.forces(wd, spec, pos_s, vel_s, mass_s, h_s, rho_s,
                         P_s, cs_s, om_s, bf_s, cfg, grav=grav)
    assert grav is None, "P3M fusion is a Pallas-path feature"
    return force_pass(wd, spec, pos_s, vel_s, mass_s, h_s, rho_s,
                      P_s, cs_s, om_s, bf_s, cfg, tile_block)


def derived_with(state: ParticleState, wd, cfg: SPHConfig, domain: Domain,
                 spec: WindowSpec, tile_block: int = 16,
                 use_pallas: bool = False) -> ParticleState:
    """Derived pass against a PRE-BUILT (possibly stale) window structure.

    Valid under the Verlet-skin contract: spec.cutoff exceeds the physical
    support 2 h_max, and total drift since the build is under half the slack
    (window.refresh_pos re-derives image positions from current ones).
    """
    if state.dim != cfg.dim:
        raise ValueError(f"state dim {state.dim} != cfg.dim {cfg.dim}")
    n = state.n
    dim = state.dim
    # ONE packed input gather (pos/vel/mass/u/h[/alpha]); pos gets the image
    # shifts added back (= refresh_pos on the packed columns)
    cols = [state.pos, state.vel, state.mass[:, None], state.u[:, None],
            state.h[:, None]]
    fills = [0.0] * (2 * dim) + [0.0, 0.0, 1.0]
    if cfg.mm_visc:
        cols.append(state.alpha[:, None])
        fills.append(1.0)
    g_s = win.gather_sorted_cols(jnp.concatenate(cols, axis=-1), wd, fills)
    pos_s = g_s[:, :dim] + wd.shift_s
    vel_s = g_s[:, dim:2 * dim]
    mass_s = g_s[:, 2 * dim]
    u_s = g_s[:, 2 * dim + 1]
    h_s = g_s[:, 2 * dim + 2]
    alpha_s = g_s[:, 2 * dim + 3] if cfg.mm_visc else None
    h_s, rho_s, om_s, bf_s, divv_s = stage_density(
        wd, spec, cfg, pos_s, vel_s, mass_s, u_s, h_s, tile_block,
        use_pallas, alpha_s=alpha_s)
    # one PACKED owner-mirror gather fixes all four window-shipped scalars
    # at once — per-field gathers were ~25% of step time at N=1e6 (divv is
    # only consumed per-OWNER-row, so it skips the mirror)
    mirrored = jnp.stack([h_s, rho_s, om_s, bf_s], axis=-1)[wd.src]
    h_s, rho_s, om_s, bf_s = (mirrored[:, 0], mirrored[:, 1], mirrored[:, 2],
                              mirrored[:, 3])
    P_s, cs_s = eos(rho_s, u_s, cfg)
    grav = None
    if cfg.gravity and cfg.grav_solver == "p3m":
        from sphax.physics import pm

        rs_p3m = pm.rs_traced(cfg, domain, pos_s.dtype, cutoff=spec.cutoff)
        if use_pallas:
            # fuse the screened short range into the Pallas force walk
            # (windows already resident; the jnp path keeps the separate
            # gravity_short_pass below)
            grav = (rs_p3m, jnp.asarray(cfg.grav_eps, pos_s.dtype))
    acc_s, du_s = stage_forces(wd, spec, cfg, pos_s, vel_s, mass_s, h_s,
                               rho_s, P_s, cs_s, om_s, bf_s, tile_block,
                               use_pallas, grav=grav)

    if cfg.gravity:
        if cfg.grav_solver == "p3m":
            # O(N log N): FFT mesh long-range + screened short-range over
            # the SAME window candidates as the SPH forces. Proper Ewald
            # boundary conditions on periodic boxes (unlike the min-image
            # direct sum), free-space Hockney convolution on open ones.
            if use_pallas:
                # scatter-free sorted-order CIC (pm_sorted brick-matmul
                # scan): XLA:TPU scatter is serialization-bound, ~60% of
                # the whole mesh stage (BASELINE.md round-3 split). The
                # fallback-capacity counter is a structural invariant like
                # h_capped — surfaced via wengine.mesh_fallback_count, not
                # threaded through the hot path.
                from sphax.physics import pm_sorted

                plan = pm_sorted.plan_mesh(spec, int(cfg.grav_mesh))
                acc_gs, _mesh_drop = pm.mesh_accel_sorted(
                    pos_s, mass_s, wd.is_real, cfg, domain, plan,
                    rs=rs_p3m)
                acc_s = acc_s + acc_gs
                acc_g = None
            else:
                acc_g = pm.mesh_accel(state.pos, state.mass, cfg, domain,
                                      rs=rs_p3m)
            if grav is None:
                short_s = gravity_short_pass(wd, spec, pos_s, mass_s, cfg,
                                             domain, tile_block)
                acc_g = acc_g + short_s[wd.inv]
        elif use_pallas and not any(domain.periodic_axes(state.dim)):
            # direct sum via the Pallas kernel (open-boundary convention)
            from sphax.physics import pallas_kernels as pk

            acc_g = pk.gravity(state.pos, state.mass, cfg)
        else:
            # direct sum, min-image on periodic domains (matches the
            # reference_cpu parity convention; P3M is the Ewald-correct
            # scalable alternative)
            from sphax.physics.clist import gravity_dense
            acc_g = gravity_dense(state.pos, state.mass, cfg, domain)
    else:
        acc_g = None

    # one packed unsort gather (inverse permutation) for all outputs
    cols = [h_s, rho_s, P_s, cs_s, om_s, du_s, divv_s] + [
        acc_s[:, d] for d in range(state.dim)]
    out = jnp.stack(cols, axis=-1)[wd.inv]
    acc = out[:, 7:7 + state.dim]
    if acc_g is not None:
        acc = acc + acc_g
    return state._replace(h=out[:, 0], rho=out[:, 1], P=out[:, 2],
                          cs=out[:, 3], omega=out[:, 4], acc=acc,
                          du_dt=out[:, 5], divv=out[:, 6])


@partial(jax.jit, static_argnames=("cfg", "spec", "tile_block", "use_pallas"))
def update_derived(state: ParticleState, cfg: SPHConfig, domain: Domain,
                   spec: WindowSpec, tile_block: int = 16,
                   use_pallas: bool = False) -> ParticleState:
    """Window-engine analogue of dense/clist update_derived (same math).

    Ignores cfg.h_predict: this is the cold-start/diagnostic entry, and the
    predictor contract requires an already-converged h — so the one-shot
    pass always runs the full Newton solve.
    """
    if cfg.h_predict:
        import dataclasses

        cfg = dataclasses.replace(cfg, h_predict=False)
    wd = win.build(state.pos, domain, spec)
    return derived_with(state, wd, cfg, domain, spec, tile_block, use_pallas)


@partial(jax.jit, static_argnames=("cfg", "spec", "nsteps", "rebuild_every",
                                   "tile_block", "use_pallas", "drive_spec",
                                   "adaptive_rebuild", "skin_safety"))
def simulate(state: ParticleState, cfg: SPHConfig, domain: Domain,
             spec: WindowSpec, nsteps: int, rebuild_every: int = 2,
             tile_block: int = 16, use_pallas: bool = True,
             drive=None, drive_spec=None, adaptive_rebuild: int = 0,
             skin_safety: float = 0.8):
    """Window-engine production loop (nested lax.scan, zero host trips).

    Outer iteration: wrap positions into the box and rebuild the window
    structure; inner iterations: ``rebuild_every`` KDK steps against the
    fixed structure with UNWRAPPED drift (a wrap teleports a particle to the
    far side of the box, which a stale structure cannot represent — the same
    reason the slab engine wraps only at redistribution; spec.cutoff's
    margin over 2 h_max must cover the unwrapped drift between rebuilds).

    ``adaptive_rebuild > 0`` switches to DRIFT-GATED rebuilds (the rungs.py
    scheme): one flat scan where each step rebuilds only when the
    accumulated drift since the last build threatens the Verlet-skin
    contract (2 * max_drift >= skin_safety * (spec.cutoff - 2 * max h)) or
    after ``adaptive_rebuild`` steps of staleness. Under the skin contract
    the stale structure's candidate set is a superset of the true neighbor
    set, so this changes WHEN builds happen, never the pair set —
    trajectories match fixed-cadence to summation-order roundoff
    (tests/unit/test_wengine_adaptive.py). The gate runs on the PREVIOUS
    step's end-of-step positions (one dt_max-bounded drift below the
    threshold, absorbed by skin_safety < 1), which keeps the rebuild at the
    step top where the wrap is legal (before any kick uses stale acc).
    ``rebuild_every`` is ignored in this mode.

    Returns (state, drive, dts, overflow) — ``overflow`` is the MAX
    per-rebuild structure overflow across the whole run (tiles past wseg +
    dropped ghosts); callers must treat nonzero as a hard error, since a
    saturated structure silently deletes pairs (round-1 advisor #2).
    """
    from sphax.integrate import leapfrog
    from sphax.integrate.timestep import local_dt
    from sphax.physics import driving as drv_mod

    if not adaptive_rebuild and nsteps % rebuild_every:
        raise ValueError("nsteps must be a multiple of rebuild_every")

    def step_with(st, wd, dr, dt):
        if drive_spec is not None:
            modes = jnp.asarray(drive_spec.modes, st.pos.dtype)
            dr = drv_mod.update(dr, modes, dt, drive_spec.tau,
                                drive_spec.accel_rms, drive_spec.box_size)

            def derived(s):
                out = derived_with(s, wd, cfg, domain, spec, tile_block,
                                   use_pallas)
                a = drv_mod.acceleration(s.pos, dr, modes,
                                         drive_spec.box_size)
                return out._replace(acc=out.acc + a)
        else:
            derived = lambda s: derived_with(s, wd, cfg, domain, spec,
                                             tile_block, use_pallas)
        st, dt = leapfrog.step(st, cfg, domain, derived, dt=dt, wrap=False)
        return st, dr, dt

    if drive is None:
        from sphax.physics.driving import DriveState
        drive = DriveState(jnp.zeros((1, 3)), jnp.zeros((1, 3)),
                           jax.random.PRNGKey(0))

    if adaptive_rebuild:
        state = state._replace(pos=domain.wrap(state.pos))
        wd0 = win.build(state.pos, domain, spec)
        dtype = state.pos.dtype

        def astep(carry, _):
            st, wd, ref, since, dr = carry
            dt = local_dt(st, cfg)
            # KDK drifts by dt * (v + dt/2 * a) with the CARRIED acc, so
            # this step's end-of-drift displacement from the build
            # positions is known EXACTLY before the walk; the drive kick
            # only perturbs vel after the drift. Rebuild at the step top
            # (where the wrap is legal) iff the post-drift staleness would
            # spend the skin margin — or at the static staleness cap.
            disp = (st.pos + dt * (st.vel + 0.5 * dt * st.acc)) - ref
            maxd2 = jnp.max(jnp.sum(disp * disp, axis=-1))
            slack = jnp.maximum(
                jnp.asarray(spec.cutoff, dtype) - 2.0 * jnp.max(st.h), 0.0)
            need = ((4.0 * maxd2 >= (skin_safety * slack) ** 2)
                    | (since + 1 >= adaptive_rebuild))

            def rb(s):
                sw = s._replace(pos=domain.wrap(s.pos))
                wdn = win.build(sw.pos, domain, spec)
                return (sw, wdn, sw.pos, jnp.zeros((), jnp.int32),
                        wdn.overflow.astype(jnp.int32))

            def keep(s):
                return s, wd, ref, since + 1, jnp.zeros((), jnp.int32)

            st, wd, ref, since, ovf = jax.lax.cond(need, rb, keep, st)
            st, dr, dt = step_with(st, wd, dr, dt)
            return (st, wd, ref, since, dr), (dt, ovf)

        (state, _, _, _, drive), (dts, ovf) = jax.lax.scan(
            astep, (state, wd0, state.pos, jnp.zeros((), jnp.int32), drive),
            None, length=nsteps)
        return (state._replace(pos=domain.wrap(state.pos)), drive, dts,
                jnp.maximum(jnp.max(ovf), wd0.overflow.astype(jnp.int32)))

    def inner(carry, _):
        st, wd, dr = carry
        st, dr, dt = step_with(st, wd, dr, local_dt(st, cfg))
        return (st, wd, dr), dt

    def outer(carry, _):
        st, dr = carry
        st = st._replace(pos=domain.wrap(st.pos))
        wd = win.build(st.pos, domain, spec)
        (st, _, dr), dts = jax.lax.scan(inner, (st, wd, dr), None,
                                        length=rebuild_every)
        return (st, dr), (dts, wd.overflow)

    (state, drive), (dts, ovf) = jax.lax.scan(
        outer, (state, drive), None, length=nsteps // rebuild_every)
    return (state._replace(pos=domain.wrap(state.pos)), drive,
            dts.reshape(-1), jnp.max(ovf))


@partial(jax.jit, static_argnames=("spec",))
def overflow_count(state: ParticleState, domain: Domain, spec: WindowSpec):
    """Tiles whose candidate range exceeded wmax + dropped ghosts (must be 0)."""
    return win.build(state.pos, domain, spec).overflow


@partial(jax.jit, static_argnames=("cfg", "spec"))
def mesh_fallback_count(state: ParticleState, cfg: SPHConfig, domain: Domain,
                        spec: WindowSpec):
    """(fallback rows, dropped rows) of the sorted-mesh P3M path.

    ``dropped`` must be zero — rows past the packed-fallback capacity
    silently lose their mesh gravity, so the CLI logs this per metrics
    interval on p3m runs exactly like h_capped (the capacity is ~Ns/4;
    overflow means >25% of rows missed their program brick)."""
    from sphax.physics import pm_sorted

    M = int(cfg.grav_mesh)
    plan = pm_sorted.plan_mesh(spec, M)
    wd = win.build(state.pos, domain, spec)
    periodic = all(domain.periodic_axes(state.dim))
    mass_s = win.gather_sorted(state.mass, wd)
    return pm_sorted.fallback_stats(
        wd.pos_s, wd.is_real & (mass_s > 0), domain, M, periodic, plan)


@partial(jax.jit, static_argnames=("spec",))
def capped_count(state: ParticleState, spec: WindowSpec):
    """Particles pinned at the STRUCTURAL h cap (h == cutoff/2).

    The window structure only covers neighbours to spec.cutoff, so the
    Newton solve clamps h there (wengine.solve_h / Pallas kernel A). A
    nonzero count means the adaptive h wants to exceed what the structure
    can express — physical in voids/open corners, but a silent physics
    modification in a production run, so the CLI logs it every metrics
    interval (round-1 VERDICT weak #9)."""
    hcap = 0.5 * spec.cutoff
    return jnp.sum(state.h >= hcap * (1.0 - 1e-6))
