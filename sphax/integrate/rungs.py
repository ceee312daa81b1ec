r"""Block (individual) timesteps — hierarchical power-of-two rungs.

The reference integrates every particle at the global minimum dt
(SURVEY.md §2.1.8); block timesteps are the standard production upgrade
(Hernquist & Katz 1989; GADGET-class codes): particle i advances with its
OWN dt_i = 2^{r_i} * dt_min, so the cold bulk of a blast problem stops
paying for the shock front's tiny CFL step. On TPU the win must come from
SKIPPING WHOLE TILES of the sorted pencil-window structure (NEXT.md arch
ladder #2): shocks are spatially coherent, the pencil sort makes sorted
tiles rung-coherent, and a tile with no active row zeroes its
``w_nact``/``t_nact`` tables so the Pallas kernels skip both its DMA and
all of its predicated compute blocks — the identical machinery that
already skips provably-empty blocks, no kernel changes at all.

Scheme (KDK, synchronized at force evaluations):

* A SPAN is 2^{B-1} ticks of the fixed base step dt_min, measured at the
  span-start sync point where every particle has fresh derived state:
  dt_min = min_i dt_i and r_i = clip(floor(log2(dt_i/dt_min)), 0, B-1).
* At tick k, particles with k % 2^{r_i} == 0 OPEN a step (half-kick with
  their stored acceleration); everyone DRIFTS by dt_min (velocities are
  constant within a particle's step, so per-tick drift accumulates to
  exactly dt_i * v_i); particles with (k+1) % 2^{r_i} == 0 CLOSE their
  step: the derived pass runs with only their tiles active, and they
  half-kick with the fresh forces.
* Inactive particles contribute their positions at CURRENT time (drifted
  every tick), their PREDICTED u (advanced at their last half-kick), and
  their stale rho/P/h/viscosity-factor — the standard GADGET-class
  approximation.
* Rung changes happen only when a particle closes: decreases (smaller dt)
  are always allowed; increases only onto ticks the new rung divides
  (Hernquist-Katz discipline), so "k % 2^r == 0 with current rungs" is
  exactly the set of step boundaries, with no extra bookkeeping carry.
* Every span ends with all particles closing (2^{B-1} is divisible by
  every 2^r), so span boundaries are full sync points where dt_min and
  the rungs re-adapt.

With n_rungs=1 this degenerates to plain global-dt leapfrog and must match
``wengine.simulate`` to float roundoff (pinned by tests/unit/test_rungs.py).
A particle whose desired dt drops below dt_min mid-span cannot be honored
until the next sync; such events are counted in the returned ``dt_viol``
health counter (the CFL safety factor absorbs epsilon violations; a large
count means spans are too long for how fast the flow stiffens — lower
n_rungs or cfg.cfl).

Scope (v1): single-chip window engine, no self-gravity (the PM mesh is a
global solve that cannot ride tile skipping), no OU driving (the flagship
turbulence box is rung-uniform anyway — the target is Sedov/blast-class
problems, where the measured win is the active-tile fraction).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sphax.configs import SPHConfig
from sphax.core.state import Domain, ParticleState
from sphax.integrate.timestep import particle_dt
from sphax.neighbors import window as win
from sphax.neighbors.window import WindowData, WindowSpec
from sphax.physics import wengine
from sphax.physics.eos import eos


def mask_structure(wd: WindowData, spec: WindowSpec, act_s) -> WindowData:
    """Zero the active-block tables of row-groups/tiles with no active row.

    ``act_s`` [n_sorted] bool: activity per SORTED row (images inherit the
    owner's flag through the build's g-gather). Kernels A/C then skip the
    masked tiles' window DMAs and every predicated compute block — their
    outputs are junk-but-finite and the caller must discard them per row.
    """
    act_g = jnp.any(act_s.reshape(spec.n_groups, spec.group), axis=1)
    w_nact = jnp.where(act_g[:, None], wd.w_nact, 0)
    if spec.rgroups > 1:
        act_t = jnp.any(act_g.reshape(spec.n_tiles, spec.rgroups), axis=1)
        t_nact = jnp.where(act_t[:, None], wd.t_nact, 0)
    else:
        t_nact = w_nact
    return wd._replace(w_nact=w_nact, t_nact=t_nact)


def _derived_rungs(state: ParticleState, bf_prev, wd: WindowData,
                   cfg: SPHConfig, domain: Domain, spec: WindowSpec,
                   close_m, tile_block: int, use_pallas: bool):
    """Window-engine derived pass evaluating only CLOSING particles' tiles.

    The twin of ``wengine.derived_with`` with three changes: (1) the
    kernels run on a ``mask_structure``d copy of ``wd``; (2) the four
    window-shipped scalars (h/rho/Omega/viscosity-factor) are per-row
    SELECTED — fresh on closing rows, stale (from ``state``/``bf_prev``)
    elsewhere — before the owner mirror, so kernel C's j-sides see every
    particle's current-best values; (3) all outputs are selected against
    the stale state after the unsort. Returns (state', bf_now) where
    ``bf_now`` [n] is the current-best viscosity factor to carry.
    """
    n = state.n
    dim = state.dim
    dtype = state.pos.dtype
    # ONE packed input gather per tick: activity flag, kinematics, thermo,
    # and the stale h/rho/Omega/viscosity-factor carry all ride a single
    # [N, K] row gather — the per-field form was the dominant per-tick
    # fixed cost once tile skipping removed the compute (BASELINE.md)
    cols = [close_m.astype(dtype)[:, None], state.pos, state.vel,
            state.mass[:, None], state.u[:, None], state.h[:, None],
            state.rho[:, None], state.omega[:, None], bf_prev[:, None]]
    fills = [0.0] + [0.0] * (2 * dim) + [0.0, 0.0, 1.0, 1.0, 1.0, 1.0]
    if cfg.mm_visc:
        cols.append(state.alpha[:, None])
        fills.append(1.0)
    g_s = win.gather_sorted_cols(jnp.concatenate(cols, axis=-1), wd, fills)
    act_s = g_s[:, 0] > 0.5
    wd_act = mask_structure(wd, spec, act_s)
    pos_s = g_s[:, 1:1 + dim] + wd.shift_s
    vel_s = g_s[:, 1 + dim:1 + 2 * dim]
    c0 = 1 + 2 * dim
    mass_s, u_s, h_s = g_s[:, c0], g_s[:, c0 + 1], g_s[:, c0 + 2]
    alpha_s = g_s[:, c0 + 6] if cfg.mm_visc else None

    h_f, rho_f, om_f, bf_f, divv_f = wengine.stage_density(
        wd_act, spec, cfg, pos_s, vel_s, mass_s, u_s, h_s, tile_block,
        use_pallas, alpha_s=alpha_s)

    # current-best sorted scalars: fresh where the owner closes, stale
    # otherwise (pad rows select the stale branch, whose fill=1.0 matches
    # derived_with's conventions), then ONE packed owner-mirror gather
    fresh = jnp.stack([h_f, rho_f, om_f, bf_f], axis=-1)
    stale = g_s[:, c0 + 2:c0 + 6]
    mirrored = jnp.where(act_s[:, None], fresh, stale)[wd.src]
    h_c, rho_c, om_c, bf_c = (mirrored[:, 0], mirrored[:, 1],
                              mirrored[:, 2], mirrored[:, 3])
    # u_s is the PREDICTED energy (advanced at each particle's last
    # half-kick), so eos gives predicted P/cs for stale rows — the
    # GADGET-class neighbor prediction
    P_c, cs_c = eos(rho_c, u_s, cfg)

    acc_s, du_s = wengine.stage_forces(
        wd_act, spec, cfg, pos_s, vel_s, mass_s, h_c, rho_c, P_c, cs_c,
        om_c, bf_c, tile_block, use_pallas)

    # unsort: the four mirrored scalars are already selected; force
    # outputs and divv select against the stale state per ORIGINAL row
    cols = [h_c, rho_c, P_c, cs_c, om_c, du_s, divv_f, mirrored[:, 3]] + [
        acc_s[:, d] for d in range(state.dim)]
    out = jnp.stack(cols, axis=-1)[wd.inv]
    cm = close_m
    cmc = cm[:, None]
    acc = jnp.where(cmc, out[:, 8:8 + state.dim], state.acc)
    return state._replace(
        h=out[:, 0], rho=out[:, 1], P=out[:, 2], cs=out[:, 3],
        omega=out[:, 4],
        du_dt=jnp.where(cm, out[:, 5], state.du_dt),
        divv=jnp.where(cm, out[:, 6], state.divv),
        acc=acc), out[:, 7]


def _visc_factor_full(state: ParticleState, cfg: SPHConfig, domain: Domain,
                      spec: WindowSpec, tile_block: int, use_pallas: bool):
    """One full kernel-A pass to seed the stale viscosity-factor carry
    (the factor is derived from div/curl, which ParticleState does not
    store). Skipped (ones) when no viscosity switch is configured."""
    if not cfg.visc_factor_on:
        return jnp.ones_like(state.h)
    pos_w = domain.wrap(state.pos)
    wd = win.build(pos_w, domain, spec)
    pos_s = win.refresh_pos(pos_w, wd)
    vel_s = win.gather_sorted(state.vel, wd)
    mass_s = win.gather_sorted(state.mass, wd)
    u_s = win.gather_sorted(state.u, wd)
    h_s = win.gather_sorted(state.h, wd, fill=1.0)
    alpha_s = (win.gather_sorted(state.alpha, wd, fill=1.0)
               if cfg.mm_visc else None)
    _, _, _, bf_s, _ = wengine.stage_density(
        wd, spec, cfg, pos_s, vel_s, mass_s, u_s, h_s, tile_block,
        use_pallas, alpha_s=alpha_s)
    return bf_s[wd.inv]


@partial(jax.jit, static_argnames=("cfg", "spec", "nspans", "n_rungs",
                                   "rebuild_every", "tile_block",
                                   "use_pallas", "adaptive_rebuild",
                                   "skin_safety"))
def simulate_rungs(state: ParticleState, cfg: SPHConfig, domain: Domain,
                   spec: WindowSpec, nspans: int, n_rungs: int = 4,
                   rebuild_every: int = 2, tile_block: int = 16,
                   use_pallas: bool = True, adaptive_rebuild: int = 0,
                   skin_safety: float = 0.8):
    """Block-timestep production loop (nested lax.scan, zero host trips).

    ``state`` must carry current derived quantities (run update_derived
    first, as for ``wengine.simulate``). Advances ``nspans`` spans of
    2^{n_rungs-1} base ticks each; the window structure rebuilds every
    ``rebuild_every`` ticks (ticks are dt_min-sized — the same drift
    contract as global-dt ``simulate`` at the same cadence).

    ``adaptive_rebuild > 0`` switches to DRIFT-GATED rebuilds: the
    structure is rebuilt only when the accumulated drift since the last
    build threatens the Verlet-skin contract (2 * max_drift >=
    skin_safety * (spec.cutoff - 2 * max h)), or after ``adaptive_rebuild``
    ticks, whichever comes first. The check runs after each tick's drift
    and the rebuild (when taken) happens right before the derived pass, so
    a just-rebuilt structure has ZERO staleness. Under the skin contract a
    stale structure's candidate set is a superset of the true neighbor
    set, so adaptive cadence changes summation order only — trajectories
    match the fixed-cadence path to roundoff (tests/unit/test_rungs.py).
    This attacks the dominant per-tick fixed cost at low active fractions
    (the ~48 ms/tick amortized rebuild at rebuild_every=2, BASELINE.md
    round-3 rungs row): the cold bulk of a blast barely drifts per
    dt_min-tick, so builds stretch to the skin limit instead of a static
    worst-case cadence. ``rebuild_every`` is ignored in this mode.

    Returns (state, dts, n_active, overflow, dt_viol, n_rebuilds):
      dts       [nspans * 2^{B-1}]  base dt of every tick;
      n_active  [nspans * 2^{B-1}]  closing-particle count per tick — the
                                    integrated active fraction is the
                                    measured work saving;
      overflow  max window-structure overflow across all rebuilds (must
                be 0, as in simulate);
      dt_viol   particles that wanted dt < dt_min at a mid-span close,
                summed over ticks (see module docstring);
      n_rebuilds window builds taken over the whole run (adaptive mode:
                measured; fixed mode: the static count).
    """
    if cfg.gravity:
        raise NotImplementedError(
            "block timesteps + self-gravity: the PM/direct mesh stage is a "
            "global solve with no tile skipping to exploit — run global-dt")
    span_ticks = 1 << (n_rungs - 1)
    if not adaptive_rebuild and span_ticks % rebuild_every:
        raise ValueError("rebuild_every must divide 2^(n_rungs-1)")
    dtype = state.pos.dtype

    bf0 = _visc_factor_full(state, cfg, domain, spec, tile_block, use_pallas)

    def open_drift(st, rung, dt_min, k):
        """Half-kick openers, drift everyone by dt_min (unwrapped)."""
        dt_r = dt_min * jnp.exp2(rung.astype(dtype))
        period_mask = (1 << rung) - 1              # k % 2^r == k & mask
        open_m = (k & period_mask) == 0
        half = jnp.where(open_m, 0.5 * dt_r, 0.0)
        vel = st.vel + half[:, None] * st.acc
        u = jnp.maximum(st.u + half * st.du_dt, cfg.u_floor)
        return (st._replace(pos=st.pos + dt_min * vel, vel=vel, u=u),
                dt_r, period_mask)

    def close_tick(st, bf_prev, rung, wd, k, dt_min, dt_r, period_mask):
        """Derived pass on closers' tiles, closing half-kick, rung update."""
        close_m = ((k + 1) & period_mask) == 0
        if cfg.h_predict and cfg.adaptive_h:
            # PER-CLOSER continuity predictor (round-4 judge Next #7): a
            # closer's divv was computed at its own last close — exactly
            # one particle-step stale, the same staleness the global-dt
            # predictor rides (leapfrog.step). Advance its h through its
            # OWN step dt_r = dt_min * 2^rung with the identical clipped
            # continuity factor; the derived pass below then walks ONCE
            # at the predicted h (kernel A single pair walk) and applies
            # the lagged Newton correction to closing rows only (the
            # fresh/stale select in _derived_rungs). Non-closers keep
            # their stale h untouched, as in the full-Newton rung scheme.
            fac = jnp.clip(1.0 + (dt_r / cfg.dim) * st.divv, 0.9, 1.1)
            st = st._replace(h=jnp.where(close_m, st.h * fac, st.h))
        st, bf_now = _derived_rungs(st, bf_prev, wd, cfg, domain, spec,
                                    close_m, tile_block, use_pallas)
        half = jnp.where(close_m, 0.5 * dt_r, 0.0)
        vel = st.vel + half[:, None] * st.acc
        u = jnp.maximum(st.u + half * st.du_dt, cfg.u_floor)
        st = st._replace(vel=vel, u=u)
        if cfg.mm_visc:
            from sphax.physics import pairs

            a_new = pairs.mm_alpha_update(st.alpha, st.divv, st.h,
                                          st.cs, dt_r, cfg)
            st = st._replace(alpha=jnp.where(close_m, a_new, st.alpha))

        # rung update on closers: decrease freely, increase only onto
        # ticks the new rung divides (alignment of k+1)
        dt_des = particle_dt(st, cfg)
        # dt_viol: a closer mid-span wanting dt < dt_min cannot be
        # honored until the next sync; the span's FINAL tick is not a
        # violation — everyone re-syncs immediately
        mid = (k + 1) < span_ticks
        viol = jnp.sum((close_m & (dt_des < dt_min)).astype(jnp.int32)
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
        return st, bf_now, rung, nact, viol

    def start_rungs(st):
        """Span sync point: every particle closed on the previous tick."""
        dt_des0 = particle_dt(st, cfg)
        dt_min = jnp.min(dt_des0)
        rung0 = jnp.clip(
            jnp.floor(jnp.log2(jnp.maximum(dt_des0 / dt_min, 1.0))),
            0, n_rungs - 1).astype(jnp.int32)
        return dt_min, rung0

    if adaptive_rebuild:
        state = state._replace(pos=domain.wrap(state.pos))
        wd0 = win.build(state.pos, domain, spec)

        def span_a(carry, _):
            st, bf_prev, wd, ref, since = carry
            dt_min, rung0 = start_rungs(st)

            def tick(carry_t, k):
                st, bf_prev, rung, wd, ref, since = carry_t
                st, dt_r, pm = open_drift(st, rung, dt_min, k)
                # drift gate: a pair currently within 2 h_max was at most
                # 2*max_drift farther apart at build time; rebuild before
                # the margin over spec.cutoff is spent (or at the static
                # staleness bound). Rebuilding here — after the drift,
                # before the derived pass — gives the fresh structure zero
                # staleness.
                maxd2 = jnp.max(jnp.sum((st.pos - ref) ** 2, axis=-1))
                slack = jnp.maximum(
                    jnp.asarray(spec.cutoff, dtype) - 2.0 * jnp.max(st.h),
                    0.0)
                need = ((4.0 * maxd2 >= (skin_safety * slack) ** 2)
                        | (since + 1 >= adaptive_rebuild))

                def rb(s):
                    sw = s._replace(pos=domain.wrap(s.pos))
                    wdn = win.build(sw.pos, domain, spec)
                    return (sw, wdn, sw.pos, jnp.zeros((), jnp.int32),
                            wdn.overflow.astype(jnp.int32))

                def keep(s):
                    return (s, wd, ref, since + 1,
                            jnp.zeros((), jnp.int32))

                st, wd, ref, since, ovf = jax.lax.cond(need, rb, keep, st)
                st, bf_now, rung, nact, viol = close_tick(
                    st, bf_prev, rung, wd, k, dt_min, dt_r, pm)
                return (st, bf_now, rung, wd, ref, since), (
                    dt_min, nact, viol, ovf, need.astype(jnp.int32))

            (st, bf_prev, _, wd, ref, since), (
                dts, nacts, viols, ovfs, rbs) = jax.lax.scan(
                    tick, (st, bf_prev, rung0, wd, ref, since),
                    jnp.arange(span_ticks, dtype=jnp.int32))
            return (st, bf_prev, wd, ref, since), (
                dts, nacts, jnp.sum(viols), jnp.maximum(jnp.max(ovfs),
                                                        jnp.int32(0)),
                jnp.sum(rbs))

        (state, _, _, _, _), (dts, nacts, viol, ovf, rbs) = jax.lax.scan(
            span_a, (state, bf0, wd0, state.pos, jnp.zeros((), jnp.int32)),
            None, length=nspans)
        return (state._replace(pos=domain.wrap(state.pos)),
                dts.reshape(-1), nacts.reshape(-1),
                jnp.maximum(jnp.max(ovf), wd0.overflow.astype(jnp.int32)),
                jnp.sum(viol), jnp.sum(rbs) + 1)

    def span(carry, _):
        st, bf_prev = carry
        dt_min, rung0 = start_rungs(st)

        def tick(carry_t, k):
            st, bf_prev, rung, wd = carry_t
            st, dt_r, pm = open_drift(st, rung, dt_min, k)
            st, bf_now, rung, nact, viol = close_tick(
                st, bf_prev, rung, wd, k, dt_min, dt_r, pm)
            return (st, bf_now, rung, wd), (dt_min, nact, viol)

        def rebuild_blk(carry_r, r):
            st, bf_prev, rung = carry_r
            st = st._replace(pos=domain.wrap(st.pos))
            wd = win.build(st.pos, domain, spec)
            ks = r * rebuild_every + jnp.arange(rebuild_every,
                                                dtype=jnp.int32)
            (st, bf_prev, rung, _), outs = jax.lax.scan(
                tick, (st, bf_prev, rung, wd), ks)
            return (st, bf_prev, rung), (outs, wd.overflow)

        (st, bf_prev, _), ((dts, nacts, viols), ovf) = jax.lax.scan(
            rebuild_blk, (st, bf_prev, rung0),
            jnp.arange(span_ticks // rebuild_every, dtype=jnp.int32))
        return (st, bf_prev), (dts.reshape(-1), nacts.reshape(-1),
                               jnp.sum(viols), jnp.max(ovf))

    (state, _), (dts, nacts, viol, ovf) = jax.lax.scan(
        span, (state, bf0), None, length=nspans)
    n_rebuilds = jnp.asarray(nspans * (span_ticks // rebuild_every),
                             jnp.int32)
    return (state._replace(pos=domain.wrap(state.pos)), dts.reshape(-1),
            nacts.reshape(-1), jnp.max(ovf), jnp.sum(viol), n_rebuilds)
