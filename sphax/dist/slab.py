"""Multi-chip slab domain decomposition over a 1D device mesh (SURVEY.md C15-C18).

TPU-native communication design (SURVEY.md §3.5, §5 "Distributed communication
backend"): the box is cut into equal-extent slabs along one axis, particles
are sharded by slab, and each jitted step performs exactly

  * two ghost-exchange phases with the two face neighbors via
    ``jax.lax.ppermute`` (ring neighbor collectives over ICI) — phase 1 ships
    kinematics (pos/vel/mass/h), phase 2 ships owner-computed hydro fields
    (h/rho/P/cs/Omega/balsara) so ghost j-values are exact; and
  * one global ``jax.lax.pmin`` for the timestep

inside a single ``jax.shard_map`` region. This is the particle-workload
analogue of ring/context-parallel halo passing (SURVEY.md §2.2 mapping); the
reference has zero parallelism (single Python process, BASELINE.json:5).

Correctness model: ghosts within ``margin`` of each slab face form a superset
of all cross-boundary neighbor sets as long as margin >= 2 h_max plus drift
slack; the local cell grid has a "trash band" below the slab where invalid
ghost slots and padding dummies (zero mass — every pair term vanishes) are
parked so they can never crowd real particles out of the cell table.
Positions are NOT globally wrapped during a chunk (so slab locality is
preserved across the periodic seam); ``redistribute`` wraps and re-shards at
chunk cadence.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sphax.configs import SPHConfig
from sphax.core.state import Domain, ParticleState
from sphax.integrate import leapfrog
from sphax.integrate.timestep import local_dt
from sphax.neighbors import cell_list as cl_mod
from sphax.neighbors.cell_list import Grid
from sphax.physics import clist
from sphax.physics.eos import eos

AXIS = "shards"


@dataclasses.dataclass(frozen=True)
class DistSpec:
    """Static decomposition parameters (hashable; changing them recompiles)."""

    n_shards: int
    n_local: int        # particles per shard incl. zero-mass padding
    ghost_cap: int      # ghost buffer size per face
    margin: float       # ghost-selection span from each slab face
    grid: Grid          # local cell grid (same static res on every shard)
    slab_axis: int = 0
    axis_name: str = AXIS


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


# ---------------------------------------------------------------------------
# host-side distribution / redistribution
# ---------------------------------------------------------------------------


def _slab_geometry(domain: Domain, spec_margin: float, n_shards: int,
                   slab_axis: int):
    lo = np.asarray(domain.lo, np.float64)
    hi = np.asarray(domain.hi, np.float64)
    W = (hi[slab_axis] - lo[slab_axis]) / n_shards
    return lo, hi, W


def plan(domain: Domain, n: int, h_max: float, n_shards: int,
         slab_axis: int = 0, margin_factor: float = 1.4,
         pad_factor: float = 1.25, ghost_factor: float = 2.0,
         occupancy_safety: float = 3.0) -> DistSpec:
    """Choose static decomposition parameters from problem scales."""
    lo = np.asarray(domain.lo, np.float64)
    hi = np.asarray(domain.hi, np.float64)
    dim = len(lo)
    cutoff = 2.0 * float(h_max)
    margin = margin_factor * cutoff
    W = (hi[slab_axis] - lo[slab_axis]) / n_shards
    if W < margin:
        # ghosts must come from the two face neighbors only; a margin wider
        # than one slab would need next-nearest-neighbor exchange
        raise ValueError(
            f"slab width {W:.4g} thinner than ghost margin {margin:.4g}; "
            "use fewer shards or smaller h")

    # local bin domain extent: trash band (2*margin) + margin + slab + margin
    ext = hi - lo
    ext_local = ext.copy()
    ext_local[slab_axis] = W + 4.0 * margin
    res = np.maximum(1, np.floor(ext_local / cutoff).astype(int))
    ncells = int(np.prod(res))
    n_local_est = int(np.ceil(n / n_shards * pad_factor / 8.0) * 8)
    # ghosts: expected particles within margin of a face
    frac = margin / W
    ghost_cap = int(np.ceil(n / n_shards * frac * ghost_factor / 8.0) * 8)
    ghost_cap = min(max(ghost_cap, 16), n_local_est)  # can't send more than we own
    avg = (n_local_est + 2 * ghost_cap) / ncells
    cap = int(max(8, np.ceil(avg * occupancy_safety / 4) * 4))
    grid = Grid(res=tuple(int(r) for r in res), capacity=cap)
    return DistSpec(n_shards=n_shards, n_local=n_local_est,
                    ghost_cap=ghost_cap, margin=float(margin), grid=grid,
                    slab_axis=slab_axis)


def _trash_positions(n_rows, domain_lo, domain_hi, slab_lo, margin, slab_axis,
                     dim, dtype):
    """Deterministic parking spots spread across the trash band (host/np)."""
    pos = np.zeros((n_rows, dim))
    t = (np.arange(n_rows) + 0.5) / n_rows
    for d in range(dim):
        if d == slab_axis:
            pos[:, d] = slab_lo - 2.0 * margin
        else:
            # golden-ratio stride spreads rows across transverse cells
            pos[:, d] = domain_lo[d] + (domain_hi[d] - domain_lo[d]) * np.mod(
                0.61803398875 * np.arange(n_rows) + 0.5 * t, 1.0)
    return pos.astype(dtype)


def distribute(state: ParticleState, domain: Domain, mesh: Mesh,
               spec: DistSpec):
    """Shard a (host or single-device) state across the mesh slabs.

    Particles are binned by slab, each slab padded with zero-mass dummies in
    its trash band up to ``spec.n_local``, and the stacked arrays are
    device_put with a ``P('shards')`` sharding on the particle axis.
    """
    ns, nl, ax = spec.n_shards, spec.n_local, spec.slab_axis
    lo, hi, W = _slab_geometry(domain, spec.margin, ns, ax)
    pos = np.asarray(state.pos)
    dtype = pos.dtype
    dim = pos.shape[1]
    x = pos[:, ax]
    sid = np.clip(((x - lo[ax]) / W).astype(int), 0, ns - 1)

    fields = {f: np.asarray(getattr(state, f)) for f in state._fields}
    out = {f: np.zeros((ns * nl,) + v.shape[1:], v.dtype)
           for f, v in fields.items()}
    for s in range(ns):
        idx = np.nonzero(sid == s)[0]
        if len(idx) > nl:
            raise ValueError(
                f"shard {s} holds {len(idx)} > n_local={nl} particles; "
                "re-plan with a larger pad_factor")
        base = s * nl
        for f, v in fields.items():
            out[f][base:base + len(idx)] = v[idx]
        npad = nl - len(idx)
        if npad:
            slab_lo = lo[ax] + s * W
            tp = _trash_positions(npad, lo, hi, slab_lo, spec.margin, ax,
                                  dim, dtype)
            out["pos"][base + len(idx):base + nl] = tp
            out["h"][base + len(idx):base + nl] = np.mean(fields["h"]) or 1.0
            out["rho"][base + len(idx):base + nl] = 1.0
            out["omega"][base + len(idx):base + nl] = 1.0
            # mass/vel/u stay zero -> inert

    sharding = NamedSharding(mesh, P(AXIS))
    put = lambda v: jax.device_put(jnp.asarray(v), sharding)
    return ParticleState(**{f: put(v) for f, v in out.items()})


def gather_real(state_sharded: ParticleState) -> ParticleState:
    """Pull the sharded state to host and drop zero-mass padding dummies."""
    fields = {f: np.asarray(getattr(state_sharded, f))
              for f in state_sharded._fields}
    keep = fields["mass"] > 0
    return ParticleState(**{f: jnp.asarray(v[keep])
                            for f, v in fields.items()})


def redistribute(state_sharded: ParticleState, domain: Domain, mesh: Mesh,
                 spec: DistSpec) -> ParticleState:
    """Wrap positions globally and re-shard (chunk-cadence migration)."""
    st = gather_real(state_sharded)
    st = st._replace(pos=domain.wrap(st.pos))
    return distribute(st, domain, mesh, spec)


# ---------------------------------------------------------------------------
# in-step ghost machinery (runs inside shard_map)
# ---------------------------------------------------------------------------


def _pack_select(mask, G):
    """Indices of up to G True entries of mask (boundary particles) + validity."""
    order = jnp.argsort(jnp.logical_not(mask))  # stable: True entries first
    take = order[:G]
    valid = mask[take]
    return take, valid


def _sel(f, take, valid, fill):
    v = f[take]
    m = valid.reshape((valid.shape[0],) + (1,) * (f.ndim - 1))
    return jnp.where(m, v, jnp.asarray(fill, v.dtype))


def _ghost_trash_pos(G, domain: Domain, slab_lo, margin, slab_axis, dim,
                     dtype):
    """jnp version of _trash_positions for invalid ghost slots (traced)."""
    i = jnp.arange(G, dtype=dtype)
    cols = []
    for d in range(dim):
        if d == slab_axis:
            cols.append(jnp.full((G,), 0.0, dtype) + slab_lo - 2.0 * margin)
        else:
            lo_d, hi_d = domain.lo[d], domain.hi[d]
            cols.append(lo_d + (hi_d - lo_d)
                        * jnp.mod(0.7548776662 * (i + 1.0), 1.0))
    return jnp.stack(cols, axis=-1)


def _local_derived(st: ParticleState, cfg: SPHConfig, domain: Domain,
                   spec: DistSpec) -> ParticleState:
    """Derived-quantity pass for one shard with two-phase ghost exchange."""
    ns, G, ax = spec.n_shards, spec.ghost_cap, spec.slab_axis
    grid = spec.grid
    nl = st.n
    dim = st.dim
    dtype = st.pos.dtype
    me = jax.lax.axis_index(AXIS)
    lo_g = domain.lo[ax]
    ext_g = domain.hi[ax] - domain.lo[ax]
    W = ext_g / ns
    slab_lo = lo_g + me.astype(dtype) * W
    slab_hi = slab_lo + W
    margin = jnp.asarray(spec.margin, dtype)

    periodic_ax = domain.periodic_axes(dim)[ax]
    x = st.pos[:, ax]
    real = st.mass > 0
    mask_low = (x < slab_lo + margin) & real
    mask_high = (x > slab_hi - margin) & real
    take_lo, val_lo = _pack_select(mask_low, G)
    take_hi, val_hi = _pack_select(mask_high, G)

    perm_left = [(s, (s - 1) % ns) for s in range(ns)]   # send low -> left
    perm_right = [(s, (s + 1) % ns) for s in range(ns)]  # send high -> right

    def exchange(fields_fills, take, valid, perm):
        packed = tuple(_sel(f, take, valid, fill) for f, fill in fields_fills)
        return tuple(jax.lax.ppermute(p, AXIS, perm) for p in packed)

    trash = _ghost_trash_pos(G, domain, slab_lo, margin, ax, dim, dtype)

    # ---- phase 1: kinematics -> ghosts from right face of left neighbor
    # (received on our LEFT... naming: gR = ghosts beyond our hi face) ----
    ph1 = lambda s: ((s.pos, 0.0), (s.vel, 0.0), (s.mass, 0.0), (s.h, 1.0))
    gR_pos, gR_vel, gR_mass, gR_h = exchange(ph1(st), take_lo, val_lo,
                                             perm_left)
    gL_pos, gL_vel, gL_mass, gL_h = exchange(ph1(st), take_hi, val_hi,
                                             perm_right)
    # receiver-side shifts across the periodic seam
    shiftR = jnp.where(me == ns - 1, ext_g, 0.0).astype(dtype)
    shiftL = jnp.where(me == 0, -ext_g, 0.0).astype(dtype)
    gR_pos = gR_pos.at[:, ax].add(shiftR)
    gL_pos = gL_pos.at[:, ax].add(shiftL)
    if not periodic_ax:
        # open slab axis: edge shards have no wrap neighbor
        killR = (me == ns - 1)
        killL = (me == 0)
        gR_mass = jnp.where(killR, 0.0, gR_mass)
        gL_mass = jnp.where(killL, 0.0, gL_mass)
    # park invalid slots in the trash band
    gR_pos = jnp.where((gR_mass > 0)[:, None], gR_pos, trash)
    gL_pos = jnp.where((gL_mass > 0)[:, None], gL_pos, trash)

    comb_pos = jnp.concatenate([st.pos, gL_pos, gR_pos])
    comb_vel = jnp.concatenate([st.vel, gL_vel, gR_vel])
    comb_mass = jnp.concatenate([st.mass, gL_mass, gR_mass])
    comb_h = jnp.concatenate([st.h, gL_h, gR_h])
    comb_u = jnp.concatenate([st.u, jnp.zeros((2 * G,), dtype)])
    nc = nl + 2 * G

    # ---- local cell structure over the extended slab ----
    bin_lo = jnp.where(jnp.arange(dim) == ax, slab_lo - 3.0 * margin,
                       domain.lo)
    bin_hi = jnp.where(jnp.arange(dim) == ax, slab_hi + margin, domain.hi)
    bin_per = tuple(False if d == ax else domain.periodic_axes(dim)[d]
                    for d in range(dim))
    bin_dom = Domain(lo=bin_lo.astype(dtype), hi=bin_hi.astype(dtype),
                     periodic=bin_per)
    cl = cl_mod.build(comb_pos, bin_dom, grid)
    perm = cl.perm
    unsort = lambda v: jnp.zeros_like(v).at[perm].set(v)
    cell_block = clist.auto_cell_block(grid, dim)

    pos_p = clist._sentinel_pad(comb_pos[perm], 0.0)
    vel_p = clist._sentinel_pad(comb_vel[perm], 0.0)
    mass_p = clist._sentinel_pad(comb_mass[perm], 0.0)

    # ---- local density / h / eos / balsara (geometry: global min-image) ----
    h_s = comb_h[perm]
    if cfg.adaptive_h:
        h_s = clist.solve_h(cl, grid, domain, nc, cell_block, pos_p, mass_p,
                            h_s, cfg, bin_per=bin_per)
    rho_s, drho_dh = clist.density_pass(cl, grid, domain, nc, cell_block,
                                        pos_p, h_s, mass_p, dim,
                                        bin_per=bin_per)
    rho_s = jnp.maximum(rho_s, 1e-15)  # trash rows see no neighbors
    if cfg.grad_h:
        om_s = 1.0 + h_s / (dim * rho_s) * drho_dh
    else:
        om_s = jnp.ones_like(rho_s)
    P_s, cs_s = eos(rho_s, comb_u[perm], cfg)
    if cfg.balsara:
        from sphax.physics import pairs as _pairs

        divv_s, curl_s = clist.divcurl_pass(cl, grid, domain, nc, cell_block,
                                            pos_p, vel_p, mass_p, h_s, rho_s,
                                            cfg, bin_per=bin_per)
        bf_s = _pairs.balsara_factor(divv_s, curl_s, cs_s, h_s)
    else:
        bf_s = jnp.ones_like(rho_s)

    # back to combined order; local slice [0:nl] is owner-correct
    h_c, rho_c = unsort(h_s), unsort(rho_s)
    P_c, cs_c, om_c, bf_c = (unsort(P_s), unsort(cs_s), unsort(om_s),
                             unsort(bf_s))

    # ---- phase 2: owner-computed hydro fields for the SAME boundary sets ----
    loc = lambda v: v[:nl]
    ph2 = lambda: ((loc(h_c), 1.0), (loc(rho_c), 1.0), (loc(P_c), 0.0),
                   (loc(cs_c), 0.0), (loc(om_c), 1.0), (loc(bf_c), 0.0))
    gR2 = exchange(ph2(), take_lo, val_lo, perm_left)
    gL2 = exchange(ph2(), take_hi, val_hi, perm_right)

    def splice(c_arr, gl, gr):
        return jnp.concatenate([c_arr[:nl], gl, gr])

    h_c = splice(h_c, gL2[0], gR2[0])
    rho_c = splice(rho_c, gL2[1], gR2[1])
    P_c = splice(P_c, gL2[2], gR2[2])
    cs_c = splice(cs_c, gL2[3], gR2[3])
    om_c = splice(om_c, gL2[4], gR2[4])
    bf_c = splice(bf_c, gL2[5], gR2[5])

    # ---- force pass with exact ghost j-fields ----
    acc_s, du_s = clist.force_pass(
        cl, grid, domain, nc, cell_block, pos_p, vel_p, mass_p,
        h_c[perm], jnp.maximum(rho_c[perm], 1e-15), P_c[perm], cs_c[perm],
        om_c[perm], bf_c[perm], cfg, bin_per=bin_per)
    acc_c, du_c = unsort(acc_s), unsort(du_s)

    return st._replace(h=loc(h_c), rho=loc(rho_c), P=loc(P_c), cs=loc(cs_c),
                       omega=loc(om_c), acc=loc(acc_c), du_dt=loc(du_c))


# ---------------------------------------------------------------------------
# distributed step / run loop
# ---------------------------------------------------------------------------


def make_step(mesh: Mesh, cfg: SPHConfig, spec: DistSpec):
    """Build the jitted distributed KDK step: (state, domain) -> (state, dt)."""
    if cfg.gravity or cfg.mm_visc:
        raise NotImplementedError(
            "the clist slab engine is the simple fallback; self-gravity and "
            "Morris-Monaghan viscosity run distributed in the production "
            "window-engine decomposition (sphax/dist/wslab.py)")

    def local_step(st: ParticleState, domain: Domain):
        dt = jax.lax.pmin(local_dt(st, cfg), AXIS)
        derived = lambda s: _local_derived(s, cfg, domain, spec)
        st, _ = leapfrog.step(st, cfg, domain, derived, dt=dt, wrap=False)
        return st, dt

    sm = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(AXIS), P()),
        out_specs=(P(AXIS), P()),
    )
    return jax.jit(sm)


def make_chunk(mesh: Mesh, cfg: SPHConfig, spec: DistSpec, nsteps: int):
    """Jitted scan of ``nsteps`` distributed steps (host sync per chunk)."""

    def local_chunk(st: ParticleState, domain: Domain):
        def body(carry, _):
            s = carry
            dt = jax.lax.pmin(local_dt(s, cfg), AXIS)
            derived = lambda x: _local_derived(x, cfg, domain, spec)
            s, _ = leapfrog.step(s, cfg, domain, derived, dt=dt, wrap=False)
            return s, dt

        st, dts = jax.lax.scan(body, st, None, length=nsteps)
        return st, dts

    sm = jax.shard_map(local_chunk, mesh=mesh, in_specs=(P(AXIS), P()),
                       out_specs=(P(AXIS), P()))
    return jax.jit(sm)
