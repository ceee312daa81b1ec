"""Sorted-order CIC mesh deposit/interpolation — the fast P3M mesh stage.

XLA:TPU scatter/gather is per-element serialization-bound: the mesh stage
of `pm.mesh_accel` measures 94 ms (deposit) + 110 ms (interp) at N=1e6,
M=128 while the FFTs take ~46 ms, and feeding pre-sorted positions changes
nothing (BASELINE.md round-3 mesh-stage split). This module replaces both
scatters with MXU work by exploiting the pencil sort (window.build's order
is row-major over the extended cell grid, so G consecutive sorted rows are
confined to a small (Bx, By) transverse node brick):

* a `lax.scan` over "programs" of G consecutive sorted rows;
* per program, separable one-hot CIC weight matrices turn the deposit into
  ONE [Bx*By, G] @ [G, M] matmul (the z axis rides the matmul lanes, so
  BOTH z nodes of every particle land in one pass), accumulated into a
  padded grid with dynamic_update_slice — and interpolation is the exact
  transpose (a dynamic_slice brick read, the mirrored matmul, and a
  z-weighted row reduction);
* rows OUTSIDE their program's brick (pencil-row crossings at the y wrap,
  far drifters, strongly non-uniform occupancy) are handled exactly by a
  packed scatter/gather fallback of static capacity `plan.cap`; `dropped`
  counts fallback-capacity overflow and must be zero (the CLI logs it per
  metrics interval alongside h_capped; cap defaults to ~Ns/4, so overflow
  means >25% of rows missed their brick — a broken structure, not a
  tuning accident).

Periodic boxes never wrap node indices inside a program (that would break
brick locality): deposits land in a +Bx/+By padded margin that is folded
back after the scan, and interpolation reads from a `jnp.pad(mode="wrap")`
extended grid. The z axis wraps in-row (both z nodes share a matmul lane
row). Open boxes use pm._cic_weights' clip-first node convention verbatim.

The weight matmuls run at Precision.HIGHEST: CIC weights feed force
errors, and the TPU's default f32 dot rounds through bf16 (~1e-3 relative
— 10x the documented P3M error budget).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sphax.core.state import Domain
from sphax.neighbors.window import WindowSpec, _pack_offset
from sphax.physics.pm import _cic_weights, _deposit, _interp

_HI = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    """Static geometry of the sorted-mesh scan (hashable; trace-time)."""

    G: int    # sorted rows per program (multiple of 128)
    Bx: int   # brick nodes along axis 0 (program x-span + CIC + drift)
    By: int   # brick nodes along axis 1
    cap: int  # packed-fallback capacity (rows outside their brick)


def plan_mesh(spec: WindowSpec, M: int, node_per_cell=None) -> MeshPlan:
    """Host-side plan: brick extents from the coarse-cell -> mesh-cell
    ratio and the estimated pencil occupancy. G shrinks until a program's
    expected transverse span fits a <=32-node brick (the scan cost rises
    only logarithmically with fewer rows per program; the brick matmul
    cost rises linearly with By).

    ``node_per_cell`` ((rx, ry), optional): mesh nodes per window cell on
    the two transverse axes. The default assumes the window domain IS the
    mesh domain; distributed shards build windows over a LOCAL bin box
    spanning only a fraction of the global mesh box, so they must pass the
    scaled ratios (dist.wslab._mesh_plan) or the bricks come out ns-times
    too wide."""
    res = spec.res
    if len(res) != 3:
        raise ValueError("sorted mesh path is 3D-only (like pm._deposit)")
    Ns = spec.n_sorted
    if node_per_cell is not None:
        rx, ry = node_per_cell
    else:
        rx = M / res[0]
        ry = M / res[1]
    occ = max(Ns / (res[0] * res[1]), 1.0)  # sorted rows per pencil

    def by_for(g):
        # pencils spanned by g rows (+1.5 boundary/drift slack), in nodes,
        # +3 for the CIC right node and floor/offset rounding
        return int(np.ceil((g / occ + 1.5) * ry)) + 3

    G = 2048
    while G > 256 and by_for(G) > 32:
        G //= 2
    Bx = min(int(np.ceil(rx)) + 3, M + 1)
    By = min(by_for(G), M + 1)
    # the fallback's scatter/gather cost is proportional to the STATIC cap
    # (a cap of Ns/4 cost ~45 ms at N=1e6 while 0.04% of rows actually
    # used it — measured round 3); Ns/32 keeps it ~1-4 ms while holding
    # 10x the uniform-IC fallback share, and overflow aborts loudly via
    # mesh_fallback_count/the in-path dropped counter
    cap = min(int(np.ceil(max(8192, Ns // 32) / 128.0) * 128), Ns)
    return MeshPlan(G=G, Bx=Bx, By=By, cap=cap)


def _geometry(pos_s, maskvec, domain: Domain, M: int, periodic: bool,
              plan: MeshPlan):
    """Shared per-program geometry: CIC nodes/fractions, masked-min brick
    offsets, and the in-brick validity mask. Node/fraction conventions are
    pm._cic_weights' exactly (the fallback path IS _deposit/_interp, so
    the two paths must agree bitwise on where a row deposits)."""
    Ns = pos_s.shape[0]
    dtype = pos_s.dtype
    lo = domain.lo.astype(dtype)
    cellm = domain.extent.astype(dtype) / M
    u = (pos_s - lo) / cellm
    if periodic:
        u = jnp.mod(u, M)
        i0 = jnp.floor(u).astype(jnp.int32)
        frac = u - i0
        # _cic_weights wraps i0 to 0 when u rounds to exactly M (frac 0
        # there, so node M never receives weight); clamping to M-1 keeps
        # brick locality and deposits the same zero at the folded node
        i0 = jnp.clip(i0, 0, M - 1)
    else:
        i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, M - 2)
        frac = jnp.clip(u - i0, 0.0, 1.0)
    G = plan.G
    npr = -(-Ns // G)
    pad = npr * G - Ns

    def padG(a, fill=0):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                       constant_values=fill)

    i0p = padG(i0).reshape(npr, G, 3)
    fp = padG(frac).reshape(npr, G, 3)
    mp = padG(maskvec).reshape(npr, G)
    ox = jnp.min(jnp.where(mp, i0p[:, :, 0], M), axis=1).astype(jnp.int32)
    oy = jnp.min(jnp.where(mp, i0p[:, :, 1], M), axis=1).astype(jnp.int32)
    xl = i0p[:, :, 0] - ox[:, None]
    yl = i0p[:, :, 1] - oy[:, None]
    valid = ((xl >= 0) & (xl <= plan.Bx - 2)
             & (yl >= 0) & (yl <= plan.By - 2))
    return dict(npr=npr, i0p=i0p, fp=fp, mp=mp, ox=ox, oy=oy, xl=xl, yl=yl,
                valid=valid, lo=lo, cellm=cellm)


def _onehot_xy(xl_g, yl_g, fx, fy, Bx, By, dtype):
    """Separable CIC weights -> [Bx*By, G] one-hot brick matrix."""
    xr = jax.lax.broadcasted_iota(jnp.int32, (Bx, 1), 0)
    yr = jax.lax.broadcasted_iota(jnp.int32, (By, 1), 0)
    Wx = (jnp.where(xr == xl_g[None, :], 1.0 - fx[None, :], 0.0)
          + jnp.where(xr == xl_g[None, :] + 1, fx[None, :], 0.0))
    Wy = (jnp.where(yr == yl_g[None, :], 1.0 - fy[None, :], 0.0)
          + jnp.where(yr == yl_g[None, :] + 1, fy[None, :], 0.0))
    return (Wx[:, None, :] * Wy[None, :, :]).reshape(Bx * By, -1).astype(
        dtype)


def _onehot_z(iz, fz, M, periodic, wlo, whi, dtype):
    """z-node weights [G, M]: both CIC z nodes share the lane row, so the
    periodic z wrap costs one modulo, not padding."""
    ziota = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    iz1 = jnp.mod(iz + 1, M) if periodic else iz + 1
    return (jnp.where(ziota == iz[:, None], wlo[:, None], 0.0)
            + jnp.where(ziota == iz1[:, None], whi[:, None], 0.0)).astype(
                dtype)


def fallback_stats(pos_s, maskvec, domain: Domain, M: int, periodic: bool,
                   plan: MeshPlan):
    """(rows using the packed fallback, rows DROPPED past plan.cap).

    Diagnostic twin of the counters inside deposit/interp (same geometry,
    no scan): the CLI logs these per metrics interval like h_capped —
    dropped must be zero; a large fallback share is a perf signal that the
    plan's brick no longer matches the particle distribution."""
    Ns = pos_s.shape[0]
    geo = _geometry(pos_s, maskvec, domain, M, periodic, plan)
    n_fb = jnp.sum(maskvec & ~geo["valid"].reshape(-1)[:Ns])
    return n_fb, jnp.maximum(n_fb - plan.cap, 0)


def deposit_sorted(pos_s, w, domain: Domain, M: int, periodic: bool,
                   plan: MeshPlan):
    """CIC deposit of sorted rows with weights ``w`` -> ([M,M,M], dropped).

    ``w`` must already be zero on ghost/pad rows (they alias owners).
    """
    Ns = pos_s.shape[0]
    dtype = pos_s.dtype
    Bx, By, G = plan.Bx, plan.By, plan.G
    geo = _geometry(pos_s, w > 0, domain, M, periodic, plan)
    wv = jnp.where(geo["valid"],
                   jnp.pad(w, (0, geo["npr"] * G - Ns)).reshape(
                       geo["npr"], G), 0.0)

    def body(grid, xs):
        xl_g, yl_g, iz, fx, fy, fz, wg, oxg, oyg = xs
        W = _onehot_xy(xl_g, yl_g, fx, fy, Bx, By, dtype)
        Z = _onehot_z(iz, fz, M, periodic, (1.0 - fz) * wg, fz * wg, dtype)
        brick = jax.lax.dot(W, Z, precision=_HI)
        z0 = jnp.zeros((), jnp.int32)
        reg = jax.lax.dynamic_slice(grid, (oxg, oyg, z0), (Bx, By, M))
        return jax.lax.dynamic_update_slice(
            grid, reg + brick.reshape(Bx, By, M), (oxg, oyg, z0)), None

    i0p, fp = geo["i0p"], geo["fp"]
    grid0 = jnp.zeros((M + Bx, M + By, M), dtype)
    grid, _ = jax.lax.scan(body, grid0,
                           (geo["xl"], geo["yl"], i0p[:, :, 2], fp[:, :, 0],
                            fp[:, :, 1], fp[:, :, 2], wv, geo["ox"],
                            geo["oy"]))
    if periodic:
        grid = grid.at[0:Bx].add(grid[M:M + Bx])
        grid = grid.at[:, 0:By].add(grid[:, M:M + By])
    out = grid[:M, :M, :]

    # exact packed fallback for rows outside their program's brick
    fb = (w > 0) & ~geo["valid"].reshape(-1)[:Ns]
    idx, dropped = _pack_offset(fb, jnp.arange(Ns, dtype=jnp.int32),
                                plan.cap, Ns)
    take = jnp.minimum(idx, Ns - 1)
    wf = jnp.where(idx < Ns, w[take], 0.0)
    out = out + _deposit(pos_s[take], wf, geo["lo"], geo["cellm"], M,
                         periodic)
    return out, dropped


def interp_sorted(grids, pos_s, realmask, domain: Domain, M: int,
                  periodic: bool, plan: MeshPlan):
    """CIC interpolation of [3, M, M, M] grids -> ([Ns, 3], dropped).

    Only rows with ``realmask`` are guaranteed values (ghost/pad rows'
    outputs are garbage by the same contract as the window kernels).
    """
    Ns = pos_s.shape[0]
    dtype = pos_s.dtype
    Bx, By, G = plan.Bx, plan.By, plan.G
    geo = _geometry(pos_s, realmask, domain, M, periodic, plan)
    mode = "wrap" if periodic else "constant"
    padded = jnp.pad(grids, ((0, 0), (0, Bx), (0, By), (0, 0)), mode=mode)

    def body(_, xs):
        xl_g, yl_g, iz, fx, fy, fz, oxg, oyg = xs
        W = _onehot_xy(xl_g, yl_g, fx, fy, Bx, By, dtype)
        Znw = _onehot_z(iz, fz, M, periodic, 1.0 - fz, fz, dtype)
        z0 = jnp.zeros((), jnp.int32)
        reg = jax.lax.dynamic_slice(padded, (z0, oxg, oyg, z0),
                                    (3, Bx, By, M))
        # ONE [G, BxBy] @ [BxBy, 3M] matmul (the batched-einsum form lowers
        # to 3 skinny matmuls with transposes around them — measurably
        # slower per scan step)
        regt = jnp.moveaxis(reg.reshape(3, Bx * By, M), 0, 1).reshape(
            Bx * By, 3 * M)
        B = jax.lax.dot(W.T, regt, precision=_HI).reshape(-1, 3, M)
        return 0, jnp.sum(B * Znw[:, None, :], axis=2)  # [G, 3]

    i0p, fp = geo["i0p"], geo["fp"]
    _, outs = jax.lax.scan(body, 0,
                           (geo["xl"], geo["yl"], i0p[:, :, 2], fp[:, :, 0],
                            fp[:, :, 1], fp[:, :, 2], geo["ox"], geo["oy"]))
    acc = outs.reshape(-1, 3)[:Ns]

    fb = realmask & ~geo["valid"].reshape(-1)[:Ns]
    idx, dropped = _pack_offset(fb, jnp.arange(Ns, dtype=jnp.int32),
                                plan.cap, Ns)
    take = jnp.minimum(idx, Ns - 1)
    vals = _interp(list(grids), pos_s[take], geo["lo"], geo["cellm"], M,
                   periodic)
    acc = acc.at[idx].set(vals, mode="drop")
    return acc, dropped
