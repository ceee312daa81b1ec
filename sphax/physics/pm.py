r"""P3M self-gravity: FFT mesh long-range + screened pair short-range.

SURVEY.md C11 names "Barnes-Hut later" as the scalable-gravity target; on
TPU the idiomatic equivalent is PARTICLE-MESH: a data-dependent tree
traversal fights the vector/systolic model (and Mosaic's lane-local gather
limit, NEXT.md), while FFTs are first-class XLA ops. The classic Ewald
split makes the combination exact up to mesh resolution:

    1/r = erfc(r / 2 r_s) / r   +   erf(r / 2 r_s) / r
          \__ short-range __/       \__ long-range __/

* The SHORT-RANGE force  G m_j S(r) / r^2,
      S(r) = erfc(r/2rs) + (r / (rs sqrt(pi))) exp(-r^2 / 4 rs^2),
  decays to ~1e-3 by r = 4.5 rs, so it is a NEIGHBOR interaction — it
  rides the same candidate structures as the SPH forces (dense blocked
  pass here; window tile pass in wengine for O(N)).
* The LONG-RANGE force is the gradient of the Gaussian-filtered potential,
  solved on a CIC mesh by FFT:
  - periodic box: k-space Green's function -4 pi G exp(-k^2 rs^2) / k^2
    with CIC deconvolution (W^2), spectral gradient i*k;
  - open box (Evrard): Hockney-Eastwood zero-padded convolution with the
    SAMPLED free-space force kernels (exact discrete convolution, no
    periodic images).

Accuracy: rs >= 1.5 mesh cells keeps the k-modes the CIC mesh represents
poorly exponentially suppressed; measured rms force error vs direct sum is
at the ~1e-3 level (tests/unit/test_pm.py). Plummer softening eps applies
to the short-range part only and must satisfy eps << rs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sphax.configs import SPHConfig
from sphax.core.state import Domain


def short_range_factor(r, rs, eps):
    """f(r) with acc_i = -G sum_j m_j f(r_ij) dx_ij (screened, softened)."""
    x = r / (2.0 * rs)
    screen = jax.lax.erfc(x) + (r / (rs * jnp.sqrt(jnp.pi))) * jnp.exp(
        -x * x)
    return screen * (r * r + eps * eps) ** -1.5


def _cic_weights(pos, lo, cell, M, periodic):
    """CIC node weights: returns (i0 [N,D] int, frac [N,D]) with the node
    grid at lo + k*cell (k = 0..M-1)."""
    u = (pos - lo) / cell
    if periodic:
        u = jnp.mod(u, M)
        i0 = jnp.floor(u).astype(jnp.int32)
        frac = u - i0
        i0 = jnp.mod(i0, M)
    else:
        # clip FIRST, then derive the fraction from the clipped node: the
        # outermost cell near a hi face (u in [M-1, M)) must deposit with
        # weights referenced to its actual left node, not an unclipped one
        # (advisor round-2 medium #2 — measured p99 open-box force error
        # 0.26 -> 0.12 on an edge-heavy cloud with this form)
        i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, M - 2)
        frac = jnp.clip(u - i0, 0.0, 1.0)
    return i0, frac


def _deposit(pos, mass, lo, cell, M, periodic):
    """CIC mass deposit onto an [M, M, M] node grid."""
    n, dim = pos.shape
    assert dim == 3
    i0, f = _cic_weights(pos, lo, cell, M, periodic)
    grid = jnp.zeros((M, M, M), pos.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (jnp.where(dx, f[:, 0], 1 - f[:, 0])
                     * jnp.where(dy, f[:, 1], 1 - f[:, 1])
                     * jnp.where(dz, f[:, 2], 1 - f[:, 2]))
                ix = i0[:, 0] + dx
                iy = i0[:, 1] + dy
                iz = i0[:, 2] + dz
                if periodic:
                    ix, iy, iz = ix % M, iy % M, iz % M
                grid = grid.at[ix, iy, iz].add(mass * w)
    return grid


def _interp(grids, pos, lo, cell, M, periodic):
    """CIC interpolation of [D][M,M,M] grids back to particles -> [N, D]."""
    i0, f = _cic_weights(pos, lo, cell, M, periodic)
    out = []
    for g in grids:
        acc = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = (jnp.where(dx, f[:, 0], 1 - f[:, 0])
                         * jnp.where(dy, f[:, 1], 1 - f[:, 1])
                         * jnp.where(dz, f[:, 2], 1 - f[:, 2]))
                    ix = i0[:, 0] + dx
                    iy = i0[:, 1] + dy
                    iz = i0[:, 2] + dz
                    if periodic:
                        ix, iy, iz = ix % M, iy % M, iz % M
                    acc = acc + w * g[ix, iy, iz]
        out.append(acc)
    return jnp.stack(out, axis=-1)


def rs_traced(cfg: SPHConfig, domain: Domain, dtype, cutoff=None):
    """Split scale r_s (traced). If the short-range pass rides a neighbor
    structure with search radius ``cutoff``, r_s shrinks so the screened
    tail (4.5 r_s) always fits inside it — the split stays CONSISTENT
    between mesh and pairs, and gravity is never silently truncated."""
    M = int(cfg.grav_mesh)
    rs = jnp.asarray(cfg.grav_rs_cells, dtype) * (domain.extent.astype(dtype)
                                                  / M).min()
    if cutoff is not None:
        rs = jnp.minimum(rs, jnp.asarray(cutoff, dtype) / 4.5)
    return rs


def _solve_grids(grid, domain: Domain, G, rs, M, periodic):
    """Poisson solve: mass grid -> [3, M, M, M] acceleration node grids
    (periodic: k-space Green's function; open: Hockney zero-padded
    convolution with sampled free-space force kernels)."""
    dtype = grid.dtype
    lo = domain.lo.astype(dtype)
    ext = domain.extent.astype(dtype)
    cell = ext / M
    if periodic:
        k1 = [2 * jnp.pi * jnp.fft.fftfreq(M).astype(dtype) / cell[d]
              for d in range(3)]
        kx = k1[0][:, None, None]
        ky = k1[1][None, :, None]
        kz = k1[2][None, None, :]
        k2 = kx * kx + ky * ky + kz * kz
        k2 = jnp.where(k2 == 0.0, 1.0, k2)

        def sinc(x):
            return jnp.where(x == 0.0, 1.0,
                             jnp.sin(x) / jnp.where(x == 0.0, 1.0, x))
        # W is the CIC (triangular-cloud) kernel transform: per-axis sinc^2.
        # Deconvolve ONE factor of W each for deposit and interpolation —
        # W^2 total (Hockney-Eastwood); dividing by W^4 over-sharpens and
        # triples the rms force error (advisor round-2 medium #1).
        W = (sinc(0.5 * kx * cell[0]) * sinc(0.5 * ky * cell[1])
             * sinc(0.5 * kz * cell[2])) ** 2
        W2 = jnp.maximum(W, 1e-3) ** 2
        mhat = jnp.fft.fftn(grid)
        phihat = (-4.0 * jnp.pi * G * jnp.exp(-k2 * rs * rs) / k2 / W2) * mhat
        phihat = phihat.at[0, 0, 0].set(0.0)
        return jnp.stack(
            [jnp.real(jnp.fft.ifftn(-1j * kd * phihat)) / jnp.prod(cell)
             for kd in (kx, ky, kz)])
    P = 2 * M
    gpad = jnp.zeros((P, P, P), dtype).at[:M, :M, :M].set(grid)
    ax = [jnp.arange(P) for _ in range(3)]
    coord = [jnp.where(a < M, a, a - P).astype(dtype) * c
             for a, c in zip(ax, cell)]
    rx = coord[0][:, None, None]
    ry = coord[1][None, :, None]
    rz = coord[2][None, None, :]
    r2 = rx * rx + ry * ry + rz * rz
    r = jnp.sqrt(jnp.maximum(r2, 1e-30))
    x = r / (2.0 * rs)
    fmag = (jax.lax.erf(x) / jnp.maximum(r2 * r, 1e-30)
            - jnp.exp(-x * x) / (rs * jnp.sqrt(jnp.pi)
                                 * jnp.maximum(r2, 1e-30)))
    fmag = jnp.where(r2 <= 0.0, 0.0, fmag)
    khat = [jnp.fft.fftn(rd * fmag) for rd in (rx, ry, rz)]
    mhat = jnp.fft.fftn(gpad)
    return jnp.stack([jnp.real(jnp.fft.ifftn(mhat * kh))[:M, :M, :M] * (-G)
                      for kh in khat])


def _solve_and_interp(grid, pos_eval, domain: Domain, G, rs, M, periodic):
    """Shared back half: Green's function / Hockney solve + CIC interp."""
    dtype = pos_eval.dtype
    cell = domain.extent.astype(dtype) / M
    grids = _solve_grids(grid, domain, G, rs, M, periodic)
    return _interp(list(grids), pos_eval, domain.lo.astype(dtype), cell, M,
                   periodic)


@partial(jax.jit, static_argnames=("cfg", "axis_name"))
def mesh_accel(pos, mass, cfg: SPHConfig, domain: Domain, rs=None,
               axis_name=None):
    """Long-range (Gaussian-filtered) gravitational acceleration [N, D].

    ``axis_name``: when called inside a shard_map over that axis, each
    shard deposits ITS particles on a full copy of the (small) global grid
    and one psum makes the grids identical — the FFT solve is then
    replicated per shard, which at PM grid sizes (<= 128^3) is far cheaper
    than a distributed FFT, and the interp back is purely local. This is
    the distributed P3M mesh used by dist/wslab.py.
    """
    M = int(cfg.grav_mesh)
    dtype = pos.dtype
    if rs is None:
        rs = rs_traced(cfg, domain, dtype)
    per = domain.periodic_axes(pos.shape[1])
    periodic = all(per)
    if not periodic and any(per):
        raise NotImplementedError("P3M needs fully periodic or fully open "
                                  "box")
    lo = domain.lo.astype(dtype)
    ext = domain.extent.astype(dtype)
    cell = ext / M
    pos_dep = domain.wrap(pos)
    grid = _deposit(pos_dep, mass, lo, cell, M, periodic)
    if axis_name is not None:
        grid = jax.lax.psum(grid, axis_name)
    return _solve_and_interp(grid, pos_dep, domain, float(cfg.G), rs, M,
                             periodic)


def mesh_accel_sorted(pos_s, mass_s, real_s, cfg: SPHConfig, domain: Domain,
                      plan, rs=None, axis_name=None):
    """`mesh_accel` over the SORTED window rows (ghosts mass-masked):
    scatter-free CIC via pm_sorted's brick-matmul scan — measured levers in
    BASELINE.md. Returns ([Ns, 3] accel at sorted rows, fallback-overflow
    count; callers surface the counter like h_capped)."""
    from sphax.physics import pm_sorted

    M = int(cfg.grav_mesh)
    dtype = pos_s.dtype
    if rs is None:
        rs = rs_traced(cfg, domain, dtype)
    per = domain.periodic_axes(pos_s.shape[1])
    periodic = all(per)
    if not periodic and any(per):
        raise NotImplementedError("P3M needs fully periodic or fully open "
                                  "box")
    w = jnp.where(real_s, mass_s, jnp.zeros((), dtype))
    grid, d1 = pm_sorted.deposit_sorted(pos_s, w, domain, M, periodic, plan)
    if axis_name is not None:
        grid = jax.lax.psum(grid, axis_name)
    grids = _solve_grids(grid, domain, float(cfg.G), rs, M, periodic)
    acc, d2 = pm_sorted.interp_sorted(grids, pos_s, real_s, domain, M,
                                      periodic, plan)
    return acc, d1 + d2


def rs_value(cfg: SPHConfig, domain: Domain):
    """The split scale r_s (length units; host-side, domain concrete)."""
    return float(cfg.grav_rs_cells) * float(
        np.min(np.asarray(jnp.asarray(domain.extent)))) / int(cfg.grav_mesh)


def r_cut(cfg: SPHConfig, domain: Domain):
    """Short-range cutoff: erfc screening < ~2e-3 beyond 4.5 r_s."""
    return 4.5 * rs_value(cfg, domain)


def short_accel_dense(pos, mass, cfg: SPHConfig, domain: Domain,
                      block: int = 128):
    """Screened short-range pair force, blocked over ALL pairs (small N /
    validation path; the window engine computes the same sum over its
    candidate structure for O(N))."""
    from sphax.physics.dense import _blocked

    rs = rs_traced(cfg, domain, pos.dtype)
    eps = jnp.asarray(cfg.grav_eps, pos.dtype)

    def body(args):
        (pos_i,) = args
        dx = domain.displacement(pos_i[:, None, :] - pos[None, :, :])
        r = jnp.sqrt(jnp.sum(dx * dx, -1))
        f = short_range_factor(r, rs, eps) * mass[None, :]
        # self-pair: r=0 -> dx=0 kills the contribution, but the factor is
        # finite only thanks to eps; mask to be exact for eps ~ 0 too
        f = jnp.where(r > 0.0, f, 0.0)
        return -float(cfg.G) * jnp.sum(f[..., None] * dx, axis=-2)

    return _blocked(body, [pos], block)


@partial(jax.jit, static_argnames=("cfg",))
def p3m_accel_dense(pos, mass, cfg: SPHConfig, domain: Domain):
    """Full P3M acceleration with the dense short-range path."""
    return (mesh_accel(pos, mass, cfg, domain)
            + short_accel_dense(pos, mass, cfg, domain))
