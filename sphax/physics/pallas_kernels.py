"""Fused Pallas TPU kernels for the SPH hot path (SURVEY.md C4/C5/C7/C8, §7).

These kernels consume the sorted pencil-window structure
(sphax/neighbors/window.py): one grid program per tile of T=128 consecutive
sorted rows; the program DMAs its 3^(D-1) candidate segments (contiguous
HBM rows -> VMEM scratch — the pencil sort is exactly what turns neighbor
search into *sequential* loads instead of random gathers) and then runs
maskless dense [T, S] VPU arithmetic, accumulating over segments so live
intermediates stay ~[128, wseg]:

  * kernel A — adaptive-h Newton iterations FUSED with density/d(rho)/dh
    summation: candidate windows and pair distances are computed once and
    reused by every Newton iteration;
  * kernel B — Balsara div/curl estimators;
  * kernel C — symmetrized pressure force + artificial viscosity + du/dt.

All pair formulae are literal transcriptions of sphax/physics/pairs.py (the
numerical contract, SURVEY.md §2.1); the parity suite pins them to the
float64 reference at 1e-6 (interpret mode on CPU, real kernels on TPU).

Zero-mass padding + the first-occurrence duplicate mask (computed from the
scalar-prefetched w_lo table) make every invalid/duplicate candidate
contribute exactly zero, so there is no masking in the inner loops.

Mosaic notes: window starts are pre-aligned to the 128-lane tiling
(window.build), every ref slice here is kept 2D ([1, S] / [T, S]), and the
Newton loop is a lax.fori_loop so the unroll stays ~n_seg bodies.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sphax.configs import SPHConfig
from sphax.neighbors.window import WindowData, WindowSpec
from sphax.physics import kernels as K


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# shared in-kernel helpers
# ---------------------------------------------------------------------------


def _dma_windows(wl_ref, win_ref, wbuf, sems, i, n_seg, S):
    """Copy each candidate segment of the PACKED window array into VMEM.

    win_ref: [F_pad, 1, Ns] (all fields packed so a segment is ONE strided
    DMA instead of one per field — serial per-field DMAs dominated the step
    at large N); wbuf: [n_seg, F_pad, 1, S]. All segment DMAs start before
    any wait, overlapping their latencies.
    """
    copies = []
    for s in range(n_seg):
        base = pl.multiple_of(wl_ref[i % 8, s], 128)
        cp = pltpu.make_async_copy(
            win_ref.at[:, :, pl.ds(base, S)],
            wbuf.at[s],
            sems.at[s],
        )
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()


def _seg_keep(wl_ref, i, s, S, dtype, n_seg):
    """First-occurrence weight (1/0) for segment s vs earlier segments.

    wl_ref is the FLATTENED [n_tiles * n_seg] start table — 2D SMEM arrays
    get lane-padded to 128 ints per row, which blows the 1 MB SMEM budget at
    large N; 1D stays compact.
    """
    base = wl_ref[i % 8, s]
    k = base + jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    dup = jnp.zeros((1, S), jnp.bool_)
    for sp in range(s):
        b = wl_ref[i % 8, sp]
        dup |= (k >= b) & (k < b + S)
    return jnp.where(dup, jnp.zeros((), dtype), jnp.ones((), dtype))


def _cubic_w(q, h, dim):
    sig = K.sigma(dim)
    q1 = 1.0 - 1.5 * q * q + 0.75 * q * q * q
    t = 2.0 - q
    q2 = 0.25 * t * t * t
    f = jnp.where(q < 1.0, q1, jnp.where(q < 2.0, q2, 0.0))
    return (sig / h**dim) * f


def _cubic_dwdh(q, h, w, dim):
    sig = K.sigma(dim)
    d1 = (-3.0 + 2.25 * q) * q
    t = 2.0 - q
    d2 = -0.75 * t * t
    df = jnp.where(q < 1.0, d1, jnp.where(q < 2.0, d2, 0.0))
    dwdq = (sig / h**dim) * df
    return -(dim * w + q * dwdq) / h


def _cubic_g(q, r, h, dim, eps=1e-30):
    sig = K.sigma(dim)
    g1 = (-3.0 + 2.25 * q) / h
    t = 2.0 - q
    g2 = -0.75 * t * t / jnp.maximum(r, eps)
    g = jnp.where(q < 1.0, g1, jnp.where(q < 2.0, g2, 0.0))
    return (sig / h**dim) * g / h


def _prep(spec: WindowSpec):
    return spec.tile, spec.wseg, spec.n_seg, spec.n_tiles, spec.n_sorted


def _row(x):
    return x.reshape(1, -1)


def _own_spec(T):
    return pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM)


def _wl_spec(n_seg):
    """Per-program SMEM block of the window-start table.

    Scalar-prefetching the WHOLE [n_tiles * n_seg] table hits the 1 MB SMEM
    ceiling at N ≳ 3e6; an (8, n_seg) SMEM block per 8 grid steps stays
    O(1). (Sublane block size must divide 8; the kernel picks row i % 8.)
    """
    return pl.BlockSpec((8, n_seg), lambda i: (i // 8, 0),
                        memory_space=pltpu.SMEM)


def _col(ref, T):
    """Own-field block [1, T] -> [T, 1] column for broadcasting."""
    return ref[:, :].reshape(T, 1)


def _call(kernel, spec: WindowSpec, wd: WindowData, own, win, n_out, dtype,
          extra_scratch=()):
    T, S, n_seg, nt, Ns = _prep(spec)
    # VMEM guard: kernel A keeps ~n_seg*(T+16)*S floats of scratch resident;
    # past S~2048 the 16 MB scoped-VMEM budget blows. (Interpret mode on CPU
    # has no such limit — the jnp fallback covers coarse-grid cases there.)
    if S > 2048 and not _interpret():
        raise ValueError(
            f"window segments of {S} rows exceed the Pallas VMEM budget; "
            "the grid is too coarse for the window engine at this N — use "
            "the dense or cell-list engine (or a smaller cutoff)")
    # pack window fields: [F_pad, 1, Ns] (F_pad multiple of 8 for the DMA
    # slice tiling); one strided DMA then ships a whole segment of all fields
    Fp = -(-len(win) // 8) * 8
    packed = jnp.zeros((Fp, 1, Ns), dtype)
    packed = packed.at[:len(win), 0, :].set(jnp.stack(win))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nt,),
        in_specs=[_wl_spec(n_seg)] + [_own_spec(T)] * len(own)
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[_own_spec(T)] * n_out,
        scratch_shapes=[pltpu.VMEM((n_seg, Fp, 1, S), dtype),
                        pltpu.SemaphoreType.DMA((n_seg,))]
        + list(extra_scratch),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, Ns), dtype)] * n_out,
        interpret=_interpret(),
    )(jnp.pad(wd.w_lo, ((0, (-nt) % 8), (0, 0))),
      *[_row(a) for a in own], packed)
    return [o.reshape(Ns) for o in outs]


# ---------------------------------------------------------------------------
# kernel A: fused Newton-h + density + drho/dh
# ---------------------------------------------------------------------------


def solve_h_density(wd: WindowData, spec: WindowSpec, pos_s, mass_s, h0_s,
                    cfg: SPHConfig, vel_s=None, u_s=None):
    """Returns (h, rho, drho_dh[, div_sum, curl_sum]) per sorted row.

    Windows are DMA'd once and reused by every Newton iteration (same
    iteration as dense/clist/wengine). When cfg.balsara and vel/u are given,
    the Balsara div/curl estimator sums are FUSED into the same program —
    the candidate windows are already resident in VMEM, and cs_i needs only
    the particle's own u (gamma-law: cs = sqrt(gamma (gamma-1) u)), so the
    former standalone kernel B's DMA pass disappears.
    """
    T, S, n_seg, nt, Ns = _prep(spec)
    dim = cfg.dim
    dtype = pos_s.dtype
    iters = cfg.newton_iters if cfg.adaptive_h else 0
    eta_d = float(cfg.eta) ** dim
    hcap = 0.5 * float(spec.cutoff)
    fuse_bals = bool(cfg.balsara) and vel_s is not None

    def kernel(wl_ref, *refs):
        n_own = dim + 2 + (dim if fuse_bals else 0)
        own_refs = refs[:n_own]
        win_ref = refs[n_own]
        out_refs = refs[n_own + 1:n_own + 1 + (5 if fuse_bals else 3)]
        wbuf, sems, rbuf = refs[-3:]
        i = pl.program_id(0)
        _dma_windows(wl_ref, win_ref, wbuf, sems, i, n_seg, S)

        xi = [_col(own_refs[d], T) for d in range(dim)]
        m_i = _col(own_refs[dim], T)
        h_i = _col(own_refs[dim + 1], T)

        # pair distances + dedup'd masses once, reused across iterations
        for s in range(n_seg):
            r2 = jnp.zeros((T, S), dtype)
            for d in range(dim):
                dxd = xi[d] - wbuf[s, d]
                r2 = r2 + dxd * dxd
            rbuf[s] = jnp.sqrt(r2)
            wbuf[s, dim] = wbuf[s, dim] * _seg_keep(wl_ref, i, s, S, dtype, n_seg)

        def sums(h):
            rho = jnp.zeros((T, 1), dtype)
            drdh = jnp.zeros((T, 1), dtype)
            for s in range(n_seg):
                r = rbuf[s]
                m_j = wbuf[s, dim]
                q = r / h
                w = _cubic_w(q, h, dim)
                dwdh = _cubic_dwdh(q, h, w, dim)
                rho = rho + jnp.sum(m_j * w, axis=1, keepdims=True)
                drdh = drdh + jnp.sum(m_j * dwdh, axis=1, keepdims=True)
            return rho, drdh

        m_safe = jnp.maximum(m_i, 1e-30)

        def newton(_, h):
            rho, drdh = sums(h)
            rho = jnp.maximum(rho, 1e-30)
            rho_h = m_safe * eta_d / h**dim
            phi = rho - rho_h
            dphi = drdh + dim * rho_h / h
            dphi = jnp.where(jnp.abs(dphi) < 1e-30, -1e-30, dphi)
            dh = jnp.clip(-phi / dphi, -0.5 * h, 0.5 * h)
            # structural cap: windows only cover neighbours to spec.cutoff
            return jnp.minimum(h + dh, hcap)

        h = jax.lax.fori_loop(0, iters, newton, h_i) if iters else h_i
        rho, drdh = sums(h)
        out_refs[0][:, :] = h.reshape(1, T)
        out_refs[1][:, :] = rho.reshape(1, T)
        out_refs[2][:, :] = drdh.reshape(1, T)

        if fuse_bals:
            vi = [_col(own_refs[dim + 2 + d], T) for d in range(dim)]
            divv = jnp.zeros((T, 1), dtype)
            curl = [jnp.zeros((T, 1), dtype) for _ in range(3)]
            for s in range(n_seg):
                m_j = wbuf[s, dim]  # already dedup'd
                xj = [wbuf[s, d] for d in range(dim)]
                vj = [wbuf[s, dim + 1 + d] for d in range(dim)]
                dx = [xi[d] - xj[d] for d in range(dim)]
                dv = [vi[d] - vj[d] for d in range(dim)]
                r = rbuf[s]
                g = _cubic_g(r / h, r, h, dim)
                mw = m_j * g
                vdotr = sum(dv[d] * dx[d] for d in range(dim))
                divv = divv + jnp.sum(mw * vdotr, axis=1, keepdims=True)
                if dim == 3:
                    curl[0] += jnp.sum(mw * (dv[1] * dx[2] - dv[2] * dx[1]),
                                       axis=1, keepdims=True)
                    curl[1] += jnp.sum(mw * (dv[2] * dx[0] - dv[0] * dx[2]),
                                       axis=1, keepdims=True)
                    curl[2] += jnp.sum(mw * (dv[0] * dx[1] - dv[1] * dx[0]),
                                       axis=1, keepdims=True)
                elif dim == 2:
                    curl[0] += jnp.sum(mw * (dv[0] * dx[1] - dv[1] * dx[0]),
                                       axis=1, keepdims=True)
            out_refs[3][:, :] = divv.reshape(1, T)
            if dim == 3:
                cm = jnp.sqrt(curl[0] ** 2 + curl[1] ** 2 + curl[2] ** 2)
            elif dim == 2:
                cm = jnp.abs(curl[0])
            else:
                cm = jnp.zeros((T, 1), dtype)
            out_refs[4][:, :] = cm.reshape(1, T)

    own = [pos_s[:, d] for d in range(dim)] + [mass_s, h0_s]
    win = [pos_s[:, d] for d in range(dim)] + [mass_s]
    if fuse_bals:
        own += [vel_s[:, d] for d in range(dim)]
        win += [vel_s[:, d] for d in range(dim)]
    rscratch = pltpu.VMEM((n_seg, T, S), dtype)
    outs = _call(kernel, spec, wd, own, win, 5 if fuse_bals else 3, dtype,
                 extra_scratch=[rscratch])
    return tuple(outs)


# ---------------------------------------------------------------------------
# kernel B: Balsara div/curl estimator sums
# ---------------------------------------------------------------------------


def balsara(wd: WindowData, spec: WindowSpec, pos_s, vel_s, mass_s, h_s,
            cfg: SPHConfig):
    """Returns (div_sum, curl_mag_sum): unnormalised estimator sums."""
    T, S, n_seg, nt, Ns = _prep(spec)
    dim = cfg.dim
    dtype = pos_s.dtype

    def kernel(wl_ref, *refs):
        n_own = 2 * dim + 1
        own_refs = refs[:n_own]
        win_ref = refs[n_own]
        div_out, curl_out = refs[n_own + 1:n_own + 3]
        wbuf, sems = refs[-2:]
        i = pl.program_id(0)
        _dma_windows(wl_ref, win_ref, wbuf, sems, i, n_seg, S)

        xi = [_col(own_refs[d], T) for d in range(dim)]
        vi = [_col(own_refs[dim + d], T) for d in range(dim)]
        h_i = _col(own_refs[2 * dim], T)

        divv = jnp.zeros((T, 1), dtype)
        curl = [jnp.zeros((T, 1), dtype) for _ in range(3)]
        for s in range(n_seg):
            keep = _seg_keep(wl_ref, i, s, S, dtype, n_seg)
            xj = [wbuf[s, d] for d in range(dim)]
            vj = [wbuf[s, dim + d] for d in range(dim)]
            m_j = wbuf[s, 2 * dim] * keep
            dx = [xi[d] - xj[d] for d in range(dim)]
            dv = [vi[d] - vj[d] for d in range(dim)]
            r2 = sum(d_ * d_ for d_ in dx)
            r = jnp.sqrt(r2)
            g = _cubic_g(r / h_i, r, h_i, dim)
            mw = m_j * g
            vdotr = sum(dv[d] * dx[d] for d in range(dim))
            divv = divv + jnp.sum(mw * vdotr, axis=1, keepdims=True)
            if dim == 3:
                curl[0] += jnp.sum(mw * (dv[1] * dx[2] - dv[2] * dx[1]),
                                   axis=1, keepdims=True)
                curl[1] += jnp.sum(mw * (dv[2] * dx[0] - dv[0] * dx[2]),
                                   axis=1, keepdims=True)
                curl[2] += jnp.sum(mw * (dv[0] * dx[1] - dv[1] * dx[0]),
                                   axis=1, keepdims=True)
            elif dim == 2:
                curl[0] += jnp.sum(mw * (dv[0] * dx[1] - dv[1] * dx[0]),
                                   axis=1, keepdims=True)
        div_out[:, :] = divv.reshape(1, T)
        if dim == 3:
            cm = jnp.sqrt(curl[0] ** 2 + curl[1] ** 2 + curl[2] ** 2)
        elif dim == 2:
            cm = jnp.abs(curl[0])
        else:
            cm = jnp.zeros((T, 1), dtype)
        curl_out[:, :] = cm.reshape(1, T)

    own = ([pos_s[:, d] for d in range(dim)]
           + [vel_s[:, d] for d in range(dim)] + [h_s])
    win = ([pos_s[:, d] for d in range(dim)]
           + [vel_s[:, d] for d in range(dim)] + [mass_s])
    div_sum, curl_sum = _call(kernel, spec, wd, own, win, 2, dtype)
    return div_sum, curl_sum


# ---------------------------------------------------------------------------
# kernel C: symmetrized pressure force + artificial viscosity + du/dt
# ---------------------------------------------------------------------------


def forces(wd: WindowData, spec: WindowSpec, pos_s, vel_s, mass_s, h_s,
           rho_s, P_s, cs_s, om_s, bf_s, cfg: SPHConfig):
    """Returns (acc_s [Ns, D], du_s [Ns]). Literal pairs.force_terms."""
    T, S, n_seg, nt, Ns = _prep(spec)
    dim = cfg.dim
    dtype = pos_s.dtype
    use_bf = bool(cfg.balsara)
    alpha, beta, epsv = (float(cfg.alpha_visc), float(cfg.beta_visc),
                         float(cfg.eps_visc))
    n_scal = 5 + (1 if use_bf else 0)  # h, rho, P, cs, om (, bf)

    def kernel(wl_ref, *refs):
        n_own = 2 * dim + n_scal
        own_refs = refs[:n_own]
        win_ref = refs[n_own]
        out_refs = refs[n_own + 1:n_own + 2 + dim]
        wbuf, sems = refs[-2:]
        i = pl.program_id(0)
        _dma_windows(wl_ref, win_ref, wbuf, sems, i, n_seg, S)

        o = iter(range(n_own))
        xi = [_col(own_refs[next(o)], T) for _ in range(dim)]
        vi = [_col(own_refs[next(o)], T) for _ in range(dim)]
        h_i = _col(own_refs[next(o)], T)
        rho_i = _col(own_refs[next(o)], T)
        P_i = _col(own_refs[next(o)], T)
        cs_i = _col(own_refs[next(o)], T)
        om_i = _col(own_refs[next(o)], T)
        bf_i = _col(own_refs[next(o)], T) if use_bf else None

        ci = P_i / (om_i * rho_i * rho_i)

        acc = [jnp.zeros((T, 1), dtype) for _ in range(dim)]
        du = jnp.zeros((T, 1), dtype)
        for s in range(n_seg):
            keep = _seg_keep(wl_ref, i, s, S, dtype, n_seg)
            w = iter(range(2 * dim + n_scal + 1))
            xj = [wbuf[s, next(w)] for _ in range(dim)]
            vj = [wbuf[s, next(w)] for _ in range(dim)]
            m_j = wbuf[s, next(w)] * keep
            h_j = wbuf[s, next(w)]
            rho_j = wbuf[s, next(w)]
            P_j = wbuf[s, next(w)]
            cs_j = wbuf[s, next(w)]
            om_j = wbuf[s, next(w)]
            bf_j = wbuf[s, next(w)] if use_bf else None

            dx = [xi[d] - xj[d] for d in range(dim)]
            dv = [vi[d] - vj[d] for d in range(dim)]
            r2 = sum(d_ * d_ for d_ in dx)
            r = jnp.sqrt(r2)

            gi = _cubic_g(r / h_i, r, h_i, dim)
            gj = _cubic_g(r / h_j, r, h_j, dim)
            gbar = 0.5 * (gi + gj)
            cj = P_j / (om_j * rho_j * rho_j)

            vdotr = sum(dv[d] * dx[d] for d in range(dim))
            hbar = 0.5 * (h_i + h_j)
            mu = hbar * vdotr / (r2 + epsv * hbar * hbar)
            mu = jnp.where(vdotr < 0.0, mu, 0.0)
            cbar = 0.5 * (cs_i + cs_j)
            rhobar = 0.5 * (rho_i + rho_j)
            Pi = (-alpha * cbar * mu + beta * mu * mu) / rhobar
            if use_bf:
                Pi = Pi * (0.5 * (bf_i + bf_j))

            fcoef = m_j * (ci * gi + cj * gj + Pi * gbar)
            for d in range(dim):
                acc[d] = acc[d] - jnp.sum(fcoef * dx[d], axis=1,
                                          keepdims=True)
            du = du + jnp.sum(m_j * (ci * gi + 0.5 * Pi * gbar) * vdotr,
                              axis=1, keepdims=True)
        for d in range(dim):
            out_refs[d][:, :] = acc[d].reshape(1, T)
        out_refs[dim][:, :] = du.reshape(1, T)

    own = ([pos_s[:, d] for d in range(dim)]
           + [vel_s[:, d] for d in range(dim)]
           + [h_s, rho_s, P_s, cs_s, om_s]
           + ([bf_s] if use_bf else []))
    win = ([pos_s[:, d] for d in range(dim)]
           + [vel_s[:, d] for d in range(dim)]
           + [mass_s, h_s, rho_s, P_s, cs_s, om_s]
           + ([bf_s] if use_bf else []))
    outs = _call(kernel, spec, wd, own, win, dim + 1, dtype)
    acc = jnp.stack(outs[:dim], axis=-1)
    return acc, outs[dim]


# ---------------------------------------------------------------------------
# kernel G: direct-sum softened gravity (BASELINE.json:10 — long-range,
# all-pairs; used by the Evrard config. O(N^2): each program owns T rows and
# streams the full particle set through VMEM in column chunks.)
# ---------------------------------------------------------------------------


def gravity(pos, mass, cfg: SPHConfig, chunk: int = 1024):
    """acc[N, D] = -G sum_j m_j (r^2 + eps^2)^{-3/2} dx, Plummer-softened.

    Self-pairs contribute exactly zero (dx = 0). Inputs are packed
    [8, 1, Np] (x, y, z, m, zero-pad fields; Np padded to ``chunk``) so each
    column chunk is one strided DMA.
    """
    n, dim = pos.shape
    dtype = pos.dtype
    T = 128
    npad = -(-n // chunk) * chunk
    npad = max(npad, T)
    npad = -(-npad // T) * T
    nt = npad // T
    nchunks = npad // chunk
    geps2 = float(cfg.grav_eps) ** 2

    fields = [pos[:, d] for d in range(dim)] + [mass]
    packed = jnp.zeros((8, 1, npad), dtype)
    for k, f in enumerate(fields):
        packed = packed.at[k, 0, :n].set(f)

    def kernel(*refs):
        own_refs = refs[:dim]
        src_ref = refs[dim]
        out_refs = refs[dim + 1:dim + 1 + dim]
        cbuf, sem = refs[-2:]

        xi = [_col(own_refs[d], T) for d in range(dim)]
        acc = [jnp.zeros((T, 1), dtype) for _ in range(dim)]

        def body(c, acc):
            cp = pltpu.make_async_copy(
                src_ref.at[:, :, pl.ds(c * chunk, chunk)], cbuf, sem)
            cp.start()
            cp.wait()
            dx = [xi[d] - cbuf[d] for d in range(dim)]
            r2 = sum(d_ * d_ for d_ in dx) + geps2
            m_j = cbuf[dim]
            inv = m_j * jax.lax.rsqrt(r2) / r2
            return [acc[d] - jnp.sum(inv * dx[d], axis=1, keepdims=True)
                    for d in range(dim)]

        acc = jax.lax.fori_loop(0, nchunks, body, acc)
        for d in range(dim):
            out_refs[d][:, :] = (float(cfg.G) * acc[d]).reshape(1, T)

    own = [jnp.pad(f, (0, npad - n)) for f in fields[:dim]]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nt,),
        in_specs=[_own_spec(T)] * dim + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[_own_spec(T)] * dim,
        scratch_shapes=[pltpu.VMEM((8, 1, chunk), dtype),
                        pltpu.SemaphoreType.DMA],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, npad), dtype)] * dim,
        interpret=_interpret(),
    )(*[_row(a) for a in own], packed)
    return jnp.stack([o.reshape(npad)[:n] for o in outs], axis=-1)
