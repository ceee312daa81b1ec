"""Fused Pallas TPU kernels for the SPH hot path (SURVEY.md C4/C5/C7/C8, §7).

These kernels consume the sorted pencil-window structure
(sphax/neighbors/window.py): one grid program per tile of T=128 consecutive
sorted rows; the program DMAs its 3^(D-1) candidate segments (contiguous
HBM rows -> VMEM scratch — the pencil sort is exactly what turns neighbor
search into *sequential* loads instead of random gathers) and then runs
maskless dense [T, S] VPU arithmetic, accumulating over segments so live
intermediates stay ~[128, wseg]:

  * kernel A — adaptive-h Newton iterations FUSED with density/d(rho)/dh
    summation (and, when a viscosity switch needs them, the Balsara
    div/curl estimator sums): candidate windows and pair distances are
    computed once and reused by every Newton iteration;
  * kernel C — symmetrized pressure force + artificial viscosity + du/dt;
  * kernel G — direct-sum softened gravity (streamed column chunks).

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

import os

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


def _dma_windows(wt_ref, wn_ref, win_ref, wbuf, sems, i, n_seg, S):
    """Copy each tile-UNION candidate window into VMEM (one DMA each).

    win_ref: [F_pad, 1, Ns] (all fields packed so a segment is ONE strided
    DMA instead of one per field — serial per-field DMAs dominated the step
    at large N); wbuf: [n_seg, F_pad, 1, S]. The window is the tile-level
    UNION of the row-group windows (WindowData.t_lo): all R groups share it
    and compute only their own 128-block sub-ranges, so rgroups > 1 trims
    pair math at R=1's DMA bytes. (Measured alternatives: per-group windows
    ship ~R x the bytes; per-128-block predicated copies pay ~6% in DMA
    issue overhead — both slower.) Fully-empty windows (trash/pad tiles,
    distributed layouts) are skipped via wn_ref. All starts precede any
    wait, overlapping the copy latencies.
    """
    row = i % 8

    def copy(s):
        base = pl.multiple_of(wt_ref[row, s], 128)
        return pltpu.make_async_copy(
            win_ref.at[:, :, pl.ds(base, S)], wbuf.at[s], sems.at[s])

    for s in range(n_seg):
        @pl.when(wn_ref[row, s] > 0)
        def _(s=s):
            copy(s).start()
    for s in range(n_seg):
        @pl.when(wn_ref[row, s] > 0)
        def _(s=s):
            copy(s).wait()


def _grp_when(off, nact, b, blkw):
    """Predicate: compute-block b intersects the group's active sub-range
    [off, off + nact) of 128-blocks. Mosaic (blkw == 128): off <= b <
    off + nact. Interpret (one full-width block): active iff nact > 0
    (off is normalized to 0 for empty groups in _call, and off < S/128
    whenever nact > 0, so the second clause holds)."""
    return ((b * blkw < (off + nact) * 128)
            & ((b + 1) * blkw > off * 128))


def _blk_keep(wt_ref, gof_ref, gn_ref, row, col0, s, b, dtype, blkw, nblk,
              S):
    """First-occurrence weight (1/0) for compute-block b of segment s.

    A candidate row is a duplicate iff an EARLIER segment's COMPUTED range
    contains it. On the Mosaic path a group computes exactly the blocks
    [t_lo[sp] + off*128, + nact*128); in interpret mode (nblk == 1) it
    computes the whole union window of any non-empty segment. Rows computed
    by one convention and not the other contribute zero either way (outside
    kernel support or zero mass), so all paths agree exactly. ``col0`` is
    the row-group's column base in the [8, rgroups * n_seg] offset tables —
    dedup is per-group, matching the jnp path's per-group dedup_mask.
    """
    k = (wt_ref[row, s] + b * blkw
         + jax.lax.broadcasted_iota(jnp.int32, (1, blkw), 1))
    dup = jnp.zeros((1, blkw), jnp.bool_)
    for sp in range(s):
        if _interpret():
            lo = wt_ref[row, sp]
            hi = lo + jnp.where(gn_ref[row, col0 + sp] > 0, S, 0)
        else:
            # the COMPUTED range rounds [off, off + gn) outward to blkw
            # granularity (bb 128-blocks per compute block) — with
            # blkw == 128 this is exactly [off, off + gn)
            bb = blkw // 128
            off = gof_ref[row, col0 + sp]
            gn = gn_ref[row, col0 + sp]
            b0 = (off // bb) * bb
            b1 = jnp.minimum(-(-(off + gn) // bb) * bb, nblk * bb)
            b1 = jnp.where(gn > 0, b1, b0)
            lo = wt_ref[row, sp] + b0 * 128
            hi = wt_ref[row, sp] + b1 * 128
        dup |= (k >= lo) & (k < hi)
    return jnp.where(dup, jnp.zeros((), dtype), jnp.ones((), dtype))


def _blocks(S, interp_blk=None):
    """Compute-block layout: blkw-wide predicated blocks on the Mosaic path
    (skip blocks outside the group's true candidate range); one full-width
    block in interpret mode, where per-op overhead dominates and a fori
    over 128-blocks would make CPU CI pathologically slow. The predicates
    activate a superset of the same candidate rows either way (inactive
    rows contribute zero).

    ``interp_blk`` (compact candidate path only) overrides the interpret-
    mode block width to exactly one group's cwidth slice: the compact
    buffer holds each group's candidates as SEPARATE copies, so a whole-
    union walk would double-count rows shared between groups — interp_blk
    makes each group compute exactly its own slice (one block per group,
    _grp_when selects b == group).

    SPHAX_BLKW (env, default 128) selects a wider compute block: fewer
    predicated regions (less Mosaic branch overhead — the measured cost
    that makes rgroups=4 lose to rgroups=2) at the price of rounding each
    group's active range outward to blkw. Falls back to 128 when the
    static wseg is not divisible."""
    if _interpret():
        if interp_blk:
            return S // interp_blk, interp_blk
        return 1, S
    blkw = int(os.environ.get("SPHAX_BLKW", 128))
    if blkw < 128 or S % blkw:
        blkw = 128
    return S // blkw, blkw


def _prep(spec: WindowSpec):
    return spec.tile, spec.wseg, spec.n_seg, spec.n_tiles, spec.n_sorted


def _groups(spec: WindowSpec):
    """(R, Tg): row-groups per tile and rows per group. Each 128-row tile
    program statically unrolls R sub-computations of Tg rows, each against
    its own per-segment windows (w_lo/w_nact column block g*n_seg..)."""
    return spec.rgroups, spec.group


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


def _compact_view(wd: WindowData, spec: WindowSpec, win, mass_col: int):
    """Degenerate-window view of the compacted candidate buffer.

    The per-group compacted lists (WindowData.c_idx, built in XLA-land at
    rebuild cadence — see window.build) are gathered into ONE candidate-
    major packed buffer of M = n_tiles * rgroups * cwidth rows; the
    existing kernels then consume it as a structure with a single segment
    of S = rgroups * cwidth rows per tile, where group gg's active
    sub-range is [gg * cwidth, gg * cwidth + ceil(c_n / 128) * 128). The
    kernels' whole walk machinery (shared-union DMA, per-group block
    predication, early-out) applies verbatim; the in-kernel first-
    occurrence dedup is skipped (n_seg == 1 — compaction already clipped
    duplicates) and the gather zero-masses the padding entries past c_n.

    Returns (wd_view, spec_view, packed [Fp, 1, M]).
    """
    import dataclasses

    from sphax.neighbors import window as winmod

    C = spec.cwidth
    R, Tg = _groups(spec)
    nt = spec.n_tiles
    nG = spec.n_groups
    dtype = win[0].dtype
    cols = jnp.stack(win, axis=-1)                     # [Ns, K]
    gath = winmod.gather_cands(cols, wd, mass_col)     # [M, K]
    Fp = -(-len(win) // 8) * 8
    M = nG * C
    packed = jnp.zeros((Fp, 1, M), dtype)
    packed = packed.at[:len(win), 0, :].set(gath.T)

    gn = jnp.clip(-(-wd.c_n // 128), 0, C // 128).astype(jnp.int32)
    w_lo = (jnp.arange(nG, dtype=jnp.int32) * C)[:, None]      # [nG, 1]
    t_lo = (jnp.arange(nt, dtype=jnp.int32) * (R * C))[:, None]
    t_nact = jnp.max(gn.reshape(nt, R), axis=1)[:, None]
    wd_view = wd._replace(w_lo=w_lo, w_nact=gn[:, None],
                          t_lo=t_lo, t_nact=t_nact)
    spec_view = dataclasses.replace(
        spec, res=(spec.res[-1],), wseg=R * C,
        n_sorted=spec.n_sorted)  # res -> dim 1 so n_seg == 1
    return wd_view, spec_view, packed


def _call(kernel, spec: WindowSpec, wd: WindowData, own, win, n_out, dtype,
          extra_scratch=(), name="sphax_window_kernel", scalars=None,
          packed_win=None):
    """``scalars`` (optional [k] array): traced per-call scalars (e.g. the
    P3M split scale) shipped to every program as one (1, k) SMEM row,
    appearing as the ref right after the four window tables.

    ``packed_win`` (compact candidate path): a pre-gathered [Fp, 1, M]
    window buffer replacing the in-place sorted-row windows; M = the total
    compacted-buffer length (n_tiles * wseg with the degenerate one-segment
    spec view) instead of n_sorted."""
    T, S, n_seg, nt, Ns = _prep(spec)
    R, Tg = _groups(spec)
    n_win = R * n_seg
    # VMEM guard: kernel A keeps ~n_seg*(Fp + Tg + 1)*S floats of scratch
    # resident; past S~1536 the 16 MB scoped-VMEM budget blows. (Interpret
    # mode on CPU has no such limit — the jnp fallback covers coarse-grid
    # cases there.) The compact path (n_seg == 1) has no per-segment
    # multiplier, so its budget is correspondingly wider.
    if S > (4096 if n_seg == 1 else 1536) and not _interpret():
        raise ValueError(
            f"window segments of {S} rows exceed the Pallas VMEM budget; "
            "the grid is too coarse for the window engine at this N — use "
            "the dense or cell-list engine (or a smaller cutoff)")
    # pack window fields: [F_pad, 1, Ns] (F_pad multiple of 8 for the DMA
    # slice tiling); one strided DMA then ships a whole segment of all fields
    if packed_win is not None:
        Fp = packed_win.shape[0]
        packed = packed_win
    else:
        Fp = -(-len(win) // 8) * 8
        packed = jnp.zeros((Fp, 1, Ns), dtype)
        packed = packed.at[:len(win), 0, :].set(jnp.stack(win))
    # tile tables [nt, n_seg]: shared DMA windows; group tables
    # [nt, R * n_seg] (group-major columns): each group's active 128-block
    # sub-range [off, off + gn) within its tile's shared window
    t_lo, t_na = wd.t_lo, wd.t_nact
    goff = (wd.w_lo.reshape(nt, R, n_seg) - t_lo[:, None, :]) // 128
    goff = jnp.maximum(goff, 0)
    gn = jnp.minimum(wd.w_nact.reshape(nt, R, n_seg),
                     jnp.maximum(S // 128 - goff, 0))
    goff = jnp.where(gn > 0, goff, 0).reshape(nt, n_win)
    gn = gn.reshape(nt, n_win)
    pad8 = ((0, (-nt) % 8), (0, 0))
    sc_in, sc_spec = (), ()
    if scalars is not None:
        sc_in = (scalars.astype(dtype).reshape(1, -1),)
        sc_spec = (pl.BlockSpec((1, scalars.shape[0]), lambda i: (0, 0),
                                memory_space=pltpu.SMEM),)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nt,),
        in_specs=[_wl_spec(n_seg), _wl_spec(n_seg), _wl_spec(n_win),
                  _wl_spec(n_win)] + list(sc_spec) + [_own_spec(T)] * len(own)
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
        name=name,
    )(jnp.pad(t_lo, pad8), jnp.pad(t_na, pad8), jnp.pad(goff, pad8),
      jnp.pad(gn, pad8), *sc_in, *[_row(a) for a in own], packed)
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

    Compute is blocked 128 candidates at a time and predicated on the
    per-(tile, segment) ACTIVE block count (WindowData.w_nact): blocks past
    a tile's true candidate range hold only provably-zero rows (non-adjacent
    cells or zero-mass padding), so skipping them changes nothing — and at
    typical occupancies roughly halves the pair math the static wseg forces.

    When spec.cwidth > 0 the walk instead consumes the build-time COMPACTED
    candidate buffer (_compact_view): one XLA gather per call replaces the
    in-place sorted windows with near-pure true-neighbor rows — no
    per-segment 128-lane quantum, no alignment slop, no duplicates.
    """
    dim = cfg.dim
    dtype = pos_s.dtype
    fuse_bals = bool(cfg.need_divv) and vel_s is not None
    own = [pos_s[:, d] for d in range(dim)] + [mass_s, h0_s]
    win = [pos_s[:, d] for d in range(dim)] + [mass_s]
    if fuse_bals:
        own += [vel_s[:, d] for d in range(dim)]
        win += [vel_s[:, d] for d in range(dim)]
    packed_win = None
    if spec.cwidth > 0 and wd.c_idx is not None:
        wd, spec, packed_win = _compact_view(wd, spec, win, mass_col=dim)
    T, S, n_seg, nt, Ns = _prep(spec)
    R, Tg = _groups(spec)
    nblk, blkw = _blocks(
        S, interp_blk=(spec.cwidth if packed_win is not None else None))
    # h_predict: the h input is already the continuity-predicted value and
    # the Newton correction happens (lagged) in stage_density — one walk
    iters = (cfg.newton_iters if cfg.adaptive_h else 0) \
        if not cfg.h_predict else 0
    eta_d = float(cfg.eta) ** dim
    hcap = 0.5 * float(spec.cutoff)
    sig = float(K.sigma(dim))
    tiny = 1e-30 if dtype == jnp.float32 else 1e-300
    ncurl = {1: 0, 2: 1, 3: 3}[dim] if fuse_bals else 0
    n_acc = 2 + ((1 + ncurl) if fuse_bals else 0)
    n_outs = 5 if fuse_bals else 3

    def kernel(wt_ref, wn_ref, gof_ref, gn_ref, *refs):
        n_own = dim + 2 + (dim if fuse_bals else 0)
        own_refs = refs[:n_own]
        win_ref = refs[n_own]
        out_refs = refs[n_own + 1:n_own + 1 + n_outs]
        wbuf, sems, rbuf, mbuf, acc = refs[-5:]
        i = pl.program_id(0)
        row = i % 8

        # ONE per-tile early-out: a tile whose every union segment has zero
        # active blocks (trash-band/pad tiles in the distributed layouts;
        # masked tiles under block timesteps, integrate/rungs.py) skips the
        # window DMAs, the predicate scans, and the whole Newton walk — the
        # per-program fixed cost was the measured floor of the rung
        # speedup. h passes through (downstream computes 1/h on every row;
        # the other outputs' zeros match what zero-sum walks produced).
        tile_act = wn_ref[row, 0]
        for s in range(1, n_seg):
            tile_act = tile_act + wn_ref[row, s]

        def _body():
            _dma_windows(wt_ref, wn_ref, win_ref, wbuf, sems, i, n_seg, S)

            xi_t = [_col(own_refs[d], T) for d in range(dim)]
            m_t = _col(own_refs[dim], T)
            h_t = _col(own_refs[dim + 1], T)
            vi_t = ([_col(own_refs[dim + 2 + d], T) for d in range(dim)]
                    if fuse_bals else None)

            # statically unrolled row-group loop: group gg's Tg rows compute
            # only their own 128-block sub-range [off, off + gn) of each SHARED
            # tile-union window — the group's candidate span excludes the rest
            # of the tile's fast-axis run, the dominant over-read term, while
            # the DMA bytes stay at R=1 levels. Scratch (rbuf, mbuf, acc) is
            # sized per group and reused sequentially; the dedup-masked masses
            # are cached in mbuf instead of written back to wbuf, which is now
            # shared between groups.
            parts = [[] for _ in range(n_outs)]
            for gg in range(R):
                gs = slice(gg * Tg, (gg + 1) * Tg)
                col0 = gg * n_seg
                xi = [x[gs] for x in xi_t]
                m_i = m_t[gs]
                h_i = h_t[gs]
                vi = [v[gs] for v in vi_t] if fuse_bals else None

                def sums(h, first=False, final=False, col0=col0, xi=xi, vi=vi):
                    """One walk over the group's active candidate blocks.

                    first: also compute + cache pair distances and dedup the
                    masses (fused so the first Newton evaluation costs no extra
                    walk). final: also accumulate the Balsara div/curl estimator
                    sums, reusing this walk's q/t/dwdq (G = dwdq * invh / r
                    exactly — the r*invr roundoff is ~tiny/r^2, zero
                    contribution at r = 0 since dx = dv = 0 there).

                    Lane-wise partial sums accumulate in VMEM scratch (pl.when
                    bodies cannot carry jnp values); one cross-lane reduction
                    each at the end.
                    """
                    invh = 1.0 / h                      # [Tg, 1]
                    sigd = sig * invh**dim
                    do_bals = final and fuse_bals
                    kmax = n_acc if do_bals else 2
                    for k in range(kmax):
                        acc[k] = jnp.zeros((Tg, blkw), dtype)
                    for s in range(n_seg):
                        off = gof_ref[row, col0 + s]
                        nact = gn_ref[row, col0 + s]
                        for b in range(nblk):
                            @pl.when(_grp_when(off, nact, b, blkw))
                            def _(s=s, b=b, off=off, nact=nact):
                                sl = slice(b * blkw, (b + 1) * blkw)
                                if first:
                                    r2 = jnp.zeros((Tg, blkw), dtype)
                                    for d in range(dim):
                                        dxd = xi[d] - wbuf[s, d, :, sl]
                                        r2 = r2 + dxd * dxd
                                    invr = jax.lax.rsqrt(r2 + tiny)
                                    r = r2 * invr
                                    rbuf[s, :, sl] = r
                                    m_j = wbuf[s, dim, :, sl]
                                    if n_seg > 1:
                                        # compact path (n_seg == 1) has no
                                        # duplicates — dedup clipped at build
                                        m_j = m_j * _blk_keep(
                                            wt_ref, gof_ref, gn_ref, row,
                                            col0, s, b, dtype, blkw, nblk, S)
                                    mbuf[s, :, sl] = m_j
                                else:
                                    r = rbuf[s, :, sl]
                                    m_j = mbuf[s, :, sl]
                                q = r * invh
                                t = 2.0 - q
                                lt1 = q < 1.0
                                live = q < 2.0
                                f = jnp.where(lt1,
                                              1.0 + q * q * (0.75 * q - 1.5),
                                              0.25 * t * t * t)
                                df = jnp.where(lt1, q * (2.25 * q - 3.0),
                                               -0.75 * t * t)
                                w = jnp.where(live, sigd * f, 0.0)
                                dwdq = jnp.where(live, sigd * df, 0.0)
                                acc[0] += m_j * w
                                acc[1] += m_j * (-(dim * w + q * dwdq) * invh)
                                if do_bals:
                                    if not first:
                                        invr = jax.lax.rsqrt(r * r + tiny)
                                    mw = m_j * (dwdq * invh * invr)
                                    dx = [xi[d] - wbuf[s, d, :, sl]
                                          for d in range(dim)]
                                    dv = [vi[d] - wbuf[s, dim + 1 + d, :, sl]
                                          for d in range(dim)]
                                    vdotr = sum(dv[d] * dx[d]
                                                for d in range(dim))
                                    acc[2] += mw * vdotr
                                    if dim == 3:
                                        acc[3] += mw * (dv[1] * dx[2]
                                                        - dv[2] * dx[1])
                                        acc[4] += mw * (dv[2] * dx[0]
                                                        - dv[0] * dx[2])
                                        acc[5] += mw * (dv[0] * dx[1]
                                                        - dv[1] * dx[0])
                                    elif dim == 2:
                                        acc[3] += mw * (dv[0] * dx[1]
                                                        - dv[1] * dx[0])
                    rho = jnp.sum(acc[0], axis=1, keepdims=True)
                    drdh = jnp.sum(acc[1], axis=1, keepdims=True)
                    return rho, drdh

                m_safe = jnp.maximum(m_i, 1e-30)

                def newton_update(h, rho, drdh):
                    rho = jnp.maximum(rho, 1e-30)
                    rho_h = m_safe * eta_d / h**dim
                    phi = rho - rho_h
                    dphi = drdh + dim * rho_h / h
                    dphi = jnp.where(jnp.abs(dphi) < 1e-30, -1e-30, dphi)
                    dh = jnp.clip(-phi / dphi, -0.5 * h, 0.5 * h)
                    # structural cap: windows only cover to spec.cutoff
                    return jnp.minimum(h + dh, hcap)

                if iters:
                    rho, drdh = sums(h_i, first=True)
                    h = newton_update(h_i, rho, drdh)
                    h = jax.lax.fori_loop(
                        0, iters - 1,
                        lambda _, hh: newton_update(hh, *sums(hh)), h)
                    rho, drdh = sums(h, final=True)
                else:
                    h = h_i
                    rho, drdh = sums(h, first=True, final=True)
                parts[0].append(h)
                parts[1].append(rho)
                parts[2].append(drdh)

                if fuse_bals:
                    divv = jnp.sum(acc[2], axis=1, keepdims=True)
                    parts[3].append(divv)
                    if dim == 3:
                        c = [jnp.sum(acc[3 + k], axis=1, keepdims=True)
                             for k in range(3)]
                        cm = jnp.sqrt(c[0] ** 2 + c[1] ** 2 + c[2] ** 2)
                    elif dim == 2:
                        cm = jnp.abs(jnp.sum(acc[3], axis=1, keepdims=True))
                    else:
                        cm = jnp.zeros((Tg, 1), dtype)
                    parts[4].append(cm)

            for k in range(n_outs):
                vals = (parts[k][0] if R == 1
                        else jnp.concatenate(parts[k], axis=0))
                out_refs[k][:, :] = vals.reshape(1, T)

        @pl.when(tile_act == 0)
        def _():
            out_refs[0][:, :] = own_refs[dim + 1][:, :]
            for k in range(1, n_outs):
                out_refs[k][:, :] = jnp.zeros((1, T), dtype)

        @pl.when(tile_act > 0)
        def _():
            _body()


    rscratch = pltpu.VMEM((n_seg, Tg, S), dtype)
    mscratch = pltpu.VMEM((n_seg, 1, S), dtype)
    ascratch = pltpu.VMEM((n_acc, Tg, blkw), dtype)
    outs = _call(kernel, spec, wd, own, win, n_outs, dtype,
                 extra_scratch=[rscratch, mscratch, ascratch],
                 name="sphax_h_density", packed_win=packed_win)
    return tuple(outs)


# ---------------------------------------------------------------------------
# kernel C: symmetrized pressure force + artificial viscosity + du/dt
# ---------------------------------------------------------------------------


def forces(wd: WindowData, spec: WindowSpec, pos_s, vel_s, mass_s, h_s,
           rho_s, P_s, cs_s, om_s, bf_s, cfg: SPHConfig, grav=None):
    """Returns (acc_s [Ns, D], du_s [Ns]). Same math as pairs.force_terms.

    Flop diet: every per-pair divide except the two genuinely pairwise ones
    (viscous mu denominator, rhobar) is hoisted — 1/h and the gradient
    prefactors sig/h^(d+1), sig/h^(d+2) are precomputed per PARTICLE and
    shipped as window fields for the j side / [T,1] columns for the i side,
    and r, 1/r come from one rsqrt. Compute is blocked 128 candidates at a
    time, predicated on WindowData.w_nact (see solve_h_density).

    ``grav=(rs, eps)`` (traced scalars) FUSES the screened P3M short-range
    gravity (pm.short_range_factor: erfc Ewald split + Plummer softening)
    into the same pair walk — the pos/mass windows are already resident in
    VMEM and the ~10 extra flops/pair ride the same accumulator, so the
    separate jnp tile walk (wengine.gravity_short_pass, measured at several
    SPH-steps' cost per call at N=1e6) disappears from the TPU path. The
    4.5 r_s screen tail fits inside spec.cutoff by pm.rs_traced's clamp;
    pairs beyond it are hard-cut exactly as in the jnp pass.
    """
    dim = cfg.dim
    dtype = pos_s.dtype
    use_bf = bool(cfg.visc_factor_on)
    fast = bool(cfg.fast_math) and not _interpret()
    alpha, beta, epsv = (float(cfg.alpha_visc), float(cfg.beta_visc),
                         float(cfg.eps_visc))
    sig = float(K.sigma(dim))
    tiny = 1e-30 if dtype == jnp.float32 else 1e-300
    scalars = None
    if grav is not None:
        rs, geps = (jnp.asarray(v, dtype) for v in grav)
        # per-pair form needs only these three: x = r * sc0,
        # screen = erfc(x) + r * sc1 * exp(-x^2), soft = rsqrt(r2 + sc2)^3
        scalars = jnp.stack([0.5 / rs, 1.0 / (rs * jnp.sqrt(jnp.pi)),
                             geps * geps])
        Gc = float(cfg.G)
        rcut2 = float(spec.cutoff) ** 2

    # per-particle hoisted fields (one cheap [Ns] pass each)
    invh_s = 1.0 / h_s
    ci_s = P_s / (om_s * rho_s * rho_s)
    gc1_s = sig * invh_s ** (dim + 1)
    gc2_s = gc1_s * invh_s

    n_scal_own = 5 + (1 if use_bf else 0)  # h, invh, rho, cs, ci (, bf)
    n_scal_win = 8 + (1 if use_bf else 0)  # m, h, invh, rho, cs, cj, gc1,
    #                                        gc2 (, bf)

    own = ([pos_s[:, d] for d in range(dim)]
           + [vel_s[:, d] for d in range(dim)]
           + [h_s, invh_s, rho_s, cs_s, ci_s]
           + ([bf_s] if use_bf else []))
    win = ([pos_s[:, d] for d in range(dim)]
           + [vel_s[:, d] for d in range(dim)]
           + [mass_s, h_s, invh_s, rho_s, cs_s, ci_s, gc1_s, gc2_s]
           + ([bf_s] if use_bf else []))
    packed_win = None
    if spec.cwidth > 0 and wd.c_idx is not None:
        wd, spec, packed_win = _compact_view(wd, spec, win,
                                             mass_col=2 * dim)
    T, S, n_seg, nt, Ns = _prep(spec)
    R, Tg = _groups(spec)
    nblk, blkw = _blocks(
        S, interp_blk=(spec.cwidth if packed_win is not None else None))

    def kernel(wt_ref, wn_ref, gof_ref, gn_ref, *refs):
        if grav is not None:
            sc_ref, refs = refs[0], refs[1:]
            g_x, g_sp, g_e2 = sc_ref[0, 0], sc_ref[0, 1], sc_ref[0, 2]
        n_own = 2 * dim + n_scal_own
        own_refs = refs[:n_own]
        win_ref = refs[n_own]
        out_refs = refs[n_own + 1:n_own + 2 + dim]
        wbuf, sems, acc = refs[-3:]
        i = pl.program_id(0)
        row = i % 8

        # per-tile early-out — see solve_h_density (trash/pad tiles in
        # distributed layouts, masked tiles under block timesteps)
        tile_act = wn_ref[row, 0]
        for s in range(1, n_seg):
            tile_act = tile_act + wn_ref[row, s]

        def _body():
            _dma_windows(wt_ref, wn_ref, win_ref, wbuf, sems, i, n_seg, S)

            o = iter(range(n_own))
            xi_t = [_col(own_refs[next(o)], T) for _ in range(dim)]
            vi_t = [_col(own_refs[next(o)], T) for _ in range(dim)]
            h_t = _col(own_refs[next(o)], T)
            invh_t = _col(own_refs[next(o)], T)
            rho_t = _col(own_refs[next(o)], T)
            cs_t = _col(own_refs[next(o)], T)
            ci_t = _col(own_refs[next(o)], T)
            bf_t = _col(own_refs[next(o)], T) if use_bf else None

            # statically unrolled row-group loop (see solve_h_density)
            parts = [[] for _ in range(dim + 1)]
            for gg in range(R):
                gs = slice(gg * Tg, (gg + 1) * Tg)
                col0 = gg * n_seg
                xi = [x[gs] for x in xi_t]
                vi = [v[gs] for v in vi_t]
                h_i = h_t[gs]
                invh_i = invh_t[gs]
                rho_i = rho_t[gs]
                cs_i = cs_t[gs]
                ci = ci_t[gs]
                bf_i = bf_t[gs] if use_bf else None
                gc1_i = sig * invh_i ** (dim + 1)
                gc2_i = gc1_i * invh_i

                for k in range(dim + 1):
                    acc[k] = jnp.zeros((Tg, blkw), dtype)

                for s in range(n_seg):
                    off = gof_ref[row, col0 + s]
                    nact = gn_ref[row, col0 + s]
                    for b in range(nblk):
                        @pl.when(_grp_when(off, nact, b, blkw))
                        def _(s=s, b=b, col0=col0, xi=xi, vi=vi, h_i=h_i,
                              invh_i=invh_i, rho_i=rho_i, cs_i=cs_i, ci=ci,
                              bf_i=bf_i, gc1_i=gc1_i, gc2_i=gc2_i):
                            sl = slice(b * blkw, (b + 1) * blkw)
                            w = iter(range(2 * dim + n_scal_win))
                            xj = [wbuf[s, next(w), :, sl] for _ in range(dim)]
                            vj = [wbuf[s, next(w), :, sl] for _ in range(dim)]
                            m_j = wbuf[s, next(w), :, sl]
                            if n_seg > 1:
                                # compact path: dedup clipped at build time
                                m_j = m_j * _blk_keep(
                                    wt_ref, gof_ref, gn_ref, row, col0, s,
                                    b, dtype, blkw, nblk, S)
                            h_j = wbuf[s, next(w), :, sl]
                            invh_j = wbuf[s, next(w), :, sl]
                            rho_j = wbuf[s, next(w), :, sl]
                            cs_j = wbuf[s, next(w), :, sl]
                            cj = wbuf[s, next(w), :, sl]
                            gc1_j = wbuf[s, next(w), :, sl]
                            gc2_j = wbuf[s, next(w), :, sl]
                            bf_j = wbuf[s, next(w), :, sl] if use_bf else None

                            dx = [xi[d] - xj[d] for d in range(dim)]
                            dv = [vi[d] - vj[d] for d in range(dim)]
                            r2 = sum(d_ * d_ for d_ in dx)
                            invr = jax.lax.rsqrt(r2 + tiny)
                            r = r2 * invr

                            qi = r * invh_i
                            qj = r * invh_j
                            ti = 2.0 - qi
                            tj = 2.0 - qj
                            gi = jnp.where(qi < 1.0, gc2_i * (2.25 * qi - 3.0),
                                           (-0.75) * gc1_i * (ti * ti) * invr)
                            gi = jnp.where(qi < 2.0, gi, 0.0)
                            gj = jnp.where(qj < 1.0, gc2_j * (2.25 * qj - 3.0),
                                           (-0.75) * gc1_j * (tj * tj) * invr)
                            gj = jnp.where(qj < 2.0, gj, 0.0)
                            gbar = 0.5 * (gi + gj)

                            vdotr = sum(dv[d] * dx[d] for d in range(dim))
                            hbar = 0.5 * (h_i + h_j)
                            mu_den = r2 + epsv * hbar * hbar
                            if fast:
                                mu = (hbar * vdotr
                                      * pl.reciprocal(mu_den, approx=True))
                            else:
                                mu = hbar * vdotr / mu_den
                            mu = jnp.where(vdotr < 0.0, mu, 0.0)
                            cbar = 0.5 * (cs_i + cs_j)
                            rhobar = 0.5 * (rho_i + rho_j)
                            if fast:
                                Pi = ((beta * mu - alpha * cbar) * mu
                                      * pl.reciprocal(rhobar, approx=True))
                            else:
                                Pi = (beta * mu - alpha * cbar) * mu / rhobar
                            if use_bf:
                                Pi = Pi * (0.5 * (bf_i + bf_j))

                            # micro-diet: ci*gi and Pi*gbar are shared between
                            # the momentum and energy accumulations
                            cigi = ci * gi
                            pigb = Pi * gbar
                            fsum = cigi + cj * gj + pigb
                            if grav is not None:
                                # fused screened P3M short range: hard-cut at
                                # the structure's coverage radius (exactly the
                                # jnp gravity_short_pass convention). Mosaic
                                # has no erfc lowering, so the TPU path uses
                                # Abramowitz-Stegun 7.1.26 (|err| <= 1.5e-7 =
                                # fp32-exact; shares one exp with the deriv
                                # term); interpret mode keeps the exact erfc
                                # so x64 parity vs the jnp walk holds at 1e-10.
                                x = r * g_x
                                e = jnp.exp(-x * x)
                                if _interpret():
                                    screen = jax.lax.erfc(x) + r * g_sp * e
                                else:
                                    t_ = 1.0 / (1.0 + 0.3275911 * x)
                                    p_ = t_ * (0.254829592 + t_ * (
                                        -0.284496736 + t_ * (1.421413741 + t_ * (
                                            -1.453152027 + t_ * 1.061405429))))
                                    screen = e * (p_ + r * g_sp)
                                tg = jax.lax.rsqrt(r2 + g_e2)
                                gco = jnp.where((r2 > 0.0) & (r2 <= rcut2),
                                                screen * (tg * tg * tg), 0.0)
                                fsum = fsum + Gc * gco
                            fcoef = m_j * fsum
                            for d in range(dim):
                                acc[d] -= fcoef * dx[d]
                            acc[dim] += m_j * (cigi + 0.5 * pigb) * vdotr

                for d in range(dim + 1):
                    parts[d].append(jnp.sum(acc[d], axis=1, keepdims=True))

            for d in range(dim + 1):
                vals = (parts[d][0] if R == 1
                        else jnp.concatenate(parts[d], axis=0))
                out_refs[d][:, :] = vals.reshape(1, T)

        @pl.when(tile_act == 0)
        def _():
            for d in range(dim + 1):
                out_refs[d][:, :] = jnp.zeros((1, T), dtype)

        @pl.when(tile_act > 0)
        def _():
            _body()


    ascratch = pltpu.VMEM((dim + 1, Tg, blkw), dtype)
    outs = _call(kernel, spec, wd, own, win, dim + 1, dtype,
                 extra_scratch=[ascratch], name="sphax_forces",
                 scalars=scalars, packed_win=packed_win)
    acc = jnp.stack(outs[:dim], axis=-1)
    return acc, outs[dim]


# ---------------------------------------------------------------------------
# kernel G: direct-sum softened gravity (BASELINE.json:10 — long-range,
# all-pairs; used by the Evrard config. O(N^2): each program owns T rows and
# streams the full particle set through VMEM in column chunks.)
# ---------------------------------------------------------------------------


def gravity(pos, mass, cfg: SPHConfig, chunk: int = 1024):
    """acc[N, D] = -G sum_j m_j (r^2 + eps^2)^{-3/2} dx, Plummer-softened.

    OPEN-BOUNDARY convention: no periodic min-image (wengine dispatches
    periodic domains to clist.gravity_dense; true periodic gravity needs
    Ewald sums). Self-pairs contribute exactly zero (dx = 0) — which relies
    on grav_eps > 0 (grav_eps = 0 would give rsqrt(0) * 0 = NaN), hence the
    guard. Inputs are packed [8, 1, Np] (x, y, z, m, zero-pad fields; Np
    padded to ``chunk``) so each column chunk is one strided DMA.
    """
    if float(cfg.grav_eps) <= 0.0:
        raise ValueError("cfg.grav_eps must be > 0 for the Pallas gravity "
                         "kernel (softening also guards the self-pair)")
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
        name="sphax_gravity",
    )(*[_row(a) for a in own], packed)
    return jnp.stack([o.reshape(npad)[:n] for o in outs], axis=-1)
