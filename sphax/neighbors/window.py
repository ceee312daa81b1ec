"""Sorted pencil-window neighbor structure — the TPU-native hot path.

TPU pair kernels want candidates as *contiguous sorted rows* (sequential
VMEM block loads), not random gathers (SURVEY.md §3.4, §7; P: 1810.09898 —
SFC ordering makes neighbour search linear scans). This module builds that
structure with one argsort and O(N) everything else:

  1. Periodic images ("ghosts") of particles within ``cutoff`` of each box
     face are appended with static per-offset capacities (scatter
     compaction). Ghost rows carry their source row index so owner-computed
     fields are mirrored onto them with one gather between kernel passes.
  2. Extended positions are binned on a uniform grid (cell >= cutoff) and
     sorted by row-major cell id with the LAST axis fastest: each (c1..c_{D-1})
     "pencil" of cells is contiguous, and within it cells are contiguous in
     the fast axis.
  3. A particle's neighbor cells form 3^(D-1) pencils of 3 consecutive
     fast-axis cells each — every one an EXACTLY contiguous run of sorted
     rows, located with two searchsorted calls. No Morton min/max
     over-coverage, no cell capacity, no per-cell padding.
  4. Rows are tiled T at a time; a tile's segment windows are the union of
     its rows' runs, padded to the static width ``wseg``. ``overflow``
     counts tiles whose true run exceeded wseg (must be 0 for exactness —
     the same escape hatch as the cell list).

Rows beyond a segment's true range belong to non-adjacent cells (> cutoff
away -> kernel support zero) or are zero-mass padding, so pair kernels are
maskless dense [T, n_seg * wseg] vector ops.
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sphax.core.state import Domain

_BIG = np.int32(2**31 - 1)


@dataclasses.dataclass(frozen=True)
class WindowSpec:
    """Static window-structure parameters (hashable; change -> recompile)."""

    res: Tuple[int, ...]          # interior cells per axis (transverse cells
    #                               >= cutoff; FAST-axis cells >= cutoff /
    #                               fast_sub)
    cutoff: float                 # neighbor search radius (>= 2 h_max)
    ghost_caps: Tuple[int, ...]   # capacity per axis PASS (one per axis; the
    #                               pass appends images at BOTH faces, so a
    #                               pass adds up to 2*cap rows; sequential
    #                               passes compound, covering edges/corners
    #                               as ghosts-of-ghosts)
    tile: int                     # rows per tile (T)
    wseg: int                     # static width of each pencil segment
    n_sorted: int                 # padded sorted-array length
    fast_sub: int = 1             # fast-axis cell subdivision: cells are
    #                               cutoff/fast_sub wide and windows span
    #                               +-fast_sub cells — a finer quantization
    #                               of the cutoff margin that trims the
    #                               candidate over-read (the margin rounds
    #                               to cutoff exactly instead of one full
    #                               cell each side)
    cwidth: int = 0               # candidate-compaction width (rows per
    #                               row-GROUP, multiple of 128; 0 = off).
    #                               When set, build() additionally emits a
    #                               per-group COMPACTED candidate row list
    #                               (c_idx/c_n): the 3^(D-1) segment ranges,
    #                               clipped against each other (they are
    #                               monotone in the segment offset, so
    #                               overlap is only the previous tail) and
    #                               concatenated — no per-segment 128-lane
    #                               quantum, no alignment slop, no
    #                               duplicates. The Pallas kernels then walk
    #                               a gathered [n_groups * cwidth] candidate
    #                               buffer instead of the in-place sorted
    #                               windows: ~5x fewer candidate rows per
    #                               row at production occupancy for one
    #                               extra XLA gather per kernel call
    #                               (BASELINE.md round-4).
    rgroups: int = 1              # row-groups per tile: windows are computed
    #                               per GROUP of tile/rgroups consecutive
    #                               sorted rows instead of per tile, so each
    #                               group's candidate span excludes the rest
    #                               of the tile's fast-axis run — the
    #                               dominant term of the candidate over-read
    #                               (a tile of 128 sorted rows spans ~10
    #                               fine cells; its true pair range per row
    #                               is +-cutoff ~ 2 cells). The Pallas
    #                               kernels keep one program per 128-row
    #                               tile (lane-tiling requires T=128 blocks)
    #                               and statically unroll the rgroups
    #                               sub-computations inside it.

    @property
    def dim(self) -> int:
        return len(self.res)

    @property
    def n_seg(self) -> int:
        return 3 ** (self.dim - 1)

    @property
    def n_tiles(self) -> int:
        return self.n_sorted // self.tile

    @property
    def group(self) -> int:
        """Rows per window-group (the granularity of w_lo/w_nact)."""
        return self.tile // self.rgroups

    @property
    def n_groups(self) -> int:
        return self.n_sorted // self.group

    def image_offsets(self):
        return _image_offsets(self.dim)


def _image_offsets(dim: int):
    return [o for o in itertools.product((-1, 0, 1), repeat=dim) if any(o)]


def _pencil_offsets(dim: int):
    """Offsets over the slow axes (all but the last)."""
    if dim == 1:
        return [()]
    return list(itertools.product((-1, 0, 1), repeat=dim - 1))


def plan_windows(domain: Domain, h_max: float, n: int, dim: int,
                 tile: int = 128, wseg: int = 0, cutoff_scale: float = 1.0,
                 ghost_safety: float = 2.0, seg_safety: float = 1.2,
                 fast_sub: int = 1, rgroups: int = 1) -> WindowSpec:
    """Host-side parameter choice. cutoff = 2 h_max * cutoff_scale.

    wseg=0 -> auto: ~seg_safety * 3 cells' average occupancy, rounded to 128.
    fast_sub=k subdivides the FAST-axis cells k-fold (windows then span
    +-k fine cells = exactly one cutoff instead of one full coarse cell
    each side — a ~10-15% candidate diet at k=2; transverse cells cannot
    shrink below cutoff without growing the 3^(dim-1) segment count, which
    costs more in per-segment tile-span re-reads than it saves — measured
    algebra in NEXT.md).
    """
    lo = np.asarray(domain.lo, np.float64)
    hi = np.asarray(domain.hi, np.float64)
    ext = hi - lo
    cutoff = 2.0 * float(h_max) * cutoff_scale
    res = np.maximum(1, np.floor(ext / cutoff).astype(int))
    if fast_sub > 1:
        res[-1] = max(int(np.floor(ext[-1] / (cutoff / fast_sub))), 1)
    if np.any(res < 2) or res[-1] < 2 * fast_sub:
        # with res=1 a particle and its own periodic image can both fall
        # inside the cutoff, which the dedup mask cannot distinguish
        # (res < 2*fast_sub is the same condition in fine-cell units)
        raise ValueError(
            f"box too small for window engine at cutoff {cutoff:.4g} "
            f"(res={tuple(res)}); use the dense or cell-list engine")
    per = domain.periodic_axes(dim)
    # one ghost pass per periodic axis; each pass images BOTH faces of the
    # accumulated array, so edge/corner images arise as ghosts-of-ghosts and
    # the per-face capacity must budget for earlier passes' ghosts
    caps = []
    n_acc = float(n)
    for d in range(dim):
        if not per[d]:
            caps.append(0)
            continue
        frac = min(1.0, cutoff / ext[d])
        cap = max(int(np.ceil(n_acc * frac * ghost_safety / 8.0) * 8), 8)
        caps.append(cap)
        n_acc += 2.0 * cap
    if tile % (rgroups * 8):
        raise ValueError(f"tile={tile} must be a multiple of 8*rgroups "
                         f"(rgroups={rgroups})")
    n_ghost = 2 * sum(caps)
    n_raw = n + n_ghost
    if wseg <= 0:
        # a tile's fast-axis run spans ~tile rows + ~2.2 cells of average
        # occupancy occ (particles per interior COARSE cell; ghost bands
        # track it; with fast_sub > 1 the margin shrinks toward one cutoff
        # each side but the estimate stays coarse-cell conservative).
        # Tiles that CROSS a pencil boundary additionally span the boundary
        # region: both pencils' edge cells plus the ghost-image cells between
        # them, ~6 extra cells — and since some tile always crosses, wseg
        # must budget the worst case, not the mean (plan_measured refines
        # this down from the actual built structure). +128 absorbs the
        # lane-alignment of window starts (Mosaic DMA).
        occ = n_raw * fast_sub / max(int(np.prod(res)), 1)
        run_est = (tile // rgroups + 8.5 * occ) * seg_safety
        wseg = int(np.ceil(max(run_est, 1.0) / 128.0) * 128) + 128
    wseg = min(wseg, int(np.ceil(n_raw / 128.0) * 128))
    quantum = int(np.lcm(tile, 128))
    n_sorted = int(np.ceil(max(n_raw, wseg) / quantum) * quantum)
    return WindowSpec(res=tuple(int(r) for r in res), cutoff=float(cutoff),
                      ghost_caps=tuple(caps), tile=tile, wseg=int(wseg),
                      n_sorted=n_sorted, fast_sub=int(fast_sub),
                      rgroups=int(rgroups))


class WindowData(NamedTuple):
    """Built structure over one snapshot of positions.

    g:        [Ns] original row feeding each sorted row (N = zero-mass pad)
    src:      [Ns] sorted row holding the OWNER copy of each sorted row
    inv:      [N] owner sorted row per ORIGINAL row (unsort = one gather)
    is_real:  [Ns] bool, True where the sorted row is an original particle
    pos_s:    [Ns, D] sorted extended positions (images pre-shifted)
    shift_s:  [Ns, D] image shift per sorted row (refresh pos without rebuild)
    w_lo:     [n_groups, n_seg] segment start row per row-GROUP (128-aligned;
              groups are tile/rgroups consecutive sorted rows)
    w_nact:   [n_groups, n_seg] per-segment ACTIVE 128-row block count —
              blocks past the group's true candidate range hold only
              provably-zero rows, so Pallas kernels skip their compute
    t_lo:     [n_tiles, n_seg] tile-UNION window start (128-aligned) — the
              shared DMA window each tile ships once; every group window is
              a subrange of it (t_lo is w_lo when rgroups == 1)
    t_nact:   [n_tiles, n_seg] active 128-blocks of the union window
    overflow: [] tiles*segments whose true UNION run exceeded wseg + dropped
              ghosts (+ groups whose compacted candidate count exceeded
              cwidth when spec.cwidth > 0)
    max_run:  [] largest aligned union window length actually required
    c_idx:    [n_groups, cwidth] compacted candidate sorted-row index per
              row-group (spec.cwidth > 0 only; entries past c_n point at the
              last sorted row and MUST be mass-zeroed at gather time —
              gather_cands does)
    c_n:      [n_groups] true compacted candidate count per group
    c_max:    [] largest compacted candidate count (for plan_compact)
    """

    g: jax.Array
    src: jax.Array
    inv: jax.Array
    is_real: jax.Array
    pos_s: jax.Array
    shift_s: jax.Array
    w_lo: jax.Array
    w_nact: jax.Array
    t_lo: jax.Array
    t_nact: jax.Array
    overflow: jax.Array
    max_run: jax.Array
    c_idx: jax.Array = None
    c_n: jax.Array = None
    c_max: jax.Array = None


def _pack_offset(mask, orig_idx, cap, n):
    """First-``cap`` indices of True entries (row order), sentinel ``n``
    beyond/over capacity, plus the dropped count.

    ``orig_idx`` must be strictly increasing with values < ``n`` (both
    call sites pass ``arange``): the pack is then ONE single-operand sort
    of ``where(mask, orig_idx, n)`` — measured 2x faster on TPU than the
    cumsum+scatter form (scatter is per-update serialization-bound:
    8.9 -> 4.5 ms at n=1.3M, cap=32k; six of these packs run per window
    build, BASELINE.md round-3)."""
    key = jnp.where(mask, orig_idx.astype(jnp.int32), n)
    take = jax.lax.sort(key)[:cap]
    dropped = jnp.maximum(jnp.sum(mask) - cap, 0)
    return take, dropped


def build(pos, domain: Domain, spec: WindowSpec, active=None,
          image=None) -> WindowData:
    """Build the sorted pencil-window structure (one argsort).

    ``active`` ([n] bool, optional): rows with active=False (e.g. padding or
    slab-ghost rows in the distributed engine) are still sorted and still
    appear in other rows' candidate windows, but they do not DEFINE windows
    (their own outputs are garbage by contract) — without this, padding rows
    parked in a trash band would widen/overflow tiles that contain them.

    ``image`` ([n] bool, optional, defaults to ``active``): rows allowed to
    spawn periodic ghost images. Distributed shards pass image = (mass > 0)
    but active = local-reals-only: slab ghosts near a transverse face MUST
    still be imaged (their images are real candidates for corner particles)
    even though their own windows are irrelevant.
    """
    if image is None:
        image = active
    n, dim = pos.shape
    dtype = pos.dtype
    lo = domain.lo.astype(dtype)
    ext = domain.extent.astype(dtype)
    res = jnp.asarray(spec.res, dtype)
    cell = ext / res
    cut = jnp.asarray(spec.cutoff, dtype)
    idx = jnp.arange(n, dtype=jnp.int32)

    # ---- periodic images within `cutoff` of each face, one pass per axis ----
    # Each pass images both faces of the ACCUMULATED array, so edge/corner
    # images appear as ghosts-of-ghosts: 2*dim compaction passes instead of
    # 3^dim - 1 (the compaction cumsums dominated build time at N=1e6).
    cur_pos = pos          # extended positions so far (images pre-shifted)
    cur_orig = idx         # original row per extended row (n = invalid)
    cur_shift = jnp.zeros((n, dim), dtype)
    drops = []
    for d in range(dim):
        cap = spec.ghost_caps[d]
        if cap == 0:
            continue
        nc = cur_pos.shape[0]
        rows_c = jnp.arange(nc, dtype=jnp.int32)
        off = jnp.zeros((dim,), dtype).at[d].set(ext[d])
        new_pos, new_orig, new_shift = [], [], []
        for sgn, m in ((1.0, cur_pos[:, d] < lo[d] + cut),
                       (-1.0, cur_pos[:, d] > lo[d] + ext[d] - cut)):
            m = m & (cur_orig < n)
            if image is not None:
                img_pad = jnp.concatenate([image, jnp.zeros((1,), bool)])
                m = m & img_pad[jnp.minimum(cur_orig, n)]
            take, dropped = _pack_offset(m, rows_c, cap, nc)
            drops.append(dropped)
            tk = jnp.minimum(take, nc - 1)
            invalid = take >= nc
            new_pos.append(cur_pos[tk] + sgn * off)
            new_orig.append(jnp.where(invalid, n, cur_orig[tk]))
            new_shift.append(jnp.where(invalid[:, None], 0.0,
                                       cur_shift[tk] + sgn * off))
        cur_pos = jnp.concatenate([cur_pos] + new_pos)
        cur_orig = jnp.concatenate([cur_orig] + new_orig)
        cur_shift = jnp.concatenate([cur_shift] + new_shift)
    ghost_drop = sum(drops) if drops else jnp.zeros((), jnp.int32)

    n_raw = cur_orig.shape[0]
    n_pad = spec.n_sorted - n_raw
    if n_pad < 0:
        raise ValueError("spec.n_sorted too small for ghosts; re-plan")
    orig = jnp.concatenate([cur_orig, jnp.full((n_pad,), n, jnp.int32)])
    shift = jnp.concatenate([cur_shift, jnp.zeros((n_pad, dim), dtype)])
    pos_e = jnp.concatenate([cur_pos, jnp.zeros((n_pad, dim), dtype)])

    valid = orig < n

    # ---- extended-grid row-major keys (last axis fastest) ----
    # BINNING coordinates are clamped to the box on NON-periodic axes:
    # particles that drift outside an open boundary would otherwise land in
    # extended-grid edge cells, and a tile mixing such a row with interior
    # rows unions into a pencil-spanning (overflowing) window. Clamping is
    # EXACT: pair distances always use the true positions, an escapee
    # within one cell of the face keeps every true neighbor in its clamped
    # cell's +-1 pencils (cell >= cutoff), and one farther out has no
    # in-box neighbors at all.
    res_i = jnp.asarray(spec.res, jnp.int32)
    per_ax = domain.periodic_axes(dim)
    if not all(per_ax):
        clampmask = jnp.asarray([not p for p in per_ax])
        eps = jnp.asarray(1e-6, dtype) * ext
        bin_pos = jnp.clip(pos_e, lo + 0 * ext, lo + ext - eps)
        bin_pos = jnp.where(clampmask, bin_pos, pos_e)
    else:
        bin_pos = pos_e
    # ghost-cell layers per axis: transverse images lie within ONE
    # cutoff-wide cell of a face; with fast_sub-fold finer fast cells the
    # same cutoff band spans fast_sub fine cells, and collapsing it into
    # one layer would break +-fast_sub adjacency for rows a few fine cells
    # inside the box (missed image pairs) — so the fast axis gets fast_sub
    # distinct layers each side
    layers = np.array([1] * (dim - 1) + [spec.fast_sub], np.int32)
    layers_j = jnp.asarray(layers)
    c = jnp.clip(jnp.floor((bin_pos - lo) / cell).astype(jnp.int32)
                 + layers_j, 0, res_i + 2 * layers_j - 1)
    res_ext = tuple(r + 2 * int(l) for r, l in zip(spec.res, layers))
    strides = np.concatenate([np.cumprod(res_ext[::-1])[-2::-1], [1]])
    strides_j = jnp.asarray(strides, jnp.int32)

    key = jnp.where(valid, jnp.sum(c * strides_j, axis=-1), _BIG)
    order = jnp.arange(spec.n_sorted, dtype=jnp.int32)
    key_s, order = jax.lax.sort_key_val(key, order)
    is_real = order < n

    # one packed row gather instead of one gather per field (gathers are
    # per-row latency-bound on TPU): [Ns, 8] = pos_e(3) | shift(3) | orig | 0
    packed = jnp.zeros((spec.n_sorted, 8), dtype)
    packed = packed.at[:, 0:dim].set(pos_e)
    packed = packed.at[:, 3:3 + dim].set(shift)
    packed = packed.at[:, 6].set(
        jax.lax.bitcast_convert_type(orig, dtype) if dtype == jnp.float32
        else orig.astype(dtype))
    packed_s = packed[order]
    pos_s = packed_s[:, 0:dim]
    shift_s = packed_s[:, 3:3 + dim]
    if dtype == jnp.float32:
        g = jax.lax.bitcast_convert_type(packed_s[:, 6], jnp.int32)
    else:
        g = packed_s[:, 6].astype(jnp.int32)

    inv_real = jnp.full((n + 1,), spec.n_sorted - 1, jnp.int32)
    rows = jnp.arange(spec.n_sorted, dtype=jnp.int32)
    inv_real = inv_real.at[jnp.where(is_real, g, n)].set(rows, mode="drop")
    src = inv_real[jnp.minimum(g, n)]

    # ---- per-tile pencil runs (tile-level cell-start lookups) ----
    # Dense cell-start table: first sorted row of every extended cell, built
    # with one scatter-min + one reverse cumulative min (empty cells inherit
    # the next cell's start). `first` is monotone non-decreasing, so a tile's
    # window bounds need only the min/max REAL key in the tile:
    #   min_rows first[key + delta - 1] == first[kmin + delta - 1]
    #   max_rows first[key + delta + 2] == first[kmax + delta + 2]
    # -> 2 * n_seg gathers of [n_tiles] instead of [Ns].
    # window bounds are computed per row-GROUP (tile/rgroups rows): the
    # group's candidate span excludes the rest of the tile's fast-axis run,
    # which is the dominant term of the candidate over-read (the Pallas
    # kernels statically unroll the per-group windows inside each 128-row
    # tile program)
    T, S = spec.group, spec.wseg
    nt = spec.n_groups
    n_seg = spec.n_seg
    ncells_ext = int(np.prod(res_ext))
    n_valid = jnp.sum(valid).astype(jnp.int32)
    first = jnp.full((ncells_ext + 1,), spec.n_sorted, jnp.int32)
    first = first.at[ncells_ext].min(n_valid)
    first = first.at[jnp.minimum(key_s, ncells_ext)].min(
        jnp.where(key_s < ncells_ext, rows, spec.n_sorted), mode="drop")
    first = jax.lax.associative_scan(jnp.minimum, first, reverse=True)

    # Only REAL rows define windows: ghost/pad rows' outputs are discarded
    # (mirror_owner/scatter_real), so letting them widen tile unions only
    # wastes wseg. Real interior coords are in [1, res], so +-1 offsets stay
    # inside the extended grid and neighbor-cell codes are pure integer
    # shifts of the row's own key.
    kt = key_s.reshape(nt, T)
    if active is None:
        rt = is_real.reshape(nt, T)
    else:
        act_pad = jnp.concatenate([active, jnp.zeros((1,), bool)])
        rt = (is_real & act_pad[jnp.minimum(g, n)]).reshape(nt, T)
    kmin_t = jnp.min(jnp.where(rt, kt, _BIG), axis=1)      # [nt]
    kmax_t = jnp.max(jnp.where(rt, kt, -1), axis=1)
    has_real = kmax_t >= 0
    # fast-axis reach: +-fast_sub fine cells covers >= one cutoff exactly;
    # rows beyond it are >= fast_sub * cell_f >= cutoff away (zero support)
    reach = spec.fast_sub
    starts, ends = [], []
    for poff in _pencil_offsets(dim):
        delta = int(np.dot(poff, strides[:-1])) if dim > 1 else 0
        ws = first[jnp.clip(kmin_t + (delta - reach), 0, ncells_ext)]
        we = first[jnp.clip(kmax_t + (delta + reach) + 1, 0,
                            ncells_ext)]
        starts.append(jnp.where(has_real, ws, spec.n_sorted))
        ends.append(jnp.where(has_real, we, 0))
    ws_t = jnp.stack(starts, axis=-1)  # [nt, n_seg]
    we_t = jnp.stack(ends, axis=-1)

    # align window starts down to the 128-lane tiling (Mosaic DMA offsets
    # into lane-tiled memrefs must be provably 128-divisible); wseg budgets
    # an extra 128 for this in plan_windows
    w_lo = jnp.clip((ws_t // 128) * 128, 0, spec.n_sorted - S)
    w_len = jnp.maximum(we_t - w_lo, 0)
    w_nact = jnp.clip(-(-w_len // 128), 0, S // 128).astype(jnp.int32)

    # per-TILE union of the R group windows: ONE shared DMA window per
    # (tile, segment). The Pallas kernels ship the union once and each
    # row-group computes only its own 128-block sub-range (offsets derived
    # from w_lo/t_lo in the kernel glue), so rgroups > 1 trims pair math
    # WITHOUT multiplying DMA bytes (measured: per-group DMA at R=2 shipped
    # 2x the bytes and gave back half the compute win; per-block predicated
    # DMA paid ~6% in issue overhead). Overflow/max_run are judged against
    # the UNION run — that is what the static wseg must hold, and every
    # group window is a subrange of its tile's union.
    R = spec.rgroups
    if R > 1:
        ntile = spec.n_tiles
        ws_u = jnp.min(ws_t.reshape(ntile, R, n_seg), axis=1)
        we_u = jnp.max(we_t.reshape(ntile, R, n_seg), axis=1)
    else:
        ws_u, we_u = ws_t, we_t
    t_lo = jnp.clip((ws_u // 128) * 128, 0, spec.n_sorted - S)
    t_len = jnp.maximum(we_u - t_lo, 0)
    t_nact = jnp.clip(-(-t_len // 128), 0, S // 128).astype(jnp.int32)
    overflow = jnp.sum(t_len > S) + ghost_drop
    max_run = jnp.max(we_u - jnp.clip((ws_u // 128) * 128, 0, None))
    if R == 1:
        t_lo, t_nact = w_lo, w_nact

    # ---- per-group candidate compaction (spec.cwidth > 0) ----
    # The segment ranges [ws, we) are monotone non-decreasing across
    # segments (the pencil deltas are strictly increasing and `first` is
    # monotone), so the overlap of segment s with the union of earlier
    # segments is exactly the previous running-max tail: clipping the start
    # to cummax(we)[s-1] yields disjoint contiguous runs whose
    # concatenation is the group's EXACT candidate set — no duplicates
    # (the in-kernel first-occurrence mask becomes a no-op), no 128-lane
    # alignment slop, no per-segment block quantum. Entries past c_n point
    # at the last sorted row; gather_cands zero-masks their mass, so they
    # contribute exactly nothing (every kernel output channel multiplies
    # the candidate mass).
    c_idx = c_n = c_max = None
    if spec.cwidth > 0:
        C = spec.cwidth
        we_prev = jnp.concatenate(
            [jnp.zeros((nt, 1), jnp.int32),
             jax.lax.cummax(we_t, axis=1)[:, :-1]], axis=1)
        cws = jnp.maximum(ws_t, we_prev)
        clen = jnp.maximum(we_t - cws, 0)
        off = jnp.cumsum(clen, axis=1) - clen          # exclusive prefix
        c_n = (off[:, -1] + clen[:, -1]).astype(jnp.int32)
        k = jnp.arange(C, dtype=jnp.int32)[None, :]
        c_idx = jnp.full((nt, C), spec.n_sorted - 1, jnp.int32)
        for s in range(n_seg):
            o, l_ = off[:, s:s + 1], clen[:, s:s + 1]
            m = (k >= o) & (k < o + l_)
            c_idx = jnp.where(m, cws[:, s:s + 1] + (k - o), c_idx)
        overflow = overflow + jnp.sum(c_n > C)
        c_max = jnp.max(c_n)

    return WindowData(g=g, src=src, inv=inv_real[:n], is_real=is_real,
                      pos_s=pos_s, shift_s=shift_s, w_lo=w_lo, w_nact=w_nact,
                      t_lo=t_lo, t_nact=t_nact, overflow=overflow,
                      max_run=max_run, c_idx=c_idx, c_n=c_n, c_max=c_max)


def gather_sorted(field_orig, wd: WindowData, fill=0.0):
    """[N, ...] original-order field -> [Ns, ...] sorted order (owner values)."""
    n = field_orig.shape[0]
    pad = jnp.full((1,) + field_orig.shape[1:], fill, field_orig.dtype)
    padded = jnp.concatenate([field_orig, pad])
    return padded[jnp.minimum(wd.g, n)]


def gather_sorted_cols(packed, wd: WindowData, fills):
    """ONE sorted gather of K column-stacked fields ([N, K] -> [Ns, K]).

    ``fills`` (length K) gives each column's pad value for rows beyond the
    real particle count — the per-column twin of ``gather_sorted``'s
    ``fill``. Packing replaces K row gathers with one; the per-field input
    gathers were a measurable share of the per-step glue at N=1e6 and the
    dominant per-tick fixed cost of the block-timestep loop (BASELINE.md).
    """
    n = packed.shape[0]
    pad = jnp.asarray(fills, packed.dtype)[None, :]
    return jnp.concatenate([packed, pad])[jnp.minimum(wd.g, n)]


def mirror_owner(field_sorted, wd: WindowData):
    """Replace ghost rows with their owner's value (one gather)."""
    return field_sorted[wd.src]


def scatter_real(field_sorted, wd: WindowData, n: int):
    """[Ns, ...] sorted -> [N, ...] original order (ghost/pad rows dropped).

    Implemented as one gather through the inverse permutation (wd.inv) —
    gathers beat scatter-inits on TPU and several fields pack into a single
    multi-column gather (see wengine.derived_with).
    """
    return field_sorted[wd.inv]


def refresh_pos(pos, wd: WindowData):
    """Recompute sorted extended positions for NEW particle positions using a
    stale structure (Verlet-skin cadence: valid while drift < skin/2)."""
    return gather_sorted(pos, wd) + wd.shift_s


def gather_cands(cols_sorted, wd: WindowData, mass_col: int):
    """Gather the compacted candidate buffer: [Ns, K] sorted-order fields ->
    [n_groups * cwidth, K] candidate-major rows (ONE XLA row gather).

    ``mass_col`` names the pair-weight column; it is zeroed on the padding
    entries past each group's true count c_n, which makes them contribute
    exactly nothing regardless of which sorted row the padding index points
    at (every kernel output channel multiplies the candidate mass).
    """
    nG, C = wd.c_idx.shape
    out = cols_sorted[wd.c_idx.reshape(-1)]
    live = (jnp.arange(C, dtype=jnp.int32)[None, :]
            < wd.c_n[:, None]).reshape(-1)
    return out.at[:, mass_col].multiply(live.astype(out.dtype))


def plan_compact(pos, domain: Domain, h_max: float, dim: int,
                 headroom: float = 1.2, **kw) -> WindowSpec:
    """plan_measured + measured candidate-compaction width.

    Builds once at a tiny probe cwidth (c_max is the TRUE per-group
    maximum count regardless of the probe width — it comes from the
    clipped-run length sums, not the capped index table), then sizes
    cwidth to it times ``headroom`` (rounded to 128). The overflow
    counter catches later growth, exactly like wseg."""
    import dataclasses as _dc

    spec = plan_measured(pos, domain, h_max, dim, **kw)
    probe = _dc.replace(spec, cwidth=128)
    wd = jax.jit(build, static_argnums=2)(pos, domain, probe)
    cw = int(np.ceil(int(wd.c_max) * headroom / 128.0) * 128)
    return _dc.replace(spec, cwidth=max(cw, 128))


def plan_measured(pos, domain: Domain, h_max: float, dim: int,
                  headroom: float = 1.15, **kw) -> WindowSpec:
    """Plan, build once, and re-plan with the measured max window length.

    The analytic wseg estimate can miss density fluctuations; this builds the
    structure on the actual positions and sizes wseg to the true requirement
    times ``headroom`` (rounded up to 128). One extra build at setup time.
    """
    import dataclasses as _dc

    n = pos.shape[0]
    spec = plan_windows(domain, h_max, n, dim, **kw)
    wd = jax.jit(build, static_argnums=2)(pos, domain, spec)
    need = int(wd.max_run) * headroom
    wseg = max(int(np.ceil(need / 128.0) * 128), 128)
    wseg = min(wseg, int(np.ceil(spec.n_sorted / 128.0) * 128))
    if wseg == spec.wseg:
        return spec
    n_sorted = int(np.ceil(max(spec.n_sorted, wseg) /
                           np.lcm(spec.tile, 128)) * np.lcm(spec.tile, 128))
    return _dc.replace(spec, wseg=wseg, n_sorted=n_sorted)
