"""Hilbert vs row-major pencil ordering A/B (round-3 judge Next #7).

BASELINE.json names "multi-chip SFC domain decomposition"; sphax ships
row-major pencil sort keys + product-grid cuts instead, arguing the window
engine's contiguous-segment walks NEED the pencil sort. This probe settles
the remaining question — would ordering the transverse pencils along a
Hilbert curve (the SFC's locality) buy anything? — with a number.

What ordering CAN and CANNOT change in this architecture:

* The 3^(D-1) candidate segments per row-group are contiguous runs of one
  neighbor pencil each, and a run's LENGTH is that pencil's occupancy in
  the group's fast-axis reach — independent of how pencils are ordered.
  The segment COUNT (the measured walk floor, NEXT.md) is also fixed.
* The only ordering-dependent terms are boundary effects: a 128-row tile
  (64-row group) that straddles a pencil boundary unions the windows of
  BOTH pencils' neighborhoods. Row-major's bad straddles are the x-jumps
  (y wraps: spatially far pencils share a group); Hilbert's straddles are
  always spatially adjacent. This probe computes the EXACT per-group
  padded candidate volume (the walk cost) and per-tile union DMA volume
  (the bytes cost) under both orderings, emulating window.build's bounds
  math generalized to arbitrary pencil permutations.

Usage:  python benchmarks/probe_hilbert.py [n_side] [rgroups]
Result (BASELINE.md round-4): the deltas are sub-1% — the pencil-boundary
tile population is ~n_pencils/n_tiles and only the x-jump minority
differs — so the SFC's locality has nothing to act on here; the
product-grid/pencil deviation from the reference's SFC costs nothing.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def hilbert_rank(nbits: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorised 2D Hilbert curve rank of (x, y) on a 2^nbits grid."""
    rx = np.zeros_like(x)
    ry = np.zeros_like(y)
    x, y = x.copy(), y.copy()
    d = np.zeros_like(x, dtype=np.int64)
    s = 1 << (nbits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f, y_f = x.copy(), y.copy()
        x = np.where(flip, s - 1 - x_f, x_f)
        y = np.where(flip, s - 1 - y_f, y_f)
        x, y = np.where(swap, y, x), np.where(swap, x, y)
        s >>= 1
    return d


def volumes(pos, box, cutoff, fast_sub, rgroups, pencil_order):
    """Emulate window.build's per-group bounds under an arbitrary pencil
    permutation; return (mean padded candidate rows/row over live groups,
    mean per-tile union DMA rows, max single run)."""
    dim = pos.shape[1]
    res = np.maximum(np.floor(box / cutoff).astype(int), 1)
    res[-1] *= fast_sub
    cell = box / res
    c = np.clip((pos / cell).astype(np.int64), 0, res - 1)
    n0, n1, nf = int(res[0]), int(res[1]), int(res[2])

    if pencil_order == "rowmajor":
        pid = c[:, 0] * n1 + c[:, 1]
        pid_of = lambda p0, p1: p0 * n1 + p1
    else:
        nbits = int(np.ceil(np.log2(max(n0, n1, 2))))
        g0, g1 = np.meshgrid(np.arange(n0), np.arange(n1), indexing="ij")
        rank2d = hilbert_rank(nbits, g0.ravel(), g1.ravel())
        # dense ranks of the occupied grid (a permutation of pencil ids)
        dense = np.empty_like(rank2d)
        dense[np.argsort(rank2d, kind="stable")] = np.arange(n0 * n1)
        table = dense.reshape(n0, n1)
        pid = table[c[:, 0], c[:, 1]]
        pid_of = lambda p0, p1: table[p0, p1]

    key = pid * nf + c[:, 2]
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    n = len(pos)
    ncells = n0 * n1 * nf
    first = np.full(ncells + 1, n, np.int64)
    # first row of each key (keys sorted): scatter-min then suffix-min
    np.minimum.at(first, key_s, np.arange(n))
    first = np.minimum.accumulate(first[::-1])[::-1]

    tile = 128
    nt = n // tile  # ignore the ragged tail — identical under both orders
    Tg = tile // rgroups
    nG = nt * rgroups
    c_srt = c[order]
    p_srt = pid[order]
    reach = fast_sub

    g_c0 = c_srt[:nG * Tg, 0].reshape(nG, Tg)
    g_c1 = c_srt[:nG * Tg, 1].reshape(nG, Tg)
    g_cf = c_srt[:nG * Tg, 2].reshape(nG, Tg)

    pad_rows = np.zeros(nG)
    runs_max = 0
    # per-(group, segment) run via per-row neighbor-pencil lookups (the
    # generalized form of build's kmin/kmax + static delta)
    tile_lo = np.full((nt, 9), n, np.int64)
    tile_hi = np.zeros((nt, 9), np.int64)
    for s, (dx, dy) in enumerate(
            [(i, j) for i in (-1, 0, 1) for j in (-1, 0, 1)]):
        p0 = g_c0 + dx
        p1 = g_c1 + dy
        ok = (p0 >= 0) & (p0 < n0) & (p1 >= 0) & (p1 < n1)
        pn = pid_of(np.clip(p0, 0, n0 - 1), np.clip(p1, 0, n1 - 1))
        klo = pn * nf + np.clip(g_cf - reach, 0, nf - 1)
        khi = pn * nf + np.clip(g_cf + reach, 0, nf - 1)
        ws = np.where(ok, first[klo], n).min(axis=1)
        we = np.where(ok, first[np.minimum(khi + 1, ncells)], 0).max(axis=1)
        ln = np.maximum(we - ws, 0)
        runs_max = max(runs_max, int(ln.max()))
        pad_rows += np.ceil(ln / 128.0) * 128 * (ln > 0)
        t = np.arange(nG) // rgroups
        np.minimum.at(tile_lo, (t, np.full(nG, s)), np.where(ln > 0, ws, n))
        np.maximum.at(tile_hi, (t, np.full(nG, s)), we)

    union = np.maximum(tile_hi - (tile_lo // 128) * 128, 0)
    dma_rows = (np.ceil(union / 128.0) * 128).sum(axis=1)
    return pad_rows.mean(), dma_rows.mean(), runs_max


def main():
    import jax.numpy as jnp

    from sphax.ics import turbulence

    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rgroups = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    fast_sub = 3

    ic = turbulence.build(n_side=n_side)
    pos = np.asarray(ic["pos"], np.float64)
    box = np.asarray(ic["box"], np.float64)
    h_max = float(np.max(ic["h"])) * 1.05
    cutoff = 2.0 * h_max * 1.05  # bench config: cutoff_scale 1.05

    print(f"N={len(pos)} cutoff={cutoff:.4f} fast_sub={fast_sub} "
          f"rgroups={rgroups}")
    for orderng in ("rowmajor", "hilbert"):
        pr, dr, mx = volumes(pos, box, cutoff, fast_sub, rgroups, orderng)
        print(f"{orderng:9s}: padded candidate rows/group {pr:9.1f}  "
              f"union DMA rows/tile {dr:9.1f}  max run {mx}")


if __name__ == "__main__":
    main()
