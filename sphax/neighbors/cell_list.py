"""Uniform-grid cell list with Morton-sorted particles (SURVEY.md C3, §3.4).

Replaces the reference's O(N^2) inline loops (BASELINE.json:5) with:

  1. per-particle cell coords -> row-major cell id (any per-axis resolution)
     and a Morton key (locality sort key);
  2. one on-device argsort by Morton key — same-cell particles become
     contiguous, nearby cells become near-contiguous in HBM;
  3. a dense ``[ncells, capacity]`` index table built by scatter (sentinel-
     padded), giving O(1) lookup of any cell's particles with static shapes;
  4. engines then evaluate interactions cell-block vs stacked-neighbor-cell
     blocks — the fixed-degree, static-shape formulation every downstream
     kernel (jnp and Pallas) consumes.

Everything is shape-static under jit; ``Grid`` (resolution, capacity) is
static config, so changing it recompiles while particle motion does not.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sphax.core.state import Domain
from sphax.neighbors import morton


@dataclasses.dataclass(frozen=True)
class Grid:
    """Static cell-grid spec: per-axis resolution and per-cell capacity."""

    res: Tuple[int, ...]
    capacity: int

    @property
    def ncells(self) -> int:
        return int(np.prod(self.res))

    @property
    def dim(self) -> int:
        return len(self.res)

    def offsets(self) -> np.ndarray:
        """Neighbor-cell offsets, deduplicated for tiny resolutions.

        With res_d >= 3 the usual {-1, 0, 1}; res_d == 2 would alias -1 and
        +1 under periodic wrap (double-counting pairs), so use {-1, 0};
        res_d == 1 uses {0}. Static python data -> trace-time constants.
        """
        per_axis = []
        for r in self.res:
            if r >= 3:
                per_axis.append([-1, 0, 1])
            elif r == 2:
                per_axis.append([-1, 0])
            else:
                per_axis.append([0])
        grids = np.meshgrid(*per_axis, indexing="ij")
        return np.stack([g.ravel() for g in grids], axis=-1)  # [n_off, D]

    @property
    def n_candidates(self) -> int:
        return len(self.offsets()) * self.capacity


def choose_grid(domain: Domain, h_max: float, n: int, margin: float = 1.1,
                occupancy_safety: float = 3.0, max_cells: int = 2**22) -> Grid:
    """Host-side grid selection: cell size >= margin * support * h_max.

    Capacity = safety * average occupancy (rounded up to a multiple of 4).
    """
    ext = np.asarray(domain.extent)
    cut = 2.0 * float(h_max) * margin
    res = np.maximum(1, np.floor(ext / cut).astype(int))
    while int(np.prod(res)) > max_cells:
        res = np.maximum(1, res // 2)
    ncells = int(np.prod(res))
    avg = n / ncells
    cap = int(max(4, np.ceil(avg * occupancy_safety / 4) * 4))
    return Grid(res=tuple(int(r) for r in res), capacity=cap)


class CellList(NamedTuple):
    """Built cell structure over a *sorted* particle set.

    perm:      [N]  original index of the k-th sorted particle
    cid:       [N]  row-major cell id per sorted particle
    slot:      [N]  slot of each sorted particle within its cell (may be >=
                    capacity for overflowing particles — they are dropped
                    from the table; ``overflow`` counts them)
    table:     [ncells, capacity] sorted-particle index per slot, sentinel N
    overflow:  []   number of particles that did not fit their cell
    """

    perm: jax.Array
    cid: jax.Array
    slot: jax.Array
    table: jax.Array
    overflow: jax.Array


def cell_coords(pos, domain: Domain, grid: Grid):
    """Integer cell coords [N, D] for positions (clipped into the grid)."""
    res = jnp.asarray(grid.res, dtype=pos.dtype)
    x = (pos - domain.lo) / domain.extent * res
    c = jnp.clip(jnp.floor(x), 0, res - 1)
    return c.astype(jnp.int32)


def row_major_cid(coords, grid: Grid):
    strides = np.concatenate([np.cumprod(grid.res[::-1])[-2::-1], [1]])
    return jnp.sum(coords * jnp.asarray(strides, jnp.int32), axis=-1)


def build(pos, domain: Domain, grid: Grid) -> CellList:
    """Build the cell list; one argsort + one scatter, all on device."""
    n = pos.shape[0]
    coords = cell_coords(pos, domain, grid)
    cid = row_major_cid(coords, grid)
    key = morton.encode(coords)
    perm = jnp.argsort(key)
    cid_s = cid[perm]
    key_s = key[perm]

    idx = jnp.arange(n, dtype=jnp.int32)
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_new, idx, 0))
    slot = idx - seg_start

    valid = slot < grid.capacity
    overflow = jnp.sum(~valid)
    # out-of-range scatter indices are dropped
    table = jnp.full((grid.ncells, grid.capacity), n, jnp.int32)
    table = table.at[cid_s, jnp.where(valid, slot, grid.capacity)].set(
        idx, mode="drop")
    return CellList(perm=perm, cid=cid_s, slot=slot, table=table,
                    overflow=overflow)


def neighbor_cids(cids, grid: Grid, periodic):
    """Row-major ids of the neighbor cells of each cell in ``cids``.

    Returns ([B, n_off] cell ids, [B, n_off] validity mask). Static offset
    list; ``periodic`` is a bool or per-axis tuple — periodic axes wrap,
    open axes mask out-of-range neighbor cells.
    """
    dim = grid.dim
    per = (periodic,) * dim if isinstance(periodic, bool) else tuple(periodic)
    res = jnp.asarray(grid.res, jnp.int32)
    strides = np.concatenate([np.cumprod(grid.res[::-1])[-2::-1], [1]])
    strides = jnp.asarray(strides, jnp.int32)
    coords = (cids[:, None] // strides[None, :]) % res[None, :]  # [B, D]
    offs = jnp.asarray(grid.offsets(), jnp.int32)                # [n_off, D]
    nc = coords[:, None, :] + offs[None, :, :]                   # [B, n_off, D]
    wrapped = jnp.mod(nc, res)
    in_range = (nc >= 0) & (nc < res)
    per_mask = jnp.asarray(per)                                  # [D] static
    nc = jnp.where(per_mask, wrapped, jnp.clip(nc, 0, res - 1))
    ok = jnp.all(per_mask | in_range, axis=-1)
    return jnp.sum(nc * strides, axis=-1), ok
