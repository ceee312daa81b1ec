"""Cell-list structure tests: table correctness vs brute force (SURVEY.md §4.2.1)."""
import jax.numpy as jnp
import numpy as np
import pytest

from sphax import box
from sphax.neighbors import cell_list as cl_mod
from sphax.neighbors.cell_list import Grid


def _random(n, dim, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((n, dim)))


@pytest.mark.parametrize("dim,res", [(3, (4, 4, 4)), (2, (8, 8)),
                                     (3, (4, 2, 1)), (3, (5, 3, 3))])
def test_table_contains_every_particle_once(dim, res):
    n = 500
    pos = _random(n, dim)
    dom = box(jnp.zeros(dim), jnp.ones(dim))
    grid = Grid(res=res, capacity=128)  # big capacity -> no overflow
    cl = cl_mod.build(pos, dom, grid)
    assert int(cl.overflow) == 0
    table = np.asarray(cl.table)
    entries = table[table < n]
    assert len(entries) == n and len(np.unique(entries)) == n


def test_particles_in_correct_cells():
    n, dim = 400, 3
    pos = _random(n, dim, seed=3)
    dom = box(jnp.zeros(dim), jnp.ones(dim))
    grid = Grid(res=(4, 4, 4), capacity=64)
    cl = cl_mod.build(pos, dom, grid)
    coords = np.asarray(cl_mod.cell_coords(pos, dom, grid))
    cid_true = np.asarray(cl_mod.row_major_cid(jnp.asarray(coords), grid))
    table = np.asarray(cl.table)
    perm = np.asarray(cl.perm)
    for c in range(grid.ncells):
        for s in table[c][table[c] < n]:
            assert cid_true[perm[s]] == c


def test_overflow_detected():
    n = 100
    pos = jnp.zeros((n, 3)) + 0.5  # everyone in one cell
    dom = box(jnp.zeros(3), jnp.ones(3))
    grid = Grid(res=(4, 4, 4), capacity=16)
    cl = cl_mod.build(pos, dom, grid)
    assert int(cl.overflow) == n - 16


@pytest.mark.parametrize("res,periodic", [((4, 4, 4), True), ((4, 4, 4), False),
                                          ((2, 4, 4), True), ((1, 4, 4), True)])
def test_candidates_are_superset_of_true_neighbors(res, periodic):
    """Every pair within the cutoff appears in each other's candidate set."""
    n, dim = 300, 3
    pos = _random(n, dim, seed=5)
    dom = box(jnp.zeros(dim), jnp.ones(dim), periodic=periodic)
    grid = Grid(res=res, capacity=max(64, 4 * n // int(np.prod(res))))
    cl = cl_mod.build(pos, dom, grid)
    assert int(cl.overflow) == 0

    cutoff = 1.0 / max(res)  # cell size along the finest axis
    p = np.asarray(pos)
    dx = p[:, None] - p[None, :]
    if periodic:
        dx -= np.round(dx)
    r = np.sqrt((dx**2).sum(-1))

    # candidate sets from the table
    table = np.asarray(cl.table)
    cid_s = np.asarray(cl.cid)
    perm = np.asarray(cl.perm)
    ncids, ok = cl_mod.neighbor_cids(jnp.arange(grid.ncells, dtype=jnp.int32),
                                     grid, periodic)
    ncids, ok = np.asarray(ncids), np.asarray(ok)
    cand_of = {}
    for k in range(n):  # k = sorted index
        c = cid_s[k]
        cand = table[ncids[c][ok[c]]].ravel()
        cand_of[perm[k]] = set(perm[s] for s in cand[cand < n])
    for i in range(n):
        for j in np.nonzero(r[i] < cutoff)[0]:
            assert j in cand_of[i], f"pair ({i},{j}) r={r[i, j]:.3f} missed"


def test_h_saturation_counter():
    """clist.h_saturation_count fires when adaptive h outgrows the cells
    (round-1 advisor: the cell structure's invariants were never re-checked
    after planning)."""
    import jax.numpy as jnp

    from sphax import SPHConfig, box, make_state
    from sphax.neighbors.cell_list import choose_grid
    from sphax.physics import clist

    rng = np.random.default_rng(2)
    n = 200
    pos = rng.random((n, 3))
    st = make_state(jnp.asarray(pos), jnp.zeros((n, 3)),
                    jnp.full((n,), 1.0 / n), jnp.ones((n,)),
                    jnp.full((n,), 0.08))
    dom = box(jnp.zeros(3), jnp.ones(3))
    grid = choose_grid(dom, h_max=0.08, n=n)
    assert int(clist.h_saturation_count(st, dom, grid)) == 0
    grown = st._replace(h=st.h * 4.0)     # past cell/2
    assert int(clist.h_saturation_count(grown, dom, grid)) > 0


def test_window_capped_counter():
    """wengine.capped_count counts particles pinned at the structural cap."""
    import jax.numpy as jnp

    from sphax import box, make_state
    from sphax.neighbors import window as win
    from sphax.physics import wengine

    rng = np.random.default_rng(3)
    n = 200
    pos = rng.random((n, 3))
    st = make_state(jnp.asarray(pos), jnp.zeros((n, 3)),
                    jnp.full((n,), 1.0 / n), jnp.ones((n,)),
                    jnp.full((n,), 0.04))
    dom = box(jnp.zeros(3), jnp.ones(3))
    # cap = cutoff/2 = h_max * cutoff_scale: plan with headroom so the
    # initial h sits safely below it
    spec = win.plan_windows(dom, h_max=0.04, n=n, dim=3, cutoff_scale=1.3)
    assert int(wengine.capped_count(st, spec)) == 0
    pinned = st._replace(h=jnp.full((n,), 0.5 * spec.cutoff))
    assert int(wengine.capped_count(pinned, spec)) == n
