"""Cell-list engine vs dense engine — must agree to fp roundoff.

SURVEY.md §4.2.2: "O(N^2) jnp path vs cell-list path (must agree to roundoff,
proving the neighbor structure finds the same pairs)." Both engines run the
same pair math (sphax.physics.pairs); the only difference is candidate
enumeration and summation order, so x64 agreement at ~1e-12 is the bar.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from sphax import SPHConfig, box, make_state
from sphax.neighbors.cell_list import Grid
from sphax.physics import clist, dense
from tests.parity.test_dense_vs_reference import CONFIGS, make_problem


def _setup(cfg, n_side, seed=3):
    pos, vel, mass, u, h = make_problem(dim=cfg.dim, n_side=n_side, seed=seed)
    dom = box(jnp.zeros(cfg.dim), jnp.ones(cfg.dim))
    state = make_state(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
                       jnp.asarray(u), jnp.asarray(h))
    return state, dom


@pytest.mark.parametrize("name", list(CONFIGS))
def test_engines_agree(name):
    cfg = CONFIGS[name]
    n_side = 12 if cfg.dim == 2 else 8
    state, dom = _setup(cfg, n_side)
    # cell size must cover 2*h_max(after adaptation); h0=1.3/n_side,
    # support 2h -> cutoff ~2.6/n_side; res = floor(n_side/2.6) is safe
    res = tuple([max(1, int(n_side / 3))] * cfg.dim)
    grid = Grid(res=res, capacity=256)
    assert int(clist.overflow_count(state, dom, grid)) == 0

    a = dense.update_derived(state, cfg, dom, block=64)
    b = clist.update_derived(state, cfg, dom, grid, cell_block=8)

    rtol = 1e-10
    np.testing.assert_allclose(np.asarray(b.h), np.asarray(a.h), rtol=rtol)
    np.testing.assert_allclose(np.asarray(b.rho), np.asarray(a.rho), rtol=rtol)
    np.testing.assert_allclose(np.asarray(b.P), np.asarray(a.P), rtol=rtol)
    np.testing.assert_allclose(np.asarray(b.omega), np.asarray(a.omega),
                               rtol=rtol)
    scale = float(jnp.max(jnp.abs(a.acc)))
    np.testing.assert_allclose(np.asarray(b.acc), np.asarray(a.acc),
                               rtol=rtol, atol=rtol * scale)
    uscale = float(jnp.max(jnp.abs(a.du_dt))) + 1e-30
    np.testing.assert_allclose(np.asarray(b.du_dt), np.asarray(a.du_dt),
                               rtol=rtol, atol=rtol * uscale)


def test_steps_agree():
    """Full KDK steps through each engine stay in lockstep."""
    from sphax.integrate import leapfrog

    cfg = SPHConfig(dim=3, adaptive_h=True, grad_h=True, newton_iters=12)
    state, dom = _setup(cfg, 8, seed=9)
    grid = Grid(res=(2, 2, 2), capacity=512)

    sa = dense.update_derived(state, cfg, dom, block=64)
    sb = clist.update_derived(state, cfg, dom, grid)
    for _ in range(3):
        sa, dta = leapfrog.step(sa, cfg, dom,
                                lambda s: dense.update_derived(s, cfg, dom, block=64))
        sb, dtb = leapfrog.step(sb, cfg, dom,
                                lambda s: clist.update_derived(s, cfg, dom, grid))
        assert abs(float(dta - dtb)) < 1e-12 * float(dta)
    np.testing.assert_allclose(np.asarray(sb.pos), np.asarray(sa.pos),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sb.rho), np.asarray(sa.rho),
                               rtol=1e-9)
