"""Randomized property tests (SURVEY.md §4.2.5): conservation and pair
symmetry invariants over random ICs, seeds, and configs."""
import jax.numpy as jnp
import numpy as np
import pytest

from sphax import SPHConfig, box, make_state
from sphax.physics import dense, pairs
from sphax.physics import kernels as K


@pytest.mark.parametrize("seed", range(5))
def test_momentum_energy_invariants_random(seed):
    """Exact pairwise antisymmetry => dP/dt = 0 and dE/dt = 0 (fixed h)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(40, 200))
    dim = int(rng.integers(2, 4))
    pos = rng.random((n, dim))
    vel = rng.standard_normal((n, dim))
    mass = rng.random(n) + 0.1          # UNEQUAL masses
    u = rng.random(n) + 0.5
    h = np.full(n, 1.5 * n ** (-1.0 / dim))
    cfg = SPHConfig(dim=dim, adaptive_h=False,
                    gamma=float(rng.uniform(1.2, 2.0)),
                    alpha_visc=float(rng.uniform(0.5, 2.0)),
                    beta_visc=float(rng.uniform(1.0, 4.0)))
    dom = box(jnp.zeros(dim), jnp.ones(dim))
    st = make_state(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
                    jnp.asarray(u), jnp.asarray(h))
    st = dense.update_derived(st, cfg, dom, block=64)

    dp = np.asarray(jnp.sum(st.mass[:, None] * st.acc, axis=0))
    pscale = float(jnp.max(jnp.abs(st.mass[:, None] * st.acc))) + 1e-300
    assert np.all(np.abs(dp) < 1e-10 * pscale * n)

    dE = float(jnp.sum(st.mass * (jnp.sum(st.vel * st.acc, -1) + st.du_dt)))
    escale = float(jnp.sum(st.mass * jnp.abs(st.du_dt))) + 1e-300
    assert abs(dE) < 1e-9 * escale * n


@pytest.mark.parametrize("seed", range(3))
def test_pair_force_antisymmetry(seed):
    """Single-pair momentum conservation at the pair level (SURVEY §4.2.1)."""
    rng = np.random.default_rng(100 + seed)
    cfg = SPHConfig(dim=3, adaptive_h=False)
    dx = jnp.asarray(rng.standard_normal(3) * 0.1)
    r = jnp.sqrt(jnp.sum(dx * dx))
    dv = jnp.asarray(rng.standard_normal(3))
    h1, h2 = 0.2, 0.3
    rho1, rho2 = 1.1, 0.7
    P1, P2 = 2.0, 0.5
    args = dict(cs_i=1.3, cs_j=0.9, om_i=1.0, om_j=1.0, cfg=cfg)
    f12, _ = pairs.force_terms(dx, r, dv, h1, h2, rho1, rho2, P1, P2,
                               m_j=3.0, **args)
    args_sw = dict(cs_i=0.9, cs_j=1.3, om_i=1.0, om_j=1.0, cfg=cfg)
    f21, _ = pairs.force_terms(-dx, r, -dv, h2, h1, rho2, rho1, P2, P1,
                               m_j=2.0, **args_sw)
    # fcoef = m_j * S(i,j) with S symmetric under i<->j; the pair's momentum
    # contributions m_i*(-m_j S dx) and m_j*(-m_i S (-dx)) then cancel.
    np.testing.assert_allclose(float(f12) / 3.0, float(f21) / 2.0,
                               rtol=1e-12)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_kernel_positive_and_monotone(dim):
    """W >= 0 everywhere; W monotonically non-increasing in r."""
    h = 0.7
    r = np.linspace(0, 2.5 * h, 400)
    w = np.asarray(K.W(jnp.asarray(r), h, dim))
    assert np.all(w >= 0)
    assert np.all(np.diff(w) <= 1e-12)


@pytest.mark.parametrize("seed", range(3))
def test_density_positive_random(seed):
    rng = np.random.default_rng(200 + seed)
    n = 128
    cfg = SPHConfig(dim=3, adaptive_h=True, newton_iters=15)
    dom = box(jnp.zeros(3), jnp.ones(3))
    st = make_state(jnp.asarray(rng.random((n, 3))),
                    jnp.zeros((n, 3)), jnp.full((n,), 1.0 / n),
                    jnp.ones((n,)), jnp.full((n,), 0.3))
    st = dense.update_derived(st, cfg, dom, block=64)
    assert float(st.rho.min()) > 0
    assert float(st.h.min()) > 0
    # adaptive h satisfies the consistency relation to Newton tolerance
    lhs = np.asarray(st.rho)
    rhs = np.asarray(st.mass) * (cfg.eta / np.asarray(st.h)) ** 3
    np.testing.assert_allclose(lhs, rhs, rtol=1e-6)
