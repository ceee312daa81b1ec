"""Exact conservation invariants of the symmetrized SPH forms (SURVEY.md §4.2.3).

With fixed h the pairwise-antisymmetric momentum form conserves total momentum
exactly and the matched energy form conserves total energy exactly (up to fp
roundoff) — sharp correctness tests for the engine's pair math.
"""
import jax.numpy as jnp
import numpy as np

from sphax import SPHConfig, box, make_state
from sphax.physics import dense
from tests.parity.test_dense_vs_reference import make_problem


def _derived(cfg, seed=11):
    pos, vel, mass, u, h = make_problem(dim=cfg.dim, n_side=6, seed=seed)
    dom = box(jnp.zeros(cfg.dim), jnp.ones(cfg.dim))
    state = make_state(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
                       jnp.asarray(u), jnp.asarray(h))
    return dense.update_derived(state, cfg, dom, block=64)


def test_momentum_rate_is_zero():
    st = _derived(SPHConfig(dim=3, adaptive_h=False))
    dp = np.asarray(jnp.sum(st.mass[:, None] * st.acc, axis=0))
    scale = float(jnp.max(jnp.abs(st.mass[:, None] * st.acc)))
    assert np.all(np.abs(dp) < 1e-11 * scale * st.n)


def test_energy_rate_is_zero_fixed_h():
    st = _derived(SPHConfig(dim=3, adaptive_h=False))
    dE = float(jnp.sum(st.mass * (jnp.sum(st.vel * st.acc, -1) + st.du_dt)))
    scale = float(jnp.sum(st.mass * jnp.abs(st.du_dt))) + 1e-30
    assert abs(dE) < 1e-10 * scale * st.n


def test_energy_rate_small_adaptive_gradh():
    """With converged h and Omega terms, energy error is Newton-residual-sized."""
    st = _derived(SPHConfig(dim=3, adaptive_h=True, grad_h=True,
                            newton_iters=30))
    dE = float(jnp.sum(st.mass * (jnp.sum(st.vel * st.acc, -1) + st.du_dt)))
    scale = float(jnp.sum(st.mass * jnp.abs(st.du_dt))) + 1e-30
    assert abs(dE) < 1e-8 * scale * st.n
