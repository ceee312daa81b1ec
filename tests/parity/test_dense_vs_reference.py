"""Dense jnp engine vs float64 NumPy reference — the 1e-6 parity gate.

BASELINE.json:5: "Match the reference code's density/pressure/force values to
1e-6 relative tolerance on identical initial conditions." Both sides run in
float64 here (tests/conftest.py enables x64); agreement is ~1e-12.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import sphax.reference_cpu as ref
from sphax import SPHConfig, box, make_state
from sphax.physics import dense


def jittered_lattice(n_side, dim, seed, jitter=0.2):
    rng = np.random.default_rng(seed)
    ax = (np.arange(n_side) + 0.5) / n_side
    grids = np.meshgrid(*([ax] * dim), indexing="ij")
    pos = np.stack([g.ravel() for g in grids], axis=-1)
    pos += jitter / n_side * rng.standard_normal(pos.shape)
    return np.mod(pos, 1.0)


def make_problem(dim=3, n_side=6, seed=0, vel_scale=0.3):
    rng = np.random.default_rng(seed + 1)
    pos = jittered_lattice(n_side, dim, seed)
    n = len(pos)
    vel = vel_scale * rng.standard_normal((n, dim))
    mass = np.full(n, 1.0 / n)
    u = 1.0 + 0.5 * rng.random(n)
    h = np.full(n, 1.3 / n_side)
    return pos, vel, mass, u, h


CONFIGS = {
    "fixed_h": SPHConfig(dim=3, adaptive_h=False, grad_h=False),
    "adaptive": SPHConfig(dim=3, adaptive_h=True, grad_h=False, newton_iters=30),
    "gradh": SPHConfig(dim=3, adaptive_h=True, grad_h=True, newton_iters=30),
    "balsara": SPHConfig(dim=3, adaptive_h=True, grad_h=True, balsara=True,
                         newton_iters=30),
    "gravity": SPHConfig(dim=3, adaptive_h=False, gravity=True, G=2.3,
                         grav_eps=0.05),
    "isothermal": SPHConfig(dim=3, isothermal=True, cs_iso=1.7,
                            adaptive_h=True, newton_iters=30),
    "dim2": SPHConfig(dim=2, adaptive_h=True, grad_h=True, balsara=True,
                      newton_iters=30),
}


@pytest.mark.parametrize("name", list(CONFIGS))
def test_update_derived_parity(name):
    cfg = CONFIGS[name]
    n_side = 10 if cfg.dim == 2 else 6
    pos, vel, mass, u, h = make_problem(dim=cfg.dim, n_side=n_side, seed=3)
    box_arr = np.ones(cfg.dim)

    der = ref.update_derived(pos, vel, mass, u, h, cfg, box=box_arr)

    dom = box(jnp.zeros(cfg.dim), jnp.ones(cfg.dim))
    state = make_state(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
                       jnp.asarray(u), jnp.asarray(h))
    out = dense.update_derived(state, cfg, dom, block=64)

    rtol = 1e-6  # the BASELINE gate; actual agreement is ~1e-12
    np.testing.assert_allclose(np.asarray(out.h), der["h"], rtol=rtol)
    np.testing.assert_allclose(np.asarray(out.rho), der["rho"], rtol=rtol)
    np.testing.assert_allclose(np.asarray(out.P), der["P"], rtol=rtol)
    np.testing.assert_allclose(np.asarray(out.omega), der["omega"], rtol=rtol)
    scale = np.max(np.abs(der["acc"]))
    np.testing.assert_allclose(np.asarray(out.acc), der["acc"],
                               rtol=rtol, atol=rtol * scale)
    uscale = np.max(np.abs(der["du_dt"])) + 1e-30
    np.testing.assert_allclose(np.asarray(out.du_dt), der["du_dt"],
                               rtol=rtol, atol=rtol * uscale)


def test_kdk_step_parity():
    """Several full KDK steps stay in lockstep with the reference."""
    from sphax.integrate import leapfrog

    cfg = SPHConfig(dim=3, adaptive_h=True, grad_h=True, newton_iters=30)
    pos, vel, mass, u, h = make_problem(dim=3, n_side=6, seed=7)
    box_arr = np.ones(3)

    der = ref.update_derived(pos, vel, mass, u, h, cfg, box=box_arr)
    dom = box(jnp.zeros(3), jnp.ones(3))
    state = make_state(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
                       jnp.asarray(u), jnp.asarray(h))
    state = dense.update_derived(state, cfg, dom, block=64)

    derived_fn = lambda s: dense.update_derived(s, cfg, dom, block=64)
    p, v, uu, hh = pos, vel, u, h
    for _ in range(3):
        p, v, uu, hh, der, dt_ref = ref.step(p, v, mass, uu, hh, der, cfg,
                                             box=box_arr)
        state, dt = leapfrog.step(state, cfg, dom, derived_fn)
        assert abs(float(dt) - dt_ref) < 1e-9 * dt_ref

    np.testing.assert_allclose(np.asarray(state.pos), p, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.vel), v, rtol=1e-6,
                               atol=1e-6 * np.max(np.abs(v)))
    np.testing.assert_allclose(np.asarray(state.u), uu, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state.rho), der["rho"], rtol=1e-6)
