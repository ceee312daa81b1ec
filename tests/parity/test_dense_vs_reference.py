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


# newton_iters=10: Newton on h is quadratic from the lattice h0 — 10
# bounded iterations reach float64 roundoff (verified: parity bars below
# hold unchanged vs the former 30), and the fori_loop trace length was the
# dominant suite cost on this 1-core box.
CONFIGS = {
    "fixed_h": SPHConfig(dim=3, adaptive_h=False, grad_h=False),
    "adaptive": SPHConfig(dim=3, adaptive_h=True, grad_h=False, newton_iters=10),
    "gradh": SPHConfig(dim=3, adaptive_h=True, grad_h=True, newton_iters=10),
    "balsara": SPHConfig(dim=3, adaptive_h=True, grad_h=True, balsara=True,
                         newton_iters=10),
    "gravity": SPHConfig(dim=3, adaptive_h=False, gravity=True, G=2.3,
                         grav_eps=0.05),
    "isothermal": SPHConfig(dim=3, isothermal=True, cs_iso=1.7,
                            adaptive_h=True, newton_iters=10),
    "dim2": SPHConfig(dim=2, adaptive_h=True, grad_h=True, balsara=True,
                      newton_iters=10),
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

    cfg = SPHConfig(dim=3, adaptive_h=True, grad_h=True, newton_iters=10)
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


def test_mm_viscosity_lockstep():
    """Morris-Monaghan alpha(t): engine == reference through several steps.

    A convergent velocity field (div v < 0) drives the source term, so the
    test fails if alpha is not evolved, not applied to Pi_ij, or applied
    with the wrong convention (SURVEY.md §2.1.6, C8).
    """
    from sphax.integrate import leapfrog

    cfg = SPHConfig(dim=3, adaptive_h=True, newton_iters=25, mm_visc=True,
                    alpha_visc=1.0, beta_visc=2.0)
    pos, vel, mass, u, h = make_problem(dim=3, n_side=6, seed=9)
    # convergent flow -> div v < 0 -> alpha grows from alpha_min
    vel = vel * 0.1 - 0.6 * (pos - 0.5)
    box_arr = np.ones(3)
    alpha0 = np.full(len(pos), cfg.mm_alpha_min)

    a_np = alpha0.copy()
    der = ref.update_derived(pos, vel, mass, u, h, cfg, box=box_arr,
                             alpha=a_np)
    rp, rv, ru, rh = pos.copy(), vel.copy(), u.copy(), h.copy()

    dom = box(jnp.zeros(3), jnp.ones(3))
    state = make_state(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
                       jnp.asarray(u), jnp.asarray(h),
                       alpha0=cfg.mm_alpha_min)
    engine = lambda s: dense.update_derived(s, cfg, dom, block=64)
    state = engine(state)

    rtol = 1e-6
    for k in range(4):
        rp, rv, ru, rh, der, rdt = ref.step(rp, rv, mass, ru, rh, der, cfg,
                                            box=box_arr, alpha=a_np)
        a_np = der["alpha"]
        state, dt = leapfrog.step(state, cfg, dom, engine)
        np.testing.assert_allclose(float(dt), rdt, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(state.alpha), a_np, rtol=rtol,
                                   err_msg=f"alpha step {k}")
        np.testing.assert_allclose(np.asarray(state.rho), der["rho"],
                                   rtol=rtol)
        scale = np.max(np.abs(der["acc"]))
        np.testing.assert_allclose(np.asarray(state.acc), der["acc"],
                                   rtol=rtol, atol=rtol * scale)
    # the switch actually switched on somewhere
    assert float(jnp.max(state.alpha)) > 2.0 * cfg.mm_alpha_min
