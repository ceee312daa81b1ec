"""Sorted-mesh CIC parity: pm_sorted vs pm's reference deposit/interp.

The brick-matmul scan must place every particle's CIC weights on exactly
the same nodes as pm._deposit/_interp (the scalar reference convention,
itself validated against brute-force Ewald in test_pm.py). f64 on CPU:
differences are pure summation-order noise (~1e-14 relative).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sphax
from sphax import SPHConfig
from sphax.neighbors import window as win
from sphax.physics import pm, pm_sorted

M = 32


def _state(periodic, n=4000, seed=0):
    rng = np.random.default_rng(seed)
    # half uniform, half a tight blob: exercises non-uniform pencil
    # occupancy (sparse programs span many pencils -> fallback rows)
    pos = np.concatenate([
        rng.random((n // 2, 3)),
        0.2 + 0.06 * rng.standard_normal((n // 2, 3)),
    ])
    pos = np.clip(pos, 1e-6, 1 - 1e-6) if not periodic else pos % 1.0
    mass = rng.random(len(pos)) + 0.5
    dom = sphax.box(jnp.zeros(3), jnp.ones(3), periodic=periodic)
    pos, mass = jnp.asarray(pos), jnp.asarray(mass)
    h = 0.04 * jnp.ones(len(pos))
    spec = win.plan_measured(pos, dom, h_max=0.05, dim=3)
    wd = win.build(pos, dom, spec)
    return pos, mass, h, dom, spec, wd


@pytest.mark.parametrize("periodic", [True, False])
def test_deposit_matches_reference(periodic):
    pos, mass, _, dom, spec, wd = _state(periodic)
    plan = pm_sorted.plan_mesh(spec, M)
    w = jnp.where(wd.is_real, win.gather_sorted(mass, wd), 0.0)
    got, dropped = pm_sorted.deposit_sorted(wd.pos_s, w, dom, M, periodic,
                                            plan)
    lo, cell = dom.lo, dom.extent / M
    want = pm._deposit(dom.wrap(pos), mass, lo, cell, M, periodic)
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12 * float(mass.sum()))
    np.testing.assert_allclose(float(got.sum()), float(mass.sum()),
                               rtol=1e-12)


@pytest.mark.parametrize("periodic", [True, False])
def test_interp_matches_reference(periodic):
    pos, mass, _, dom, spec, wd = _state(periodic, seed=1)
    plan = pm_sorted.plan_mesh(spec, M)
    rng = np.random.default_rng(7)
    grids = jnp.asarray(rng.standard_normal((3, M, M, M)))
    got_s, dropped = pm_sorted.interp_sorted(grids, wd.pos_s, wd.is_real,
                                             dom, M, periodic, plan)
    got = got_s[wd.inv]
    lo, cell = dom.lo, dom.extent / M
    want = pm._interp(list(grids), dom.wrap(pos), lo, cell, M, periodic)
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("periodic", [True, False])
def test_mesh_accel_sorted_matches_mesh_accel(periodic):
    pos, mass, _, dom, spec, wd = _state(periodic, seed=2)
    cfg = SPHConfig(dim=3, gravity=True, grav_solver="p3m", G=1.7,
                    grav_mesh=M)
    plan = pm_sorted.plan_mesh(spec, M)
    mass_s = win.gather_sorted(mass, wd)
    got_s, dropped = pm.mesh_accel_sorted(wd.pos_s, mass_s, wd.is_real, cfg,
                                          dom, plan)
    want = pm.mesh_accel(pos, mass, cfg, dom)
    assert int(dropped) == 0
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(np.asarray(got_s[wd.inv]), np.asarray(want),
                               rtol=1e-10, atol=1e-10 * scale)


def test_fallback_is_exact_under_tiny_bricks():
    """Force most rows through the packed fallback (brick too small to
    hold a program's span) — the result must still be exact and the
    fallback capacity generous enough that nothing drops."""
    pos, mass, _, dom, spec, wd = _state(True, seed=3)
    plan = dataclasses.replace(pm_sorted.plan_mesh(spec, M), Bx=3, By=3)
    w = jnp.where(wd.is_real, win.gather_sorted(mass, wd), 0.0)
    got, dropped = pm_sorted.deposit_sorted(wd.pos_s, w, dom, M, True, plan)
    lo, cell = dom.lo, dom.extent / M
    want = pm._deposit(dom.wrap(pos), mass, lo, cell, M, True)
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12 * float(mass.sum()))


def test_dropped_counts_capacity_overflow():
    pos, mass, _, dom, spec, wd = _state(True, seed=4)
    plan = dataclasses.replace(pm_sorted.plan_mesh(spec, M), Bx=3, By=3,
                               cap=128)
    w = jnp.where(wd.is_real, win.gather_sorted(mass, wd), 0.0)
    _, dropped = pm_sorted.deposit_sorted(wd.pos_s, w, dom, M, True, plan)
    assert int(dropped) > 0
