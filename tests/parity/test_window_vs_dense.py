"""Sorted-window engine vs dense engine — must agree to fp roundoff.

Same bar as the cell-list engine (SURVEY.md §4.2.2): the window structure
must find every true neighbor pair, so x64 agreement at ~1e-10 proves it.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sphax import SPHConfig, box, make_state
from sphax.neighbors import window as win
from sphax.physics import dense, wengine
from tests.parity.test_dense_vs_reference import make_problem
from tests.parity.test_dense_vs_reference import CONFIGS as _REF_CONFIGS

# Engine-vs-engine exactness holds at ANY Newton iteration count (both
# sides run the identical iteration), so the float64-convergence iters=10
# of the reference-parity CONFIGS would only inflate trace size (jnp path)
# and interpret runtime (Pallas path) here — test_dense_vs_reference keeps
# the full-depth reference gate.
CONFIGS = {k: (dataclasses.replace(c, newton_iters=2)
               if c.adaptive_h else c) for k, c in _REF_CONFIGS.items()}


def _setup(cfg, n_side, seed=3):
    pos, vel, mass, u, h = make_problem(dim=cfg.dim, n_side=n_side, seed=seed)
    dom = box(jnp.zeros(cfg.dim), jnp.ones(cfg.dim))
    state = make_state(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
                       jnp.asarray(u), jnp.asarray(h))
    return state, dom


# default tier: one config per distinct feature path through the window
# engine (fixed h / adaptive+balsara / 2D / gravity) + one fast_sub rep;
# the remaining matrix entries re-pin the same code with pricier compiles
_FAST = {("fixed_h", 1), ("balsara", 1), ("dim2", 1), ("gravity", 1),
         ("dim2", 2)}


@pytest.mark.parametrize("name,fast_sub", [
    ((name, fs) if (name, fs) in _FAST
     else pytest.param(name, fs, marks=pytest.mark.slow))
    for fs in (1, 2) for name in CONFIGS])
def test_window_engine_agrees(name, fast_sub):
    """fast_sub=2 additionally pins the fine fast-axis cells: windows span
    +-2 half-cells (= one cutoff exactly) and the extended grid carries two
    ghost-image layers per fast face."""
    cfg = CONFIGS[name]
    if fast_sub == 2 and name not in ("fixed_h", "balsara", "dim2"):
        pytest.skip("fast_sub pinned on three representative configs")
    n_side = 12 if cfg.dim == 2 else 8
    state, dom = _setup(cfg, n_side)
    spec = win.plan_windows(dom, h_max=float(state.h.max()) * 1.25,
                            n=state.n, dim=cfg.dim, fast_sub=fast_sub)
    assert int(wengine.overflow_count(state, dom, spec)) == 0

    a = dense.update_derived(state, cfg, dom, block=64)
    b = wengine.update_derived(state, cfg, dom, spec, tile_block=4)

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


def test_open_boundary():
    """Non-periodic box: no images are generated; results exact wherever the
    structure supports the adaptive h.

    At an open box's corners the local density drops ~8x, so the Newton h
    wants to exceed the structural cap (h <= cutoff/2, the window engine's
    safety bound); the dense engine has no such limit. Parity therefore
    holds exactly for all uncapped particles, and the capped set must be
    confined to the boundary layer.
    """
    cfg = SPHConfig(dim=3, adaptive_h=True, newton_iters=20)
    state, _ = _setup(cfg, 8)
    dom = box(jnp.zeros(3), jnp.ones(3), periodic=False)
    spec = win.plan_windows(dom, h_max=float(state.h.max()) * 1.25,
                            n=state.n, dim=3)
    assert sum(spec.ghost_caps) == 0
    assert int(wengine.overflow_count(state, dom, spec)) == 0
    a = dense.update_derived(state, cfg, dom, block=64)
    b = wengine.update_derived(state, cfg, dom, spec, tile_block=4)

    capped = np.asarray(b.h) >= 0.5 * spec.cutoff * (1 - 1e-6)
    pos = np.asarray(state.pos)
    edge_layer = np.any((pos < 0.25) | (pos > 0.75), axis=-1)
    assert capped.mean() < 0.35
    assert np.all(edge_layer[capped]), "capping must be a boundary effect"

    ok = ~capped
    np.testing.assert_allclose(np.asarray(b.rho)[ok], np.asarray(a.rho)[ok],
                               rtol=1e-10)
    # forces on uncapped particles can still feel capped neighbors' h; allow
    # only interior particles far from any capped neighbor for exactness
    interior = ~edge_layer
    np.testing.assert_allclose(np.asarray(b.rho)[interior],
                               np.asarray(a.rho)[interior], rtol=1e-10)


def test_overflow_detected_when_wmax_too_small():
    cfg = CONFIGS["fixed_h"]
    state, dom = _setup(cfg, 8)
    spec = win.plan_windows(dom, h_max=float(state.h.max()), n=state.n,
                            dim=3, tile=64, wseg=128, seg_safety=0.01)
    assert int(wengine.overflow_count(state, dom, spec)) > 0


@pytest.mark.parametrize("name", [
    "fixed_h", "balsara", "dim2",
    pytest.param("gradh", marks=pytest.mark.slow),
    pytest.param("isothermal", marks=pytest.mark.slow)])
def test_pallas_kernels_agree(name):
    """Pallas kernels (interpret mode on CPU) == jnp window path == dense."""
    cfg = CONFIGS[name]
    n_side = 12 if cfg.dim == 2 else 8
    state, dom = _setup(cfg, n_side)
    spec = win.plan_windows(dom, h_max=float(state.h.max()) * 1.25,
                            n=state.n, dim=cfg.dim)
    assert int(wengine.overflow_count(state, dom, spec)) == 0

    a = dense.update_derived(state, cfg, dom, block=64)
    b = wengine.update_derived(state, cfg, dom, spec, use_pallas=True)

    rtol = 1e-10
    np.testing.assert_allclose(np.asarray(b.h), np.asarray(a.h), rtol=rtol)
    np.testing.assert_allclose(np.asarray(b.rho), np.asarray(a.rho), rtol=rtol)
    np.testing.assert_allclose(np.asarray(b.omega), np.asarray(a.omega),
                               rtol=rtol)
    scale = float(jnp.max(jnp.abs(a.acc)))
    np.testing.assert_allclose(np.asarray(b.acc), np.asarray(a.acc),
                               rtol=rtol, atol=rtol * scale)
    uscale = float(jnp.max(jnp.abs(a.du_dt))) + 1e-30
    np.testing.assert_allclose(np.asarray(b.du_dt), np.asarray(a.du_dt),
                               rtol=rtol, atol=rtol * uscale)


# slow tier: the interpret-mode row-group walks re-run the FULL union
# window per group (R x the pair math of rgroups=1), so these are the
# priciest parity entries; the production rgroups=2 Mosaic path is pinned
# on-chip every tpu_tests run (test_mosaic_kernels_match_jnp_window plans
# with rgroups=2) and by the bench's h-residual/overflow asserts
@pytest.mark.slow
@pytest.mark.parametrize("rgroups", [2, 4])
@pytest.mark.parametrize("name", ["fixed_h", "balsara"])
def test_row_groups_agree(name, rgroups):
    """Per-row-group windows (rgroups > 1): each 128-row tile solves R
    groups of 128/R rows against their own tighter per-segment windows.
    Both the jnp path and the Pallas kernels (interpret mode, where the
    group windows still exercise the per-group w_lo/w_nact tables and the
    per-group dedup) must stay exact vs the dense engine."""
    cfg = CONFIGS[name]
    state, dom = _setup(cfg, 8)
    spec = win.plan_windows(dom, h_max=float(state.h.max()) * 1.25,
                            n=state.n, dim=cfg.dim, rgroups=rgroups)
    assert spec.n_groups == spec.n_tiles * rgroups
    assert int(wengine.overflow_count(state, dom, spec)) == 0

    a = dense.update_derived(state, cfg, dom, block=64)
    for use_pallas in (False, True):
        b = wengine.update_derived(state, cfg, dom, spec,
                                   use_pallas=use_pallas)
        rtol = 1e-10
        np.testing.assert_allclose(np.asarray(b.h), np.asarray(a.h),
                                   rtol=rtol)
        np.testing.assert_allclose(np.asarray(b.rho), np.asarray(a.rho),
                                   rtol=rtol)
        scale = float(jnp.max(jnp.abs(a.acc)))
        np.testing.assert_allclose(np.asarray(b.acc), np.asarray(a.acc),
                                   rtol=rtol, atol=rtol * scale)
        uscale = float(jnp.max(jnp.abs(a.du_dt))) + 1e-30
        np.testing.assert_allclose(np.asarray(b.du_dt), np.asarray(a.du_dt),
                                   rtol=rtol, atol=rtol * uscale)


def test_p3m_fused_short_range_agrees():
    """The screened P3M short-range fused into Pallas kernel C must equal
    the jnp path's separate gravity_short_pass walk: same window candidate
    set (the r <= cutoff hard cut makes the wider interpret walk and the
    tighter group walk agree exactly), same dedup, same erfc/softening
    formula (pm.short_range_factor)."""
    cfg = SPHConfig(dim=3, adaptive_h=True, newton_iters=2, gravity=True,
                    grav_solver="p3m", G=1.3, grav_eps=0.01, grav_mesh=16)
    state, dom = _setup(cfg, 8)
    spec = win.plan_windows(dom, h_max=float(state.h.max()) * 1.25,
                            n=state.n, dim=3)
    assert int(wengine.overflow_count(state, dom, spec)) == 0
    # tile_block=4: this small problem plans whole-array window segments
    # (wseg ~ n_sorted), so the jnp walk's live [TB, n_seg*wseg] x64
    # intermediates must stay cache-sized (TB=16 measured 20x slower here)
    a = wengine.update_derived(state, cfg, dom, spec, use_pallas=False,
                               tile_block=4)
    b = wengine.update_derived(state, cfg, dom, spec, use_pallas=True,
                               tile_block=4)
    scale = float(jnp.max(jnp.abs(a.acc)))
    np.testing.assert_allclose(np.asarray(b.acc), np.asarray(a.acc),
                               rtol=1e-10, atol=1e-10 * scale)
    np.testing.assert_allclose(np.asarray(b.rho), np.asarray(a.rho),
                               rtol=1e-10)


def test_pallas_gravity_matches_dense():
    """Pallas direct-sum gravity == reference gravity (BASELINE.json:10)."""
    import sphax.reference_cpu as ref
    from sphax.physics import pallas_kernels as pk

    rng = np.random.default_rng(11)
    n = 300
    pos = rng.standard_normal((n, 3)) * 0.3
    mass = rng.random(n) + 0.1
    cfg = SPHConfig(dim=3, gravity=True, G=1.7, grav_eps=0.05)
    a_ref = ref.gravity(pos, mass, cfg)  # open box: no min-image
    a_pk = pk.gravity(jnp.asarray(pos), jnp.asarray(mass), cfg)
    scale = np.abs(a_ref).max()
    np.testing.assert_allclose(np.asarray(a_pk), a_ref, rtol=1e-9,
                               atol=1e-9 * scale)
