"""Compacted-candidate walk vs the in-place window walk — exact pair set.

Round-4 over-read attack (BASELINE.md round-4): when spec.cwidth > 0,
window.build additionally emits per-row-group COMPACTED candidate lists
(the clipped segment runs concatenated — window.build docstring), and the
Pallas kernels walk a gathered candidate buffer instead of the in-place
sorted windows (pallas_kernels._compact_view). Compaction must be a pure
re-ordering of the same pair sums: these tests pin the compact Pallas
path against the dense engine at x64 roundoff (the same 1e-10 bar as
test_window_vs_dense — proof that the clipping drops no pair and the
padding entries contribute nothing).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sphax import box, make_state
from sphax.neighbors import window as win
from sphax.physics import dense, wengine
from tests.parity.test_dense_vs_reference import make_problem
from tests.parity.test_window_vs_dense import CONFIGS


def _setup(cfg, n_side, seed=3):
    pos, vel, mass, u, h = make_problem(dim=cfg.dim, n_side=n_side, seed=seed)
    dom = box(jnp.zeros(cfg.dim), jnp.ones(cfg.dim))
    state = make_state(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
                       jnp.asarray(u), jnp.asarray(h))
    return state, dom


# feature paths through the compact walk: adaptive+balsara (kernel A fused
# sums + Newton), fixed_h, gravity short-range fusion rides the same buffer
_DEFAULT = ("balsara", "fixed_h")


@pytest.mark.parametrize("name,rgroups", [
    # compaction is OFF by default (measured null, BASELINE.md round-4):
    # one default parity gate; the rest ride the slow tier (round-5 diet)
    ("fixed_h", 1),
    pytest.param("balsara", 2, marks=pytest.mark.slow),
    pytest.param("gradh", 2, marks=pytest.mark.slow),
    pytest.param("dim2", 1, marks=pytest.mark.slow),
    pytest.param("balsara", 4, marks=pytest.mark.slow)])
def test_compact_pallas_agrees_with_dense(name, rgroups):
    cfg = CONFIGS[name]
    n_side = 12 if cfg.dim == 2 else 8
    state, dom = _setup(cfg, n_side)
    spec = win.plan_compact(state.pos, dom, h_max=float(state.h.max()) * 1.25,
                            dim=cfg.dim, fast_sub=2, rgroups=rgroups)
    assert spec.cwidth > 0
    assert int(wengine.overflow_count(state, dom, spec)) == 0

    a = dense.update_derived(state, cfg, dom, block=64)
    b = wengine.update_derived(state, cfg, dom, spec, use_pallas=True)

    rtol = 1e-10
    np.testing.assert_allclose(np.asarray(b.h), np.asarray(a.h), rtol=rtol)
    np.testing.assert_allclose(np.asarray(b.rho), np.asarray(a.rho),
                               rtol=rtol)
    np.testing.assert_allclose(np.asarray(b.omega), np.asarray(a.omega),
                               rtol=rtol)
    scale = float(jnp.max(jnp.abs(a.acc)))
    np.testing.assert_allclose(np.asarray(b.acc), np.asarray(a.acc),
                               rtol=rtol, atol=rtol * scale)
    uscale = float(jnp.max(jnp.abs(a.du_dt))) + 1e-30
    np.testing.assert_allclose(np.asarray(b.du_dt), np.asarray(a.du_dt),
                               rtol=rtol, atol=rtol * uscale)


def test_compact_candidate_lists_exact():
    """Structural gate: each group's compacted list must contain EXACTLY
    the union of its (deduplicated) segment ranges — every true neighbor
    of every active row, no duplicates, padding past c_n only."""
    cfg = CONFIGS["balsara"]
    state, dom = _setup(cfg, 8)
    spec = win.plan_compact(state.pos, dom, h_max=float(state.h.max()) * 1.25,
                            dim=3, fast_sub=2, rgroups=2)
    wd = jax.jit(win.build, static_argnums=2)(state.pos, dom, spec)
    assert int(wd.overflow) == 0

    pos_s = np.asarray(wd.pos_s)
    real = np.asarray(wd.is_real)
    c_idx = np.asarray(wd.c_idx)
    c_n = np.asarray(wd.c_n)
    Tg = spec.group
    cutoff = spec.cutoff
    rng = np.random.default_rng(0)
    for g in rng.choice(len(c_n), size=12, replace=False):
        lst = c_idx[g, :c_n[g]]
        # no duplicates
        assert len(np.unique(lst)) == len(lst)
        # contains every sorted row within cutoff of every REAL row of the
        # group (the exactness contract)
        rows = np.arange(g * Tg, (g + 1) * Tg)
        rows = rows[real[rows]]
        if len(rows) == 0:
            continue
        d = np.linalg.norm(pos_s[rows][:, None, :] - pos_s[None, :, :],
                           axis=-1)
        need = np.unique(np.nonzero((d <= cutoff) & real[None, :])[1])
        missing = np.setdiff1d(need, lst)
        assert missing.size == 0, (g, missing[:10])


def test_compact_overflow_counter():
    """A cwidth below the true requirement must be COUNTED, not silent."""
    cfg = CONFIGS["fixed_h"]
    state, dom = _setup(cfg, 8)
    spec = win.plan_compact(state.pos, dom, h_max=float(state.h.max()) * 1.25,
                            dim=3, fast_sub=2)
    wd = jax.jit(win.build, static_argnums=2)(state.pos, dom, spec)
    assert int(wd.overflow) == 0
    small = dataclasses.replace(spec, cwidth=128)
    assert int(wd.c_max) > 128, "probe problem too small to pin overflow"
    wd2 = jax.jit(win.build, static_argnums=2)(state.pos, dom, small)
    assert int(wd2.overflow) > 0
