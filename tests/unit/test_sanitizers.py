"""NaN-sanitizer test mode (SURVEY.md §5 'race detection/sanitizers').

The jit functional model rules out data races by construction; the real
hazards are silent NaN production (bad guards, 0/0 in padded slots) and
out-of-bounds neighbor structure reads. Running a representative derived
pass of EVERY engine under ``jax_debug_nans`` turns any NaN produced
anywhere inside the traced computation into a hard error at the exact
primitive — the promised sanitizer tier. Pads/ghosts/trash rows flow
through the same code, so their guard floors (1e-15 etc.) are exercised.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sphax import SPHConfig, box, make_state
from sphax.integrate import leapfrog
from sphax.neighbors import window as win
from sphax.neighbors.cell_list import choose_grid
from sphax.physics import clist, dense, wengine


@pytest.fixture
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    yield
    jax.config.update("jax_debug_nans", False)


def _state(n_side=8, seed=12):
    rng = np.random.default_rng(seed)
    pos = (np.mgrid[0:n_side, 0:n_side, 0:n_side].reshape(3, -1).T
           + 0.5) / n_side
    pos = np.mod(pos + 0.02 * rng.standard_normal(pos.shape), 1.0)
    n = len(pos)
    st = make_state(jnp.asarray(pos),
                    jnp.asarray(0.3 * rng.standard_normal((n, 3))),
                    jnp.full((n,), 1.0 / n), jnp.ones((n,)),
                    jnp.full((n,), 1.3 / n_side))
    return st, box(jnp.zeros(3), jnp.ones(3))


CFG = SPHConfig(dim=3, adaptive_h=True, newton_iters=4, grad_h=True,
                balsara=True, mm_visc=True)


def test_production_engine_nan_clean_under_debug_nans(debug_nans):
    """Default tier: the PRODUCTION window engine (guard floors, pads,
    ghosts, trash rows) + one KDK step of the dense engine under the
    sanitizer. The full every-engine sweep is the slow-tier twin below
    (each engine recompiles from scratch under jax_debug_nans, which made
    the combined test the single most expensive unit test)."""
    st, dom = _state()
    spec = win.plan_windows(dom, h_max=float(st.h.max()) * 1.3, n=st.n,
                            dim=3)
    outw = wengine.update_derived(st, CFG, dom, spec,
                                  tile_block=32)
    assert bool(jnp.isfinite(outw.rho).all())
    # tile_block=32, no KDK step: under jax_debug_nans per-op dispatch
    # dominates, so fewer/larger walk ops win (4 -> 32 measured 319 -> 243 s
    # on this box) and the leapfrog wrapper would recompile the whole
    # derived graph a second time for ~no new guard coverage — the slow
    # twin below keeps a full KDK step under the sanitizer


@pytest.mark.slow
def test_engines_nan_clean_under_debug_nans(debug_nans):
    st, dom = _state()
    out = dense.update_derived(st, CFG, dom, block=64)
    st2, _ = leapfrog.step(out, CFG, dom,
                           lambda s: dense.update_derived(s, CFG, dom,
                                                          block=64))
    assert bool(jnp.isfinite(st2.rho).all())

    grid = choose_grid(dom, h_max=float(st.h.max()) * 1.3, n=st.n)
    outc = clist.update_derived(st, CFG, dom, grid)
    assert bool(jnp.isfinite(outc.rho).all())

    spec = win.plan_windows(dom, h_max=float(st.h.max()) * 1.3, n=st.n,
                            dim=3)
    outw = wengine.update_derived(st, CFG, dom, spec,
                                  tile_block=32)
    assert bool(jnp.isfinite(outw.rho).all())


def test_debug_nans_actually_fires(debug_nans):
    """The sanitizer itself must work: an injected 0/0 raises."""
    @jax.jit
    def bad(x):
        return x / x

    with pytest.raises(FloatingPointError):
        float(bad(jnp.zeros(4))[0])
