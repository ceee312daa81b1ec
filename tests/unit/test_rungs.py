"""Block-timestep (rung) integrator gates (integrate/rungs.py).

Three pins: (1) n_rungs=1 degenerates EXACTLY to the global-dt leapfrog
(same tick sequence, same math path — any drift means the rung plumbing
leaks into the physics); (2) a multi-rung Sedov blast actually spreads
particles across rungs and skips work (active fraction < 1) while keeping
the energy drift at the global-dt order; (3) the structure-masking helper
zeroes exactly the tiles with no active row.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sphax
from sphax.diag import conservation
from sphax.ics import sedov, turbulence
from sphax.integrate import rungs
from sphax.neighbors import window as win
from sphax.physics import wengine


def _setup(ic, cfg, vel_seed=None):
    dom = sphax.box(jnp.zeros(3), jnp.asarray(ic["box"]))
    st = sphax.make_state(*(jnp.asarray(ic[k]) for k in
                            ("pos", "vel", "mass", "u", "h")))
    if vel_seed is not None:
        st = st._replace(vel=0.1 * jax.random.normal(
            jax.random.PRNGKey(vel_seed), st.vel.shape, st.pos.dtype))
    spec = win.plan_measured(st.pos, dom, h_max=float(st.h.max()) * 1.3,
                             dim=3, cutoff_scale=1.25)
    st = wengine.update_derived(st, cfg, dom, spec, use_pallas=False)
    return st, dom, spec


def test_rungs_b1_matches_global_dt():
    """n_rungs=1: every particle on rung 0, spans of one tick — the exact
    global-dt KDK sequence. Trajectories must agree to float roundoff."""
    cfg = dataclasses.replace(sphax.configs.TURB, newton_iters=2)
    ic = turbulence.build(n_side=10)
    st, dom, spec = _setup(ic, cfg, vel_seed=0)

    nsteps = 4
    st_g, _, dts_g, ovf_g = wengine.simulate(
        st, cfg, dom, spec, nsteps, rebuild_every=1, use_pallas=False)
    st_r, dts_r, nact, ovf_r, viol, _ = rungs.simulate_rungs(
        st, cfg, dom, spec, nspans=nsteps, n_rungs=1, rebuild_every=1,
        use_pallas=False)

    assert int(ovf_g) == 0 and int(ovf_r) == 0
    assert int(viol) == 0
    np.testing.assert_allclose(np.asarray(dts_r), np.asarray(dts_g),
                               rtol=1e-12)
    assert np.all(np.asarray(nact) == st.n)
    for f in ("pos", "vel", "u", "rho", "h", "P"):
        np.testing.assert_allclose(np.asarray(getattr(st_r, f)),
                                   np.asarray(getattr(st_g, f)),
                                   rtol=1e-9, atol=1e-12, err_msg=f)


@pytest.mark.slow  # ~2 min x64 blast run; the on-chip twin
# (tpu_tests/test_tpu_rungs.py::test_rungs_sedov_multirung_on_chip) keeps a
# default multi-rung gate, and the B=1 exactness pin below always runs
def test_rungs_sedov_multirung():
    """Multi-rung Sedov: the hot center closes every tick while the cold
    bulk sits on high rungs — rung spread and work saving must be real,
    with energy drift at the global-dt order."""
    cfg = dataclasses.replace(sphax.configs.SEDOV, newton_iters=2)
    ic = sedov.build(n_side=10, E=1.0)
    st, dom, spec = _setup(ic, cfg)
    e0 = float(conservation.kinetic_energy(st)
               + conservation.internal_energy(st))

    n_rungs = 3
    st_r, dts, nact, ovf, viol, _ = rungs.simulate_rungs(
        st, cfg, dom, spec, nspans=3, n_rungs=n_rungs, rebuild_every=2,
        use_pallas=False)

    assert int(ovf) == 0
    assert np.isfinite(np.asarray(st_r.rho)).all()
    assert np.isfinite(np.asarray(st_r.u)).all()
    nact = np.asarray(nact)
    # rung spread: some tick must run with far fewer than all particles
    assert nact.min() < st.n
    frac = nact.sum() / (st.n * len(nact))
    assert frac < 0.9, f"active fraction {frac:.2f} saved no work"
    # the blast front may legitimately want dt < dt_min mid-span at this
    # violence; it must stay a small minority of the closings
    assert int(viol) < 0.05 * nact.sum(), int(viol)
    # energy conservation at the global-dt order (2e-2 gate in test_sedov)
    e1 = float(conservation.kinetic_energy(st_r)
               + conservation.internal_energy(st_r))
    assert abs(e1 - e0) / e0 < 4e-2, (e0, e1)


def test_rungs_adaptive_rebuild_matches_fixed():
    """Drift-gated rebuilds change WHEN the structure is rebuilt, never the
    physics: under the Verlet-skin contract every structure's candidate set
    is a superset of the true neighbor set, so the adaptive trajectory must
    match the fixed-cadence one to summation-order roundoff — while taking
    measurably fewer builds. A missed pair (drift gate firing too late)
    would show up as an O(1) rho/force error, far above the tolerance."""
    cfg = dataclasses.replace(sphax.configs.SEDOV, newton_iters=2)
    ic = sedov.build(n_side=10, E=1.0)
    st, dom, spec = _setup(ic, cfg)

    n_rungs, nspans = 3, 2           # 2 spans x 4 ticks
    ref, dts_f, nact_f, ovf_f, viol_f, nrb_f = rungs.simulate_rungs(
        st, cfg, dom, spec, nspans=nspans, n_rungs=n_rungs,
        rebuild_every=1, use_pallas=False)
    # adaptive ignores rebuild_every (no divisibility constraint): cap 8
    # ticks of staleness, drift-gate below that
    st_a, dts_a, nact_a, ovf_a, viol_a, nrb_a = rungs.simulate_rungs(
        st, cfg, dom, spec, nspans=nspans, n_rungs=n_rungs,
        rebuild_every=3, use_pallas=False, adaptive_rebuild=8)

    assert int(ovf_f) == 0 and int(ovf_a) == 0
    # the gate must have actually skipped builds (vs 8 at cadence 1);
    # the initial build counts, so nrb >= 1
    assert 1 <= int(nrb_a) < int(nrb_f), (int(nrb_a), int(nrb_f))
    np.testing.assert_allclose(np.asarray(dts_a), np.asarray(dts_f),
                               rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(nact_a), np.asarray(nact_f))
    assert int(viol_a) == int(viol_f)
    for f in ("pos", "vel", "u", "rho", "h", "P"):
        np.testing.assert_allclose(np.asarray(getattr(st_a, f)),
                                   np.asarray(getattr(ref, f)),
                                   rtol=1e-6, atol=1e-9, err_msg=f)


def test_mask_structure_zeroes_inactive_tiles():
    cfg = dataclasses.replace(sphax.configs.TURB, newton_iters=1)
    ic = turbulence.build(n_side=12)
    st, dom, spec = _setup(ic, cfg)
    wd = jax.jit(win.build, static_argnums=2)(st.pos, dom, spec)

    # mark a single particle active
    close_m = jnp.zeros((st.n,), bool).at[st.n // 2].set(True)
    act_s = win.gather_sorted(close_m.astype(st.pos.dtype), wd) > 0.5
    wd2 = rungs.mask_structure(wd, spec, act_s)

    act_g = np.asarray(jnp.any(act_s.reshape(spec.n_groups, spec.group),
                               axis=1))
    w_nact = np.asarray(wd2.w_nact)
    assert (w_nact[~act_g] == 0).all()
    np.testing.assert_array_equal(w_nact[act_g],
                                  np.asarray(wd.w_nact)[act_g])
    # at least one group active, not all
    assert act_g.any() and not act_g.all()
