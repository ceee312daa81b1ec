"""Drift-gated (adaptive) window rebuilds for the global-dt production loop
(wengine.simulate(adaptive_rebuild=K)).

The contract is the same as the rungs variant (tests/unit/test_rungs.py):
adaptive cadence changes WHEN the window structure is rebuilt, never the
pair set — under the Verlet-skin contract every live structure's candidate
set is a superset of the true neighbor set, so the adaptive trajectory must
match the fixed-cadence one to summation-order roundoff while taking
measurably fewer builds. A drift gate firing too late would delete pairs
and show up as an O(1) rho/force error, far above the tolerance. Driving
is exercised too: the OU update consumes dt (identical in both schemes) and
the drive kick lands AFTER the drift, so it cannot perturb the gate's
exact end-of-drift displacement.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import sphax
from sphax.ics import turbulence
from sphax.neighbors import window as win
from sphax.physics import driving, wengine


def _setup(cfg, n_side=10, vel_seed=0):
    ic = turbulence.build(n_side=n_side)
    dom = sphax.box(jnp.zeros(3), jnp.asarray(ic["box"]))
    st = sphax.make_state(*(jnp.asarray(ic[k]) for k in
                            ("pos", "vel", "mass", "u", "h")))
    st = st._replace(vel=0.1 * jax.random.normal(
        jax.random.PRNGKey(vel_seed), st.vel.shape, st.pos.dtype))
    spec = win.plan_measured(st.pos, dom, h_max=float(st.h.max()) * 1.3,
                             dim=3, cutoff_scale=1.25)
    st = wengine.update_derived(st, cfg, dom, spec, use_pallas=False)
    return st, dom, spec


def test_adaptive_rebuild_matches_fixed():
    cfg = dataclasses.replace(sphax.configs.TURB, newton_iters=2)
    st, dom, spec = _setup(cfg)
    from sphax.run import DriveSpec

    modes = tuple(map(tuple, driving.make_modes(1, 2).astype(int)))
    dspec = DriveSpec(modes=modes, tau=0.5, accel_rms=0.5,
                      box_size=float(dom.hi[0]))
    dr = driving.DriveState(jnp.zeros((len(modes), 3), st.pos.dtype),
                            jnp.zeros((len(modes), 3), st.pos.dtype),
                            jax.random.PRNGKey(3))

    nsteps = 6
    ref, drv_f, dts_f, ovf_f = wengine.simulate(
        st, cfg, dom, spec, nsteps, rebuild_every=1, use_pallas=False,
        drive=dr, drive_spec=dspec)
    st_a, drv_a, dts_a, ovf_a = wengine.simulate(
        st, cfg, dom, spec, nsteps, use_pallas=False,
        drive=dr, drive_spec=dspec, adaptive_rebuild=nsteps)

    assert int(ovf_f) == 0 and int(ovf_a) == 0
    np.testing.assert_allclose(np.asarray(dts_a), np.asarray(dts_f),
                               rtol=1e-9)
    for f in ("pos", "vel", "u", "rho", "h", "P"):
        np.testing.assert_allclose(np.asarray(getattr(st_a, f)),
                                   np.asarray(getattr(ref, f)),
                                   rtol=1e-6, atol=1e-9, err_msg=f)
    np.testing.assert_allclose(np.asarray(drv_a.amp_re),
                               np.asarray(drv_f.amp_re),
                               rtol=1e-8, atol=1e-12)


def test_adaptive_gate_forces_rebuild_under_drift():
    """With hot velocities and a tight skin the gate must fire (the
    staleness cap alone would let the structure go stale); overflow stays
    zero and the run stays finite — i.e. the gate keeps the Verlet-skin
    contract that the fixed cadence enforces statically."""
    cfg = dataclasses.replace(sphax.configs.TURB, newton_iters=2)
    st, dom, spec = _setup(cfg, vel_seed=4)
    st = st._replace(vel=5.0 * st.vel)   # hot: drift spends the skin fast

    nsteps = 8
    st_a, _, dts_a, ovf_a = wengine.simulate(
        st, cfg, dom, spec, nsteps, use_pallas=False,
        adaptive_rebuild=10_000)         # cap never binds; gate must
    assert int(ovf_a) == 0
    assert bool(jnp.isfinite(st_a.rho).all())
    assert bool(jnp.all(dts_a > 0))
