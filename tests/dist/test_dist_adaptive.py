"""Distributed drift-gated (adaptive) window rebuilds, wslab + wrungs
(round-4 judge Next #4).

Contract (same as the single-chip twins, tests/unit/test_wengine_adaptive.py
and test_rungs.py): adaptive cadence changes WHEN the exchange+build bundle
runs, never the pair set — the gate scalar is pmax'd over the mesh axis so
every shard rebuilds together, and under the Verlet-skin contract every
live structure's candidate set is a superset of the true neighbor set. The
adaptive trajectory must therefore match the fixed-cadence distributed
trajectory to summation-order roundoff while reporting its build count.
A gate firing too late deletes pairs = an O(1) rho/force error, far above
the tolerance.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import sphax
from sphax.dist import wrungs, wslab
from sphax.integrate import rungs
from tests.dist.test_rungs_dist import _compare, _dist_setup, _setup


def test_wslab_adaptive_matches_fixed():
    assert jax.device_count() >= 2, "conftest must provide fake devices"
    cfg = dataclasses.replace(sphax.configs.SEDOV, newton_iters=2,
                              balsara=True)
    st, dom, _ = _setup(cfg, n_side=12)
    mesh, spec, cuts, sh = _dist_setup(st, dom, n_shards=2)

    nsteps = 4
    chunk_f = wslab.make_chunk(mesh, cfg, spec, nsteps=nsteps,
                               rebuild_every=1, use_pallas=False)
    sh_f, dts_f, health_f = chunk_f(sh, cuts, dom)
    assert int(health_f[0]) == 0 and int(health_f[1]) == 0

    chunk_a = wslab.make_chunk(mesh, cfg, spec, nsteps=nsteps,
                               use_pallas=False, adaptive_rebuild=nsteps)
    sh_a, dts_a, health_a, nrb = chunk_a(sh, cuts, dom)
    assert int(health_a[0]) == 0 and int(health_a[1]) == 0
    # fewer builds than every-step cadence, at least the initial one
    assert 1 <= int(nrb) <= nsteps
    np.testing.assert_allclose(np.asarray(dts_a), np.asarray(dts_f),
                               rtol=1e-12)
    _compare(wslab.gather_real(sh_a), wslab.gather_real(sh_f), dom,
             rtol=1e-9)


def test_wrungs_adaptive_matches_fixed():
    assert jax.device_count() >= 2, "conftest must provide fake devices"
    cfg = dataclasses.replace(sphax.configs.SEDOV, newton_iters=2)
    st, dom, spec1 = _setup(cfg)
    mesh, spec, cuts, sh = _dist_setup(st, dom, n_shards=2)

    n_rungs, nspans = 3, 1
    span = 1 << (n_rungs - 1)
    chunk_f = wrungs.make_chunk_rungs(mesh, cfg, spec, nspans=nspans,
                                      n_rungs=n_rungs, rebuild_every=1,
                                      use_pallas=False)
    sh_f, dts_f, nact_f, health_f, viol_f = chunk_f(sh, cuts, dom)
    assert int(health_f[0]) == 0 and int(health_f[1]) == 0
    # the blast must actually spread rungs for this to test anything
    assert np.asarray(nact_f).min() < st.n

    chunk_a = wrungs.make_chunk_rungs(mesh, cfg, spec, nspans=nspans,
                                      n_rungs=n_rungs, use_pallas=False,
                                      adaptive_rebuild=nspans * span)
    sh_a, dts_a, nact_a, health_a, viol_a, nrb = chunk_a(sh, cuts, dom)
    assert int(health_a[0]) == 0 and int(health_a[1]) == 0
    assert 1 <= int(nrb) <= nspans * span
    np.testing.assert_allclose(np.asarray(dts_a), np.asarray(dts_f),
                               rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(nact_a), np.asarray(nact_f))
    assert int(viol_a) == int(viol_f)
    _compare(wslab.gather_real(sh_a), wslab.gather_real(sh_f), dom,
             rtol=1e-9)


def test_wrungs_adaptive_matches_single_chip_adaptive():
    """The distributed adaptive rung chunk must track the single-chip
    adaptive rung integrator tick-for-tick: same tick schedule, closing
    counts, violations, physics. (Build TIMES may differ — the dist plan
    derives its own cutoff, so the two gates spend different skins — but
    by the superset argument that cannot move the trajectory.)"""
    assert jax.device_count() >= 2, "conftest must provide fake devices"
    cfg = dataclasses.replace(sphax.configs.SEDOV, newton_iters=2)
    st, dom, spec1 = _setup(cfg)

    n_rungs, nspans = 3, 2
    span = 1 << (n_rungs - 1)
    ref, dts_1, nact_1, ovf, viol_1, nrb_1 = rungs.simulate_rungs(
        st, cfg, dom, spec1, nspans=nspans, n_rungs=n_rungs,
        use_pallas=False, adaptive_rebuild=nspans * span)
    assert int(ovf) == 0

    mesh, spec, cuts, sh = _dist_setup(st, dom, n_shards=2)
    chunk = wrungs.make_chunk_rungs(mesh, cfg, spec, nspans=nspans,
                                    n_rungs=n_rungs, use_pallas=False,
                                    adaptive_rebuild=nspans * span)
    sh, dts_2, nact_2, health, viol_2, nrb_2 = chunk(sh, cuts, dom)
    assert int(health[0]) == 0 and int(health[1]) == 0
    np.testing.assert_allclose(np.asarray(dts_2), np.asarray(dts_1),
                               rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(nact_2), np.asarray(nact_1))
    assert int(viol_2) == int(viol_1)
    _compare(wslab.gather_real(sh), ref, dom)
