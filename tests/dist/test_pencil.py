"""2D pencil decomposition vs single-device engine (SURVEY.md C15/§3.5).

Runs on 8 fake CPU devices (tests/conftest.py) as a 2x4 mesh: two cut axes,
two-hop corner-carrying ghost exchange, per-axis migration and rebalancing
— must reproduce the single-device dense-engine run of the same ICs to fp
tolerance with zero health-counter violations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sphax import SPHConfig, box, make_state
from sphax.dist import pencil
from sphax.integrate import leapfrog
from sphax.physics import dense
from tests.dist.test_wslab import _canon_pos, _order, _problem
from tests.parity.test_dense_vs_reference import make_problem

PENCIL_CONFIGS = {
    "fixed_h": SPHConfig(dim=3, adaptive_h=False, grad_h=False),
    "gradh_balsara": SPHConfig(dim=3, adaptive_h=True, grad_h=True,
                               balsara=True, newton_iters=8),
}


def _setup_pencil(st, dom, ns0=2, ns1=4):
    mesh = pencil.make_mesh(ns0, ns1)
    spec = pencil.plan(dom, st.n, h_max=float(st.h.max()) * 1.1,
                       ns0=ns0, ns1=ns1)
    cuts0 = jnp.asarray(pencil.equal_cuts(spec.ncell0, ns0))
    cuts1 = jnp.asarray(pencil.equal_cuts(spec.ncell1, ns1))
    return mesh, spec, cuts0, cuts1


def _compare(got, ref, dom, fields=("vel", "u", "h", "rho", "P", "acc")):
    assert got.n == ref.n
    oi, oj = _order(got, dom), _order(ref, dom)
    np.testing.assert_allclose(_canon_pos(got, dom)[oi],
                               _canon_pos(ref, dom)[oj],
                               rtol=1e-8, atol=1e-8, err_msg="pos")
    for f in fields:
        a = np.asarray(getattr(got, f))[oi]
        b = np.asarray(getattr(ref, f))[oj]
        scale = np.max(np.abs(b)) + 1e-30
        np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-8 * scale,
                                   err_msg=f)


@pytest.mark.parametrize("name", [
    "fixed_h", pytest.param("gradh_balsara", marks=pytest.mark.slow)])
def test_pencil_step_matches_single_device(name):
    cfg = PENCIL_CONFIGS[name]
    assert jax.device_count() >= 8, "conftest must provide 8 fake devices"
    st, dom = _problem(cfg)

    engine = lambda s: dense.update_derived(s, cfg, dom, block=64)
    ref = engine(st)
    ref_dts = []
    for _ in range(3):
        ref, dt = leapfrog.step(ref, cfg, dom, engine, wrap=False)
        ref_dts.append(float(dt))

    # default tier runs the cheapest mesh that still exercises both cut
    # axes + corner ghosts (2x2); the slow config keeps the uneven 2x4
    ns0, ns1 = (2, 2) if name == "fixed_h" else (2, 4)
    mesh, spec, cuts0, cuts1 = _setup_pencil(st, dom, ns0=ns0, ns1=ns1)
    sh = pencil.distribute(engine(st), dom, mesh, spec, np.asarray(cuts0),
                           np.asarray(cuts1))
    mr, gdrop = pencil.make_max_run(mesh, spec)(sh, cuts0, cuts1, dom)
    assert int(gdrop) == 0
    spec = pencil.refine_wseg(spec, int(mr))
    step = pencil.make_step(mesh, cfg, spec)
    dts = []
    for _ in range(3):
        sh, dt, health = step(sh, cuts0, cuts1, dom)
        assert int(health[0]) == 0, "ghosts dropped"
        assert int(health[1]) == 0, "window overflow"
        dts.append(float(dt))

    np.testing.assert_allclose(dts, ref_dts, rtol=1e-10)
    _compare(pencil.gather_real(sh), ref, dom)


@pytest.mark.slow
def test_pencil_chunk_reuse_matches_single_device():
    """make_chunk with rebuild_every=2: two-hop routes + window structure
    reused across steps must still match the per-step-rebuilt single-device
    run exactly (corner ghosts included)."""
    cfg = SPHConfig(dim=3, isothermal=True, cs_iso=1.5, adaptive_h=True,
                    newton_iters=8)
    st, dom = _problem(cfg)

    engine = lambda s: dense.update_derived(s, cfg, dom, block=64)
    ref = engine(st)
    ref_dts = []
    for _ in range(4):
        ref, dt = leapfrog.step(ref, cfg, dom, engine, wrap=False)
        ref_dts.append(float(dt))

    mesh, spec, cuts0, cuts1 = _setup_pencil(st, dom)
    sh = pencil.distribute(engine(st), dom, mesh, spec, np.asarray(cuts0),
                           np.asarray(cuts1))
    mr, _ = pencil.make_max_run(mesh, spec)(sh, cuts0, cuts1, dom)
    spec = pencil.refine_wseg(spec, int(mr))
    chunk = pencil.make_chunk(mesh, cfg, spec, nsteps=4, rebuild_every=2)
    sh, dts, health = chunk(sh, cuts0, cuts1, dom)
    assert int(health[0]) == 0, "ghosts dropped"
    assert int(health[1]) == 0, "window overflow"
    np.testing.assert_allclose(np.asarray(dts), ref_dts, rtol=1e-10)
    _compare(pencil.gather_real(sh), ref, dom)


def test_pencil_p3m_gravity_matches_single_device():
    """Periodic distributed P3M on the 2D mesh with the production
    sorted-mesh CIC (brick-matmul deposit/interp over the sorted rows,
    owner-local deposit mask, grid psum over BOTH mesh axes, periodic
    margin fold) == the single-device dense-engine P3M. pm_sorted is plain
    jnp, so the CPU mesh pins the exact production math."""
    cfg = SPHConfig(dim=3, adaptive_h=False, grad_h=False,
                    gravity=True, G=1.3, grav_eps=0.004,
                    grav_solver="p3m", grav_mesh=32, grav_rs_cells=2.0)
    st, dom = _problem(cfg)

    engine = lambda s: dense.update_derived(s, cfg, dom, block=64)
    ref = engine(st)
    for _ in range(2):
        ref, _ = leapfrog.step(ref, cfg, dom, engine, wrap=False)

    mesh, spec, cuts0, cuts1 = _setup_pencil(st, dom, ns0=2, ns1=2)
    sh = pencil.distribute(engine(st), dom, mesh, spec, np.asarray(cuts0),
                           np.asarray(cuts1))
    mr, gdrop = pencil.make_max_run(mesh, spec)(sh, cuts0, cuts1, dom)
    assert int(gdrop) == 0
    spec = pencil.refine_wseg(spec, int(mr))
    step = pencil.make_step(mesh, cfg, spec, sorted_mesh=True)
    for _ in range(2):
        sh, dt, health = step(sh, cuts0, cuts1, dom)
        assert int(health[0]) == 0, "ghosts dropped"
        assert int(health[1]) == 0, "structure/mesh-fallback overflow"

    got = pencil.gather_real(sh)
    oi, oj = _order(got, dom), _order(ref, dom)
    for f in ("pos", "vel", "rho", "acc"):
        a = np.asarray(getattr(got, f))[oi]
        b = np.asarray(getattr(ref, f))[oj]
        scale = np.max(np.abs(b)) + 1e-30
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3 * scale,
                                   err_msg=f)


def test_pencil_migrate_and_rebalance():
    """Clustered ICs: per-axis quantile cuts must cap the count imbalance,
    and repeated migrate passes must drive the misplaced count to zero
    without dropping anyone (multi-hop movers converge)."""
    cfg = PENCIL_CONFIGS["fixed_h"]
    # n_side=20 -> ~6 global cells per axis, so quantile cuts can actually
    # move (at 4 cells the margin/res_max clamps pin every legal cut and
    # the test premise collapses)
    pos, vel, mass, u, h = make_problem(dim=3, n_side=20, seed=7,
                                        vel_scale=0.0)
    # cluster along BOTH cut axes: squash into one corner
    pos = np.asarray(pos)
    pos[:, 0] = pos[:, 0] ** 2.5
    pos[:, 1] = pos[:, 1] ** 2.5
    dom = box(jnp.zeros(3), jnp.ones(3))
    st = make_state(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
                    jnp.asarray(u), jnp.asarray(h))

    ns0, ns1 = 2, 2
    mesh = pencil.make_mesh(ns0, ns1)
    spec = pencil.plan(dom, st.n, h_max=float(st.h.max()) * 1.1,
                       ns0=ns0, ns1=ns1, balance_headroom=1.9,
                       pad_factor=2.6)
    h0, h1 = np.histogram(pos[:, 0] * spec.ncell0, bins=np.arange(
        spec.ncell0 + 1))[0], np.histogram(
        pos[:, 1] * spec.ncell1, bins=np.arange(spec.ncell1 + 1))[0]
    cuts0, cuts1 = pencil.rebalance(h0, h1, spec)
    sh = pencil.distribute(st, dom, mesh, spec, cuts0, cuts1)

    # histogram from the sharded state must match the host-side one
    gh0, gh1 = pencil.make_histograms(mesh, spec)(sh, dom)
    np.testing.assert_array_equal(np.asarray(gh0), h0)
    np.testing.assert_array_equal(np.asarray(gh1), h1)

    # count balance under the rebalanced cuts: no pencil > 2.5x fair share
    counts = []
    for s0 in range(ns0):
        for s1 in range(ns1):
            inx = (np.searchsorted(cuts0[1:ns0], np.clip(
                (pos[:, 0] * spec.ncell0).astype(int), 0,
                spec.ncell0 - 1), side="right") == s0)
            iny = (np.searchsorted(cuts1[1:ns1], np.clip(
                (pos[:, 1] * spec.ncell1).astype(int), 0,
                spec.ncell1 - 1), side="right") == s1)
            counts.append(int(np.sum(inx & iny)))
    fair = st.n / (ns0 * ns1)
    assert max(counts) / fair < 2.5, counts

    # now move the cuts (equal cuts) and migrate until converged
    cuts0e = jnp.asarray(pencil.equal_cuts(spec.ncell0, ns0))
    cuts1e = jnp.asarray(pencil.equal_cuts(spec.ncell1, ns1))
    migrate = pencil.make_migrate(mesh, spec)
    misplaced = pencil.make_misplaced(mesh, spec)
    assert int(misplaced(sh, cuts0e, cuts1e, dom)) > 0
    for _ in range(max(ns0, ns1)):
        sh, dropped = migrate(sh, cuts0e, cuts1e, dom)
        assert int(dropped) == 0
        if int(misplaced(sh, cuts0e, cuts1e, dom)) == 0:
            break
    assert int(misplaced(sh, cuts0e, cuts1e, dom)) == 0

    got = pencil.gather_real(sh)
    assert got.n == st.n
    oi = _order(got, dom)
    oj = _order(st, dom)
    np.testing.assert_allclose(_canon_pos(got, dom)[oi],
                               _canon_pos(st, dom)[oj], rtol=1e-12)
