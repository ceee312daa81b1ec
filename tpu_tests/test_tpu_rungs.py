"""Block-timestep integrator with MOSAIC kernels on the real chip.

The rung path's tile skipping rides WindowData.{w_nact,t_nact} zeroing
(integrate/rungs.mask_structure) — the CPU tier runs it through the jnp
window pass and Pallas interpret mode only, so this is where the masked
DMA-skip + predicated-compute-skip combination first meets Mosaic. Two
gates: n_rungs=1 must reproduce the global-dt production engine at fp32
tolerances, and a multi-rung Sedov blast must actually skip work while
conserving energy.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import sphax
from sphax.integrate import rungs
from sphax.neighbors import window as win
from sphax.physics import wengine

RTOL = 5e-5  # fp32 on-chip, different masking/summation orders


def _setup(ic, cfg, vel_seed=None, h_margin=1.15, cutoff_scale=1.2):
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    dom = sphax.box(jnp.zeros(3, jnp.float32), f32(ic["box"]))
    st = sphax.make_state(*(f32(ic[k]) for k in
                            ("pos", "vel", "mass", "u", "h")))
    if vel_seed is not None:
        st = st._replace(vel=0.3 * jax.random.normal(
            jax.random.PRNGKey(vel_seed), st.vel.shape, jnp.float32))
    spec = win.plan_measured(st.pos, dom,
                             h_max=float(st.h.max()) * h_margin,
                             dim=3, cutoff_scale=cutoff_scale)
    st = wengine.update_derived(st, cfg, dom, spec, use_pallas=True)
    return st, dom, spec


def test_rungs_b1_matches_simulate_on_chip():
    from sphax.ics import turbulence

    cfg = sphax.SPHConfig(dim=3, adaptive_h=True, newton_iters=2,
                          balsara=True, isothermal=True, cs_iso=1.0)
    st, dom, spec = _setup(turbulence.build(n_side=28), cfg, vel_seed=5)

    st_g, _, dts_g, ovf_g = wengine.simulate(
        st, cfg, dom, spec, nsteps=2, rebuild_every=1, use_pallas=True)
    st_r, dts_r, nact, ovf_r, viol, _ = rungs.simulate_rungs(
        st, cfg, dom, spec, nspans=2, n_rungs=1, rebuild_every=1,
        use_pallas=True)
    assert int(ovf_g) == 0 and int(ovf_r) == 0 and int(viol) == 0
    assert np.all(np.asarray(nact) == st.n)
    np.testing.assert_allclose(np.asarray(dts_r), np.asarray(dts_g),
                               rtol=1e-6)
    for f in ("pos", "vel", "u", "rho", "h"):
        a, b = np.asarray(getattr(st_r, f)), np.asarray(getattr(st_g, f))
        np.testing.assert_allclose(a, b, rtol=RTOL, atol=1e-6, err_msg=f)


def test_rungs_sedov_multirung_on_chip():
    from sphax.diag import conservation
    from sphax.ics import sedov

    cfg = dataclasses.replace(sphax.configs.SEDOV, newton_iters=2)
    st, dom, spec = _setup(sedov.build(n_side=32, E=1.0), cfg,
                           h_margin=1.3, cutoff_scale=1.25)
    e0 = float(conservation.kinetic_energy(st)
               + conservation.internal_energy(st))

    st_r, dts, nact, ovf, viol, _ = rungs.simulate_rungs(
        st, cfg, dom, spec, nspans=2, n_rungs=4, rebuild_every=2,
        use_pallas=True)
    assert int(ovf) == 0
    assert np.isfinite(np.asarray(st_r.rho)).all()
    assert np.isfinite(np.asarray(st_r.u)).all()
    nact = np.asarray(nact)
    frac = nact.sum() / (st_r.n * len(nact))
    # a cold lattice around a point blast: the bulk must sit on high rungs
    assert frac < 0.5, f"active fraction {frac:.2f}"
    assert int(viol) < 0.05 * nact.sum()
    e1 = float(conservation.kinetic_energy(st_r)
               + conservation.internal_energy(st_r))
    assert abs(e1 - e0) / e0 < 4e-2, (e0, e1)

    # drift-gated rebuilds on the SAME problem/spec: the lax.cond-wrapped
    # win.build + Mosaic-kernel combination first meets the chip here
    # (the CPU tier pins the trajectory equivalence at f64; this pins the
    # compiled artifact at fp32 and that the gate actually skips builds)
    st_a, dts_a, nact_a, ovf_a, viol_a, nrb_a = rungs.simulate_rungs(
        st, cfg, dom, spec, nspans=2, n_rungs=4, use_pallas=True,
        adaptive_rebuild=8)
    assert int(ovf_a) == 0
    assert 1 <= int(nrb_a) < 2 * (8 // 2), int(nrb_a)
    np.testing.assert_allclose(np.asarray(dts_a), np.asarray(dts),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(nact_a), nact)
    for f in ("rho", "u"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_a, f)), np.asarray(getattr(st_r, f)),
            rtol=5e-3, atol=1e-6, err_msg=f)
