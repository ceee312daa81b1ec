"""h_predict gates on the real chip (fp32), completing the CPU-side
lockstep/cap/trash/config gates in tests/unit/test_h_predict.py.

Two gates, two paths:

- Sod shock L1 (physics accuracy): runs the TPU **jnp** window path.
  The Sod tube's 8:1 density contrast makes this geometry structurally
  incompatible with the Mosaic walk at ANY resolution: pencil-boundary-
  crossing row groups span whole ghost pencils, whose row count
  (rho_dense * cutoff^2 * L_fast ~ 2300) is resolution-invariant (both
  cutoff ~ dl and rho ~ dl^-3 scale it out) and exceeds the 1536-row
  Pallas VMEM segment cap. The predictor logic (continuity dh/dt + one
  lagged Newton correction, wengine.stage_density) is shared verbatim by
  the jnp and Pallas paths, so the PHYSICS gate is path-independent; the
  x64 interpret walk on the 1-core CPU box costs ~1 h, while this fp32
  jnp run takes seconds on-chip.
- Mosaic lockstep (shipped-path consistency): the production bench path
  (use_pallas=True, fast_sub=3, rgroups=2 — bench.py BENCH_HPRED=1) on a
  uniform-density turbulence box, h/rho/dt drift vs full Newton pinned to
  the same bounds as the CPU interpret lockstep.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import sphax
from sphax.diag import riemann
from sphax.ics import sod, turbulence
from sphax.neighbors import window as win
from sphax.physics import wengine


def test_h_predict_sod_l1_not_degraded_on_chip():
    """Shock-accuracy gate: the predictor may not cost more than 15% of
    the full-Newton L1(rho) error vs the exact Riemann solution, and its
    h-consistency residual must stay inside the bench gate (5e-3)."""
    base = sphax.SPHConfig(dim=3, gamma=1.4, adaptive_h=True, balsara=True,
                           newton_iters=6)
    pred = dataclasses.replace(base, h_predict=True, newton_iters=1)
    ic = sod.build(nx_left=16, n_trans=16)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    dom = sphax.box(jnp.zeros(3, jnp.float32), f32(ic["box"]))
    st0 = sphax.make_state(*(f32(ic[k]) for k in
                             ("pos", "vel", "mass", "u", "h")))
    spec = win.plan_measured(st0.pos, dom, h_max=float(st0.h.max()) * 1.25,
                             dim=3, cutoff_scale=1.1)

    def l1_of(cfg, nsteps=64):
        st = wengine.update_derived(st0, cfg, dom, spec, use_pallas=False)
        st, _, dts, ovf = wengine.simulate(st, cfg, dom, spec, nsteps,
                                           rebuild_every=2,
                                           use_pallas=False)
        assert int(ovf) == 0
        t = float(jnp.sum(dts))
        x = np.asarray(st.pos[:, 0])
        rho = np.asarray(st.rho)
        assert np.isfinite(rho).all()
        sel = (x > 0.2) & (x < 0.85)
        rho_exact, _, _ = riemann.sod_solution(x[sel], t)
        l1 = float(np.mean(np.abs(rho[sel] - rho_exact)))
        res = float(np.max(jnp.abs(
            st.rho - st.mass * (cfg.eta / st.h) ** 3) / st.rho))
        return l1, res

    l1_newton, _ = l1_of(base)
    l1_pred, res_pred = l1_of(pred)
    assert l1_newton < 0.06, l1_newton
    assert l1_pred < 1.15 * l1_newton + 1e-4, (l1_pred, l1_newton)
    assert res_pred < 5e-3, res_pred


def test_h_predict_mosaic_lockstep_vs_full_newton():
    """The shipped Mosaic path (production window knobs) must track the
    full-Newton Mosaic run within the CPU lockstep bounds."""
    base = dataclasses.replace(sphax.configs.TURB, newton_iters=6)
    pred = dataclasses.replace(base, h_predict=True, newton_iters=1)
    ic = turbulence.build(n_side=16)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    dom = sphax.box(jnp.zeros(3, jnp.float32), f32(ic["box"]))
    st = sphax.make_state(*(f32(ic[k]) for k in
                            ("pos", "vel", "mass", "u", "h")))
    st = st._replace(vel=0.3 * jax.random.normal(
        jax.random.PRNGKey(0), st.vel.shape, jnp.float32))
    spec = win.plan_measured(st.pos, dom, h_max=float(st.h.max()) * 1.3,
                             dim=3, cutoff_scale=1.05, fast_sub=3,
                             rgroups=2)
    st = wengine.update_derived(st, base, dom, spec, use_pallas=True)

    nsteps = 30
    st_n, _, dts_n, ovf_n = wengine.simulate(
        st, base, dom, spec, nsteps, rebuild_every=2, use_pallas=True)
    st_p, _, dts_p, ovf_p = wengine.simulate(
        st, pred, dom, spec, nsteps, rebuild_every=2, use_pallas=True)

    assert int(ovf_n) == 0 and int(ovf_p) == 0
    h_n, h_p = np.asarray(st_n.h), np.asarray(st_p.h)
    dh = np.max(np.abs(h_p - h_n) / h_n)
    assert dh < 3e-3, f"h drift vs full Newton: {dh}"
    drho = np.max(np.abs(np.asarray(st_p.rho) - np.asarray(st_n.rho))
                  / np.asarray(st_n.rho))
    assert drho < 1e-2, f"rho drift vs full Newton: {drho}"
    np.testing.assert_allclose(np.asarray(dts_p), np.asarray(dts_n),
                               rtol=2e-3)
    res = np.max(np.abs(np.asarray(st_p.rho) - np.asarray(st_p.mass)
                        * (pred.eta / h_p) ** 3) / np.asarray(st_p.rho))
    assert res < 5e-3, f"consistency residual {res}"
