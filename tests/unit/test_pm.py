"""P3M gravity solver gates (SURVEY.md C11 — the scalable gravity tier).

Ground truths:
* open box — the direct sum IS exact, so P3M must match it to mesh
  accuracy (~1e-2 p99 with CIC + rs = 2 cells);
* periodic box — the min-image direct sum is itself an approximation, so
  P3M is validated against a brute-force EWALD sum (erfc real-space images
  + convergent k-space lattice sum, Jeans swindle);
* Newton's third law — the mesh force is a convolution and the pair force
  is antisymmetric, so total momentum change must vanish.
"""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import erfc as np_erfc

from sphax import SPHConfig, box, make_state
from sphax.physics import clist, pm


def _cloud(n=1500, seed=5):
    rng = np.random.default_rng(seed)
    pos = np.concatenate([rng.random((n // 2, 3)),
                          np.mod(0.3 + 0.12 * rng.standard_normal(
                              (n // 2, 3)), 1.0)])
    pos = np.clip(pos, 1e-3, 1 - 1e-3)
    mass = rng.random(n) + 0.5
    return jnp.asarray(pos), jnp.asarray(mass)


CFG = SPHConfig(dim=3, gravity=True, G=1.0, grav_eps=0.004,
                grav_solver="p3m", grav_mesh=64, grav_rs_cells=2.0)


def test_p3m_open_box_matches_direct_sum():
    pos, mass = _cloud()
    dom = box(jnp.zeros(3), jnp.ones(3), periodic=False)
    a_ref = np.asarray(clist.gravity_dense(pos, mass, CFG, dom))
    a_p3m = np.asarray(pm.p3m_accel_dense(pos, mass, CFG, dom))
    rel = (np.linalg.norm(a_p3m - a_ref, axis=1)
           / np.linalg.norm(a_ref, axis=1))
    # measured rms 3.8e-3 / p99 1.6e-2 with the W^2 CIC deconvolution and
    # clip-first open-box weights (round 3); gates at ~2x measured
    assert np.sqrt(np.mean(rel ** 2)) < 7e-3, np.sqrt(np.mean(rel ** 2))
    assert np.percentile(rel, 99) < 3e-2


@pytest.mark.slow  # brute Ewald images: inherently minutes; the cheap
# open-box direct-sum + momentum + Evrard-variant gates stay default
def test_p3m_periodic_matches_brute_ewald():
    pos_j, mass_j = _cloud(n=500)
    pos, mass = np.asarray(pos_j), np.asarray(mass_j)
    n = len(pos)
    L, G = 1.0, 1.0
    rs = CFG.grav_rs_cells * L / CFG.grav_mesh

    acc = np.zeros((n, 3))
    for nx in (-1, 0, 1):
        for ny in (-1, 0, 1):
            for nz in (-1, 0, 1):
                off = np.array([nx, ny, nz]) * L
                dx = pos[:, None, :] - pos[None, :, :] + off
                r2 = np.einsum("ijk,ijk->ij", dx, dx)
                r = np.sqrt(np.maximum(r2, 1e-30))
                x = r / (2 * rs)
                S = np_erfc(x) + (r / (rs * np.sqrt(np.pi))) * np.exp(-x * x)
                f = S * (r2 + CFG.grav_eps ** 2) ** -1.5
                if nx == ny == nz == 0:
                    np.fill_diagonal(f, 0.0)
                acc -= G * np.einsum("ij,ijk->ik", f * mass[None, :], dx)
    kmax = 21
    ks = np.array([(i, j, k) for i in range(-kmax, kmax + 1)
                   for j in range(-kmax, kmax + 1)
                   for k in range(-kmax, kmax + 1)
                   if (i, j, k) != (0, 0, 0)], float) * 2 * np.pi / L
    k2 = np.einsum("kd,kd->k", ks, ks)
    coef = 4 * np.pi * G / L ** 3 * np.exp(-k2 * rs * rs) / k2
    phase = pos @ ks.T
    S_re = (np.cos(phase).T * mass).sum(1)
    S_im = (np.sin(phase).T * mass).sum(1)
    amp = (np.sin(phase) * S_re[None, :]
           - np.cos(phase) * S_im[None, :]) * coef[None, :]
    acc -= amp @ ks

    dom = box(jnp.zeros(3), jnp.ones(3))
    a_p3m = np.asarray(pm.p3m_accel_dense(pos_j, mass_j, CFG, dom))
    rel = np.linalg.norm(a_p3m - acc, axis=1) / np.linalg.norm(acc, axis=1)
    # measured rms 1.5e-3 / p99 4.4e-3 after the W^2 deconvolution fix
    # (was 1.7e-2 rms dividing by W^4 — advisor round-2 medium #1)
    assert np.sqrt(np.mean(rel ** 2)) < 3e-3, np.sqrt(np.mean(rel ** 2))
    assert np.percentile(rel, 99) < 9e-3


@pytest.mark.parametrize("periodic", [True, False])
def test_p3m_momentum_conservation(periodic):
    pos, mass = _cloud(n=800, seed=9)
    dom = box(jnp.zeros(3), jnp.ones(3), periodic=periodic)
    a = np.asarray(pm.p3m_accel_dense(pos, mass, CFG, dom))
    ptot = (np.asarray(mass)[:, None] * a).sum(0)
    scale = np.abs(np.asarray(mass)[:, None] * a).sum(0).max()
    assert np.all(np.abs(ptot) < 2e-3 * scale), (ptot, scale)


@pytest.mark.slow  # jnp-window-p3m compile dominates; the default-tier
# pin of p3m-through-the-window-engine is the fused-kernel parity test
# (tests/parity/test_window_vs_dense.py::test_p3m_fused_short_range_agrees)
def test_p3m_window_engine_matches_dense_path():
    """The window-engine short-range pass == the dense short-range pass
    (same split), so the full engines agree on forces."""
    from sphax.neighbors import window as win
    from sphax.physics import dense, wengine

    rng = np.random.default_rng(4)
    n = 12 ** 3
    pos = (np.mgrid[0:12, 0:12, 0:12].reshape(3, -1).T + 0.5) / 12.0
    pos += 0.02 * rng.standard_normal(pos.shape)
    pos = np.mod(pos, 1.0)
    st = make_state(jnp.asarray(pos),
                    jnp.asarray(0.1 * rng.standard_normal((n, 3))),
                    jnp.full((n,), 1.0 / n), jnp.ones((n,)),
                    jnp.full((n,), 1.3 / 12))
    cfg = SPHConfig(dim=3, adaptive_h=True, newton_iters=6, gravity=True,
                    G=1.0, grav_eps=0.004, grav_solver="p3m", grav_mesh=32,
                    grav_rs_cells=2.0)
    dom = box(jnp.zeros(3), jnp.ones(3))
    a = dense.update_derived(st, cfg, dom, block=64)
    spec = win.plan_windows(dom, h_max=float(st.h.max()) * 1.3, n=n, dim=3)
    b = wengine.update_derived(st, cfg, dom, spec, tile_block=4)
    scale = float(jnp.max(jnp.abs(a.acc)))
    # the two short-range paths differ only by the window's hard cutoff at
    # spec.cutoff (split residual ~1e-3) and rs clamping; same mesh
    np.testing.assert_allclose(np.asarray(b.acc), np.asarray(a.acc),
                               rtol=2e-3, atol=2e-3 * scale)
