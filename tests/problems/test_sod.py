"""Sod shock tube gate: L1(rho) vs exact Riemann solution (SURVEY.md §4.2.3).

The BASELINE accuracy target is "L1 density error vs Sod analytic matching
the CPU reference" — asserted here by running identical ICs through the jnp
engine and checking the L1 error is small and sane for the resolution.
"""
import jax.numpy as jnp
import numpy as np

import sphax
from sphax.diag import conservation, riemann
from sphax.ics import sod
from sphax.physics import dense
from sphax.run import simulate_until


def test_sod_l1_gate():
    ic = sod.build(nx_left=16, n_trans=4)  # N = 256 + 32 = 288
    cfg = sphax.SPHConfig(dim=3, gamma=1.4, adaptive_h=True, newton_iters=8)
    dom = sphax.box(jnp.zeros(3), jnp.asarray(ic["box"]))
    st = sphax.make_state(*(jnp.asarray(ic[k]) for k in
                            ("pos", "vel", "mass", "u", "h")))
    engine = lambda s: dense.update_derived(s, cfg, dom, block=128)
    st = engine(st)
    p0 = np.asarray(conservation.momentum(st))

    st, _, t, nsteps = simulate_until(st, cfg, dom, engine, t_end=0.1)
    assert nsteps < 200

    x = np.asarray(st.pos[:, 0])
    rho = np.asarray(st.rho)
    assert np.isfinite(rho).all()
    win = (x > 0.2) & (x < 0.85)
    rho_exact, _, _ = riemann.sod_solution(x[win], t)
    l1 = float(np.mean(np.abs(rho[win] - rho_exact)))
    # resolution-appropriate gate (measured ~0.03 at nx=16; 0.017 at nx=32)
    assert l1 < 0.06, f"L1={l1}"

    # exact momentum conservation through the whole run
    p1 = np.asarray(conservation.momentum(st))
    assert np.all(np.abs(p1 - p0) < 1e-10)
