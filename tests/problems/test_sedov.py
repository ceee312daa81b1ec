"""Sedov-Taylor blast gate: shock radius vs R(t) = xi (E t^2 / rho)^(1/5)."""
import jax.numpy as jnp
import numpy as np
import pytest

import sphax
from sphax.diag import conservation
from sphax.diag import sedov as sedov_diag
from sphax.ics import sedov
from sphax.physics import dense
from sphax.run import simulate_until


def test_sedov_shock_radius():
    ic = sedov.build(n_side=14, E=1.0)
    cfg = sphax.configs.SEDOV
    dom = sphax.box(jnp.zeros(3), jnp.asarray(ic["box"]))
    st = sphax.make_state(*(jnp.asarray(ic[k]) for k in
                            ("pos", "vel", "mass", "u", "h")))
    engine = lambda s: dense.update_derived(s, cfg, dom, block=128)
    st = engine(st)
    e0 = float(conservation.kinetic_energy(st) + conservation.internal_energy(st))

    t_end = 0.06
    st, _, t, _ = simulate_until(st, cfg, dom, engine, t_end=t_end, chunk=32,
                                 max_steps=3000)
    rho = np.asarray(st.rho)
    assert np.isfinite(rho).all()

    r_meas = sedov_diag.measured_shock_radius(
        np.asarray(st.pos), rho, np.array([0.5, 0.5, 0.5]), ic["rho0"])
    r_th = sedov_diag.shock_radius(t, ic["E"], ic["rho0"], cfg.gamma)
    # low-res particle estimate: allow 25% on the radius
    assert abs(r_meas - r_th) / r_th < 0.25, (r_meas, r_th, t)

    # energy conservation (no cooling): total E constant
    e1 = float(conservation.kinetic_energy(st) + conservation.internal_energy(st))
    # global-dt KDK is ~1st order in energy through the violent blast onset
    # (AV velocity dependence); at cfl=0.15, n=14 the drift is ~1%
    assert abs(e1 - e0) / e0 < 2e-2


@pytest.mark.slow  # long x64 Sedov run; MM alpha(t) keeps its default
# gates via the lockstep parity test and the wslab mm_visc dist config
def test_sedov_morris_monaghan_variant():
    """Sedov with the Morris-Monaghan alpha(t) switch (SURVEY §2.1.6, C8):
    the blast's convergent front must raise alpha from alpha_min toward
    alpha_max, the shock radius gate still holds, and energy stays
    conserved at the same order as the Balsara variant."""
    import jax.numpy as jnp

    from sphax.diag import conservation
    from sphax.problems import sedov as sedov_problem
    from sphax.run import simulate_until

    prob = sedov_problem(n=16, visc="mm")
    assert prob.cfg.mm_visc and not prob.cfg.balsara
    st = prob.state
    assert float(jnp.max(st.alpha)) <= prob.cfg.mm_alpha_min * 1.001
    e0 = conservation.total_energy(st, prob.cfg)
    st, _, t, _ = simulate_until(st, prob.cfg, prob.domain, prob.engine,
                                 t_end=0.02, chunk=16, max_steps=1500)
    assert np.isfinite(np.asarray(st.rho)).all()
    # the switch switched: the shock front drove alpha well above the floor
    assert float(jnp.max(st.alpha)) > 3.0 * prob.cfg.mm_alpha_min
    # but the quiescent exterior stayed near alpha_min (that is the point
    # of the switch: viscosity only where compression demands it)
    assert float(jnp.percentile(st.alpha, 20)) < 2.0 * prob.cfg.mm_alpha_min
    e1 = conservation.total_energy(st, prob.cfg)
    assert abs(float(e1 - e0)) / abs(float(e0)) < 0.05
