"""Driven turbulence gate: Mach statistics sane, momentum ~ 0, no NaNs."""
import jax
import jax.numpy as jnp
import numpy as np

import sphax
from sphax.diag import conservation
from sphax.ics import turbulence
from sphax.neighbors.cell_list import choose_grid
from sphax.physics import clist, driving
from sphax.run import DriveSpec, simulate_until


def test_driven_turbulence():
    ic = turbulence.build(n_side=10)
    cfg = sphax.configs.TURB
    dom = sphax.box(jnp.zeros(3), jnp.asarray(ic["box"]))
    st = sphax.make_state(*(jnp.asarray(ic[k]) for k in
                            ("pos", "vel", "mass", "u", "h")))
    grid = choose_grid(dom, h_max=float(st.h.max()) * 1.5, n=st.n)
    engine = lambda s: clist.update_derived(s, cfg, dom, grid)
    st = engine(st)

    modes = tuple(map(tuple, driving.make_modes(1, 2).astype(int)))
    spec = DriveSpec(modes=modes, tau=0.5, accel_rms=2.0, box_size=1.0)
    drv = driving.init(jax.random.PRNGKey(3), np.asarray(modes))

    st, drv, t, n = simulate_until(st, cfg, dom, engine, t_end=0.18, chunk=16,
                                   drive=drv, drive_spec=spec, max_steps=1000)

    rec = conservation.summary(st, cfg, t)
    assert rec["finite"]
    # driving must actually stir the box
    assert rec["mach_rms"] > 0.05, rec
    assert rec["mach_rms"] < 10.0
    # solenoidal large-scale forcing adds little net momentum; the exact SPH
    # pair forces add none
    ptot = np.sqrt(rec["px"] ** 2 + rec["py"] ** 2 + rec["pz"] ** 2)
    pscale = rec["max_v"] * float(jnp.sum(st.mass))
    assert ptot < 0.2 * pscale
    # isothermal: pressure tracks density exactly
    np.testing.assert_allclose(np.asarray(st.P),
                               cfg.cs_iso**2 * np.asarray(st.rho), rtol=1e-12)
