"""Evrard collapse gate: energy conservation with self-gravity (SURVEY.md §4.2.3)."""
import jax.numpy as jnp
import numpy as np

import sphax
from sphax.diag import conservation
from sphax.ics import evrard
from sphax.physics import dense
from sphax.run import simulate_until


def test_evrard_energy_conservation():
    ic = evrard.build(n=1024)
    cfg = sphax.configs.EVRARD
    dom = sphax.Domain(lo=jnp.asarray(ic["lo"]), hi=jnp.asarray(ic["hi"]),
                       periodic=False)
    st = sphax.make_state(*(jnp.asarray(ic[k]) for k in
                            ("pos", "vel", "mass", "u", "h")))
    engine = lambda s: dense.update_derived(s, cfg, dom, block=128)
    st = engine(st)

    e0 = float(conservation.total_energy(st, cfg))
    assert e0 < 0  # bound cloud

    st, _, t, _ = simulate_until(st, cfg, dom, engine, t_end=0.5, chunk=32,
                                 max_steps=4000)
    assert np.isfinite(np.asarray(st.rho)).all()

    e1 = float(conservation.total_energy(st, cfg))
    # collapse should convert gravitational -> kinetic+internal energy
    assert float(conservation.kinetic_energy(st)) > 1e-3
    drift = abs(e1 - e0) / abs(e0)
    assert drift < 5e-3, f"energy drift {drift}"

    # the cloud should have contracted: central density grows
    r = np.sqrt((np.asarray(st.pos) ** 2).sum(-1))
    assert np.median(r) < np.median(np.sqrt((ic["pos"] ** 2).sum(-1)))
