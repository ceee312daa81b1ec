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


def test_evrard_p3m_variant_tracks_direct():
    """The registry's P3M Evrard variant (solver="p3m") stays finite and
    tracks the exact direct-sum trajectory at early collapse times (the
    O(N log N) tier for N >> 1e5, SURVEY C11)."""
    import numpy as np

    from sphax.integrate import leapfrog
    from sphax.problems import evrard as evrard_problem

    pd = evrard_problem(n=700)
    pp = evrard_problem(n=700, solver="p3m", mesh=32)
    sd, sp = pd.state, pp.state
    for _ in range(4):
        sd, _ = leapfrog.step(sd, pd.cfg, pd.domain, pd.engine)
        sp, _ = leapfrog.step(sp, pp.cfg, pp.domain, pp.engine)
    assert np.isfinite(np.asarray(sp.rho)).all()
    dv = np.abs(np.asarray(sp.vel) - np.asarray(sd.vel)).max()
    vscale = np.abs(np.asarray(sd.vel)).max() + 1e-30
    assert dv < 0.05 * vscale, (dv, vscale)
