"""Quick parity check: Pallas kernels (interpret) vs jnp window path."""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from sphax import SPHConfig, box, make_state
from sphax.neighbors import window as win
from sphax.physics import wengine

rng = np.random.default_rng(5)
n = 12 ** 3
pos = (np.mgrid[0:12, 0:12, 0:12].reshape(3, -1).T + 0.5) / 12.0
pos += rng.normal(scale=0.02, size=pos.shape)
pos = np.mod(pos, 1.0)
vel = rng.normal(scale=0.1, size=pos.shape)
mass = np.full(n, 1.0 / n) * (1 + 0.1 * rng.random(n))
u = 1.0 + rng.random(n)
h = np.full(n, 1.3 / 12.0)

state = make_state(*(jnp.asarray(a) for a in (pos, vel, mass, u, h)))
state = state._replace(alpha=jnp.asarray(0.2 + 0.8 * rng.random(n)))
dom = box(jnp.zeros(3), jnp.ones(3))

for name, cfg in [
    ("balsara", SPHConfig(dim=3, adaptive_h=True, newton_iters=4,
                          grad_h=True, balsara=True)),
    ("fixed_h", SPHConfig(dim=3, adaptive_h=False)),
    ("mm", SPHConfig(dim=3, adaptive_h=True, newton_iters=3, mm_visc=True)),
]:
    spec = win.plan_windows(dom, h_max=float(state.h.max()) * 1.3, n=n, dim=3)
    assert int(wengine.overflow_count(state, dom, spec)) == 0
    a = wengine.update_derived(state, cfg, dom, spec, use_pallas=False)
    b = wengine.update_derived(state, cfg, dom, spec, use_pallas=True)
    for f in ("h", "rho", "P", "omega", "acc", "du_dt", "divv"):
        x, y = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        scale = np.abs(x).max() + 1e-30
        err = np.abs(x - y).max() / scale
        assert err < 1e-12, (name, f, err)
    print(name, "ok")
print("ALL OK")
