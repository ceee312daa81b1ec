import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from sphax import SPHConfig, box
from sphax.physics import pm, clist

rng = np.random.default_rng(5)
n = 3000
# clustered + uniform mix
pos = np.concatenate([rng.random((n//2, 3)),
                      0.3 + 0.12*rng.standard_normal((n//2, 3))])
pos = np.clip(pos, 1e-3, 1-1e-3)
mass = rng.random(n) + 0.5
for periodic in (True, False):
    cfg = SPHConfig(dim=3, gravity=True, G=1.0, grav_eps=0.004,
                    grav_solver="p3m", grav_mesh=64, grav_rs_cells=2.0)
    dom = box(jnp.zeros(3), jnp.ones(3), periodic=periodic)
    p_ = jnp.asarray(pos); m_ = jnp.asarray(mass)
    a_ref = np.asarray(clist.gravity_dense(p_, m_, cfg, dom))
    a_p3m = np.asarray(pm.p3m_accel_dense(p_, m_, cfg, dom))
    num = np.linalg.norm(a_p3m - a_ref, axis=1)
    den = np.linalg.norm(a_ref, axis=1)
    rms = np.sqrt(np.mean((num/den)**2))
    p99 = np.percentile(num/den, 99)
    print(f"periodic={periodic}: rms force err {rms:.2e}  p99 {p99:.2e}")
