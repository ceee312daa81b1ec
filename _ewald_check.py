import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from scipy.special import erfc
from sphax import SPHConfig, box
from sphax.physics import pm

rng = np.random.default_rng(5)
n = 800
pos = np.concatenate([rng.random((n//2, 3)),
                      np.mod(0.3 + 0.12*rng.standard_normal((n//2, 3)), 1.0)])
mass = rng.random(n) + 0.5
L = 1.0
G = 1.0
cfg = SPHConfig(dim=3, gravity=True, G=G, grav_eps=0.004,
                grav_solver="p3m", grav_mesh=64, grav_rs_cells=2.0)
rs = 2.0 * L / 64

# brute-force Ewald ground truth (Jeans swindle: k=0 dropped)
acc = np.zeros((n, 3))
# real-space: erfc-screened over images
for nx in (-1, 0, 1):
    for ny in (-1, 0, 1):
        for nz in (-1, 0, 1):
            off = np.array([nx, ny, nz]) * L
            dx = pos[:, None, :] - pos[None, :, :] + off
            r2 = np.einsum("ijk,ijk->ij", dx, dx)
            r = np.sqrt(np.maximum(r2, 1e-30))
            x = r / (2*rs)
            S = erfc(x) + (r/(rs*np.sqrt(np.pi)))*np.exp(-x*x)
            f = S * (r2 + cfg.grav_eps**2)**-1.5
            np.fill_diagonal(f, 0.0) if (nx==ny==nz==0) else None
            acc -= G * np.einsum("ij,ijk->ik", f*mass[None,:], dx)
# k-space
kmax = 21
ks = np.array([(i, j, k) for i in range(-kmax, kmax+1)
               for j in range(-kmax, kmax+1) for k in range(-kmax, kmax+1)
               if (i, j, k) != (0, 0, 0)], float) * 2*np.pi/L
k2 = np.einsum("kd,kd->k", ks, ks)
coef = 4*np.pi*G/L**3 * np.exp(-k2*rs*rs)/k2       # [K]
phase = pos @ ks.T                                  # [N, K]
S_re = np.cos(phase).T @ np.ones(n) * 0 + (np.cos(phase).T * mass).sum(1)
S_im = (np.sin(phase).T * mass).sum(1)
# acc_i += -G grad phi_lr: phi_lr(x) = sum_k coef/. .. derive force directly:
# F_i = G? Use: a_i = sum_k coef * k * [sin(k.x_i) S_re(k) - cos(k.x_i) S_im(k)]
sin_i = np.sin(phase)   # [N,K]
cos_i = np.cos(phase)
amp = (sin_i * S_re[None, :] - cos_i * S_im[None, :]) * coef[None, :]
acc += amp @ ks * -1.0
a_p3m = np.asarray(pm.p3m_accel_dense(jnp.asarray(pos), jnp.asarray(mass),
                                      cfg, box(jnp.zeros(3), jnp.ones(3))))
num = np.linalg.norm(a_p3m - acc, axis=1)
den = np.linalg.norm(acc, axis=1)
print("p3m vs brute Ewald: rms", np.sqrt(np.mean((num/den)**2)),
      "p99", np.percentile(num/den, 99))
# sanity: flip the k-space force sign if needed
acc2 = acc - 2*(amp @ ks * -1.0)
num2 = np.linalg.norm(a_p3m - acc2, axis=1)
print("with opposite k-space sign: rms", np.sqrt(np.mean((num2/den)**2)))
