"""Stochastic large-scale turbulence driving (SURVEY.md C13).

Ornstein-Uhlenbeck process on a small set of low-k Fourier modes with
solenoidal (divergence-free) projection — the standard driven-turbulence
forcing (Eswaran & Pope 1988 style), written as a pure jit-safe update:

    A_k(t+dt) = A_k e^{-dt/tau} + sigma sqrt(1 - e^{-2 dt/tau}) xi_k

The acceleration field a(x) = sum_k Re[ A_k e^{i k.x} ] is evaluated directly
(only ~dozens of modes, so cost is O(N * n_modes) vector ops — MXU/VPU
friendly, no FFT needed). ``DriveState`` is a pytree carried through the
production loop alongside ParticleState; the RNG is a threaded jax PRNG key
so multi-step loops stay on-device (no host round-trips, BASELINE.json:5).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DriveState(NamedTuple):
    amp_re: jax.Array  # [n_modes, D] real part of mode amplitudes
    amp_im: jax.Array  # [n_modes, D] imag part
    key: jax.Array     # PRNG key


def make_modes(kmin: int = 1, kmax: int = 2, dtype=np.float64):
    """Integer wavevectors with kmin <= |k| <= kmax (host-side, static)."""
    rng = range(-kmax, kmax + 1)
    ks = [(i, j, k) for i in rng for j in rng for k in rng
          if kmin**2 <= i * i + j * j + k * k <= kmax**2]
    # keep one of each +/- pair (the field is real: a = sum Re[A e^{ikx}])
    seen, keep = set(), []
    for k in ks:
        if tuple(-x for x in k) not in seen:
            seen.add(k)
            keep.append(k)
    return np.asarray(keep, dtype)


def init(key, modes, dtype=jnp.float64) -> DriveState:
    n = len(modes)
    return DriveState(amp_re=jnp.zeros((n, 3), dtype),
                      amp_im=jnp.zeros((n, 3), dtype), key=key)


def _solenoidal_project(amp, khat):
    """Remove the component parallel to k: a -> a - (a.khat) khat."""
    return amp - jnp.sum(amp * khat, axis=-1, keepdims=True) * khat


def update(drive: DriveState, modes, dt, tau: float, accel_rms: float,
           box_size: float = 1.0) -> DriveState:
    """One OU step for the mode amplitudes (pure, jit-safe)."""
    k = jnp.asarray(modes, drive.amp_re.dtype) * (2.0 * jnp.pi / box_size)
    khat = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
    f = jnp.exp(-dt / tau)
    n_modes = drive.amp_re.shape[0]
    sigma = accel_rms / jnp.sqrt(jnp.asarray(float(n_modes), drive.amp_re.dtype))
    key, k1, k2 = jax.random.split(drive.key, 3)
    noise_scale = sigma * jnp.sqrt(1.0 - f * f)
    re = drive.amp_re * f + noise_scale * jax.random.normal(
        k1, drive.amp_re.shape, drive.amp_re.dtype)
    im = drive.amp_im * f + noise_scale * jax.random.normal(
        k2, drive.amp_im.shape, drive.amp_im.dtype)
    re = _solenoidal_project(re, khat)
    im = _solenoidal_project(im, khat)
    return DriveState(amp_re=re, amp_im=im, key=key)


def acceleration(pos, drive: DriveState, modes, box_size: float = 1.0):
    """a(x_i) = sum_k [ Re(A_k) cos(k.x) - Im(A_k) sin(k.x) ]  -> [N, 3]."""
    k = jnp.asarray(modes, pos.dtype) * (2.0 * jnp.pi / box_size)
    phase = pos @ k.T                                   # [N, n_modes]
    return jnp.cos(phase) @ drive.amp_re - jnp.sin(phase) @ drive.amp_im
