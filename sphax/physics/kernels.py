"""SPH smoothing kernels (cubic spline / M4) — the frozen convention.

Convention (SURVEY.md §2.1.1, pinned here once and used EVERYWHERE, including
``sphax.reference_cpu``):

    q = r / h,   support radius = 2 h

    W(r, h)  = sigma_d / h^d * f(q)
    f(q)     = 1 - 1.5 q^2 + 0.75 q^3          0 <= q < 1
             = 0.25 (2 - q)^3                  1 <= q < 2
             = 0                               q >= 2

    sigma_1 = 2/3,   sigma_2 = 10/(7 pi),   sigma_3 = 1/pi

    grad_i W(r_ij, h) = dW/dq * 1/h * r_ij / r      (r_ij = x_i - x_j)
    dW/dq = sigma_d / h^d * f'(q)
    f'(q) = -3 q + 2.25 q^2                    0 <= q < 1
          = -0.75 (2 - q)^2                    1 <= q < 2

    dW/dh = -(1/h) * (d * W + q * dW/dq)       (sigma_d/h^d scaling)

These closed forms are textbook Monaghan (1992) material [SURVEY.md tag D];
the reference uses the same cubic spline (BASELINE.json:7). All functions are
pure jnp, dimension-generic, and safe at r=0 (gradient -> 0).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

_SIGMA = {1: 2.0 / 3.0, 2: 10.0 / (7.0 * math.pi), 3: 1.0 / math.pi}


def sigma(dim: int) -> float:
    """Cubic-spline normalisation constant for dimension ``dim``."""
    return _SIGMA[dim]


def _f(q):
    """Shape function f(q), branch-free for TPU."""
    q1 = 1.0 - 1.5 * q * q + 0.75 * q * q * q
    t = 2.0 - q
    q2 = 0.25 * t * t * t
    w = jnp.where(q < 1.0, q1, q2)
    return jnp.where(q < 2.0, w, jnp.zeros_like(q))


def _df(q):
    """f'(q), branch-free."""
    d1 = (-3.0 + 2.25 * q) * q
    t = 2.0 - q
    d2 = -0.75 * t * t
    d = jnp.where(q < 1.0, d1, d2)
    return jnp.where(q < 2.0, d, jnp.zeros_like(q))


def W(r, h, dim: int):
    """Kernel value W(r, h)."""
    q = r / h
    return (sigma(dim) / h**dim) * _f(q)


def dW_dq(r, h, dim: int):
    """dW/dq = sigma/h^d f'(q)."""
    q = r / h
    return (sigma(dim) / h**dim) * _df(q)


def grad_W_over_r(r, h, dim: int, eps: float = 1e-30):
    """Return g(r,h) such that grad_i W(r_ij, h) = g * r_ij (vector form).

    g = (dW/dq) / (h * r). Safe at r=0: f'(0)=0 so the q<1 branch gives
    g(0) = sigma/h^d * (-3 + 2.25 q)/h * (q/r)|_{q=0} -> -3 sigma/h^{d+2};
    we implement g = sigma/h^{d+1} * f'(q)/max(r, eps) and rely on f'(q)~ -3q
    near 0 so g stays finite; the r in the denominator cancels analytically.
    To keep the cancellation exact we compute f'(q)/r = f'(q)/(q*h) * (q/r)
    = ... simplest robust form: g = dWdq / (h * r_safe) with the q<1 branch
    rewritten as q*(-3 + 2.25 q) so f'(q)/r = (-3 + 2.25 q) * q/r and
    q/r = 1/h exactly. We use that exact rewrite below.
    """
    q = r / h
    s = sigma(dim) / h**dim
    # f'(q)/r with the leading q factored out analytically (exact at r=0):
    #   q<1:  f'(q) = q*(-3 + 2.25 q)      -> f'(q)/r = (-3 + 2.25 q)/h
    #   q>=1: f'(q) = -0.75 (2-q)^2        -> divide by max(r, eps)
    g1 = (-3.0 + 2.25 * q) / h
    t = 2.0 - q
    g2 = -0.75 * t * t / jnp.maximum(r, eps)
    g = jnp.where(q < 1.0, g1, g2)
    g = jnp.where(q < 2.0, g, jnp.zeros_like(q))
    return s * g / h


def dW_dh(r, h, dim: int):
    """Partial of W w.r.t. h at fixed r: -(1/h) (d*W + q*dW/dq)."""
    q = r / h
    s = sigma(dim) / h**dim
    w = s * _f(q)
    dwdq = s * _df(q)
    return -(dim * w + q * dwdq) / h


SUPPORT = 2.0  # support radius in units of h (frozen)
