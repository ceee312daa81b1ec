"""Kernel unit tests (SURVEY.md §4.2.1)."""
import jax.numpy as jnp
import numpy as np
import pytest

from sphax import reference_cpu as ref
from sphax.physics import kernels as K


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_normalisation(dim):
    """Integral of W over all space == 1 (radial quadrature)."""
    h = 0.37
    r = np.linspace(0, 2 * h, 200001)
    w = np.asarray(K.W(jnp.asarray(r), h, dim))
    if dim == 1:
        integral = 2.0 * np.trapezoid(w, r)
    elif dim == 2:
        integral = np.trapezoid(2 * np.pi * r * w, r)
    else:
        integral = np.trapezoid(4 * np.pi * r**2 * w, r)
    assert abs(integral - 1.0) < 1e-6


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_gradient_matches_finite_difference(dim):
    h = 0.5
    r = np.linspace(0.01, 2.2 * h, 57)
    eps = 1e-7
    dw = (np.asarray(K.W(jnp.asarray(r + eps), h, dim))
          - np.asarray(K.W(jnp.asarray(r - eps), h, dim))) / (2 * eps)
    g = np.asarray(K.grad_W_over_r(jnp.asarray(r), h, dim)) * r
    np.testing.assert_allclose(g, dw, atol=1e-5)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_dW_dh_matches_finite_difference(dim):
    h = 0.5
    r = np.linspace(0.0, 2.2 * h, 57)
    eps = 1e-7
    dw = (np.asarray(K.W(jnp.asarray(r), h + eps, dim))
          - np.asarray(K.W(jnp.asarray(r), h - eps, dim))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(K.dW_dh(jnp.asarray(r), h, dim)),
                               dw, atol=1e-5)


def test_gradient_finite_at_zero():
    g = np.asarray(K.grad_W_over_r(jnp.asarray(0.0), 0.3, 3))
    assert np.isfinite(g) and g < 0  # -3 sigma / h^5


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_numpy_mirror_matches_jnp(dim):
    """reference_cpu kernel functions are the same frozen convention."""
    h = 0.41
    r = np.linspace(0.0, 2.3 * h, 97)
    np.testing.assert_allclose(ref.kernel_W(r, h, dim),
                               np.asarray(K.W(jnp.asarray(r), h, dim)),
                               rtol=1e-12)
    np.testing.assert_allclose(ref.kernel_gradW_over_r(r, h, dim),
                               np.asarray(K.grad_W_over_r(jnp.asarray(r), h, dim)),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(ref.kernel_dW_dh(r, h, dim),
                               np.asarray(K.dW_dh(jnp.asarray(r), h, dim)),
                               rtol=1e-12, atol=1e-12)


def test_support_is_compact():
    h = 0.3
    assert float(K.W(jnp.asarray(2.0 * h + 1e-9), h, 3)) == 0.0
    assert float(K.grad_W_over_r(jnp.asarray(2.0 * h + 1e-9), h, 3)) == 0.0
