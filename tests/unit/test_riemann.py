"""Exact Riemann solver sanity (Toro's Sod test — known star values)."""
import numpy as np

from sphax.diag import riemann


def test_sod_star_state():
    p_s, u_s = riemann.solve_star(1.0, 0.0, 1.0, 0.125, 0.0, 0.1, 1.4)
    # Toro (1999) Table 4.2, Test 1
    assert abs(p_s - 0.30313) < 1e-4
    assert abs(u_s - 0.92745) < 1e-4


def test_sod_profile_limits():
    x = np.linspace(0, 1, 1001)
    rho, u, p = riemann.sod_solution(x, t=0.1)
    assert abs(rho[0] - 1.0) < 1e-12 and abs(rho[-1] - 0.125) < 1e-12
    assert abs(p[0] - 1.0) < 1e-12 and abs(p[-1] - 0.1) < 1e-12
    assert np.all(rho > 0) and np.all(np.isfinite(u))
    # contact: density jumps but pressure/velocity continuous in star region
    star = (x > 0.55) & (x < 0.8)
    assert np.ptp(p[star][np.abs(u[star] - 0.92745) < 1e-3]) < 1e-6
