"""Frozen, hashable physics/run configs.

The reference keeps run parameters as constants at the top of each script
(SURVEY.md §5 "Config/flag system"); here they are frozen dataclasses so they
can cross the jit boundary as *static* arguments — a config change recompiles,
a domain/state change does not.
"""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SPHConfig:
    """Physics + numerics parameters (static under jit).

    Mirrors the reference's knobs (SURVEY.md §2.1 numerical contract):
    cubic-spline kernel, ideal-gas/isothermal EOS, Monaghan artificial
    viscosity, optional Balsara switch, optional grad-h terms, adaptive or
    fixed smoothing length, optional self-gravity.
    """

    dim: int = 3
    gamma: float = 5.0 / 3.0          # adiabatic index (ideal gas)
    isothermal: bool = False          # if True: P = cs_iso^2 * rho
    cs_iso: float = 1.0               # isothermal sound speed

    # Smoothing length: h_i = eta * (m_i / rho_i)^(1/dim); adaptive via Newton
    eta: float = 1.3
    adaptive_h: bool = True
    newton_iters: int = 6             # fixed unrolled Newton iterations (jit-safe)
    grad_h: bool = False              # apply Omega grad-h correction factors

    # Artificial viscosity (Monaghan): Pi_ij with alpha, beta = 2*alpha
    alpha_visc: float = 1.0
    beta_visc: float = 2.0
    eps_visc: float = 0.01            # softening in mu_ij denominator (eps*h^2)
    balsara: bool = False             # Balsara shear limiter

    # Morris-Monaghan (1997) time-dependent per-particle alpha(t):
    #   d alpha_i/dt = max(-div v, 0)(alpha_max - alpha_i)
    #                  - (alpha_i - alpha_min) sigma c_i / h_i
    # With the standard beta = 2 alpha convention this is EXACTLY a
    # per-particle multiplier on Pi_ij: engines feed 0.5(alpha_i + alpha_j)
    # through the same pair channel as the Balsara factor (keep
    # alpha_visc=1, beta_visc=2 so the multipliers compose as intended;
    # with balsara also on, the per-particle factor is bf_i * alpha_i).
    mm_visc: bool = False
    mm_alpha_min: float = 0.1
    mm_alpha_max: float = 1.5
    mm_sigma: float = 0.2             # decay rate coefficient (tau = h/(sigma c))

    # Self-gravity (Plummer softening). grav_solver:
    #   "direct" — all-pairs direct sum (exact; O(N^2), Pallas kernel G)
    #   "p3m"    — Ewald-split particle-mesh + screened short-range pairs
    #              (sphax/physics/pm.py; O(N log N), the TPU-native answer
    #              to SURVEY C11's "Barnes-Hut later")
    gravity: bool = False
    G: float = 1.0
    grav_eps: float = 0.01
    grav_solver: str = "direct"
    grav_mesh: int = 64               # PM grid points per axis
    grav_rs_cells: float = 2.0        # Ewald split scale in mesh cells

    # Timestep control
    cfl: float = 0.25
    dt_force: float = 0.25            # force criterion safety factor
    dt_max: float = 1e9

    # Energy floor (avoid negative u from AV overshoot in strong shocks)
    u_floor: float = 0.0

    # Neighbor infrastructure
    n_ngb_cap: int = 64               # fixed degree K for neighbor lists

    # Production fast-math: approximate VPU reciprocals for the two
    # genuinely per-pair divides in the force kernel (viscous mu
    # denominator, rhobar). ~1e-3 relative error in the ARTIFICIAL
    # viscosity term only (whose coefficients are O(1) calibrations), so
    # physically free — but it breaks the 1e-6 reference-parity bar, hence
    # opt-in and excluded from parity suites. Ignored off-TPU.
    fast_math: bool = False

    # Production h predictor (GADGET-class, Springel 2005 eq. continuity
    # closure): instead of re-walking the candidate windows inside the
    # Newton iteration, h is advanced through the drift by
    # dh/dt = (h / dim) * div v (leapfrog.step) and corrected by ONE
    # lagged Newton update built from the SAME walk's density sums
    # (wengine.stage_density) — so kernel A runs exactly one pair walk per
    # step instead of two at newton_iters=1. The h used by the force walk
    # then differs from the h the density sums were made at by the Newton
    # increment (~ the consistency residual, measured 4e-4-class — same
    # accuracy family as the newton_iters=1 warm start it replaces).
    # Requires adaptive_h, a converged initial h (update_derived ignores
    # the flag, so cold starts still run the full Newton solve), and
    # cfg.need_divv (the predictor reads state.divv). Opt-in; excluded
    # from the 1e-6 reference-parity suites like fast_math.
    h_predict: bool = False

    def __post_init__(self):
        if self.h_predict and not (self.adaptive_h and self.need_divv):
            raise ValueError(
                "cfg.h_predict requires adaptive_h=True (it replaces the "
                "in-walk Newton solve) and need_divv (the continuity "
                "predictor reads state.divv — enable balsara or mm_visc); "
                "without them the predictor silently degrades")

    @property
    def support(self) -> float:
        return 2.0

    @property
    def visc_factor_on(self) -> bool:
        """True when a per-particle viscosity multiplier rides the pair
        term (Balsara limiter and/or Morris-Monaghan alpha)."""
        return self.balsara or self.mm_visc

    @property
    def need_divv(self) -> bool:
        """True when engines must compute the SPH div-v estimator."""
        return self.balsara or self.mm_visc


# ---- canonical problem configs (BASELINE.json configs 1-5) -----------------

SOD = SPHConfig(dim=3, gamma=1.4, adaptive_h=False, grad_h=False,
                alpha_visc=1.0, beta_visc=2.0)

# blast onset is the stiffest phase (AV's velocity dependence makes the
# recompute-KDK first-order in energy there); a tighter CFL keeps total
# energy drift under ~1% per blast time at test resolutions
SEDOV = SPHConfig(dim=3, gamma=5.0 / 3.0, adaptive_h=True, grad_h=True,
                  alpha_visc=1.0, beta_visc=2.0, balsara=True, u_floor=1e-8,
                  cfl=0.15, dt_force=0.15)

KH = SPHConfig(dim=2, gamma=5.0 / 3.0, adaptive_h=True, grad_h=True,
               alpha_visc=1.0, beta_visc=2.0, balsara=True)

EVRARD = SPHConfig(dim=3, gamma=5.0 / 3.0, adaptive_h=True, grad_h=True,
                   gravity=True, G=1.0, grav_eps=0.02, u_floor=1e-10)

TURB = SPHConfig(dim=3, isothermal=True, cs_iso=1.0, adaptive_h=True,
                 grad_h=False, alpha_visc=1.0, beta_visc=2.0, balsara=True)
