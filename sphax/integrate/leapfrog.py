"""Leapfrog kick-drift-kick integrator (SURVEY.md §2.1.8, §3.2; C10).

The step sequence is FROZEN to match ``reference_cpu.step`` exactly:
  1. dt from current derived state (unless supplied)
  2. half-kick  v += a dt/2 ; u += du dt/2 (floored)
  3. drift      x += v dt (periodic wrap)
  4. recompute derived quantities (engine-dependent: dense / nlist / pallas)
  5. half-kick with the new derivatives

``derived_fn`` is any engine's ``update_derived``-style closure; the step is
a single pure function, so ``jax.lax.fori_loop(0, K, ...)`` runs whole epochs
on-device with zero host round-trips (BASELINE.json:5).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp

from sphax.configs import SPHConfig
from sphax.core.state import Domain, ParticleState
from sphax.integrate.timestep import local_dt

DerivedFn = Callable[[ParticleState], ParticleState]


def step(state: ParticleState, cfg: SPHConfig, domain: Domain,
         derived_fn: DerivedFn, dt=None,
         wrap: bool = True) -> Tuple[ParticleState, jnp.ndarray]:
    """``wrap=False`` leaves drifted positions unwrapped — the distributed
    slab engine needs contiguous coordinates across the periodic seam within
    a chunk (sphax/dist/slab.py) and wraps at redistribution cadence."""
    if dt is None:
        dt = local_dt(state, cfg)
    half = 0.5 * dt
    vel = state.vel + half * state.acc
    u = jnp.maximum(state.u + half * state.du_dt, cfg.u_floor)
    pos = state.pos + dt * vel
    if wrap:
        pos = domain.wrap(pos)
    state = state._replace(pos=pos, vel=vel, u=u)
    if cfg.h_predict and cfg.adaptive_h:
        # continuity predictor dh/dt = (h/dim) div v, advanced through this
        # drift; the derived pass then walks ONCE at the predicted h and
        # applies a lagged Newton correction (wengine.stage_density). The
        # multiplier clamp bounds a pathological local divv estimate to a
        # 10% single-step change (the Newton clamp downstream does the
        # rest); with cfg.need_divv off, divv is zeros and this is a no-op
        # (pure lagged-Newton relaxation).
        fac = jnp.clip(1.0 + (dt / cfg.dim) * state.divv, 0.9, 1.1)
        state = state._replace(h=state.h * fac)
    state = derived_fn(state)
    vel = state.vel + half * state.acc
    u = jnp.maximum(state.u + half * state.du_dt, cfg.u_floor)
    state = state._replace(vel=vel, u=u)
    if cfg.mm_visc:
        # Morris-Monaghan alpha(t): explicit Euler from the freshly derived
        # div v (same placement as reference_cpu.step step 6)
        from sphax.physics import pairs

        state = state._replace(alpha=pairs.mm_alpha_update(
            state.alpha, state.divv, state.h, state.cs, dt, cfg))
    return state, dt
