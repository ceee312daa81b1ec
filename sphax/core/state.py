"""Particle state and simulation domain.

TPU-first design notes
----------------------
``ParticleState`` is a structure-of-arrays (SoA) pytree: every physical field
is a flat, HBM-resident ``[N]`` or ``[N, D]`` array.  This is the layout the
TPU wants (contiguous vector loads per field), it shards trivially along the
particle axis with ``jax.sharding``/``shard_map``, and it keeps every shape
static under ``jit``.

Reference parity: the reference (``dmuley/sph-code``, see SURVEY.md §1.1,
reconstructed — mount empty, SURVEY.md §0) keeps particles as parallel NumPy
arrays inside a flat script; this module is the framework-grade version of
that state (SURVEY.md §2.2 C1).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class ParticleState(NamedTuple):
    """SoA particle state. All arrays share leading dim N (static under jit).

    Fields updated by the integrator every step; ``rho``/``P``/``cs``/``acc``
    /``du_dt``/``omega`` are *derived* quantities cached from the most recent
    density/force evaluation so a KDK step can open with a half-kick without
    recomputing them (SURVEY.md §3.2).
    """

    pos: Array    # [N, D] positions
    vel: Array    # [N, D] velocities
    mass: Array   # [N]    particle masses
    u: Array      # [N]    specific internal energy
    h: Array      # [N]    smoothing lengths
    rho: Array    # [N]    mass density (derived)
    P: Array      # [N]    pressure (derived)
    cs: Array     # [N]    sound speed (derived)
    acc: Array    # [N, D] acceleration (derived)
    du_dt: Array  # [N]    du/dt (derived)
    omega: Array  # [N]    grad-h correction factor Omega_i (derived; 1 if off)
    alpha: Array  # [N]    per-particle viscosity alpha(t), evolved by the
    #                      integrator when cfg.mm_visc (Morris-Monaghan 1997);
    #                      constant (= alpha0) otherwise
    divv: Array   # [N]    SPH velocity-divergence estimate (derived; the
    #                      Morris-Monaghan source term; 0 unless an engine
    #                      computes it, i.e. cfg.balsara or cfg.mm_visc)

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    @property
    def dim(self) -> int:
        return self.pos.shape[1]


def make_state(pos, vel, mass, u, h, alpha0: float = 1.0) -> ParticleState:
    """Build a ParticleState with derived fields zero-initialised.

    Call ``sphax.physics.update_derived`` (or an engine's density+force pass)
    before the first integration step.
    """
    pos = jnp.asarray(pos)
    n, d = pos.shape
    dtype = pos.dtype
    z = jnp.zeros((n,), dtype)
    return ParticleState(
        pos=pos,
        vel=jnp.asarray(vel, dtype),
        mass=jnp.asarray(mass, dtype),
        u=jnp.asarray(u, dtype),
        h=jnp.asarray(h, dtype),
        rho=z,
        P=z,
        cs=z,
        acc=jnp.zeros((n, d), dtype),
        du_dt=z,
        omega=jnp.ones((n,), dtype),
        alpha=jnp.full((n,), alpha0, dtype),
        divv=z,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Domain:
    """Rectangular simulation box.

    ``periodic`` is static metadata (it changes trace structure: min-image
    wrapping vs open boundaries), while ``lo``/``hi`` are dynamic leaves so a
    domain of different extent does not retrigger compilation. ``periodic``
    may be a single bool or a per-axis tuple — the distributed slab
    decomposition uses mixed periodicity (ghost particles realise the wrap
    along the slab axis, min-image handles the transverse axes;
    SURVEY.md §3.5).
    """

    lo: Array  # [D]
    hi: Array  # [D]
    periodic: object = dataclasses.field(default=True,
                                         metadata=dict(static=True))

    @property
    def extent(self) -> Array:
        return self.hi - self.lo

    def periodic_axes(self, dim: int) -> Tuple[bool, ...]:
        p = self.periodic
        if isinstance(p, bool):
            return (p,) * dim
        return tuple(p)

    def wrap(self, pos: Array) -> Array:
        """Map positions back into the box on periodic axes."""
        per = self.periodic_axes(pos.shape[-1])
        if not any(per):
            return pos
        wrapped = self.lo + jnp.mod(pos - self.lo, self.extent)
        if all(per):
            return wrapped
        mask = jnp.asarray(per)
        return jnp.where(mask, wrapped, pos)

    def displacement(self, dx: Array) -> Array:
        """Minimum-image convention displacement for raw dx = x_i - x_j."""
        per = self.periodic_axes(dx.shape[-1])
        if not any(per):
            return dx
        ext = self.extent
        mi = dx - ext * jnp.round(dx / ext)
        if all(per):
            return mi
        mask = jnp.asarray(per)
        return jnp.where(mask, mi, dx)


def unit_box(dim: int = 3, periodic: bool = True, dtype=jnp.float32) -> Domain:
    return Domain(
        lo=jnp.zeros((dim,), dtype), hi=jnp.ones((dim,), dtype), periodic=periodic
    )


def box(lo, hi, periodic: bool = True) -> Domain:
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi, lo.dtype)
    return Domain(lo=lo, hi=hi, periodic=periodic)
