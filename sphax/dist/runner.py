"""Host-side orchestration of a distributed wslab run (SURVEY.md §3.2 L7).

``SlabRun`` wires the full production multi-chip loop behind one object so
the CLI (``python -m sphax <problem> shards=N``) and tests drive the same
path the dryrun gate exercises:

    setup:  plan -> distribute -> measured wseg refinement
    chunk:  jitted scan of KDK steps (window-structure reuse at
            ``rebuild_every``, two-phase ppermute ghosts, pmin dt,
            replicated OU driving) — zero host round-trips inside
    after each chunk: on-device migration looped to convergence
            (make_misplaced stopping criterion) + count-based cut
            rebalancing from a psum'd histogram (the only host transfer is
            a [ncell_ax] int array)
    metrics: psum'd conservation scalars (make_diagnostics) — O(1) numbers
            to the host, never a particle array
    checkpoint: host gather of real rows (setup-path inverse); resume
            re-distributes

The chunk length is bounded by the migration contract: particles must stay
within one slab of home between migrate calls only in the sense that the
migrate loop ring-hops until convergence, but they must NOT outrun the
ghost margin within a single chunk (drift < margin - 2 h_max per rebuild
window; same Verlet-skin algebra as the single-chip engine).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sphax.configs import SPHConfig
from sphax.core.state import Domain, ParticleState
from sphax.dist import pencil, wslab


class SlabRun:
    """One distributed simulation: sharded state + compiled step machinery."""

    def __init__(self, state: ParticleState, cfg: SPHConfig, domain: Domain,
                 n_shards: int, chunk_steps: int = 8, rebuild_every: int = 2,
                 drive=None, drive_spec=None, h_margin: float = 1.1,
                 rebalance_every: int = 1, n_rungs: int = 1,
                 adaptive_rebuild: int = 0,
                 work_balance: Optional[bool] = None, **plan_kw):
        if n_rungs > 1:
            # distributed block timesteps (dist/wrungs.py): chunks are
            # whole spans of 2^{B-1} globally-synchronized base ticks
            if drive_spec is not None or cfg.gravity:
                raise NotImplementedError(
                    "rungs>1 needs the window engine without self-gravity "
                    "or OU driving (see integrate/rungs.py scope)")
            span = 1 << (n_rungs - 1)
            if span % rebuild_every:
                rebuild_every = 1
            chunk_steps = max(1, -(-chunk_steps // span)) * span
        if chunk_steps % rebuild_every:
            chunk_steps += rebuild_every - chunk_steps % rebuild_every
        self.cfg, self.domain = cfg, domain
        self.n_shards = n_shards
        self.chunk_steps = chunk_steps
        self.rebalance_every = rebalance_every
        self.drive, self.drive_spec = drive, drive_spec
        self.n_rungs = n_rungs
        self.adaptive_rebuild = adaptive_rebuild
        self.last_active_frac = 1.0
        self.last_dt_viol = 0
        self.last_rebuilds = 0          # adaptive: builds taken last chunk
        self._n_real = state.n          # pre-distribute: all rows real
        self._nchunks = 0

        self.mesh = wslab.make_mesh(n_shards)
        if jax.default_backend() != "cpu":
            # production single-chip window knobs (BASELINE.md round-3:
            # 1.15x on the wslab step); CPU meshes keep the smaller
            # graphs/compile times of the 1/1 default
            plan_kw.setdefault("fast_sub", 3)
            plan_kw.setdefault("rgroups", 2)
        spec = wslab.plan(domain, state.n,
                          h_max=float(state.h.max()) * h_margin,
                          n_shards=n_shards, **plan_kw)
        cuts = wslab.equal_cuts(spec.ncell_ax, n_shards)
        self.state = wslab.distribute(state, domain, self.mesh, spec, cuts)
        self.cuts = jnp.asarray(cuts)
        mr, gdrop = wslab.make_max_run(self.mesh, spec)(
            self.state, self.cuts, domain)
        if int(gdrop):
            raise RuntimeError(
                f"{int(gdrop)} ghosts dropped at setup; re-plan with a "
                "larger ghost_safety")
        self.spec = wslab.refine_wseg(spec, int(mr))
        if n_rungs > 1:
            from sphax.dist import wrungs

            self._chunk = wrungs.make_chunk_rungs(
                self.mesh, cfg, self.spec,
                nspans=chunk_steps // (1 << (n_rungs - 1)),
                n_rungs=n_rungs, rebuild_every=rebuild_every,
                adaptive_rebuild=adaptive_rebuild)
        else:
            self._chunk = wslab.make_chunk(self.mesh, cfg, self.spec,
                                           chunk_steps,
                                           rebuild_every=rebuild_every,
                                           drive_spec=drive_spec,
                                           adaptive_rebuild=adaptive_rebuild)
        self._migrate = wslab.make_migrate(self.mesh, self.spec)
        self._misplaced = wslab.make_misplaced(self.mesh, self.spec)
        # with rungs, wall-clock is the worst shard's ACTIVE work, not its
        # particle count — rebalance on the expected-work histogram
        # (2^{-rung} per particle) unless told otherwise
        self.work_balance = (n_rungs > 1 if work_balance is None
                             else work_balance)
        if self.work_balance:
            self._hist = wslab.make_work_histogram(self.mesh, self.spec,
                                                   cfg, max(n_rungs, 1))
        else:
            self._hist = wslab.make_histogram(self.mesh, self.spec)
        self._diag = wslab.make_diagnostics(self.mesh, self.spec, cfg)

    def run_chunk(self) -> np.ndarray:
        """Advance ``chunk_steps`` steps; migrate to convergence; rebalance
        at cadence. Returns the dt sequence. Raises on any nonzero health
        counter (silent pair deletion is never tolerated)."""
        if self.n_rungs > 1:
            out = self._chunk(self.state, self.cuts, self.domain)
            if self.adaptive_rebuild:
                self.state, dts, nacts, health, viol, nrb = out
                self.last_rebuilds = int(nrb)
            else:
                self.state, dts, nacts, health, viol = out
            nacts = np.asarray(nacts)
            tot = int(nacts.sum())
            self.last_active_frac = tot / (self._n_real * len(nacts))
            self.last_dt_viol = int(viol)
            if self.last_dt_viol > 0.25 * max(tot, 1):
                raise RuntimeError(
                    f"{self.last_dt_viol} dt-violating closings in a chunk "
                    f"of {tot} active closings (> 25%); the rung span "
                    "outruns the CFL condition — use fewer rungs")
        elif self.drive_spec is not None:
            out = self._chunk(self.state, self.cuts, self.domain, self.drive)
            if self.adaptive_rebuild:
                self.state, self.drive, dts, health, nrb = out
                self.last_rebuilds = int(nrb)
            else:
                self.state, self.drive, dts, health = out
        else:
            out = self._chunk(self.state, self.cuts, self.domain)
            if self.adaptive_rebuild:
                self.state, dts, health, nrb = out
                self.last_rebuilds = int(nrb)
            else:
                self.state, dts, health = out
        if int(health[0]):
            raise RuntimeError(f"{int(health[0])} ghosts dropped in chunk; "
                               "re-plan with larger ghost capacity")
        if int(health[1]):
            raise RuntimeError(
                f"structure overflow ({int(health[1])}: window segments "
                "or P3M mesh-fallback capacity); re-plan with larger "
                "wseg/ghost/mesh-fallback capacities")
        self._nchunks += 1
        if self.rebalance_every and \
                self._nchunks % self.rebalance_every == 0:
            hist = np.asarray(self._hist(self.state, self.domain))
            self.cuts = jnp.asarray(wslab.rebalance_cuts(hist, self.spec))
        self._migrate_to_convergence()
        return np.asarray(dts)

    def _migrate_to_convergence(self):
        for _ in range(self.n_shards):
            self.state, dropped = self._migrate(self.state, self.cuts,
                                                self.domain)
            if int(dropped):
                raise RuntimeError(
                    f"migration dropped {int(dropped)} particles; "
                    "re-plan with a larger migrate_frac")
            if int(self._misplaced(self.state, self.cuts, self.domain)) == 0:
                return
        raise RuntimeError("migration did not converge within n_shards "
                           "ring hops")

    def metrics(self, t: float) -> dict:
        """psum'd conservation/flow record (no particle arrays to host)."""
        return self._diag(self.state, self.domain, t)

    def gather(self) -> ParticleState:
        """Host copy of the real rows (checkpoint / diagnostics cadence)."""
        return wslab.gather_real(self.state)


class PencilRun:
    """One distributed simulation over a 2D ``ns0 x ns1`` pencil mesh — the
    SlabRun twin for the >64-chip regime where 1D slabs go thinner than the
    ghost margin (dist/pencil.py; SURVEY.md §3.2 L7). Same loop shape:
    chunked jitted steps, per-axis migration to convergence, independent
    per-axis quantile-cut rebalancing from psum'd marginal histograms."""

    def __init__(self, state: ParticleState, cfg: SPHConfig, domain: Domain,
                 ns0: int, ns1: int, chunk_steps: int = 8,
                 rebuild_every: int = 2, drive=None, drive_spec=None,
                 h_margin: float = 1.1, rebalance_every: int = 1,
                 n_rungs: int = 1, **plan_kw):
        if n_rungs > 1:
            # pencil block timesteps (dist/prungs.py): chunks are whole
            # spans of 2^{B-1} globally-synchronized base ticks
            if drive_spec is not None or cfg.gravity:
                raise NotImplementedError(
                    "rungs>1 needs the window engine without self-gravity "
                    "or OU driving (see integrate/rungs.py scope)")
            span = 1 << (n_rungs - 1)
            if span % rebuild_every:
                rebuild_every = 1
            chunk_steps = max(1, -(-chunk_steps // span)) * span
        if chunk_steps % rebuild_every:
            chunk_steps += rebuild_every - chunk_steps % rebuild_every
        self.cfg, self.domain = cfg, domain
        self.ns0, self.ns1 = ns0, ns1
        self.n_shards = ns0 * ns1
        self.chunk_steps = chunk_steps
        self.rebalance_every = rebalance_every
        self.drive, self.drive_spec = drive, drive_spec
        self.n_rungs = n_rungs
        self.last_active_frac = 1.0
        self.last_dt_viol = 0
        self._n_real = state.n          # pre-distribute: all rows real
        self._nchunks = 0

        self.mesh = pencil.make_mesh(ns0, ns1)
        if jax.default_backend() != "cpu":
            plan_kw.setdefault("fast_sub", 3)
            plan_kw.setdefault("rgroups", 2)
        spec = pencil.plan(domain, state.n,
                           h_max=float(state.h.max()) * h_margin,
                           ns0=ns0, ns1=ns1, **plan_kw)
        cuts0 = pencil.equal_cuts(spec.ncell0, ns0)
        cuts1 = pencil.equal_cuts(spec.ncell1, ns1)
        self.state = pencil.distribute(state, domain, self.mesh, spec,
                                       cuts0, cuts1)
        self.cuts0, self.cuts1 = jnp.asarray(cuts0), jnp.asarray(cuts1)
        mr, gdrop = pencil.make_max_run(self.mesh, spec)(
            self.state, self.cuts0, self.cuts1, domain)
        if int(gdrop):
            raise RuntimeError(
                f"{int(gdrop)} ghosts dropped at setup; re-plan with a "
                "larger ghost_safety")
        self.spec = pencil.refine_wseg(spec, int(mr))
        if n_rungs > 1:
            from sphax.dist import prungs

            self._chunk = prungs.make_chunk_rungs(
                self.mesh, cfg, self.spec,
                nspans=chunk_steps // (1 << (n_rungs - 1)),
                n_rungs=n_rungs, rebuild_every=rebuild_every)
        else:
            self._chunk = pencil.make_chunk(self.mesh, cfg, self.spec,
                                            chunk_steps,
                                            rebuild_every=rebuild_every,
                                            drive_spec=drive_spec)
        self._migrate = pencil.make_migrate(self.mesh, self.spec)
        self._misplaced = pencil.make_misplaced(self.mesh, self.spec)
        self._hist = pencil.make_histograms(self.mesh, self.spec)
        self._diag = pencil.make_diagnostics(self.mesh, self.spec, cfg)

    def run_chunk(self) -> np.ndarray:
        """Advance ``chunk_steps`` steps; migrate to convergence; rebalance
        at cadence. Raises on any nonzero health counter."""
        if self.n_rungs > 1:
            self.state, dts, nacts, health, viol = self._chunk(
                self.state, self.cuts0, self.cuts1, self.domain)
            nacts = np.asarray(nacts)
            tot = int(nacts.sum())
            self.last_active_frac = tot / (self._n_real * len(nacts))
            self.last_dt_viol = int(viol)
            if self.last_dt_viol > 0.25 * max(tot, 1):
                raise RuntimeError(
                    f"{self.last_dt_viol} dt-violating closings in a chunk "
                    f"of {tot} active closings (> 25%); the rung span "
                    "outruns the CFL condition — use fewer rungs")
        elif self.drive_spec is not None:
            self.state, self.drive, dts, health = self._chunk(
                self.state, self.cuts0, self.cuts1, self.domain, self.drive)
        else:
            self.state, dts, health = self._chunk(
                self.state, self.cuts0, self.cuts1, self.domain)
        if int(health[0]):
            raise RuntimeError(f"{int(health[0])} ghosts dropped in chunk; "
                               "re-plan with larger ghost capacity")
        if int(health[1]):
            raise RuntimeError(
                f"structure overflow ({int(health[1])}: window segments "
                "or P3M mesh-fallback capacity); re-plan with larger "
                "wseg/ghost/mesh-fallback capacities")
        self._nchunks += 1
        if self.rebalance_every and \
                self._nchunks % self.rebalance_every == 0:
            h0, h1 = self._hist(self.state, self.domain)
            c0, c1 = pencil.rebalance(np.asarray(h0), np.asarray(h1),
                                      self.spec)
            self.cuts0, self.cuts1 = jnp.asarray(c0), jnp.asarray(c1)
        self._migrate_to_convergence()
        return np.asarray(dts)

    def _migrate_to_convergence(self):
        # one x-hop + one y-hop per call: (kx, ky) pencils from home needs
        # max(kx, ky) calls
        for _ in range(max(self.ns0, self.ns1)):
            self.state, dropped = self._migrate(self.state, self.cuts0,
                                                self.cuts1, self.domain)
            if int(dropped):
                raise RuntimeError(
                    f"migration dropped {int(dropped)} particles; "
                    "re-plan with a larger migrate_frac")
            if int(self._misplaced(self.state, self.cuts0, self.cuts1,
                                   self.domain)) == 0:
                return
        raise RuntimeError("migration did not converge within "
                           "max(ns0, ns1) hops")

    def metrics(self, t: float) -> dict:
        """psum'd conservation/flow record (no particle arrays to host)."""
        return self._diag(self.state, self.domain, t)

    def gather(self) -> ParticleState:
        """Host copy of the real rows (checkpoint / diagnostics cadence)."""
        return pencil.gather_real(self.state)
