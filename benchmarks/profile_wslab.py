"""Decompose the wslab per-step overhead vs wengine (NEXT.md arch #5).

Degenerate 1-device mesh on the real chip, bench config at N=1e6: times the
production chunk, then each piece of the distributed step (route planning,
phase-1 pack+ppermute, window build over nl+2G rows, kernel stages, phase-2
re-ship) against the single-chip equivalents, so the ~1.6x overhead is
attributed line by line instead of guessed at.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

import sphax
from sphax.dist import wslab
from sphax.ics import turbulence
from sphax.neighbors import window as win
from sphax.physics import wengine


def timeit(f, *a, reps=5, **kw):
    out = f(*a, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*a, **kw)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def main():
    n_side = int(os.environ.get("BENCH_NSIDE", 100))
    ic = turbulence.build(n_side=n_side)
    cfg = dataclasses.replace(sphax.configs.TURB, newton_iters=1)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    dom = sphax.box(jnp.zeros(3, jnp.float32), f32(ic["box"]))
    st = sphax.make_state(*(f32(ic[k])
                            for k in ("pos", "vel", "mass", "u", "h")))
    st = st._replace(vel=0.3 * jax.random.normal(jax.random.PRNGKey(0),
                                                 st.vel.shape, jnp.float32))

    # ---- single-chip reference times ----
    spec1 = win.plan_measured(st.pos, dom, h_max=float(st.h.max()) * 1.05,
                              dim=3, cutoff_scale=1.05, ghost_safety=1.4,
                              fast_sub=3, rgroups=2)
    st = wengine.update_derived(st, cfg, dom, spec1, use_pallas=True)
    build1 = jax.jit(lambda p: win.build(p, dom, spec1))
    t_b1, wd1 = timeit(build1, st.pos)
    der1 = jax.jit(lambda s: wengine.derived_with(s, wd1, cfg, dom, spec1,
                                                  use_pallas=True))
    t_d1, _ = timeit(der1, st)
    print(f"wengine: build {t_b1*1e3:7.1f} ms  derived {t_d1*1e3:7.1f} ms")

    # ---- wslab degenerate 1-mesh ----
    mesh = wslab.make_mesh(1)
    fs = int(os.environ.get("WSLAB_FAST_SUB", 3))
    rg = int(os.environ.get("WSLAB_RGROUPS", 2))
    spec = wslab.plan(dom, st.n, h_max=float(st.h.max()) * 1.05, n_shards=1,
                      cutoff_scale=1.05, ghost_safety=1.4,
                      fast_sub=fs, rgroups=rg)
    cuts = jnp.asarray(wslab.equal_cuts(spec.ncell_ax, 1))
    sh = wslab.distribute(st, dom, mesh, spec, np.asarray(cuts))
    mr, _ = wslab.make_max_run(mesh, spec)(sh, cuts, dom)
    spec = wslab.refine_wseg(spec, int(mr))
    print(f"wslab: n_local {spec.n_local} (+2G {2*spec.ghost_cap}) wseg "
          f"{spec.wspec.wseg} vs wengine n_sorted {spec1.n_sorted} wseg "
          f"{spec1.wseg}")

    chunk = wslab.make_chunk(mesh, cfg, spec, nsteps=4, rebuild_every=2,
                             use_pallas=True)
    t_ch, _ = timeit(chunk, sh, cuts, dom, reps=3)
    print(f"wslab chunk (4 steps, rebuild 2): {t_ch*1e3:8.1f} ms "
          f"-> {t_ch/4*1e3:7.1f} ms/step")

    # ---- pieces under shard_map(1) ----
    def sm(f, out_specs):
        return jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=(P(wslab.AXIS), P(), P()),
            out_specs=out_specs, check_vma=False))

    bundle = sm(lambda s, c, d: wslab._exchange_and_build(s, c, d, spec)[0]
                .w_nact, P(wslab.AXIS))
    t_bb, _ = timeit(bundle, sh, cuts, dom)
    print(f"  _exchange_and_build:     {t_bb*1e3:7.1f} ms "
          f"(vs wengine build {t_b1*1e3:.1f})")

    routes_f = sm(lambda s, c, d: wslab._plan_routes(s, c, d, spec)[0][0][0],
                  P(wslab.AXIS))
    t_rt, _ = timeit(routes_f, sh, cuts, dom)
    print(f"    _plan_routes:          {t_rt*1e3:7.1f} ms")

    def ship(s, c, d):
        routes, slab_lo, _ = wslab._plan_routes(s, c, d, spec)
        return wslab._ship_kinematics(s, routes, slab_lo, d, spec)[0]
    ship_f = sm(ship, P(wslab.AXIS))
    t_sh, _ = timeit(ship_f, sh, cuts, dom)
    print(f"    routes + phase-1 ship: {t_sh*1e3:7.1f} ms")

    def stepbody(s, c, d):
        wd, routes, slab_lo, _ = wslab._exchange_and_build(s, c, d, spec)
        out, _ = wslab._local_derived(s, wd, routes, slab_lo, cfg, d, spec,
                                      True, 16, cuts=c)
        # consume every output so XLA cannot dead-code kernel C
        return (out.rho, out.acc, out.du_dt, out.h, out.P)
    body_f = sm(stepbody, (P(wslab.AXIS),) * 5)
    t_bd, _ = timeit(body_f, sh, cuts, dom, reps=3)
    print(f"  build + derived:         {t_bd*1e3:7.1f} ms -> derived alone "
          f"~{(t_bd-t_bb)*1e3:7.1f} ms (vs wengine {t_d1*1e3:.1f})")

    # ---- stage split inside the wslab derived pass ----
    def stages(s, c, d):
        from sphax.physics.eos import eos as eos_f
        wd, routes, slab_lo, _ = wslab._exchange_and_build(s, c, d, spec)
        G = spec.ghost_cap
        dim = s.dim
        dt = s.pos.dtype
        comb_pos, comb_vel, comb_mass = wslab._ship_kinematics(
            s, routes, slab_lo, d, spec)
        comb_u = jnp.concatenate([s.u, jnp.zeros((2 * G,), dt)])
        comb_h = jnp.concatenate([s.h, jnp.ones((2 * G,), dt)])
        cols = [comb_pos, comb_vel, comb_mass[:, None], comb_u[:, None],
                comb_h[:, None]]
        fills = [0.0] * (2 * dim) + [0.0, 0.0, 1.0]
        g_s = win.gather_sorted_cols(jnp.concatenate(cols, -1), wd, fills)
        pos_s = g_s[:, :dim] + wd.shift_s
        vel_s = g_s[:, dim:2 * dim]
        mass_s = g_s[:, 2 * dim]
        u_s = g_s[:, 2 * dim + 1]
        h_s = jnp.where(mass_s > 0, g_s[:, 2 * dim + 2], 1.0)
        h_f, rho_f, om_f, bf_f, divv_f = wengine.stage_density(
            wd, spec.wspec, cfg, pos_s, vel_s, mass_s, u_s, h_s, 16, True)
        dsc = jnp.stack([h_f, rho_f, om_f, bf_f, divv_f], -1)[wd.inv]
        P_c, cs_c = eos_f(dsc[:, 1], comb_u, cfg)
        nl = s.n
        loc_hyd = jnp.stack([dsc[:nl, 0], dsc[:nl, 1], P_c[:nl], cs_c[:nl],
                             dsc[:nl, 2], dsc[:nl, 3]], -1)
        pl, pr = wslab._perms(spec.n_shards)
        fillsh = (1.0, 1.0, 0.0, 0.0, 1.0, 0.0)
        gR2 = wslab._exchange(loc_hyd, fillsh, routes[0], pl)
        gL2 = wslab._exchange(loc_hyd, fillsh, routes[1], pr)
        hyd = jnp.concatenate([loc_hyd, gL2, gR2], 0)
        hyd_s = win.gather_sorted(hyd, wd)
        h2 = jnp.where(mass_s > 0, hyd_s[:, 0], 1.0)
        rho2 = jnp.maximum(hyd_s[:, 1], 1e-15)
        om2 = jnp.where(mass_s > 0, hyd_s[:, 4], 1.0)
        acc_s, du_s = wengine.stage_forces(
            wd, spec.wspec, cfg, pos_s, vel_s, mass_s, h2, rho2,
            hyd_s[:, 2], hyd_s[:, 3], om2, hyd_s[:, 5], 16, True)
        out = jnp.stack([du_s] + [acc_s[:, dd] for dd in range(dim)],
                        -1)[wd.inv]
        return (g_s.sum(), dsc.sum(), hyd_s.sum(), du_s.sum(), out.sum())
    parts = sm(stages, (P(), P(), P(), P(), P()))
    jax.block_until_ready(parts(sh, cuts, dom))
    # timeline via sequential truncation is unreliable under fusion; use
    # named probes instead: time the same graph with later stages DCE'd
    def upto(k):
        def f(s, c, d):
            outs = stages(s, c, d)
            return outs[k]
        return sm(f, P())
    labels = ["build+gather", "+kernelA+unsort", "+phase2+resort",
              "+kernelC", "+final unsort"]
    prev = 0.0
    for k, lab in enumerate(labels):
        t_k, _ = timeit(upto(k), sh, cuts, dom, reps=3)
        print(f"  {lab:18s}: {t_k*1e3:7.1f} ms (+{(t_k-prev)*1e3:6.1f})")
        prev = t_k

    # ---- wseg headroom A/B (refine_wseg default is 1.6) ----
    for hr in (1.25,):
        spec_hr = wslab.refine_wseg(
            dataclasses.replace(spec, wspec=dataclasses.replace(
                spec.wspec, wseg=spec1.wseg)), int(mr), headroom=hr)
        if spec_hr.wspec.wseg == spec.wspec.wseg:
            print(f"  headroom {hr}: wseg unchanged ({spec.wspec.wseg})")
            continue
        chunk_hr = wslab.make_chunk(mesh, cfg, spec_hr, nsteps=4,
                                    rebuild_every=2, use_pallas=True)
        t_hr, out = timeit(chunk_hr, sh, cuts, dom, reps=3)
        print(f"  headroom {hr} (wseg {spec_hr.wspec.wseg}): "
              f"{t_hr/4*1e3:7.1f} ms/step, overflow "
              f"{int(out[2][1])}")


if __name__ == "__main__":
    main()
