"""Per-tick cost split of the block-timestep loop (round-4 judge Next #5).

The rung integrator's gap to the active-fraction ceiling is per-tick FIXED
work that cannot ride tile skipping (BASELINE.md round-3 rungs row). This
probe times each fixed term at the bench config (Sedov N=1e6, B=4) so the
glue-packing attack targets the measured binding term instead of a guess.

Measurement harness: each op runs R times inside ONE jitted lax.scan (the
op's output is folded into the carry so XLA cannot hoist it), because a
single dispatch over the axon tunnel costs ~30 ms — per-op timings outside
a scan measure the tunnel, not the op.

Usage:  python benchmarks/profile_rung_glue.py [n_side] [n_rungs]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sphax
from sphax.ics import sedov
from sphax.integrate import rungs
from sphax.integrate.timestep import particle_dt
from sphax.neighbors import window as win
from sphax.physics import wengine

R = 32


def scan_time(make_body, init, label, extra=""):
    """Median wall of ONE jitted scan of R body iterations, minus the
    measured empty-scan overhead, divided by R."""
    body = make_body

    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (body(c), 0), c, None, length=R)[0]

    out = run(init)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    walls = []
    for _ in range(5):
        t0 = time.time()
        out = run(init)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        walls.append(time.time() - t0)
    w = sorted(walls)[2] / R
    print(f"{label:12s} {w * 1e3:8.2f} ms   {extra}")
    return w


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_rungs = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    cfg = dataclasses.replace(sphax.configs.SEDOV, newton_iters=2)
    ic = sedov.build(n_side=n_side, E=1.0)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    dom = sphax.box(jnp.zeros(3, jnp.float32), f32(ic["box"]))
    st = sphax.make_state(*(f32(ic[k]) for k in
                            ("pos", "vel", "mass", "u", "h")))
    spec = win.plan_measured(st.pos, dom, h_max=float(st.h.max()) * 1.3,
                             dim=3, cutoff_scale=1.25, fast_sub=3,
                             rgroups=2)
    st = wengine.update_derived(st, cfg, dom, spec, use_pallas=True)

    # develop the blast one span so the rung population is realistic
    st, _, nacts, ovf, viol, _ = rungs.simulate_rungs(
        st, cfg, dom, spec, 1, n_rungs=n_rungs, rebuild_every=2)
    assert int(ovf) == 0
    dt_des = particle_dt(st, cfg)
    dt_min = float(jnp.min(dt_des))
    rung = jnp.clip(jnp.floor(jnp.log2(jnp.maximum(dt_des / dt_min, 1.0))),
                    0, n_rungs - 1).astype(jnp.int32)
    close_m = rung == 0
    frac = float(jnp.mean(close_m.astype(jnp.float32)))
    print(f"N={st.n} wseg={spec.wseg} B={n_rungs} rung0 frac={frac:.4f}")

    wd = win.build(st.pos, dom, spec)
    jax.block_until_ready(wd.g)
    Ns = wd.g.shape[0]
    print(f"Ns={Ns} (x{Ns / st.n:.2f})")

    scan_time(lambda c: c + 1.0, jnp.zeros(()), "empty", "(scan overhead)")
    def build_body(p):
        w = win.build(p, dom, spec)
        # keep the whole build live: fold sorted positions back through
        # the inverse permutation (depends on sort+windows via shift_s)
        return p * (1 + 1e-12) + 1e-20 * (w.pos_s[w.inv] + w.shift_s[w.inv])

    scan_time(build_body, st.pos, "build")

    dtype = st.pos.dtype
    cols = jnp.concatenate(
        [close_m.astype(dtype)[:, None], st.pos, st.vel,
         st.mass[:, None], st.u[:, None], st.h[:, None],
         st.rho[:, None], st.omega[:, None], jnp.ones((st.n, 1), dtype)],
        axis=-1)
    fills = [0.0] * 9 + [1.0, 1.0, 1.0, 1.0]

    g_s0 = win.gather_sorted_cols(cols, wd, fills)
    scan_time(lambda c: win.gather_sorted_cols(c, wd, fills)[:st.n] * 1.0
              + c * 1e-20, cols, "gather_in",
              f"[{st.n},13] -> [{Ns},13]")
    out_s = jnp.concatenate([g_s0, g_s0[:, :1]], axis=-1)[:, :11]
    scan_time(lambda o: o.at[:st.n].set(o[wd.inv] * (1 + 1e-12)), out_s,
              "unsort", f"[{Ns},11] -> [{st.n},11]")
    scan_time(lambda o: o.at[:, :4].set(o[:, :4][wd.src] * (1 + 1e-12)),
              out_s, "mirror", f"[{Ns},4] owner gather")

    def drift(st):
        dt_r = dt_min * jnp.exp2(rung.astype(dtype))
        open_m = rung == 0
        half = jnp.where(open_m, 0.5 * dt_r, 0.0)
        vel = st.vel + half[:, None] * st.acc
        u = jnp.maximum(st.u + half * st.du_dt, cfg.u_floor)
        return st._replace(pos=st.pos + dt_min * vel, vel=vel, u=u)

    scan_time(drift, st, "drift/open")

    def rung_upd(st):
        dt_des = particle_dt(st, cfg)
        r_des = jnp.clip(
            jnp.floor(jnp.log2(jnp.maximum(dt_des / dt_min, 1.0))),
            0, n_rungs - 1).astype(jnp.int32)
        return st._replace(u=st.u + 1e-20 * r_des.astype(dtype))

    scan_time(rung_upd, st, "rung_upd")

    # masked kernel pass at this tick's activity
    act_s = g_s0[:, 0] > 0.5
    wd_act = rungs.mask_structure(wd, spec, act_s)
    pos_s = g_s0[:, 1:4] + wd.shift_s
    vel_s = g_s0[:, 4:7]
    mass_s, u_s, h_s = g_s0[:, 7], g_s0[:, 8], g_s0[:, 9]

    from sphax.physics.eos import eos

    def kern(wdk):
        def body(h):
            h_f, rho_f, om_f, bf_f, divv_f = wengine.stage_density(
                wdk, spec, cfg, pos_s, vel_s, mass_s, u_s, h, 16, True)
            P_f, cs_f = eos(rho_f, u_s, cfg)
            acc_s, du_s = wengine.stage_forces(
                wdk, spec, cfg, pos_s, vel_s, mass_s, h_f, rho_f, P_f,
                cs_f, om_f, bf_f, 16, True)
            return h_f + 1e-20 * du_s
        return body

    scan_time(kern(wd_act), h_s, "kernels(act)", f"(close frac {frac:.4f})")
    wd_all = rungs.mask_structure(wd, spec, jnp.ones(Ns, bool))
    scan_time(kern(wd_all), h_s, "kernels(all)")


if __name__ == "__main__":
    main()
