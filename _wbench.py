import time
import jax, jax.numpy as jnp, numpy as np, sphax
from sphax.ics import turbulence
from sphax.neighbors import window as win
from sphax.physics import wengine

f32 = lambda a: jnp.asarray(a, jnp.float32)
ic = turbulence.build(n_side=48)
cfg = sphax.configs.TURB
dom = sphax.box(jnp.zeros(3, jnp.float32), f32(ic["box"]))
st = sphax.make_state(*(f32(ic[k]) for k in ("pos","vel","mass","u","h")))
spec = win.plan_windows(dom, h_max=float(st.h.max())*1.15, n=st.n, dim=3, tile=8)
print(f"N={st.n} res={spec.res} wseg={spec.wseg} Ns={spec.n_sorted}")
print("overflow:", int(wengine.overflow_count(st, dom, spec)))
st2 = wengine.update_derived(st, cfg, dom, spec, tile_block=16)
jax.block_until_ready(st2.pos)
print("one derived ok, rho:", float(st2.rho.min()), float(st2.rho.max()))
t0=time.time()
for _ in range(3):
    st2 = wengine.update_derived(st, cfg, dom, spec, tile_block=16)
jax.block_until_ready(st2.pos)
print(f"derived: {(time.time()-t0)/3*1000:.0f} ms")
