import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((256,256)) @ jnp.ones((256,256))
print(float(x[0,0]))
