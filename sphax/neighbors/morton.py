"""Morton (Z-order) space-filling-curve keys.

Used (a) as the particle sort key so that same-cell and nearby-cell particles
land contiguously in memory — the locality that makes TPU neighbor gathers
near-block loads (SURVEY.md §3.4, P: astro-ph/0305525, 1810.09898) — and
(b) for the SFC domain decomposition across chips (SURVEY.md C15).

Branch-free bit-spreading via magic numbers; everything uint32, jit-safe.
3D supports 10 bits/axis (grids to 1024^3), 2D 16 bits/axis.
"""
from __future__ import annotations

import jax.numpy as jnp


def _u32(x):
    return x.astype(jnp.uint32)


def spread3(x):
    """Spread 10 low bits of x so there are 2 zero bits between each."""
    x = _u32(x) & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def spread2(x):
    """Spread 16 low bits of x so there is 1 zero bit between each."""
    x = _u32(x) & jnp.uint32(0xFFFF)
    x = (x | (x << 8)) & jnp.uint32(0x00FF00FF)
    x = (x | (x << 4)) & jnp.uint32(0x0F0F0F0F)
    x = (x | (x << 2)) & jnp.uint32(0x33333333)
    x = (x | (x << 1)) & jnp.uint32(0x55555555)
    return x


def compact3(x):
    """Inverse of spread3."""
    x = _u32(x) & jnp.uint32(0x09249249)
    x = (x ^ (x >> 2)) & jnp.uint32(0x030C30C3)
    x = (x ^ (x >> 4)) & jnp.uint32(0x0300F00F)
    x = (x ^ (x >> 8)) & jnp.uint32(0x030000FF)
    x = (x ^ (x >> 16)) & jnp.uint32(0x3FF)
    return x


def compact2(x):
    """Inverse of spread2."""
    x = _u32(x) & jnp.uint32(0x55555555)
    x = (x ^ (x >> 1)) & jnp.uint32(0x33333333)
    x = (x ^ (x >> 2)) & jnp.uint32(0x0F0F0F0F)
    x = (x ^ (x >> 4)) & jnp.uint32(0x00FF00FF)
    x = (x ^ (x >> 8)) & jnp.uint32(0x0000FFFF)
    return x


def encode(coords):
    """Interleave integer cell coords [..., D] (D in {1,2,3}) into a key."""
    d = coords.shape[-1]
    if d == 1:
        return _u32(coords[..., 0])
    if d == 2:
        return spread2(coords[..., 0]) | (spread2(coords[..., 1]) << 1)
    if d == 3:
        return (spread3(coords[..., 0])
                | (spread3(coords[..., 1]) << 1)
                | (spread3(coords[..., 2]) << 2))
    raise ValueError(f"dim {d} not supported")


def decode(key, dim: int):
    """Inverse of encode: key -> [..., D] integer coords."""
    key = _u32(key)
    if dim == 1:
        return key[..., None]
    if dim == 2:
        return jnp.stack([compact2(key), compact2(key >> 1)], axis=-1)
    if dim == 3:
        return jnp.stack(
            [compact3(key), compact3(key >> 1), compact3(key >> 2)], axis=-1)
    raise ValueError(f"dim {dim} not supported")
