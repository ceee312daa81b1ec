"""Morton key unit tests (SURVEY.md §4.2.1)."""
import jax.numpy as jnp
import numpy as np
import pytest

from sphax.neighbors import morton


@pytest.mark.parametrize("dim,bits", [(1, 16), (2, 16), (3, 10)])
def test_roundtrip(dim, bits):
    rng = np.random.default_rng(0)
    coords = rng.integers(0, 2**bits, size=(4096, dim)).astype(np.uint32)
    keys = morton.encode(jnp.asarray(coords))
    back = np.asarray(morton.decode(keys, dim))
    np.testing.assert_array_equal(back, coords)


def test_known_values_3d():
    # (1,0,0)->1, (0,1,0)->2, (0,0,1)->4, (1,1,1)->7, (2,0,0)->8
    coords = jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1],
                          [2, 0, 0]], jnp.uint32)
    np.testing.assert_array_equal(np.asarray(morton.encode(coords)),
                                  [1, 2, 4, 7, 8])


def test_locality_is_monotone_along_axes():
    """Keys increase along each axis from the origin (Z-order property)."""
    for d in range(3):
        c = np.zeros((8, 3), np.uint32)
        c[:, d] = np.arange(8)
        k = np.asarray(morton.encode(jnp.asarray(c)))
        assert np.all(np.diff(k.astype(np.int64)) > 0)


def test_same_cell_same_key_groups():
    """Sorting by morton key groups equal coords contiguously."""
    rng = np.random.default_rng(1)
    coords = rng.integers(0, 4, size=(512, 3)).astype(np.uint32)
    keys = np.asarray(morton.encode(jnp.asarray(coords)))
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    # equal keys are contiguous by construction of a sort; check each key
    # group has uniform coords
    for k in np.unique(ks):
        grp = coords[order][ks == k]
        assert (grp == grp[0]).all()
