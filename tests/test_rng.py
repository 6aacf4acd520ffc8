"""Counter-based RNG and scrambled-Halton QMC tests."""

import jax.numpy as jnp
import numpy as np

from corona13_tpu.ops import rng


def test_uniform_range_and_determinism():
    pix = jnp.arange(4096, dtype=jnp.uint32)
    a = np.asarray(rng.uniform(pix, 3, 7, seed=1))
    b = np.asarray(rng.uniform(pix, 3, 7, seed=1))
    assert (a >= 0).all() and (a < 1).all()
    np.testing.assert_array_equal(a, b)
    c = np.asarray(rng.uniform(pix, 3, 7, seed=2))
    assert np.abs(a - c).max() > 0.1  # different seed decorrelates


def test_uniform_mean_var():
    pix = jnp.arange(1 << 16, dtype=jnp.uint32)
    x = np.asarray(rng.uniform(pix, 0, 0))
    assert abs(x.mean() - 0.5) < 5e-3
    assert abs(x.var() - 1.0 / 12.0) < 5e-3


def test_uniform_dims_independent():
    pix = jnp.arange(1 << 14, dtype=jnp.uint32)
    x = np.asarray(rng.uniform(pix, 0, 0))
    y = np.asarray(rng.uniform(pix, 0, 1))
    corr = np.corrcoef(x, y)[0, 1]
    assert abs(corr) < 0.02


def test_halton_stratification():
    """Scrambled radical inverse keeps the Halton stratification property:
    the first b^k points land one per length-b^-k interval."""
    for dim, base in ((0, 2), (1, 3)):
        n = base ** 4
        idx = jnp.arange(n, dtype=jnp.uint32)
        x = np.sort(np.asarray(rng.halton(idx, dim, seed=7)))
        # one point per stratum of width 1/n
        strata = (x * n).astype(int)
        assert len(np.unique(strata)) == n


def test_halton_scramble_changes_with_seed():
    idx = jnp.arange(64, dtype=jnp.uint32)
    a = np.asarray(rng.halton(idx, 0, seed=1))
    b = np.asarray(rng.halton(idx, 0, seed=9))
    assert np.abs(a - b).max() > 0.05
