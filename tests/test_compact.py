"""Wavefront compaction (cfg.compact): the unrolled bounce driver with
sorted per-depth capacities must reproduce the dense lax.scan sampler.

With caps = 1.0 the compaction is a pure permutation + re-bank, so the
image matches the dense render EXACTLY (same counter-RNG streams per
pixel).  With caps below the alive fraction, the stochastic capping
(uniform survivor subset reweighted by K/C) keeps the estimator unbiased;
the energy gate checks the mean survives aggressive capping.
"""

import jax.numpy as jnp
import numpy as np

from corona13_tpu.samplers import pt as pt_mod


def test_compact_identity_matches_dense(cornell):
    cfg_d = pt_mod.PTConfig(width=32, height=24, max_verts=5, mf=2,
                            use_nee=True)
    cfg_c = cfg_d.replace(compact=(1.0, 1.0, 1.0, 1.0))
    a = np.asarray(pt_mod.render_sample(cornell, cfg_d, jnp.uint32(0)))
    b = np.asarray(pt_mod.render_sample(cornell, cfg_c, jnp.uint32(0)))
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert a.mean() > 0


def test_compact_capping_unbiased(cornell):
    """Aggressive caps force stochastic capping every depth (cornell paths
    rarely die); the K/C reweight must preserve energy."""
    cfg_d = pt_mod.PTConfig(width=32, height=24, max_verts=5, mf=2,
                            use_nee=True)
    cfg_c = cfg_d.replace(compact=(1.0, 0.8, 0.7, 0.6))
    a = b = 0.0
    for s in range(4):
        a = a + np.asarray(pt_mod.render_sample(cornell, cfg_d,
                                                jnp.uint32(s)))
        b = b + np.asarray(pt_mod.render_sample(cornell, cfg_c,
                                                jnp.uint32(s)))
    ratio = b.mean() / a.mean()
    assert abs(ratio - 1.0) < 0.05, ratio


def test_alive_profile(cornell):
    cfg = pt_mod.PTConfig(width=32, height=24, max_verts=5, mf=2,
                          use_nee=True)
    prof = np.asarray(pt_mod.alive_profile(cornell, cfg, jnp.uint32(0)))
    n = cfg.width * cfg.height
    assert prof.shape == (cfg.max_verts - 1,)
    assert prof[0] == n                    # all camera rays alive
    assert np.all(np.diff(prof) <= 0)      # monotone non-increasing
