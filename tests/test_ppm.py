"""PPM: photon-map gather vs PT statistical agreement (regression
0015_ppm coverage — same scene family)."""

import jax.numpy as jnp
import pytest
import numpy as np

from corona13_tpu.samplers import ppm as ppm_mod
from corona13_tpu.samplers import pt as pt_mod

pytestmark = pytest.mark.slow


def test_ppm_matches_pt(cornell):
    cfg = pt_mod.PTConfig(width=48, height=32, max_verts=5, mf=2,
                          use_nee=True, rr_start=99)
    a = jnp.zeros((cfg.height, cfg.width, 3))
    for s in range(4):
        a = a + ppm_mod.render_sample(cornell, cfg, jnp.uint32(s))
    a = np.asarray(a) / 4
    b = jnp.zeros((cfg.height, cfg.width, 3))
    for s in range(3):
        b = b + pt_mod.render_sample(cornell, cfg, jnp.uint32(s), batch=8)
    b = np.asarray(b) / 24
    assert np.isfinite(a).all()
    assert a[..., 1].mean() > 0
    ratio = a[..., 1].mean() / b[..., 1].mean()
    # kernel-radius bias + low photon counts: loose statistical gate
    assert abs(ratio - 1.0) < 0.3, ratio
    corr = np.corrcoef(a[..., 1].ravel(), b[..., 1].ravel())[0, 1]
    assert corr > 0.5, corr


def test_ppm_radius_shrinks(cornell):
    """Progressive radius: later progressions use smaller r (finite
    variance-bias tradeoff, Knuth/Hachisuka)."""
    cfg = pt_mod.PTConfig(width=16, height=12, max_verts=4, mf=2)
    f0 = np.asarray(ppm_mod.render_sample(cornell, cfg, jnp.uint32(0)))
    f9 = np.asarray(ppm_mod.render_sample(cornell, cfg, jnp.uint32(9)))
    assert np.isfinite(f0).all() and np.isfinite(f9).all()
