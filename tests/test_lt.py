"""Light tracing: cross-technique agreement with PT (the regression
suite's 0012_lt coverage, as a statistical test)."""

import jax.numpy as jnp
import pytest
import numpy as np

from corona13_tpu import testing
from corona13_tpu.samplers import lt as lt_mod
from corona13_tpu.samplers import pt as pt_mod

pytestmark = pytest.mark.slow


def test_lt_matches_pt(cornell):
    cfg = pt_mod.PTConfig(width=48, height=32, max_verts=4, mf=2,
                          use_nee=False)
    fb_lt = jnp.zeros((32, 48, 3))
    for s in range(4):
        fb_lt = fb_lt + lt_mod.render_sample(cornell, cfg, jnp.uint32(s),
                                             batch=8)
    a = np.asarray(fb_lt) / (4 * 8)
    fb_pt = jnp.zeros((32, 48, 3))
    for s in range(2):
        fb_pt = fb_pt + pt_mod.render_sample(cornell, cfg,
                                             jnp.uint32(100 + s), batch=24)
    b = np.asarray(fb_pt) / (2 * 24)
    assert np.isfinite(a).all()
    ratio = a[..., 1].mean() / b[..., 1].mean()
    assert abs(ratio - 1.0) < 0.12, ratio
    # images correlate spatially (same scene structure)
    corr = np.corrcoef(a[..., 1].ravel(), b[..., 1].ravel())[0, 1]
    assert corr > 0.4, corr


def test_lt_emitter_visible(cornell):
    """The light-vertex camera connection renders the emitter quad."""
    cfg = pt_mod.PTConfig(width=48, height=32, max_verts=3, mf=2)
    fb = np.asarray(lt_mod.render_sample(cornell, cfg, jnp.uint32(0),
                                         batch=8)) / 8
    # ceiling light region: top-center of the image
    top = fb[2:8, 16:32, 1].mean()
    bottom = fb[24:30, 16:32, 1].mean()
    assert top > bottom  # emitter at the ceiling dominates
