"""Veach-MLT engine: registry-driven mutations (largestep + lens +
multichain) vs PT statistical agreement — the coverage analogue of the
reference's vmlt regression configs (vmlt.c + vmlt_lens.h)."""

import jax.numpy as jnp
import numpy as np
import pytest

from corona13_tpu.samplers import pt as pt_mod
from corona13_tpu.samplers import vmlt as vmlt_mod

pytestmark = pytest.mark.slow


def test_vmlt_matches_pt(cornell):
    cfg = pt_mod.PTConfig(width=32, height=24, max_verts=4, mf=2,
                          use_nee=True)
    fb_m = vmlt_mod.render_sample(cornell, cfg, jnp.uint32(0),
                                  batch=24, chains=512)
    a = np.asarray(fb_m) / 24
    fb_pt = pt_mod.render_sample(cornell, cfg, jnp.uint32(100), batch=32)
    b = np.asarray(fb_pt) / 32
    assert np.isfinite(a).all()
    ratio = a[..., 1].mean() / b[..., 1].mean()
    assert abs(ratio - 1.0) < 0.08, ratio
    corr = np.corrcoef(a[..., 1].ravel(), b[..., 1].ravel())[0, 1]
    assert corr > 0.5, corr


def test_registry_weights_normalized():
    w = np.asarray([wt for _, wt in vmlt_mod.REGISTRY])
    assert (w > 0).all()
    assert abs(w.sum() - 1.0) < 1e-6
