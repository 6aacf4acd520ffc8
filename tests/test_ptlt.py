"""ptlt (pt + NEE + light-tracing MIS family via restricted bdpt) vs ptdl.

Reference analogue: src/sampler.d/ptlt.c gated by regression/0013_ptlt
(same scene as 0010_pt)."""

import jax.numpy as jnp
import pytest
import numpy as np

from corona13_tpu.samplers import ptlt as ptlt_mod
from corona13_tpu.samplers import pt as pt_mod

pytestmark = pytest.mark.slow


def _mean_image(render, cfg, scene, samples, batch):
    fb = jnp.zeros((cfg.height, cfg.width, 3))
    for s in range(samples):
        fb = fb + render(scene, cfg, jnp.uint32(s), batch=batch)
    return np.asarray(fb) / (samples * batch)


def test_ptlt_matches_ptdl(cornell):
    cfg = pt_mod.PTConfig(width=48, height=32, max_verts=5, mf=2,
                          use_nee=True, rr_start=99)
    a = _mean_image(ptlt_mod.render_sample, cfg, cornell, 3, 8)
    b = _mean_image(pt_mod.render_sample, cfg, cornell, 3, 16)
    assert np.isfinite(a).all()
    assert a[..., 1].mean() > 0.0
    ratio = a[..., 1].mean() / b[..., 1].mean()
    assert abs(ratio - 1.0) < 0.12, ratio
    corr = np.corrcoef(a[..., 1].ravel(), b[..., 1].ravel())[0, 1]
    assert corr > 0.5, corr


def test_ptlt_lt_technique_alive(cornell):
    """The lt member of the family must contribute (not be MIS-zeroed)."""
    from corona13_tpu.samplers import bdpt as bdpt_mod
    cfg = pt_mod.PTConfig(width=24, height=16, max_verts=4, mf=2,
                          use_nee=True, rr_start=99)
    strat = ptlt_mod.strategy_set(cfg)
    full = np.zeros((cfg.height, cfg.width, 3))
    t1 = np.zeros_like(full)
    for i in range(4):
        full += np.asarray(bdpt_mod.render_sample(
            cornell, cfg, jnp.uint32(i), strategies=strat))
        for s in range(1, cfg.max_verts - 1):
            if (s, 1) in strat:
                t1 += np.asarray(bdpt_mod.render_sample(
                    cornell, cfg, jnp.uint32(i), only=(s, 1),
                    strategies=strat))
    share = t1.sum() / max(full.sum(), 1e-9)
    assert share > 0.02, f'lt technique dead in ptlt: {share:.2e}'
