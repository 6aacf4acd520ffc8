"""BDPT: cross-technique agreement with PT/PTDL (the regression suite's
0014_bdpt coverage — same scene family, statistical comparison)."""

import jax.numpy as jnp
import numpy as np

from corona13_tpu.samplers import bdpt as bdpt_mod
from corona13_tpu.samplers import pt as pt_mod


def _mean_image(render, cfg, scene, samples, batch):
    fb = jnp.zeros((cfg.height, cfg.width, 3))
    for s in range(samples):
        fb = fb + render(scene, cfg, jnp.uint32(s), batch=batch)
    return np.asarray(fb) / (samples * batch)


def test_bdpt_matches_pt(cornell):
    cfg = pt_mod.PTConfig(width=48, height=32, max_verts=5, mf=2,
                          use_nee=True, rr_start=99)
    a = _mean_image(bdpt_mod.render_sample, cfg, cornell, 3, 8)
    b = _mean_image(pt_mod.render_sample, cfg, cornell, 3, 16)
    assert np.isfinite(a).all()
    assert a[..., 1].mean() > 0.0
    ratio = a[..., 1].mean() / b[..., 1].mean()
    assert abs(ratio - 1.0) < 0.12, ratio
    corr = np.corrcoef(a[..., 1].ravel(), b[..., 1].ravel())[0, 1]
    assert corr > 0.5, corr


def test_bdpt_specular_scene(cornell_dielectric):
    """Dielectric sphere: BDPT must stay finite and within statistical
    range of PT (specular vertices excluded from connections)."""
    cfg = pt_mod.PTConfig(width=32, height=24, max_verts=5, mf=2,
                          use_nee=True, rr_start=99)
    a = _mean_image(bdpt_mod.render_sample, cfg, cornell_dielectric, 2, 8)
    b = _mean_image(pt_mod.render_sample, cfg, cornell_dielectric, 2, 16)
    assert np.isfinite(a).all()
    ratio = a[..., 1].mean() / b[..., 1].mean()
    assert abs(ratio - 1.0) < 0.25, ratio
