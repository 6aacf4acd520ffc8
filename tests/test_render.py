"""End-to-end render tests on procedural scenes (CPU, small resolutions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corona13_tpu import render as render_mod
from corona13_tpu import testing
from corona13_tpu.samplers import pt as pt_mod


def _render(scene, spp=4, w=64, h=48, **kw):
    cfg = pt_mod.PTConfig(width=w, height=h, max_verts=kw.pop('max_verts', 5),
                          mf=4, **kw)
    return render_mod.render(scene, cfg, spp=spp)


def test_cornell_smoke(cornell):
    res = _render(cornell, spp=4)
    img = res.image_xyz
    assert np.isfinite(img).all()
    assert img.max() > 0
    assert img.min() >= 0
    # interior illuminated: majority of pixels non-black
    assert (img.sum(axis=-1) > 0).mean() > 0.9


def test_pt_vs_ptdl_agree(cornell):
    """PT (BSDF sampling only) and PTDL (NEE+MIS) estimate the same
    integral; means must agree within MC noise — the regression suite's
    cross-technique consistency, as a statistical test."""
    cfg_pt = pt_mod.PTConfig(width=48, height=32, max_verts=4, mf=4,
                             use_nee=False)
    cfg_dl = pt_mod.PTConfig(width=48, height=32, max_verts=4, mf=4,
                             use_nee=True)
    a = render_mod.render(cornell, cfg_pt, spp=96, batch=96).image_xyz
    b = render_mod.render(cornell, cfg_dl, spp=32, batch=32).image_xyz
    ma, mb = a.mean(), b.mean()
    assert abs(ma - mb) / max(mb, 1e-9) < 0.08, (ma, mb)


def test_furnace():
    """White furnace: an albedo-1 diffuse sphere under a constant sky is
    indistinguishable from the sky — compare the SAME pixels with and
    without the sphere (comparing different pixels would measure the
    thin-lens cos^4 vignetting instead)."""
    cfg = pt_mod.PTConfig(width=32, height=24, max_verts=4, mf=4,
                          use_nee=False, rr_start=99)
    with_s = testing.furnace_scene(albedo=1.0, emission=1.0)
    no_s = testing.furnace_scene(albedo=1.0, emission=1.0, sphere=False)
    a = render_mod.render(with_s, cfg, spp=32).image_xyz[..., 1]
    b = render_mod.render(no_s, cfg, spp=32).image_xyz[..., 1]
    center_a = a[10:14, 14:18].mean()
    center_b = b[10:14, 14:18].mean()
    assert center_b > 0
    assert abs(center_a - center_b) / center_b < 0.03, (center_a, center_b)

    # absorption sanity: albedo 0.5 -> sphere = half the sky radiance
    half = testing.furnace_scene(albedo=0.5, emission=1.0)
    c = render_mod.render(half, cfg, spp=32).image_xyz[..., 1]
    center_c = c[10:14, 14:18].mean()
    assert abs(center_c - 0.5 * center_b) / center_b < 0.03, (center_c, center_b)


def test_mf_lanes_consistent(cornell):
    """MF=1 and MF=4 estimate the same image (hero MIS correctness)."""
    cfg1 = pt_mod.PTConfig(width=32, height=24, max_verts=4, mf=1)
    cfg4 = pt_mod.PTConfig(width=32, height=24, max_verts=4, mf=4)
    a = render_mod.render(cornell, cfg1, spp=64, batch=64).image_xyz
    b = render_mod.render(cornell, cfg4, spp=16, batch=16).image_xyz
    assert abs(a.mean() - b.mean()) / b.mean() < 0.1


def test_determinism(cornell):
    cfg = pt_mod.PTConfig(width=32, height=24, max_verts=4, mf=4)
    a = render_mod.render(cornell, cfg, spp=2).fb
    b = render_mod.render(cornell, cfg, spp=2).fb
    np.testing.assert_array_equal(a, b)


def test_dielectric_scene_finite(cornell_dielectric):
    res = _render(cornell_dielectric, spp=4, max_verts=8)
    img = res.image_xyz
    assert np.isfinite(img).all()
    assert img.max() > 0
