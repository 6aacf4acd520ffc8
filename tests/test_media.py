"""Homogeneous participating media: free-flight statistics, HG phase,
transmittance, and end-to-end interior media in the path tracer."""

import jax.numpy as jnp
import pytest
import dataclasses
import numpy as np

from corona13_tpu import render as render_mod
from corona13_tpu import testing
from corona13_tpu.models import medium
from corona13_tpu.samplers import pt as pt_mod

pytestmark = pytest.mark.slow


def _mats_with_medium(mfp=(2.0, 2.0, 2.0), albedo=(0.8, 0.8, 0.8), g=0.0):
    sc = testing.cornell_scene(sphere='subsurf')
    return sc.materials


def test_free_flight_statistics():
    mats = _mats_with_medium()
    n = 1 << 15
    med = jnp.full((n,), 4, jnp.int32)   # the subsurf sphere material
    lam = jnp.broadcast_to(jnp.asarray([550.0, 550.0]), (n, 2))
    st = float(medium.sigma_t(mats, med, lam)[0, 0])
    assert st > 0
    t_hit = jnp.full((n,), 1.0)
    r = jnp.asarray(np.random.default_rng(0).uniform(0, 1, n).astype(np.float32))
    scat, dist, w = medium.sample_dist(mats, med, lam, t_hit, r)
    # P(scatter before t) = 1 - exp(-sigma_t * t)
    expect = 1.0 - np.exp(-st * 1.0)
    assert abs(float(jnp.mean(scat)) - expect) < 0.01
    # scattered distances follow the truncated exponential
    d = np.asarray(dist)[np.asarray(scat)]
    assert (d < 1.0).all()
    # pass-through weight = T_l / T_h = 1 for equal lanes
    wp = np.asarray(w)[~np.asarray(scat)]
    np.testing.assert_allclose(wp, 1.0, rtol=1e-5)


def test_vacuum_is_identity():
    mats = _mats_with_medium()
    n = 256
    med = jnp.full((n,), -1, jnp.int32)
    lam = jnp.broadcast_to(jnp.asarray([550.0, 550.0]), (n, 2))
    scat, dist, w = medium.sample_dist(mats, med, lam, jnp.full((n,), 5.0),
                                       jnp.full((n,), 0.99))
    assert not bool(jnp.any(scat))
    np.testing.assert_allclose(np.asarray(w), 1.0)
    tr = medium.transmittance(mats, med, lam, jnp.full((n,), 3.0))
    np.testing.assert_allclose(np.asarray(tr), 1.0)


def test_hg_sampling():
    n = 1 << 15
    r = np.random.default_rng(1)
    r1 = jnp.asarray(r.uniform(0, 1, n).astype(np.float32))
    r2 = jnp.asarray(r.uniform(0, 1, n).astype(np.float32))
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    for g in (0.0, 0.3, -0.5, 0.85):
        wo, pdf = medium.hg_sample(jnp.full((n,), g), wi, r1, r2)
        cos = np.asarray(wo[:, 2])
        assert abs(cos.mean() - g) < 0.01, g
        # unit directions
        np.testing.assert_allclose(np.linalg.norm(np.asarray(wo), axis=-1),
                                   1.0, atol=1e-5)
        # pdf == phase value at the sampled direction
        ph = np.asarray(medium.hg_phase(jnp.full((n,), g), jnp.asarray(cos)))
        np.testing.assert_allclose(np.asarray(pdf), ph, rtol=2e-4)


def test_hg_phase_normalized():
    n = 1 << 15
    r = np.random.default_rng(2)
    cos = jnp.asarray(r.uniform(-1, 1, n).astype(np.float32))
    for g in (0.0, 0.5, -0.7):
        val = medium.hg_phase(jnp.full((n,), g), cos)
        integral = float(jnp.mean(val)) * 4.0 * jnp.pi
        assert abs(integral - 1.0) < 0.03, (g, integral)


def test_absorbing_interior_darkens():
    """A dielectric sphere with an absorbing interior transmits less light
    than the same sphere with vacuum interior."""
    cfg = pt_mod.PTConfig(width=48, height=32, max_verts=8, mf=2,
                          use_nee=True, media=True)
    cfg_novac = pt_mod.PTConfig(width=48, height=32, max_verts=8, mf=2,
                                use_nee=True, media=False)
    sc_abs = testing.cornell_scene(sphere='absorb')
    sc_clear = testing.cornell_scene(sphere='dielectric')
    a = render_mod.render(sc_abs, cfg, spp=24).image_xyz
    b = render_mod.render(sc_clear, cfg_novac, spp=24).image_xyz
    assert np.isfinite(a).all()
    # sphere region: center-bottom of the image
    ya = a[18:28, 16:32, 1].mean()
    yb = b[18:28, 16:32, 1].mean()
    assert ya < yb * 0.9, (ya, yb)


def test_media_flag_noop_without_media():
    """media=True on a scene with no interiors must match media=False."""
    sc = testing.cornell_scene(sphere='diffuse')
    cfg_on = pt_mod.PTConfig(width=32, height=24, max_verts=4, mf=2,
                             media=True)
    cfg_off = pt_mod.PTConfig(width=32, height=24, max_verts=4, mf=2,
                              media=False)
    a = pt_mod.render_sample(sc, cfg_on, jnp.uint32(0))
    b = pt_mod.render_sample(sc, cfg_off, jnp.uint32(0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_subsurf_scene_finite():
    sc = testing.cornell_scene(sphere='subsurf')
    cfg = pt_mod.PTConfig(width=32, height=24, max_verts=8, mf=2,
                          use_nee=True, media=True)
    img = render_mod.render(sc, cfg, spp=8).image_xyz
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_media_stack_semantics():
    """Priority-stack push/pop/current (reference _path_edge_medium,
    src/pathspace.c:80-115: smallest id wins)."""
    import jax.numpy as jnp
    from corona13_tpu.models import medium as m
    n = 4
    t = jnp.zeros((n,), jnp.int32)
    st = m.stack_init(t)
    assert (np.asarray(m.stack_current(st)) == -1).all()
    yes = jnp.ones((n,), bool)
    no = jnp.zeros((n,), bool)
    st = m.stack_push(st, t + 5, yes)
    assert (np.asarray(m.stack_current(st)) == 5).all()
    st = m.stack_push(st, t + 2, yes)          # higher priority (smaller)
    assert (np.asarray(m.stack_current(st)) == 2).all()
    st = m.stack_push(st, t + 7, no)           # masked: no-op
    assert (np.asarray(m.stack_current(st)) == 2).all()
    st = m.stack_pop(st, t + 2, yes)           # leave inner -> back to 5
    assert (np.asarray(m.stack_current(st)) == 5).all()
    st = m.stack_pop(st, t + 5, yes)
    assert (np.asarray(m.stack_current(st)) == -1).all()
    # duplicate entries pop one at a time
    st = m.stack_push(st, t + 3, yes)
    st = m.stack_push(st, t + 3, yes)
    st = m.stack_pop(st, t + 3, yes)
    assert (np.asarray(m.stack_current(st)) == 3).all()


def test_nested_media_transmittance():
    """0090_vstack analogue: two nested NULL-boundary boxes with different
    absorbing interiors; the inner (smaller material id) wins in the
    overlap and the outer resumes after exit.  Expected pixel value =
    sky * exp(-(0.1*2 + 0.5*6 + 0.1*2) * 0.1-scaled...) computed below."""
    import jax.numpy as jnp
    from corona13_tpu import testing, scene as scene_mod
    from corona13_tpu.samplers import pt as pt_mod

    def box(z0, z1, s):
        lo = np.array([-s, -s, z0], np.float32)
        hi = np.array([s, s, z1], np.float32)
        c = np.array([[lo[0],lo[1],lo[2]],[hi[0],lo[1],lo[2]],
                      [hi[0],hi[1],lo[2]],[lo[0],hi[1],lo[2]],
                      [lo[0],lo[1],hi[2]],[hi[0],lo[1],hi[2]],
                      [hi[0],hi[1],hi[2]],[lo[0],hi[1],hi[2]]], np.float32)
        f = [(0,2,1),(0,3,2),(4,5,6),(4,6,7),(0,1,5),(0,5,4),
             (2,3,7),(2,7,6),(1,2,6),(1,6,5),(0,4,7),(0,7,3)]
        return c[np.array(f)]

    M = scene_mod._ResolvedMat
    # mat 0 = inner medium boundary (sigma 0.125), mat 1 = outer (0.05)
    mats = [M(kind=scene_mod.NULL, med_mfp_rgb=(8.0, 8.0, 8.0),
              med_albedo_rgb=(0, 0, 0), med_enabled=True),
            M(kind=scene_mod.NULL, med_mfp_rgb=(20.0, 20.0, 20.0),
              med_albedo_rgb=(0, 0, 0), med_enabled=True)]
    tri_inner = box(12.0, 18.0, 4.0)
    tri_outer = box(10.0, 20.0, 6.0)
    tri = np.concatenate([tri_inner, tri_outer])
    shs = np.array([0] * 12 + [1] * 12, np.int32)
    from corona13_tpu.io import cam as cam_io
    cam = cam_io.CameraData(
        pos=np.zeros(3, np.float32), pos_t1=np.zeros(3, np.float32),
        orient=np.array([1, 0, 0, 0], np.float32),
        orient_t1=np.array([1, 0, 0, 0], np.float32), focus=15.0)
    sc = testing.assemble_scene(tri, shs, mats, cam, sky_rgb=(1.0, 1.0, 1.0))
    cfg = pt_mod.PTConfig(width=16, height=12, max_verts=8, mf=2,
                          media=True, use_nee=False)
    # baseline: identical geometry, media disabled (pure pass-through) —
    # normalizes away the camera's cos^4 vignetting per pixel
    mats0 = [dataclasses.replace(m, med_enabled=False) for m in mats]
    sc0 = testing.assemble_scene(tri, shs, mats0, cam, sky_rgb=(1, 1, 1))
    fb = 0.0
    fb0 = 0.0
    spp = 96
    for s in range(spp // 8):
        fb = fb + np.asarray(pt_mod.render_sample(sc, cfg, jnp.uint32(s),
                                                  batch=8))
        fb0 = fb0 + np.asarray(pt_mod.render_sample(sc0, cfg, jnp.uint32(s),
                                                    batch=8))
    # center pixels: straight through both boxes; absorbing media kill
    # paths stochastically, so compare means over many progressions
    ratio = fb[4:8, 6:10, 1].mean() / fb0[4:8, 6:10, 1].mean()
    tau = 0.05 * 2.0 + 0.125 * 6.0 + 0.05 * 2.0
    np.testing.assert_allclose(ratio, np.exp(-tau), rtol=0.15)


def test_equiangular_pdf_normalized():
    """equiangular_sample's pdf integrates to 1 over [0, t_max]."""
    import numpy as np
    from corona13_tpu.models import medium as medium_mod
    org = jnp.asarray([[0.0, 0.0, 0.0]])
    w = jnp.asarray([[1.0, 0.0, 0.0]])
    light = jnp.asarray([[2.0, 1.5, 0.0]])
    t_max = jnp.asarray([5.0])
    # inverse-CDF samples at stratified u must integrate 1/pdf-weighted
    # density to t_max (change of variables check)
    us = np.linspace(1e-4, 1 - 1e-4, 4096)
    ts, pdfs = [], []
    for u in us:
        t, p = medium_mod.equiangular_sample(org, w, light, t_max,
                                             jnp.asarray([u]))
        ts.append(float(t[0])); pdfs.append(float(p[0]))
    ts, pdfs = np.array(ts), np.array(pdfs)
    assert (pdfs > 0).all() and (ts >= 0).all() and (ts <= 5.0).all()
    # MC estimate of integral of pdf over distance: E[pdf/pdf] = 1, and
    # int pdf dt via the sorted samples' spacing
    est = np.trapezoid(pdfs, ts)
    assert abs(est - 1.0) < 0.05, est
    # concentration near the closest point to the light (t = 2)
    assert abs(np.median(ts) - 2.0) < 0.5


def test_equiangular_matches_default_nee(cornell_subsurf_scene=None):
    """Equiangular volume NEE agrees with the free-flight-vertex NEE in
    expectation (same integral, different distance sampler)."""
    from corona13_tpu import testing
    sc = testing.cornell_scene(sphere='subsurf')
    cfg0 = pt_mod.PTConfig(width=24, height=16, max_verts=8, mf=2,
                           use_nee=True, media=True)
    cfg1 = cfg0.replace(equiangular=True)
    a = b = 0.0
    for s in range(4):
        a = a + np.asarray(pt_mod.render_sample(sc, cfg0, jnp.uint32(s),
                                                batch=2))
        b = b + np.asarray(pt_mod.render_sample(sc, cfg1, jnp.uint32(s),
                                                batch=2))
    ratio = b.mean() / a.mean()
    assert np.isfinite(b).all()
    assert abs(ratio - 1.0) < 0.1, ratio
