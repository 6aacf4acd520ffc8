"""BSDF sample/eval/pdf consistency — the vmapped analogue of the
reference's battle test (corona-13 src/render.d/battletest.c +
regression/makebattletest.sh): for each material, check that

  * the pdf reported by ``sample`` matches ``pdf`` evaluated at the
    sampled direction,
  * weight * pdf == f (sample weight is f/pdf),
  * the pdf integrates to <= 1 over the sphere (MC),
  * white-furnace energy conservation for diffuse.
"""

import jax.numpy as jnp
import numpy as np

from corona13_tpu.models import bsdf
from corona13_tpu.ops import rng

MF = 4
N = 4096


def _make_sp(kind, roughness, n_rows=N, eta=1.5):
    ones = jnp.ones((n_rows, MF))
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n_rows, 3))
    return bsdf.ShadingPoint(
        kind=jnp.full((n_rows,), kind, jnp.int32),
        rd=ones * 0.8, rg=ones * 1.0, em=jnp.zeros((n_rows, MF)),
        roughness=jnp.full((n_rows,), roughness),
        eta_ratio=ones / eta,  # entering: n1/n2 = 1/eta
        fresnel_eta=ones * 0.2, fresnel_k=ones * 3.0,
        n=n, gn=n, inside=jnp.zeros((n_rows,), bool))


def _wi(theta_deg=40.0):
    t = np.radians(theta_deg)
    # propagation direction INTO the surface (downward onto +z normal)
    return jnp.broadcast_to(
        jnp.array([np.sin(t), 0.0, -np.cos(t)], jnp.float32), (N, 3))


def _rands(seed):
    pix = jnp.arange(N, dtype=jnp.uint32)
    return (rng.uniform(pix, 0, 0, seed), rng.uniform(pix, 0, 1, seed),
            rng.uniform(pix, 0, 2, seed))


def _check_sample_pdf_consistency(kind, roughness, tol=0.03):
    sp = _make_sp(kind, roughness)
    wi = _wi()
    r1, r2, rm = _rands(3)
    wo, pdf_s, w, mode = bsdf.bsdf_sample(sp, wi, r1, r2, rm)
    f, pdf_e = bsdf.bsdf_eval_pdf(sp, wi, wo)
    live = np.asarray(jnp.any(w > 0, axis=-1) &
                      ((mode & bsdf.MODE_SPECULAR) == 0))
    assert live.mean() > 0.5
    pdf_s, pdf_e = np.asarray(pdf_s), np.asarray(pdf_e)
    f, w = np.asarray(f), np.asarray(w)
    # pdf(sample) == pdf(eval) at wo
    rel = np.abs(pdf_s - pdf_e) / np.maximum(pdf_s, 1e-6)
    assert np.quantile(rel[live], 0.95) < tol, rel[live].max()
    # weight * pdf == f  (projected-solid-angle measure on both sides)
    rel2 = np.abs(w * pdf_s - f) / np.maximum(f, 1e-4)
    assert np.quantile(rel2[live], 0.95) < tol


def test_diffuse_consistency():
    _check_sample_pdf_consistency(bsdf.DIFFUSE, 1.0)


def test_rough_dielectric_consistency():
    _check_sample_pdf_consistency(bsdf.DIELECTRIC, 0.3)


def test_rough_metal_consistency():
    _check_sample_pdf_consistency(bsdf.METAL, 0.3)


def test_diffuse_furnace():
    """E[weight] over cosine samples = albedo (energy conservation)."""
    sp = _make_sp(bsdf.DIFFUSE, 1.0)
    wi = _wi()
    r1, r2, rm = _rands(11)
    wo, pdf, w, mode = bsdf.bsdf_sample(sp, wi, r1, r2, rm)
    mean_w = float(jnp.mean(w[..., 0]))
    assert abs(mean_w - 0.8) < 0.01


def test_pdf_integrates_to_at_most_one():
    """MC integral of pdf_proj * |cos| over uniform sphere directions ~ P(sample
    succeeds) <= 1 for each material."""
    for kind, rough in ((bsdf.DIFFUSE, 1.0), (bsdf.DIELECTRIC, 0.4),
                        (bsdf.METAL, 0.4)):
        sp = _make_sp(kind, rough, n_rows=1 << 15)
        t = np.radians(35.0)
        wi = jnp.broadcast_to(
            jnp.array([np.sin(t), 0.0, -np.cos(t)], jnp.float32), (1 << 15, 3))
        pix = jnp.arange(1 << 15, dtype=jnp.uint32)
        r1 = rng.uniform(pix, 1, 0)
        r2 = rng.uniform(pix, 1, 1)
        z = 1.0 - 2.0 * r1
        s = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
        phi = 2.0 * jnp.pi * r2
        wo = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)
        _, pdf = bsdf.bsdf_eval_pdf(sp, wi, wo)
        # pdf is in projected solid angle: d omega_perp = |cos| d omega
        integ = float(jnp.mean(pdf[..., 0] * jnp.abs(wo[..., 2])) * 4.0 * jnp.pi)
        assert integ < 1.05, (kind, integ)
        if kind == bsdf.DIFFUSE:
            assert integ > 0.9  # diffuse pdf should integrate to ~1


def test_dielectric_specular_refracts():
    sp = _make_sp(bsdf.DIELECTRIC, 0.0)
    wi = _wi(30.0)
    r1, r2, _ = _rands(7)
    # force transmission: r_mode = 1 (> fresnel ~ 0.04 at 30 deg)
    rm = jnp.ones((N,))
    wo, pdf, w, mode = bsdf.bsdf_sample(sp, wi, r1, r2, rm)
    wo = np.asarray(wo)
    assert (wo[:, 2] < 0).all()  # transmitted through the surface
    # Snell: sin(theta_t) = sin(30)/1.5
    sin_t = np.abs(wo[:, 0])
    np.testing.assert_allclose(sin_t, np.sin(np.radians(30)) / 1.5, atol=1e-4)
    assert (np.asarray(mode) & bsdf.MODE_TRANSMIT).all()
    assert (np.asarray(mode) & bsdf.MODE_SPECULAR).all()


def test_metal_mirror_reflects():
    sp = _make_sp(bsdf.METAL, 0.0)
    wi = _wi(30.0)
    r1, r2, rm = _rands(8)
    wo, pdf, w, mode = bsdf.bsdf_sample(sp, wi, r1, r2, rm)
    wo = np.asarray(wo)
    np.testing.assert_allclose(wo[:, 2], np.cos(np.radians(30)), atol=1e-5)
    np.testing.assert_allclose(wo[:, 0], np.sin(np.radians(30)), atol=1e-5)


def test_diffdiel_consistency_rough():
    _check_sample_pdf_consistency(bsdf.DIFFDIEL, 0.4)


def test_diffdiel_consistency_near_smooth():
    """Smooth reflect lobe goes specular; the transmit lobe (diffuse)
    still passes eval/pdf consistency."""
    _check_sample_pdf_consistency(bsdf.DIFFDIEL, 0.0)


def test_diffdiel_transmits_diffusely():
    """Transmission goes into the surface (cos_out < 0) with a cosine
    lobe; reflection stays above (reference diffdiel.c sample)."""
    sp = _make_sp(bsdf.DIFFDIEL, 0.2)
    wi = _wi()
    r1, r2, rm = _rands(11)
    wo, pdf, w, mode = bsdf.bsdf_sample(sp, wi, r1, r2, rm)
    live = np.asarray(jnp.any(w > 0, axis=-1))
    trans = np.asarray((mode & bsdf.MODE_TRANSMIT) > 0) & live
    refl = np.asarray((mode & bsdf.MODE_REFLECT) > 0) & live
    cos_out = np.asarray(wo)[:, 2]
    assert trans.mean() > 0.4          # 1-R dominates at n_d=1.5
    assert (cos_out[trans] < 0).all()
    assert (cos_out[refl] > 0).all()
    # energy: weight bounded by rg for both branches
    assert np.asarray(w).max() <= 1.0 + 1e-4


def test_hair_sample_eval_pdf_consistency():
    """Fiber BSDF battletest: sampled directions must reproduce their own
    eval/pdf (the reference's makebattletest (pdf-epdf)^2 gate for
    src/shaders/hair.c, as a property test)."""
    rng_ = np.random.default_rng(5)
    n_rows = 2048
    sp = bsdf.ShadingPoint(
        kind=jnp.full((n_rows,), bsdf.HAIR, jnp.int32),
        rd=jnp.ones((n_rows, MF)) * 0.6, rg=jnp.ones((n_rows, MF)) * 0.35,
        em=jnp.zeros((n_rows, MF)),
        roughness=jnp.full((n_rows,), 0.15),
        eta_ratio=jnp.ones((n_rows, MF)),
        fresnel_eta=jnp.ones((n_rows, MF)), fresnel_k=jnp.ones((n_rows, MF)),
        n=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n_rows, 3)),
        gn=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n_rows, 3)),
        inside=jnp.zeros((n_rows,), bool),
        tangent=jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (n_rows, 3)))
    wi = jnp.broadcast_to(jnp.asarray(
        np.array([0.5, 0.2, -0.84]) / np.linalg.norm([0.5, 0.2, -0.84]),
        jnp.float32), (n_rows, 3))
    r1 = jnp.asarray(rng_.uniform(0, 1, n_rows).astype(np.float32))
    r2 = jnp.asarray(rng_.uniform(0, 1, n_rows).astype(np.float32))
    rm = jnp.asarray(rng_.uniform(0, 1, n_rows).astype(np.float32))
    wo, pdf_s, w = bsdf.hair_sample(sp, wi, r1, r2, rm)
    f_e, pdf_e = bsdf.hair_eval_pdf(sp, wi, wo)
    np.testing.assert_allclose(np.asarray(pdf_s), np.asarray(pdf_e),
                               rtol=2e-3, atol=1e-6)
    # w must equal f/pdf_proj where defined
    ratio = np.asarray(f_e / jnp.maximum(pdf_e, 1e-12))
    np.testing.assert_allclose(np.asarray(w), ratio, rtol=5e-3, atol=1e-5)
    # energy: E[S/pdf_w] = integral S = rd + rg (both lobes normalized)
    est = np.asarray(w).mean()
    assert abs(est - 0.95) < 0.08, est


def test_hair_pdf_normalized():
    """hair_pdf_w integrates to 1 over the sphere (MC with uniform dirs)."""
    rng_ = np.random.default_rng(7)
    n_rows = 8192
    d = rng_.normal(size=(n_rows, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    sp = bsdf.ShadingPoint(
        kind=jnp.full((n_rows,), bsdf.HAIR, jnp.int32),
        rd=jnp.ones((n_rows, MF)) * 0.6, rg=jnp.ones((n_rows, MF)) * 0.35,
        em=jnp.zeros((n_rows, MF)),
        roughness=jnp.full((n_rows,), 0.2),
        eta_ratio=jnp.ones((n_rows, MF)),
        fresnel_eta=jnp.ones((n_rows, MF)), fresnel_k=jnp.ones((n_rows, MF)),
        n=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n_rows, 3)),
        gn=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n_rows, 3)),
        inside=jnp.zeros((n_rows,), bool),
        tangent=jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (n_rows, 3)))
    wi = jnp.broadcast_to(jnp.array([0.3, -0.1, -0.95]) /
                          np.linalg.norm([0.3, -0.1, -0.95]), (n_rows, 3))
    pdf = np.asarray(bsdf.hair_pdf_w(sp, wi, jnp.asarray(d, jnp.float32)))
    est = pdf.mean() * 4.0 * np.pi
    assert abs(est - 1.0) < 0.05, est


def test_hair_render_smoke():
    """End-to-end: line prims with the hair material render finite nonzero
    radiance under a bright sky (regression 0060_hair coverage as a
    wiring smoke test: tangent threading + dispatch)."""
    import numpy as np
    from corona13_tpu import testing, scene as scene_mod
    from corona13_tpu.io import cam as cam_io
    from corona13_tpu.samplers import pt as pt_mod
    M = scene_mod._ResolvedMat
    mats = [M(kind=bsdf.HAIR, d_rgb=(0.6, 0.4, 0.3),
              g_rgb=(0.3, 0.3, 0.3), roughness=0.2)]
    rng_ = np.random.default_rng(3)
    n_fibers = 64
    base = rng_.uniform(-2, 2, (n_fibers, 2))
    v0 = np.stack([base[:, 0], base[:, 1], np.full(n_fibers, 14.0)], -1)
    v1 = v0 + rng_.normal(0, 0.1, (n_fibers, 3)) + np.array([0, 3.0, 0])
    line_vtx = np.stack([v0, v1], axis=1).astype(np.float32)
    line_radii = np.full((n_fibers, 2), 0.06, np.float32)
    tri_v = np.array([[[1e4, 1e4, 1e4], [1e4 + 1, 1e4, 1e4],
                       [1e4, 1e4 + 1, 1e4]]], np.float32)
    cam = cam_io.CameraData(
        pos=np.zeros(3, np.float32), pos_t1=np.zeros(3, np.float32),
        orient=np.array([1, 0, 0, 0], np.float32),
        orient_t1=np.array([1, 0, 0, 0], np.float32), focus=14.0)
    sc = testing.assemble_scene(tri_v, np.array([0], np.int32), mats, cam,
                                sky_rgb=(2.0, 2.0, 2.0),
                                line_vtx=line_vtx, line_radii=line_radii,
                                line_sh=np.zeros(n_fibers, np.int32))
    cfg = pt_mod.PTConfig(width=32, height=24, max_verts=4, mf=2,
                          use_nee=False)
    img = np.asarray(pt_mod.render_sample(sc, cfg, jnp.uint32(0), batch=2))
    assert np.isfinite(img).all()
    assert img.max() > 0
