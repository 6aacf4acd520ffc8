"""Image-based environment lighting: evaluation, importance sampling,
and NEE/MIS correctness."""

import jax.numpy as jnp
import numpy as np

from corona13_tpu import render as render_mod
from corona13_tpu import testing
from corona13_tpu.models import envmap
from corona13_tpu.samplers import pt as pt_mod
from corona13_tpu.spectral import cie


def test_eval_constant():
    env = envmap.build(np.full((16, 32, 3), 0.7, np.float32))
    d = jnp.asarray(np.random.default_rng(0).normal(size=(256, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    lam = jnp.broadcast_to(jnp.asarray([450.0, 550.0, 650.0, 600.0]), (256, 4))
    r = np.asarray(envmap.eval_radiance(env, d, lam))
    assert abs(r.mean() - 0.7) < 0.05
    assert r.std() < 0.1


def test_sample_pdf_consistency():
    """E[g(d)] under importance sampling == uniform-MC integral of
    g * pdf over the sphere."""
    rgb = envmap.make_gradient_sky(sun_dir=(0.5, 0.3, 0.8), sun_radiance=40)
    env = envmap.build(rgb)
    n = 1 << 15
    r = np.random.default_rng(1)
    r1 = jnp.asarray(r.uniform(0, 1, n).astype(np.float32))
    r2 = jnp.asarray(r.uniform(0, 1, n).astype(np.float32))
    d, pdf = envmap.sample(env, r1, r2)
    g = lambda dd: np.exp(np.asarray(dd[:, 2]))       # arbitrary smooth test fn
    est_s = g(d).mean()
    du = r.normal(size=(n, 3)).astype(np.float32)
    du /= np.linalg.norm(du, axis=-1, keepdims=True)
    pu = np.asarray(envmap.pdf(env, jnp.asarray(du)))
    est_u = (g(jnp.asarray(du)) * pu).mean() * 4 * np.pi
    assert abs(est_s - est_u) / est_u < 0.05, (est_s, est_u)
    # sampling concentrates on the sun
    sd = np.asarray([0.5, 0.3, 0.8]) / np.linalg.norm([0.5, 0.3, 0.8])
    frac_sun = (np.asarray(d) @ sd > 0.995).mean()
    assert frac_sun > 0.1  # sun covers ~0.1% of the sphere but most energy


def test_constant_envmap_matches_const_sky():
    sc_const = testing.furnace_scene(albedo=0.5, emission=0.7)
    sc_env = sc_const.with_envmap(np.full((16, 32, 3), 0.7, np.float32))
    cfg = pt_mod.PTConfig(width=32, height=24, max_verts=4, mf=2,
                          use_nee=False)
    a = render_mod.render(sc_const, cfg, spp=24).image_xyz
    b = render_mod.render(sc_env, cfg, spp=24).image_xyz
    assert abs(a.mean() - b.mean()) / a.mean() < 0.05


def test_env_nee_matches_pt():
    """Sun-disk envmap: NEE+MIS estimate == BSDF-only estimate."""
    rgb = envmap.make_gradient_sky(top=(0.05, 0.05, 0.08),
                                   bottom=(0.02, 0.02, 0.02),
                                   sun_dir=(0.3, 0.2, 0.9),
                                   sun_radiance=200.0)
    base = testing.furnace_scene(albedo=0.6, emission=0.0)
    sc = base.with_envmap(rgb)
    cfg_nee = pt_mod.PTConfig(width=32, height=24, max_verts=4, mf=2,
                              use_nee=True)
    cfg_pt = pt_mod.PTConfig(width=32, height=24, max_verts=4, mf=2,
                             use_nee=False)
    a = render_mod.render(sc, cfg_nee, spp=64).image_xyz
    b = render_mod.render(sc, cfg_pt, spp=256, batch=128).image_xyz
    # compare on the sphere region (sun lighting via NEE vs lucky hits)
    ya = a[8:16, 10:22, 1].mean()
    yb = b[8:16, 10:22, 1].mean()
    assert abs(ya - yb) / max(yb, 1e-9) < 0.12, (ya, yb)
    # NEE should be much less noisy on the sphere
    va = a[8:16, 10:22, 1].var()
    vb = b[8:16, 10:22, 1].var()
    assert np.isfinite(va) and np.isfinite(vb)