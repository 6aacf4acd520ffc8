"""Differentiability: pixel gradients vs finite differences.

The north-star acceptance gate (BASELINE.md): gradients of the rendered
image w.r.t. shader/medium/camera parameters must match finite
differences.  The estimator is *detached* (Zeltner et al. taxonomy):
sampled directions/distances and all pdfs are stop-gradiented, and every
weight is computed as attached-f / detached-pdf (models/bsdf.py
bsdf_sample tail, models/medium.py sample_dist), which makes the
gradient unbiased for any parameter whose effect enters through the
integrand VALUE at fixed sample locations:

  * linear scales (albedo d_mul, emission e_mul, sky, exposure): exact
    per-sample — FD matches to float precision under common random
    numbers (test_grad_matches_fd).
  * medium sigma_t via transmittance: unbiased in expectation — FD
    matches statistically (test_grad_medium_sigma_matches_fd).
  * GGX roughness / Fresnel IOR terms: unbiased for the value part;
    *biased* for the part where the parameter moves the sampled
    directions themselves (lobe-width transport, refraction-direction
    shift) because the hit geometry behind a moved direction is not
    differentiated (the BVH hit is a constant of the backward pass).
    These carry finite, stable gradients (test_grad_nonlinear_finite)
    whose residual vs FD is documented in the test body — closing it
    needs reparameterized ray derivatives (Loubet/Mitsuba-style), which
    is future work, not a silent wrong number: the NaN and
    exactly-zero-gradient failure modes are what these tests pin down.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corona13_tpu import testing
from corona13_tpu.samplers import pt as pt_mod

pytestmark = pytest.mark.slow

CFG = pt_mod.PTConfig(width=24, height=16, max_verts=4, mf=2, use_nee=True)


def _loss_fn(scene, leaf):
    """Build f(theta) = mean image with materials.<leaf> scaled by theta."""
    def f(theta):
        mats = getattr(scene.materials, leaf)
        sc = scene.replace(materials=scene.materials.replace(
            **{leaf: mats * theta}))
        fb = pt_mod.render_sample(sc, CFG, jnp.uint32(0))
        return jnp.mean(fb)
    return f


@pytest.mark.parametrize('leaf', ['e_mul', 'd_mul'])
def test_grad_matches_fd(cornell, leaf):
    f = _loss_fn(cornell, leaf)
    g = float(jax.grad(f)(jnp.float32(1.0)))
    eps = 1e-3
    fd = (float(f(jnp.float32(1.0 + eps))) - float(f(jnp.float32(1.0 - eps)))) / (2 * eps)
    assert np.isfinite(g)
    assert abs(g - fd) <= 2e-3 * max(abs(fd), 1e-6) + 1e-7, (g, fd)
    assert abs(g) > 0  # parameter actually influences the image


def test_grad_sky_emission():
    sc = testing.furnace_scene(albedo=0.5, emission=1.0)

    def f(theta):
        s2 = sc.replace(sky_mul=sc.sky_mul * theta)
        fb = pt_mod.render_sample(s2, CFG, jnp.uint32(0))
        return jnp.mean(fb)

    g = float(jax.grad(f)(jnp.float32(1.0)))
    eps = 1e-3
    fd = (float(f(jnp.float32(1.0 + eps))) - float(f(jnp.float32(1.0 - eps)))) / (2 * eps)
    # sky enters linearly through every path suffix: grad == f(1) value-ish;
    # FD agreement is the gate
    assert abs(g - fd) <= 2e-3 * abs(fd), (g, fd)


def test_grad_nonlinear_finite():
    """Nonlinear shader/medium/camera parameters: gradients must be
    finite (regression: NaN via fresnel 0/0 on masked lanes) and the
    dielectric-IOR gradient nonzero (regression: the analytic F/(choice
    prob) cancellation silently zeroed it).

    Measured bias bound of the detached estimator (cornell + metal
    sphere, 24x16, 12 seeds): d/d(roughness) AD = -0.0026 +- 0.0007 vs
    FD secant +0.0021 +- 0.0017 — the lobe-width transport term
    (sampled-direction dependence) dominates and is not differentiated;
    same class as the IOR refraction-direction shift (AD -0.0070 vs FD
    +0.0016 on a rough-dielectric sphere).  See module docstring."""
    cfg = pt_mod.PTConfig(width=16, height=12, max_verts=4, mf=2,
                          use_nee=True)
    cfg_med = pt_mod.PTConfig(width=16, height=12, max_verts=8, mf=2,
                              use_nee=True, media=True)
    cases = []

    sc_m = testing.cornell_scene(sphere='metal')
    cases.append(('roughness', cfg, lambda t: sc_m.replace(
        materials=sc_m.materials.replace(
            roughness=sc_m.materials.roughness * t))))
    sc_d = testing.cornell_scene(sphere='dielectric')
    cases.append(('ior_nd', cfg, lambda t: sc_d.replace(
        materials=sc_d.materials.replace(
            ior_nd=sc_d.materials.ior_nd * t))))
    sc_s = testing.cornell_scene(sphere='subsurf')
    cases.append(('med_sigma', cfg_med, lambda t: sc_s.replace(
        materials=sc_s.materials.replace(
            med_mut_mul=sc_s.materials.med_mut_mul * t))))
    cases.append(('med_g', cfg_med, lambda t: sc_s.replace(
        materials=sc_s.materials.replace(
            med_g=sc_s.materials.med_g * t))))
    base = testing.cornell_scene()
    cases.append(('focus', cfg, lambda t: base.replace(
        camera=base.camera.replace(focus=base.camera.focus * t))))
    off = jnp.array([0.3, 0.2, 0.5])
    cases.append(('cam_pos', cfg, lambda t: base.replace(
        camera=base.camera.replace(pos=base.camera.pos + (t - 1.0) * off))))

    grads = {}
    for name, c, apply in cases:
        def f(t):
            return jnp.mean(pt_mod.render_sample(apply(t), c,
                                                 jnp.uint32(0)))
        g = float(jax.grad(f)(jnp.float32(1.0)))
        assert np.isfinite(g), (name, g)
        grads[name] = g
    assert grads['ior_nd'] != 0.0, grads


def test_grad_medium_sigma_matches_fd():
    """Medium extinction via transmittance: the attached-numerator /
    detached-pdf free-flight weight makes d/d(sigma_t) unbiased — AD and
    central FD agree statistically on a purely absorbing interior
    (operating point mul=0.25 where the transmitted paths survive)."""
    sc = testing.cornell_scene(sphere='absorb')
    cfg = pt_mod.PTConfig(width=24, height=16, max_verts=6, mf=2,
                          use_nee=True, media=True)

    def f(t, s):
        s2 = sc.replace(materials=sc.materials.replace(
            med_mut_mul=sc.materials.med_mut_mul * t))
        return jnp.mean(pt_mod.render_sample(s2, cfg, s))

    gfn = jax.jit(jax.grad(f))
    ffn = jax.jit(f)
    t0, eps, navg = 0.25, 0.05, 8
    gs, fds = [], []
    for i in range(navg):
        s = jnp.uint32(i)
        gs.append(float(gfn(jnp.float32(t0), s)))
        fds.append((float(ffn(jnp.float32(t0 + eps), s))
                    - float(ffn(jnp.float32(t0 - eps), s))) / (2 * eps))
    g, fd = np.mean(gs), np.mean(fds)
    sd = np.sqrt(np.var(gs) / navg + np.var(fds) / navg)
    assert np.isfinite(g) and g < 0  # denser medium -> darker image
    assert abs(g - fd) <= 0.4 * abs(fd) + 3 * sd, (g, fd, sd)


def test_grad_camera_params(cornell):
    """Gradient w.r.t. exposure time: throughput scales linearly."""
    def f(theta):
        sc = cornell.replace(camera=cornell.camera.replace(
            exposure_time=cornell.camera.exposure_time * theta))
        fb = pt_mod.render_sample(sc, CFG, jnp.uint32(0))
        return jnp.mean(fb)

    g = float(jax.grad(f)(jnp.float32(1.0)))
    v = float(f(jnp.float32(1.0)))
    # linear scaling (time also shifts shutter sampling, but the cornell
    # scene is static): g == v
    np.testing.assert_allclose(g, v, rtol=5e-3)
