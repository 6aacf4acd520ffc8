"""Differentiability: pixel gradients vs finite differences.

The north-star acceptance gate (BASELINE.md): gradients of the rendered
image w.r.t. shader parameters must match finite differences.  Sampling
decisions are detached (ops/trace.py), so gradients w.r.t. parameters the
sampling pdfs do not depend on (albedo/emission scales) are *exact* — FD
agreement is tight even at low spp because the same random numbers drive
both evaluations (common random numbers).
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
