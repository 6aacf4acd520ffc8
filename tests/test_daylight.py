"""Preetham daylight sky (models/daylight.py vs reference
src/shaders/daylight.h): structural properties of the analytic model."""

import jax.numpy as jnp
import numpy as np

from corona13_tpu.models import daylight as daylight_mod


def _dirs(thetas, phis):
    t = np.asarray(thetas)
    p = np.asarray(phis)
    return np.stack([np.sin(t) * np.cos(p), np.sin(t) * np.sin(p),
                     np.cos(t)], axis=-1).astype(np.float32)


def test_daylight_basic_properties():
    sky = daylight_mod.build([0.3, 0.2, 0.9], turbidity=2.5)
    lam = jnp.full((5, 4), 0.0) + jnp.asarray([450.0, 550.0, 600.0, 700.0])
    d = jnp.asarray(_dirs([0.1, 0.5, 1.0, 1.3, 1.5], [0, 1, 2, 3, 4]))
    rad = np.asarray(daylight_mod.eval_radiance(sky, d, lam))
    assert np.isfinite(rad).all() and (rad >= 0).all()
    assert rad.max() > 0
    # circumsolar brightening: radiance toward the sun beats the
    # anti-solar direction at equal elevation
    sun = np.asarray(sky.sun_dir)
    anti = sun * np.array([-1.0, -1.0, 1.0])
    d2 = jnp.asarray(np.stack([sun, anti]).astype(np.float32))
    lam2 = jnp.full((2, 4), 550.0)
    r2 = np.asarray(daylight_mod.eval_radiance(sky, d2, lam2))
    assert r2[0].mean() > r2[1].mean()


def test_daylight_sun_disc():
    """Within the 0.0088 rad solar radius the (huge) sun term adds in."""
    sky = daylight_mod.build([0.0, 0.0, 1.0], turbidity=2.0)
    d = jnp.asarray(np.array([[0.0, 0.0, 1.0],
                              [np.sin(0.05), 0.0, np.cos(0.05)]],
                             np.float32))
    lam = jnp.full((2, 2), 550.0)
    r = np.asarray(daylight_mod.eval_radiance(sky, d, lam))
    assert r[0].mean() > 50 * r[1].mean()


def test_daylight_turbidity_reddens_horizon():
    """Higher turbidity shifts the horizon spectrum redward (classic
    Preetham behavior): ratio L(700)/L(450) grows with t."""
    d = jnp.asarray(_dirs([1.45], [0.7]))
    lam = jnp.asarray([[450.0, 700.0]])

    def ratio(t):
        sky = daylight_mod.build([0.5, 0.0, 0.4], turbidity=t)
        r = np.asarray(daylight_mod.eval_radiance(sky, d, lam))[0]
        return r[1] / max(r[0], 1e-9)

    assert ratio(6.0) > ratio(2.0)


def test_daylight_scene_wiring(tmp_path):
    """`daylight <sundir> <turbidity>` sky line parses and escapes collect
    daylight radiance through sky_eval."""
    import jax
    from corona13_tpu import scene as scene_mod
    from corona13_tpu.models import lights as lights_mod
    p = tmp_path / 'day.nra2'
    p.write_text('daylight -0.3 -0.2 -0.8 3.0\n1\ndiffuse # 0\n0\n')
    sc, _ = scene_mod.load_scene(str(p))
    assert sc.has_daylight
    d = jnp.asarray([[0.3, 0.2, 0.8]]) / np.sqrt(0.77)
    lam = jnp.full((1, 2), 550.0)
    r = np.asarray(lights_mod.sky_eval(sc, d, lam))
    assert np.isfinite(r).all() and r.max() > 0
