"""Framebuffer splat filters: energy conservation and placement."""

import jax.numpy as jnp
import numpy as np

from corona13_tpu.ops import splat


def test_filters_conserve_energy():
    n = 128
    r = np.random.default_rng(0)
    pi = jnp.asarray(r.uniform(4, 28, n).astype(np.float32))
    pj = jnp.asarray(r.uniform(4, 20, n).astype(np.float32))
    col = jnp.asarray(r.uniform(0, 1, (n, 3)).astype(np.float32))
    for kind in ('box', 'bilin', 'blackmanharris'):
        fb = splat.splat(jnp.zeros((24, 32, 3)), pi, pj, col, filter_kind=kind)
        np.testing.assert_allclose(float(fb.sum()), float(col.sum()),
                                   rtol=1e-5, err_msg=kind)


def test_splat_position():
    pi = jnp.asarray([10.5])
    pj = jnp.asarray([7.5])
    col = jnp.asarray([[1.0, 2.0, 3.0]])
    for kind in ('box', 'bilin', 'blackmanharris'):
        fb = np.asarray(splat.splat(jnp.zeros((24, 32, 3)), pi, pj, col,
                                    filter_kind=kind))
        # center of mass at the splat position (pixel centers at i+0.5)
        ys, xs = np.meshgrid(np.arange(24) + 0.5, np.arange(32) + 0.5,
                             indexing='ij')
        m = fb[..., 0]
        cx = (xs * m).sum() / m.sum()
        cy = (ys * m).sum() / m.sum()
        assert abs(cx - 10.5) < 1e-4, kind
        assert abs(cy - 7.5) < 1e-4, kind


def test_edge_splats_keep_energy_in_bounds():
    """Reference normalizes the filter over in-bounds taps; corner splats
    must deposit their full energy."""
    pi = jnp.asarray([0.1, 31.9])
    pj = jnp.asarray([0.1, 23.9])
    col = jnp.ones((2, 3))
    fb = splat.splat(jnp.zeros((24, 32, 3)), pi, pj, col)
    np.testing.assert_allclose(float(fb.sum()), 6.0, rtol=1e-5)


def test_filter_kinds_conserve_energy():
    """Every splat filter (box/bilin/spline/gaussian/blackman-harris)
    normalizes per-splat: one unit sample deposits exactly unit energy."""
    import numpy as np
    from corona13_tpu.ops import splat as splat_mod
    col = jnp.asarray([[1.0, 2.0, 3.0]])
    for kind in ('bilin', 'spline', 'gaussian', 'blackmanharris'):
        fb = splat_mod.splat(jnp.zeros((9, 9, 3)), jnp.asarray([4.3]),
                             jnp.asarray([4.6]), col, filter_kind=kind)
        np.testing.assert_allclose(np.asarray(fb).sum(axis=(0, 1)),
                                   [1.0, 2.0, 3.0], rtol=1e-5,
                                   err_msg=kind)
        fb2 = splat_mod.splat_pixel_aligned(
            jnp.zeros((4, 4, 3)), jnp.full((16,), 0.3),
            jnp.full((16,), 0.7), jnp.tile(col, (16, 1)),
            filter_kind=kind)
        np.testing.assert_allclose(np.asarray(fb2).sum(axis=(0, 1)),
                                   [16.0, 32.0, 48.0], rtol=1e-4,
                                   err_msg=kind)
