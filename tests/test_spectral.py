"""Spectral foundation: CIE tables, hero sampling, rgb2spec round trip."""

import jax.numpy as jnp
import numpy as np

from corona13_tpu.spectral import cie, colour, rgb2spec


def test_cie_y_integral():
    """Integral of ybar over the visible range (~106.857 at 1nm * 5nm table
    resolution scaled) — matches the sensor response constant's origin."""
    lam = jnp.linspace(cie.LAMBDA_MIN, cie.LAMBDA_MAX, 941)
    y = cie.xyz_of_lambda(lam)[:, 1]
    integral = float(jnp.trapezoid(y, lam))
    assert abs(integral - 106.857) / 106.857 < 0.01


def test_hero_lambda_strata():
    r = jnp.asarray([0.1])
    lam, pdf = cie.sample_lambda_hero(r, 4)
    lam = np.asarray(lam)[0]
    assert ((lam >= cie.LAMBDA_MIN) & (lam <= cie.LAMBDA_MAX)).all()
    # equally rotated strata: sorted gaps = range/4
    d = np.diff(np.sort(lam))
    np.testing.assert_allclose(d, cie.LAMBDA_RANGE / 4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pdf), 1.0 / cie.LAMBDA_RANGE)


def test_rgb2spec_round_trip():
    """Fit coefficients, integrate the spectrum back to RGB: should match."""
    rgbs = jnp.asarray(np.array([
        [0.2, 0.2, 0.2], [0.7, 0.1, 0.1], [0.1, 0.7, 0.1], [0.1, 0.1, 0.7],
        [0.9, 0.8, 0.1], [0.3, 0.6, 0.9], [0.01, 0.01, 0.01], [0.95, 0.95, 0.95],
    ], np.float32))
    coeff = rgb2spec.fit_coeff(rgbs, space='ergb')
    lam = jnp.linspace(cie.LAMBDA_MIN, cie.LAMBDA_MAX, 301)
    s = rgb2spec.eval_coeff(coeff[:, None, :], lam[None, :])
    cmf = cie.xyz_of_lambda(lam)
    xyz = jnp.einsum('bq,qk->bk', s, cmf) / jnp.sum(cmf[:, 1])
    back = jnp.einsum('ij,bj->bi', jnp.asarray(colour.from_xyz_matrix('ergb')), xyz)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgbs), atol=0.015)


def test_reflectance_bounded():
    rgbs = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (64, 3)).astype(np.float32))
    coeff = rgb2spec.fit_coeff(rgbs, space='ergb')
    lam = jnp.linspace(cie.LAMBDA_MIN, cie.LAMBDA_MAX, 200)
    s = np.asarray(rgb2spec.eval_coeff(coeff[:, None, :], lam[None, :]))
    assert (s >= 0).all() and (s <= 1).all()


def test_cauchy_ior():
    lam = jnp.asarray([587.561])
    eta = cie.eta_from_abbe(1.5, 50.0, lam)
    np.testing.assert_allclose(np.asarray(eta), 1.5, atol=1e-4)
    # dispersion: blue bends more
    eta2 = np.asarray(cie.eta_from_abbe(1.5, 30.0, jnp.asarray([400.0, 700.0])))
    assert eta2[0] > eta2[1]


def test_colour_spaces_invertible():
    for space in ('srgb', 'rec709', 'ergb', 'xyz', 'adobergb'):
        m = np.asarray(colour.from_xyz_matrix(space))
        mi = np.asarray(colour.to_xyz_matrix(space))
        np.testing.assert_allclose(m @ mi, np.eye(3), atol=1e-4)
