"""CIE colour matching and spectral sampling.

TPU-native re-design of the reference's spectral foundation
(corona-13 include/spectrum.h): wavelengths carry a trailing hero-wavelength
axis of size ``mf`` (the reference's SIMD ``mf_t``, include/mf.h), and all
functions here are pure jax, vmappable and differentiable.

Conventions (matching reference include/spectrum.h:67-215):
  * lambda is in nanometers, sampled uniformly on [360, 830).
  * hero-wavelength sampling draws one uniform r and places the remaining
    mf-1 wavelengths at equally rotated strata (src/pathspace.c:218-221).
  * spectral radiance -> camera response integrates against the CIE 1931
    2-degree CMFs (linear interpolation of the 5 nm table).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ._cie_data import CIE_LAMBDA_MIN, CIE_LAMBDA_MAX, CIE_STEP, CIE_XYZ_5NM

LAMBDA_MIN = float(CIE_LAMBDA_MIN)
LAMBDA_MAX = float(CIE_LAMBDA_MAX)
LAMBDA_RANGE = LAMBDA_MAX - LAMBDA_MIN

# [96, 3] table, last row is a zero pad so lerp at lambda==830 needs no clamp.
CIE_XYZ_TABLE = np.asarray(CIE_XYZ_5NM, dtype=np.float32)


def sample_lambda_hero(r: jnp.ndarray, mf: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample hero wavelengths from one uniform in [0,1).

    Returns (lambda[..., mf], pdf[..., mf]).  pdf is 1/470 per lane
    (reference spectrum.h:206-215); the strata rotation follows
    src/pathspace.c:218-221: lane l uses frac(r + l/mf).
    """
    l = jnp.arange(mf, dtype=jnp.float32) / mf
    rs = jnp.mod(r[..., None] + l, 1.0)
    lam = LAMBDA_MIN + LAMBDA_RANGE * rs
    pdf = jnp.full_like(lam, 1.0 / LAMBDA_RANGE)
    return lam, pdf


def lambda_pdf(lam: jnp.ndarray) -> jnp.ndarray:
    return jnp.full_like(lam, 1.0 / LAMBDA_RANGE)


def xyz_of_lambda(lam: jnp.ndarray) -> jnp.ndarray:
    """CIE xbar/ybar/zbar at wavelength lam [nm] -> [..., 3].

    Linear interpolation of the 5 nm table (reference spectrum.h:172-183).
    Out-of-range wavelengths return 0.
    """
    table = jnp.asarray(CIE_XYZ_TABLE)
    f = (lam - LAMBDA_MIN) / CIE_STEP
    i = jnp.clip(jnp.floor(f), 0, table.shape[0] - 2).astype(jnp.int32)
    t = jnp.clip(f - i.astype(jnp.float32), 0.0, 1.0)
    lo = table[i]
    hi = table[i + 1]
    out = lo + t[..., None] * (hi - lo)
    valid = (lam >= LAMBDA_MIN) & (lam <= LAMBDA_MAX)
    return jnp.where(valid[..., None], out, 0.0)


def spectral_to_xyz(lam: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Sum_l cmf(lambda_l) * p_l over the hero axis -> [..., 3].

    Mirrors reference spectrum_p_to_xyz (spectrum.h:185-196): a plain sum,
    NOT a mean — hero-MIS weights already account for lane multiplicity.
    """
    return jnp.sum(xyz_of_lambda(lam) * p[..., None], axis=-2)


def cauchy_from_abbe(n_d: float, v_d: float) -> tuple[float, float]:
    """Cauchy coefficients (A, B[um^2]) from refractive index at the d-line
    and Abbe number, per reference spectrum.h:40-54."""
    if v_d == 0.0:
        return n_d, 0.0
    l_c, l_f, l_d = 0.6563, 0.4861, 0.587561
    c = (l_c * l_c * l_f * l_f) / (l_c * l_c - l_f * l_f)
    b = (n_d - 1.0) / v_d * c
    a = n_d - b / (l_d * l_d)
    return a, b


def eta_from_abbe(n_d: float, v_d: float, lam: jnp.ndarray) -> jnp.ndarray:
    """Spectral IOR eta(lambda[nm]) via Cauchy's equation
    (reference spectrum.h:56-63)."""
    a, b = cauchy_from_abbe(n_d, v_d)
    return a + (b * 1e6) / (lam * lam)


def mutate_lambda(lam: jnp.ndarray, r: jnp.ndarray, step: float = 50.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """MLT wavelength mutation with boundary mirroring
    (reference spectrum.h:219-241). Returns (lambda', pdf)."""
    delta = jnp.where(r > 0.5, -2.0 * step * (r - 0.5), 2.0 * step * r)
    l2 = lam + delta
    l2 = jnp.where(l2 < LAMBDA_MIN, 2.0 * LAMBDA_MIN - l2, l2)
    l2 = jnp.where(l2 > LAMBDA_MAX, 2.0 * LAMBDA_MAX - l2, l2)
    pdf = jnp.full_like(l2, 0.5 / step)
    return l2, pdf


def blackbody(temp: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Planck spectral radiance [W/m^2/sr/nm] at temperature ``temp`` [K]
    and wavelength ``lam`` [nm], matching the reference's convention
    (include/vol/shaders.h:24-47 — note it omits the factor 2 of the
    textbook 2hc^2 numerator; we reproduce that so emissive volumes
    match).  temp <= 0 emits nothing."""
    h = 6.62606957e-34
    c = 299792458.0
    k = 1.3807e-23
    lam5 = lam ** 5
    c1 = 1e45 * h * c * c / jnp.maximum(lam5, 1e-20)
    t_safe = jnp.maximum(temp, 1.0)
    c2 = (h * c * 1e9 / k) / (lam * t_safe)
    val = c1 / jnp.maximum(jnp.exp(jnp.minimum(c2, 80.0)) - 1.0, 1e-30) * 1e-9
    return jnp.where(temp > 0.0, val, 0.0)
