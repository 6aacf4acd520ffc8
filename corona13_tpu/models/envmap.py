"""Image-based environment lighting (lat-long envmap).

TPU-native re-design of the reference sky_envmap shader
(corona-13 src/shaders/sky_envmap.c): radiance is stored as a lat-long
grid of rgb2spec sigmoid coefficients (the reference precomputes a
coefficient framebuffer via tools/img/pfm2fb; here the fit runs at load
with spectral/rgb2spec.fit_coeff), evaluated at the path wavelengths with
a bilinear fetch.  Importance sampling uses row/column CDFs over
luminance * sin(theta) — flat CDF tables instead of the reference's
mip hierarchy warp (sky_envmap.c:99-143): two searchsorteds per sample
map better onto the VPU than a dependent mip descent.

Directions use the reference's z-up lat-long convention with an optional
world rotation (sky_envmap.c:66-96).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..spectral import rgb2spec, cie
from ..utils.math import dot, normalize


@struct.dataclass
class EnvMap:
    coeff: jnp.ndarray     # [H, W, 3] sigmoid coefficients
    mul: jnp.ndarray       # [H, W] brightness multiplier
    lum: jnp.ndarray       # [H, W] luminance (importance table)
    row_cdf: jnp.ndarray   # [H] marginal CDF over rows (sin-weighted)
    col_cdf: jnp.ndarray   # [H, W] conditional CDF per row
    total: jnp.ndarray     # scalar: sum(lum * sin) for the pdf

    @property
    def height(self):
        return self.coeff.shape[0]

    @property
    def width(self):
        return self.coeff.shape[1]


def build(rgb: np.ndarray) -> EnvMap:
    """Fit an EnvMap from a lat-long RGB radiance image [H, W, 3]."""
    rgb = np.asarray(rgb, np.float32)
    h, w = rgb.shape[:2]
    mul = np.maximum(rgb.max(axis=-1), 1.0)
    unit = rgb / mul[..., None]
    with jax.default_device(jax.devices('cpu')[0]):
        coeff = np.asarray(rgb2spec.fit_coeff(jnp.asarray(unit), space='ergb'))
    lum = 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    theta = (np.arange(h) + 0.5) / h * np.pi
    weighted = lum * np.sin(theta)[:, None]
    row_sum = weighted.sum(axis=1)
    total = row_sum.sum()
    row_cdf = np.cumsum(row_sum) / max(total, 1e-20)
    col_cdf = np.cumsum(weighted, axis=1) / np.maximum(
        row_sum[:, None], 1e-20)
    return EnvMap(coeff=jnp.asarray(coeff), mul=jnp.asarray(mul),
                  lum=jnp.asarray(lum), row_cdf=jnp.asarray(row_cdf),
                  col_cdf=jnp.asarray(col_cdf),
                  total=jnp.float32(total))


def _dir_to_uv(d):
    """z-up lat-long: u = atan2 azimuth, v = polar angle."""
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    u = (phi / (2.0 * jnp.pi)) % 1.0
    v = jnp.arccos(jnp.clip(d[..., 2], -1.0 + 1e-7, 1.0 - 1e-7)) / jnp.pi
    return u, v


def _uv_to_dir(u, v):
    phi = 2.0 * jnp.pi * u
    theta = jnp.pi * v
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi),
                      jnp.cos(theta)], axis=-1)


def eval_radiance(env: EnvMap, d, lam):
    """Spectral radiance toward direction d [N,3] at wavelengths lam
    [N,MF] (bilinear over the coefficient grid)."""
    h, w = env.height, env.width
    u, v = _dir_to_uv(d)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    fx = x - x0
    fy = jnp.clip(y - y0, 0.0, 1.0)
    xi0 = x0 % w
    xi1 = (x0 + 1) % w

    def fetch(yi, xi):
        c = env.coeff[yi, xi]
        m = env.mul[yi, xi]
        return m[..., None] * rgb2spec.eval_coeff(c[..., None, :], lam)

    r = (fetch(y0, xi0) * ((1 - fx) * (1 - fy))[..., None]
         + fetch(y0, xi1) * (fx * (1 - fy))[..., None]
         + fetch(y0 + 1, xi0) * ((1 - fx) * fy)[..., None]
         + fetch(y0 + 1, xi1) * (fx * fy)[..., None])
    return r


def sample(env: EnvMap, r1, r2):
    """Importance-sample a direction by luminance*sin(theta).
    Returns (dir [N,3], pdf_solid_angle [N])."""
    h, w = env.height, env.width
    row = jnp.clip(jnp.searchsorted(env.row_cdf, r1, side='left'), 0, h - 1)
    col = jax.vmap(lambda rr, u: jnp.searchsorted(env.col_cdf[rr], u,
                                                  side='left'))(row, r2)
    col = jnp.clip(col, 0, w - 1)
    # uniform within the texel
    u = (col.astype(jnp.float32) + 0.5) / w
    v = (row.astype(jnp.float32) + 0.5) / h
    d = _uv_to_dir(u, v)
    return d, pdf(env, d)


def pdf(env: EnvMap, d):
    """Solid-angle pdf of :func:`sample` for direction d."""
    h, w = env.height, env.width
    u, v = _dir_to_uv(d)
    xi = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    theta = (yi.astype(jnp.float32) + 0.5) / h * jnp.pi
    sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
    # texel probability / texel solid angle
    p_texel = env.lum[yi, xi] * sin_t / jnp.maximum(env.total, 1e-20)
    omega_texel = (2.0 * jnp.pi / w) * (jnp.pi / h) * sin_t
    return p_texel / jnp.maximum(omega_texel, 1e-20)


def make_gradient_sky(top=(0.3, 0.5, 0.9), bottom=(0.8, 0.7, 0.5),
                      sun_dir=None, sun_radiance=50.0, res=(64, 128)):
    """Procedural test envmap: vertical gradient + optional sun disk."""
    h, w = res
    v = (np.arange(h) + 0.5) / h
    rgb = (np.asarray(top)[None, None] * (1 - v)[:, None, None]
           + np.asarray(bottom)[None, None] * v[:, None, None])
    rgb = np.broadcast_to(rgb, (h, w, 3)).copy()
    if sun_dir is not None:
        sd = np.asarray(sun_dir, np.float32)
        sd = sd / np.linalg.norm(sd)
        uu, vv = np.meshgrid((np.arange(w) + 0.5) / w,
                             (np.arange(h) + 0.5) / h)
        phi = 2 * np.pi * uu
        theta = np.pi * vv
        dirs = np.stack([np.sin(theta) * np.cos(phi),
                         np.sin(theta) * np.sin(phi), np.cos(theta)], -1)
        mask = (dirs @ sd) > 0.995
        rgb[mask] = sun_radiance
    return rgb.astype(np.float32)
