"""Spectral upsampling of RGB reflectances (Jakob & Hanika 2019 model).

The spectrum is the published sigmoid-polynomial
``S(lambda) = s(c0*lambda^2 + c1*lambda + c2)`` with
``s(x) = 1/2 + x / (2 sqrt(1 + x^2))`` and lambda in nanometers — the same
model the reference evaluates (corona-13 include/rgb2spec.h:141-146) from a
precomputed 64^3 coefficient LUT (built offline by tools/img/rgb2spec_opt.cpp).

TPU-native redesign: the fit itself is a vmapped Gauss-Newton solve in jax
(see :func:`fit_coeff`), so the LUT generator is ~30 lines and runs on
device (tools/rgb2spec_gen.py).  At render time constant albedos are fitted
exactly at scene load (no LUT error), while textures use the bilinear LUT
fetch (:func:`fetch_lut`), mirroring reference rgb2spec_fetch
(rgb2spec.h:86-125).
"""

from __future__ import annotations

import struct
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import cie, colour


def eval_coeff(coeff: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Evaluate sigmoid-polynomial reflectance.

    coeff: [..., 3] (c0, c1, c2); lam: [...] nm (broadcastable against coeff
    minus its last axis).  Matches reference rgb2spec_eval_precise.
    """
    x = (coeff[..., 0] * lam + coeff[..., 1]) * lam + coeff[..., 2]
    return 0.5 + 0.5 * x * jax.lax.rsqrt(x * x + 1.0)


# --- fitting ----------------------------------------------------------------

# dense wavelength grid for projection integrals
_N_QUAD = 95


def _quad_lambdas() -> np.ndarray:
    return np.linspace(cie.LAMBDA_MIN, cie.LAMBDA_MAX, _N_QUAD).astype(np.float32)


def _rgb_of_coeff(coeff: jnp.ndarray, m_xyz_to_rgb: jnp.ndarray) -> jnp.ndarray:
    """Project S(lambda; coeff) to RGB under illuminant E."""
    lams = jnp.asarray(_quad_lambdas())
    s = eval_coeff(coeff[..., None, :], lams)          # [..., Q]
    cmf = cie.xyz_of_lambda(lams)                      # [Q, 3]
    norm = jnp.sum(cmf[:, 1])
    xyz = jnp.einsum('...q,qk->...k', s, cmf) / norm
    return jnp.einsum('ij,...j->...i', m_xyz_to_rgb, xyz)


# normalized wavelength basis for well-conditioned fitting:
# t = (lambda - 550) / 300 keeps coefficients O(1)
_T_CENTER = 550.0
_T_SCALE = 300.0


def _norm_to_nm(cn: jnp.ndarray) -> jnp.ndarray:
    """Convert coefficients in the normalized basis x(t)=c0 t^2 + c1 t + c2,
    t = (lam - C)/S, to the nm basis used by eval_coeff."""
    c0, c1, c2 = cn[..., 0], cn[..., 1], cn[..., 2]
    a0 = c0 / (_T_SCALE ** 2)
    a1 = c1 / _T_SCALE - 2.0 * _T_CENTER * c0 / (_T_SCALE ** 2)
    a2 = (c0 * _T_CENTER ** 2 / (_T_SCALE ** 2)
          - c1 * _T_CENTER / _T_SCALE + c2)
    return jnp.stack([a0, a1, a2], axis=-1)


@partial(jax.jit, static_argnames=('space', 'iters'))
def fit_coeff(rgb: jnp.ndarray, space: str = 'ergb', iters: int = 50) -> jnp.ndarray:
    """Fit sigmoid-poly coefficients reproducing ``rgb`` (values in [0,1]).

    Levenberg-Marquardt on the 3x3 system rgb(S(c)) = rgb_target, vmapped
    over leading axes, in a normalized wavelength basis for conditioning.
    This is the functional core of the reference's offline rgb2spec_opt
    tool (tools/img/rgb2spec_opt.cpp), run on device instead.
    """
    m = jnp.asarray(colour.from_xyz_matrix(space))
    target = jnp.asarray(rgb, jnp.float32)
    flat = target.reshape(-1, 3)

    # everything batched over rows: residual [B,3] of coeffs [B,3]
    lams = jnp.asarray(_quad_lambdas())
    t_n = (lams - _T_CENTER) / _T_SCALE
    basis = jnp.stack([t_n * t_n, t_n, jnp.ones_like(t_n)], axis=-1)  # [Q,3]
    cmf = cie.xyz_of_lambda(lams)                                     # [Q,3]
    norm = jnp.sum(cmf[:, 1])

    def residual(c):                                  # c: [B,3] normalized
        x = c @ basis.T                               # [B,Q]
        s = 0.5 + 0.5 * x * jax.lax.rsqrt(x * x + 1.0)
        xyz = (s @ cmf) / norm                        # [B,3]
        return xyz @ m.T - flat

    def jacobian(c):
        """d residual / d c, [B,3out,3c] — analytic: ds/dx = 0.5 (1+x^2)^-3/2."""
        x = c @ basis.T                               # [B,Q]
        dsdx = 0.5 * (x * x + 1.0) ** (-1.5)          # [B,Q]
        # dres[o]/dc[k] = sum_q m[o,:]·cmf[q,:]/norm * dsdx[q] * basis[q,k]
        w = (cmf / norm) @ m.T                        # [Q,3out]
        return jnp.einsum('bq,qo,qk->bok', dsdx, w, basis)

    mean = jnp.clip(jnp.mean(flat, axis=-1), 1e-3, 1.0 - 1e-3)
    x0 = (2.0 * mean - 1.0) / (2.0 * jnp.sqrt(mean * (1.0 - mean)))
    c = jnp.zeros_like(flat).at[:, 2].set(x0)
    lm = jnp.full((flat.shape[0],), 1e-4)

    def step(carry, _):
        c, lm = carry
        j = jacobian(c)                               # [B,3,3]
        r = residual(c)                               # [B,3]
        err = jnp.sum(r * r, axis=-1)
        jtj = jnp.einsum('bok,bol->bkl', j, j)
        jtr = jnp.einsum('bok,bo->bk', j, r)
        a = jtj + lm[:, None, None] * jnp.eye(3)
        dp = jnp.linalg.solve(a, jtr[..., None])[..., 0]
        c_new = c - dp
        err_new = jnp.sum(residual(c_new) ** 2, axis=-1)
        better = err_new < err
        c = jnp.where(better[:, None], c_new, c)
        lm = jnp.where(better, jnp.maximum(lm * 0.3, 1e-8), lm * 4.0)
        return (c, lm), None

    (c, _), _ = jax.lax.scan(step, (c, lm), None, length=iters)
    return _norm_to_nm(c).reshape(target.shape[:-1] + (3,))


def fit_coeff_scaled(rgb: np.ndarray, space: str = 'ergb') -> tuple[np.ndarray, np.ndarray]:
    """Fit arbitrary-brightness rgb: returns (coeff, mul) with
    rgb = mul * rgb_unit, mul >= 1 (reference spectrum_rgb_to_coeff,
    spectrum.h:29-38: colours <= 1 are not scaled)."""
    rgb = np.asarray(rgb, np.float32)
    mul = np.maximum(rgb.max(axis=-1), 1.0)
    unit = rgb / mul[..., None]
    # scene-load-time work: run on host CPU so renders on accelerators don't
    # pay a device compile of the 3x3 LM solve
    with jax.default_device(jax.devices('cpu')[0]):
        coeff = np.asarray(fit_coeff(jnp.asarray(unit), space=space))
    return coeff, mul


# --- LUT --------------------------------------------------------------------

class Rgb2SpecLUT:
    """Coefficient LUT with reference-compatible layout: data[i, z, y, x, 3]
    where i = argmax component, (x, y) = other two components scaled by the
    max, z = max-component value on the (possibly non-uniform) 'scale' grid.
    """

    def __init__(self, res: int, scale: np.ndarray, data: np.ndarray):
        self.res = int(res)
        self.scale = np.asarray(scale, np.float32)
        self.data = np.asarray(data, np.float32).reshape(3, res, res, res, 3)

    @classmethod
    def load(cls, path: str) -> 'Rgb2SpecLUT':
        """Read the reference's binary 'SPEC' format (rgb2spec.h:27-63)."""
        with open(path, 'rb') as f:
            if f.read(4) != b'SPEC':
                raise ValueError(f'{path}: not a SPEC coefficient file')
            (res,) = struct.unpack('<I', f.read(4))
            scale = np.frombuffer(f.read(4 * res), np.float32)
            data = np.frombuffer(f.read(4 * res ** 3 * 9), np.float32)
        return cls(res, scale, data)

    def save(self, path: str) -> None:
        with open(path, 'wb') as f:
            f.write(b'SPEC')
            f.write(struct.pack('<I', self.res))
            f.write(self.scale.astype('<f4').tobytes())
            f.write(self.data.astype('<f4').tobytes())


def fetch_lut(lut_scale: jnp.ndarray, lut_data: jnp.ndarray, rgb: jnp.ndarray) -> jnp.ndarray:
    """Trilinear LUT fetch, vectorized.  lut_data: [3, res, res, res, 3];
    rgb: [..., 3] in [0,1].  Mirrors reference rgb2spec_fetch semantics."""
    res = lut_data.shape[1]
    i = jnp.argmax(rgb, axis=-1)
    z = jnp.take_along_axis(rgb, i[..., None], axis=-1)[..., 0]
    zsafe = jnp.maximum(z, 1e-10)
    x = jnp.take_along_axis(rgb, ((i + 1) % 3)[..., None], axis=-1)[..., 0] * (res - 1) / zsafe
    y = jnp.take_along_axis(rgb, ((i + 2) % 3)[..., None], axis=-1)[..., 0] * (res - 1) / zsafe
    xi = jnp.clip(x.astype(jnp.int32), 0, res - 2)
    yi = jnp.clip(y.astype(jnp.int32), 0, res - 2)
    zi = jnp.clip(jnp.searchsorted(lut_scale, z, side='right') - 1, 0, res - 2)
    x1 = x - xi; x0 = 1.0 - x1
    y1 = y - yi; y0 = 1.0 - y1
    z1 = (z - lut_scale[zi]) / (lut_scale[zi + 1] - lut_scale[zi])
    z0 = 1.0 - z1

    def g(dz, dy, dx):
        return lut_data[i, zi + dz, yi + dy, xi + dx]

    out = ((g(0, 0, 0) * x0[..., None] + g(0, 0, 1) * x1[..., None]) * y0[..., None] +
           (g(0, 1, 0) * x0[..., None] + g(0, 1, 1) * x1[..., None]) * y1[..., None]) * z0[..., None] + \
          ((g(1, 0, 0) * x0[..., None] + g(1, 0, 1) * x1[..., None]) * y0[..., None] +
           (g(1, 1, 0) * x0[..., None] + g(1, 1, 1) * x1[..., None]) * y1[..., None]) * z1[..., None]
    return out


def build_lut(res: int = 32, space: str = 'ergb') -> Rgb2SpecLUT:
    """Generate a coefficient LUT by Gauss-Newton fitting on device —
    the reference builds this offline with tools/img/rgb2spec_opt.cpp."""
    # smoothstep-warped z grid concentrates resolution near the gamut edges
    t = np.linspace(0, 1, res, dtype=np.float32)
    scale = t * t * (3 - 2 * t)
    scale[0] = 1e-4  # avoid the degenerate black corner
    data = np.zeros((3, res, res, res, 3), np.float32)
    xs = np.arange(res, dtype=np.float32) / (res - 1)
    for i in range(3):
        for zi in range(res):
            z = scale[zi]
            xg, yg = np.meshgrid(xs * z, xs * z, indexing='xy')
            rgb = np.zeros(xg.shape + (3,), np.float32)
            rgb[..., i] = z
            rgb[..., (i + 1) % 3] = xg
            rgb[..., (i + 2) % 3] = yg
            data[i, zi] = np.asarray(fit_coeff(jnp.asarray(rgb), space=space))
    return Rgb2SpecLUT(res, scale, data.reshape(-1))
