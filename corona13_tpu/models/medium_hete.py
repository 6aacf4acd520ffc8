"""Heterogeneous participating media on a dense HBM density grid.

TPU-native re-design of the reference's out-of-core 512-ary voxel octree
(corona-13 src/shaders/medium_hete.c + include/vol/trace.h): the octree is
a CPU memory-hierarchy design; on TPU the density/temperature fields live
as dense (optionally downsampled) arrays in HBM and tracing is a
fixed-step regular march — vectorized [N, K] gathers + cumulative sums
instead of per-ray DDA with data-dependent trip counts:

  * transmittance: quadrature along the ray-AABB overlap
    (vol/trace.h quadrature mode), tau = sum sigma_t * rho(x_i) * dx;
  * distance sampling: invert the piecewise-constant optical depth for a
    target -log(1-xi) (voxel-based distance sampling, the regression
    0031_hete configuration), pdf = mu_t(x) * T(x);
  * extinction scale: mu_t = density * sigma_t with scalar sigma_t/sigma_s
    (medium_hete.c:45-47) — the spectral axis is flat, so hero-lane
    weights stay 1 and only the scalar throughput factor sigma_s/sigma_t
    applies at scatter events.

Interpolation is nearest-voxel (the reference default s_vol_constant,
medium_hete.c init).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

N_MARCH = 64   # quadrature / inversion steps per segment (static)


@struct.dataclass
class VolGrid:
    density: jnp.ndarray      # [Z, Y, X] float32
    temperature: jnp.ndarray  # [Z, Y, X] float32
    lo: jnp.ndarray           # [3] world-space aabb
    hi: jnp.ndarray           # [3]
    sigma_t: jnp.ndarray      # scalar extinction scale (mu_t = rho * sigma_t)
    sigma_s: jnp.ndarray      # scalar scattering scale
    sigma_e: jnp.ndarray      # scalar emission scale (blackbody x temp)
    g0: jnp.ndarray           # HG mean cosine
    mat_id: int = struct.field(pytree_node=False, default=-1)


def from_volfile(vf, sigma_s, sigma_t, sigma_e, g0, mat_id) -> VolGrid:
    """Build the device grid from io.vol.VolFile.  World placement uses
    the file's aabb (+ loc offset); rotation is not yet supported."""
    import numpy as np
    lo = np.asarray(vf.aabb[:3], np.float32) + vf.loc
    hi = np.asarray(vf.aabb[3:], np.float32) + vf.loc
    return VolGrid(density=jnp.asarray(vf.density),
                   temperature=jnp.asarray(vf.temperature),
                   lo=jnp.asarray(lo), hi=jnp.asarray(hi),
                   sigma_t=jnp.float32(sigma_t), sigma_s=jnp.float32(sigma_s),
                   sigma_e=jnp.float32(sigma_e), g0=jnp.float32(g0),
                   mat_id=mat_id)


def density_at(grid: VolGrid, x):
    """Nearest-voxel density at world positions x [..., 3]."""
    res = jnp.asarray(grid.density.shape[::-1], jnp.float32)   # (X, Y, Z)
    rel = (x - grid.lo) / jnp.maximum(grid.hi - grid.lo, 1e-20) * res
    ijk = jnp.floor(rel).astype(jnp.int32)
    inside = jnp.all((rel >= 0.0) & (rel < res), axis=-1)
    ijk = jnp.clip(ijk, 0, jnp.asarray(grid.density.shape[::-1]) - 1)
    d = grid.density[ijk[..., 2], ijk[..., 1], ijk[..., 0]]
    return jnp.where(inside, d, 0.0)


def _segment(grid: VolGrid, org, w, t_max):
    """Ray-AABB overlap [a, b] clipped to [0, t_max]."""
    inv = 1.0 / jnp.where(jnp.abs(w) < 1e-20, 1e-20, w)
    t0 = (grid.lo - org) * inv
    t1 = (grid.hi - org) * inv
    a = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), 0.0)
    b = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1),
                    jnp.minimum(t_max, 1e4))
    return a, jnp.maximum(b, a)


def _march_tau(grid: VolGrid, org, w, a, b):
    """Per-step optical depths dtau [N, K] at midpoints along [a, b]."""
    dx = (b - a) / N_MARCH
    i = jnp.arange(N_MARCH, dtype=jnp.float32) + 0.5
    t_i = a[..., None] + i * dx[..., None]                    # [N, K]
    x_i = org[..., None, :] + t_i[..., None] * w[..., None, :]
    rho = density_at(grid, x_i)                               # [N, K]
    return rho * grid.sigma_t * dx[..., None], dx


def transmittance(grid: VolGrid, org, w, dist):
    """exp(-integral mu_t) along [0, dist] from org (scalar, [N])."""
    a, b = _segment(grid, org, w, dist)
    dtau, _ = _march_tau(grid, org, w, a, b)
    return jnp.exp(-jnp.sum(dtau, axis=-1))


def sample_dist(grid: VolGrid, org, w, t_hit, rnd):
    """Voxel-based free-flight distance sampling.

    Returns (scatter [N] bool, dist [N], weight [N]): weight is the scalar
    throughput factor (sigma_s/sigma_t at a scatter event — the per-lane
    T/pdf parts cancel exactly for scalar extinction; survival to the
    surface has weight 1 with pdf = T(t_hit), matching the homogeneous
    convention in models/medium.sample_dist)."""
    a, b = _segment(grid, org, w, t_hit)
    dtau, dx = _march_tau(grid, org, w, a, b)
    cum = jnp.cumsum(dtau, axis=-1)                           # [N, K]
    target = -jnp.log(jnp.maximum(1.0 - rnd, 1e-20))
    crossed = cum >= target[..., None]
    any_cross = jnp.any(crossed, axis=-1)
    k = jnp.argmax(crossed, axis=-1)                          # first crossing
    cum_before = jnp.where(k > 0,
                           jnp.take_along_axis(cum, jnp.maximum(k - 1, 0)[..., None],
                                               axis=-1)[..., 0], 0.0)
    dtau_k = jnp.take_along_axis(dtau, k[..., None], axis=-1)[..., 0]
    frac = (target - cum_before) / jnp.maximum(dtau_k, 1e-20)
    dist = a + (k.astype(jnp.float32) + jnp.clip(frac, 0.0, 1.0)) * dx
    scatter = any_cross & (dist < t_hit)
    ratio = jnp.where(grid.sigma_t > 0.0,
                      grid.sigma_s / jnp.maximum(grid.sigma_t, 1e-20), 0.0)
    weight = jnp.where(scatter, ratio, 1.0)
    return scatter, jnp.where(scatter, dist, t_hit), weight


def emission_along(grid: VolGrid, org, w, dist, lam):
    """Accumulated in-scattered blackbody emission along [0, dist]:
    sum T(t_i) * sigma_e * rho_i * Le(T_i, lam) * dx (SEGMENT_EMISSION in
    vol/trace.h:27-33).  Returns [N, MF]."""
    from ..spectral import cie
    a, b = _segment(grid, org, w, dist)
    dx = (b - a) / N_MARCH
    i = jnp.arange(N_MARCH, dtype=jnp.float32) + 0.5
    t_i = a[..., None] + i * dx[..., None]
    x_i = org[..., None, :] + t_i[..., None] * w[..., None, :]
    rho = density_at(grid, x_i)
    res = jnp.asarray(grid.temperature.shape[::-1], jnp.float32)
    rel = (x_i - grid.lo) / jnp.maximum(grid.hi - grid.lo, 1e-20) * res
    ijk = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0,
                   jnp.asarray(grid.temperature.shape[::-1]) - 1)
    temp = grid.temperature[ijk[..., 2], ijk[..., 1], ijk[..., 0]]
    dtau = rho * grid.sigma_t * dx[..., None]
    tr = jnp.exp(-(jnp.cumsum(dtau, axis=-1) - dtau))         # T up to bin
    le = cie.blackbody(temp[..., None], lam[..., None, :])    # [N, K, MF]
    contrib = (tr * grid.sigma_e * rho * dx[..., None])[..., None] * le
    return jnp.sum(contrib, axis=-2)
