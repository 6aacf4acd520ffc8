"""Small vector-math helpers shared across the framework.

All functions operate on trailing-axis-3 arrays and broadcast over leading
(wavefront) axes — the SoA analogue of the reference's float[3] helpers in
corona-13 include/corona_common.h.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def norm(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return a * jax.lax.rsqrt(jnp.maximum(dot(a, a), eps))[..., None]


def build_onb(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Orthonormal basis (u, v) perpendicular to unit n.

    Branch-free Duff et al. (JCGT 2017) construction — replaces the
    reference's get_onb (corona_common.h:192-198) without per-element
    branching, so it vectorizes on the VPU.
    """
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    u = jnp.stack([1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1)
    v = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return u, v


def to_frame(u, v, n, w):
    """World direction w -> local (x=u, y=v, z=n) coordinates."""
    return jnp.stack([dot(w, u), dot(w, v), dot(w, n)], axis=-1)


def from_frame(u, v, n, wl):
    """Local coordinates -> world direction."""
    return (wl[..., 0:1] * u + wl[..., 1:2] * v + wl[..., 2:3] * n)


def quat_rotate(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector p by quaternion q = [w, x, y, z]."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    t = 2.0 * cross(u, p)
    return p + w * t + cross(u, t)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    """Normalized linear interpolation (adequate for small shutter motion;
    the reference's quaternion_slerp is also a nlerp, quaternion.h:78-86)."""
    q = (1.0 - t) * q0 + t * q1
    return q / jnp.maximum(jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True)), 1e-20)


def reflect(w: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror direction: w points *into* the surface, returns outgoing."""
    return w - 2.0 * dot(w, n)[..., None] * n


def sample_cos_hemisphere(r1, r2):
    """Cosine-weighted hemisphere sample in local frame (z up).
    Returns (dir[...,3], pdf = cos/pi)."""
    phi = 2.0 * jnp.pi * r1
    sr = jnp.sqrt(r2)
    z = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
    d = jnp.stack([sr * jnp.cos(phi), sr * jnp.sin(phi), z], axis=-1)
    return d, z / jnp.pi


def sample_sphere(r1, r2):
    """Uniform direction on the unit sphere."""
    z = 1.0 - 2.0 * r2
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * r1
    return jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)


def ray_offset(x: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Scale-relative self-intersection offset along the ray direction —
    deliberately NOT along the normal (reference prims_offset_ray,
    src/prims.c:376-390: normal offsets break manifold walks)."""
    eps = 1e-4 * jnp.maximum(0.5, jnp.max(jnp.abs(x), axis=-1))
    return x + eps[..., None] * d
