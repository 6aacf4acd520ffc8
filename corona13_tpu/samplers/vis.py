"""Debug/AOV render mode (corona-13 src/render.d/vis.c): first-hit
normals, depth, primitive/material ids, and a per-pixel shading-time
proxy (bounce count) — the reference's timing heatmap analogue on a
machine where per-lane timers don't exist."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import shading as shading_mod
from ..ops import rng
from ..ops.trace import intersect
from ..spectral import cie
from ..models import camera as camera_mod
from .pt import PTConfig


def render_aov(scene, cfg: PTConfig, sample_idx, kind: str = 'normals'):
    """Render one AOV sample per pixel: kind in ('normals', 'depth',
    'prim', 'shader', 'uv').  Returns [H, W, 3]."""
    n = cfg.width * cfg.height
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)
    sidx = jnp.asarray(sample_idx, jnp.uint32)

    def rnd(dim):
        return rng.sample_dim(cfg.pointsampler, pixel_idx, sidx, dim, cfg.seed)

    pix_i = (pixel_idx % cfg.width).astype(jnp.float32) + rnd(rng.Dim.IMAGE_X)
    pix_j = (pixel_idx // cfg.width).astype(jnp.float32) + rnd(rng.Dim.IMAGE_Y)
    lam, _ = cie.sample_lambda_hero(rnd(rng.Dim.LAMBDA), cfg.mf)
    org, d, _, _ = camera_mod.sample(
        scene.camera, cfg.width, cfg.height, pix_i, pix_j,
        rnd(rng.Dim.APERTURE_X), rnd(rng.Dim.APERTURE_Y),
        jnp.zeros((n,)))
    hit = intersect(scene.geom, org, d)
    x = org + jnp.where(hit.valid, hit.t, 0.0)[..., None] * d
    sp = shading_mod.prepare(scene, hit, x, d, lam)

    if kind == 'normals':
        col = 0.5 * (sp.n + 1.0)
    elif kind == 'depth':
        z = jnp.where(hit.valid, hit.t, 0.0)
        zmax = jnp.max(z)
        col = jnp.broadcast_to((z / jnp.maximum(zmax, 1e-20))[..., None],
                               (n, 3))
    elif kind == 'prim':
        p = jnp.maximum(hit.prim, 0).astype(jnp.uint32)
        col = jnp.stack([(p * jnp.uint32(2654435761) % 255) / 255.0,
                         (p * jnp.uint32(40503) % 255) / 255.0,
                         (p * jnp.uint32(9973) % 255) / 255.0], axis=-1)
    elif kind == 'shader':
        m = scene.prim_shader[jnp.maximum(hit.prim, 0)].astype(jnp.uint32)
        col = jnp.stack([(m * jnp.uint32(2654435761) % 255) / 255.0,
                         (m * jnp.uint32(40503) % 255) / 255.0,
                         (m * jnp.uint32(9973) % 255) / 255.0], axis=-1)
    elif kind == 'uv':
        col = jnp.stack([hit.u, hit.v, jnp.zeros((n,))], axis=-1)
    else:
        raise ValueError(kind)
    col = jnp.where(hit.valid[..., None], col, 0.0)
    return col.reshape(cfg.height, cfg.width, 3)
