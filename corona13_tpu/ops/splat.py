"""Framebuffer splatting: filter-weighted scatter-add.

TPU-native replacement for the reference's atomic float CAS splats
(corona-13 corona_common.h:316-343 + include/filter/*): the whole
wavefront's contributions become one ``.at[].add`` scatter — XLA turns
this into a deterministic sorted segment-sum, no races, and it stays
differentiable for inverse rendering.

Filters: box, bilinear, and the default radial 4-term Blackman-Harris over
a 4x4 footprint, normalized per splat (filter/blackmanharris.h:28-77).
"""

from __future__ import annotations

import jax.numpy as jnp


def bh_window(n):
    """4-term Blackman-Harris window on [0, 3] (filter_bh_w)."""
    a0, a1, a2, a3 = 0.35875, 0.48829, 0.14128, 0.01168
    x = 2.0 * jnp.pi * n / 3.0
    w = a0 - a1 * jnp.cos(x) + a2 * jnp.cos(2 * x) - a3 * jnp.cos(3 * x)
    return jnp.where((n < 0.0) | (n > 3.0), 0.0, w)


def splat(fb, pix_i, pix_j, col, filter_kind: str = 'blackmanharris'):
    """Accumulate colours into fb [H, W, 3].

    pix_i/pix_j: continuous image coordinates [N]; col: [N, 3].
    Returns the updated framebuffer."""
    h, w = fb.shape[0], fb.shape[1]
    if filter_kind == 'box':
        xi = jnp.clip(pix_i.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(pix_j.astype(jnp.int32), 0, h - 1)
        return fb.at[yi, xi].add(col)

    if filter_kind == 'bilin':
        x = pix_i - 0.5
        y = pix_j - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = x - x0
        fy = y - y0
        for dy in (0, 1):
            for dx in (0, 1):
                wgt = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                xi = jnp.clip(x0 + dx, 0, w - 1)
                yi = jnp.clip(y0 + dy, 0, h - 1)
                inb = (x0 + dx >= 0) & (x0 + dx < w) & (y0 + dy >= 0) & (y0 + dy < h)
                fb = fb.at[yi, xi].add(jnp.where(inb[..., None], wgt[..., None] * col, 0.0))
        return fb

    # blackman-harris 4x4: compute the 16 taps densely then one scatter
    x0 = jnp.floor(pix_i - 1.5).astype(jnp.int32)
    y0 = jnp.floor(pix_j - 1.5).astype(jnp.int32)
    du = jnp.arange(4)
    dv = jnp.arange(4)
    uu = (x0[..., None] + du + 0.5) - pix_i[..., None]          # [N, 4]
    vv = (y0[..., None] + dv + 0.5) - pix_j[..., None]          # [N, 4]
    r = jnp.sqrt(uu[..., None, :] ** 2 + vv[..., :, None] ** 2)  # [N, 4v, 4u]
    f = bh_window(r + 1.5)
    xi = x0[..., None, None] + du[None, None, :]
    yi = y0[..., None, None] + dv[None, :, None]
    inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    xi = jnp.broadcast_to(xi, f.shape)
    yi = jnp.broadcast_to(yi, f.shape)
    f = jnp.where(inb, f, 0.0)
    # normalize over in-bounds taps (reference normalizes per splat)
    norm = jnp.sum(f, axis=(-1, -2), keepdims=True)
    f = f / jnp.maximum(norm, 1e-20)
    contrib = f[..., None] * col[..., None, None, :]
    return fb.at[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)].add(contrib)
