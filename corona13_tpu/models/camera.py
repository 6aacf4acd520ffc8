"""Thin-lens camera model.

Faithful to the reference thinlens math (corona-13 src/camera.d/thinlens.c):
photographic parameterization (f-stop / exposure-index tables in io/cam.py),
sensor response constant, cos^4 falloff, aperture disk sampling, and the
same measure bookkeeping: camera_sample returns
  throughput = sensor * G / (pdf_aperture * pdf_film)
with v1 pdf = pdf_film * pdf_aperture / G in *projected solid angle*
(thinlens.c:90-112), later converted to vertex area by the path G term.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..utils.math import normalize, quat_rotate, quat_slerp

SENSOR_RESPONSE = 106.86535  # X+Y+Z=1 -> visible scale (thinlens.c:28)


def cam_frame(camera, time):
    """Camera basis at shutter time: right (a), up (b), view (n), position.
    Mirrors view_cam_init_frame (src/view.c:903-919): a = q*x, b = q*y,
    n = q*z."""
    t = jnp.asarray(time)[..., None]
    q = quat_slerp(camera.orient, camera.orient_t1, t)
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), q.shape[:-1] + (3,))
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), q.shape[:-1] + (3,))
    ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), q.shape[:-1] + (3,))
    a = normalize(quat_rotate(q, ex))
    b = normalize(quat_rotate(q, ey))
    n = normalize(quat_rotate(q, ez))
    x = camera.pos * (1.0 - t) + camera.pos_t1 * t
    return a, b, n, x


def aperture_area(camera):
    f = camera.focal_length
    n = camera.f_stop
    return jnp.pi * f * f / (4.0 * n * n)


def sample(camera, width: int, height: int, pix_i, pix_j, r_ap1, r_ap2, time):
    """Generate primary rays for pixels (pix_i, pix_j) (continuous coords).

    Returns (org, dir, throughput, pdf_proj) — pdf in projected solid angle,
    throughput = sensor*G/(pdf_a*pdf_v) exactly like _camera_sample_internal
    (thinlens.c:70-113).
    """
    a, b, n, x = cam_frame(camera, time)
    lens_radius = 0.5 / camera.f_stop * camera.focal_length
    phi = 2.0 * jnp.pi * r_ap1
    rad = jnp.sqrt(r_ap2) * lens_radius
    u = jnp.cos(phi) * rad
    v = jnp.sin(phi) * rad

    f = camera.focus / camera.focal_length
    f_dir = camera.focus
    f_rg = -camera.film_width * f / width
    f_up = -camera.film_height * f / height

    aoff = u[..., None] * a + v[..., None] * b
    d = (f_dir * n
         + ((pix_i - 0.5 * width) * f_rg)[..., None] * a
         + ((pix_j - 0.5 * height) * f_up)[..., None] * b
         - aoff)
    d = normalize(d)
    org = x + aoff

    area = aperture_area(camera)
    pdf_a = 1.0 / area
    sensor = SENSOR_RESPONSE * 100.0 * camera.exposure_time
    cos_t = jnp.sum(d * n, axis=-1)
    g = cos_t ** 4 / (camera.focal_length * camera.focal_length)
    pdf_v = 1.0 / (camera.film_width * camera.film_height)
    pdf_proj = pdf_v * pdf_a / g
    throughput = sensor * g / (pdf_a * pdf_v)
    return org, d, throughput, pdf_proj


def pdf_connect(camera, cos_ap):
    """Projected-solid-angle pdf of the camera sampling a direction whose
    cosine to the view axis is ``cos_ap`` — identical to sample()'s
    pdf_proj for that direction (reference camera_pdf, thinlens.c:163-178:
    pdf_v/G with pdf_v = 1/(A*film_w*film_h), G = cos^4/f^2).  Used as the
    reverse pdf of the camera-adjacent vertex in BDPT t=1 MIS."""
    cos_ap = jnp.maximum(cos_ap, 1e-6)
    g = cos_ap ** 4 / (camera.focal_length * camera.focal_length)
    pdf_a = 1.0 / aperture_area(camera)
    pdf_v = 1.0 / (camera.film_width * camera.film_height)
    return pdf_v * pdf_a / g


def connect(camera, width: int, height: int, y, r_ap1, r_ap2, time):
    """Connect a world vertex ``y`` to a sampled aperture point — the LT /
    BDPT camera connection (reference camera_connect, thinlens.c).

    Derivation: equating the PT estimator (sample) with the particle
    estimator shows the thin-lens importance response is the *constant*
    ``sensor`` per (aperture area x emitted solid angle) — all geometry
    enters through the segment G term and p_aperture, so the splat value
    for a light-subpath vertex is

        c = T * f(y -> ap) * V * sensor * G(y, ap) / p_ap .

    Returns dict(pix_i, pix_j, ap_pos, dir (y -> aperture, unit), dist,
    weight = sensor * aperture_area (the 1/p_ap included; caller
    multiplies f * G and tests visibility), valid).
    """
    a, b, n, x = cam_frame(camera, time)
    lens_radius = 0.5 / camera.f_stop * camera.focal_length
    phi = 2.0 * jnp.pi * r_ap1
    rad = jnp.sqrt(r_ap2) * lens_radius
    u = jnp.cos(phi) * rad
    v = jnp.sin(phi) * rad
    aoff = u[..., None] * a + v[..., None] * b
    ap = x + aoff

    to_y = y - ap
    dn = jnp.sum(to_y * n, axis=-1)        # along view axis
    valid = dn > 1e-6
    dn_safe = jnp.where(valid, dn, 1.0)
    # focal-plane point of the ray ap -> y (aoff is in the lens plane)
    s = camera.focus / dn_safe
    fp = ap + s[..., None] * to_y
    rel = fp - x - camera.focus * n
    alpha = jnp.sum(rel * a, axis=-1)
    beta = jnp.sum(rel * b, axis=-1)
    f = camera.focus / camera.focal_length
    f_rg = -camera.film_width * f / width
    f_up = -camera.film_height * f / height
    pix_i = alpha / f_rg + 0.5 * width
    pix_j = beta / f_up + 0.5 * height
    valid = valid & (pix_i >= 0) & (pix_i < width) & \
        (pix_j >= 0) & (pix_j < height)

    dist = jnp.sqrt(jnp.maximum(jnp.sum(to_y * to_y, axis=-1), 1e-20))
    direction = -to_y / dist[..., None]    # y -> aperture
    sensor = SENSOR_RESPONSE * 100.0 * camera.exposure_time
    weight = sensor * aperture_area(camera)   # = sensor / p_ap
    return dict(pix_i=pix_i, pix_j=pix_j, ap_pos=ap, dir=direction,
                dist=dist, cam_n=n, weight=weight, valid=valid)
