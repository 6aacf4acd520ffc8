"""Homogeneous participating media (absorption + scattering + HG phase).

TPU-native equivalent of the reference's homogeneous medium shaders
(corona-13 src/shaders/medium_rgb.c, the analytic transmittance / exp
free-path fallbacks in src/shader.c:48-106) and the volume branch of
path_extend/nee: media parameters live in the material table
(scene.MaterialTable med_* columns, filled from ``medium_rgb``/``color v``
lines via mult/interior chains), a path tracks its current interior
material id, and free-flight sampling happens against the hero-wavelength
extinction with per-lane spectral reweighting:

    pdf(dist)   = sigma_t_hero * exp(-sigma_t_hero * dist)
    weight_l    = sigma_s_l * exp(-sigma_t_l * dist) / pdf       (scatter)
    pdf(surf)   = exp(-sigma_t_hero * t_hit)
    weight_l    = exp(-sigma_t_l * t_hit) / pdf(surf)            (pass-through)

Phase function: Henyey-Greenstein with mean cosine g (med_g), matching
the reference's HG sampling (shader.c volume callbacks; mf_set semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..spectral import rgb2spec
from ..utils.math import dot, normalize, build_onb


def sigma_t(materials, med, lam):
    """Extinction sigma_t(lambda) [N, MF] for medium material ids ``med``
    (-1 = vacuum -> 0).  med_mut stores 1/mfp fitted spectra."""
    m = jnp.maximum(med, 0)
    st = (materials.med_mut_mul[m, None]
          * rgb2spec.eval_coeff(materials.med_mut_coeff[m][..., None, :], lam))
    return jnp.where((med >= 0)[..., None], st, 0.0)


def sigma_s(materials, med, lam):
    """Scattering coefficient sigma_s = sigma_t * albedo(lambda)."""
    m = jnp.maximum(med, 0)
    alb = jnp.clip(
        materials.med_mus_mul[m, None]
        * rgb2spec.eval_coeff(materials.med_mus_coeff[m][..., None, :], lam),
        0.0, 1.0)
    return sigma_t(materials, med, lam) * alb


def transmittance(materials, med, lam, dist):
    """exp(-sigma_t * dist) per hero lane; 1 in vacuum."""
    st = sigma_t(materials, med, lam)
    return jnp.exp(-st * jnp.minimum(dist, 1e4)[..., None])


def sample_dist(materials, med, lam, t_hit, rnd):
    """Hero-wavelength free-flight sampling.

    Returns (scatter [N] bool, dist [N], weight [N, MF]) — weight is the
    spectral f/p factor to multiply into the path throughput for either
    outcome (scatter at ``dist`` or pass through to the surface at
    ``t_hit``)."""
    st = sigma_t(materials, med, lam)            # [N, MF]
    st_h = st[..., 0]
    in_med = (med >= 0) & (st_h > 0.0)
    st_h_safe = jnp.where(in_med, st_h, 1.0)
    # the sampled distance is a *sampling decision* — detached like BSDF
    # directions, so gradients w.r.t. sigma flow through the weight's
    # numerator at fixed sample locations (detached estimator)
    dist = jax.lax.stop_gradient(
        -jnp.log(jnp.maximum(1.0 - rnd, 1e-20)) / st_h_safe)
    scatter = in_med & (dist < t_hit)
    d_eff = jnp.where(scatter, dist, jax.lax.stop_gradient(t_hit))
    d_eff = jnp.minimum(d_eff, 1e4)
    tr = jnp.exp(-st * d_eff[..., None])         # per-lane transmittance
    ss = sigma_s(materials, med, lam)
    # scatter: sigma_s_l * T_l / (sigma_t_h * T_h); surface: T_l / T_h —
    # pdf denominators are detached VALUES (f / sg(p)) so d/d(sigma) of
    # the weight matches the integrand derivative, not an analytic cancel
    pdf_scatter = jax.lax.stop_gradient(
        st_h_safe[..., None] * tr[..., 0:1])
    w_scatter = ss * tr / jnp.maximum(pdf_scatter, 1e-30)
    w_surface = tr / jnp.maximum(jax.lax.stop_gradient(tr[..., 0:1]), 1e-30)
    w = jnp.where(scatter[..., None], w_scatter, w_surface)
    w = jnp.where(in_med[..., None], w, 1.0)
    return scatter, dist, w


def sample_dist_scene(scene, med, lam, org, w, t_hit, rnd):
    """Scene-level free-flight sampling: homogeneous material media plus
    the heterogeneous grid (scene.vol) when present.  Same contract as
    :func:`sample_dist`; ``org``/``w`` locate the ray for grid marching."""
    scat, dist, wgt = sample_dist(scene.materials, med, lam, t_hit, rnd)
    if scene.has_hete:
        from . import medium_hete
        in_h = med == scene.vol.mat_id
        s2, d2, w2 = medium_hete.sample_dist(scene.vol, org, w, t_hit, rnd)
        scat = jnp.where(in_h, s2, scat)
        dist = jnp.where(in_h, d2, dist)
        wgt = jnp.where(in_h[..., None], w2[..., None], wgt)
    return scat, dist, wgt


def transmittance_scene(scene, med, lam, org, w, dist):
    """Scene-level transmittance along [0, dist] from org."""
    tr = transmittance(scene.materials, med, lam, dist)
    if scene.has_hete:
        from . import medium_hete
        in_h = med == scene.vol.mat_id
        t2 = medium_hete.transmittance(scene.vol, org, w, dist)
        tr = jnp.where(in_h[..., None], t2[..., None], tr)
    return tr


def hg_phase(g, cos_t):
    """Henyey-Greenstein phase function value (1/sr)."""
    denom = jnp.maximum(1.0 + g * g - 2.0 * g * cos_t, 1e-8)
    return (1.0 - g * g) / (4.0 * jnp.pi * denom * jnp.sqrt(denom))


def hg_sample(g, wi, r1, r2):
    """Sample an outgoing direction around the propagation direction wi.

    Returns (wo [N,3], pdf [N]); pdf equals the phase value (perfect
    importance sampling), isotropic for |g| ~ 0."""
    g = jnp.asarray(g)
    iso = jnp.abs(g) < 1e-3
    g_safe = jnp.where(iso, 0.5, g)
    sq = (1.0 - g_safe * g_safe) / (1.0 + g_safe - 2.0 * g_safe * r1)
    cos_t_aniso = (1.0 + g_safe * g_safe - sq * sq) / (2.0 * g_safe)
    cos_t = jnp.where(iso, 1.0 - 2.0 * r1, jnp.clip(cos_t_aniso, -1.0, 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
    phi = 2.0 * jnp.pi * r2
    u, v = build_onb(wi)
    wo = (cos_t[..., None] * wi
          + (sin_t * jnp.cos(phi))[..., None] * u
          + (sin_t * jnp.sin(phi))[..., None] * v)
    return normalize(wo), hg_phase(g, cos_t)


# --- nested-media priority stack -------------------------------------------
# The reference resolves overlapping media with a per-path stack where the
# smallest shape id wins (_path_edge_medium, src/pathspace.c:80-115).  The
# wavefront analogue is a small fixed-depth sorted *set* of interior
# material ids per lane: push on entering transmission, pop on exiting,
# current medium = the minimum id (materials are declared in shape-priority
# order in .nra2 scenes).  EMPTY slots sort to the top.

MED_STACK_DEPTH = 4
MED_EMPTY = 0x7fffffff


def stack_init(template):
    """Empty stack [N, D] carrying the varying axes of ``template`` [N]."""
    return (template[..., None] * 0 + MED_EMPTY) * jnp.ones(
        (MED_STACK_DEPTH,), jnp.int32)


def stack_current(stack):
    """Active interior material id per lane (-1 = vacuum)."""
    m = jnp.min(stack, axis=-1)
    return jnp.where(m == MED_EMPTY, -1, m)


def stack_push(stack, mat, do):
    """Insert ``mat`` where ``do``; on overflow the largest id (lowest
    priority) falls off."""
    entry = jnp.where(do, mat, MED_EMPTY)
    ext = jnp.concatenate([stack, entry[..., None]], axis=-1)
    ext = jnp.sort(ext, axis=-1)
    return ext[..., :MED_STACK_DEPTH]


def stack_pop(stack, mat, do):
    """Remove one instance of ``mat`` where ``do``."""
    hit = stack == mat[..., None]
    first = (jnp.cumsum(hit.astype(jnp.int32), axis=-1) == 1) & hit
    rm = first & do[..., None]
    return jnp.sort(jnp.where(rm, MED_EMPTY, stack), axis=-1)


def equiangular_sample(org, w, light_pos, t_max, rnd):
    """Equiangular distance sampling along [0, t_max] of the ray
    (org, w) toward a light point (Kulla/Fajardo; reference
    include/pathspace/equiangular.h): the scatter distance is drawn
    proportional to 1/d^2 to the light, which cancels the geometric
    spike of short connections.

    Returns (t [N], pdf [N]) with pdf in distance measure (0 where the
    sampling degenerates: t_max <= 0)."""
    to_l = light_pos - org
    a = dot(to_l, w)                       # closest-approach parameter
    d2 = jnp.maximum(dot(to_l, to_l) - a * a, 1e-12)
    dd = jnp.sqrt(d2)
    th_a = jnp.arctan2(0.0 - a, dd)
    th_b = jnp.arctan2(t_max - a, dd)
    span = jnp.maximum(th_b - th_a, 1e-9)
    th = th_a + rnd * span
    t = a + dd * jnp.tan(th)
    t = jnp.clip(t, 0.0, t_max)
    pdf = dd / (span * (d2 + (t - a) ** 2))
    ok = t_max > 0.0
    return jnp.where(ok, t, 0.0), jnp.where(ok, pdf, 0.0)
