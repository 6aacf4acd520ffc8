"""BSDF models with a unified batched sample/eval/pdf interface.

TPU-native re-design of the reference's dlopen shader vtables
(corona-13 src/shader.c:577-593, src/shaders/*.c): materials become a small
static enum dispatched with masked evaluation over the wavefront — every
lane evaluates the kernels it needs, selected by ``jnp.where`` — instead of
per-path function pointers.  All quantities follow the reference's measure
conventions:

  * ``sample`` returns (wo, pdf, weight) with pdf in *projected solid angle*
    (divided by |cos_out|; converted to vertex area by G outside) and
    weight = f/pdf, exactly like shader_sample's contract
    (src/pathspace.c:203-207 multiplies it into the path throughput).
  * ``eval`` returns the plain BSDF value f (reference shader_brdf), used by
    NEE as f * G * transmittance * edf.
  * ``pdf`` returns the projected-solid-angle pdf of sampling wo from wi,
    for MIS (reference path_pdf_extend divides by G later).

Directions use the propagation convention: ``wi`` points *into* the vertex
(e[v].omega), ``wo`` away from it (e[v+1].omega).

Wavelength axis: all spectral quantities carry a trailing hero axis [MF].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils.math import dot, normalize, build_onb, from_frame, to_frame

# BSDF kinds (host shaders)
DIFFUSE = 0
DIELECTRIC = 1   # smooth+rough GGX dielectric, spectral Cauchy IOR
METAL = 2        # conductor with spectral complex fresnel
NULL = 3         # pass-through volume boundary (medium proxy shapes —
#   the analogue of hitting a shape whose shader is a pure medium like
#   medium_hete: no surface interaction, the ray continues straight and
#   only the interior tracking changes)
DIFFDIEL = 4     # diffuse-coated dielectric: fresnel-reflect (GGX/specular)
#   or cosine-diffuse *transmit* into the interior (skin/subsurface proxy,
#   reference src/shaders/diffdiel.c)
HAIR = 5         # fiber BSDF for line primitives: Kajiya-Kay diffuse +
#   truncated-gaussian longitudinal specular cone around the fiber
#   tangent (the TPU re-expression of the reference's longitudinal hair
#   lobes, src/shaders/hair.c — azimuth kept uniform; see hair_* below)

# vertex mode bits (subset of reference pathspace.h:57-72)
MODE_ABSORB = 0
MODE_DIFFUSE = 1 << 0
MODE_GLOSSY = 1 << 1
MODE_SPECULAR = 1 << 2
MODE_REFLECT = 1 << 3
MODE_TRANSMIT = 1 << 4
MODE_EMIT = 1 << 5
MODE_VOLUME = 1 << 6

GLOSSY_THR = 1e-3  # roughness below which we go specular (dielectric.c:35)


@struct.dataclass
class ShadingPoint:
    """Per-vertex shading state: the wavefront analogue of the reference's
    vertex_shading_t (pathspace.h:91-102) after shader_prepare."""
    kind: jnp.ndarray       # [N] int32 BSDF enum
    rd: jnp.ndarray         # [N, MF] diffuse reflectance
    rg: jnp.ndarray         # [N, MF] glossy coefficient
    em: jnp.ndarray         # [N, MF] emission
    roughness: jnp.ndarray  # [N]
    eta_ratio: jnp.ndarray  # [N, MF] n1/n2 along propagation (dielectric)
    fresnel_eta: jnp.ndarray  # [N, MF] conductor n (metal)
    fresnel_k: jnp.ndarray    # [N, MF] conductor k (metal)
    n: jnp.ndarray          # [N, 3] shading normal
    gn: jnp.ndarray         # [N, 3] geometric normal
    inside: jnp.ndarray     # [N] bool: hit from the inside (flags & s_inside)
    tangent: jnp.ndarray = None  # [N, 3] fiber direction (line prims/HAIR)


def fresnel_dielectric(n1, n2, cos_r, cos_t):
    """Unpolarized dielectric fresnel; returns 1 for TIR (cos_t <= 0)
    (reference dielectric.c:83-96).

    Division-safe: at cos_r == cos_t == 0 (grazing + TIR boundary on a
    masked lane) the naive ratios are 0/0, whose NaN poisons the shared
    per-material IOR gradient through the reverse pass even when the lane
    is where()-masked downstream."""
    ds = n1 * cos_r + n2 * cos_t
    dp = n2 * cos_r + n1 * cos_t
    ds = jnp.where(jnp.abs(ds) > 1e-12, ds, 1e-12)
    dp = jnp.where(jnp.abs(dp) > 1e-12, dp, 1e-12)
    rs = (n1 * cos_r - n2 * cos_t) / ds
    rp = (n2 * cos_r - n1 * cos_t) / dp
    r = jnp.clip(0.5 * (rs * rs + rp * rp), 0.0, 1.0)
    return jnp.where(cos_t <= 0.0, 1.0, r)


def fresnel_conductor(eta, k, cos_i):
    """Conductor fresnel for complex IOR eta - i*k (standard formula,
    covers reference src/shaders/fresnel.h usage in metal.c)."""
    c = jnp.clip(cos_i, 1e-6, 1.0)
    c2 = c * c
    s2 = 1.0 - c2
    e2 = eta * eta
    k2 = k * k
    t0 = e2 - k2 - s2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * e2 * k2, 1e-12))
    t1 = a2b2 + c2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 1e-12))
    t2 = 2.0 * a * c
    rs = (t1 - t2) / (t1 + t2)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / (t3 + t4)
    return jnp.clip(0.5 * (rs + rp), 0.0, 1.0)


# --- GGX visible-normal distribution --------------------------------------
# Heitz 2018 ("Sampling the GGX Distribution of Visible Normals") sphere-cap
# construction: same VNDF as the reference's slope-space sampler
# (src/shaders/ggx.h:60-165) with far fewer special cases on a SIMD machine.

def ggx_smith_g1(cos_wn, roughness):
    r2 = roughness * roughness
    c2 = jnp.clip(cos_wn * cos_wn, 1e-12, 1.0)
    t2 = (1.0 - c2) / c2
    return 2.0 / (1.0 + jnp.sqrt(1.0 + r2 * t2))


def ggx_ndf(cos_h, roughness):
    r2 = roughness * roughness
    c2 = jnp.clip(cos_h * cos_h, 1e-12, 1.0)
    t2 = (1.0 - c2) / c2
    den = c2 * c2 * (r2 + t2) ** 2
    return r2 / jnp.maximum(jnp.pi * den, 1e-20)


def ggx_sample_vndf(wi_t, roughness, r1, r2):
    """Sample a visible microfacet normal in tangent space.
    wi_t: [...,3] direction *away* from surface (z up), z > 0."""
    a = roughness
    # stretch
    vh = normalize(jnp.stack([a * wi_t[..., 0], a * wi_t[..., 1], wi_t[..., 2]], axis=-1))
    # orthonormal basis around vh
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(lensq[..., None] > 1e-12,
                   jnp.stack([-vh[..., 1] * inv, vh[..., 0] * inv, jnp.zeros_like(inv)], axis=-1),
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), vh.shape))
    t2v = jnp.cross(vh, t1)
    # parameterize the projected area (sphere cap)
    r = jnp.sqrt(r1)
    phi = 2.0 * jnp.pi * r2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 1e-12)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 1e-12))
    nh = p1[..., None] * t1 + p2[..., None] * t2v + p3[..., None] * vh
    # unstretch
    h = normalize(jnp.stack([a * nh[..., 0], a * nh[..., 1],
                             jnp.maximum(nh[..., 2], 0.0)], axis=-1))
    return h


def ggx_pdf_h(cos_h, cos_in, cos_r, roughness):
    """VNDF pdf of half vector h given incident wi (ggx.h:167-201):
    G1(wi) |wi.h| D(h) / |wi.n| — in half-vector solid angle measure."""
    d = ggx_ndf(cos_h, roughness)
    g1 = ggx_smith_g1(cos_in, roughness)
    return jnp.abs(g1 * cos_r * d / jnp.where(jnp.abs(cos_in) < 1e-8, 1e-8, cos_in))


# --- diffuse ---------------------------------------------------------------

def diffuse_sample(sp: ShadingPoint, wi, r1, r2):
    """Cosine sampling off the shading normal (reference shader.c:164-203).
    Returns (wo, pdf_proj[...,MF], weight[...,MF])."""
    n = jnp.where(sp.inside[..., None], -sp.n, sp.n)
    gn = jnp.where(sp.inside[..., None], -sp.gn, sp.gn)
    u, v = build_onb(n)
    phi = 2.0 * jnp.pi * r2
    s = jnp.sqrt(r1)
    z = jnp.sqrt(jnp.maximum(1.0 - r1, 0.0))
    wo = (z[..., None] * n + (s * jnp.cos(phi))[..., None] * u
          + (s * jnp.sin(phi))[..., None] * v)
    pdf = jnp.full(sp.rd.shape, 1.0 / jnp.pi)
    # reject directions below the geometric horizon (sample_d sidedness check)
    ok = dot(gn, wo) > 0.0
    w = jnp.where(ok[..., None], sp.rd, 0.0)
    return wo, pdf, w


def diffuse_eval(sp: ShadingPoint, wi, wo):
    """f = rd/pi on the correct side (reference brdf_d)."""
    n = jnp.where(sp.inside[..., None], -sp.n, sp.n)
    gn = jnp.where(sp.inside[..., None], -sp.gn, sp.gn)
    ok = (dot(n, wo) > 0.0) & (dot(gn, wo) > 0.0) & (dot(n, -wi) > 0.0)
    return jnp.where(ok[..., None], sp.rd / jnp.pi, 0.0)


def diffuse_pdf(sp: ShadingPoint, wi, wo):
    n = jnp.where(sp.inside[..., None], -sp.n, sp.n)
    ok = (dot(n, wo) > 0.0) & (dot(n, -wi) > 0.0)
    return jnp.where(ok[..., None], jnp.full(sp.rd.shape, 1.0 / jnp.pi), 0.0)


# --- rough/smooth dielectric ----------------------------------------------

def _dielectric_half_eta(sp: ShadingPoint):
    """n1, n2 for the current propagation direction ('fake etas' trick:
    n1 = eta_ratio, n2 = 1, dielectric.c:246)."""
    return sp.eta_ratio, jnp.ones_like(sp.eta_ratio)


def dielectric_sample(sp: ShadingPoint, wi, r1, r2, r_mode):
    """GGX dielectric sampling (reference dielectric.c:240-420).

    Hero-wavelength handling: reflection keeps all lanes (fresnel per lane);
    glossy transmission reconstructs per-lane half vectors; *specular*
    transmission collapses to the hero lane only (mask = mf_hero).
    Returns (wo, pdf_proj[MF], weight[MF], is_specular, did_transmit).
    """
    mf = sp.eta_ratio.shape[-1]
    n1, n2 = _dielectric_half_eta(sp)
    n = jnp.where(sp.inside[..., None], -sp.n, sp.n)
    r = sp.roughness
    glossy = r > GLOSSY_THR
    cos_in = -dot(n, wi)

    # half vector: VNDF sample (glossy) or the normal itself (specular)
    u, v = build_onb(n)
    wi_t = jnp.stack([-dot(u, wi), -dot(v, wi), cos_in], axis=-1)
    rr = jnp.maximum(r, GLOSSY_THR)
    h_t = ggx_sample_vndf(wi_t, rr, r1, r2)
    h_glossy = from_frame(u, v, n, h_t)
    h = jnp.where(glossy[..., None], h_glossy, n)
    cos_r = -dot(wi, h)
    pdf_h = jnp.where(glossy,
                      ggx_pdf_h(dot(h, n), cos_in, cos_r, rr), 1.0)

    # fresnel at the hero lane decides R vs T (dielectric.c:281)
    nr = n1 / n2
    cos_t2 = 1.0 - nr * nr * (1.0 - cos_r[..., None] ** 2)
    cos_t = jnp.where(cos_t2 <= 0.0, 0.0, jnp.sqrt(jnp.maximum(cos_t2, 1e-12)))
    big_r = fresnel_dielectric(n1, n2, cos_r[..., None], cos_t)
    r_hero = big_r[..., 0]
    do_reflect = r_mode <= r_hero

    # --- reflection branch
    wo_r = wi + 2.0 * cos_r[..., None] * h
    pdf_r = pdf_h / (4.0 * jnp.maximum(cos_r, 1e-12))
    cos_out_r = dot(wo_r, n)
    g1_r = ggx_smith_g1(cos_out_r, rr)
    ok_r = (cos_out_r > 0.0) & (cos_r > 0.0)
    pdf_proj_r = jnp.where(glossy[..., None],
                           big_r * (pdf_r / jnp.maximum(jnp.abs(cos_out_r), 1e-12))[..., None],
                           big_r)
    w_r = jnp.where(glossy[..., None], sp.rg * g1_r[..., None], sp.rg)
    w_r = jnp.where(ok_r[..., None], w_r, 0.0)

    # --- transmission branch (hero lane direction)
    eta0 = sp.eta_ratio[..., 0]
    f = eta0 * cos_r - cos_t[..., 0]
    wo_t = normalize(wi * eta0[..., None] + f[..., None] * h)
    cos_out_t = dot(wo_t, n)
    ok_t = (cos_out_t < 0.0) & (cos_r > 0.0) & (cos_t2[..., 0] > 0.0)

    # per-lane half-vector reconstruction for glossy transmit
    # generalized half vector wo = refract(wi, h) <=> h = s*(n1 wi - n2 wo),
    # s = sign(n2 - n1) (from wo = n1/n2 wi + f h with f = n1/n2 cos_r -
    # cos_t: f < 0 iff n1 < n2).  The sign is part of invertibility — a
    # forced flip-to-normal-side accepts phantom directions no refraction
    # reaches (their cos_h comes out negative and lane_ok rejects them).
    h_l = n1[..., None] * wi[..., None, :] - n2[..., None] * wo_t[..., None, :]
    h_l = normalize(h_l) * jnp.sign(n2 - n1)[..., None]
    cos_h_l = jnp.sum(h_l * n[..., None, :], axis=-1)
    cos_r_l = jnp.sum(h_l * (-wi[..., None, :]), axis=-1)
    lane_ok = (cos_h_l > 0.0) & (cos_r_l > 0.0)
    cos_t2_l = 1.0 - nr * nr * (1.0 - cos_r_l * cos_r_l)
    cos_t_l = jnp.where(cos_t2_l <= 0.0, 0.0, jnp.sqrt(jnp.maximum(cos_t2_l, 1e-12)))
    r_l = fresnel_dielectric(n1, n2, cos_r_l, cos_t_l)
    denom = n1 * cos_r_l - n2 * cos_t_l
    jac_t = n2 * n2 * cos_t_l / jnp.maximum(denom * denom, 1e-20)
    pdf_h_l = ggx_pdf_h(cos_h_l, cos_in[..., None], cos_r_l, rr[..., None])
    pdf_proj_t_glossy = jnp.where(
        lane_ok, pdf_h_l * jac_t * (1.0 - r_l)
        / jnp.maximum(jnp.abs(cos_out_t)[..., None], 1e-12), 0.0)
    g1_t = ggx_smith_g1(cos_out_t, rr)

    hero_mask = jnp.arange(mf) == 0
    pdf_proj_t = jnp.where(glossy[..., None], pdf_proj_t_glossy,
                           jnp.where(hero_mask, 1.0 - big_r, 0.0))
    w_t_glossy = jnp.where(lane_ok, sp.rg * g1_t[..., None], 0.0)
    w_t_spec = jnp.where(hero_mask, sp.rg, 0.0)
    w_t = jnp.where(glossy[..., None], w_t_glossy, w_t_spec)
    w_t = jnp.where(ok_t[..., None], w_t, 0.0)

    wo = jnp.where(do_reflect[..., None], wo_r, wo_t)
    pdf = jnp.where(do_reflect[..., None], pdf_proj_r, pdf_proj_t)
    # weight = f/p: mode-selection probability R (or 1-R) cancels per hero
    # lane; pdf above keeps the full R-weighted value for MIS like the
    # reference stores in v[v+1].pdf.
    w = jnp.where(do_reflect[..., None], w_r, w_t)
    # detached-estimator IOR gradient at specular lanes: the analytic
    # cancellation above also cancels d/d(ior) through the fresnel split.
    # Multiply by F/sg(F) (resp. (1-F)/sg(1-F)) — primal 1, but the
    # backward pass recovers d f/d ior at the fixed sample (unbiased
    # detached estimator; the refraction-direction dependence on ior
    # stays detached, see tests/test_grad.py).
    sg = jax.lax.stop_gradient
    f_att = jnp.where(do_reflect[..., None],
                      big_r / jnp.maximum(sg(big_r), 1e-6),
                      (1.0 - big_r) / jnp.maximum(sg(1.0 - big_r), 1e-6))
    w = w * jnp.where(glossy[..., None], 1.0, f_att)
    is_spec = ~glossy
    return wo, pdf, w, is_spec, ~do_reflect


def dielectric_eval_pdf(sp: ShadingPoint, wi, wo):
    """Joint eval + pdf for a given (wi, wo) pair — glossy lobes only;
    specular lobes evaluate to 0 like the reference brdf for NEE.
    Returns (f[MF], pdf_proj[MF])."""
    n1, n2 = _dielectric_half_eta(sp)
    n = jnp.where(sp.inside[..., None], -sp.n, sp.n)
    r = sp.roughness
    rr = jnp.maximum(r, GLOSSY_THR)
    glossy = r > GLOSSY_THR
    cos_in = -dot(n, wi)
    cos_out = dot(n, wo)
    reflectb = cos_out > 0.0

    nr = n1 / n2

    # reflection half vector (lane independent)
    h_r = normalize(wi - wo)
    h_r = jnp.where(dot(h_r, n)[..., None] < 0.0, -h_r, h_r)
    cos_h_r = jnp.abs(dot(h_r, n))
    cos_r_r = jnp.abs(dot(h_r, wi))
    cos_t2_r = 1.0 - nr * nr * (1.0 - cos_r_r[..., None] ** 2)
    cos_t_r = jnp.where(cos_t2_r <= 0.0, 0.0, jnp.sqrt(jnp.maximum(cos_t2_r, 1e-12)))
    big_r_r = fresnel_dielectric(n1, n2, cos_r_r[..., None], cos_t_r)
    d_r = ggx_ndf(cos_h_r, rr)
    g2_r = (ggx_smith_g1(cos_in, rr) * ggx_smith_g1(cos_out, rr))
    # microfacet BSDF value: F D G2 / (4 |cos_in| |cos_out|)
    f_refl = big_r_r * (d_r * g2_r / jnp.maximum(
        4.0 * jnp.abs(cos_in) * jnp.abs(cos_out), 1e-12))[..., None] * sp.rg
    pdf_h_r = ggx_pdf_h(cos_h_r, cos_in, cos_r_r, rr)
    pdf_refl = big_r_r * (pdf_h_r / jnp.maximum(
        4.0 * cos_r_r * jnp.abs(cos_out), 1e-12))[..., None]

    # transmission (per-lane half vectors, dielectric.c:168-190)
    # see dielectric_sample: sign(n2-n1) orientation makes h the *unique*
    # inverse of the refraction map; backfacing results are rejected below
    h_l = n1[..., None] * wi[..., None, :] - n2[..., None] * wo[..., None, :]
    h_l = normalize(h_l) * jnp.sign(n2 - n1)[..., None]
    cos_h_l = jnp.sum(h_l * n[..., None, :], axis=-1)
    cos_r_l = jnp.sum(h_l * (-wi[..., None, :]), axis=-1)
    lane_ok = (cos_h_l > 0.0) & (cos_r_l > 0.0)
    cos_t2_l = 1.0 - nr * nr * (1.0 - cos_r_l * cos_r_l)
    cos_t_l = jnp.where(cos_t2_l <= 0.0, 0.0, jnp.sqrt(jnp.maximum(cos_t2_l, 1e-12)))
    big_r_l = fresnel_dielectric(n1, n2, cos_r_l, cos_t_l)
    denom = n1 * cos_r_l - n2 * cos_t_l
    jac = n2 * n2 * cos_t_l / jnp.maximum(denom * denom, 1e-20)
    d_l = ggx_ndf(cos_h_l, rr[..., None])
    g2_l = (ggx_smith_g1(cos_in, rr) * ggx_smith_g1(cos_out, rr))[..., None]
    # transmissive microfacet bsdf (Walter et al. 2007 eq. 21 analogue)
    f_trans = (1.0 - big_r_l) * d_l * g2_l * cos_r_l * jac \
        / jnp.maximum(jnp.abs(cos_in) * jnp.abs(cos_out), 1e-12)[..., None] * sp.rg
    f_trans = jnp.where(lane_ok, f_trans, 0.0)
    pdf_h_l = ggx_pdf_h(cos_h_l, cos_in[..., None], cos_r_l, rr[..., None])
    pdf_trans = jnp.where(lane_ok, pdf_h_l * jac * (1.0 - big_r_l)
                          / jnp.maximum(jnp.abs(cos_out), 1e-12)[..., None], 0.0)

    f = jnp.where(reflectb[..., None], f_refl, f_trans)
    pdf = jnp.where(reflectb[..., None], pdf_refl, pdf_trans)
    valid = glossy & (cos_in > 0.0)
    f = jnp.where(valid[..., None], f, 0.0)
    pdf = jnp.where(valid[..., None], pdf, 0.0)
    return f, pdf


# --- diffuse-coated dielectric (diffdiel) ----------------------------------

def _diffdiel_fresnel(sp: ShadingPoint, cos_in):
    """Non-reciprocal fresnel on the surface-normal cosine (reference
    diffdiel.c:259-265: 'fake etas' n1 = eta_ratio, n2 = 1, R evaluated at
    cos_in rather than the half-vector cosine)."""
    n1, n2 = _dielectric_half_eta(sp)
    nr = n1 / n2
    cos_t2 = 1.0 - nr * nr * (1.0 - cos_in[..., None] ** 2)
    cos_t = jnp.where(cos_t2 <= 0.0, 0.0,
                      jnp.sqrt(jnp.maximum(cos_t2, 1e-12)))
    return fresnel_dielectric(n1, n2, cos_in[..., None], cos_t)


def diffdiel_sample(sp: ShadingPoint, wi, r1, r2, r_mode):
    """Sample reflect (GGX / specular mirror) vs diffuse transmit
    (reference diffdiel.c sample: reflect like dielectric, transmit =
    cosine lobe *into* the surface with f = rg (1-R) / pi).

    Returns (wo, pdf_proj[MF], weight[MF], is_specular, did_transmit)."""
    n = jnp.where(sp.inside[..., None], -sp.n, sp.n)
    r = sp.roughness
    rr = jnp.maximum(r, GLOSSY_THR)
    glossy = r > GLOSSY_THR
    cos_in = -dot(n, wi)

    u, v = build_onb(n)
    wi_t = jnp.stack([-dot(u, wi), -dot(v, wi), cos_in], axis=-1)
    h_t = ggx_sample_vndf(wi_t, rr, r1, r2)
    h = jnp.where(glossy[..., None], from_frame(u, v, n, h_t), n)
    cos_r = -dot(wi, h)
    pdf_h = jnp.where(glossy, ggx_pdf_h(dot(h, n), cos_in, cos_r, rr), 1.0)

    big_r = _diffdiel_fresnel(sp, cos_in)
    r_hero = big_r[..., 0]
    do_reflect = r_mode <= r_hero

    # reflection branch (same shape as the dielectric reflect lobe)
    wo_r = wi + 2.0 * cos_r[..., None] * h
    cos_out_r = dot(wo_r, n)
    ok_r = (cos_out_r > 0.0) & (cos_r > 0.0) & (cos_in > 0.0)
    pdf_proj_r = jnp.where(
        glossy[..., None],
        big_r * (pdf_h / (4.0 * jnp.maximum(cos_r, 1e-12))
                 / jnp.maximum(jnp.abs(cos_out_r), 1e-12))[..., None],
        big_r)
    g1_r = ggx_smith_g1(cos_out_r, rr)
    w_r = jnp.where(glossy[..., None], sp.rg * g1_r[..., None], sp.rg)
    w_r = jnp.where(ok_r[..., None], w_r, 0.0)

    # diffuse transmission branch: cosine lobe around -n
    phi = 2.0 * jnp.pi * r2
    s = jnp.sqrt(r1)
    z = jnp.sqrt(jnp.maximum(1.0 - r1, 0.0))
    wo_t = (-z[..., None] * n + (s * jnp.cos(phi))[..., None] * u
            + (s * jnp.sin(phi))[..., None] * v)
    pdf_proj_t = (1.0 - big_r) / jnp.pi
    ok_t = cos_in > 0.0
    w_t = jnp.where(ok_t[..., None], sp.rg, 0.0)

    wo = jnp.where(do_reflect[..., None], wo_r, wo_t)
    pdf = jnp.where(do_reflect[..., None], pdf_proj_r, pdf_proj_t)
    w = jnp.where(do_reflect[..., None], w_r, w_t)
    is_spec = ~glossy & do_reflect
    return wo, pdf, w, is_spec, ~do_reflect


def diffdiel_eval_pdf(sp: ShadingPoint, wi, wo):
    """Eval + pdf for connections (reference diffdiel.c brdf/pdf): the
    diffuse transmit lobe always connects; the reflect lobe only when
    glossy."""
    n = jnp.where(sp.inside[..., None], -sp.n, sp.n)
    r = sp.roughness
    rr = jnp.maximum(r, GLOSSY_THR)
    glossy = r > GLOSSY_THR
    cos_in = -dot(n, wi)
    cos_out = dot(n, wo)
    big_r = _diffdiel_fresnel(sp, cos_in)

    # reflect lobe (glossy only)
    h = normalize(wi - wo)
    h = jnp.where(dot(h, n)[..., None] < 0.0, -h, h)
    cos_h = jnp.abs(dot(h, n))
    cos_r = jnp.abs(dot(h, wi))
    d = ggx_ndf(cos_h, rr)
    g2 = ggx_smith_g1(cos_in, rr) * ggx_smith_g1(cos_out, rr)
    f_refl = big_r * sp.rg * (d * g2 / jnp.maximum(
        4.0 * jnp.abs(cos_in) * jnp.abs(cos_out), 1e-12))[..., None]
    pdf_h = ggx_pdf_h(cos_h, cos_in, cos_r, rr)
    pdf_refl = big_r * (pdf_h / jnp.maximum(
        4.0 * cos_r * jnp.abs(cos_out), 1e-12))[..., None]
    refl_ok = glossy & (cos_out > 0.0)

    # diffuse transmit lobe
    one_m_r = jnp.clip(1.0 - big_r, 0.0, 1.0)
    f_trans = sp.rg * one_m_r / jnp.pi
    pdf_trans = one_m_r / jnp.pi
    trans_ok = cos_out < 0.0

    f = jnp.where(refl_ok[..., None], f_refl,
                  jnp.where(trans_ok[..., None], f_trans, 0.0))
    pdf = jnp.where(refl_ok[..., None], pdf_refl,
                    jnp.where(trans_ok[..., None], pdf_trans, 0.0))
    valid = cos_in > 0.0
    return (jnp.where(valid[..., None], f, 0.0),
            jnp.where(valid[..., None], pdf, 0.0))


# --- metal (conductor) -----------------------------------------------------

def metal_sample(sp: ShadingPoint, wi, r1, r2):
    """GGX conductor; rough or specular mirror (reference metal.c)."""
    n = jnp.where(sp.inside[..., None], -sp.n, sp.n)
    r = sp.roughness
    rr = jnp.maximum(r, GLOSSY_THR)
    glossy = r > GLOSSY_THR
    cos_in = -dot(n, wi)
    u, v = build_onb(n)
    wi_t = jnp.stack([-dot(u, wi), -dot(v, wi), cos_in], axis=-1)
    h_t = ggx_sample_vndf(wi_t, rr, r1, r2)
    h = jnp.where(glossy[..., None], from_frame(u, v, n, h_t), n)
    cos_r = -dot(wi, h)
    wo = wi + 2.0 * cos_r[..., None] * h
    cos_out = dot(wo, n)
    fr = fresnel_conductor(sp.fresnel_eta, sp.fresnel_k, cos_r[..., None])
    pdf_h = jnp.where(glossy, ggx_pdf_h(dot(h, n), cos_in, cos_r, rr), 1.0)
    pdf = jnp.where(glossy[..., None],
                    (pdf_h / (4.0 * jnp.maximum(cos_r, 1e-12))
                     / jnp.maximum(jnp.abs(cos_out), 1e-12))[..., None],
                    jnp.ones_like(fr))
    g1o = ggx_smith_g1(cos_out, rr)
    w = fr * sp.rg * jnp.where(glossy, g1o, 1.0)[..., None]
    ok = (cos_out > 0.0) & (cos_r > 0.0) & (cos_in > 0.0)
    w = jnp.where(ok[..., None], w, 0.0)
    return wo, pdf, w, ~glossy


def metal_eval_pdf(sp: ShadingPoint, wi, wo):
    n = jnp.where(sp.inside[..., None], -sp.n, sp.n)
    r = sp.roughness
    rr = jnp.maximum(r, GLOSSY_THR)
    glossy = r > GLOSSY_THR
    cos_in = -dot(n, wi)
    cos_out = dot(n, wo)
    h = normalize(wi - wo)
    h = jnp.where(dot(h, n)[..., None] < 0.0, -h, h)
    cos_h = jnp.abs(dot(h, n))
    cos_r = jnp.abs(dot(h, wi))
    fr = fresnel_conductor(sp.fresnel_eta, sp.fresnel_k, cos_r[..., None])
    d = ggx_ndf(cos_h, rr)
    g2 = ggx_smith_g1(cos_in, rr) * ggx_smith_g1(cos_out, rr)
    f = fr * sp.rg * (d * g2 / jnp.maximum(4.0 * jnp.abs(cos_in) * jnp.abs(cos_out), 1e-12))[..., None]
    pdf_h = ggx_pdf_h(cos_h, cos_in, cos_r, rr)
    pdf = (pdf_h / jnp.maximum(4.0 * cos_r * jnp.abs(cos_out), 1e-12))[..., None]
    pdf = jnp.broadcast_to(pdf, f.shape)
    valid = glossy & (cos_in > 0.0) & (cos_out > 0.0)
    return (jnp.where(valid[..., None], f, 0.0),
            jnp.where(valid[..., None], pdf, 0.0))


# --- dispatch --------------------------------------------------------------

def _hair_frame(sp, wi):
    """Fiber frame: tangent T, an ONB (U, V) around it, and the incoming
    tangential component ci = dot(T, -wi) that the specular cone
    preserves (reflection off a cylinder flips only the radial part)."""
    t = sp.tangent if sp.tangent is not None else sp.n
    t = normalize(t)
    u, v = build_onb(t)
    ci = dot(t, -wi)
    return t, u, v, ci


_HAIR_BETA_MIN = 0.02


def _hair_lobes(sp):
    """Per-lane lobe energies (hero lane 0): diffuse rd, specular rg."""
    e_d = jnp.maximum(sp.rd[..., 0], 0.0)
    e_s = jnp.maximum(sp.rg[..., 0], 0.0)
    tot = jnp.maximum(e_d + e_s, 1e-12)
    return e_d / tot, e_s / tot


def _hair_spec_norm(ci, beta):
    """Truncated-gaussian normalization over co in [-1, 1]."""
    from jax.scipy.special import erf
    s = beta * np.sqrt(2.0)
    return jnp.maximum(0.5 * (erf((1.0 - ci) / s) - erf((-1.0 - ci) / s)),
                       1e-6)


def hair_S(sp, wi, wo):
    """Fiber scattering distribution S(wo) per solid angle [N, MF]
    (energy-normalized): Kajiya-Kay diffuse sin(theta)/pi^2 + gaussian
    longitudinal specular cone / (2 pi norm)."""
    t, _, _, ci = _hair_frame(sp, wi)
    co = dot(t, wo)
    sin_o = jnp.sqrt(jnp.maximum(1.0 - co * co, 1e-12))
    beta = jnp.maximum(sp.roughness, _HAIR_BETA_MIN)
    s_d = sp.rd * (sin_o / (np.pi ** 2))[..., None]
    g = jnp.exp(-0.5 * ((co - ci) / beta) ** 2) / \
        (beta * np.sqrt(2.0 * np.pi))
    s_s = sp.rg * (g / (_hair_spec_norm(ci, beta) * 2.0 * np.pi))[..., None]
    return s_d + s_s


def hair_pdf_w(sp, wi, wo):
    """Solid-angle pdf of hair_sample's lobe mixture."""
    t, _, _, ci = _hair_frame(sp, wi)
    co = dot(t, wo)
    beta = jnp.maximum(sp.roughness, _HAIR_BETA_MIN)
    p_d, p_s = _hair_lobes(sp)
    pdf_diff = 1.0 / (4.0 * np.pi)
    g = jnp.exp(-0.5 * ((co - ci) / beta) ** 2) / \
        (beta * np.sqrt(2.0 * np.pi))
    pdf_spec = g / (_hair_spec_norm(ci, beta) * 2.0 * np.pi)
    return p_d * pdf_diff + p_s * pdf_spec


def hair_eval_pdf(sp, wi, wo):
    """(f, pdf_proj) in the renderer's surface convention: the pipeline
    multiplies |cos(n, wo)| into NEE/extension, so f = S/|cos| and
    pdf_proj = pdf_w/|cos| keep the fiber distribution intact."""
    cos_n = jnp.maximum(jnp.abs(dot(sp.n, wo)), 1e-4)
    f = hair_S(sp, wi, wo) / cos_n[..., None]
    pdf_proj = hair_pdf_w(sp, wi, wo) / cos_n
    return f, jnp.broadcast_to(pdf_proj[..., None], f.shape)


def hair_sample(sp, wi, r1, r2, r_mode):
    """Sample the lobe mixture; returns (wo, pdf_proj[MF], w[MF])
    with w = S/pdf_w (the f |cos| / pdf convention of the other kinds)."""
    from jax.scipy.special import erf, erfinv
    t, u, v, ci = _hair_frame(sp, wi)
    beta = jnp.maximum(sp.roughness, _HAIR_BETA_MIN)
    p_d, p_s = _hair_lobes(sp)
    phi = 2.0 * np.pi * r2
    # diffuse: uniform sphere
    co_d = 2.0 * r1 - 1.0
    # specular: truncated gaussian around ci via inverse CDF
    s = beta * np.sqrt(2.0)
    lo = erf((-1.0 - ci) / s)
    hi = erf((1.0 - ci) / s)
    co_s = ci + s * erfinv(jnp.clip(lo + r1 * (hi - lo), -1 + 1e-7,
                                    1 - 1e-7))
    use_s = r_mode < p_s
    co = jnp.clip(jnp.where(use_s, co_s, co_d), -1.0 + 1e-6, 1.0 - 1e-6)
    sin_o = jnp.sqrt(1.0 - co * co)
    wo = (co[..., None] * t
          + (sin_o * jnp.cos(phi))[..., None] * u
          + (sin_o * jnp.sin(phi))[..., None] * v)
    wo = normalize(wo)
    pdf_w = hair_pdf_w(sp, wi, wo)
    s_val = hair_S(sp, wi, wo)
    w = s_val / jnp.maximum(pdf_w, 1e-12)[..., None]
    cos_n = jnp.maximum(jnp.abs(dot(sp.n, wo)), 1e-4)
    pdf_proj = jnp.broadcast_to((pdf_w / cos_n)[..., None], w.shape)
    return wo, pdf_proj, w


ALL_KINDS = (DIFFUSE, DIELECTRIC, METAL, DIFFDIEL, HAIR)


def bsdf_sample(sp: ShadingPoint, wi, r1, r2, r_mode, kinds=ALL_KINDS):
    """Sample all lobes present in the scene and select by material kind.

    ``kinds``: static tuple of material kinds the scene uses — branches
    for absent kinds compile away entirely (XLA specializes per scene,
    the runtime analogue of the reference's compile-time config.mk
    module selection).

    Returns (wo, pdf_proj[MF], weight[MF], mode_bits[int32]).
    """
    wo = jnp.broadcast_to(wi, wi.shape)
    pdf = jnp.zeros_like(sp.rd)
    w = jnp.zeros_like(sp.rd)
    mode = jnp.zeros(wi.shape[:-1], jnp.int32)

    if DIFFUSE in kinds:
        wo_d, pdf_d, w_d = diffuse_sample(sp, wi, r1, r2)
        is_d = sp.kind == DIFFUSE
        wo = jnp.where(is_d[..., None], wo_d, wo)
        pdf = jnp.where(is_d[..., None], pdf_d, pdf)
        w = jnp.where(is_d[..., None], w_d, w)
        mode = jnp.where(is_d, MODE_DIFFUSE | MODE_REFLECT, mode)
    if DIELECTRIC in kinds:
        wo_g, pdf_g, w_g, spec_g, trans_g = dielectric_sample(sp, wi, r1, r2,
                                                              r_mode)
        is_g = sp.kind == DIELECTRIC
        wo = jnp.where(is_g[..., None], wo_g, wo)
        pdf = jnp.where(is_g[..., None], pdf_g, pdf)
        w = jnp.where(is_g[..., None], w_g, w)
        g_mode = jnp.where(spec_g, MODE_SPECULAR, MODE_GLOSSY) | \
            jnp.where(trans_g, MODE_TRANSMIT, MODE_REFLECT)
        mode = jnp.where(is_g, g_mode, mode)
    if METAL in kinds:
        wo_m, pdf_m, w_m, spec_m = metal_sample(sp, wi, r1, r2)
        is_m = sp.kind == METAL
        wo = jnp.where(is_m[..., None], wo_m, wo)
        pdf = jnp.where(is_m[..., None], pdf_m, pdf)
        w = jnp.where(is_m[..., None], w_m, w)
        m_mode = jnp.where(spec_m, MODE_SPECULAR, MODE_GLOSSY) | MODE_REFLECT
        mode = jnp.where(is_m, m_mode, mode)

    if DIFFDIEL in kinds:
        wo_s, pdf_s, w_s, spec_s, trans_s = diffdiel_sample(sp, wi, r1, r2,
                                                            r_mode)
        is_s = sp.kind == DIFFDIEL
        wo = jnp.where(is_s[..., None], wo_s, wo)
        pdf = jnp.where(is_s[..., None], pdf_s, pdf)
        w = jnp.where(is_s[..., None], w_s, w)
        s_mode = jnp.where(spec_s, MODE_SPECULAR,
                           jnp.where(trans_s, MODE_DIFFUSE, MODE_GLOSSY)) | \
            jnp.where(trans_s, MODE_TRANSMIT, MODE_REFLECT)
        mode = jnp.where(is_s, s_mode, mode)
    if HAIR in kinds:
        wo_f, pdf_f, w_f = hair_sample(sp, wi, r1, r2, r_mode)
        is_f = sp.kind == HAIR
        wo = jnp.where(is_f[..., None], wo_f, wo)
        pdf = jnp.where(is_f[..., None], pdf_f, pdf)
        w = jnp.where(is_f[..., None], w_f, w)
        mode = jnp.where(is_f, MODE_GLOSSY | MODE_REFLECT, mode)
    if NULL in kinds:
        is_n = sp.kind == NULL
        wo = jnp.where(is_n[..., None], wi, wo)
        pdf = jnp.where(is_n[..., None], 1.0, pdf)
        w = jnp.where(is_n[..., None], 1.0, w)
        mode = jnp.where(is_n, MODE_SPECULAR | MODE_TRANSMIT, mode)

    mode = jnp.where(jnp.any(w > 0.0, axis=-1), mode, MODE_ABSORB)

    # detached-estimator weights: the analytic f/p simplifications above
    # cancel parameter dependence (e.g. VNDF weight rg*G1 drops the
    # fresnel, so d/d(ior) == 0 and d/d(roughness) is wrong-signed).  For
    # connectable (non-specular) lanes recompute w = f / stop_grad(p)
    # through the eval path: the primal value is identical (f/p equals
    # the simplified ratio), but gradients w.r.t. roughness/IOR/albedo
    # now match d/dtheta of the integrand at fixed sample locations —
    # the unbiased detached estimator (BASELINE.md gradient gate).
    # evaluate on a defanged copy for the lanes whose recomputed weight is
    # DISCARDED (specular/absorb): GGX's D at roughness 0 with h == n is
    # 0/0, and although the primal is masked off below, the backward pass
    # still differentiates it per-lane — the NaN cotangent then sums into
    # the shared per-material roughness/IOR gradients (this made
    # d(image)/d(ior_nd) NaN on any scene with a smooth dielectric)
    discarded = ((mode & MODE_SPECULAR) != 0) | ((mode & MODE_ABSORB) != 0) \
        | (mode == 0)
    sp_safe = sp.replace(roughness=jnp.where(discarded, 0.5, sp.roughness))
    f_at, p_at = bsdf_eval_pdf(sp_safe, wi, wo, kinds=kinds)
    p_det = jax.lax.stop_gradient(p_at)
    w_att = jnp.where(p_det > 0.0, f_at / jnp.where(p_det > 0.0, p_det, 1.0),
                      0.0)
    use_att = (((mode & MODE_SPECULAR) == 0) & ((mode & MODE_ABSORB) == 0)
               & (mode != 0))[..., None] & (p_det > 0.0) \
        & jnp.isfinite(w_att)
    w = jnp.where(use_att, w_att, w)
    return wo, pdf, w, mode.astype(jnp.int32)


def bsdf_eval_pdf(sp: ShadingPoint, wi, wo, kinds=ALL_KINDS):
    """Evaluate f and pdf for a connection direction (NEE / MIS).
    Specular lobes return 0 (cannot be hit by connections)."""
    f = jnp.zeros_like(sp.rd)
    pdf = jnp.zeros_like(sp.rd)
    if DIFFUSE in kinds:
        is_d = (sp.kind == DIFFUSE)[..., None]
        f = jnp.where(is_d, diffuse_eval(sp, wi, wo), f)
        pdf = jnp.where(is_d, diffuse_pdf(sp, wi, wo), pdf)
    if DIELECTRIC in kinds:
        is_g = (sp.kind == DIELECTRIC)[..., None]
        f_g, p_g = dielectric_eval_pdf(sp, wi, wo)
        f = jnp.where(is_g, f_g, f)
        pdf = jnp.where(is_g, p_g, pdf)
    if METAL in kinds:
        is_m = (sp.kind == METAL)[..., None]
        f_m, p_m = metal_eval_pdf(sp, wi, wo)
        f = jnp.where(is_m, f_m, f)
        pdf = jnp.where(is_m, p_m, pdf)
    if DIFFDIEL in kinds:
        is_s = (sp.kind == DIFFDIEL)[..., None]
        f_s, p_s = diffdiel_eval_pdf(sp, wi, wo)
        f = jnp.where(is_s, f_s, f)
        pdf = jnp.where(is_s, p_s, pdf)
    if HAIR in kinds:
        is_f = (sp.kind == HAIR)[..., None]
        f_f, p_f = hair_eval_pdf(sp, wi, wo)
        f = jnp.where(is_f, f_f, f)
        pdf = jnp.where(is_f, p_f, pdf)
    return f, pdf
