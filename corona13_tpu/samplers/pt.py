"""Wavefront path tracer: pt and ptdl (PT + next-event estimation).

TPU-native re-design of the reference samplers (corona-13
src/sampler.d/pt.c and ptdl.c): instead of a per-thread recursive path_t
state machine, a fixed-size ray SoA advances through a ``lax.scan`` over
bounces with masked (alive) lanes.  Measure bookkeeping matches the
reference exactly:

  * vertex pdfs are tracked in vertex-area measure (projected-solid-angle
    pdf times the geometric term, path_extend pathspace.c:262);
  * hero-wavelength MIS: per-lane products of vertex pdfs, combined with
    the balance heuristic over lanes (pt.c:30-38, ptdl.c:78-88) — the
    running product is renormalized per step, which leaves the weights
    unchanged (they are scale-invariant across lanes) but keeps fp32 happy
    where the reference uses doubles (md_t);
  * NEE splats weight (rr*pdf_nee) vs pdf_extend with the power... no:
    balance heuristic per ptdl.c sampler_mis.

Emitter-hit MIS pdf2 = nee_pdf (0 for length<3 or specular-only previous
vertex, include/pathspace/nee.h:21-26).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..models import camera as camera_mod
from ..models import lights as lights_mod
from ..models import shading as shading_mod
from ..models import bsdf as bsdf_mod
from ..ops import rng
from ..ops.trace import intersect, occluded, INVALID_PRIM
from ..spectral import cie
from ..utils.math import dot, normalize, ray_offset


@struct.dataclass
class PTConfig:
    width: int = struct.field(pytree_node=False, default=1024)
    height: int = struct.field(pytree_node=False, default=576)
    max_verts: int = struct.field(pytree_node=False, default=16)
    mf: int = struct.field(pytree_node=False, default=4)
    use_nee: bool = struct.field(pytree_node=False, default=True)
    pointsampler: str = struct.field(pytree_node=False, default='rand')
    seed: int = struct.field(pytree_node=False, default=0)
    rr_start: int = struct.field(pytree_node=False, default=4)  # path length
    # pt.c does throughput-ratio RR after length>3; ptdl runs to max_verts


def _hero_mis(pdf_prod_prev, our_pdf, other_pdf):
    """Joint balance heuristic over hero lanes and (our, other) techniques
    (ptdl.c:78-88).  pdf_prod_prev: per-lane product of vertex pdfs up to
    the second-to-last vertex; our/other: last-vertex pdfs per lane."""
    our = our_pdf * pdf_prod_prev
    other = other_pdf * pdf_prod_prev
    denom = jnp.sum(our + other, axis=-1, keepdims=True)
    return jnp.where(denom > 0.0, our / denom, 0.0)


def _lambert(n, w):
    return jnp.abs(dot(n, w))


def sample_paths(scene, cfg: PTConfig, sample_idx, pixel_idx):
    """Trace one path per entry of pixel_idx; returns spectral radiance
    accumulated per path [N, MF], the wavelengths [N, MF], and the image
    positions [N] (pix_i, pix_j)."""
    n = pixel_idx.shape[0]
    mf = cfg.mf
    ps = cfg.pointsampler

    def rnd(dim, salt=0):
        return rng.sample_dim(ps, pixel_idx, sample_idx, dim + 101 * salt, cfg.seed)

    # --- camera start (path_extend v==0 branch, pathspace.c:211-247)
    jx = rnd(rng.Dim.IMAGE_X)
    jy = rnd(rng.Dim.IMAGE_Y)
    pix_i = (pixel_idx % cfg.width).astype(jnp.float32) + jx
    pix_j = (pixel_idx // cfg.width).astype(jnp.float32) + jy
    lam, _lam_pdf = cie.sample_lambda_hero(rnd(rng.Dim.LAMBDA), mf)
    time = rnd(rng.Dim.TIME) * jnp.minimum(1.0, scene.camera.exposure_time * 30.0)
    org, direction, cam_thr, cam_pdf_proj = camera_mod.sample(
        scene.camera, cfg.width, cfg.height, pix_i, pix_j,
        rnd(rng.Dim.APERTURE_X), rnd(rng.Dim.APERTURE_Y), time)

    state = dict(
        org=org, dir=direction,
        thr=jnp.broadcast_to(cam_thr[..., None], (n, mf)),
        pdf_proj=jnp.broadcast_to(cam_pdf_proj[..., None], (n, mf)),
        pdf_prod=jnp.ones((n, mf)),
        prev_n=jnp.broadcast_to(direction, (n, 3)),  # placeholder; lambert=cos4 handled via pdf_proj
        prev_prim=jnp.full((n,), INVALID_PRIM),
        prev_connectable=jnp.zeros((n,), bool),  # camera vertex: no NEE to it
        alive=jnp.ones((n,), bool),
        accum=jnp.zeros((n, mf)),
        length=jnp.ones((n,), jnp.int32),  # vertices so far (camera = 1)
    )
    # camera lambert: the reference uses hit.n of the aperture vertex; our
    # pdf_proj already excludes it — prev_n only feeds G, so store cam n:
    a_, b_, cn_, x_ = camera_mod.cam_frame(scene.camera, time)
    state['prev_n'] = cn_

    def bounce(state, depth):
        alive = state['alive']
        org = state['org']
        d = state['dir']
        hit = intersect(scene.geom, org, d, ignore_prim=state['prev_prim'])
        valid = hit.valid & alive
        x = org + hit.t[..., None] * d
        sp = shading_mod.prepare(scene, hit, x, d, lam)

        # geometric term of this segment (path_G, pathspace.c:59-69)
        g = (_lambert(state['prev_n'], d) * _lambert(sp.n, d)
             / jnp.maximum(hit.t * hit.t, 1e-20))
        pdf_area = state['pdf_proj'] * g[..., None]  # v[v].pdf in area measure

        # --- emitter hit (ptdl.c:117-125 / pt.c:44-49)
        le = lights_mod.eval_vertex(sp.em, sp.roughness, sp.gn, d)
        emits = valid & jnp.any(le > 0.0, axis=-1)
        if cfg.use_nee:
            nee_w = lights_mod.nee_pdf_area(scene.lights, hit.prim)
            # no NEE for 2-vertex paths / specular-only previous vertex
            nee_w = jnp.where((depth > 0) & state['prev_connectable'], nee_w, 0.0)
            w = _hero_mis(state['pdf_prod'], pdf_area, nee_w[..., None])
        else:
            w = _hero_mis(state['pdf_prod'], pdf_area, jnp.zeros_like(pdf_area))
        contrib = state['thr'] * le * w
        accum = state['accum'] + jnp.where(emits[..., None], contrib, 0.0)

        # update hero pdf product with this vertex (normalized, see module doc)
        pdf_prod = state['pdf_prod'] * pdf_area
        pp_norm = jnp.max(pdf_prod, axis=-1, keepdims=True)
        pdf_prod = jnp.where(pp_norm > 0.0, pdf_prod / pp_norm, pdf_prod)

        # --- next event estimation (nee.h:87-243 surface branch)
        if cfg.use_nee and scene.lights.n_lights > 0:
            ls = lights_mod.sample_nee(
                scene.lights, scene.geom, x,
                rnd(rng.Dim.NEE_LIGHT2, salt=10 + depth),
                rnd(rng.Dim.NEE_X, salt=10 + depth),
                rnd(rng.Dim.NEE_Y, salt=10 + depth))
            to_l = ls['pos'] - x
            dist = jnp.sqrt(jnp.maximum(dot(to_l, to_l), 1e-20))
            wo = to_l / dist[..., None]
            cos_l = -dot(ls['gn'], wo)       # light faces us?
            # emission spectrum + EDF roughness of the light prim
            lmat = jnp.clip(scene.prim_shader[jnp.maximum(ls['prim'], 0)], 0,
                            scene.materials.kind.shape[0] - 1)
            edf = lights_mod.phong_edf(scene.materials.roughness[lmat], cos_l)
            from ..spectral import rgb2spec as r2s
            l_em = (scene.materials.e_mul[lmat, None] *
                    r2s.eval_coeff(scene.materials.e_coeff[lmat][..., None, :], lam))
            f, pdf_bsdf_proj = bsdf_mod.bsdf_eval_pdf(sp, d, wo)
            g_nee = (_lambert(sp.n, wo) * jnp.abs(cos_l)
                     / jnp.maximum(dist * dist, 1e-20))
            can = valid & (cos_l > 0.0) & jnp.any(f > 0.0, axis=-1) & \
                (ls['pdf_area'] > 0.0)
            shadow_org = ray_offset(x, wo)
            blocked = occluded(scene.geom, shadow_org, wo,
                               dist * (1.0 - 1e-3),
                               ignore_prim=hit.prim, ignore_prim2=ls['prim'])
            can = can & ~blocked
            # throughput: T * f * G * em * edf / pdf_area  (nee.h:204-206)
            pdf_nee = ls['pdf_area'][..., None]
            val = state['thr'] * f * (g_nee * edf)[..., None] * l_em / pdf_nee
            # MIS vs bsdf extension (ptdl.c:141-145): pdfs in area measure
            pdf_ext_area = pdf_bsdf_proj * g_nee[..., None]
            w_nee = _hero_mis(pdf_prod, pdf_nee, pdf_ext_area)
            accum = accum + jnp.where(can[..., None], val * w_nee, 0.0)

        # --- extend: sample bsdf (path_extend, pathspace.c:190-207)
        r1 = rnd(rng.Dim.OMEGA_X, salt=1 + depth)
        r2 = rnd(rng.Dim.OMEGA_Y, salt=1 + depth)
        rm = rnd(rng.Dim.SCATTER_MODE, salt=1 + depth)
        wo, pdf_proj_new, bsdf_w, mode = bsdf_mod.bsdf_sample(sp, d, r1, r2, rm)
        thr = state['thr'] * bsdf_w
        still = valid & jnp.any(thr > 0.0, axis=-1) & \
            jnp.any(pdf_proj_new > 0.0, axis=-1)

        # russian roulette by throughput ratio (pt.c:50-53) once paths are
        # long enough; keeps ptdl unbiased too (cfg.rr_start)
        new_len = state['length'] + 1
        ratio = jnp.where(state['thr'][..., 0] > 0.0,
                          thr[..., 0] / jnp.maximum(state['thr'][..., 0], 1e-30), 0.0)
        p_survive = jnp.clip(ratio, 0.05, 1.0)
        do_rr = new_len > cfg.rr_start
        rrnd = rnd(rng.Dim.RUSSIAN_R, salt=1 + depth)
        survive = ~do_rr | (rrnd < p_survive)
        thr = jnp.where((do_rr & survive)[..., None],
                        thr / p_survive[..., None], thr)
        still = still & survive

        connectable = (mode & (bsdf_mod.MODE_DIFFUSE | bsdf_mod.MODE_GLOSSY)) > 0

        new_state = dict(
            org=x, dir=wo, thr=thr,
            pdf_proj=pdf_proj_new,
            pdf_prod=pdf_prod,
            prev_n=sp.n,
            prev_prim=hit.prim,
            prev_connectable=connectable,
            alive=still,
            accum=accum,
            length=new_len,
        )
        # keep dead lanes' accum, freeze the rest
        out = {k: jnp.where(_bmask(alive, new_state[k]), new_state[k], state[k])
               if k != 'accum' else new_state[k]
               for k in state}
        return out, None

    def _bmask(m, ref):
        extra = ref.ndim - m.ndim
        return m.reshape(m.shape + (1,) * extra)

    # lax.scan over bounces (static length = max_verts - 1 segments)
    def scan_body(st, depth):
        return bounce(st, depth)

    state, _ = jax.lax.scan(scan_body, state, jnp.arange(cfg.max_verts - 1))
    return state['accum'], lam, pix_i, pix_j


def render_sample(scene, cfg: PTConfig, sample_idx):
    """One progression: 1 jittered path per pixel, returns the XYZ splat
    image [H, W, 3] (unnormalized, like the reference's accumulation FB)."""
    from ..ops import splat as splat_mod
    n = cfg.width * cfg.height
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)
    accum, lam, pix_i, pix_j = sample_paths(scene, cfg, sample_idx, pixel_idx)
    # spectral -> camera XYZ (view_deferred_splat, view.c:465-473)
    accum = jnp.where(jnp.isfinite(accum), accum, 0.0)
    xyz = cie.spectral_to_xyz(lam, accum)
    fb = jnp.zeros((cfg.height, cfg.width, 3))
    return splat_mod.splat(fb, pix_i, pix_j, xyz)
