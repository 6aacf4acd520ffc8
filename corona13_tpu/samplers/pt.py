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
from ..models import medium as medium_mod
from ..models import shading as shading_mod
from ..models import bsdf as bsdf_mod
from ..ops import rng
from ..ops.trace import intersect, occluded, INVALID_PRIM, MAX_DIST
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
    media: bool = struct.field(pytree_node=False, default=False)
    # enable homogeneous participating media (free-flight sampling + HG
    # phase + interior tracking); static so media-free scenes compile lean
    equiangular: bool = struct.field(pytree_node=False, default=False)
    # volume NEE places the scatter connection vertex by equiangular
    # distance sampling toward the light (1/d^2 importance; reference
    # include/pathspace/equiangular.h) instead of reusing the free-flight
    # vertex — homogeneous media only; not available under MLT replay
    compact: tuple = struct.field(pytree_node=False, default=None)
    # optional per-depth wavefront capacity fractions (len = max_verts-1,
    # first entry 1.0).  When set, the bounce loop unrolls with a sorted
    # compaction between depths: dead lanes stop paying dense BSDF/NEE/
    # splat work.  Unbiased: if the alive count exceeds a depth's
    # capacity, a uniformly-random subset survives reweighted by K/C
    # (stochastic capping).  None = dense lax.scan (default).


def _state_columns(state):
    """Flatten a state dict into [(key, col_index_or_None), column] pairs
    of rank-1 *float32* arrays — the operand list for a multi-operand
    lax.sort (cheap on TPU, unlike gather/scatter by a permutation).

    Non-f32 columns are bitcast to f32: a heterogeneous-dtype variadic
    sort wedges the TPU remote compiler for tens of minutes, while the
    same sort over uniform f32 operands compiles in under a minute.  The
    sort only compares the KEY operand, so payload bit patterns (even
    NaN-coded ints) are merely permuted."""
    cols = []
    for k in sorted(state):
        v = state[k]
        arrs = ([(None, v)] if v.ndim == 1
                else [(i, v[:, i]) for i in range(v.shape[1])])
        for i, a in arrs:
            if a.dtype == jnp.bool_:
                a = a.astype(jnp.float32)
            elif a.dtype != jnp.float32:
                a = jax.lax.bitcast_convert_type(a, jnp.float32)
            cols.append(((k, i), a))
    return cols


def _state_from_columns(state, cols, sorted_cols):
    """Rebuild the state dict from sorted columns (inverse of
    _state_columns; shapes/dtypes come from the template ``state``)."""
    by_key = {}
    for ((k, i), _), sc in zip(cols, sorted_cols):
        by_key.setdefault(k, []).append(sc)
    out = {}
    for k, v in state.items():
        parts = by_key[k]
        if v.dtype == jnp.bool_:
            parts = [p > 0.5 for p in parts]
        elif v.dtype != jnp.float32:
            parts = [jax.lax.bitcast_convert_type(p, v.dtype)
                     for p in parts]
        out[k] = parts[0] if v.ndim == 1 else jnp.stack(parts, axis=-1)
    return out


def _hero_mis(pdf_prod_prev, our_pdf, other_pdf):
    """Joint balance heuristic over hero lanes and (our, other) techniques
    (ptdl.c:78-88).  pdf_prod_prev: per-lane product of vertex pdfs up to
    the second-to-last vertex; our/other: last-vertex pdfs per lane."""
    our = our_pdf * pdf_prod_prev
    other = other_pdf * pdf_prod_prev
    denom = jnp.sum(our + other, axis=-1, keepdims=True)
    # safe divide: 0/0 in the untaken where-branch leaks NaN through the
    # backward pass (d(where)/dx picks up NaN * 0)
    denom = jnp.where(denom > 0.0, denom, 1.0)
    return our / denom


def _lambert(n, w):
    return jnp.abs(dot(n, w))


def sample_paths(scene, cfg: PTConfig, sample_idx, pixel_idx):
    """Trace one path per entry of pixel_idx; returns spectral radiance
    accumulated per path [N, MF], the wavelengths [N, MF], and the image
    positions [N] (pix_i, pix_j)."""
    accum, lam, pi, pj, _ = _sample_paths_full(scene, cfg, sample_idx,
                                               pixel_idx)
    return accum, lam, pi, pj


# primary-sample-space layout for MLT replay (the analogue of the
# reference's fixed per-vertex dim contract, pathspace.h:16-53):
# dims [0..5] = camera block (image xy, lambda, time, aperture xy);
# per bounce d: base = 6 + 8*d, [FREE, OMEGA_X, OMEGA_Y, MODE, RR,
# NEE_LIGHT, NEE_X, NEE_Y]
N_CAM_DIMS = 6
N_BOUNCE_DIMS = 10  # 5 extend + 3 area-NEE + 2 env-NEE


def psd_dims(max_verts: int) -> int:
    """Primary-sample dimension count for a path of max_verts vertices."""
    return N_CAM_DIMS + N_BOUNCE_DIMS * (max_verts - 1)


def _sample_paths_full(scene, cfg: PTConfig, sample_idx, pixel_idx, u=None,
                       resume_state=None, depth_range=None):
    """u: optional [N, psd_dims] primary-sample array — when given, every
    random decision reads from it instead of the counter RNG (MLT replay).

    resume_state/depth_range: the multi-launch compaction protocol
    (make_segmented_renderer): each capacity segment runs as its OWN
    jitted program — the TPU remote compiler handles several small
    modules in minutes where the fused whole-progression compact program
    wedges for 40+.  With depth_range=(d0, d1) only those bounce depths
    execute and the partial banked tails are returned; resume_state
    carries the wavefront between launches (device-resident pytree).
    """
    n = pixel_idx.shape[0]
    mf = cfg.mf
    ps = cfg.pointsampler
    if cfg.equiangular and u is not None:
        raise ValueError('equiangular volume NEE has no slot in the MLT '
                         'primary-sample layout (psd_dims)')

    if u is None:
        def rnd(dim, salt=0, family='cam'):
            return rng.sample_dim(ps, pixel_idx, sample_idx,
                                  dim + 101 * salt, cfg.seed)
    else:
        # map call sites onto the dense layout above; the static ``family``
        # kwarg disambiguates overlapping per-phase dim values while
        # ``salt`` carries the traced scan depth (1+depth / 10+depth)
        _cam_slot = {int(rng.Dim.IMAGE_X): 0, int(rng.Dim.IMAGE_Y): 1,
                     int(rng.Dim.LAMBDA): 2, int(rng.Dim.TIME): 3,
                     int(rng.Dim.APERTURE_X): 4, int(rng.Dim.APERTURE_Y): 5}
        _ext_slot = {int(rng.Dim.FREE_PATH): 0, int(rng.Dim.OMEGA_X): 1,
                     int(rng.Dim.OMEGA_Y): 2, int(rng.Dim.SCATTER_MODE): 3,
                     int(rng.Dim.RUSSIAN_R): 4}
        _nee_slot = {int(rng.Dim.NEE_LIGHT2): 5, int(rng.Dim.NEE_X): 6,
                     int(rng.Dim.NEE_Y): 7}
        _env_slot = {int(rng.Dim.NEE_X): 8, int(rng.Dim.NEE_Y): 9}

        def rnd(dim, salt=0, family='cam'):
            if family == 'cam':
                return u[:, _cam_slot[int(dim)]]
            if family == 'env':
                depth = salt - 30
                slot = _env_slot[int(dim)]
            elif family == 'nee':
                depth = salt - 10
                slot = _nee_slot[int(dim)]
            else:
                depth = salt - 1
                slot = _ext_slot[int(dim)]
            col = N_CAM_DIMS + N_BOUNCE_DIMS * depth + slot
            return jax.lax.dynamic_index_in_dim(u, col, axis=1,
                                                keepdims=False)
    _rnd_u = rnd  # the MLT-replay stream for the (scan-only) u path

    # --- camera start (path_extend v==0 branch, pathspace.c:211-247)
    jx = rnd(rng.Dim.IMAGE_X)
    jy = rnd(rng.Dim.IMAGE_Y)
    if u is None:
        pix_i = (pixel_idx % cfg.width).astype(jnp.float32) + jx
        pix_j = (pixel_idx // cfg.width).astype(jnp.float32) + jy
    else:
        # MLT replay: the image dims span the whole film (kmlt.c uses
        # s_dim_image * W/H), chains roam across pixels
        pix_i = jx * cfg.width
        pix_j = jy * cfg.height
    lam, _lam_pdf = cie.sample_lambda_hero(rnd(rng.Dim.LAMBDA), mf)
    time = rnd(rng.Dim.TIME) * jnp.minimum(1.0, scene.camera.exposure_time * 30.0)
    org, direction, cam_thr, cam_pdf_proj = camera_mod.sample(
        scene.camera, cfg.width, cfg.height, pix_i, pix_j,
        rnd(rng.Dim.APERTURE_X), rnd(rng.Dim.APERTURE_Y), time)

    # scan-carry inits derive from varying inputs (pixel AND sample index)
    # so the carry matches the body outputs' varying manual axes under
    # shard_map
    izero = ((pixel_idx + jnp.asarray(sample_idx, jnp.uint32))
             & jnp.uint32(0)).astype(jnp.int32)
    thr0 = jnp.broadcast_to(cam_thr[..., None], (n, mf))
    sidx_arr = jnp.broadcast_to(jnp.asarray(sample_idx, jnp.uint32),
                                pixel_idx.shape)
    # derive both id columns from pixel AND sample inputs so their
    # varying manual axes match the body outputs under shard_map
    # (a px-only-varying carry vs an (sp,px)-varying output is a type
    # error in lax.scan)
    pix_col = pixel_idx + (sidx_arr & jnp.uint32(0))
    sidx_col = sidx_arr + (pixel_idx & jnp.uint32(0))
    state = dict(
        pix=pix_col, sidx=sidx_col, lam=lam, time=time,
        org=org, dir=direction,
        thr=thr0,
        pdf_proj=jnp.broadcast_to(cam_pdf_proj[..., None], (n, mf)),
        pdf_prod=jnp.ones_like(thr0) + thr0 * 0.0,
        prev_n=jnp.broadcast_to(direction, (n, 3)),  # placeholder; lambert=cos4 handled via pdf_proj
        prev_prim=izero + INVALID_PRIM,
        prev_connectable=izero > 0,  # camera vertex: no NEE to it
        alive=izero == 0,
        accum=thr0 * 0.0,
        length=izero + 1,             # vertices so far (camera = 1)
        nrays=izero,                  # traced rays (extend + shadow)
        # nested-media priority stack (smallest material id wins; the
        # reference's _path_edge_medium shape-priority stack,
        # pathspace.c:80-115); scene.exterior_med pre-fills slot 0
        # (shader_exterior_medium, shader.c:544-562)
        med_stack=medium_mod.stack_push(
            medium_mod.stack_init(izero),
            izero + max(scene.exterior_med, 0),
            izero == (0 if scene.exterior_med >= 0 else 1)),
    )
    # camera lambert: the reference uses hit.n of the aperture vertex; our
    # pdf_proj already excludes it — prev_n only feeds G, so store cam n:
    a_, b_, cn_, x_ = camera_mod.cam_frame(scene.camera, time)
    state['prev_n'] = cn_
    if resume_state is not None:
        # mid-progression resume: the init above is dead code (XLA DCEs
        # it); the wavefront comes in as a device pytree
        state = dict(resume_state)
        lam = state['lam']

    def bounce(state, depth):
        alive = state['alive']
        org = state['org']
        d = state['dir']
        lam = state['lam']
        if u is None:
            # read RNG streams through the state's own pixel/sample ids so
            # the body stays correct when the compacting driver permutes
            # and shrinks the wavefront between depths
            def rnd(dim, salt=0, family='cam'):
                return rng.sample_dim(ps, state['pix'], state['sidx'],
                                      dim + 101 * salt, cfg.seed)
        else:
            rnd = _rnd_u
        cur_med = medium_mod.stack_current(state['med_stack'])
        # dead lanes trace with t_max = 0: the slab test fails at the root
        # and they fall straight through the traversal
        hit = intersect(scene.geom, org, d, ignore_prim=state['prev_prim'],
                        t_max=jnp.where(alive, MAX_DIST, 0.0),
                        time=state['time'])
        nrays = state['nrays'] + alive.astype(jnp.int32)

        # --- free-flight through the interior medium (path_propagate's
        # shader_vol_sample step, pathspace.c:697-740 + shader.c:77-106)
        if cfg.media:
            r_free = rnd(rng.Dim.FREE_PATH, salt=1 + depth, family='ext')
            scat, vdist, w_med = medium_mod.sample_dist_scene(
                scene, cur_med, lam, org, d, hit.t, r_free)
            scat = scat & alive
            w_med = jnp.where(jnp.isfinite(w_med), w_med, 0.0)
            thr_in = state['thr'] * jnp.where(alive[..., None], w_med, 1.0)
        else:
            scat = alive & (state['length'] < 0)  # all-False, varying
            vdist = hit.t
            thr_in = state['thr']

        valid = hit.valid & alive & ~scat
        # escaped rays park at a finite 1 km like the reference's envmap
        # vertices (pathspace.c:856-873, shader.c:62-64) — an infinite x
        # would breed NaNs that poison gradients through masked products
        t_park = jnp.where(hit.valid, hit.t, 1e4)

        # --- emissive grid medium: analytic T-weighted blackbody integral
        # along the whole segment (scattering stays MC; the decomposition
        # L = int T (sigma_e rho Le) dt + [sampled scatter/surface part]
        # is exact — reference SEGMENT_EMISSION, include/vol/trace.h:27-33)
        em_vol = None
        if cfg.media and scene.has_hete and scene.has_vol_emission:
            from ..models import medium_hete as hete_mod
            in_h = alive & (cur_med == scene.vol.mat_id)
            e_seg = hete_mod.emission_along(scene.vol, org, d, t_park, lam)
            e_seg = jnp.where(jnp.isfinite(e_seg), e_seg, 0.0)
            em_vol = jnp.where(in_h[..., None], state['thr'] * e_seg, 0.0)
        x = org + t_park[..., None] * d
        sp = shading_mod.prepare(scene, hit, x, d, lam)

        # geometric term of this segment (path_G, pathspace.c:59-69)
        g = (_lambert(state['prev_n'], d) * _lambert(sp.n, d)
             / jnp.maximum(hit.t * hit.t, 1e-20))
        pdf_area = state['pdf_proj'] * g[..., None]  # v[v].pdf in area measure
        if cfg.media:
            # per-lane distance pdfs of the free flight enter the vertex
            # pdf like the reference's volume pdf terms (vol distance pdf
            # = sigma_t*T at scatter, survival T at the surface)
            st_med = medium_mod.sigma_t(scene.materials, cur_med,
                                        lam)
            d_eff = jnp.minimum(jnp.where(scat, vdist, hit.t), 1e4)
            tr_pdf = jnp.exp(-st_med * d_eff[..., None])
            pdf_area = jnp.where(scat[..., None], st_med * tr_pdf,
                                 pdf_area * tr_pdf)
            if scene.has_hete:
                # scalar (spectrally flat) extinction: the per-lane pdf
                # factor is constant across lanes and cancels in the
                # normalized hero-MIS products — carry 1 instead of
                # re-marching the grid for mu_t * T
                in_h = cur_med == scene.vol.mat_id
                pdf_area = jnp.where((in_h & scat)[..., None], 1.0,
                                     pdf_area)
                pdf_area = jnp.where((in_h & ~scat)[..., None],
                                     state['pdf_proj'] * g[..., None],
                                     pdf_area)
        # overflow guard: a non-finite pdf on one lane would poison the
        # hero-MIS weights (and leak NaN into gradients via 0-cotangent
        # products even on masked lanes)
        pdf_area = jnp.where(jnp.isfinite(pdf_area), pdf_area, 0.0)

        # --- environment hit: escaped rays collect sky radiance with
        # hero-MIS only (no envmap NEE yet; nee_pdf = 0 like nee.h:21-26
        # for non-connectable env setups)
        missed = alive & ~hit.valid & ~scat
        sky = lights_mod.sky_eval(scene, d, lam)
        if cfg.use_nee and scene.has_envmap:
            # escaped-ray MIS against envmap NEE (both in solid angle):
            # our pdf_w = pdf_proj * cos at the vertex the ray left from
            from ..models import envmap as envmap_mod
            our_w = state['pdf_proj'] * _lambert(state['prev_n'], d)[..., None]
            env_w = envmap_mod.pdf(scene.envmap, d)[..., None] * \
                jnp.broadcast_to(state['prev_connectable'][..., None],
                                 state['pdf_proj'].shape)
            w_sky = _hero_mis(state['pdf_prod'], our_w, env_w)
        else:
            w_sky = _hero_mis(state['pdf_prod'], state['pdf_proj'],
                              jnp.zeros_like(state['pdf_proj']))
        w_sky = jax.lax.stop_gradient(
            jnp.where(jnp.isfinite(w_sky), w_sky, 0.0))
        accum_sky = jnp.where(missed[..., None], thr_in * sky * w_sky, 0.0)

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
        w = jax.lax.stop_gradient(jnp.where(jnp.isfinite(w), w, 0.0))
        contrib = thr_in * le * w
        accum = state['accum'] + jnp.where(emits[..., None], contrib, 0.0) \
            + accum_sky
        if em_vol is not None:
            accum = accum + em_vol

        # update hero pdf product with this vertex (normalized, see module doc)
        pdf_prod = state['pdf_prod'] * pdf_area
        pp_norm = jnp.max(pdf_prod, axis=-1, keepdims=True)
        pdf_prod = pdf_prod / jnp.where(pp_norm > 0.0, pp_norm, 1.0)

        # --- volume scatter vertex position + phase setup (cfg.media)
        if cfg.media:
            xv = org + vdist[..., None] * d
            g_hg = scene.materials.med_g[jnp.maximum(cur_med, 0)]
            x_nee = jnp.where(scat[..., None], xv, x)
        else:
            xv = x
            g_hg = jnp.zeros(org.shape[:-1])
            x_nee = x

        # --- next event estimation (nee.h:87-243; surface and volume)
        if cfg.use_nee and scene.lights.n_lights > 0:
            ls = lights_mod.sample_nee(
                scene.lights, scene.geom, x_nee,
                rnd(rng.Dim.NEE_LIGHT2, salt=10 + depth, family='nee'),
                rnd(rng.Dim.NEE_X, salt=10 + depth, family='nee'),
                rnd(rng.Dim.NEE_Y, salt=10 + depth, family='nee'))
            thr_nee = thr_in
            if cfg.media and cfg.equiangular:
                # re-place the volume connection vertex by equiangular
                # sampling toward the chosen light point: the 1/d^2 pdf
                # cancels the geometric spike of short connections
                # (equiangular.h; homogeneous interiors only).  The NEE
                # weight swaps the free-flight factor for
                # sigma_s T(t_eq) / pdf_eq; MIS pdfs (light-area vs
                # phase-extension) are unchanged.
                eq = scat
                if scene.has_hete:
                    eq = eq & (cur_med != scene.vol.mat_id)
                r_eq = rnd(rng.Dim.FREE_PATH, salt=40 + depth,
                           family='nee')
                t_seg = jnp.minimum(t_park, 1e4)
                t_eq, pdf_eq = medium_mod.equiangular_sample(
                    org, d, ls['pos'], t_seg, r_eq)
                t_eq = jax.lax.stop_gradient(t_eq)
                pdf_eq = jax.lax.stop_gradient(pdf_eq)
                x_eq = org + t_eq[..., None] * d
                st_m = medium_mod.sigma_t(scene.materials, cur_med, lam)
                ss_m = medium_mod.sigma_s(scene.materials, cur_med, lam)
                w_eq = ss_m * jnp.exp(-st_m * t_eq[..., None]) / \
                    jnp.maximum(pdf_eq[..., None], 1e-20)
                w_eq = jnp.where(jnp.isfinite(w_eq), w_eq, 0.0)
                x_nee = jnp.where(eq[..., None], x_eq, x_nee)
                thr_nee = jnp.where(eq[..., None], state['thr'] * w_eq,
                                    thr_in)
            to_l = ls['pos'] - x_nee
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
            f, pdf_bsdf_proj = bsdf_mod.bsdf_eval_pdf(
                sp, d, wo, kinds=scene.kinds_used)
            cos_near = _lambert(sp.n, wo)
            can_vertex = valid
            if cfg.media:
                # volume vertex: phase function instead of BSDF, no cosine
                # at the scatter point (path_lambert, pathspace.c:45)
                ph = medium_mod.hg_phase(g_hg, dot(d, wo))
                f = jnp.where(scat[..., None], ph[..., None], f)
                pdf_bsdf_proj = jnp.where(scat[..., None], ph[..., None],
                                          pdf_bsdf_proj)
                cos_near = jnp.where(scat, 1.0, cos_near)
                can_vertex = valid | scat
            g_nee = (cos_near * jnp.abs(cos_l)
                     / jnp.maximum(dist * dist, 1e-20))
            # the NEE vertex extends the path by one: respect max_verts
            # like the reference (nee.h checks PATHSPACE_MAX_VERTS) so a
            # ptdl render integrates the same path space as pt
            can = can_vertex & (cos_l > 0.0) & jnp.any(f > 0.0, axis=-1) & \
                (ls['pdf_area'] > 0.0) & (depth <= cfg.max_verts - 3)
            shadow_org = jnp.where(scat[..., None], x_nee,
                                   ray_offset(x_nee, wo)) if cfg.media else \
                ray_offset(x_nee, wo)
            blocked = occluded(scene.geom, shadow_org, wo,
                               jnp.where(can, dist * (1.0 - 1e-3), 0.0),
                               ignore_prim=jnp.where(scat, INVALID_PRIM,
                                                     hit.prim)
                               if cfg.media else hit.prim,
                               ignore_prim2=ls['prim'],
                               time=state['time'])
            # count only shadow rays that traverse (t_max > 0), i.e. `can`
            # pre-visibility — lanes with can=False call occluded with
            # t_max=0 and do no BVH work
            nrays = nrays + can.astype(jnp.int32)
            can = can & ~blocked
            # throughput: T * f * G * em * edf / pdf_area  (nee.h:204-206)
            pdf_nee = ls['pdf_area'][..., None]
            pdf_nee_safe = jnp.where(pdf_nee > 0.0, pdf_nee, 1.0)
            # sanitize the geometry factor so partials w.r.t. thr / l_em
            # stay finite on garbage (escaped/masked) lanes
            gfac = (g_nee * edf)[..., None] / pdf_nee_safe
            gfac = jnp.where(jnp.isfinite(gfac), gfac, 0.0)
            val = thr_nee * f * gfac * l_em
            if cfg.media:
                # transmittance of the current interior along the shadow
                # segment (homogeneous or grid; boundary crossings are
                # blocked by path_visible semantics anyway)
                tr_nee = medium_mod.transmittance_scene(
                    scene, cur_med, lam, x_nee, wo, dist)
                val = val * tr_nee
            # MIS vs bsdf extension (ptdl.c:141-145): pdfs in area measure
            pdf_ext_area = pdf_bsdf_proj * g_nee[..., None]
            w_nee = _hero_mis(pdf_prod, pdf_nee, pdf_ext_area)
            w_nee = jax.lax.stop_gradient(
                jnp.where(jnp.isfinite(w_nee), w_nee, 0.0))
            val = jnp.where(jnp.isfinite(val), val, 0.0)
            accum = accum + jnp.where(can[..., None], val * w_nee, 0.0)

        # --- envmap next event estimation (nee.h envmap branch +
        # sky_envmap.c importance sampling); independent of the area-light
        # NEE (disjoint targets, separate MIS against bsdf extension)
        if cfg.use_nee and scene.has_envmap:
            from ..models import envmap as envmap_mod
            d_env, pdf_env = envmap_mod.sample(
                scene.envmap,
                rnd(rng.Dim.NEE_X, salt=30 + depth, family='env'),
                rnd(rng.Dim.NEE_Y, salt=30 + depth, family='env'))
            d_env = jnp.broadcast_to(d_env, x.shape)
            f_e, pdf_b_e = bsdf_mod.bsdf_eval_pdf(sp, d, d_env,
                                                  kinds=scene.kinds_used)
            cos_e = _lambert(sp.n, d_env)
            can_e = valid & jnp.any(f_e > 0.0, axis=-1) & (pdf_env > 0.0) & \
                (depth <= cfg.max_verts - 3)
            blocked_e = occluded(scene.geom, ray_offset(x, d_env), d_env,
                                 jnp.where(can_e, 1e4, 0.0),
                                 ignore_prim=hit.prim, time=state['time'])
            nrays = nrays + can_e.astype(jnp.int32)  # pre-visibility: rays
            can_e = can_e & ~blocked_e               # with t_max>0 traverse
            le_env = lights_mod.sky_eval(scene, d_env, lam)
            pdf_env_safe = jnp.where(pdf_env > 0.0, pdf_env, 1.0)
            efac = (cos_e / pdf_env_safe)[..., None]
            efac = jnp.where(jnp.isfinite(efac), efac, 0.0)
            val_e = thr_in * f_e * efac * le_env
            # MIS vs bsdf extension, both in solid angle
            w_env = _hero_mis(pdf_prod, pdf_env[..., None],
                              pdf_b_e * cos_e[..., None])
            w_env = jax.lax.stop_gradient(
                jnp.where(jnp.isfinite(w_env), w_env, 0.0))
            val_e = jnp.where(jnp.isfinite(val_e), val_e, 0.0)
            accum = accum + jnp.where(can_e[..., None], val_e * w_env, 0.0)

        # --- extend: sample bsdf (path_extend, pathspace.c:190-207)
        r1 = rnd(rng.Dim.OMEGA_X, salt=1 + depth, family='ext')
        r2 = rnd(rng.Dim.OMEGA_Y, salt=1 + depth, family='ext')
        rm = rnd(rng.Dim.SCATTER_MODE, salt=1 + depth, family='ext')
        wo, pdf_proj_new, bsdf_w, mode = bsdf_mod.bsdf_sample(
            sp, d, r1, r2, rm, kinds=scene.kinds_used)
        if cfg.media:
            # volume extension: HG phase direction; perfect importance
            # sampling (weight 1, sigma_s/pdf already in w_med)
            wo_v, pdf_v = medium_mod.hg_sample(g_hg, d, r1, r2)
            wo = jnp.where(scat[..., None], wo_v, wo)
            pdf_proj_new = jnp.where(scat[..., None], pdf_v[..., None],
                                     pdf_proj_new)
            # phase weight = phase / sg(pdf): primal 1 (perfect importance
            # sampling) but gradients w.r.t. the HG mean cosine flow
            ph_v = medium_mod.hg_phase(g_hg, dot(jax.lax.stop_gradient(wo_v),
                                                 jax.lax.stop_gradient(d)))
            w_v = ph_v / jnp.maximum(jax.lax.stop_gradient(pdf_v), 1e-20)
            bsdf_w = jnp.where(scat[..., None], w_v[..., None], bsdf_w)
            mode = jnp.where(scat,
                             bsdf_mod.MODE_VOLUME | bsdf_mod.MODE_DIFFUSE,
                             mode)
        # detached-sampling estimator: sampled directions and pdfs are
        # treated as constants of the backward pass (gradients flow through
        # throughput/value terms only); this also firewalls NaN partials
        # from masked-out lanes of the dense BSDF dispatch
        wo = jax.lax.stop_gradient(wo)
        pdf_proj_new = jax.lax.stop_gradient(
            jnp.where(jnp.isfinite(pdf_proj_new), pdf_proj_new, 0.0))
        # a non-finite weight on any (dead/garbage) lane would poison
        # d thr_new / d thr_old for the whole backward scan
        bsdf_w = jnp.where(jnp.isfinite(bsdf_w), bsdf_w, 0.0)
        thr = thr_in * bsdf_w
        still = (valid | scat) & jnp.any(thr > 0.0, axis=-1) & \
            jnp.any(pdf_proj_new > 0.0, axis=-1)

        # russian roulette by throughput ratio (pt.c:50-53) once paths are
        # long enough; keeps ptdl unbiased too (cfg.rr_start)
        new_len = state['length'] + 1
        ratio = jnp.where(state['thr'][..., 0] > 0.0,
                          thr[..., 0] / jnp.maximum(state['thr'][..., 0], 1e-30), 0.0)
        # the survival probability is a sampling decision — detached like
        # all pdfs (its gradient chain through 1/thr also overflows f32)
        p_survive = jax.lax.stop_gradient(jnp.clip(ratio, 0.05, 1.0))
        do_rr = new_len > cfg.rr_start
        rrnd = rnd(rng.Dim.RUSSIAN_R, salt=1 + depth, family='ext')
        survive = ~do_rr | (rrnd < p_survive)
        thr = jnp.where((do_rr & survive)[..., None],
                        thr / p_survive[..., None], thr)
        still = still & survive

        connectable = (mode & (bsdf_mod.MODE_DIFFUSE | bsdf_mod.MODE_GLOSSY)) > 0

        new_org = ray_offset(x, wo)
        new_prev_n = sp.n
        new_prev_prim = hit.prim
        new_med = state['med_stack']
        if cfg.media:
            # interior transitions on transmission through the priority
            # stack (reference _path_edge_medium, pathspace.c:80-115):
            # entering pushes the shape's interior, exiting pops it
            mat = jnp.clip(scene.prim_shader[jnp.maximum(hit.prim, 0)], 0,
                           scene.materials.kind.shape[0] - 1)
            has_med = scene.materials.med_enabled[mat] & valid
            transmitted = (mode & bsdf_mod.MODE_TRANSMIT) > 0
            new_med = medium_mod.stack_push(
                new_med, mat, has_med & transmitted & ~sp.inside)
            new_med = medium_mod.stack_pop(
                new_med, mat, has_med & transmitted & sp.inside)
            new_org = jnp.where(scat[..., None], xv, new_org)
            # volume vertices have no cosine: prev_n = wo makes the next
            # segment's near-lambert exactly 1 (path_lambert convention)
            new_prev_n = jnp.where(scat[..., None], wo, new_prev_n)
            new_prev_prim = jnp.where(scat, INVALID_PRIM, new_prev_prim)

        new_state = dict(
            org=new_org, dir=wo, thr=thr,
            pdf_proj=pdf_proj_new,
            pdf_prod=pdf_prod,
            prev_n=new_prev_n,
            prev_prim=new_prev_prim,
            prev_connectable=connectable,
            alive=still,
            accum=accum,
            length=new_len,
            nrays=nrays,
            med_stack=new_med,
        )
        # per-lane constants ride along unchanged (compaction permutes them)
        for k in ('pix', 'sidx', 'lam', 'orig', 'time'):
            if k in state:
                new_state[k] = state[k]
        # keep dead lanes' accum/ray counts, freeze the rest
        out = {k: jnp.where(_bmask(alive, new_state[k]), new_state[k], state[k])
               if k not in ('accum', 'nrays') else new_state[k]
               for k in state}
        return out, None

    def _bmask(m, ref):
        extra = ref.ndim - m.ndim
        return m.reshape(m.shape + (1,) * extra)

    if cfg.compact is None or u is not None:
        # lax.scan over bounces (static length = max_verts - 1 segments)
        def scan_body(st, depth):
            return bounce(st, depth)

        state, _ = jax.lax.scan(scan_body, state, jnp.arange(cfg.max_verts - 1))
        return state['accum'], lam, pix_i, pix_j, state

    # --- compacting driver (cfg.compact): unrolled bounces with a sorted
    # compaction between depths.  Dead lanes stop paying the dense BSDF/
    # NEE/splat cost: depth d runs on cap_d = round(compact[d] * n) lanes.
    # Unbiased: survivors of a capacity overflow are a uniformly-random
    # subset (random sort key) reweighted by K/C.
    #
    # Banking: every original lane ends up in exactly one dropped tail
    # segment or the final state, so the (orig, accum) rows of all
    # segments form a permutation of 0..n-1.  Dropped tails are
    # concatenated (static shapes) and ONE final sort by orig restores
    # pixel order — multi-operand lax.sort is cheap on TPU where
    # scatter-add is not.
    caps = cfg.compact
    if len(caps) != cfg.max_verts - 1 or abs(caps[0] - 1.0) > 1e-6:
        raise ValueError('cfg.compact needs max_verts-1 entries, first 1.0')
    if 'orig' not in state:
        state['orig'] = jnp.arange(n, dtype=jnp.int32)
    banked_orig = []            # dropped-lane segments
    banked_accum = []
    nray_tot = jnp.zeros((), jnp.int32)

    # group consecutive depths with the same capacity into lax.scan
    # segments: the compile cost scales with the number of DISTINCT
    # capacities, not with max_verts (a fully unrolled bounce loop
    # multiplies the XLA program by the depth count, which the TPU
    # remote compiler chokes on)
    cap_ns = [min(n, max(128, -(-int(round(c * n)) // 128) * 128))
              for c in caps]
    segments = []               # (cap_n, depth_start, depth_end)
    for depth, cap_n in enumerate(cap_ns):
        if segments and segments[-1][0] == cap_n:
            segments[-1][2] = depth + 1
        else:
            segments.append([cap_n, depth, depth + 1])

    if depth_range is not None:
        segments = [sg for sg in segments
                    if sg[1] >= depth_range[0] and sg[2] <= depth_range[1]]

    # the compaction sort key: dead lanes last; alive lanes in random
    # order so a capacity overflow keeps a uniformly-random subset
    for cap_n, d0, d1 in segments:
        n_cur = state['alive'].shape[0]
        if cap_n < n_cur:
            alive = state['alive']
            k_alive = jnp.sum(alive.astype(jnp.int32))
            r = rng.sample_dim(ps, state['pix'], state['sidx'],
                               9000 + d0, cfg.seed)
            key = jnp.where(alive, r, 2.0)       # dead lanes sort last
            cols = _state_columns(state)
            sorted_cols = jax.lax.sort(
                (key,) + tuple(c for _, c in cols), num_keys=1)[1:]
            state = _state_from_columns(state, cols, sorted_cols)
            # bank the dropped tail (their accum is final)
            banked_orig.append(state['orig'][cap_n:])
            banked_accum.append(state['accum'][cap_n:])
            nray_tot = nray_tot + jnp.sum(state['nrays'][cap_n:])
            state = {k: v[:cap_n] for k, v in state.items()}
            # stochastic capping reweight (only != 1 when K > cap)
            scale = jax.lax.stop_gradient(jnp.maximum(
                1.0, k_alive.astype(jnp.float32) / cap_n))
            state['thr'] = state['thr'] * scale
        if d1 - d0 == 1:
            state, _ = bounce(state, d0)
        else:
            state, _ = jax.lax.scan(lambda st, dd: bounce(st, dd), state,
                                    jnp.arange(d0, d1))
    if depth_range is not None:
        return dict(state=state, banked_orig=tuple(banked_orig),
                    banked_accum=tuple(banked_accum), nray=nray_tot,
                    lam=lam, pix_i=pix_i, pix_j=pix_j)
    banked_orig.append(state['orig'])
    banked_accum.append(state['accum'])
    nray_tot = nray_tot + jnp.sum(state['nrays'])
    all_orig = jnp.concatenate(banked_orig)
    all_accum = jnp.concatenate(banked_accum)
    srt = jax.lax.sort((all_orig,) + tuple(all_accum[:, i]
                                           for i in range(mf)), num_keys=1)
    accum_fb = jnp.stack(srt[1:], axis=-1)
    pseudo = {'nrays': nray_tot[None], 'alive': state['alive']}
    return accum_fb, lam, pix_i, pix_j, pseudo


def make_segmented_renderer(scene, cfg: PTConfig, batch: int = 1):
    """Compile the compacting progression as one jitted program PER
    capacity segment plus a combiner, returning step(sample_idx) ->
    (fb [H, W, 3], traced_rays).

    Rationale: the whole-progression compact program (several wavefront
    sizes, each instantiating the Pallas traversal kernels, plus the
    compaction sorts) wedges the axon remote compiler for 40+ minutes,
    while the individual segments compile in minutes.  The wavefront
    pytree stays on device between launches; per-launch dispatch is
    ~2.4 ms against a ~400 ms segment."""
    from ..ops import splat as splat_mod
    if cfg.compact is None:
        raise ValueError('make_segmented_renderer needs cfg.compact')
    n_pix = cfg.width * cfg.height
    n = n_pix * batch
    caps = cfg.compact
    cap_ns = [min(n, max(128, -(-int(round(c * n)) // 128) * 128))
              for c in caps]
    segments = []
    for depth, cap_n in enumerate(cap_ns):
        if segments and segments[-1][0] == cap_n:
            segments[-1][2] = depth + 1
        else:
            segments.append([cap_n, depth, depth + 1])
    pixel_idx = jnp.tile(jnp.arange(n_pix, dtype=jnp.uint32), batch)

    # the compaction sorts live in their OWN programs: a Pallas traversal
    # and a wide multi-operand lax.sort in one XLA module wedge the
    # remote compiler (measured: each alone compiles in < 1 min, combined
    # it runs > 40 min); a bounce segment whose incoming state is already
    # at its capacity skips its internal compaction automatically
    @partial(jax.jit, static_argnums=(1, 2))
    def compact_fn(st, cap_n, salt_depth):
        alive = st['alive']
        k_alive = jnp.sum(alive.astype(jnp.int32))
        r = rng.sample_dim(cfg.pointsampler, st['pix'], st['sidx'],
                           9000 + salt_depth, cfg.seed)
        key = jnp.where(alive, r, 2.0)
        cols = _state_columns(st)
        sorted_cols = jax.lax.sort(
            (key,) + tuple(c for _, c in cols), num_keys=1)[1:]
        st = _state_from_columns(st, cols, sorted_cols)
        dropped_o = st['orig'][cap_n:]
        dropped_a = st['accum'][cap_n:]
        nray = jnp.sum(st['nrays'][cap_n:])
        st = {k: v[:cap_n] for k, v in st.items()}
        scale = jax.lax.stop_gradient(jnp.maximum(
            1.0, k_alive.astype(jnp.float32) / cap_n))
        st = dict(st, thr=st['thr'] * scale)
        return st, dropped_o, dropped_a, nray

    seg_fns = []
    for i, (cap_n, d0, d1) in enumerate(segments):
        if i == 0:
            def f(s_arr, _d=(d0, d1)):
                return _sample_paths_full(scene, cfg, s_arr, pixel_idx,
                                          depth_range=_d)
        else:
            def f(st, _d=(d0, d1)):
                return _sample_paths_full(scene, cfg, jnp.uint32(0),
                                          pixel_idx, resume_state=st,
                                          depth_range=_d)
        seg_fns.append((jax.jit(f), cap_n, d0))

    @jax.jit
    def combine(banked_o, banked_a, final_state, nray, lam, jx, jy):
        all_orig = jnp.concatenate(banked_o + (final_state['orig'],))
        all_accum = jnp.concatenate(banked_a + (final_state['accum'],))
        nray = nray + jnp.sum(final_state['nrays'])
        srt = jax.lax.sort(
            (all_orig,) + tuple(all_accum[:, i] for i in range(cfg.mf)),
            num_keys=1)
        accum_fb = jnp.stack(srt[1:], axis=-1)
        accum_fb = jnp.where(jnp.isfinite(accum_fb), accum_fb, 0.0)
        xyz = cie.spectral_to_xyz(lam, accum_fb)
        fb = jnp.zeros((cfg.height, cfg.width, 3))
        return splat_mod.splat_pixel_aligned(fb, jx, jy, xyz,
                                             batch=batch), nray

    def step(sample_idx):
        sidx = jnp.repeat(jnp.uint32(sample_idx)
                          + jnp.arange(batch, dtype=jnp.uint32), n_pix)
        out = seg_fns[0][0](sidx)
        banked_o = list(out['banked_orig'])
        banked_a = list(out['banked_accum'])
        nray, lam = out['nray'], out['lam']
        pi, pj = out['pix_i'], out['pix_j']
        st = out['state']
        for fn, cap_n, d0 in seg_fns[1:]:
            if cap_n < st['alive'].shape[0]:
                st, dr_o, dr_a, dr_n = compact_fn(st, cap_n, d0)
                banked_o.append(dr_o)
                banked_a.append(dr_a)
                nray = nray + dr_n
            out = fn(st)
            banked_o += list(out['banked_orig'])
            banked_a += list(out['banked_accum'])
            nray = nray + out['nray']
            st = out['state']
        jx = pi - jnp.floor(pi)
        jy = pj - jnp.floor(pj)
        return combine(tuple(banked_o), tuple(banked_a), st, nray, lam,
                       jx, jy)

    return step


def alive_profile(scene, cfg: PTConfig, sample_idx):
    """Per-depth alive lane counts [max_verts-1] of one progression — the
    occupancy data behind a cfg.compact capacity schedule (and the
    path-length histogram of the reference sidecar, view.c:758-790).

    A lane that traced k extension segments ends with length = k + 1, so
    the count of lanes alive entering depth d equals #{length - 1 >= d+1}
    for d >= 1 (depth 0 is all camera rays).
    """
    n = cfg.width * cfg.height
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)

    @jax.jit
    def run(sc, s, pix):
        cfg_d = cfg.replace(compact=None)
        *_, state = _sample_paths_full(sc, cfg_d, s, pix)
        lengths = state['length'] - 1       # segments traced per lane
        depth_idx = jnp.arange(cfg.max_verts - 1)
        return jnp.sum(lengths[None, :] > depth_idx[:, None], axis=1)

    return run(scene, sample_idx, pixel_idx)


def count_rays(scene, cfg: PTConfig, sample_idx, pixel_idx):
    """Total traced rays (alive extension + shadow) for one progression —
    the quantity behind the Mrays/s benchmark (bench.py)."""
    def f(sc, s, pix):
        *_, state = _sample_paths_full(sc, cfg, s, pix)
        return jnp.sum(state['nrays'])
    return jax.jit(f)(scene, sample_idx, pixel_idx)


def render_sample(scene, cfg: PTConfig, sample_idx, batch: int = 1):
    """One launch of ``batch`` progressions (1 jittered path per pixel per
    progression, sample indices sample_idx .. sample_idx+batch-1); returns
    the XYZ splat image [H, W, 3] (unnormalized accumulation FB).

    Batching widens the wavefront instead of looping — the analogue of the
    reference's ``--batch N`` progressions per sync (src/main.c:268-276)."""
    from ..ops import splat as splat_mod
    n = cfg.width * cfg.height
    pixel_idx = jnp.tile(jnp.arange(n, dtype=jnp.uint32), batch)
    sidx = jnp.repeat(jnp.uint32(sample_idx) + jnp.arange(batch, dtype=jnp.uint32), n)
    accum, lam, pix_i, pix_j = sample_paths(scene, cfg, sidx, pixel_idx)
    # spectral -> camera XYZ (view_deferred_splat, view.c:465-473)
    accum = jnp.where(jnp.isfinite(accum), accum, 0.0)
    xyz = cie.spectral_to_xyz(lam, accum)
    fb = jnp.zeros((cfg.height, cfg.width, 3))
    # pixel-aligned wavefront -> dense stencil splat (25 shifted adds, no
    # scatter); jitters recovered from the continuous image coords
    jx = pix_i - jnp.floor(pix_i)
    jy = pix_j - jnp.floor(pix_j)
    return splat_mod.splat_pixel_aligned(fb, jx, jy, xyz, batch=batch)
