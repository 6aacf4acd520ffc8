"""Bidirectional path tracer (wavefront, full multi-strategy MIS).

TPU-native re-expression of the reference BDPT (corona-13
src/sampler.d/bdpt.c): instead of recursive path_t storage + tech-tag MIS,
both subpaths are traced as wavefront SoA scans whose per-vertex records
are *stacked* into [T, N, ...] arrays, and every (s, t) connection is a
dense vectorized pass over the whole wavefront.

Strategy set: s >= 0 light vertices x t >= 2 eye vertices, plus the t = 1
camera-splat strategies (light-subpath endpoint connected to a sampled
aperture point, splatted at the projected pixel through the general
scatter splat — reference bdpt.c:376-402).  MIS weights are computed
jointly over the full strategy set including t = 1.

Participating media (cfg.media): interior-medium transmittance is applied
deterministically on every subpath edge and connection segment, with the
nested-interior priority stack tracked per subpath (reference
_path_edge_medium, pathspace.c:80-115 + edge transmittance :697-740).
In-scattering vertices are NOT sampled on subpaths, so absorbing
interiors match pt/ptdl exactly while scattering (sigma_s > 0) media lose
the in-scattered component (render_sample warns; use pt/ptdl for those).

MIS bookkeeping follows the reference's vertex-area-measure convention
(src/pathspace.c:262, path_pdf:364): for each subpath vertex we store

  * pdf_fwd_a — area pdf of sampling this vertex from its predecessor
    (projected-solid-angle bsdf pdf x geometric term G);
  * pdf_rev_a — area pdf of re-sampling the *predecessor* from this
    vertex, with the sampled outgoing direction reversed as incoming
    (specular vertices reuse their forward pdf — the usual dirac-cancel
    convention, cf. vertex tech tags in bdpt.c);
  * g_rev — the geometric term toward the predecessor, so
    connection-modified reverse pdfs cost one bsdf_eval at runtime.

The per-connection weight is the joint balance heuristic over strategies
AND hero-wavelength lanes (the lane axis generalizes sampler_mis_weight,
src/sampler.d/bdpt.c + pt.c:30-38), evaluated with the ratio recurrence
P_{j±1}/P_j so everything stays O(1) in magnitude in fp32 where the
reference uses double (md_t) full pdf products.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import bsdf as bsdf_mod
from ..models import camera as camera_mod
from ..models import lights as lights_mod
from ..models import medium as medium_mod
from ..models import shading as shading_mod
from ..ops import rng
from ..ops.trace import intersect, occluded, MAX_DIST
from ..spectral import cie, rgb2spec
from ..utils.math import dot, ray_offset
from .pt import PTConfig, _lambert


def _connectable(sp):
    """Vertex supports connections: any non-dirac lobe (diffuse always;
    dielectric/metal only above the specular roughness threshold,
    bsdf.GLOSSY_THR = dielectric.c:35)."""
    rough = sp.roughness > bsdf_mod.GLOSSY_THR
    return (sp.kind == bsdf_mod.DIFFUSE) | \
        ((sp.kind == bsdf_mod.DIELECTRIC) & rough) | \
        ((sp.kind == bsdf_mod.METAL) & rough) | \
        (sp.kind == bsdf_mod.DIFFDIEL)


def _trace_subpath(scene, cfg, lam, org0, dir0, thr0, pdf_proj0, prev_n0,
                   prev_prim0, n_steps, rnd, salt_base):
    """Advance a subpath wavefront n_steps bounces; returns stacked
    per-vertex records [n_steps, N, ...] (record i = subpath vertex i+1
    counted from the start vertex)."""
    n = org0.shape[0]
    mf = cfg.mf

    izero = jnp.zeros((n,), jnp.int32)
    state = dict(org=org0, dir=dir0, thr=thr0,
                 pdf_proj=jnp.broadcast_to(pdf_proj0, (n, mf)),
                 prev_n=prev_n0, prev_prim=prev_prim0,
                 alive=jnp.ones((n,), bool),
                 med_stack=medium_mod.stack_push(
                     medium_mod.stack_init(izero),
                     izero + max(scene.exterior_med, 0),
                     izero == (0 if scene.exterior_med >= 0 else 1)))

    def bounce(state, depth):
        alive = state['alive']
        org = state['org']
        d = state['dir']
        cur_med = medium_mod.stack_current(state['med_stack'])
        hit = intersect(scene.geom, org, d, ignore_prim=state['prev_prim'],
                        t_max=jnp.where(alive, MAX_DIST, 0.0))
        valid = hit.valid & alive
        t_park = jnp.where(hit.valid, hit.t, 1e4)
        x = org + t_park[..., None] * d
        sp = shading_mod.prepare(scene, hit, x, d, lam)
        if cfg.media:
            # deterministic edge transmittance through the current
            # interior (absorption component of reference
            # path_propagate's volume step, pathspace.c:697-740;
            # in-scattering vertices are not sampled on bdpt subpaths —
            # see render_sample's media note)
            tr = medium_mod.transmittance_scene(scene, cur_med, lam, org,
                                                d, t_park)
            tr = jnp.where(jnp.isfinite(tr), tr, 0.0)
            state = dict(state, thr=state['thr'] *
                         jnp.where(alive[..., None], tr, 1.0))

        g = (_lambert(state['prev_n'], d) * _lambert(sp.n, d)
             / jnp.maximum(hit.t * hit.t, 1e-20))
        pdf_fwd_a = state['pdf_proj'] * g[..., None]
        pdf_fwd_a = jnp.where(jnp.isfinite(pdf_fwd_a), pdf_fwd_a, 0.0)

        # extension sample
        r1 = rnd(rng.Dim.OMEGA_X, salt=salt_base + depth)
        r2 = rnd(rng.Dim.OMEGA_Y, salt=salt_base + depth)
        rm = rnd(rng.Dim.SCATTER_MODE, salt=salt_base + depth)
        wo, pdf_new, w, mode = bsdf_mod.bsdf_sample(sp, d, r1, r2, rm,
                                                    kinds=scene.kinds_used)
        specular = (mode & bsdf_mod.MODE_SPECULAR) > 0
        pdf_new = jnp.where(jnp.isfinite(pdf_new), pdf_new, 0.0)
        w = jnp.where(jnp.isfinite(w), w, 0.0)

        # reverse pdf toward the predecessor (same G both ways: projected
        # solid angle -> area uses cos at the source and target vertices)
        _, rev_proj = bsdf_mod.bsdf_eval_pdf(sp, -wo, -d,
                                             kinds=scene.kinds_used)
        rev_proj = jnp.where(jnp.isfinite(rev_proj), rev_proj, 0.0)
        rev_proj = jnp.where(specular[..., None], pdf_new, rev_proj)
        pdf_rev_a = rev_proj * g[..., None]
        pdf_rev_a = jnp.where(jnp.isfinite(pdf_rev_a), pdf_rev_a, 0.0)

        record = dict(
            sp=sp, x=x, d_in=d, thr=state['thr'],
            pdf_fwd_a=pdf_fwd_a, pdf_rev_a=pdf_rev_a,
            g_rev=g, valid=valid,
            connectable=_connectable(sp) & valid,
            prim=hit.prim,
            med=cur_med)

        thr = state['thr'] * w
        still = valid & jnp.any(thr > 0.0, axis=-1) & \
            jnp.any(pdf_new > 0.0, axis=-1)
        new_med = state['med_stack']
        if cfg.media:
            # interior transitions on transmission (the priority stack of
            # reference _path_edge_medium, pathspace.c:80-115)
            mat = jnp.clip(scene.prim_shader[jnp.maximum(hit.prim, 0)], 0,
                           scene.materials.kind.shape[0] - 1)
            has_med = scene.materials.med_enabled[mat] & valid
            transmitted = (mode & bsdf_mod.MODE_TRANSMIT) > 0
            new_med = medium_mod.stack_push(
                new_med, mat, has_med & transmitted & ~sp.inside)
            new_med = medium_mod.stack_pop(
                new_med, mat, has_med & transmitted & sp.inside)
        new_state = dict(org=ray_offset(x, wo), dir=wo, thr=thr,
                         pdf_proj=pdf_new, prev_n=sp.n, prev_prim=hit.prim,
                         alive=still, med_stack=new_med)
        out = {k: jnp.where(_bmask(alive, new_state[k]), new_state[k],
                            state[k]) for k in state}
        return out, record

    def _bmask(m, ref):
        return m.reshape(m.shape + (1,) * (ref.ndim - m.ndim))

    _, recs = jax.lax.scan(bounce, state, jnp.arange(n_steps))
    return recs


def _ratio(num, den):
    den_safe = jnp.where(den > 0.0, den, 1.0)
    r = num / den_safe
    return jnp.where((den > 0.0) & jnp.isfinite(r), r, 0.0)


def _at(recs, i):
    """Record dict of subpath vertex index i (stacked axis 0)."""
    return {f: jax.tree_util.tree_map(lambda a: a[i], recs[f])
            for f in recs}


def render_sample(scene, cfg: PTConfig, sample_idx, batch: int = 1,
                  only=None, strategies=None):
    """One BDPT progression: returns the XYZ accumulation framebuffer
    [H, W, 3] (unnormalized, like pt.render_sample).

    ``only``: optional single strategy (s, t) — compute just that
    connection (MIS weights still span the full strategy set).  This is
    the device half of bdpt1 (samplers/bdpt1.py): one connection per
    launch, selected host-side (reference src/sampler.d/bdpt1.c).

    ``strategies``: optional frozenset of (s, t) — restrict the ESTIMATOR
    to that strategy family; MIS denominators then span exactly the
    restricted set, so the estimator stays unbiased.  samplers/ptlt.py
    uses this with {s<=1} + {t=1} (reference ptlt.c's pt+nee+lt family)."""
    if cfg.media or scene.has_hete:
        import warnings
        warnings.warn('bdpt applies interior-medium transmittance '
                      '(absorption) on subpath edges and connections, but '
                      'samples no in-scattering vertices: scattering '
                      '(sigma_s > 0) media diverge from pt/ptdl; '
                      'absorbing interiors agree')
    n = cfg.width * cfg.height * batch
    pixel_idx = jnp.arange(cfg.width * cfg.height, dtype=jnp.uint32)
    pixel_idx = jnp.tile(pixel_idx, batch)
    sidx = jnp.asarray(sample_idx, jnp.uint32)
    mf = cfg.mf
    ps = cfg.pointsampler

    NT = cfg.max_verts - 1    # eye surface vertices y_1 .. y_NT
    NL = max(cfg.max_verts - 2, 1)   # light vertices z_0 .. z_{NL-1}

    def in_set(s_, t_):
        """Strategy (s_, t_) is part of the estimator's set (and hence of
        every MIS denominator)."""
        return strategies is None or (s_, t_) in strategies

    def compute(s_, t_):
        if only is not None:
            return only == (s_, t_)
        return in_set(s_, t_)

    def rnd(dim, salt=0):
        return rng.sample_dim(ps, pixel_idx, sidx, dim + 101 * salt, cfg.seed)

    def rnd_l(dim, salt=0):
        # decorrelated stream for the light subpath
        return rng.sample_dim(ps, pixel_idx, sidx, dim + 101 * salt,
                              cfg.seed + 0x9e37)

    # --- eye subpath -----------------------------------------------------
    jx = rnd(rng.Dim.IMAGE_X)
    jy = rnd(rng.Dim.IMAGE_Y)
    pix_i = (pixel_idx % cfg.width).astype(jnp.float32) + jx
    pix_j = (pixel_idx // cfg.width).astype(jnp.float32) + jy
    lam, _ = cie.sample_lambda_hero(rnd(rng.Dim.LAMBDA), mf)
    time = rnd(rng.Dim.TIME) * jnp.minimum(1.0,
                                           scene.camera.exposure_time * 30.0)
    org, d0, cam_thr, cam_pdf_proj = camera_mod.sample(
        scene.camera, cfg.width, cfg.height, pix_i, pix_j,
        rnd(rng.Dim.APERTURE_X), rnd(rng.Dim.APERTURE_Y), time)
    _, _, cam_n, _ = camera_mod.cam_frame(scene.camera, time)

    eye = _trace_subpath(
        scene, cfg, lam, org, d0,
        jnp.broadcast_to(cam_thr[..., None], (n, mf)),
        cam_pdf_proj[..., None], jnp.broadcast_to(cam_n, (n, 3)),
        jnp.full((n,), -1, jnp.int32), NT, rnd, salt_base=1)
    # _at(eye, m-1) = record of eye vertex y_m (m = 1 .. NT)

    # --- light subpath ---------------------------------------------------
    em = lights_mod.sample_emission(
        scene.lights, scene.geom, scene.materials, scene.prim_shader, lam,
        rnd_l(rng.Dim.LIGHTSOURCE), rnd_l(rng.Dim.LIGHT_X),
        rnd_l(rng.Dim.LIGHT_Y), rnd_l(rng.Dim.EDF_X), rnd_l(rng.Dim.EDF_Y))
    light = _trace_subpath(
        scene, cfg, lam, ray_offset(em['pos'], em['dir']), em['dir'],
        em['thr'], jnp.full((n, 1), 1.0 / jnp.pi),  # diffuse EDF proj pdf
        em['gn'], em['prim'], max(NL - 1, 1), rnd_l, salt_base=1)
    # _at(light, m-1) = record of light vertex z_m (m = 1 .. NL-1)

    pdf_pos = em['pdf_pos']                       # [N] area pdf of z_0
    mat_l0 = scene.prim_shader[jnp.maximum(em['prim'], 0)]
    le_spec = (scene.materials.e_mul[mat_l0, None] *
               rgb2spec.eval_coeff(
                   scene.materials.e_coeff[mat_l0][..., None, :], lam))
    rough_l0 = scene.materials.roughness[mat_l0]

    accum = jnp.zeros((n, mf))
    ones = jnp.ones((n, mf))

    # MIS convention: the eye-side pdf of the camera-adjacent vertex
    # (cam_pdf_proj, thinlens.c:104-107) folds the aperture-area pdf 1/A
    # in, and the camera vertex itself carries no factor — but the t = 1
    # technique samples its aperture point explicitly with pdf 1/A, so
    # every ratio crossing between t = 1 and t >= 2 must reinstate that
    # factor (reference: camera_pdf vs camera_pdf_connect conventions,
    # thinlens.c:163-178 / :243).
    inv_ap_area = 1.0 / camera_mod.aperture_area(scene.camera)

    # =====================================================================
    # s = 0: eye path hits an emitter (bdpt.c unidirectional strategy)
    # =====================================================================
    for t in range(2, NT + 2):
        if not compute(0, t):
            continue
        k = t
        r = _at(eye, t - 2)                      # emitter vertex y_{t-1}
        le = lights_mod.eval_vertex(r['sp'].em, r['sp'].roughness,
                                    r['sp'].gn, r['d_in'])
        emits = r['valid'] & jnp.any(le > 0.0, axis=-1)

        pdfA_fwd = []   # pA_fwd[i], path index i = 0 (light end) .. k-2
        pdfA_rev = []
        conn = []
        pdfA_fwd.append(jnp.broadcast_to(
            lights_mod.nee_pdf_area(scene.lights, r['prim'])[..., None],
            (n, mf)))
        pdfA_rev.append(r['pdf_fwd_a'])
        conn.append(emits)
        for i in range(1, k - 1):
            m = t - 1 - i                        # eye vertex index
            rm_ = _at(eye, m - 1)
            if i == 1:
                # diffuse-EDF direction pdf from the emitter toward y_{t-2}
                pdfA_fwd.append((1.0 / jnp.pi) * r['g_rev'][..., None]
                                * ones)
            else:
                pdfA_fwd.append(_at(eye, m)['pdf_rev_a'])
            pdfA_rev.append(rm_['pdf_fwd_a'])
            conn.append(rm_['connectable'])

        denom = ones
        rr = ones
        for j in range(1, k):
            rr = rr * _ratio(pdfA_fwd[j - 1], pdfA_rev[j - 1])
            if j > NL or (k - j) > NT + 1 or not in_set(j, k - j):
                continue
            # j = k-1 is the t=1 camera-splat strategy — the camera vertex
            # is always connectable (aperture sampling, bdpt.c:376-402)
            # and contributes its explicit aperture pdf 1/A
            if j == k - 1:
                denom = denom + jnp.where(conn[j - 1][..., None],
                                          rr * inv_ap_area, 0.0)
            else:
                ok = conn[j - 1] & conn[j]
                denom = denom + jnp.where(ok[..., None], rr, 0.0)
        w = _ratio(ones, jnp.sum(denom, axis=-1, keepdims=True))
        w = jax.lax.stop_gradient(jnp.where(jnp.isfinite(w), w, 0.0))
        accum = accum + jnp.where(emits[..., None], r['thr'] * le * w, 0.0)

    # =====================================================================
    # s >= 1, t >= 2 connections
    # =====================================================================
    for s in range(1, NL + 1):
        for t in range(2, NT + 2):
            if not compute(s, t):
                continue
            k = s + t
            if k > cfg.max_verts:
                continue
            ry = _at(eye, t - 2)                 # eye endpoint y_{t-1}
            if s == 1:
                z_x, z_n, z_prim = em['pos'], em['gn'], em['prim']
                z_valid = pdf_pos > 0.0
                z_conn = z_valid
                z_thr = _ratio(ones,
                               jnp.broadcast_to(pdf_pos[..., None], (n, mf)))
            else:
                rz = _at(light, s - 2)           # light endpoint z_{s-1}
                z_x, z_n, z_prim = rz['x'], rz['sp'].n, rz['prim']
                z_valid = rz['valid']
                z_conn = rz['connectable']
                z_thr = rz['thr']

            to_z = z_x - ry['x']
            d2 = jnp.maximum(dot(to_z, to_z), 1e-20)
            dist = jnp.sqrt(d2)
            wdir = to_z / dist[..., None]        # y_end -> z_end
            cos_y = _lambert(ry['sp'].n, wdir)
            cos_z = _lambert(z_n, wdir)
            g_conn = cos_y * cos_z / d2

            f_y, p_y = bsdf_mod.bsdf_eval_pdf(ry['sp'], ry['d_in'], wdir,
                                              kinds=scene.kinds_used)
            if s == 1:
                cos_gn = dot(em['gn'], -wdir)    # emitter emits toward y
                edf = lights_mod.phong_edf(rough_l0, cos_gn)
                edf = jnp.where((cos_gn > 0.0) & jnp.isfinite(edf), edf, 0.0)
                f_z = le_spec * edf[..., None]   # Le * EDF
                p_z_fwd = jnp.where((cos_gn > 0.0)[..., None],
                                    1.0 / jnp.pi, 0.0) * ones
                z_ok = z_valid & (cos_gn > 0.0)
            else:
                f_z, p_z_fwd = bsdf_mod.bsdf_eval_pdf(
                    rz['sp'], rz['d_in'], -wdir, kinds=scene.kinds_used)
                z_ok = z_valid
            f_y = jnp.where(jnp.isfinite(f_y), f_y, 0.0)
            f_z = jnp.where(jnp.isfinite(f_z), f_z, 0.0)

            can = ry['valid'] & ry['connectable'] & z_ok & z_conn & \
                jnp.any(f_y > 0.0, axis=-1) & jnp.any(f_z > 0.0, axis=-1)
            blocked = occluded(
                scene.geom, ray_offset(ry['x'], wdir), wdir,
                jnp.where(can, dist * (1.0 - 1e-3), 0.0),
                ignore_prim=ry['prim'], ignore_prim2=z_prim)
            can = can & ~blocked

            contrib = ry['thr'] * f_y * z_thr * f_z * g_conn[..., None]
            contrib = jnp.where(jnp.isfinite(contrib), contrib, 0.0)
            if cfg.media:
                # transmittance of the eye endpoint's interior along the
                # connection (boundary crossings are geometry-blocked by
                # the visibility test, like pt.py's NEE)
                tr_c = medium_mod.transmittance_scene(
                    scene, ry['med'], lam, ry['x'], wdir, dist)
                contrib = contrib * jnp.where(jnp.isfinite(tr_c), tr_c, 0.0)

            # ------- MIS: pA_fwd / pA_rev / conn along the full path -----
            pdfA_fwd = [None] * (k - 1)
            pdfA_rev = [None] * (k - 1)
            conn = [None] * (k - 1)
            for i in range(min(s, k - 1)):       # light side
                if i == 0:
                    pdfA_fwd[0] = jnp.broadcast_to(pdf_pos[..., None],
                                                   (n, mf)) * ones
                    conn[0] = pdf_pos > 0.0
                else:
                    ri = _at(light, i - 1)
                    pdfA_fwd[i] = ri['pdf_fwd_a']
                    conn[i] = ri['connectable']
                if i == s - 1:
                    pdfA_rev[i] = p_y * g_conn[..., None]
                elif i == s - 2:
                    rz_ = _at(light, s - 2)
                    _, p = bsdf_mod.bsdf_eval_pdf(rz_['sp'], wdir,
                                                  -rz_['d_in'],
                                                  kinds=scene.kinds_used)
                    p = jnp.where(jnp.isfinite(p), p, 0.0)
                    pdfA_rev[i] = p * rz_['g_rev'][..., None]
                else:
                    pdfA_rev[i] = _at(light, i)['pdf_rev_a']
            for i in range(s, k - 1):            # eye side (m = k-1-i)
                m = k - 1 - i
                rm_ = _at(eye, m - 1)
                pdfA_rev[i] = rm_['pdf_fwd_a']
                conn[i] = rm_['connectable']
                if i == s:
                    pdfA_fwd[i] = p_z_fwd * g_conn[..., None]
                elif i == s + 1:
                    _, p = bsdf_mod.bsdf_eval_pdf(ry['sp'], -wdir,
                                                  -ry['d_in'],
                                                  kinds=scene.kinds_used)
                    p = jnp.where(jnp.isfinite(p), p, 0.0)
                    pdfA_fwd[i] = p * ry['g_rev'][..., None]
                else:
                    pdfA_fwd[i] = _at(eye, m)['pdf_rev_a']

            denom = ones
            rr = ones                            # splice down: j = s-1 .. 0
            for j in range(s - 1, -1, -1):
                rr = rr * _ratio(pdfA_rev[j], pdfA_fwd[j])
                if (k - j) > NT + 1:
                    break
                if not in_set(j, k - j):
                    continue
                if j == 0:
                    denom = denom + rr           # unidirectional: always on
                else:
                    ok = conn[j - 1] & conn[j]
                    denom = denom + jnp.where(ok[..., None], rr, 0.0)
            rr = ones                            # splice up: j = s+1 .. k-1
            for j in range(s + 1, k):
                rr = rr * _ratio(pdfA_fwd[j - 1], pdfA_rev[j - 1])
                if j > NL:
                    break
                if not in_set(j, k - j):
                    continue
                # j = k-1 = the t=1 camera splat (camera side always on,
                # explicit aperture pdf 1/A)
                if j == k - 1:
                    denom = denom + jnp.where(conn[j - 1][..., None],
                                              rr * inv_ap_area, 0.0)
                else:
                    ok = conn[j - 1] & conn[j]
                    denom = denom + jnp.where(ok[..., None], rr, 0.0)

            w = _ratio(ones, jnp.sum(denom, axis=-1, keepdims=True))
            w = jax.lax.stop_gradient(jnp.where(jnp.isfinite(w), w, 0.0))
            accum = accum + jnp.where(can[..., None], contrib * w, 0.0)

    # =====================================================================
    # t = 1: light-subpath endpoint -> camera aperture splats
    # (bdpt.c:376-402; the splats land anywhere on the film, so they go
    # through the general filtered scatter splat like samplers/lt.py)
    # =====================================================================
    from ..ops import splat as splat_mod
    fb = jnp.zeros((cfg.height, cfg.width, 3))
    for s in range(1, NL + 1):
        if not compute(s, 1):
            continue
        k = s + 1
        if k > cfg.max_verts:
            break
        if s == 1:
            rz = None
            z_x, z_prim = em['pos'], em['prim']
            z_valid = pdf_pos > 0.0
            z_conn = z_valid
        else:
            rz = _at(light, s - 2)
            z_x, z_prim = rz['x'], rz['prim']
            z_valid = rz['valid']
            z_conn = rz['connectable']
        cc = camera_mod.connect(scene.camera, cfg.width, cfg.height, z_x,
                                rnd_l(rng.Dim.APERTURE_X, salt=70 + s),
                                rnd_l(rng.Dim.APERTURE_Y, salt=70 + s), time)
        d_cam = cc['dir']                       # z -> aperture, unit
        cos_ap = -dot(d_cam, cc['cam_n'])       # aperture faces the vertex
        if s == 1:
            # emitter -> camera: f = Le * EDF, weight carries 1/pdf_pos
            cos_l = dot(em['gn'], d_cam)
            edf = lights_mod.phong_edf(rough_l0, cos_l)
            edf = jnp.where((cos_l > 0.0) & jnp.isfinite(edf), edf, 0.0)
            f_z = le_spec * edf[..., None]
            z_thr = _ratio(ones,
                           jnp.broadcast_to(pdf_pos[..., None], (n, mf)))
            cos_z = cos_l
        else:
            f_z, _ = bsdf_mod.bsdf_eval_pdf(rz['sp'], rz['d_in'], d_cam,
                                            kinds=scene.kinds_used)
            f_z = jnp.where(jnp.isfinite(f_z), f_z, 0.0)
            z_thr = rz['thr']
            cos_z = _lambert(rz['sp'].n, d_cam)
        g_conn = jnp.abs(cos_z) * cos_ap / \
            jnp.maximum(cc['dist'] * cc['dist'], 1e-20)
        can = z_valid & z_conn & cc['valid'] & (cos_ap > 1e-6) & \
            jnp.any(f_z > 0.0, axis=-1)
        blocked = occluded(scene.geom, ray_offset(z_x, d_cam), d_cam,
                           jnp.where(can, cc['dist'] * (1.0 - 1e-3), 0.0),
                           ignore_prim=z_prim)
        can = can & ~blocked
        # cc.weight = sensor / p_aperture (camera.connect docstring)
        contrib = z_thr * f_z * (cc['weight'] * g_conn)[..., None]
        contrib = jnp.where(jnp.isfinite(contrib), contrib, 0.0)
        if cfg.media:
            med_z = (jnp.full((n,), scene.exterior_med, jnp.int32)
                     if s == 1 else rz['med'])
            tr_c = medium_mod.transmittance_scene(
                scene, med_z, lam, z_x, d_cam, cc['dist'])
            contrib = contrib * jnp.where(jnp.isfinite(tr_c), tr_c, 0.0)

        # ---- MIS over all strategies of length k (this one is j = k-1) --
        pdfA_fwd = [None] * (k - 1)
        pdfA_rev = [None] * (k - 1)
        conn = [None] * (k - 1)
        pdfA_fwd[0] = jnp.broadcast_to(pdf_pos[..., None], (n, mf)) * ones
        conn[0] = pdf_pos > 0.0
        for i in range(1, k - 1):
            ri = _at(light, i - 1)
            pdfA_fwd[i] = ri['pdf_fwd_a']
            conn[i] = ri['connectable']
        # reverse pdf of the camera-adjacent vertex: camera direction pdf
        # x G — WITHOUT the folded aperture pdf 1/A (pdf_v * G / g), so
        # the ratio against this technique's own camera-vertex pdf 1/A
        # (carried in cc.weight) is consistent: P_{t=2}/P_{t=1} =
        # pdf_eye_folded(x_{k-2}) * A / pdf_light(x_{k-2})
        cam_rev = (camera_mod.pdf_connect(scene.camera, cos_ap)
                   * camera_mod.aperture_area(scene.camera) * g_conn)
        pdfA_rev[s - 1] = jnp.where(jnp.isfinite(cam_rev), cam_rev,
                                    0.0)[..., None] * ones
        if s >= 2:
            _, p = bsdf_mod.bsdf_eval_pdf(rz['sp'], -d_cam, -rz['d_in'],
                                          kinds=scene.kinds_used)
            p = jnp.where(jnp.isfinite(p), p, 0.0)
            pdfA_rev[s - 2] = p * rz['g_rev'][..., None]
        for i in range(0, s - 2):
            pdfA_rev[i] = _at(light, i)['pdf_rev_a']

        denom = ones
        rr = ones
        for j in range(s - 1, -1, -1):           # splice down to j = 0
            rr = rr * _ratio(pdfA_rev[j], pdfA_fwd[j])
            if (k - j) > NT + 1:
                break
            if not in_set(j, k - j):
                continue
            if j == 0:
                denom = denom + rr               # unidirectional: always on
            else:
                ok = conn[j - 1] & conn[j]
                denom = denom + jnp.where(ok[..., None], rr, 0.0)
        w = _ratio(ones, jnp.sum(denom, axis=-1, keepdims=True))
        w = jax.lax.stop_gradient(jnp.where(jnp.isfinite(w), w, 0.0))
        val = jnp.where(can[..., None], contrib * w, 0.0)
        val = jnp.where(jnp.isfinite(val), val, 0.0)
        fb = splat_mod.splat(fb, cc['pix_i'], cc['pix_j'],
                             cie.spectral_to_xyz(lam, val))

    # --- splat (pixel-aligned like pt.render_sample) ---------------------
    accum = jnp.where(jnp.isfinite(accum), accum, 0.0)
    xyz = cie.spectral_to_xyz(lam, accum)
    return splat_mod.splat_pixel_aligned(fb, jx, jy, xyz, batch=batch)
