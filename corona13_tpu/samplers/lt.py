"""Light tracer: paths start at emitters and connect every vertex to the
camera (corona-13 src/sampler.d/lt.c + camera_connect).

Wavefront formulation mirrors samplers/pt.py: a light-path SoA advances
through a lax.scan; each bounce connects the current vertex to a sampled
aperture point and scatter-splats the contribution at the projected pixel
(the general filtered scatter in ops/splat.py — LT splats land anywhere,
unlike the pixel-aligned PT wavefront).

Per progression, width*height light paths are traced; with the constant
thin-lens importance (models/camera.connect) the accumulated framebuffer
normalizes exactly like the PT progressions (see camera.connect docstring),
so LT and PT images agree sample-for-sample in expectation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..models import bsdf as bsdf_mod
from ..models import camera as camera_mod
from ..models import lights as lights_mod
from ..models import shading as shading_mod
from ..ops import rng
from ..ops import splat as splat_mod
from ..ops.trace import intersect, occluded, INVALID_PRIM, MAX_DIST
from ..spectral import cie
from ..utils.math import dot, ray_offset
from .pt import PTConfig, _lambert


def render_sample(scene, cfg: PTConfig, sample_idx, batch: int = 1):
    """One LT progression (batch progressions per launch): returns the XYZ
    accumulation framebuffer [H, W, 3]."""
    n = cfg.width * cfg.height * batch
    path_idx = jnp.arange(n, dtype=jnp.uint32)
    sidx = jnp.asarray(sample_idx, jnp.uint32)
    mf = cfg.mf
    ps = cfg.pointsampler

    def rnd(dim, salt=0):
        return rng.sample_dim(ps, path_idx, sidx, dim + 101 * salt, cfg.seed)

    lam, _ = cie.sample_lambda_hero(rnd(rng.Dim.LAMBDA), mf)
    time = rnd(rng.Dim.TIME) * jnp.minimum(1.0, scene.camera.exposure_time * 30.0)

    em = lights_mod.sample_emission(
        scene.lights, scene.geom, scene.materials, scene.prim_shader, lam,
        rnd(rng.Dim.LIGHTSOURCE), rnd(rng.Dim.LIGHT_X), rnd(rng.Dim.LIGHT_Y),
        rnd(rng.Dim.EDF_X), rnd(rng.Dim.EDF_Y))

    izero = ((path_idx + sidx) & jnp.uint32(0)).astype(jnp.int32)
    fb0 = jnp.zeros((cfg.height, cfg.width, 3))

    def connect(fb, x, f_fn, ignore, can, salt):
        """Splat the camera connection of vertices x; f_fn(dir_to_cam) ->
        (f [N, MF], cos_at_x [N])."""
        cc = camera_mod.connect(scene.camera, cfg.width, cfg.height, x,
                                rnd(rng.Dim.APERTURE_X, salt=salt),
                                rnd(rng.Dim.APERTURE_Y, salt=salt), time)
        f, cos_x = f_fn(cc['dir'])
        cos_ap = -dot(cc['dir'], cc['cam_n'])   # aperture faces the vertex
        ok = can & cc['valid'] & (cos_ap > 1e-6) & jnp.any(f > 0.0, axis=-1)
        blocked = occluded(scene.geom, ray_offset(x, cc['dir']), cc['dir'],
                           jnp.where(ok, cc['dist'] * (1.0 - 1e-3), 0.0),
                           ignore_prim=ignore)
        ok = ok & ~blocked
        g = (jnp.abs(cos_x) * cos_ap
             / jnp.maximum(cc['dist'] * cc['dist'], 1e-20))
        val = f * (cc['weight'] * g)[..., None]
        val = jnp.where(ok[..., None] & jnp.isfinite(val), val, 0.0)
        xyz = cie.spectral_to_xyz(lam, val / mf)
        return splat_mod.splat(fb, cc['pix_i'], cc['pix_j'], xyz)

    # connect the light vertex itself (makes emitters visible, lt.c):
    # the "f" here is Le(dir)/pdf_pos; the cosine at the light is part of G
    def f_light(d_cam):
        cos_l = dot(em['gn'], d_cam)
        mat = scene.prim_shader[jnp.maximum(em['prim'], 0)]
        edf = lights_mod.phong_edf(scene.materials.roughness[mat], cos_l)
        edf = jnp.where((cos_l > 0.0) & jnp.isfinite(edf), edf, 0.0)
        pdf_pos_safe = jnp.where(em['pdf_pos'] > 0.0, em['pdf_pos'], 1.0)
        le = (scene.materials.e_mul[mat, None] * _e_spectrum(scene, mat, lam))
        val = le * (edf / pdf_pos_safe)[..., None]
        return val, cos_l

    fb = connect(fb0, em['pos'], f_light, em['prim'],
                 em['pdf_pos'] > 0.0, salt=50)

    state = dict(
        org=em['pos'], dir=em['dir'], thr=em['thr'],
        prev_prim=em['prim'],
        alive=(izero == 0) & (em['pdf_pos'] > 0.0)
              & jnp.any(em['thr'] > 0.0, axis=-1),
        length=izero + 1,
        fb=fb,
    )

    def bounce(state, depth):
        alive = state['alive']
        org = state['org']
        d = state['dir']
        hit = intersect(scene.geom, ray_offset(org, d), d,
                        ignore_prim=state['prev_prim'],
                        t_max=jnp.where(alive, MAX_DIST, 0.0))
        valid = hit.valid & alive
        x = org + jnp.where(hit.valid, hit.t, 1e4)[..., None] * d
        sp = shading_mod.prepare(scene, hit, x, d, lam)

        # connect this surface vertex to the camera
        def f_surf(d_cam):
            f, _ = bsdf_mod.bsdf_eval_pdf(sp, d, d_cam,
                                          kinds=scene.kinds_used)
            return state['thr'] * f, _lambert(sp.n, d_cam)
        fb = connect(state['fb'], x, f_surf, hit.prim, valid,
                     salt=60 + depth)

        # extend (adjoint transport: same kernels; dielectric eta^2
        # radiance/importance asymmetry is TODO for caustic-accurate LT)
        r1 = rnd(rng.Dim.OMEGA_X, salt=1 + depth)
        r2 = rnd(rng.Dim.OMEGA_Y, salt=1 + depth)
        rm = rnd(rng.Dim.SCATTER_MODE, salt=1 + depth)
        wo, pdf_new, w, mode = bsdf_mod.bsdf_sample(sp, d, r1, r2, rm,
                                                    kinds=scene.kinds_used)
        w = jnp.where(jnp.isfinite(w), w, 0.0)
        thr = state['thr'] * w
        still = valid & jnp.any(thr > 0.0, axis=-1)
        new_len = state['length'] + 1
        # RR like pt
        ratio = jnp.where(state['thr'][..., 0] > 0.0,
                          thr[..., 0] / jnp.maximum(state['thr'][..., 0], 1e-30), 0.0)
        p_survive = jax.lax.stop_gradient(jnp.clip(ratio, 0.05, 1.0))
        do_rr = new_len > cfg.rr_start
        rrnd = rnd(rng.Dim.RUSSIAN_R, salt=1 + depth)
        survive = ~do_rr | (rrnd < p_survive)
        thr = jnp.where((do_rr & survive)[..., None],
                        thr / p_survive[..., None], thr)
        still = still & survive

        new_state = dict(org=x, dir=wo, thr=thr, prev_prim=hit.prim,
                         alive=still, length=new_len, fb=fb)
        out = {k: jnp.where(_mask(alive, new_state[k]), new_state[k],
                            state[k]) if k != 'fb' else new_state[k]
               for k in state}
        return out, None

    def _mask(m, ref):
        return m.reshape(m.shape + (1,) * (ref.ndim - m.ndim))

    state, _ = jax.lax.scan(bounce, state, jnp.arange(cfg.max_verts - 2))
    return state['fb']


def _e_spectrum(scene, mat, lam):
    from ..spectral import rgb2spec
    return rgb2spec.eval_coeff(scene.materials.e_coeff[mat][..., None, :], lam)
