"""Progressive photon mapping (PPM) with a sorted hash-grid gather.

TPU-native re-design of the reference PPM (corona-13 src/sampler.d/ppm.c
:48-96 photon build + include/pathspace/photon.h kd-tree/knn lookup): a
kd-tree with per-query heaps is a pointer-chasing CPU design, so the
photon map becomes a *sorted cell grid*:

  * photon pass: a light-subpath wavefront (emitter starts like
    samplers/lt.py) deposits one photon record per diffuse surface vertex
    into stacked SoA arrays;
  * build: photons get a 3-D cell id at cell size 2r and one variadic
    ``lax.sort`` orders all record columns by cell — the "tree build" is
    a sort (cf. the reference's kd build, photon.h);
  * gather: each eye vertex looks up the 8 cells of the 2x2x2 block
    around it with ``searchsorted`` and scans K photons per cell with
    dense masked math — fixed trip counts, no heaps.

Spectral correctness: a photon carries its own hero wavelengths and
power; the gather surface is diffuse, so the BSDF factorizes per lane and
the estimate evaluates the *gather surface's* albedo at the *photon's*
wavelengths, then converts to XYZ — no spectral mixing bias.

Eye paths collect emitter hits directly (s=0) and gather at their first
diffuse vertex, walking through specular chains (max_eye_verts bound) —
the classic PPM split; the radius shrinks per progression with alpha =
0.7 (knuth-style progressive estimate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import bsdf as bsdf_mod
from ..models import camera as camera_mod
from ..models import lights as lights_mod
from ..models import shading as shading_mod
from ..ops import rng
from ..ops.trace import intersect, INVALID_PRIM, MAX_DIST
from ..spectral import cie, rgb2spec
from ..utils.math import dot, ray_offset
from .pt import PTConfig, _lambert

ALPHA = 0.7          # progressive radius exponent
K_PER_CELL = 16      # photons scanned per cell (sorted-run cap)
GRID = 256           # cells per axis


def _scene_extent(scene):
    root = scene.geom.tri_bvh.nodes[0]
    return jnp.max(root[3:6] - root[0:3])


def photon_pass(scene, cfg: PTConfig, sample_idx, n_paths, n_bounces):
    """Trace ``n_paths`` light subpaths; returns photon SoA dict with
    [n_bounces * n_paths] records (pos, dir, lam[MF], power[MF], valid)."""
    mf = cfg.mf
    path_idx = jnp.arange(n_paths, dtype=jnp.uint32)
    sidx = jnp.asarray(sample_idx, jnp.uint32)

    def rnd(dim, salt=0):
        return rng.sample_dim(cfg.pointsampler, path_idx, sidx,
                              dim + 101 * salt, cfg.seed + 0x51ab)

    lam, _ = cie.sample_lambda_hero(rnd(rng.Dim.LAMBDA), mf)
    em = lights_mod.sample_emission(
        scene.lights, scene.geom, scene.materials, scene.prim_shader, lam,
        rnd(rng.Dim.LIGHTSOURCE), rnd(rng.Dim.LIGHT_X), rnd(rng.Dim.LIGHT_Y),
        rnd(rng.Dim.EDF_X), rnd(rng.Dim.EDF_Y))

    state = dict(org=ray_offset(em['pos'], em['dir']), dir=em['dir'],
                 thr=em['thr'], prev_prim=em['prim'],
                 alive=jnp.ones((n_paths,), bool))

    def bounce(state, depth):
        alive = state['alive']
        hit = intersect(scene.geom, state['org'], state['dir'],
                        ignore_prim=state['prev_prim'],
                        t_max=jnp.where(alive, MAX_DIST, 0.0))
        valid = hit.valid & alive
        t_park = jnp.where(hit.valid, hit.t, 1e4)
        x = state['org'] + t_park[..., None] * state['dir']
        sp = shading_mod.prepare(scene, hit, x, state['dir'], lam)
        diffuse = (sp.kind == bsdf_mod.DIFFUSE) & valid

        rec = dict(pos=x, wi=state['dir'], lam=lam, power=state['thr'],
                   valid=diffuse)

        r1 = rnd(rng.Dim.OMEGA_X, salt=1 + depth)
        r2 = rnd(rng.Dim.OMEGA_Y, salt=1 + depth)
        rm = rnd(rng.Dim.SCATTER_MODE, salt=1 + depth)
        wo, pdf_new, w, mode = bsdf_mod.bsdf_sample(sp, state['dir'], r1, r2,
                                                    rm,
                                                    kinds=scene.kinds_used)
        w = jnp.where(jnp.isfinite(w), w, 0.0)
        thr = state['thr'] * w
        # RR keeps photon powers bounded (ppm.c uses fixed depth; the
        # throughput-ratio RR matches pt.py)
        rr = rnd(rng.Dim.RUSSIAN_R, salt=1 + depth)
        p_s = jnp.clip(jnp.max(w[..., 0:1], axis=-1), 0.05, 1.0)
        kill = (depth >= 2) & (rr > p_s)
        thr = jnp.where((depth >= 2)[..., None] & ~kill[..., None],
                        thr / p_s[..., None], thr)
        still = valid & ~kill & jnp.any(thr > 0.0, axis=-1) & \
            jnp.any(pdf_new > 0.0, axis=-1)
        new_state = dict(org=ray_offset(x, wo), dir=wo, thr=thr,
                         prev_prim=hit.prim, alive=still)
        out = {k: jnp.where(
            alive.reshape(alive.shape + (1,) * (new_state[k].ndim - 1)),
            new_state[k], state[k]) for k in state}
        return out, rec

    _, recs = jax.lax.scan(bounce, state, jnp.arange(n_bounces))
    # flatten PATH-major, not depth-major: lax.scan stacks records
    # [n_bounces, n_paths]; a depth-major flatten would make the stable
    # cell sort keep the lowest-bounce (highest-power) photons first in
    # every dense cell, biasing the cnt/K subsample rescale upward.  Path
    # index is iid and uncorrelated with photon power, so path-major order
    # makes the kept-K prefix an unbiased subsample.
    flat = {k: v.swapaxes(0, 1).reshape((-1,) + v.shape[2:])
            for k, v in recs.items()}
    return flat


def build_grid(photons, lo, cell):
    """Sort photon columns by 3-D cell id; returns (sorted photon dict,
    sorted cell ids)."""
    g = jnp.clip(((photons['pos'] - lo) / cell), 0, GRID - 1).astype(jnp.int32)
    cid = (g[:, 0] + GRID * (g[:, 1] + GRID * g[:, 2]))
    cid = jnp.where(photons['valid'], cid, jnp.int32(GRID ** 3))  # park dead
    cols = (photons['pos'][:, 0], photons['pos'][:, 1], photons['pos'][:, 2],
            photons['wi'][:, 0], photons['wi'][:, 1], photons['wi'][:, 2])
    mf = photons['lam'].shape[-1]
    cols = cols + tuple(photons['lam'][:, i] for i in range(mf))
    cols = cols + tuple(photons['power'][:, i] for i in range(mf))
    srt = jax.lax.sort((cid,) + cols, num_keys=1)
    cid_s = srt[0]
    pos = jnp.stack(srt[1:4], axis=-1)
    wi = jnp.stack(srt[4:7], axis=-1)
    lam = jnp.stack(srt[7:7 + mf], axis=-1)
    power = jnp.stack(srt[7 + mf:7 + 2 * mf], axis=-1)
    # unbiased per-cell subsampling: the gather scans K_PER_CELL slots per
    # cell, so keep the first K photons of each sorted run and rescale
    # them by cnt/K (the stable sort preserves path order, which is
    # uncorrelated with position inside a cell) — dense cells stay
    # energy-correct instead of silently truncating
    start = jnp.searchsorted(cid_s, cid_s, side='left')
    end = jnp.searchsorted(cid_s, cid_s, side='right')
    cnt = (end - start).astype(jnp.float32)
    rank = jnp.arange(cid_s.shape[0], dtype=jnp.int32) - start
    scale = jnp.maximum(cnt / K_PER_CELL, 1.0)
    power = jnp.where((rank < K_PER_CELL)[..., None],
                      power * scale[..., None], 0.0)
    return dict(pos=pos, wi=wi, lam=lam, power=power), cid_s


def gather(scene, sorted_ph, cid_s, x, n_gather, mat, r, lo, cell,
           n_emitted):
    """Photon density estimate at gather points x with normals n_gather and
    material ids mat: sum_k albedo(lam_k)/pi * power_k / (pi r^2 N).
    Returns XYZ [N, 3]."""
    m = scene.materials
    g0 = jnp.floor((x - lo) / cell - 0.5).astype(jnp.int32)
    acc = jnp.zeros((x.shape[0], 3))
    r2 = r * r
    for ox in range(2):
        for oy in range(2):
            for oz in range(2):
                g = jnp.clip(g0 + jnp.array([ox, oy, oz]), 0, GRID - 1)
                cid = g[:, 0] + GRID * (g[:, 1] + GRID * g[:, 2])
                start = jnp.searchsorted(cid_s, cid)
                for k in range(K_PER_CELL):
                    idx = jnp.minimum(start + k, cid_s.shape[0] - 1)
                    ok = cid_s[idx] == cid
                    dp = sorted_ph['pos'][idx] - x
                    ok &= jnp.sum(dp * dp, axis=-1) < r2
                    # disc gather: reject photons off the tangent plane
                    # (sphere gathers double-count photons on adjacent
                    # perpendicular surfaces near corners)
                    ok &= jnp.abs(dot(dp, n_gather)) < 0.1 * r
                    # photon must arrive from the gather surface's front
                    ok &= dot(sorted_ph['wi'][idx], n_gather) < 0.0
                    lam_p = sorted_ph['lam'][idx]
                    alb = (m.d_mul[mat, None] * rgb2spec.eval_coeff(
                        m.d_coeff[mat][..., None, :], lam_p))
                    # 1/mf hero-lane normalization: each photon lane is an
                    # independent full-magnitude estimate at its own
                    # wavelength (cf. lt.py val/mf); spectral_to_xyz is a
                    # SUM over lanes, so average them here
                    mf_p = lam_p.shape[-1]
                    contrib = sorted_ph['power'][idx] * alb / (jnp.pi * mf_p)
                    xyz = cie.spectral_to_xyz(lam_p, contrib)
                    acc = acc + jnp.where(ok[..., None], xyz, 0.0)
    return acc / (jnp.pi * r2 * n_emitted)


def render_sample(scene, cfg: PTConfig, sample_idx, batch: int = 1,
                  n_photon_paths: int = 0, radius: float = 0.0):
    """One PPM progression; returns the XYZ accumulation FB [H, W, 3].

    radius = 0 picks r_i = 2.5%% scene extent * (i+1)^((ALPHA-1)/2)
    (progressive shrink); n_photon_paths defaults to 2x the pixel count."""
    n = cfg.width * cfg.height * batch
    pixel_idx = jnp.tile(jnp.arange(cfg.width * cfg.height,
                                    dtype=jnp.uint32), batch)
    sidx = jnp.asarray(sample_idx, jnp.uint32)
    mf = cfg.mf

    if n_photon_paths <= 0:
        n_photon_paths = 2 * cfg.width * cfg.height
    n_bounces = max(cfg.max_verts - 1, 2)
    photons = photon_pass(scene, cfg, sample_idx, n_photon_paths, n_bounces)

    ext = _scene_extent(scene)
    if radius <= 0.0:
        i1 = jnp.asarray(sample_idx, jnp.float32) + 1.0
        r = 0.025 * ext * i1 ** ((ALPHA - 1.0) / 2.0)
    else:
        r = jnp.asarray(radius, jnp.float32)
    cell = 2.0 * r
    lo = scene.geom.tri_bvh.nodes[0][0:3]
    sorted_ph, cid_s = build_grid(photons, lo, cell)

    def rnd(dim, salt=0):
        return rng.sample_dim(cfg.pointsampler, pixel_idx, sidx,
                              dim + 101 * salt, cfg.seed)

    jx = rnd(rng.Dim.IMAGE_X)
    jy = rnd(rng.Dim.IMAGE_Y)
    pix_i = (pixel_idx % cfg.width).astype(jnp.float32) + jx
    pix_j = (pixel_idx // cfg.width).astype(jnp.float32) + jy
    lam, _ = cie.sample_lambda_hero(rnd(rng.Dim.LAMBDA), mf)
    time = rnd(rng.Dim.TIME) * jnp.minimum(1.0,
                                           scene.camera.exposure_time * 30.0)
    org, d, cam_thr, _ = camera_mod.sample(
        scene.camera, cfg.width, cfg.height, pix_i, pix_j,
        rnd(rng.Dim.APERTURE_X), rnd(rng.Dim.APERTURE_Y), time)

    thr = jnp.broadcast_to(cam_thr[..., None], (n, mf))
    accum_spec = jnp.zeros((n, mf))
    accum_xyz = jnp.zeros((n, 3))
    prev_prim = jnp.full((n,), -1, jnp.int32)
    alive = jnp.ones((n,), bool)
    gathered = jnp.zeros((n,), bool)

    # eye walk: unrolled specular chain with one gather at the first
    # diffuse vertex (ppm eye side); emitter hits collect directly
    E = min(cfg.max_verts - 1, 4)
    for depth in range(E):
        hit = intersect(scene.geom, org, d, ignore_prim=prev_prim,
                        t_max=jnp.where(alive, MAX_DIST, 0.0))
        valid = hit.valid & alive
        t_park = jnp.where(hit.valid, hit.t, 1e4)
        x = org + t_park[..., None] * d
        sp = shading_mod.prepare(scene, hit, x, d, lam)
        # sky on escape
        missed = alive & ~hit.valid
        sky = lights_mod.sky_eval(scene, d, lam)
        accum_spec = accum_spec + jnp.where(missed[..., None], thr * sky, 0.0)
        # emitter hit
        le = lights_mod.eval_vertex(sp.em, sp.roughness, sp.gn, d)
        emits = valid & jnp.any(le > 0.0, axis=-1)
        accum_spec = accum_spec + jnp.where(emits[..., None], thr * le, 0.0)
        # gather at first diffuse vertex
        diffuse = (sp.kind == bsdf_mod.DIFFUSE) & valid & ~gathered
        mat = jnp.clip(scene.prim_shader[jnp.maximum(hit.prim, 0)], 0,
                       scene.materials.kind.shape[0] - 1)
        n_g = jnp.where(sp.inside[..., None], -sp.n, sp.n)
        xyz = gather(scene, sorted_ph, cid_s, x, n_g, mat, r, lo, cell,
                     n_photon_paths)
        # photon power is spectral radiance/pdf per emitted path; the eye
        # throughput applies per-lane then averages lanes (hero estimate)
        w_eye = jnp.mean(thr, axis=-1, keepdims=True)
        accum_xyz = accum_xyz + jnp.where(diffuse[..., None], xyz * w_eye,
                                          0.0)
        gathered = gathered | diffuse
        # continue through specular/glossy only
        r1 = rnd(rng.Dim.OMEGA_X, salt=1 + depth)
        r2 = rnd(rng.Dim.OMEGA_Y, salt=1 + depth)
        rm = rnd(rng.Dim.SCATTER_MODE, salt=1 + depth)
        wo, pdf_new, w, mode = bsdf_mod.bsdf_sample(sp, d, r1, r2, rm,
                                                    kinds=scene.kinds_used)
        w = jnp.where(jnp.isfinite(w), w, 0.0)
        thr = thr * w
        alive = valid & ~gathered & jnp.any(thr > 0.0, axis=-1)
        org = ray_offset(x, wo)
        d = wo
        prev_prim = hit.prim

    # 1/mf for the directly-collected spectral part as well (hero lanes
    # are averaged, mirroring lt.py:74's val/mf)
    accum_xyz = accum_xyz + cie.spectral_to_xyz(lam, accum_spec / mf)
    accum_xyz = jnp.where(jnp.isfinite(accum_xyz), accum_xyz, 0.0)
    from ..ops import splat as splat_mod
    fb = jnp.zeros((cfg.height, cfg.width, 3))
    return splat_mod.splat_pixel_aligned(fb, jx, jy, accum_xyz, batch=batch)
