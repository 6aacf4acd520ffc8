"""Per-stage cost profile of one 0010_pt progression (VERDICT r4 item 1a).

Times each stage of the wavefront path tracer in isolation on the real
TPU, printing each row AS IT COMPLETES (so a timeout still yields data),
plus ablated full-step variants.  Enable the persistent compile cache to
make reruns cheap:

    JAX_COMPILATION_CACHE_DIR=.jax_cache python -m bench.stages

The stage inputs are real mid-path data: primary hits and bounce rays on
the 0010 scene, so gathers see realistic access patterns.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# the axon sitecustomize imports jax before any user code runs, so the
# env var is read too late — set the persistent compile cache via config
jax.config.update('jax_compilation_cache_dir', os.environ.get(
    'JAX_COMPILATION_CACHE_DIR',
    os.path.join(os.path.dirname(__file__), '..', '.jax_cache')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

SCENE = '/root/reference/regression/0010_pt/test.nra2'
W, H, MF = 1024, 576, 4
RESULTS = {}


def timeit(name, f, *args, reps=4):
    t0 = time.time()
    out = f(*args)
    jax.block_until_ready(out)
    t_compile = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    RESULTS[name] = round(dt * 1e3, 2)
    print(f'{name:34s} {dt*1e3:8.2f} ms   (compile {t_compile:.1f}s)',
          flush=True)
    return dt


def main():
    from corona13_tpu import scene as scene_mod
    from corona13_tpu.samplers import pt as pt_mod
    from corona13_tpu.models import camera as camera_mod
    from corona13_tpu.models import shading as shading_mod
    from corona13_tpu.models import lights as lights_mod
    from corona13_tpu.models import bsdf as bsdf_mod
    from corona13_tpu.ops import rng
    from corona13_tpu.ops import splat as splat_mod
    from corona13_tpu.ops.trace import intersect, occluded
    from corona13_tpu.spectral import cie
    from corona13_tpu.utils.math import ray_offset, dot

    sc, _ = scene_mod.load_scene(SCENE)
    sc = scene_mod.fit_film(sc, W, H)
    n = W * H
    print(f'scene: {sc.geom.n_tris} tris, wavefront n={n}, mf={MF}',
          flush=True)

    # --- build representative mid-path data (primary hits + bounce rays)
    @jax.jit
    def gen(s):
        pixel_idx = jnp.arange(n, dtype=jnp.uint32)
        jx = rng.sample_dim('rand', pixel_idx, s, int(rng.Dim.IMAGE_X), 0)
        jy = rng.sample_dim('rand', pixel_idx, s, int(rng.Dim.IMAGE_Y), 0)
        pix_i = (pixel_idx % W).astype(jnp.float32) + jx
        pix_j = (pixel_idx // W).astype(jnp.float32) + jy
        lam, _ = cie.sample_lambda_hero(
            rng.sample_dim('rand', pixel_idx, s, int(rng.Dim.LAMBDA), 0), MF)
        org, d, _, _ = camera_mod.sample(sc.camera, W, H, pix_i, pix_j,
                                         jx, jy, jx * 0)
        hit = intersect(sc.geom, org, d)
        x = org + jnp.where(hit.valid, hit.t, 1e4)[..., None] * d
        r1 = rng.sample_dim('rand', pixel_idx, s, 17, 0)
        r2 = rng.sample_dim('rand', pixel_idx, s, 18, 0)
        r3 = rng.sample_dim('rand', pixel_idx, s, 19, 0)
        return pixel_idx, lam, org, d, hit, x, r1, r2, r3

    pixel_idx, lam, org, d, hit, x, r1, r2, r3 = jax.block_until_ready(
        gen(jnp.uint32(0)))

    # stage: traversal (closest-hit on primary rays; bounce-ray rates are
    # in bench.traversal — this row anchors the two benches)
    timeit('intersect (coherent)',
           jax.jit(lambda o, w: intersect(sc.geom, o, w).t.sum()), org, d)

    # stage: shading prepare (SoA gathers by hit slot)
    prep = jax.jit(lambda h, xx, dd, ll: shading_mod.prepare(
        sc, h, xx, dd, ll).n.sum())
    timeit('shading.prepare', prep, hit, x, d, lam)

    sp = jax.jit(lambda h, xx, dd, ll: shading_mod.prepare(sc, h, xx, dd, ll))(
        hit, x, d, lam)
    jax.block_until_ready(sp)

    # stage: bsdf sample + eval
    timeit('bsdf_sample',
           jax.jit(lambda s_, dd, a, b, c: bsdf_mod.bsdf_sample(
               s_, dd, a, b, c, kinds=sc.kinds_used)[2].sum()),
           sp, d, r1, r2, r3)
    timeit('bsdf_eval_pdf',
           jax.jit(lambda s_, dd, a: bsdf_mod.bsdf_eval_pdf(
               s_, dd, a, kinds=sc.kinds_used)[0].sum()),
           sp, d, -d)

    # stage: NEE light sampling (no shadow ray)
    timeit('lights.sample_nee',
           jax.jit(lambda xx, a, b, c: lights_mod.sample_nee(
               sc.lights, sc.geom, xx, a, b, c)['pdf_area'].sum()),
           x, r1, r2, r3)

    # stage: shadow ray (any-hit)
    @jax.jit
    def shadow(xx, a, b, c, prim):
        ls = lights_mod.sample_nee(sc.lights, sc.geom, xx, a, b, c)
        to_l = ls['pos'] - xx
        dist = jnp.sqrt(jnp.maximum(dot(to_l, to_l), 1e-20))
        wo = to_l / dist[..., None]
        return occluded(sc.geom, ray_offset(xx, wo), wo,
                        dist * (1 - 1e-3), ignore_prim=prim).sum()
    timeit('occluded (shadow)', shadow, x, r1, r2, r3, hit.prim)

    # stage: RNG dims (10 dims x 5 bounces worth)
    @jax.jit
    def rng_all(s):
        acc = jnp.zeros((n,))
        for k in range(50):
            acc = acc + rng.sample_dim('rand', pixel_idx, s, k, 0)
        return acc.sum()
    timeit('rng.sample_dim x50', rng_all, jnp.uint32(3))

    # stage: splat
    col = jnp.ones((n, 3))
    timeit('splat_pixel_aligned',
           jax.jit(lambda a, b, cc: splat_mod.splat_pixel_aligned(
               jnp.zeros((H, W, 3)), a, b, cc).sum()), r1, r2, col)

    # stage: spectral -> xyz
    timeit('spectral_to_xyz',
           jax.jit(lambda ll, aa: cie.spectral_to_xyz(ll, aa).sum()),
           lam, jnp.ones((n, MF)))

    # --- ablated full steps
    for name, cfg in [
        ('FULL step (ptdl mv=6)',
         pt_mod.PTConfig(width=W, height=H, max_verts=6, mf=MF, use_nee=True)),
        ('step no-NEE (pt mv=6)',
         pt_mod.PTConfig(width=W, height=H, max_verts=6, mf=MF,
                         use_nee=False)),
        ('step mv=2 (cam+1 bounce)',
         pt_mod.PTConfig(width=W, height=H, max_verts=2, mf=MF,
                         use_nee=True)),
        ('step mf=1',
         pt_mod.PTConfig(width=W, height=H, max_verts=6, mf=1,
                         use_nee=True)),
    ]:
        step = jax.jit(lambda s, c=cfg: pt_mod.render_sample(sc, c, s))
        timeit(name, step, jnp.uint32(0))

    print(json.dumps({'metric': 'stage ms on 0010_pt', **RESULTS}),
          flush=True)


if __name__ == '__main__':
    main()
