"""Profiling harness: split the 0010_pt progression cost into stages.

Run: python -m bench.profile  (real TPU; ~3 min of compiles on first run).
"""
import time, os, sys
import jax
import jax.numpy as jnp

from corona13_tpu import scene as scene_mod
from corona13_tpu.samplers import pt as pt_mod
from corona13_tpu.ops.trace import intersect, occluded, MAX_DIST

SCENE = '/root/reference/regression/0010_pt/test.nra2'
sc, _ = scene_mod.load_scene(SCENE)
sc = scene_mod.fit_film(sc, 1024, 576)
cfg = pt_mod.PTConfig(width=1024, height=576, max_verts=6, mf=4, use_nee=True)
n = cfg.width * cfg.height
print('tris:', sc.geom.n_tris, 'spheres:', sc.geom.n_spheres,
      'lines:', sc.geom.n_lines, 'bvh nodes:', sc.geom.tri_bvh.n_nodes)

def timeit(f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps

# full progression
step = jax.jit(lambda s: pt_mod.render_sample(sc, cfg, s))
t_full = timeit(step, jnp.uint32(0))
print(f'full progression: {t_full*1e3:.1f} ms')

# intersect-only: camera rays traced max_verts times (no shading)
from corona13_tpu.models import camera as camera_mod
from corona13_tpu.ops import rng
from corona13_tpu.spectral import cie

def gen_rays(s):
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)
    jx = rng.sample_dim('rand', pixel_idx, s, int(rng.Dim.IMAGE_X), 0)
    jy = rng.sample_dim('rand', pixel_idx, s, int(rng.Dim.IMAGE_Y), 0)
    pix_i = (pixel_idx % cfg.width).astype(jnp.float32) + jx
    pix_j = (pixel_idx // cfg.width).astype(jnp.float32) + jy
    org, d, thr, pdf = camera_mod.sample(sc.camera, cfg.width, cfg.height,
                                         pix_i, pix_j, jx, jy, jx * 0)
    return org, d

@jax.jit
def isect_once(s):
    org, d = gen_rays(s)
    hit = intersect(sc.geom, org, d)
    return hit.t.sum()

t_isect = timeit(isect_once, jnp.uint32(0))
print(f'1x intersect (589k coherent rays): {t_isect*1e3:.2f} ms '
      f'-> {n/t_isect/1e6:.1f} Mrays/s')

@jax.jit
def isect_bounce(s):
    # simulate incoherent bounce rays: random dirs from hit points
    org, d = gen_rays(s)
    hit = intersect(sc.geom, org, d)
    x = org + hit.t[..., None] * jnp.where(hit.valid[..., None], d, d)
    key = jax.random.PRNGKey(0)
    nd = jax.random.normal(key, (n, 3))
    nd = nd / jnp.linalg.norm(nd, axis=-1, keepdims=True)
    hit2 = intersect(sc.geom, x, nd, t_max=jnp.where(hit.valid, MAX_DIST, 0.0))
    return hit2.t.sum()

t_isect2 = timeit(isect_bounce, jnp.uint32(0))
print(f'2x intersect (1 coherent + 1 incoherent): {t_isect2*1e3:.2f} ms '
      f'-> incoherent {n/max(t_isect2-t_isect,1e-9)/1e6:.1f} Mrays/s')

# occlusion
@jax.jit
def occl_once(s):
    org, d = gen_rays(s)
    b = occluded(sc.geom, org, d, jnp.full((n,), 100.0))
    return b.sum()

t_occl = timeit(occl_once, jnp.uint32(0))
print(f'1x occluded: {t_occl*1e3:.2f} ms')

# shading only (no trace): run a progression with 0-length trace? approximate:
cfg_nonee = pt_mod.PTConfig(width=1024, height=576, max_verts=6, mf=4,
                            use_nee=False)
step2 = jax.jit(lambda s: pt_mod.render_sample(sc, cfg_nonee, s))
t_nonee = timeit(step2, jnp.uint32(0))
print(f'progression without NEE: {t_nonee*1e3:.1f} ms')

cfg_short = pt_mod.PTConfig(width=1024, height=576, max_verts=2, mf=4,
                            use_nee=True)
step3 = jax.jit(lambda s: pt_mod.render_sample(sc, cfg_short, s))
t_short = timeit(step3, jnp.uint32(0))
print(f'progression max_verts=2: {t_short*1e3:.1f} ms')

cfg_mf1 = pt_mod.PTConfig(width=1024, height=576, max_verts=6, mf=1,
                          use_nee=True)
step4 = jax.jit(lambda s: pt_mod.render_sample(sc, cfg_mf1, s))
t_mf1 = timeit(step4, jnp.uint32(0))
print(f'progression mf=1: {t_mf1*1e3:.1f} ms')
