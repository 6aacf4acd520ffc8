"""Traversal kernel microbenchmark on the 0010_pt regression scene.

Measures the ray-intersection kernel in isolation (the hot loop of every
sampler, reference analogue src/accel.d/qbvhmp.c:1262-1389):

  * coherent:   one closest-hit pass over the 1024x576 primary wavefront
  * incoherent: closest-hit on diffuse-bounce rays from the primary hits
                (cosine-hemisphere around the shading normal — the worst
                realistic divergence a PT wavefront produces)
  * sorted:     the same bounce rays, pre-sorted by (direction octant,
                origin morton) — measures what wavefront coherence
                sorting buys the packet-union traversal
  * shadow:     any-hit occlusion rays from the primary hits towards a
                sampled emitter point

Timing methodology: every rep uses a DIFFERENT ray set (3 pre-generated
seeds cycled) and the loop is closed by a host readback — on the axon
backend, block_until_ready on repeated identical dispatches reports
fantasy numbers (see bench/stages.py history).

Run:  python -m bench.traversal            (pretty table + JSON line)
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', os.environ.get(
    'JAX_COMPILATION_CACHE_DIR',
    os.path.join(os.path.dirname(__file__), '..', '.jax_cache')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

SCENE = '/root/reference/regression/0010_pt/test.nra2'
W, H = 1024, 576
N_SETS = 3


def _timeit(f, arg_sets, reps: int = 9):
    out = f(*arg_sets[0])
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.time()
    outs = []
    for i in range(reps):
        outs.append(f(*arg_sets[i % len(arg_sets)]))
    _ = sum(float(jnp.asarray(o).ravel()[0]) for o in outs)
    return (time.time() - t0) / reps


def make_rays(sc, seed):
    """(primary org/dir, bounce org/dir, shadow org/dir/tmax) on device."""
    from corona13_tpu.models import camera as camera_mod
    from corona13_tpu.models import shading as shading_mod
    from corona13_tpu.models import lights as lights_mod
    from corona13_tpu.ops import rng
    from corona13_tpu.ops.trace import intersect
    from corona13_tpu.utils.math import ray_offset, dot

    n = W * H

    @jax.jit
    def gen(s):
        pixel_idx = jnp.arange(n, dtype=jnp.uint32)
        jx = rng.sample_dim('rand', pixel_idx, s, int(rng.Dim.IMAGE_X), 0)
        jy = rng.sample_dim('rand', pixel_idx, s, int(rng.Dim.IMAGE_Y), 0)
        pix_i = (pixel_idx % W).astype(jnp.float32) + jx
        pix_j = (pixel_idx // W).astype(jnp.float32) + jy
        org, d, _, _ = camera_mod.sample(sc.camera, W, H, pix_i, pix_j,
                                         jx, jy, jx * 0)
        hit = intersect(sc.geom, org, d)
        x = org + hit.t[..., None] * d
        lam = jnp.full((n, 1), 550.0)
        sp = shading_mod.prepare(sc, hit, x, d, lam)
        # cosine-hemisphere bounce around the shading normal
        r1 = rng.sample_dim('rand', pixel_idx, s, 17, 0)
        r2 = rng.sample_dim('rand', pixel_idx, s, 18, 0)
        phi = 2.0 * jnp.pi * r1
        sr = jnp.sqrt(r2)
        t1 = jnp.cross(sp.n, jnp.where(jnp.abs(sp.n[:, :1]) < 0.9,
                                       jnp.array([1.0, 0.0, 0.0]),
                                       jnp.array([0.0, 1.0, 0.0])))
        t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
        t2 = jnp.cross(sp.n, t1)
        wo = (sr * jnp.cos(phi))[:, None] * t1 + \
            (sr * jnp.sin(phi))[:, None] * t2 + \
            jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))[:, None] * sp.n
        alive = hit.valid
        borg = jnp.where(alive[:, None], ray_offset(x, wo), org)
        bt = jnp.where(alive, jnp.float32(3.4e38), 0.0)
        # shadow rays towards a sampled emitter point
        ls = lights_mod.sample_nee(
            sc.lights, sc.geom, x,
            rng.sample_dim('rand', pixel_idx, s, 19, 0),
            rng.sample_dim('rand', pixel_idx, s, 20, 0),
            rng.sample_dim('rand', pixel_idx, s, 21, 0))
        to_l = ls['pos'] - x
        dist = jnp.sqrt(jnp.maximum(dot(to_l, to_l), 1e-20))
        wl = to_l / dist[:, None]
        st = jnp.where(alive, dist * (1.0 - 1e-3), 0.0)
        return (org, d, borg, wo, bt, hit.prim, st, wl)

    return jax.block_until_ready(gen(jnp.uint32(seed))), n


def sort_rays(sc, org, d, t, prim):
    """Coherence sort: key = (direction octant << 30) | origin morton."""

    @jax.jit
    def srt(org, d, t, prim):
        root = sc.geom.tri_bvh.nodes[0]
        lo, hi = root[0:3], root[3:6]
        g = jnp.clip((org - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0)
        gi = (g * 1023).astype(jnp.int32)

        def spread(x):
            x = (x | (x << 16)) & 0x030000FF
            x = (x | (x << 8)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x
        morton = (spread(gi[:, 0]) | (spread(gi[:, 1]) << 1)
                  | (spread(gi[:, 2]) << 2))
        octant = ((d[:, 0] > 0).astype(jnp.int32)
                  | ((d[:, 1] > 0).astype(jnp.int32) << 1)
                  | ((d[:, 2] > 0).astype(jnp.int32) << 2))
        # dead lanes (t == 0) last so live packets stay dense
        key = jnp.where(t > 0, (octant << 27) | (morton >> 3),
                        jnp.int32(0x7fffffff))
        cols = jax.lax.sort((key, org[:, 0], org[:, 1], org[:, 2],
                             d[:, 0], d[:, 1], d[:, 2], t, prim),
                            num_keys=1)
        return (jnp.stack(cols[1:4], -1), jnp.stack(cols[4:7], -1),
                cols[7], cols[8])

    return jax.block_until_ready(srt(org, d, t, prim))


def main():
    from corona13_tpu import scene as scene_mod
    from corona13_tpu.ops.trace import intersect, occluded

    sc, _ = scene_mod.load_scene(SCENE)
    sc = scene_mod.fit_film(sc, W, H)
    sets = [make_rays(sc, s)[0] for s in range(N_SETS)]
    n = W * H
    n_alive = int(jnp.sum(sets[0][4] > 0))

    prim = jax.jit(lambda o, w: intersect(sc.geom, o, w).t.sum())
    bnc = jax.jit(lambda o, w, t, ig: intersect(
        sc.geom, o, w, ignore_prim=ig, t_max=t).t.sum())
    shdw = jax.jit(lambda o, w, t, ig: occluded(
        sc.geom, o, w, t, ignore_prim=ig).sum())

    t_p = _timeit(prim, [(s[0], s[1]) for s in sets])
    t_b = _timeit(bnc, [(s[2], s[3], s[4], s[5]) for s in sets])
    sorted_sets = [sort_rays(sc, s[2], s[3], s[4], s[5]) for s in sets]
    t_bs = _timeit(bnc, sorted_sets)
    t_s = _timeit(shdw, [(s[2], s[7], s[6], s[5]) for s in sets])

    rows = [
        ('coherent  (primary)', n, t_p),
        ('incoherent (bounce)', n_alive, t_b),
        ('sorted     (bounce)', n_alive, t_bs),
        ('shadow    (any-hit)', n_alive, t_s),
    ]
    for name, cnt, dt in rows:
        print(f'{name}: {cnt/1e3:8.0f}k rays  {dt*1e3:7.2f} ms '
              f'-> {cnt/dt/1e6:7.1f} Mrays/s', flush=True)
    print(json.dumps({
        'metric': 'traversal Mrays/s (coherent/bounce/sorted/shadow)',
        'coherent': round(n / t_p / 1e6, 1),
        'bounce': round(n_alive / t_b / 1e6, 1),
        'sorted_bounce': round(n_alive / t_bs / 1e6, 1),
        'shadow': round(n_alive / t_s / 1e6, 1),
    }))


if __name__ == '__main__':
    main()
