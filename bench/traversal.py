"""Traversal kernel microbenchmark on the 0010_pt regression scene.

Measures the ray-intersection kernel in isolation (the hot loop of every
sampler, reference analogue src/accel.d/qbvhmp.c:1262-1389):

  * coherent:   one closest-hit pass over the 1024x576 primary wavefront
  * incoherent: closest-hit on diffuse-bounce rays from the primary hits
                (cosine-hemisphere around the shading normal — the worst
                realistic divergence a PT wavefront produces)
  * shadow:     any-hit occlusion rays from the primary hits towards a
                sampled emitter point

Run:  python -m bench.traversal            (pretty table + JSON line)

Round-3 target (VERDICT.md): >= 40 Mrays/s on bounce rays.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

SCENE = '/root/reference/regression/0010_pt/test.nra2'
W, H = 1024, 576


def _timeit(f, *args, reps: int = 10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def make_rays(sc):
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

    return gen(jnp.uint32(0)), n


def main():
    from corona13_tpu import scene as scene_mod
    from corona13_tpu.ops.trace import intersect, occluded

    sc, _ = scene_mod.load_scene(SCENE)
    sc = scene_mod.fit_film(sc, W, H)
    (org, d, borg, bdir, bt, bprim, st, sdir), n = make_rays(sc)
    n_alive = int(jnp.sum(bt > 0))

    prim = jax.jit(lambda o, w: intersect(sc.geom, o, w).t.sum())
    bnc = jax.jit(lambda o, w, t, ig: intersect(
        sc.geom, o, w, ignore_prim=ig, t_max=t).t.sum())
    shdw = jax.jit(lambda o, w, t, ig: occluded(
        sc.geom, o, w, t, ignore_prim=ig).sum())

    t_p = _timeit(prim, org, d)
    t_b = _timeit(bnc, borg, bdir, bt, bprim)
    t_s = _timeit(shdw, borg, sdir, st, bprim)

    rows = [
        ('coherent  (primary)', n, t_p),
        ('incoherent (bounce)', n_alive, t_b),
        ('shadow    (any-hit)', n_alive, t_s),
    ]
    for name, cnt, dt in rows:
        print(f'{name}: {cnt/1e3:8.0f}k rays  {dt*1e3:7.2f} ms '
              f'-> {cnt/dt/1e6:7.1f} Mrays/s')
    print(json.dumps({
        'metric': 'traversal Mrays/s (coherent/bounce/shadow)',
        'coherent': round(n / t_p / 1e6, 1),
        'bounce': round(n_alive / t_b / 1e6, 1),
        'shadow': round(n_alive / t_s / 1e6, 1),
    }))


if __name__ == '__main__':
    main()
