"""Headline benchmark: Mrays/s/chip on the regression 0010_pt scene.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 80 Mrays/s/chip (BASELINE.md).  Ray counting matches the
reference's notion of traced rays: one extension ray per alive path vertex
plus one shadow ray per NEE attempt (alive, ptdl technique) — i.e. rays
that do BVH work, not padded lanes.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_MRAYS = 80.0
SCENE = '/root/reference/regression/0010_pt/test.nra2'


def count_rays(scene, cfg, sample_idx):
    """Alive extension + shadow rays for one progression (host replay of
    the alive-mask logic at the same sample index)."""
    from corona13_tpu.samplers import pt as pt_mod
    n = cfg.width * cfg.height
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)
    stats = pt_mod.count_rays(scene, cfg, sample_idx, pixel_idx)
    return int(stats)


def main():
    from corona13_tpu import scene as scene_mod
    from corona13_tpu import testing
    from corona13_tpu.samplers import pt as pt_mod

    if os.path.exists(SCENE):
        sc, _ = scene_mod.load_scene(SCENE)
    else:
        sc = testing.cornell_scene(sphere='diffuse')

    cfg = pt_mod.PTConfig(width=1024, height=576, max_verts=6, mf=4,
                          use_nee=True)
    sc = scene_mod.fit_film(sc, cfg.width, cfg.height)
    step = jax.jit(lambda s: pt_mod.render_sample(sc, cfg, s))
    fb = step(jnp.uint32(0))
    fb.block_until_ready()

    reps = 8
    t0 = time.time()
    for s in range(1, reps + 1):
        fb = fb + step(jnp.uint32(s))
    fb.block_until_ready()
    dt = (time.time() - t0) / reps

    rays = count_rays(sc, cfg, jnp.uint32(1))
    mrays = rays / dt / 1e6
    print(json.dumps({
        'metric': 'Mrays/s/chip on 0010_pt',
        'value': round(mrays, 2),
        'unit': 'Mrays/s',
        'vs_baseline': round(mrays / BASELINE_MRAYS, 3),
    }))


if __name__ == '__main__':
    main()
