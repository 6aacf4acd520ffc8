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

# persistent compile cache: the compacting wavefront unrolls the bounce
# loop, whose first compile through the axon remote-compile tunnel is
# minutes — cache it next to the repo so driver reruns start warm
jax.config.update('jax_compilation_cache_dir', os.environ.get(
    'JAX_COMPILATION_CACHE_DIR',
    os.path.join(os.path.dirname(os.path.abspath(__file__)), '.jax_cache')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

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

    # auto-derive a wavefront-compaction schedule from the measured
    # per-depth occupancy (alive_profile): capacity = 1.3x the alive
    # fraction, so stochastic capping almost never triggers, while dead
    # lanes stop paying dense traversal/shading blocks
    if os.environ.get('BENCH_COMPACT', '0') == '1':
        import numpy as np
        t0 = time.time()
        prof = np.asarray(pt_mod.alive_profile(sc, cfg, jnp.uint32(1)),
                          np.float64)
        frac = prof / (cfg.width * cfg.height)
        caps = np.clip(np.ceil(frac * 1.3 * 64) / 64, 1.0 / 64, 1.0)
        caps[0] = 1.0
        # coarsen to <= 3 distinct capacities: the compact driver compiles
        # one scan segment per distinct value (compile time through the
        # remote-compile tunnel scales with segment count).  Keep the
        # leading run of full-width depths, then split the shrinking tail
        # into two max-pooled groups.
        lead = 0
        while lead < len(caps) and caps[lead] >= 0.999:
            lead += 1
        tail = caps[lead:]
        if len(tail) > 2:
            half = (len(tail) + 1) // 2
            tail[:half] = tail[:half].max()
            tail[half:] = tail[half:].max()
            caps[lead:] = tail
        cfg = cfg.replace(compact=tuple(float(c) for c in caps))
        print(f'[bench] occupancy {np.round(frac, 3).tolist()} -> caps '
              f'{caps.tolist()} ({time.time() - t0:.0f}s)', file=sys.stderr,
              flush=True)
    if cfg.compact is not None:
        # multi-launch segments: one jitted program per capacity segment
        # (the fused compact program wedges the remote compiler)
        stepper = pt_mod.make_segmented_renderer(sc, cfg)
        step = lambda s: stepper(int(s))[0]  # noqa: E731
    else:
        step = jax.jit(lambda s: pt_mod.render_sample(sc, cfg, s))
    t0 = time.time()
    fb = step(jnp.uint32(0))
    fb.block_until_ready()
    print(f'[bench] step compiled in {time.time() - t0:.0f}s',
          file=sys.stderr, flush=True)

    reps = 8
    t0 = time.time()
    for s in range(1, reps + 1):
        fb = fb + step(jnp.uint32(s))
    fb.block_until_ready()
    dt = (time.time() - t0) / reps

    if cfg.compact is not None:
        rays = int(stepper(1)[1])
    else:
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
