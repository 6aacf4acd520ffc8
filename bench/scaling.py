"""Multi-chip scaling benchmark: rays/s vs device count.

BASELINE.md target: >= 85% rays/s efficiency scaling 1 chip -> N hosts.
Real multi-chip hardware is not available in this environment, so the
harness measures on the virtual CPU mesh (XLA_FLAGS
--xla_force_host_platform_device_count) — the same code path
(shard_map over the ('sp', 'px') mesh, psum framebuffer reduction,
parallel/shard.py) that runs on a pod slice; only the per-device compute
speed is wrong.  The printed efficiency measures what the *framework* adds
(collective + sharding overhead), which is the controllable part.

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python -m bench.scaling

Prints one JSON line: rays/s per device count + parallel efficiency vs
the single-device run.
"""

from __future__ import annotations

import json
import os
import time

if __name__ == '__main__' and 'xla_force_host_platform_device_count' not in \
        os.environ.get('XLA_FLAGS', ''):
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_force_host_platform_device_count=8')
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import jax

# the axon TPU plugin registers itself regardless of JAX_PLATFORMS; pin the
# default device so the pallas fast paths detect the CPU mesh (conftest.py)
try:
    jax.config.update('jax_default_device', jax.devices('cpu')[0])
except RuntimeError:
    pass

import jax.numpy as jnp


def measure(n_devices: int, reps: int = 4):
    from corona13_tpu import testing
    from corona13_tpu.parallel import shard
    from corona13_tpu.samplers import pt as pt_mod

    devices = jax.devices('cpu')[:n_devices]
    n_sp = 2 if n_devices >= 4 and n_devices % 2 == 0 else 1
    mesh = shard.make_mesh(n_sp=n_sp, n_px=n_devices // n_sp,
                           devices=devices)
    scene = testing.cornell_scene(sphere='diffuse')
    w = 32 * mesh.shape['px']        # keep per-device work constant-ish
    cfg = pt_mod.PTConfig(width=256, height=128, max_verts=6, mf=2)
    del w

    step = jax.jit(lambda s: shard.render_samples_sharded(scene, cfg, mesh, s))
    fb = step(jnp.uint32(0))
    fb.block_until_ready()
    t0 = time.time()
    for i in range(1, reps + 1):
        fb = step(jnp.uint32(i))
    fb.block_until_ready()
    dt = (time.time() - t0) / reps
    # rays per progression-sweep: n_sp progressions x ~(max_verts-1 + NEE)
    # rays per pixel; use the honest counter from the pt sampler
    n = cfg.width * cfg.height
    rays1 = int(pt_mod.count_rays(scene, cfg, jnp.uint32(1),
                                  jnp.arange(n, dtype=jnp.uint32)))
    rays = rays1 * mesh.shape['sp']
    return rays / dt


def main():
    counts = [1, 2, 4, 8]
    counts = [c for c in counts if c <= len(jax.devices('cpu'))]
    out = {}
    base = None
    for c in counts:
        rps = measure(c)
        if base is None:
            base = rps
        out[str(c)] = {'rays_per_s': round(rps / 1e6, 3),
                       'efficiency': round(rps / (base * c), 3)}
        print(f'{c} devices: {rps/1e6:8.2f} Mrays/s  '
              f'efficiency {rps/(base*c)*100:6.1f}%')
    print(json.dumps({'metric': 'scaling efficiency (virtual mesh)',
                      'per_device_count': out,
                      'target': 0.85}))


if __name__ == '__main__':
    main()
