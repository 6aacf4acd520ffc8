"""Multi-chip rendering: image/sample sharding over a device mesh.

The reference is a single-node pthread renderer (its only parallel axis is
the atomic sample counter, corona-13 include/threads.h:31-34 +
src/view.c:618-645).  The TPU-native design scales the same two axes over
an ICI mesh instead:

  * ``px``: the pixel wavefront is sharded — each device traces a
    contiguous chunk of the image's paths (the analogue of threads pulling
    sample indices), splats into a device-local framebuffer, and the
    framebuffers are summed with ``psum`` (the analogue of the atomic FB
    splats, corona_common.h:316-343 — but deterministic).
  * ``sp``: independent progressions (sample indices) run data-parallel,
    like the reference's ``--batch N`` progressions per display sync
    (src/main.c:268-276).

The scene (geometry, BVH, materials) is replicated per device, matching
the reference's shared address space.  Everything is a single jitted
``shard_map`` so XLA overlaps the trace compute with the FB reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..samplers import pt as pt_mod
from ..spectral import cie
from ..ops import splat as splat_mod


def make_mesh(n_sp: int = 1, n_px: int | None = None, devices=None) -> Mesh:
    """Mesh with axes ('sp', 'px'): sample-parallel x pixel-parallel."""
    devices = devices if devices is not None else jax.devices()
    if n_px is None:
        n_px = len(devices) // n_sp
    dev = np.asarray(devices[:n_sp * n_px]).reshape(n_sp, n_px)
    return Mesh(dev, axis_names=('sp', 'px'))


def render_samples_sharded(scene, cfg: pt_mod.PTConfig, mesh: Mesh,
                           sample_base):
    """Render one progression per 'sp' mesh row, pixels sharded over 'px'.

    Returns the [H, W, 3] XYZ accumulation summed over the whole mesh
    (i.e. ``sp_size`` progressions worth of unnormalized splats),
    replicated on every device.
    """
    n = cfg.width * cfg.height
    n_px = mesh.shape['px']
    n_sp = mesh.shape['sp']
    if n % n_px:
        raise ValueError(f'pixel count {n} not divisible by px axis {n_px}')
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)
    sp_ids = jnp.arange(n_sp, dtype=jnp.uint32)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P('sp'), P('px')), out_specs=P())
    def work(sc, sp_id, pix):
        sidx = jnp.uint32(sample_base) * jnp.uint32(n_sp) + sp_id[0]
        accum, lam, pi, pj = pt_mod.sample_paths(sc, cfg, sidx, pix)
        accum = jnp.where(jnp.isfinite(accum), accum, 0.0)
        xyz = cie.spectral_to_xyz(lam, accum)
        fb = splat_mod.splat(jnp.zeros((cfg.height, cfg.width, 3)), pi, pj, xyz)
        return jax.lax.psum(fb, ('sp', 'px'))

    return work(scene, sp_ids, pixel_idx)


def train_step(scene, cfg: pt_mod.PTConfig, mesh: Mesh, target, theta,
               sample_base=0):
    """One differentiable-rendering optimization step over the mesh.

    The flagship 'training step' of this framework: render with material
    parameters scaled by ``theta`` (pytree with ``d_mul``/``e_mul``
    multipliers), L2 loss against ``target`` [H, W, 3], gradients
    all-reduced implicitly by the shard_map transpose.  Returns
    (loss, grads) — exactly the inverse-rendering loop of the
    differentiability north star (BASELINE.md).
    """
    spp = mesh.shape['sp']

    def loss_fn(th):
        mats = scene.materials.replace(
            d_mul=scene.materials.d_mul * th['d_mul'],
            e_mul=scene.materials.e_mul * th['e_mul'])
        sc = scene.replace(materials=mats)
        fb = render_samples_sharded(sc, cfg, mesh, sample_base)
        img = fb * (scene.camera.iso / (100.0 * spp))
        return jnp.mean((img - target) ** 2)

    return jax.value_and_grad(loss_fn)(theta)


def apply_theta(scene, theta):
    """Apply a realistic inverse-rendering parameter pytree to the scene:
    per-material albedo multipliers (the 'albedo map' of the optimization),
    a medium extinction scale, emission scale, and camera focus — the
    shader/medium/camera parameter classes of the BASELINE gradient gate."""
    mats = scene.materials.replace(
        d_mul=scene.materials.d_mul * theta['d_mul'],
        e_mul=scene.materials.e_mul * theta['e_mul'],
        med_mut_mul=scene.materials.med_mut_mul * theta['med_sigma'])
    cam = scene.camera.replace(focus=scene.camera.focus * theta['focus'])
    return scene.replace(materials=mats, camera=cam)


def train_step_theta(scene, cfg: pt_mod.PTConfig, mesh: Mesh, target, theta,
                     sample_base=0):
    """value_and_grad of the L2 loss w.r.t. the full ``apply_theta`` pytree
    (albedo vector + medium sigma_t + emission + focus), rendered over the
    mesh.  The shard_map transpose all-reduces the parameter gradients.
    Returns ((loss, rendered_img), grads) — the image rides along for
    checkpointing without a second render."""
    spp = mesh.shape['sp']

    def loss_fn(th):
        sc = apply_theta(scene, th)
        fb = render_samples_sharded(sc, cfg, mesh, sample_base)
        img = fb * (scene.camera.iso / (100.0 * spp))
        return jnp.mean((img - target) ** 2), img

    return jax.value_and_grad(loss_fn, has_aux=True)(theta)
