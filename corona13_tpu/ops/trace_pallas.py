"""Pallas TPU packet BVH traversal.

The speed-of-light path for ray intersection: the XLA while-loop traversal
in ops/trace.py streams the whole wavefront's state through HBM on every
node step; this kernel instead keeps a tile of rays (TILE = 8x128 = 1024)
plus the entire BVH and packed leaf data resident in VMEM and walks a
per-tile shared traversal stack in SMEM with scalar control flow — the
Aila-Laine packet kernel re-expressed for the VPU:

  * one node is processed per iteration for all 1024 rays of the tile at
    once (dense slab test, scalar node data broadcast from VMEM);
  * subtrees no ray in the tile touches are skipped via the scalar stack —
    the divergence cost is the *union* traversal of the tile, which is why
    callers should keep tiles coherent (primary rays are; bounce
    wavefronts stay image-tiled);
  * leaf tests run the LEAF_SIZE=8 candidate triangles on the sublane
    axis against 128-ray lane chunks — dense (8, 128) Moeller-Trumbore.

Only triangle BVHs go through this kernel (spheres/lines are rare and
stay on the XLA path).  Scenes whose BVH + leaf data exceed the VMEM
budget fall back to ops/trace.py as well.

Reference analogue: corona-13 src/accel.d/qbvhmp.c:1262-1389 (SIMD QBVH
traversal with per-thread stack).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024          # rays per grid step (8 sublanes x 128 lanes)
SUB = 8
LANE = 128
MAX_STACK = 64
LEAF = 8             # must match ops/bvh.LEAF_SIZE
# VMEM budget for nodes + leaf data before falling back to the XLA path
VMEM_BYTES_LIMIT = 10 * 1024 * 1024


def _kernel(nodes_ref, links_ref, leaf_data_ref, leaf_prims_ref,
            ox_ref, oy_ref, oz_ref, ix_ref, iy_ref, iz_ref,
            dx_ref, dy_ref, dz_ref, t0_ref, ig_ref, ig2_ref,
            t_out, prim_out, u_out, v_out, slot_out,
            stack_ref, *, any_hit: bool):
    ox = ox_ref[:].reshape(SUB, LANE)
    oy = oy_ref[:].reshape(SUB, LANE)
    oz = oz_ref[:].reshape(SUB, LANE)
    ix = ix_ref[:].reshape(SUB, LANE)
    iy = iy_ref[:].reshape(SUB, LANE)
    iz = iz_ref[:].reshape(SUB, LANE)
    dx = dx_ref[:].reshape(SUB, LANE)
    dy = dy_ref[:].reshape(SUB, LANE)
    dz = dz_ref[:].reshape(SUB, LANE)
    ig = ig_ref[:].reshape(SUB, LANE)
    ig2 = ig2_ref[:].reshape(SUB, LANE)

    t = t0_ref[:].reshape(SUB, LANE)
    prim = jnp.full((SUB, LANE), -1, jnp.int32)
    u = jnp.zeros((SUB, LANE), jnp.float32)
    v = jnp.zeros((SUB, LANE), jnp.float32)
    slot = jnp.full((SUB, LANE), -1, jnp.int32)  # leaf-major slot of the hit

    stack_ref[0] = 0  # root

    def leaf_test(leaf, t, prim, u, v, slot):
        rows = leaf_data_ref[leaf]                       # [LEAF * 9]
        cand = leaf_prims_ref[leaf]                      # [LEAF]
        for k in range(LEAF):
            o = 9 * k
            v0x, v0y, v0z = rows[o + 0], rows[o + 1], rows[o + 2]
            e1x, e1y, e1z = rows[o + 3], rows[o + 4], rows[o + 5]
            e2x, e2y, e2z = rows[o + 6], rows[o + 7], rows[o + 8]
            ck = cand[k]
            # Moeller-Trumbore, scalar prim data vs (SUB, LANE) rays
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) < 1e-20, 0.0, 1.0 / det)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            bv = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            bu = (dx * qx + dy * qy + dz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = ((bv >= 0.0) & (bv <= 1.0) & (bu >= 0.0) & (bu + bv <= 1.0)
                  & (tt > 0.0) & (tt < t) & (ck >= 0) & (ck != ig)
                  & (ck != ig2))
            t = jnp.where(ok, tt, t)
            prim = jnp.where(ok, ck, prim)
            u = jnp.where(ok, bu, u)
            v = jnp.where(ok, bv, v)
            if not any_hit:  # shadow rays don't shade: skip slot tracking
                slot = jnp.where(ok, leaf * LEAF + k, slot)
        return t, prim, u, v, slot

    def cond(carry):
        sp, t, prim, u, v, slot = carry
        live = sp > 0
        if any_hit:
            live = live & ~jnp.all(prim >= 0)
        return live

    def body(carry):
        sp, t, prim, u, v, slot = carry
        node = stack_ref[sp - 1]
        row = nodes_ref[node]                            # [8]
        # slab test against current best t
        t0x = (row[0] - ox) * ix
        t1x = (row[3] - ox) * ix
        t0y = (row[1] - oy) * iy
        t1y = (row[4] - oy) * iy
        t0z = (row[2] - oz) * iz
        t1z = (row[5] - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), t))
        hit_mask = tn <= tf
        if any_hit:
            hit_mask = hit_mask & (prim < 0)
        n_hit = jnp.sum(hit_mask.astype(jnp.int32))
        left = links_ref[node, 0]
        right = links_ref[node, 1]
        is_leaf = left < 0
        any_ray = n_hit > 0

        t, prim, u, v, slot = jax.lax.cond(
            is_leaf & any_ray,
            lambda t, prim, u, v, slot: leaf_test(-left - 1, t, prim, u, v,
                                                  slot),
            lambda t, prim, u, v, slot: (t, prim, u, v, slot),
            t, prim, u, v, slot)

        do_push = any_ray & ~is_leaf

        @pl.when(do_push)
        def _():
            stack_ref[sp - 1] = right
            stack_ref[sp] = left

        sp = jnp.where(do_push, sp + 1, sp - 1)
        return sp, t, prim, u, v, slot

    _, t, prim, u, v, slot = jax.lax.while_loop(
        cond, body, (jnp.int32(1), t, prim, u, v, slot))

    t_out[:] = t.reshape(TILE)
    prim_out[:] = prim.reshape(TILE)
    u_out[:] = u.reshape(TILE)
    v_out[:] = v.reshape(TILE)
    slot_out[:] = slot.reshape(TILE)


def _pad(x, n_pad, fill):
    return jnp.concatenate(
        [x, jnp.full((n_pad,) + x.shape[1:], fill, x.dtype)]) if n_pad else x


@functools.partial(jax.jit, static_argnames=('any_hit', 'interpret'))
def traverse_tris(pnodes, plinks, leaf_data, leaf_prims, org, direction, t_init,
                  ignore_prim, ignore_prim2=None, any_hit=False,
                  interpret=False):
    """Closest-hit (or any-hit) triangle traversal for a ray wavefront.

    pnodes: [n_nodes, 8] packet node layout (DeviceBVH.pnodes);
    org/direction [N, 3]; t_init [N] (max distance); ignore_prim [N] i32.
    Returns (t, prim, u, v) with prim = -1 for misses (any_hit: prim >= 0
    marks blocked lanes).
    """
    n = org.shape[0]
    n_leaves = leaf_prims.shape[0] // LEAF
    leaf_data = leaf_data.reshape(n_leaves, LEAF * leaf_data.shape[-1])
    leaf_prims = leaf_prims.reshape(n_leaves, LEAF)
    n_pad = (-n) % TILE
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-20,
                          jnp.where(direction < 0, -1e-20, 1e-20), direction)
    if ignore_prim2 is None:
        ignore_prim2 = jnp.full((n,), -1, jnp.int32)
    args = [org[:, 0], org[:, 1], org[:, 2],
            inv[:, 0], inv[:, 1], inv[:, 2],
            direction[:, 0], direction[:, 1], direction[:, 2],
            t_init, ignore_prim, ignore_prim2]
    # padded lanes get t_init = 0 -> slab test fails everywhere -> no work
    fills = [0., 0., 0., 0., 0., 0., 0., 0., 0., 0., -1, -1]
    args = [_pad(a.astype(jnp.int32) if i >= 10 else a.astype(jnp.float32),
                 n_pad, fills[i]) for i, a in enumerate(args)]
    n_tiles = (n + n_pad) // TILE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),   # nodes
                  pl.BlockSpec(memory_space=pltpu.VMEM),   # links
                  pl.BlockSpec(memory_space=pltpu.VMEM),   # leaf_data
                  pl.BlockSpec(memory_space=pltpu.VMEM)]   # leaf_prims
        + [pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)
           for _ in range(12)],
        out_specs=[pl.BlockSpec((TILE,), lambda i: (i,),
                                memory_space=pltpu.VMEM) for _ in range(5)],
        scratch_shapes=[pltpu.SMEM((MAX_STACK,), jnp.int32)],
    )
    out_shape = [
        jax.ShapeDtypeStruct((n + n_pad,), jnp.float32),
        jax.ShapeDtypeStruct((n + n_pad,), jnp.int32),
        jax.ShapeDtypeStruct((n + n_pad,), jnp.float32),
        jax.ShapeDtypeStruct((n + n_pad,), jnp.float32),
        jax.ShapeDtypeStruct((n + n_pad,), jnp.int32),
    ]
    t, prim, u, v, slot = pl.pallas_call(
        functools.partial(_kernel, any_hit=any_hit),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(pnodes, plinks, leaf_data, leaf_prims, *args)
    return t[:n], prim[:n], u[:n], v[:n], slot[:n]


def fits_vmem(bvh) -> bool:
    b = (bvh.pnodes.size + bvh.plinks.size + bvh.leaf_data.size
         + bvh.leaf_prims.size) * 4
    return b <= VMEM_BYTES_LIMIT
