"""Pallas TPU wide-BVH packet traversal.

The hot kernel of the renderer.  Design (round 4 — replaces the binary
one-node-per-iteration packet kernel, whose runtime was >90% per-iteration
overhead):

  * **BVH8 on the sublane axis**: a tile is 128 rays on the VPU *lanes*;
    each traversal step pops one wide node and slab-tests its 8 children
    on the *sublanes* — one (8, 128) vector op covers 8 boxes x 128 rays,
    so a step advances the frontier 8 ways for the same vector cost the
    old kernel paid to advance it 2 ways.  This is the reference's 4-wide
    SSE QBVH test (src/accel.d/qbvhmp.c:1189-1224) re-sized to the VPU.
  * **Scalar-only control state**: the while-loop carry is four scalars
    (stack pointer, open-lane count, counters); all per-ray state
    (t/prim/u/v/slot) lives in VMEM scratch refs mutated in place, so no
    vector carries are copied per iteration.
  * **Branchless stack pushes**: child-hit masks are reduced to one
    scalar bitmask via weight columns baked into the node block
    (w_inner/w_leaf = 2^c), then all 8 children are pushed with
    unconditional scalar stores at prefix-sum offsets — dead children
    write above the stack top and are never read.
  * **Leaves on sublanes too**: a leaf is 8 triangles; the leaf step runs
    dense (8, 128) Moeller-Trumbore with the triangle data as (8, 1)
    column slices of one row load — zero masking waste.
  * Child links live in SMEM (scalar-prefetch operand): traversal control
    flow is pure scalar-unit work overlapped with the VPU slab test.

Union-traversal counters (node steps, leaf steps) are accumulated per
grid step and written to a side output — the analogue of the reference's
ACCEL_DEBUG counters (qbvhmp.c:83-89) — enabled via ``want_counters``.

Scenes whose node/leaf data exceed the VMEM budget fall back to the XLA
skip-link path in ops/trace.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128           # rays per traversal (lane axis)
SUBT = 8             # subtiles per grid step (amortizes grid/DMA overhead)
BLOCK = TILE * SUBT  # rays per grid step
MAX_STACK = 192
from . import bvh as _bvh_mod
LEAF = _bvh_mod.LEAF_SIZE   # tris per leaf (sublane axis of the MT test)
K_MASK = (1 << (LEAF - 1).bit_length()) - 1  # low mantissa bits that
# encode the winning leaf row in the positive-f32 min-reduce trick
INF = 3.0e38
# VMEM budget for node + leaf data before falling back to the XLA path
VMEM_BYTES_LIMIT = 10 * 1024 * 1024
SMEM_LINK_LIMIT = 48 * 1024  # bytes of wlinks allowed in SMEM


def _kernel(wlinks_ref,                      # [Wn*8] i32 (SMEM, prefetched)
            wbounds_ref, leaf_ref,           # VMEM tables
            ox_ref, oy_ref, oz_ref, ix_ref, iy_ref, iz_ref,
            dx_ref, dy_ref, dz_ref, t0_ref, ig_ref, ig2_ref,
            t_out, prim_out, u_out, v_out, slot_out, cnt_out,
            t_scr, u_scr, v_scr, prim_scr, slot_scr, stack_ref,
            *, any_hit: bool, want_counters: bool):
    iters_tot = jnp.int32(0)
    leafs_tot = jnp.int32(0)

    for s in range(SUBT):
        sl = slice(s * TILE, (s + 1) * TILE)
        ox = ox_ref[sl].reshape(1, TILE)
        oy = oy_ref[sl].reshape(1, TILE)
        oz = oz_ref[sl].reshape(1, TILE)
        ix = ix_ref[sl].reshape(1, TILE)
        iy = iy_ref[sl].reshape(1, TILE)
        iz = iz_ref[sl].reshape(1, TILE)
        dx = dx_ref[sl].reshape(1, TILE)
        dy = dy_ref[sl].reshape(1, TILE)
        dz = dz_ref[sl].reshape(1, TILE)
        ig = ig_ref[sl].reshape(1, TILE)
        ig2 = ig2_ref[sl].reshape(1, TILE)

        t_scr[:] = t0_ref[sl].reshape(1, TILE)
        u_scr[:] = jnp.zeros((1, TILE), jnp.float32)
        v_scr[:] = jnp.zeros((1, TILE), jnp.float32)
        prim_scr[:] = jnp.full((1, TILE), -1, jnp.int32)
        slot_scr[:] = jnp.full((1, TILE), -1, jnp.int32)
        stack_ref[0] = 0

        def inner_fn(sp, nopen, entry):
            blk = wbounds_ref[entry]                     # (8, 8)
            t_best = t_scr[:]                            # (1, TILE)
            t0x = (blk[:, 0:1] - ox) * ix                # (8, TILE)
            t1x = (blk[:, 3:4] - ox) * ix
            t0y = (blk[:, 1:2] - oy) * iy
            t1y = (blk[:, 4:5] - oy) * iy
            t0z = (blk[:, 2:3] - oz) * iz
            t1z = (blk[:, 5:6] - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.minimum(jnp.maximum(t0z, t1z), t_best))
            # tf > 0 excludes dead lanes (t_max <= 0) even when the box
            # contains the ray origin (tn == tf == 0)
            hit = (tn <= tf) & (tf > 0.0)                # (8, TILE)
            # per-child any-ray-hit -> one scalar whose low/high bytes are
            # the inner/leaf push bitmasks (weight column w = 2^c inner,
            # 256*2^c leaf, 0 empty)
            w = jnp.where(hit, blk[:, 6:7], 0.0)
            bits = jnp.max(w, axis=1, keepdims=True).sum().astype(jnp.int32)
            bits_i = bits & 0xff
            bits_l = bits >> 8
            # branchless pushes: live children land at prefix-sum offsets,
            # dead ones write above the final top and are never read
            off = jnp.int32(0)
            base = entry * 8
            for c in range(8):
                link = wlinks_ref[base + c]
                bi = (bits_i >> c) & 1
                bl = (bits_l >> c) & 1
                stack_ref[sp + off] = jnp.where(bl == 1, -link - 1, link)
                off = off + bi + bl
            return sp + off, nopen, jnp.int32(1), jnp.int32(0)

        def leaf_fn(sp, nopen, entry):
            lid = -entry - 1
            rows = leaf_ref[lid]                         # (8, 16)
            v0x, v0y, v0z = rows[:, 0:1], rows[:, 1:2], rows[:, 2:3]
            e1x, e1y, e1z = rows[:, 3:4], rows[:, 4:5], rows[:, 5:6]
            e2x, e2y, e2z = rows[:, 6:7], rows[:, 7:8], rows[:, 8:9]
            cand = rows[:, 9:10].astype(jnp.int32)       # (8, 1)
            px = dy * e2z - dz * e2y                     # (8, TILE)
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
            t_best = t_scr[:]
            ok = ((bv >= 0.0) & (bv <= 1.0) & (bu >= 0.0)
                  & (bu + bv <= 1.0) & (tt > 0.0) & (tt < t_best)
                  & (cand >= 0) & (cand != ig) & (cand != ig2))
            if any_hit:
                blocked = jnp.any(ok, axis=0, keepdims=True)  # (1, TILE)
                prim_scr[:] = jnp.where(blocked, 0, prim_scr[:])
                # blocked lanes stop driving the union: t < 0 fails every
                # slab test and leaf candidate from now on
                t_scr[:] = jnp.where(blocked, -1.0, t_best)
                nopen = jnp.sum((prim_scr[:] < 0).astype(jnp.int32))
            else:
                # winner select: positive-f32 bit patterns order like the
                # floats, so burying the sublane index k in the low 3
                # mantissa bits and taking one int-min yields both the
                # best distance and its candidate row
                k_col = jax.lax.broadcasted_iota(jnp.int32, (LEAF, 1), 0)
                enc = jnp.where(
                    ok,
                    (jax.lax.bitcast_convert_type(tt, jnp.int32) & ~K_MASK)
                    | k_col,
                    jnp.int32(0x7f000000))
                best = jnp.min(enc, axis=0, keepdims=True)   # (1, TILE)
                win = best < 0x7f000000
                sel = (k_col == (best & K_MASK)) & win        # (LEAF, TILE)
                fsel = sel.astype(jnp.float32)
                isel = sel.astype(jnp.int32)
                t_w = jnp.sum(tt * fsel, axis=0, keepdims=True)
                u_w = jnp.sum(bu * fsel, axis=0, keepdims=True)
                v_w = jnp.sum(bv * fsel, axis=0, keepdims=True)
                p_w = jnp.sum(cand * isel, axis=0, keepdims=True)
                s_w = jnp.sum(k_col * isel, axis=0, keepdims=True)
                t_scr[:] = jnp.where(win, t_w, t_best)
                prim_scr[:] = jnp.where(win, p_w, prim_scr[:])
                u_scr[:] = jnp.where(win, u_w, u_scr[:])
                v_scr[:] = jnp.where(win, v_w, v_scr[:])
                slot_scr[:] = jnp.where(win, lid * LEAF + s_w, slot_scr[:])
            return sp, nopen, jnp.int32(0), jnp.int32(1)

        def cond(carry):
            sp, nopen, it_, lf = carry
            live = sp > 0
            if any_hit:
                live = live & (nopen > 0)
            return live

        def body(carry):
            sp, nopen, it_, lf = carry
            entry = stack_ref[sp - 1]
            sp = sp - 1
            sp, nopen, di, dl = jax.lax.cond(
                entry >= 0, inner_fn, leaf_fn, sp, nopen, entry)
            return sp, nopen, it_ + di, lf + dl

        _, _, it_s, lf_s = jax.lax.while_loop(
            cond, body, (jnp.int32(1), jnp.int32(TILE), jnp.int32(0),
                         jnp.int32(0)))
        iters_tot = iters_tot + it_s
        leafs_tot = leafs_tot + lf_s

        t_out[sl] = t_scr[:].reshape(TILE)
        prim_out[sl] = prim_scr[:].reshape(TILE)
        u_out[sl] = u_scr[:].reshape(TILE)
        v_out[sl] = v_scr[:].reshape(TILE)
        slot_out[sl] = slot_scr[:].reshape(TILE)

    if want_counters:
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cnt_out[:] = jnp.where(row == 0, iters_tot,
                               jnp.where(row == 1, leafs_tot, 0))
    else:
        cnt_out[:] = jnp.zeros((8, 128), jnp.int32)


def _pad(x, n_pad, fill):
    return jnp.concatenate(
        [x, jnp.full((n_pad,) + x.shape[1:], fill, x.dtype)]) if n_pad else x


@functools.partial(jax.jit,
                   static_argnames=('any_hit', 'interpret', 'want_counters'))
def traverse_tris(wbounds, wlinks, leaf_packed, org, direction, t_init,
                  ignore_prim, ignore_prim2=None, any_hit=False,
                  interpret=False, want_counters=False):
    """Closest-hit (or any-hit) triangle traversal for a ray wavefront.

    wbounds [Wn, 8, 8] / wlinks [Wn*8] from bvh.collapse8;
    leaf_packed [n_leaves, 8, 16] (v0, e1, e2, prim_f32, pad);
    org/direction [N, 3]; t_init [N]; ignore_prim [N] i32.
    Returns (t, prim, u, v, slot) — and (iters, leafs) [n_tiles] arrays
    appended when want_counters.  prim = -1 for misses (any_hit: prim >= 0
    marks blocked lanes).
    """
    n = org.shape[0]
    n_pad = (-n) % BLOCK
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
    n_blocks = (n + n_pad) // BLOCK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),   # wbounds
                  pl.BlockSpec(memory_space=pltpu.VMEM)]   # leaf_packed
        + [pl.BlockSpec((BLOCK,), lambda i, s: (i,), memory_space=pltpu.VMEM)
           for _ in range(12)],
        out_specs=[pl.BlockSpec((BLOCK,), lambda i, s: (i,),
                                memory_space=pltpu.VMEM) for _ in range(5)]
        + [pl.BlockSpec((8, 128), lambda i, s: (i, 0),
                        memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((1, TILE), jnp.float32),
                        pltpu.VMEM((1, TILE), jnp.float32),
                        pltpu.VMEM((1, TILE), jnp.float32),
                        pltpu.VMEM((1, TILE), jnp.int32),
                        pltpu.VMEM((1, TILE), jnp.int32),
                        pltpu.SMEM((MAX_STACK,), jnp.int32)],
    )
    out_shape = [
        jax.ShapeDtypeStruct((n + n_pad,), jnp.float32),
        jax.ShapeDtypeStruct((n + n_pad,), jnp.int32),
        jax.ShapeDtypeStruct((n + n_pad,), jnp.float32),
        jax.ShapeDtypeStruct((n + n_pad,), jnp.float32),
        jax.ShapeDtypeStruct((n + n_pad,), jnp.int32),
        jax.ShapeDtypeStruct((n_blocks * 8, 128), jnp.int32),
    ]
    t, prim, u, v, slot, cnt = pl.pallas_call(
        functools.partial(_kernel, any_hit=any_hit,
                          want_counters=want_counters),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(wlinks, wbounds, leaf_packed, *args)
    out = (t[:n], prim[:n], u[:n], v[:n], slot[:n])
    if want_counters:
        out = out + (cnt[0::8, 0], cnt[1::8, 0])
    return out


def fits_vmem(bvh) -> bool:
    if bvh.wbounds is None:
        return False
    b = (bvh.wbounds.size + bvh.leaf_packed.size) * 4
    return (b <= VMEM_BYTES_LIMIT
            and bvh.wlinks.size * 4 <= SMEM_LINK_LIMIT)
