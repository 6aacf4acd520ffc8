"""Cluster-wavefront ray intersection: cull -> sort -> dense test tiles.

The round-2 packet kernel (ops/trace_pallas.py) walks a shared-stack BVH
per 1024-ray tile, so every tile pays the *union* of its rays' traversals
— measured on 0010_pt bounce rays a tile's cull passes ~40% of the whole
scene (140/365 clusters), capping it at ~5-8 Mrays/s.  This module removes
the union penalty by re-sorting work instead of walking a tree:

  1. cull (XLA, ray-chunked): slab-test every ray against every cluster
     AABB -> per-ray hit bitmask [N, NG] u32.  Clusters are SAH leaves of
     <= CLUSTER triangles (ops/bvh.py native builder).
  2. expand: K rounds of lowest-set-bit extraction -> up to K (ray,
     cluster) pairs per ray.  Rays hitting > K clusters fall back to the
     packet kernel (rare; the fallback wavefront is almost entirely dead
     and exits at the root).
  3. sort pairs by cluster id and pad each cluster's segment to the 1024
     tile size, so every (8, 128) kernel tile is single-cluster.
  4. pair-test kernel (Pallas): the tile's cluster (scalar prefetch)
     against its 1024 rays — dense Moeller-Trumbore, no traversal state,
     no divergence: every lane tests a cluster it actually wants.
  5. reduce: scatter-min winner per ray (+ scatter-or for shadow rays).

The appeal on TPU: stages 1/2/3/5 are dense XLA (sorts measured ~0.2 ms
for 4M keys on v5e), and the only kernel is branch-free dense math.
Reference analogue: the traversal loop of src/accel.d/qbvhmp.c:1262-1389,
re-expressed as wavefront work redistribution.
"""

from __future__ import annotations

import functools

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
TILE = SUB * LANE
CLUSTER = 32          # triangles per cluster (SAH leaf size)
K_SLOTS = 16          # max clusters per ray before fallback
CULL_CHUNKS = 32      # ray chunks for the dense cull (bounds [chunk, C])


@struct.dataclass
class ClusterSet:
    """Device arrays of the clusterized triangle scene."""
    boxes: jnp.ndarray      # [C, 6] AABBs
    tri_data: jnp.ndarray   # [C + 1, CLUSTER * 12] (v0, e1, e2, n); row C = 0
    tri_prim: jnp.ndarray   # [C + 1, CLUSTER] i32 global prim ids, -1 pad
    # leaf-slot-major shading rows (like DeviceBVH.leaf_shade): slot =
    # cluster * CLUSTER + k
    shade: jnp.ndarray      # [(C + 1) * CLUSTER, 17]

    @property
    def n_clusters(self):
        return self.boxes.shape[0]


def build_clusters(tri_v: np.ndarray, tri_shade: np.ndarray | None = None,
                   cluster: int = CLUSTER) -> ClusterSet:
    """SAH-clusterize triangles (tri_v [T, 3, 3]); tri_shade [T, 17]
    optional shading rows copied into slot-major order."""
    import ctypes
    from .. import native
    T = len(tri_v)
    p_min = np.ascontiguousarray(tri_v.min(axis=1), np.float32)
    p_max = np.ascontiguousarray(tri_v.max(axis=1), np.float32)
    lib = native.get_lib()
    if lib is not None and T:
        n_nodes = ctypes.c_int32()
        n_slots = ctypes.c_int32()
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int32)
        h = lib.bvh_build(p_min.ctypes.data_as(fp), p_max.ctypes.data_as(fp),
                          T, cluster, ctypes.byref(n_nodes),
                          ctypes.byref(n_slots))
        nn, ns = n_nodes.value, n_slots.value
        node_min = np.empty((nn, 3), np.float32)
        node_max = np.empty((nn, 3), np.float32)
        node_skip = np.empty(nn, np.int32)
        node_first = np.empty(nn, np.int32)
        node_right = np.empty(nn, np.int32)
        leaf_prims = np.empty(ns, np.int32)
        lib.bvh_finish(h, node_min.ctypes.data_as(fp),
                       node_max.ctypes.data_as(fp),
                       node_skip.ctypes.data_as(ip),
                       node_first.ctypes.data_as(ip),
                       node_right.ctypes.data_as(ip),
                       leaf_prims.ctypes.data_as(ip))
        sel = node_first >= 0
        boxes = np.concatenate([node_min[sel], node_max[sel]], axis=1)
        prims = leaf_prims.reshape(-1, cluster)[node_first[sel] // cluster]
    else:
        # numpy fallback: chunk primitives in Morton order of centroids
        if T == 0:
            boxes = np.zeros((0, 6), np.float32)
            prims = np.zeros((0, cluster), np.int64)
        else:
            cent = 0.5 * (p_min + p_max)
            order = np.argsort(
                _morton3(cent, p_min.min(axis=0), p_max.max(axis=0)))
            pad = (-T) % cluster
            prims = np.concatenate([order, np.full(pad, -1)]).reshape(
                -1, cluster)
            boxes = np.stack([
                np.where((prims >= 0).any(1)[:, None],
                         np.array([np.min(p_min[p[p >= 0]], axis=0)
                                   for p in prims]), 0).astype(np.float32),
                np.where((prims >= 0).any(1)[:, None],
                         np.array([np.max(p_max[p[p >= 0]], axis=0)
                                   for p in prims]), 0).astype(np.float32),
            ], axis=1).reshape(-1, 6)

    C = len(boxes)
    p = np.maximum(prims, 0)
    v = tri_v[p] if T else np.zeros((C, cluster, 3, 3), np.float32)
    v0 = v[..., 0, :]
    e1 = v[..., 1, :] - v0
    e2 = v[..., 2, :] - v0
    nrm = np.cross(e1, e2)
    dead = prims < 0
    e1 = np.where(dead[..., None], 0.0, e1)   # degenerate -> det = 0
    data = np.concatenate([v0, e1, e2, nrm], axis=-1).astype(np.float32)
    data = data.reshape(C, cluster * 12)
    data = np.concatenate([data, np.zeros((1, cluster * 12), np.float32)])
    prims_p = np.concatenate([prims, np.full((1, cluster), -1)], axis=0)
    if tri_shade is None:
        tri_shade = np.zeros((max(T, 1), 17), np.float32)
    shade = tri_shade[p.reshape(-1)].astype(np.float32)
    shade = np.concatenate([shade, np.zeros((cluster, 17), np.float32)])
    return ClusterSet(boxes=jnp.asarray(boxes.astype(np.float32)),
                      tri_data=jnp.asarray(data),
                      tri_prim=jnp.asarray(prims_p.astype(np.int32)),
                      shade=jnp.asarray(shade))


def _morton3(cent, lo, hi):
    q = np.clip((cent - lo) / np.maximum(hi - lo, 1e-9) * 1024, 0,
                1023).astype(np.uint64)

    def part(x):
        x &= 0x3ff
        x = (x | (x << 16)) & 0x30000ff
        x = (x | (x << 8)) & 0x300f00f
        x = (x | (x << 4)) & 0x30c30c3
        x = (x | (x << 2)) & 0x9249249
        return x
    return part(q[:, 0]) | (part(q[:, 1]) << 1) | (part(q[:, 2]) << 2)


# ---------------------------------------------------------------------------
# stage 1+2: cull + expand (XLA)
# ---------------------------------------------------------------------------

def _cull_bits(boxes, org, inv, t_init):
    """Per-ray cluster-hit bitmask [N, NG] u32 + hit count [N]."""
    n = org.shape[0]
    C = boxes.shape[0]
    NG = (C + 31) // 32
    pad = (-n) % CULL_CHUNKS

    def one(args):
        o1, i1, tm = args
        o1 = o1[:, None, :]
        i1 = i1[:, None, :]
        t0s = (boxes[None, :, 0:3] - o1) * i1
        t1s = (boxes[None, :, 3:6] - o1) * i1
        tn = jnp.maximum(jnp.max(jnp.minimum(t0s, t1s), axis=-1), 0.0)
        tf = jnp.minimum(jnp.min(jnp.maximum(t0s, t1s), axis=-1),
                         tm[:, None])
        hit = tn <= tf
        hitp = jnp.pad(hit, ((0, 0), (0, NG * 32 - C)))
        bits = jnp.sum(hitp.reshape(-1, NG, 32).astype(jnp.uint32)
                       << jnp.arange(32, dtype=jnp.uint32)[None, None, :],
                       axis=-1, dtype=jnp.uint32)
        return bits, jnp.sum(hit, axis=-1)

    oc = jnp.pad(org, ((0, pad), (0, 0))).reshape(CULL_CHUNKS, -1, 3)
    ic = jnp.pad(inv, ((0, pad), (0, 0))).reshape(CULL_CHUNKS, -1, 3)
    tc = jnp.pad(t_init, ((0, pad),)).reshape(CULL_CHUNKS, -1)
    bits, nh = jax.lax.map(one, (oc, ic, tc))
    return bits.reshape(-1, NG)[:n], nh.reshape(-1)[:n]


def _expand_bits(bits, k_slots):
    """[N, K] cluster ids from the bitmask (-1 = empty slot)."""
    n = bits.shape[0]

    def extract(bits, _):
        nz = bits != 0
        word = jnp.argmax(nz, axis=-1)
        w = jnp.take_along_axis(bits, word[:, None], axis=-1)[:, 0]
        low = w & (~w + jnp.uint32(1))
        bit = (31 - jax.lax.clz(low)).astype(jnp.int32)
        c = jnp.where(jnp.any(nz, axis=-1),
                      word.astype(jnp.int32) * 32 + bit, -1)
        bits = bits.at[jnp.arange(n), word].set(w & ~low)
        return bits, c

    _, cs = jax.lax.scan(extract, bits, None, length=k_slots)
    return cs.T


# ---------------------------------------------------------------------------
# stage 4: pair-test kernel
# ---------------------------------------------------------------------------

def _pair_kernel(cluster_ref, tris_ref, prims_ref,
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 t0_ref, ig_ref, ig2_ref,
                 t_out, prim_out, u_out, v_out, *, G: int, any_hit: bool):
    i = pl.program_id(0)
    c = cluster_ref[i]
    ox = ox_ref[:].reshape(SUB, LANE)
    oy = oy_ref[:].reshape(SUB, LANE)
    oz = oz_ref[:].reshape(SUB, LANE)
    dx = dx_ref[:].reshape(SUB, LANE)
    dy = dy_ref[:].reshape(SUB, LANE)
    dz = dz_ref[:].reshape(SUB, LANE)
    ig = ig_ref[:].reshape(SUB, LANE)
    ig2 = ig2_ref[:].reshape(SUB, LANE)
    t = t0_ref[:].reshape(SUB, LANE)
    prim = jnp.full((SUB, LANE), -1, jnp.int32)
    u = jnp.zeros((SUB, LANE), jnp.float32)
    v = jnp.zeros((SUB, LANE), jnp.float32)

    def test(t, prim, u, v):
        rows = tris_ref[c]
        cand = prims_ref[c]
        for k in range(G):
            o = 12 * k
            v0x, v0y, v0z = rows[o], rows[o + 1], rows[o + 2]
            e1x, e1y, e1z = rows[o + 3], rows[o + 4], rows[o + 5]
            e2x, e2y, e2z = rows[o + 6], rows[o + 7], rows[o + 8]
            nx, ny, nz = rows[o + 9], rows[o + 10], rows[o + 11]
            ck = cand[k]
            # det convention: det = e1.(d x e2) = -d.n  (n = e1 x e2)
            det = -(dx * nx + dy * ny + dz * nz)
            inv_det = jnp.where(jnp.abs(det) < 1e-20, 0.0, 1.0 / det)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            tt = (tx * nx + ty * ny + tz * nz) * inv_det
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            bv = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            bu = (dx * qx + dy * qy + dz * qz) * inv_det
            ok = ((bv >= 0.0) & (bu >= 0.0) & (bu + bv <= 1.0)
                  & (tt > 0.0) & (tt < t) & (ck >= 0) & (ck != ig)
                  & (ck != ig2))
            t = jnp.where(ok, tt, t)
            prim = jnp.where(ok, ck, prim)
            u = jnp.where(ok, bu, u)
            v = jnp.where(ok, bv, v)
            if any_hit:
                # shadow tiles only need "blocked": skip closest bookkeeping
                pass
        return t, prim, u, v

    t, prim, u, v = jax.lax.cond(
        c >= 0, test, lambda t, p_, u, v: (t, p_, u, v), t, prim, u, v)
    t_out[:] = t.reshape(TILE)
    prim_out[:] = prim.reshape(TILE)
    u_out[:] = u.reshape(TILE)
    v_out[:] = v.reshape(TILE)


def _pair_test(tile_cluster, tris, prims, rays, G, any_hit, interpret):
    n_tiles = tile_cluster.shape[0]
    P = n_tiles * TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((TILE,), lambda i, *_: (i,),
                        memory_space=pltpu.VMEM) for _ in range(9)],
        out_specs=[pl.BlockSpec((TILE,), lambda i, *_: (i,),
                                memory_space=pltpu.VMEM) for _ in range(4)],
    )
    out_shape = [jax.ShapeDtypeStruct((P,), jnp.float32),
                 jax.ShapeDtypeStruct((P,), jnp.int32),
                 jax.ShapeDtypeStruct((P,), jnp.float32),
                 jax.ShapeDtypeStruct((P,), jnp.float32)]
    return pl.pallas_call(
        functools.partial(_pair_kernel, G=G, any_hit=any_hit),
        grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
    )(tile_cluster, tris, prims, *rays)


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=('any_hit', 'k_slots', 'interpret'))
def traverse(cs: ClusterSet, org, direction, t_init, ignore_prim,
             ignore_prim2=None, any_hit=False, k_slots=K_SLOTS,
             interpret=False):
    """Closest-hit (or any-hit) over the cluster set.

    Returns (t, prim, u, v, slot, overflow): misses keep t = t_init and
    prim = -1; ``overflow`` marks rays whose cluster list exceeded k_slots
    — their results are incomplete and the caller must re-trace them on
    the fallback path.  ``slot`` indexes ClusterSet.shade rows.
    """
    n = org.shape[0]
    C = cs.n_clusters
    G = cs.tri_prim.shape[1]
    if ignore_prim2 is None:
        ignore_prim2 = jnp.full((n,), -1, jnp.int32)
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-20,
                          jnp.where(direction < 0, -1e-20, 1e-20), direction)

    bits, n_hits = _cull_bits(cs.boxes, org, inv, t_init)
    overflow = n_hits > k_slots
    pair_c = _expand_bits(bits, k_slots)              # [N, K]
    pair_c = jnp.where(overflow[:, None], -1, pair_c)

    # --- sort by cluster, pad segments to whole tiles --------------------
    key = jnp.where(pair_c < 0, C, pair_c).astype(jnp.uint32).reshape(-1)
    ray_id = jnp.broadcast_to(jnp.arange(n, dtype=jnp.uint32)[:, None],
                              (n, k_slots)).reshape(-1)
    skey, sray = jax.lax.sort_key_val(key, ray_id)
    counts = jnp.bincount(skey.astype(jnp.int32), length=C + 1)[:C]
    seg_start = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                                 jnp.cumsum(counts)[:-1]])
    padded = ((counts + TILE - 1) // TILE) * TILE
    pad_start = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                                 jnp.cumsum(padded)[:-1]])
    P = n * k_slots
    PB = ((P + TILE - 1) // TILE + C) * TILE
    pos = jnp.arange(P)
    sc_ = skey.astype(jnp.int32)
    valid = sc_ < C
    scidx = jnp.clip(sc_, 0, C - 1)
    dst = jnp.where(valid, pad_start[scidx] + (pos - seg_start[scidx]), PB)
    buf_ray = jnp.zeros((PB + 1,), jnp.uint32).at[dst].set(sray)[:PB]
    buf_live = jnp.zeros((PB + 1,), bool).at[dst].set(valid)[:PB]
    n_tiles = PB // TILE
    end_tile = jnp.cumsum(padded // TILE)
    idx = jnp.searchsorted(end_tile, jnp.arange(n_tiles), side='right')
    tile_c = jnp.where(jnp.arange(n_tiles) < end_tile[-1],
                       idx.astype(jnp.int32), -1)

    # --- gather ray data into pair order ----------------------------------
    r = buf_ray.astype(jnp.int32)
    rays = [jnp.where(buf_live, org[r, 0], 0.0),
            jnp.where(buf_live, org[r, 1], 0.0),
            jnp.where(buf_live, org[r, 2], 0.0),
            jnp.where(buf_live, direction[r, 0], 0.0),
            jnp.where(buf_live, direction[r, 1], 0.0),
            jnp.where(buf_live, direction[r, 2], 0.0),
            jnp.where(buf_live, t_init[r], 0.0),
            jnp.where(buf_live, ignore_prim[r], -2),
            jnp.where(buf_live, ignore_prim2[r], -2)]

    pt_, pp, pu, pv = _pair_test(tile_c, cs.tri_data, cs.tri_prim, rays,
                                 G, any_hit, interpret)

    # --- reduce ------------------------------------------------------------
    hitp = pp >= 0
    if any_hit:
        blk = jnp.zeros((n,), jnp.int32).at[
            jnp.where(buf_live & hitp, r, n)].max(
                jnp.ones((PB,), jnp.int32), mode='drop')
        return (t_init, jnp.where(blk > 0, 0, -1),
                jnp.zeros((n,)), jnp.zeros((n,)),
                jnp.full((n,), -1, jnp.int32), overflow)

    tkey = jnp.where(buf_live & hitp, pt_, jnp.float32(3.39e38))
    tbest = jnp.full((n,), 3.4e38).at[r].min(tkey, mode='drop')
    is_win = buf_live & hitp & (tkey <= tbest[r])
    widx = jnp.full((n,), PB, jnp.int32).at[
        jnp.where(is_win, r, n)].min(jnp.arange(PB, dtype=jnp.int32),
                                     mode='drop')
    has = widx < PB
    w = jnp.clip(widx, 0, PB - 1)
    # slot indexes ClusterSet.shade: cluster * G + argmin k; recover k by
    # re-testing is too costly — carry it via pu/pv? prim row lookup:
    # instead store slot = tile cluster * G + k in the kernel via prim row
    # match: prim ids within a cluster are unique, so find k by matching.
    tile_of = w // TILE
    c_of = tile_c[jnp.clip(tile_of, 0, n_tiles - 1)]
    prim_w = jnp.where(has, pp[w], -1)
    row = cs.tri_prim[jnp.clip(c_of, 0, C)]          # [N, G]
    kk = jnp.argmax(row == prim_w[:, None], axis=-1)
    slot = jnp.where(has, c_of * G + kk.astype(jnp.int32), -1)
    return (jnp.where(has, pt_[w], t_init), prim_w,
            jnp.where(has, pu[w], 0.0), jnp.where(has, pv[w], 0.0),
            slot, overflow)

