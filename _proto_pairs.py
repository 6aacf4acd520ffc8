"""Prototype v3: ray-cluster pair expansion + dense per-cluster test tiles.

Pipeline per intersect:
  1. cull (XLA, dense): slab every ray against every cluster AABB ->
     per-ray hit bitmask [N, NG] u32 + popcount.
  2. expand (XLA): K rounds of lowest-set-bit extraction -> [N, K] cluster
     ids (sentinel C where empty); rays with >K hits overflow to the old
     tile kernel.
  3. sort pairs by cluster id, pad each cluster segment to 1024 so every
     (8,128) kernel tile is single-cluster, gather ray data into pair
     order.
  4. pair-test kernel (Pallas): per tile, dense G-triangle Moeller-Trumbore
     of the tile's cluster against its 1024 rays.  No traversal state, no
     divergence: every lane tests a cluster it actually wants.
  5. reduce (XLA): scatter-min per ray + winner gather.
"""
import functools, os, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
TILE = SUB * LANE
G = int(os.environ.get('G', '32'))
K = int(os.environ.get('K', '16'))

from corona13_tpu import scene as scene_mod
from _proto_cull import build_clusters, pack_tri_data


def _pair_kernel(cluster_ref,      # scalar prefetch [n_tiles] i32
                 tris_ref,         # VMEM [C+1, G*12] (row C = zeros)
                 prims_ref,        # VMEM [C+1, G] i32 (-1 padded)
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 t0_ref, ig_ref, ig2_ref,
                 t_out, prim_out, u_out, v_out, *, any_hit: bool):
    i = pl.program_id(0)
    c = cluster_ref[i]
    ox = ox_ref[:].reshape(SUB, LANE); oy = oy_ref[:].reshape(SUB, LANE)
    oz = oz_ref[:].reshape(SUB, LANE)
    dx = dx_ref[:].reshape(SUB, LANE); dy = dy_ref[:].reshape(SUB, LANE)
    dz = dz_ref[:].reshape(SUB, LANE)
    ig = ig_ref[:].reshape(SUB, LANE); ig2 = ig2_ref[:].reshape(SUB, LANE)
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
            det = -(dx * nx + dy * ny + dz * nz)
            inv_det = jnp.where(jnp.abs(det) < 1e-20, 0.0, 1.0 / det)
            tx = ox - v0x; ty = oy - v0y; tz = oz - v0z
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
        return t, prim, u, v

    t, prim, u, v = jax.lax.cond(
        c >= 0, test, lambda t, p_, u, v: (t, p_, u, v), t, prim, u, v)
    t_out[:] = t.reshape(TILE)
    prim_out[:] = prim.reshape(TILE)
    u_out[:] = u.reshape(TILE)
    v_out[:] = v.reshape(TILE)


def pair_test(tile_cluster, tris, prims, ox, oy, oz, dx, dy, dz, t0, ig, ig2,
              any_hit=False):
    """tile_cluster [n_tiles] i32 (-1 = dead tile); ray arrays in pair
    order, length n_tiles*TILE."""
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
        functools.partial(_pair_kernel, any_hit=any_hit),
        grid_spec=grid_spec, out_shape=out_shape,
    )(tile_cluster, tris, prims, ox, oy, oz, dx, dy, dz, t0, ig, ig2)


@functools.partial(jax.jit, static_argnames=('any_hit',))
def traverse(boxes, tris, prims, org, direction, t_init, ignore,
             ignore2=None, any_hit=False):
    """boxes [C, 6]; tris [C+1, G*12]; prims [C+1, G]."""
    n = org.shape[0]
    C = boxes.shape[0]
    NG = (C + 31) // 32
    if ignore2 is None:
        ignore2 = jnp.full((n,), -1, jnp.int32)

    # ---- 1. dense cull -> bitmask [N, NG] ------------------------------
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-20,
                          jnp.where(direction < 0, -1e-20, 1e-20), direction)
    o1 = org[:, None, :]
    i1 = inv[:, None, :]
    t0s = (boxes[None, :, 0:3] - o1) * i1          # [N, C, 3]
    t1s = (boxes[None, :, 3:6] - o1) * i1
    tn = jnp.maximum(jnp.max(jnp.minimum(t0s, t1s), axis=-1), 0.0)
    tf = jnp.minimum(jnp.min(jnp.maximum(t0s, t1s), axis=-1),
                     t_init[:, None])
    hit = tn <= tf                                  # [N, C]
    pad_c = NG * 32 - C
    hitp = jnp.pad(hit, ((0, 0), (0, pad_c)))
    bits = jnp.sum(hitp.reshape(n, NG, 32).astype(jnp.uint32)
                   << jnp.arange(32, dtype=jnp.uint32)[None, None, :],
                   axis=-1, dtype=jnp.uint32)       # [N, NG]
    n_hits = jnp.sum(hit, axis=-1)
    overflow = n_hits > K

    # ---- 2. expand: K lowest set bits -> [N, K] cluster ids ------------
    def extract(bits, _):
        nz = bits != 0
        word = jnp.argmax(nz, axis=-1)              # first nonzero word
        w = jnp.take_along_axis(bits, word[:, None], axis=-1)[:, 0]
        low = w & (~w + jnp.uint32(1))              # lowest set bit
        bit = (31 - jax.lax.clz(low)).astype(jnp.int32)
        c = word.astype(jnp.int32) * 32 + bit
        c = jnp.where(jnp.any(nz, axis=-1), c, -1)
        bits = bits.at[jnp.arange(n), word].set(w & ~low)
        return bits, c

    bits2, cs = jax.lax.scan(extract, bits, None, length=K)
    pair_c = cs.T                                    # [N, K], -1 = empty
    # drop pairs of overflow rays (they take the fallback path)
    pair_c = jnp.where(overflow[:, None], -1, pair_c)

    # ---- 3. sort by cluster, pad segments to TILE ----------------------
    key = jnp.where(pair_c < 0, C, pair_c).astype(jnp.uint32).reshape(-1)
    ray_id = jnp.broadcast_to(jnp.arange(n, dtype=jnp.uint32)[:, None],
                              (n, K)).reshape(-1)
    skey, sray = jax.lax.sort_key_val(key, ray_id)
    counts = jnp.bincount(skey.astype(jnp.int32), length=C + 1)[:C]
    seg_start = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                                 jnp.cumsum(counts)[:-1]])
    padded = ((counts + TILE - 1) // TILE) * TILE
    pad_start = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                                 jnp.cumsum(padded)[:-1]])
    P = n * K
    PB = P + C * TILE                                # padded buffer size
    pos = jnp.arange(P)
    sc_ = skey.astype(jnp.int32)
    valid = sc_ < C
    scidx = jnp.clip(sc_, 0, C - 1)
    dst = jnp.where(valid,
                    pad_start[scidx] + (pos - seg_start[scidx]), PB)
    buf_ray = jnp.full((PB + 1,), jnp.uint32(0)).at[dst].set(sray)
    buf_live = jnp.zeros((PB + 1,), bool).at[dst].set(valid)
    buf_ray = buf_ray[:PB]
    buf_live = buf_live[:PB]
    # per-tile cluster id: tile j is cluster c iff pad_start[c]//TILE <= j <
    # (pad_start[c]+padded[c])//TILE; build by scatter over cluster tiles
    n_tiles = PB // TILE
    ntile_c = padded // TILE
    # tile j belongs to the unique cluster whose cumulative tile range
    # contains j (empty clusters have zero width and are skipped)
    end_tile = jnp.cumsum(ntile_c)
    idx = jnp.searchsorted(end_tile, jnp.arange(n_tiles), side='right')
    tile_c = jnp.where(jnp.arange(n_tiles) < end_tile[-1],
                       idx.astype(jnp.int32), -1)

    # ---- gather ray data into pair order -------------------------------
    r = buf_ray.astype(jnp.int32)
    gox = jnp.where(buf_live, org[r, 0], 0.0)
    goy = jnp.where(buf_live, org[r, 1], 0.0)
    goz = jnp.where(buf_live, org[r, 2], 0.0)
    gdx = jnp.where(buf_live, direction[r, 0], 0.0)
    gdy = jnp.where(buf_live, direction[r, 1], 0.0)
    gdz = jnp.where(buf_live, direction[r, 2], 0.0)
    gt = jnp.where(buf_live, t_init[r], 0.0)
    gig = jnp.where(buf_live, ignore[r], -2)
    gig2 = jnp.where(buf_live, ignore2[r], -2)

    # ---- 4. pair-test kernel -------------------------------------------
    pt_, pp, pu, pv = pair_test(tile_c, tris, prims, gox, goy, goz,
                                gdx, gdy, gdz, gt, gig, gig2,
                                any_hit=any_hit)

    # ---- 5. reduce: per-ray argmin -------------------------------------
    hitp_ = pp >= 0
    tkey = jnp.where(hitp_, pt_, jnp.float32(3.39e38))
    tbest = jnp.full((n,), 3.4e38).at[r].min(jnp.where(buf_live, tkey,
                                                       3.4e38))
    is_win = buf_live & hitp_ & (tkey <= tbest[r])
    widx = jnp.full((n,), PB, jnp.int32).at[
        jnp.where(is_win, r, n)].min(jnp.arange(PB, dtype=jnp.int32))
    has = widx < PB
    wsafe = jnp.clip(widx, 0, PB - 1)
    t_out = jnp.where(has, pt_[wsafe], t_init)
    prim_out = jnp.where(has, pp[wsafe], -1)
    u_out = jnp.where(has, pu[wsafe], 0.0)
    v_out = jnp.where(has, pv[wsafe], 0.0)
    return t_out, prim_out, u_out, v_out, overflow


def main():
    from bench.traversal import make_rays, _timeit
    from corona13_tpu.ops import trace_pallas

    sc, _ = scene_mod.load_scene('/root/reference/regression/0010_pt/test.nra2')
    sc = scene_mod.fit_film(sc, 1024, 576)
    tri_v = np.stack([np.asarray(sc.geom.tri_v0),
                      np.asarray(sc.geom.tri_v0) + np.asarray(sc.geom.tri_e1),
                      np.asarray(sc.geom.tri_v0) + np.asarray(sc.geom.tri_e2)],
                     axis=1)
    boxes, prims = build_clusters(tri_v, G)
    C = len(boxes)
    print(f'{len(tri_v)} tris -> {C} clusters of <= {G}, K={K}')
    tris = pack_tri_data(tri_v, prims)
    tris = np.concatenate([tris, np.zeros((1, tris.shape[1]), np.float32)])
    prims_p = np.concatenate([prims, np.full((1, G), -1, np.int64)])
    boxes_d = jnp.asarray(boxes)
    tris_d = jnp.asarray(tris)
    prims_d = jnp.asarray(prims_p.astype(np.int32))

    (org, d, borg, bdir, bt, bprim, st, sdir), n = make_rays(sc)

    f = jax.jit(lambda o, w, t, ig: traverse(boxes_d, tris_d, prims_d,
                                             o, w, t, ig)[0].sum())
    tmax = jnp.full((n,), 3.4e38)
    ig0 = jnp.full((n,), -1, jnp.int32)
    t_p = _timeit(f, org, d, tmax, ig0)
    print(f'coherent : {t_p*1e3:7.2f} ms -> {n/t_p/1e6:7.1f} Mrays/s')
    t_b = _timeit(f, borg, bdir, bt, bprim)
    print(f'bounce   : {t_b*1e3:7.2f} ms -> {n/t_b/1e6:7.1f} Mrays/s')

    # correctness vs old pallas tri kernel
    b = sc.geom.tri_bvh
    t1, p1, u1, v1, _ = trace_pallas.traverse_tris(
        b.pnodes, b.plinks, b.leaf_data, b.leaf_prims, borg, bdir, bt, bprim)
    t2, p2, u2, v2, ovf = traverse(boxes_d, tris_d, prims_d, borg, bdir, bt,
                                   bprim)
    ovf = np.asarray(ovf)
    print(f'overflow rays: {ovf.sum()} ({ovf.mean()*100:.2f}%)')
    m = ~ovf
    p1, p2 = np.asarray(p1)[m], np.asarray(p2)[m]
    t1, t2 = np.asarray(t1)[m], np.asarray(t2)[m]
    both = (p1 >= 0) & (p2 >= 0)
    print('old hit/new miss:', ((p1 >= 0) & (p2 < 0)).sum(),
          ' new hit/old miss:', ((p2 >= 0) & (p1 < 0)).sum())
    dd = both & (p1 != p2)
    print('diff prim:', dd.sum(),
          ' of which t-ties:', (np.abs(t1[dd] - t2[dd]) < 1e-4).sum())
    same = both & (p1 == p2)
    print('same prim max t err:', np.abs(t1[same] - t2[same]).max())


if __name__ == '__main__':
    main()
