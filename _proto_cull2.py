"""Prototype v2: bitmask dense cull + octant-ordered visits.

Changes vs _proto_cull.py:
  * cull packs 32 cluster-hit bits per (8,128) i32 vreg and OR-reduces once
    per group (1 reduction / 32 clusters instead of 1 per cluster);
  * visit order comes from a host-precomputed per-octant cluster order
    (approximate front-to-back), no in-kernel insertion sort;
  * per-visit re-slab against the current best t prunes late clusters.
"""
import functools, os, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
TILE = SUB * LANE
G = int(os.environ.get('G', '32'))

from corona13_tpu import scene as scene_mod
from _proto_cull import build_clusters, pack_tri_data, _pad


def octant_orders(boxes):
    """[8, C] cluster visit order per direction octant: ascending projection
    of the box center on the octant direction (approx front-to-back)."""
    C = len(boxes)
    centers = 0.5 * (boxes[:, :3] + boxes[:, 3:6])
    orders = np.zeros((8, C), np.int32)
    for o in range(8):
        d = np.array([1.0 if not (o >> k) & 1 else -1.0 for k in range(3)])
        orders[o] = np.argsort(centers @ d, kind='stable')
    return orders


def _kernel(boxes_ref,             # SMEM [C, 8]
            order_ref,             # SMEM [8, C] i32 per-octant visit order
            tris_ref,              # VMEM [C, G*12]
            prims_ref,             # VMEM [C, G] i32
            ox_ref, oy_ref, oz_ref, ix_ref, iy_ref, iz_ref,
            dx_ref, dy_ref, dz_ref, t0_ref, ig_ref, ig2_ref,
            t_out, prim_out, u_out, v_out, nv_out,
            visits_ref, bits_ref, *, C: int, any_hit: bool):
    ox = ox_ref[:].reshape(SUB, LANE); oy = oy_ref[:].reshape(SUB, LANE)
    oz = oz_ref[:].reshape(SUB, LANE)
    ix = ix_ref[:].reshape(SUB, LANE); iy = iy_ref[:].reshape(SUB, LANE)
    iz = iz_ref[:].reshape(SUB, LANE)
    dx = dx_ref[:].reshape(SUB, LANE); dy = dy_ref[:].reshape(SUB, LANE)
    dz = dz_ref[:].reshape(SUB, LANE)
    ig = ig_ref[:].reshape(SUB, LANE); ig2 = ig2_ref[:].reshape(SUB, LANE)
    t = t0_ref[:].reshape(SUB, LANE)
    NG = (C + 31) // 32

    def slab(c, tmax):
        bx0 = boxes_ref[c, 0]; by0 = boxes_ref[c, 1]; bz0 = boxes_ref[c, 2]
        bx1 = boxes_ref[c, 3]; by1 = boxes_ref[c, 4]; bz1 = boxes_ref[c, 5]
        t0x = (bx0 - ox) * ix; t1x = (bx1 - ox) * ix
        t0y = (by0 - oy) * iy; t1y = (by1 - oy) * iy
        t0z = (bz0 - oz) * iz; t1z = (bz1 - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), tmax))
        return tn <= tf

    # tile majority direction octant (scalar)
    octant = ((jnp.sum(dx) < 0).astype(jnp.int32)
              | ((jnp.sum(dy) < 0).astype(jnp.int32) << 1)
              | ((jnp.sum(dz) < 0).astype(jnp.int32) << 2))

    # phase 1: dense cull, 32 cluster bits per vreg, one OR roll-tree
    # reduction per 32-cluster group (no per-cluster scalar reductions)
    def cull_group(g, _):
        mask = jnp.zeros((SUB, LANE), jnp.int32)
        for j in range(32):
            c = g * 32 + j
            if_ok = slab(jnp.minimum(jnp.int32(c), C - 1), t) & (c < C)
            mask = mask | (if_ok.astype(jnp.int32) << j)
        for sh in (64, 32, 16, 8, 4, 2, 1):       # OR over lanes
            mask = mask | pltpu.roll(mask, sh, 1)
        for sh in (4, 2, 1):                      # OR over sublanes
            mask = mask | pltpu.roll(mask, sh, 0)
        bits_ref[g] = mask[0, 0]
        return _

    jax.lax.fori_loop(0, NG, cull_group, None)

    # build visit list in octant order (pure scalar SMEM loop)
    def build(rank, nv):
        c = order_ref[octant, rank]
        bit = (bits_ref[c >> 5] >> (c & 31)) & 1
        take = bit > 0

        @pl.when(take)
        def _():
            visits_ref[nv] = c
        return nv + take.astype(jnp.int32)

    n_visits = jax.lax.fori_loop(0, C, build, jnp.int32(0))

    prim = jnp.full((SUB, LANE), -1, jnp.int32)
    u = jnp.zeros((SUB, LANE), jnp.float32)
    v = jnp.zeros((SUB, LANE), jnp.float32)

    def visit_body(carry):
        i, t, prim, u, v = carry
        c = visits_ref[i]
        live = jnp.any(slab(c, t))

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
            live, test, lambda t, p_, u, v: (t, p_, u, v), t, prim, u, v)
        return i + 1, t, prim, u, v

    def visit_cond(carry):
        i, t, prim, u, v = carry
        go = i < n_visits
        if any_hit:
            go = go & ~jnp.all(prim >= 0)
        return go

    if os.environ.get('NOVISIT'):
        t = t + n_visits.astype(jnp.float32) * 0.0
    else:
        _, t, prim, u, v = jax.lax.while_loop(
            visit_cond, visit_body, (jnp.int32(0), t, prim, u, v))
    nv_out[:] = jnp.full((TILE,), n_visits, jnp.int32)
    t_out[:] = t.reshape(TILE)
    prim_out[:] = prim.reshape(TILE)
    u_out[:] = u.reshape(TILE)
    v_out[:] = v.reshape(TILE)


@functools.partial(jax.jit, static_argnames=('any_hit',))
def traverse(boxes, orders, tris, prims, org, direction, t_init, ignore,
             any_hit=False):
    n = org.shape[0]
    C = boxes.shape[0]
    NG = (C + 31) // 32
    n_pad = (-n) % TILE
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-20,
                          jnp.where(direction < 0, -1e-20, 1e-20), direction)
    ig2 = jnp.full((n,), -1, jnp.int32)
    args = [org[:, 0], org[:, 1], org[:, 2], inv[:, 0], inv[:, 1], inv[:, 2],
            direction[:, 0], direction[:, 1], direction[:, 2],
            t_init, ignore, ig2]
    fills = [0.] * 10 + [-1, -1]
    args = [_pad(a.astype(jnp.int32) if i >= 10 else a.astype(jnp.float32),
                 n_pad, fills[i]) for i, a in enumerate(args)]
    n_tiles = (n + n_pad) // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)
           for _ in range(12)],
        out_specs=[pl.BlockSpec((TILE,), lambda i: (i,),
                                memory_space=pltpu.VMEM) for _ in range(4)]
        + [pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.SMEM((C + 1,), jnp.int32),
                        pltpu.SMEM((NG,), jnp.int32)],
    )
    out_shape = [jax.ShapeDtypeStruct((n + n_pad,), jnp.float32),
                 jax.ShapeDtypeStruct((n + n_pad,), jnp.int32),
                 jax.ShapeDtypeStruct((n + n_pad,), jnp.float32),
                 jax.ShapeDtypeStruct((n + n_pad,), jnp.float32),
                 jax.ShapeDtypeStruct((n + n_pad,), jnp.int32)]
    t, prim, u, v, nv = pl.pallas_call(
        functools.partial(_kernel, C=C, any_hit=any_hit),
        grid_spec=grid_spec, out_shape=out_shape,
    )(boxes, orders, tris, prims, *args)
    return t[:n], prim[:n], u[:n], v[:n], nv


def main():
    from bench.traversal import make_rays, _timeit
    from corona13_tpu.ops.trace import _sorted_traverse
    from corona13_tpu.ops import trace_pallas

    sc, _ = scene_mod.load_scene('/root/reference/regression/0010_pt/test.nra2')
    sc = scene_mod.fit_film(sc, 1024, 576)
    tri_v = np.stack([np.asarray(sc.geom.tri_v0),
                      np.asarray(sc.geom.tri_v0) + np.asarray(sc.geom.tri_e1),
                      np.asarray(sc.geom.tri_v0) + np.asarray(sc.geom.tri_e2)],
                     axis=1)
    boxes, prims = build_clusters(tri_v, G)
    C = len(boxes)
    print(f'{len(tri_v)} tris -> {C} clusters of <= {G}')
    boxes8 = jnp.asarray(np.concatenate([boxes, np.zeros((C, 2), np.float32)],
                                        axis=1))
    orders = jnp.asarray(octant_orders(np.asarray(boxes)))
    tris = jnp.asarray(pack_tri_data(tri_v, prims))
    prims_d = jnp.asarray(prims.astype(np.int32))

    (org, d, borg, bdir, bt, bprim, st, sdir), n = make_rays(sc)

    def _run(o, w, t, ig):
        return traverse(boxes8, orders, tris, prims_d, o, w, t, ig)[:4]
    f = jax.jit(lambda o, w, t, ig: _sorted_traverse(
        _run, sc.geom.tri_bvh, o, w, t, ig)[0].sum())

    def _run_sh(o, w, t, ig):
        return traverse(boxes8, orders, tris, prims_d, o, w, t, ig,
                        any_hit=True)[:4]
    fs = jax.jit(lambda o, w, t, ig: _sorted_traverse(
        _run_sh, sc.geom.tri_bvh, o, w, t, ig)[1].sum())

    tmax = jnp.full((n,), 3.4e38)
    ig0 = jnp.full((n,), -1, jnp.int32)
    t_p = _timeit(f, org, d, tmax, ig0)
    print(f'coherent : {t_p*1e3:7.2f} ms -> {n/t_p/1e6:7.1f} Mrays/s')
    t_b = _timeit(f, borg, bdir, bt, bprim)
    print(f'bounce   : {t_b*1e3:7.2f} ms -> {n/t_b/1e6:7.1f} Mrays/s')
    t_s = _timeit(fs, borg, sdir, st, bprim)
    print(f'shadow   : {t_s*1e3:7.2f} ms -> {n/t_s/1e6:7.1f} Mrays/s')

    # correctness vs the OLD pallas tri kernel (tri-only, apples to apples)
    b = sc.geom.tri_bvh
    t1, p1, u1, v1, _ = trace_pallas.traverse_tris(
        b.pnodes, b.plinks, b.leaf_data, b.leaf_prims, borg, bdir, bt, bprim)
    t2, p2, u2, v2, nv = traverse(boxes8, orders, tris, prims_d, borg, bdir,
                                  bt, bprim)
    nv = np.asarray(nv)[::TILE]
    print(f'n_visits (bounce, unsorted): mean {nv.mean():.1f} max {nv.max()}')
    p1, p2 = np.asarray(p1), np.asarray(p2)
    t1, t2 = np.asarray(t1), np.asarray(t2)
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
