"""Prototype: dense-cull + masked-cluster-loop traversal kernel.

Per 1024-ray tile:
  phase 1: slab-test all C cluster AABBs (boxes in SMEM), OR-reduce to a
           per-cluster any-hit bit, build a visit list in SMEM (optionally
           insertion-sorted by tile-min entry distance);
  phase 2: scalar loop over the visit list; per cluster re-check the slab
           against the *current* per-ray best t (front-to-back pruning) and
           run the dense G-triangle Moeller-Trumbore.
"""
import functools, time, os, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
TILE = SUB * LANE
G = int(os.environ.get('G', '32'))       # tris per cluster
SORT_VISITS = os.environ.get('SORT', '1') == '1'

from corona13_tpu import scene as scene_mod
from corona13_tpu.ops import bvh as bvh_mod


def build_clusters(tri_v, leaf=G):
    """SAH clusters via the native builder: leaves of <= `leaf` tris."""
    import ctypes
    from corona13_tpu import native
    lib = native.get_lib()
    p_min = np.ascontiguousarray(tri_v.min(axis=1), np.float32)
    p_max = np.ascontiguousarray(tri_v.max(axis=1), np.float32)
    n_nodes = ctypes.c_int32(); n_slots = ctypes.c_int32()
    fp = ctypes.POINTER(ctypes.c_float); ip = ctypes.POINTER(ctypes.c_int32)
    h = lib.bvh_build(p_min.ctypes.data_as(fp), p_max.ctypes.data_as(fp),
                      len(p_min), leaf, ctypes.byref(n_nodes),
                      ctypes.byref(n_slots))
    nn, ns = n_nodes.value, n_slots.value
    node_min = np.empty((nn, 3), np.float32); node_max = np.empty((nn, 3), np.float32)
    node_skip = np.empty(nn, np.int32); node_first = np.empty(nn, np.int32)
    node_right = np.empty(nn, np.int32); leaf_prims = np.empty(ns, np.int32)
    lib.bvh_finish(h, node_min.ctypes.data_as(fp), node_max.ctypes.data_as(fp),
                   node_skip.ctypes.data_as(ip), node_first.ctypes.data_as(ip),
                   node_right.ctypes.data_as(ip), leaf_prims.ctypes.data_as(ip))
    sel = node_first >= 0
    boxes = np.concatenate([node_min[sel], node_max[sel]], axis=1)  # [C, 6]
    prims = leaf_prims.reshape(-1, leaf)[node_first[sel] // leaf]   # [C, G]
    return boxes, prims


def pack_tri_data(tri_v, prims):
    """[C, G, 12]: v0, e1, e2, n per tri (padded with degenerate)."""
    C, Gl = prims.shape
    p = np.maximum(prims, 0)
    v = tri_v[p]                       # [C, G, 3, 3]
    v0 = v[..., 0, :]
    e1 = v[..., 1, :] - v0
    e2 = v[..., 2, :] - v0
    n = np.cross(e1, e2)
    dead = prims < 0
    e1 = np.where(dead[..., None], 0.0, e1)   # degenerate -> det 0
    out = np.concatenate([v0, e1, e2, n], axis=-1).astype(np.float32)
    return out.reshape(C, Gl * 12)


def _kernel(boxes_ref,             # SMEM [C, 8] (minx..maxz, pad)
            tris_ref,              # VMEM [C, G*12]
            prims_ref,             # VMEM [C, G] i32 (in 2D rows)
            ox_ref, oy_ref, oz_ref, ix_ref, iy_ref, iz_ref,
            dx_ref, dy_ref, dz_ref, t0_ref, ig_ref, ig2_ref,
            t_out, prim_out, u_out, v_out,
            visits_ref, keys_ref, *, C: int, any_hit: bool):
    ox = ox_ref[:].reshape(SUB, LANE); oy = oy_ref[:].reshape(SUB, LANE)
    oz = oz_ref[:].reshape(SUB, LANE)
    ix = ix_ref[:].reshape(SUB, LANE); iy = iy_ref[:].reshape(SUB, LANE)
    iz = iz_ref[:].reshape(SUB, LANE)
    dx = dx_ref[:].reshape(SUB, LANE); dy = dy_ref[:].reshape(SUB, LANE)
    dz = dz_ref[:].reshape(SUB, LANE)
    ig = ig_ref[:].reshape(SUB, LANE); ig2 = ig2_ref[:].reshape(SUB, LANE)
    t = t0_ref[:].reshape(SUB, LANE)

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
        return tn, tn <= tf

    # phase 1: dense cull -> visit list in SMEM
    def cull_body(c, nv):
        tn, hit = slab(c, t)
        anyhit = jnp.any(hit)
        key = jnp.min(jnp.where(hit, tn, jnp.float32(3.4e38)))

        @pl.when(anyhit)
        def _():
            if SORT_VISITS:
                # insertion sort by key (ascending tile-min entry distance)
                def cnt(j, acc):
                    return acc + (keys_ref[j] <= key).astype(jnp.int32)
                pos = jax.lax.fori_loop(0, nv, cnt, jnp.int32(0))

                def shift(i, _):
                    j = nv - 1 - i

                    @pl.when(j >= pos)
                    def _():
                        keys_ref[j + 1] = keys_ref[j]
                        visits_ref[j + 1] = visits_ref[j]
                    return _
                jax.lax.fori_loop(0, nv, shift, None)
                keys_ref[pos] = key
                visits_ref[pos] = c
            else:
                visits_ref[nv] = c
        return nv + anyhit.astype(jnp.int32)

    n_visits = jax.lax.fori_loop(0, C, cull_body, jnp.int32(0))

    prim = jnp.full((SUB, LANE), -1, jnp.int32)
    u = jnp.zeros((SUB, LANE), jnp.float32)
    v = jnp.zeros((SUB, LANE), jnp.float32)

    # phase 2: visit list, front-to-back, re-slab prune vs current t
    def visit_body(i, carry):
        t, prim, u, v = carry
        c = visits_ref[i]
        _, hit = slab(c, t)
        live = jnp.any(hit)
        if any_hit:
            live = live & ~jnp.all(prim >= 0)

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
                # det convention: det = e1.(d x e2) = -d.n (n = e1 x e2)
                det = -(dx * nx + dy * ny + dz * nz)
                inv_det = jnp.where(jnp.abs(det) < 1e-20, 0.0, 1.0 / det)
                tx = ox - v0x; ty = oy - v0y; tz = oz - v0z
                tt = (tx * nx + ty * ny + tz * nz) * inv_det
                # p = d x e2 ; bv = (o-v0).p / det
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                bv = (tx * px + ty * py + tz * pz) * inv_det
                # q = (o-v0) x e1 ; bu = d.q / det
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

        return jax.lax.cond(live, test, lambda t, p_, u, v: (t, p_, u, v),
                            t, prim, u, v)

    if os.environ.get('NOVISIT'):
        t = t + n_visits.astype(jnp.float32) * 0.0
    else:
        t, prim, u, v = jax.lax.fori_loop(0, n_visits, visit_body,
                                          (t, prim, u, v))
    t_out[:] = t.reshape(TILE)
    prim_out[:] = prim.reshape(TILE)
    u_out[:] = u.reshape(TILE)
    v_out[:] = v.reshape(TILE)


def _pad(x, n_pad, fill):
    return jnp.concatenate(
        [x, jnp.full((n_pad,) + x.shape[1:], fill, x.dtype)]) if n_pad else x


@functools.partial(jax.jit, static_argnames=('any_hit',))
def traverse(boxes, tris, prims, org, direction, t_init, ignore,
             any_hit=False):
    n = org.shape[0]
    C = boxes.shape[0]
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
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)
           for _ in range(12)],
        out_specs=[pl.BlockSpec((TILE,), lambda i: (i,),
                                memory_space=pltpu.VMEM) for _ in range(4)],
        scratch_shapes=[pltpu.SMEM((C + 1,), jnp.int32),
                        pltpu.SMEM((C + 1,), jnp.float32)],
    )
    out_shape = [jax.ShapeDtypeStruct((n + n_pad,), jnp.float32),
                 jax.ShapeDtypeStruct((n + n_pad,), jnp.int32),
                 jax.ShapeDtypeStruct((n + n_pad,), jnp.float32),
                 jax.ShapeDtypeStruct((n + n_pad,), jnp.float32)]
    t, prim, u, v = pl.pallas_call(
        functools.partial(_kernel, C=C, any_hit=any_hit),
        grid_spec=grid_spec, out_shape=out_shape,
    )(boxes, tris, prims, *args)
    return t[:n], prim[:n], u[:n], v[:n]


def main():
    SCENE = '/root/reference/regression/0010_pt/test.nra2'
    sc, _ = scene_mod.load_scene(SCENE)
    sc = scene_mod.fit_film(sc, 1024, 576)
    tri_v = np.stack([np.asarray(sc.geom.tri_v0),
                      np.asarray(sc.geom.tri_v0) + np.asarray(sc.geom.tri_e1),
                      np.asarray(sc.geom.tri_v0) + np.asarray(sc.geom.tri_e2)],
                     axis=1)
    boxes, prims = build_clusters(tri_v, G)
    C = len(boxes)
    print(f'{len(tri_v)} tris -> {C} clusters of <= {G}')
    boxes8 = np.concatenate([boxes, np.zeros((C, 2), np.float32)], axis=1)
    tris = pack_tri_data(tri_v, prims)

    boxes8 = jnp.asarray(boxes8); tris = jnp.asarray(tris)
    prims_d = jnp.asarray(prims.astype(np.int32))

    # rays: reuse bench.traversal's generator
    sys.path.insert(0, '/root/repo')
    from bench.traversal import make_rays, _timeit
    (org, d, borg, bdir, bt, bprim, st, sdir), n = make_rays(sc)

    from corona13_tpu.ops.trace import _sorted_traverse

    def _run(o, w, t, ig):
        return traverse(boxes8, tris, prims_d, o, w, t, ig)
    f = jax.jit(lambda o, w, t, ig: _sorted_traverse(
        _run, sc.geom.tri_bvh, o, w, t, ig)[0].sum())
    tmax = jnp.full((n,), 3.4e38)
    ig0 = jnp.full((n,), -1, jnp.int32)
    t_p = _timeit(f, org, d, tmax, ig0)
    print(f'coherent : {t_p*1e3:7.2f} ms -> {n/t_p/1e6:7.1f} Mrays/s')
    t_b = _timeit(f, borg, bdir, bt, bprim)
    print(f'bounce   : {t_b*1e3:7.2f} ms -> {n/t_b/1e6:7.1f} Mrays/s')

    # correctness vs reference kernel
    from corona13_tpu.ops.trace import intersect
    hit = intersect(sc.geom, borg, bdir, ignore_prim=bprim, t_max=bt)
    t2, prim2, u2, v2 = traverse(boxes8, tris, prims_d, borg, bdir, bt, bprim)
    ok = np.asarray(hit.prim) == np.asarray(prim2)
    print(f'prim agreement: {ok.mean()*100:.3f}%')
    tt = np.asarray(hit.t); t2 = np.asarray(t2)
    m = np.asarray(hit.valid)
    print(f't rel err (hits): {np.abs(tt[m]-t2[m]).max():.2e}')


if __name__ == '__main__':
    main()
