"""Wavefront ray intersection on device.

TPU-native replacement for the reference's SIMD QBVH traversal + per-prim
intersectors (corona-13 src/accel.d/qbvhmp.c:1262-1389, include/geo/*.h):
the whole wavefront advances in lockstep through a stackless skip-link BVH
(one node pointer per ray, masked updates — no per-lane stacks), and leaf
primitives are tested LEAF_SIZE at a time with dense vectorized math.

Primitive kinds: triangles (quads pre-split at load), spheres, and lines
(truncated cones, used for hair/cylinders).  Each kind gets its own BVH so
leaves are type-homogeneous and the intersection math stays branch-free.

Global prim ids: [0, T) triangles, [T, T+S) spheres, [T+S, T+S+L) lines —
the analogue of the reference's primid_t (corona_common.h:45-55).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils.math import dot, normalize
from . import bvh as bvh_mod

INVALID_PRIM = jnp.int32(-1)
MAX_DIST = jnp.float32(3.4e38)


@struct.dataclass
class DeviceBVH:
    node_min: jnp.ndarray
    node_max: jnp.ndarray
    node_skip: jnp.ndarray
    node_first: jnp.ndarray
    leaf_prims: jnp.ndarray

    @classmethod
    def from_host(cls, b: bvh_mod.FlatBVH) -> 'DeviceBVH':
        return cls(node_min=jnp.asarray(b.node_min),
                   node_max=jnp.asarray(b.node_max),
                   node_skip=jnp.asarray(b.node_skip),
                   node_first=jnp.asarray(b.node_first),
                   leaf_prims=jnp.asarray(b.leaf_prims))


@struct.dataclass
class DeviceGeometry:
    """Scene geometry as device arrays (SoA).  Triangles store (v0, e1, e2)
    precomputed for Moeller-Trumbore."""
    tri_v0: jnp.ndarray      # [T, 3]
    tri_e1: jnp.ndarray      # [T, 3] v1 - v0
    tri_e2: jnp.ndarray      # [T, 3] v2 - v0
    tri_vn: jnp.ndarray      # [T, 3, 3] vertex shading normals
    tri_uv: jnp.ndarray      # [T, 3, 2]
    tri_shader: jnp.ndarray  # [T] int32 material id
    tri_quad_half: jnp.ndarray  # [T] int32 (0 tri, 1/2 = quad halves)
    sph_c: jnp.ndarray       # [S, 3]
    sph_r: jnp.ndarray       # [S]
    sph_shader: jnp.ndarray  # [S]
    line_v0: jnp.ndarray     # [L, 3]
    line_v1: jnp.ndarray     # [L, 3]
    line_r0: jnp.ndarray     # [L]
    line_r1: jnp.ndarray     # [L]
    line_shader: jnp.ndarray # [L]
    tri_bvh: DeviceBVH
    sph_bvh: DeviceBVH
    line_bvh: DeviceBVH

    @property
    def n_tris(self):
        return self.tri_v0.shape[0]

    @property
    def n_spheres(self):
        return self.sph_c.shape[0]

    @property
    def n_lines(self):
        return self.line_v0.shape[0]


@struct.dataclass
class Hit:
    """Wavefront hit record — columnar hit_t (corona_common.h:129)."""
    t: jnp.ndarray      # [N] distance (MAX_DIST = miss)
    prim: jnp.ndarray   # [N] int32 global prim id (-1 = miss)
    u: jnp.ndarray      # [N] reference uv convention (triangle.h / prims.c)
    v: jnp.ndarray      # [N]

    @property
    def valid(self):
        return self.prim >= 0


def ray_tri_intersect(v0, e1, e2, org, direction):
    """Batched Moeller-Trumbore over a trailing candidate axis.

    org/direction: [N, 3]; v0/e1/e2: [N, K, 3] gathered candidates.
    Returns (t, u, v, hit_mask) each [N, K].  Barycentrics follow the
    reference's convention (triangle.h:262-300): hit->u weights vertex 2,
    hit->v weights vertex 1.
    """
    d = direction[..., None, :]
    o = org[..., None, :]
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) < 1e-20, 0.0, 1.0 / det)
    tvec = o - v0
    bv = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    bu = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    ok = (bv >= 0.0) & (bv <= 1.0) & (bu >= 0.0) & (bu + bv <= 1.0) & (t > 0.0)
    return t, bu, bv, ok


def ray_sphere_intersect(c, r, org, direction):
    """[N, K] candidates; returns nearest positive root."""
    o = org[..., None, :] - c
    b = jnp.sum(o * direction[..., None, :], axis=-1)
    cc = jnp.sum(o * o, axis=-1) - r * r
    disc = b * b - cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > 0.0, t0, t1)
    ok = (disc > 0.0) & (t > 0.0)
    return t, ok


def ray_cone_intersect(v0, v1, r0, r1, org, direction):
    """Truncated cone through circles (v0, r0) -> (v1, r1)
    (reference geo/line.h 'line segments are really truncated cones').

    All [N, K] candidates.  Returns (t, y_frac, ok) with y_frac in [0,1]
    the axial coordinate (the reference's hit->u along the fiber)."""
    axis = v1 - v0
    length = jnp.sqrt(jnp.maximum(jnp.sum(axis * axis, axis=-1), 1e-20))
    d_ax = axis / length[..., None]
    o = org[..., None, :] - v0
    w = direction[..., None, :]
    ya = jnp.sum(o * d_ax, axis=-1)
    wd = jnp.sum(w * d_ax, axis=-1)
    k = (r1 - r0) / length
    ow = jnp.sum(o * w, axis=-1)
    oo = jnp.sum(o * o, axis=-1)
    a = 1.0 - wd * wd - k * k * wd * wd
    b = 2.0 * (ow - ya * wd - k * wd * (r0 + k * ya))
    c = oo - ya * ya - (r0 + k * ya) ** 2
    # robust quadratic
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = -0.5 * (b + jnp.sign(b) * sq)
    asafe = jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    t0 = q / asafe
    t1 = jnp.where(jnp.abs(q) < 1e-20, MAX_DIST, c / jnp.where(jnp.abs(q) < 1e-20, 1.0, q))
    tlo = jnp.minimum(t0, t1)
    thi = jnp.maximum(t0, t1)

    def accept(t):
        y = ya + t * wd
        return (t > 0.0) & (y >= 0.0) & (y <= length)

    use_lo = accept(tlo)
    t = jnp.where(use_lo, tlo, thi)
    ok = (disc > 0.0) & accept(t)
    y = jnp.clip((ya + t * wd) / length, 0.0, 1.0)
    return t, y, ok


def _aabb_hit(nmin, nmax, org, inv_dir, t_max):
    """Slab test; nmin/nmax [N,3]."""
    t0 = (nmin - org) * inv_dir
    t1 = (nmax - org) * inv_dir
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(tn, axis=-1), 0.0)
    t_far = jnp.minimum(jnp.min(tf, axis=-1), t_max)
    return t_near <= t_far


def _traverse(bvh: DeviceBVH, test_leaf, org, direction, t_init, prim_init,
              u_init, v_init, any_hit=False):
    """Lockstep stackless traversal of one BVH for the whole wavefront.

    test_leaf(first, t_best, prim_best, u, v) -> updated (t, prim, u, v):
    intersects the LEAF_SIZE padded candidates at leaf offset ``first``.
    """
    n_nodes = bvh.node_skip.shape[0]
    inv_dir = 1.0 / jnp.where(jnp.abs(direction) < 1e-20,
                              jnp.where(direction < 0, -1e-20, 1e-20), direction)
    node0 = jnp.zeros(org.shape[:-1], jnp.int32)

    def cond(state):
        node, t, prim, u, v = state
        active = node < n_nodes
        if any_hit:
            active = active & (prim < 0)
        return jnp.any(active)

    def body(state):
        node, t, prim, u, v = state
        nclamp = jnp.minimum(node, n_nodes - 1)
        active = node < n_nodes
        if any_hit:
            active = active & (prim < 0)
        nmin = bvh.node_min[nclamp]
        nmax = bvh.node_max[nclamp]
        first = bvh.node_first[nclamp]
        skip = bvh.node_skip[nclamp]
        box_ok = _aabb_hit(nmin, nmax, org, inv_dir, t) & active
        is_leaf = first >= 0
        do_leaf = box_ok & is_leaf
        t2, prim2, u2, v2 = test_leaf(first, t, prim, u, v)
        t = jnp.where(do_leaf, t2, t)
        prim = jnp.where(do_leaf, prim2, prim)
        u = jnp.where(do_leaf, u2, u)
        v = jnp.where(do_leaf, v2, v)
        descend = box_ok & ~is_leaf
        nxt = jnp.where(descend, nclamp + 1, skip)
        node = jnp.where(active, nxt, node)
        return node, t, prim, u, v

    _, t, prim, u, v = jax.lax.while_loop(
        cond, body, (node0, t_init, prim_init, u_init, v_init))
    return t, prim, u, v


def intersect(geom: DeviceGeometry, org, direction, ignore_prim=None,
              t_max=None) -> Hit:
    """Closest hit for a wavefront of rays.  org/dir: [N, 3].

    ``ignore_prim`` reproduces the reference's primid self-intersection
    exclusion (ray->ignore, prims.c:380); callers should also offset the
    origin with utils.math.ray_offset.
    """
    n = org.shape[0]
    t = jnp.full((n,), MAX_DIST) if t_max is None else jnp.broadcast_to(t_max, (n,))
    prim = jnp.full((n,), INVALID_PRIM)
    u = jnp.zeros((n,))
    v = jnp.zeros((n,))
    ig = ignore_prim if ignore_prim is not None else jnp.full((n,), INVALID_PRIM)
    t_off = 0

    if geom.n_tris:
        def leaf_tri(first, t, prim, u, v):
            cand = geom.tri_bvh.leaf_prims[first[..., None] + jnp.arange(bvh_mod.LEAF_SIZE)]
            csafe = jnp.maximum(cand, 0)
            tt, bu, bv, ok = ray_tri_intersect(
                geom.tri_v0[csafe], geom.tri_e1[csafe], geom.tri_e2[csafe],
                org, direction)
            ok &= (cand >= 0) & (tt <= t[..., None]) & (cand != ig[..., None])
            tt = jnp.where(ok, tt, MAX_DIST)
            best = jnp.argmin(tt, axis=-1)
            tbest = jnp.take_along_axis(tt, best[..., None], axis=-1)[..., 0]
            win = tbest < t
            sel = lambda a: jnp.take_along_axis(a, best[..., None], axis=-1)[..., 0]
            return (jnp.where(win, tbest, t),
                    jnp.where(win, sel(cand), prim),
                    jnp.where(win, sel(bu), u),
                    jnp.where(win, sel(bv), v))
        t, prim, u, v = _traverse(geom.tri_bvh, leaf_tri, org, direction, t, prim, u, v)
        t_off = geom.n_tris

    if geom.n_spheres:
        s_off = t_off
        def leaf_sph(first, t, prim, u, v):
            cand = geom.sph_bvh.leaf_prims[first[..., None] + jnp.arange(bvh_mod.LEAF_SIZE)]
            csafe = jnp.maximum(cand, 0)
            gid = cand + s_off
            tt, ok = ray_sphere_intersect(geom.sph_c[csafe], geom.sph_r[csafe],
                                          org, direction)
            ok &= (cand >= 0) & (tt <= t[..., None]) & (gid != ig[..., None])
            tt = jnp.where(ok, tt, MAX_DIST)
            best = jnp.argmin(tt, axis=-1)
            tbest = jnp.take_along_axis(tt, best[..., None], axis=-1)[..., 0]
            win = tbest < t
            bid = jnp.take_along_axis(gid, best[..., None], axis=-1)[..., 0]
            return (jnp.where(win, tbest, t),
                    jnp.where(win, bid, prim), u, v)
        t, prim, u, v = _traverse(geom.sph_bvh, leaf_sph, org, direction, t, prim, u, v)

    if geom.n_lines:
        l_off = geom.n_tris + geom.n_spheres
        def leaf_line(first, t, prim, u, v):
            cand = geom.line_bvh.leaf_prims[first[..., None] + jnp.arange(bvh_mod.LEAF_SIZE)]
            csafe = jnp.maximum(cand, 0)
            gid = cand + l_off
            tt, y, ok = ray_cone_intersect(
                geom.line_v0[csafe], geom.line_v1[csafe],
                geom.line_r0[csafe], geom.line_r1[csafe], org, direction)
            ok &= (cand >= 0) & (tt <= t[..., None]) & (gid != ig[..., None])
            tt = jnp.where(ok, tt, MAX_DIST)
            best = jnp.argmin(tt, axis=-1)
            tbest = jnp.take_along_axis(tt, best[..., None], axis=-1)[..., 0]
            win = tbest < t
            bid = jnp.take_along_axis(gid, best[..., None], axis=-1)[..., 0]
            ybest = jnp.take_along_axis(y, best[..., None], axis=-1)[..., 0]
            return (jnp.where(win, tbest, t),
                    jnp.where(win, bid, prim),
                    jnp.where(win, ybest, u), v)
        t, prim, u, v = _traverse(geom.line_bvh, leaf_line, org, direction, t, prim, u, v)

    return Hit(t=t, prim=prim, u=u, v=v)


def occluded(geom: DeviceGeometry, org, direction, t_max, ignore_prim=None,
             ignore_prim2=None) -> jnp.ndarray:
    """Shadow-ray test: True where the segment [0, t_max] is blocked.
    Both endpoints' prims can be excluded (reference path_visible,
    src/pathspace.c:311)."""
    n = org.shape[0]
    ig = ignore_prim if ignore_prim is not None else jnp.full((n,), INVALID_PRIM)
    ig2 = ignore_prim2 if ignore_prim2 is not None else jnp.full((n,), INVALID_PRIM)
    prim = jnp.full((n,), INVALID_PRIM)
    u = jnp.zeros((n,))
    v = jnp.zeros((n,))
    t = jnp.asarray(t_max)

    if geom.n_tris:
        def leaf_tri(first, t, prim, u, v):
            cand = geom.tri_bvh.leaf_prims[first[..., None] + jnp.arange(bvh_mod.LEAF_SIZE)]
            csafe = jnp.maximum(cand, 0)
            tt, bu, bv, ok = ray_tri_intersect(
                geom.tri_v0[csafe], geom.tri_e1[csafe], geom.tri_e2[csafe],
                org, direction)
            ok &= (cand >= 0) & (tt < t[..., None]) & \
                (cand != ig[..., None]) & (cand != ig2[..., None])
            any_blocked = jnp.any(ok, axis=-1)
            hit_id = jnp.where(any_blocked, 0, -1)
            return t, jnp.where(prim >= 0, prim, hit_id), u, v
        _, prim, _, _ = _traverse(geom.tri_bvh, leaf_tri, org, direction,
                                  t, prim, u, v, any_hit=True)

    if geom.n_spheres:
        s_off = geom.n_tris
        def leaf_sph(first, t, prim, u, v):
            cand = geom.sph_bvh.leaf_prims[first[..., None] + jnp.arange(bvh_mod.LEAF_SIZE)]
            csafe = jnp.maximum(cand, 0)
            gid = cand + s_off
            tt, ok = ray_sphere_intersect(geom.sph_c[csafe], geom.sph_r[csafe],
                                          org, direction)
            ok &= (cand >= 0) & (tt < t[..., None]) & \
                (gid != ig[..., None]) & (gid != ig2[..., None])
            any_blocked = jnp.any(ok, axis=-1)
            hit_id = jnp.where(any_blocked, 0, -1)
            return t, jnp.where(prim >= 0, prim, hit_id), u, v
        _, prim, _, _ = _traverse(geom.sph_bvh, leaf_sph, org, direction,
                                  t, prim, u, v, any_hit=True)

    if geom.n_lines:
        l_off = geom.n_tris + geom.n_spheres
        def leaf_line(first, t, prim, u, v):
            cand = geom.line_bvh.leaf_prims[first[..., None] + jnp.arange(bvh_mod.LEAF_SIZE)]
            csafe = jnp.maximum(cand, 0)
            gid = cand + l_off
            tt, y, ok = ray_cone_intersect(
                geom.line_v0[csafe], geom.line_v1[csafe],
                geom.line_r0[csafe], geom.line_r1[csafe], org, direction)
            ok &= (cand >= 0) & (tt < t[..., None]) & \
                (gid != ig[..., None]) & (gid != ig2[..., None])
            any_blocked = jnp.any(ok, axis=-1)
            hit_id = jnp.where(any_blocked, 0, -1)
            return t, jnp.where(prim >= 0, prim, hit_id), u, v
        _, prim, _, _ = _traverse(geom.line_bvh, leaf_line, org, direction,
                                  t, prim, u, v, any_hit=True)

    return prim >= 0
