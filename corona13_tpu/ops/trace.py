"""Wavefront ray intersection on device.

TPU-native replacement for the reference's SIMD QBVH traversal + per-prim
intersectors (corona-13 src/accel.d/qbvhmp.c:1262-1389, include/geo/*.h):
the whole wavefront advances in lockstep through a stackless skip-link BVH
(one node pointer per ray, masked updates — no per-lane stacks), and leaf
primitives are tested LEAF_SIZE at a time with dense vectorized math.

Performance structure (the analogue of Aila & Laine's while-while kernel,
re-expressed for the VPU):

  * node records are packed into one [n_nodes, 8] f32 row (min, max,
    bitcast skip, bitcast first) so each traversal step issues a single
    gather;
  * the traversal is a two-level loop: an inner "walk" loop advances every
    lane through inner nodes until it parks at a leaf (cheap: one gather +
    slab test per step), and the outer loop runs the expensive leaf
    intersection only once per parked leaf front;
  * leaf primitive data is duplicated into leaf-slot-major packed arrays
    ([slots, 9] for triangles) so candidate fetches are one contiguous
    gather instead of three indirections.

Primitive kinds: triangles (quads pre-split at load), spheres, and lines
(truncated cones, used for hair/cylinders).  Each kind gets its own BVH so
leaves are type-homogeneous and the intersection math stays branch-free.

Global prim ids: [0, T) triangles, [T, T+S) spheres, [T+S, T+S+L) lines —
the analogue of the reference's primid_t (corona_common.h:45-55).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils.math import dot, normalize
from . import bvh as bvh_mod

INVALID_PRIM = jnp.int32(-1)
MAX_DIST = jnp.float32(3.4e38)
# prim-count threshold below which a dense all-candidates test replaces the
# BVH traversal (whole-wavefront while_loops cost HBM round trips per step)
BRUTE_FORCE_MAX = 64


def _on_tpu() -> bool:
    if jax.default_backend() != 'tpu':
        return False
    dd = jax.config.jax_default_device
    return dd is None or dd.platform == 'tpu'


def _use_pallas(tri_bvh) -> bool:
    """Route triangle traversal through the Pallas packet kernel on TPU
    (ops/trace_pallas.py) when the BVH fits the VMEM budget."""
    if os.environ.get('CORONA13_NO_PALLAS'):
        return False
    if not _on_tpu():
        return False
    from . import trace_pallas
    return trace_pallas.fits_vmem(tri_bvh)


@struct.dataclass
class DeviceBVH:
    nodes: jnp.ndarray       # [n_nodes, 8] f32: min3, max3, i32 skip, i32 first
    leaf_prims: jnp.ndarray  # [slots] i32 prim ids, padded with -1
    leaf_data: jnp.ndarray   # [slots, D] packed per-prim intersection data
    leaf_shade: jnp.ndarray  # [slots, 17] vn(9), uv(6), shader, quad_half —
    #   shading fetches become one contiguous row-gather by hit slot
    # wide (BVH8) layout for the Pallas packet kernel (triangles only):
    wbounds: jnp.ndarray = None   # [Wn, 8, 8] child boxes + push weights
    wlinks: jnp.ndarray = None    # [Wn*8] i32 child links
    leaf_packed: jnp.ndarray = None  # [n_leaves, 8, 16] v0,e1,e2,prim,pad
    # shutter-close leaf rows for motion blur (None = static scene); the
    # per-ray time lerps (v0, e1, e2) in the leaf test — edges are linear
    # in the vertices, so lerping the packed rows IS lerping the verts
    # (reference qbvhmp.c:62-81 dual-time nodes + retime leaf test)
    leaf_data_t1: jnp.ndarray = None  # [slots, D]

    @classmethod
    def from_host(cls, b: bvh_mod.FlatBVH, leaf_data: np.ndarray,
                  leaf_shade: np.ndarray | None = None,
                  leaf_data_t1: np.ndarray | None = None) -> 'DeviceBVH':
        packed = np.concatenate([
            b.node_min, b.node_max,
            b.node_skip[:, None].view(np.float32),
            b.node_first[:, None].view(np.float32)], axis=1)
        if leaf_shade is None:
            leaf_shade = np.zeros((len(b.leaf_prims), 17), np.float32)
        wbounds = wlinks = leaf_packed = None
        if leaf_data.shape[-1] == 9 and len(b.leaf_prims):
            # triangle BVH: build the wide layout for the packet kernel
            wb, wl, wdepth = bvh_mod.collapse8(b)
            n_leaves = len(b.leaf_prims) // bvh_mod.LEAF_SIZE
            lp = np.zeros((n_leaves, bvh_mod.LEAF_SIZE, 16), np.float32)
            lp[:, :, 0:9] = leaf_data.reshape(n_leaves, bvh_mod.LEAF_SIZE, 9)
            lp[:, :, 9] = b.leaf_prims.reshape(
                n_leaves, bvh_mod.LEAF_SIZE).astype(np.float32)
            # stack-overflow guard: each inner pop pushes <= 8 (net +7),
            # so worst case is depth * 7 + 8 entries; a deeper (degenerate)
            # tree must take the XLA skip-link path instead of silently
            # overflowing the kernel's SMEM stack
            from . import trace_pallas
            if wdepth * 7 + 8 <= trace_pallas.MAX_STACK:
                wbounds = jnp.asarray(wb)
                wlinks = jnp.asarray(wl)
                leaf_packed = jnp.asarray(lp)
        return cls(nodes=jnp.asarray(packed),
                   leaf_prims=jnp.asarray(b.leaf_prims),
                   leaf_data=jnp.asarray(leaf_data),
                   leaf_shade=jnp.asarray(leaf_shade),
                   wbounds=wbounds, wlinks=wlinks, leaf_packed=leaf_packed,
                   leaf_data_t1=(jnp.asarray(leaf_data_t1)
                                 if leaf_data_t1 is not None else None))

    @property
    def n_nodes(self):
        return self.nodes.shape[0]


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
    # global prim id -> leaf-major slot map (shading by slot row)
    tri_prim_slot: jnp.ndarray = None
    # motion blur (shutter-close states; None = static).  BVH bounds are
    # the (t0, t1) union, so traversal is conservative and only the leaf
    # tests resolve per-ray time (qbvhmp.c retime analogue).
    sph_c_t1: jnp.ndarray = None    # [S, 3]
    has_motion: bool = struct.field(pytree_node=False, default=False)

    @property
    def n_tris(self):
        return self.tri_v0.shape[0]

    @property
    def n_spheres(self):
        return self.sph_c.shape[0]

    @property
    def n_lines(self):
        return self.line_v0.shape[0]


def make_device_geometry(tri_v=None, tri_vn=None, tri_uv=None,
                         tri_quad_half=None, tri_shader=None,
                         sph_c=None, sph_r=None, sph_shader=None,
                         line_vtx=None, line_radii=None, line_shader=None,
                         tri_v_t1=None, sph_c_t1=None,
                         ) -> DeviceGeometry:
    """Build BVHs + packed leaf data from host triangle/sphere/line soup.

    tri_v: [T, 3, 3] vertices; tri_vn [T, 3, 3]; tri_uv [T, 3, 2];
    line_vtx [L, 2, 3]; line_radii [L, 2].
    """
    f32 = np.float32
    tri_v = np.zeros((0, 3, 3), f32) if tri_v is None else np.asarray(tri_v, f32)
    T = len(tri_v)
    tri_vn = np.zeros((T, 3, 3), f32) if tri_vn is None else np.asarray(tri_vn, f32)
    tri_uv = np.zeros((T, 3, 2), f32) if tri_uv is None else np.asarray(tri_uv, f32)
    tri_quad_half = (np.zeros((T,), np.int32) if tri_quad_half is None
                     else np.asarray(tri_quad_half, np.int32))
    tri_shader = (np.zeros((T,), np.int32) if tri_shader is None
                  else np.asarray(tri_shader, np.int32))
    sph_c = np.zeros((0, 3), f32) if sph_c is None else np.asarray(sph_c, f32)
    sph_r = np.zeros((0,), f32) if sph_r is None else np.asarray(sph_r, f32)
    S = len(sph_r)
    sph_shader = (np.zeros((S,), np.int32) if sph_shader is None
                  else np.asarray(sph_shader, np.int32))
    line_vtx = np.zeros((0, 2, 3), f32) if line_vtx is None else np.asarray(line_vtx, f32)
    line_radii = np.zeros((0, 2), f32) if line_radii is None else np.asarray(line_radii, f32)
    L = len(line_radii)
    line_shader = (np.zeros((L,), np.int32) if line_shader is None
                   else np.asarray(line_shader, np.int32))

    e1 = tri_v[:, 1] - tri_v[:, 0]
    e2 = tri_v[:, 2] - tri_v[:, 0]
    has_motion = tri_v_t1 is not None or sph_c_t1 is not None
    if tri_v_t1 is not None:
        tri_v_t1 = np.asarray(tri_v_t1, f32)
    if sph_c_t1 is not None:
        sph_c_t1 = np.asarray(sph_c_t1, f32)

    tb = bvh_mod.build_bvh(*bvh_mod.tri_bounds(tri_v, tri_v_t1)) if T else \
        bvh_mod.build_bvh(np.zeros((0, 3), f32), np.zeros((0, 3), f32))
    sb = bvh_mod.build_bvh(*bvh_mod.sphere_bounds(sph_c, sph_r, sph_c_t1))
    lb = bvh_mod.build_bvh(*bvh_mod.line_bounds(line_vtx, line_radii))

    def pack(bvh, data, width):
        """Leaf-slot-major packed data: row i = data of leaf_prims[i]."""
        slots = np.maximum(bvh.leaf_prims, 0)
        out = data[slots] if len(data) else np.zeros((len(slots), width), f32)
        return out.astype(f32)

    tri_data = np.concatenate([tri_v[:, 0], e1, e2], axis=1) if T else np.zeros((0, 9), f32)
    tri_data_t1 = None
    if tri_v_t1 is not None and T:
        e1_t1 = tri_v_t1[:, 1] - tri_v_t1[:, 0]
        e2_t1 = tri_v_t1[:, 2] - tri_v_t1[:, 0]
        tri_data_t1 = np.concatenate([tri_v_t1[:, 0], e1_t1, e2_t1], axis=1)
    tri_shade = (np.concatenate([
        tri_vn.reshape(T, 9), tri_uv.reshape(T, 6),
        tri_shader[:, None].astype(f32),
        tri_quad_half[:, None].astype(f32)], axis=1)
        if T else np.zeros((0, 17), f32))
    sph_data = np.concatenate([sph_c, sph_r[:, None]], axis=1) if S else np.zeros((0, 4), f32)
    line_data = np.concatenate([line_vtx[:, 0], line_vtx[:, 1], line_radii],
                               axis=1) if L else np.zeros((0, 8), f32)

    # prim -> leaf slot map
    prim_slot = np.full(max(T, 1), -1, np.int32)
    lp = tb.leaf_prims
    prim_slot[lp[lp >= 0]] = np.nonzero(lp >= 0)[0].astype(np.int32)

    return DeviceGeometry(
        tri_v0=jnp.asarray(tri_v[:, 0]), tri_e1=jnp.asarray(e1),
        tri_e2=jnp.asarray(e2), tri_vn=jnp.asarray(tri_vn),
        tri_uv=jnp.asarray(tri_uv), tri_shader=jnp.asarray(tri_shader),
        tri_quad_half=jnp.asarray(tri_quad_half),
        sph_c=jnp.asarray(sph_c), sph_r=jnp.asarray(sph_r),
        sph_shader=jnp.asarray(sph_shader),
        line_v0=jnp.asarray(line_vtx[:, 0]) if L else jnp.zeros((0, 3)),
        line_v1=jnp.asarray(line_vtx[:, 1]) if L else jnp.zeros((0, 3)),
        line_r0=jnp.asarray(line_radii[:, 0]) if L else jnp.zeros((0,)),
        line_r1=jnp.asarray(line_radii[:, 1]) if L else jnp.zeros((0,)),
        line_shader=jnp.asarray(line_shader),
        tri_bvh=DeviceBVH.from_host(
            tb, pack(tb, tri_data, 9), pack(tb, tri_shade, 17),
            leaf_data_t1=(pack(tb, tri_data_t1, 9)
                          if tri_data_t1 is not None else None)),
        sph_bvh=DeviceBVH.from_host(sb, pack(sb, sph_data, 4)),
        line_bvh=DeviceBVH.from_host(lb, pack(lb, line_data, 8)),
        tri_prim_slot=jnp.asarray(prim_slot),
        sph_c_t1=(jnp.asarray(sph_c_t1) if sph_c_t1 is not None else None),
        has_motion=has_motion)


@struct.dataclass
class Hit:
    """Wavefront hit record — columnar hit_t (corona_common.h:129)."""
    t: jnp.ndarray      # [N] distance (MAX_DIST = miss)
    prim: jnp.ndarray   # [N] int32 global prim id (-1 = miss)
    u: jnp.ndarray      # [N] reference uv convention (triangle.h / prims.c)
    v: jnp.ndarray      # [N]
    slot: jnp.ndarray   # [N] i32 leaf-major slot (triangle hits; -1 else)

    @property
    def valid(self):
        return self.prim >= 0


def ray_tri_intersect_packed(rows, org, direction):
    """Moeller-Trumbore over packed candidate rows [N, K, 9] = (v0, e1, e2).

    Returns (t, u, v, hit_mask) each [N, K].  Barycentrics follow the
    reference's convention (triangle.h:262-300): hit->u weights vertex 2,
    hit->v weights vertex 1."""
    v0 = rows[..., 0:3]
    e1 = rows[..., 3:6]
    e2 = rows[..., 6:9]
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


def ray_tri_intersect(v0, e1, e2, org, direction):
    """Compatibility wrapper over separate v0/e1/e2 candidate arrays."""
    return ray_tri_intersect_packed(
        jnp.concatenate([v0, e1, e2], axis=-1), org, direction)


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


def _traverse(bvh: DeviceBVH, test_leaf, org, inv_dir, t_init, prim_init,
              u_init, v_init, any_hit=False, extra=None):
    """While-while lockstep traversal of one BVH for the whole wavefront.

    test_leaf(first, t_best, prim_best, u, v, extra) -> updated
    (t, prim, u, v, extra): intersects the LEAF_SIZE padded candidates at
    leaf offset ``first``; ``extra`` is an opaque per-lane i32 carried
    through (the winning slot for triangle shading).

    Inner loop: every lane walks inner nodes (1 packed gather + slab test
    per step) until it parks at a hit leaf or terminates.  Outer loop runs
    the leaf primitive test once per parked front.
    """
    if extra is None:
        extra = prim_init
    n_nodes = bvh.n_nodes
    # derive from a traversal input so the carry carries the same varying
    # manual axes as the body outputs under shard_map (see shard_map VMA)
    node0 = (prim_init & 0)

    def fetch(node):
        row = bvh.nodes[jnp.minimum(node, n_nodes - 1)]
        nmin = row[..., 0:3]
        nmax = row[..., 3:6]
        skip = jax.lax.bitcast_convert_type(row[..., 6], jnp.int32)
        first = jax.lax.bitcast_convert_type(row[..., 7], jnp.int32)
        return nmin, nmax, skip, first

    def slab(nmin, nmax, t_max):
        t0 = (nmin - org) * inv_dir
        t1 = (nmax - org) * inv_dir
        tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), 0.0)
        tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), t_max)
        return tn <= tf

    def active_of(node, prim):
        a = node < n_nodes
        if any_hit:
            a = a & (prim < 0)
        return a

    def walk_cond(state):
        node, parked, t, prim = state
        return jnp.any(active_of(node, prim) & ~parked)

    def walk_body(state):
        node, parked, t, prim = state
        nmin, nmax, skip, first = fetch(node)
        active = active_of(node, prim) & ~parked
        box_ok = slab(nmin, nmax, t) & active
        is_leaf = first >= 0
        park_now = box_ok & is_leaf
        nxt = jnp.where(box_ok & ~is_leaf, node + 1, skip)
        node = jnp.where(active & ~park_now, nxt, node)
        parked = parked | park_now
        return node, parked, t, prim

    def outer_cond(state):
        node, t, prim, u, v, extra = state
        return jnp.any(active_of(node, prim))

    def outer_body(state):
        node, t, prim, u, v, extra = state
        parked0 = node < 0  # all-False, varying like node
        node, parked, _, _ = jax.lax.while_loop(
            walk_cond, walk_body, (node, parked0, t, prim))
        # leaf test for parked lanes
        _, _, skip, first = fetch(node)
        t2, prim2, u2, v2, e2 = test_leaf(jnp.maximum(first, 0),
                                          t, prim, u, v, extra)
        t = jnp.where(parked, t2, t)
        prim = jnp.where(parked, prim2, prim)
        u = jnp.where(parked, u2, u)
        v = jnp.where(parked, v2, v)
        extra = jnp.where(parked, e2, extra)
        node = jnp.where(parked, skip, node)
        return node, t, prim, u, v, extra

    _, t, prim, u, v, extra = jax.lax.while_loop(
        outer_cond, outer_body,
        (node0, t_init, prim_init, u_init, v_init, extra))
    return t, prim, u, v, extra


def _inv_dir(direction):
    return 1.0 / jnp.where(jnp.abs(direction) < 1e-20,
                           jnp.where(direction < 0, -1e-20, 1e-20), direction)


# rays per launch above which bounce-ray sorting pays for itself (the sort
# costs ~2 gathers of the ray SoA + one u32 key sort; the win is packet
# coherence in the shared-stack Pallas kernel, whose cost is the *union*
# traversal of each 1024-ray tile)
SORT_MIN_RAYS = 65536


def _part1by2(x):
    """Spread bits of a 6-bit int x so they occupy every 3rd bit."""
    x = x & 0x3f
    x = (x | (x << 8)) & 0x300f
    x = (x | (x << 4)) & 0x30c3
    x = (x | (x << 2)) & 0x9249
    return x


def _sort_keys(bvh, org, direction, t_act):
    """Coherence sort key per ray: [dead/alive | origin Morton-18 | dir
    octant].  Dead rays (t_act <= 0) group together and their tiles exit
    traversal at the root immediately — sorting doubles as compaction."""
    root = bvh.nodes[0]
    lo = root[0:3]
    ext = jnp.maximum(root[3:6] - lo, 1e-6)
    q = jnp.clip((org - lo) / ext * 64.0, 0.0, 63.0).astype(jnp.uint32)
    m = (_part1by2(q[..., 0]) | (_part1by2(q[..., 1]) << 1)
         | (_part1by2(q[..., 2]) << 2))
    # direction-major: a tile must share a direction cone for its union
    # traversal to shrink — rays from one region going everywhere still
    # touch the whole tree (octants beat finer cones: position locality
    # is worth more than the extra direction bits, measured on 0010_pt)
    octant = ((direction[..., 0] < 0).astype(jnp.uint32)
              | ((direction[..., 1] < 0).astype(jnp.uint32) << 1)
              | ((direction[..., 2] < 0).astype(jnp.uint32) << 2))
    alive = (t_act > 0.0).astype(jnp.uint32)
    return ((1 - alive) << 21) | (octant << 18) | m


def _sorted_traverse(fn, bvh, org, direction, t, *int_args):
    """Run the Pallas traversal with rays in Morton/octant order and
    un-permute results.  fn(org, dir, t, *int_args) -> tuple of [N].

    Cost discipline (measured on TPU v5e, 589k rays): a single gather by a
    random index vector costs ~8 ms and a ``.at[].set`` scatter the same,
    but one *variadic* ``lax.sort`` moving 12 payload columns costs ~8 ms
    total — so both the forward permutation and the un-permutation ride
    variadic sorts (keyed by the Morton code, then by the carried original
    index) and no gather/scatter appears anywhere."""
    n = org.shape[0]
    if n < SORT_MIN_RAYS or os.environ.get('CORONA13_NO_SORT'):
        return fn(org, direction, t, *int_args)
    keys = _sort_keys(bvh, org, direction, t)
    iota = jnp.arange(n, dtype=jnp.int32)
    cols = (org[:, 0], org[:, 1], org[:, 2],
            direction[:, 0], direction[:, 1], direction[:, 2], t)
    sorted_ = jax.lax.sort((keys,) + cols + tuple(int_args) + (iota,),
                           num_keys=1)
    ox, oy, oz, dx, dy, dz, ts = sorted_[1:8]
    ints = sorted_[8:8 + len(int_args)]
    perm = sorted_[-1]
    outs = fn(jnp.stack([ox, oy, oz], axis=-1),
              jnp.stack([dx, dy, dz], axis=-1), ts, *ints)
    unsorted = jax.lax.sort((perm,) + tuple(outs), num_keys=1)
    return tuple(unsorted[1:])


def _closest_select(tt, ok, t, prim, u, v, cand, uu=None, vv=None,
                    slot=None, cand_slot=None):
    """Reduce [N, K] candidate hits into the per-lane best."""
    tt = jnp.where(ok, tt, MAX_DIST)
    best = jnp.argmin(tt, axis=-1)
    sel = lambda a: jnp.take_along_axis(a, best[..., None], axis=-1)[..., 0]
    tbest = sel(tt)
    win = tbest < t
    out = (jnp.where(win, tbest, t),
           jnp.where(win, sel(cand), prim),
           jnp.where(win, sel(uu), u) if uu is not None else u,
           jnp.where(win, sel(vv), v) if vv is not None else v)
    if slot is None:
        return out
    return out + (jnp.where(win, sel(cand_slot), slot),)



def intersect(geom: DeviceGeometry, org, direction, ignore_prim=None,
              t_max=None, time=None) -> Hit:
    """Closest hit for a wavefront of rays.  org/dir: [N, 3].

    ``time`` [N] in [0, 1]: shutter-relative ray times for motion-blurred
    scenes (geom.has_motion); the leaf tests lerp triangle vertices /
    sphere centers per ray (reference qbvhmp.c:62-81 retime).  Ignored
    for static scenes.

    ``ignore_prim`` reproduces the reference's primid self-intersection
    exclusion (ray->ignore, prims.c:380); callers should also offset the
    origin with utils.math.ray_offset.

    Differentiability: path structure (hit distance/prim/uv) is treated as
    *detached* discrete structure — gradients w.r.t. scene/shading/camera
    parameters flow through the shading math around the hits, not through
    the traversal (detached-sampling estimator; visibility jumps are
    non-differentiable anyway).  This also lets the traversal use
    ``lax.while_loop``, which has no reverse-mode rule.
    """
    org = jax.lax.stop_gradient(org)
    direction = jax.lax.stop_gradient(direction)
    if t_max is not None:
        t_max = jax.lax.stop_gradient(t_max)
    n = org.shape[0]
    zero = org[..., 0] * 0.0  # varying-aware zero (shard_map VMA)
    t = zero + MAX_DIST if t_max is None else jnp.broadcast_to(t_max, (n,)) + zero
    prim = zero.astype(jnp.int32) + INVALID_PRIM
    u = zero
    v = zero
    hslot = prim  # leaf-major slot of the winning triangle hit
    ig = ignore_prim if ignore_prim is not None else prim
    inv_dir = _inv_dir(direction)
    ls = jnp.arange(bvh_mod.LEAF_SIZE)
    moving = geom.has_motion and time is not None
    tm = jax.lax.stop_gradient(time) if moving else None

    if geom.n_tris:
        if _use_pallas(geom.tri_bvh) and not moving:
            from . import trace_pallas

            def _run(o, d, tt, igp):
                return trace_pallas.traverse_tris(
                    geom.tri_bvh.wbounds, geom.tri_bvh.wlinks,
                    geom.tri_bvh.leaf_packed, o, d, tt, igp)
            t, prim, u, v, hslot = _sorted_traverse(
                _run, geom.tri_bvh, org, direction, t, ig)
        else:
            def leaf_tri(first, t, prim, u, v, hslot):
                cslot = first[..., None] + ls
                cand = geom.tri_bvh.leaf_prims[cslot]
                rows = geom.tri_bvh.leaf_data[cslot]
                if moving and geom.tri_bvh.leaf_data_t1 is not None:
                    rows1 = geom.tri_bvh.leaf_data_t1[cslot]
                    w1 = tm[..., None, None]
                    rows = rows * (1.0 - w1) + rows1 * w1
                tt, bu, bv, ok = ray_tri_intersect_packed(rows, org, direction)
                ok &= (cand >= 0) & (tt <= t[..., None]) & (cand != ig[..., None])
                return _closest_select(
                    tt, ok, t, prim, u, v, cand, bu, bv,
                    slot=hslot,
                    cand_slot=jnp.broadcast_to(cslot, tt.shape))
            t, prim, u, v, hslot = _traverse(
                geom.tri_bvh, leaf_tri, org, inv_dir, t, prim, u, v,
                extra=hslot)

    if geom.n_spheres:
        s_off = geom.n_tris
        sph_c = geom.sph_c
        if moving and geom.sph_c_t1 is not None:
            w1 = tm[..., None, None]
            sph_c = geom.sph_c[None] * (1.0 - w1) + geom.sph_c_t1[None] * w1
        else:
            sph_c = geom.sph_c[None]
        if geom.n_spheres <= BRUTE_FORCE_MAX:
            # tiny prim set: one dense candidate test beats a lockstep
            # traversal loop (no gathers, no while_loop HBM round trips)
            cand = jnp.arange(geom.n_spheres, dtype=jnp.int32)
            gid = cand + s_off
            tt, ok = ray_sphere_intersect(sph_c, geom.sph_r[None],
                                          org, direction)
            ok &= (tt <= t[..., None]) & (gid[None] != ig[..., None])
            t, prim, u, v = _closest_select(tt, ok, t, prim, u, v,
                                            jnp.broadcast_to(gid, tt.shape))
        else:
            def leaf_sph(first, t, prim, u, v, ex):
                cslot = first[..., None] + ls
                cand = geom.sph_bvh.leaf_prims[cslot]
                rows = geom.sph_bvh.leaf_data[cslot]
                gid = cand + s_off
                tt, ok = ray_sphere_intersect(rows[..., 0:3], rows[..., 3],
                                              org, direction)
                ok &= (cand >= 0) & (tt <= t[..., None]) & (gid != ig[..., None])
                return _closest_select(tt, ok, t, prim, u, v, gid) + (ex,)
            t, prim, u, v, _ = _traverse(geom.sph_bvh, leaf_sph, org, inv_dir,
                                         t, prim, u, v)

    if geom.n_lines:
        l_off = geom.n_tris + geom.n_spheres
        if geom.n_lines <= BRUTE_FORCE_MAX:
            cand = jnp.arange(geom.n_lines, dtype=jnp.int32)
            gid = cand + l_off
            tt, y, ok = ray_cone_intersect(
                geom.line_v0[None], geom.line_v1[None],
                geom.line_r0[None], geom.line_r1[None], org, direction)
            ok &= (tt <= t[..., None]) & (gid[None] != ig[..., None])
            t, prim, u, v = _closest_select(tt, ok, t, prim, u, v,
                                            jnp.broadcast_to(gid, tt.shape), y)
        else:
            def leaf_line(first, t, prim, u, v, ex):
                cslot = first[..., None] + ls
                cand = geom.line_bvh.leaf_prims[cslot]
                rows = geom.line_bvh.leaf_data[cslot]
                gid = cand + l_off
                tt, y, ok = ray_cone_intersect(
                    rows[..., 0:3], rows[..., 3:6], rows[..., 6], rows[..., 7],
                    org, direction)
                ok &= (cand >= 0) & (tt <= t[..., None]) & (gid != ig[..., None])
                return _closest_select(tt, ok, t, prim, u, v, gid, y) + (ex,)
            t, prim, u, v, _ = _traverse(geom.line_bvh, leaf_line, org, inv_dir,
                                         t, prim, u, v)

    return Hit(t=t, prim=prim, u=u, v=v, slot=hslot)


def occluded(geom: DeviceGeometry, org, direction, t_max, ignore_prim=None,
             ignore_prim2=None, time=None) -> jnp.ndarray:
    """Shadow-ray test: True where the segment [0, t_max] is blocked.
    Both endpoints' prims can be excluded (reference path_visible,
    src/pathspace.c:311).  Detached like :func:`intersect`; traversal
    early-outs per lane on the first blocker (any-hit).  ``time`` as in
    :func:`intersect` (shadow rays share the path's shutter time)."""
    org = jax.lax.stop_gradient(org)
    direction = jax.lax.stop_gradient(direction)
    t_max = jax.lax.stop_gradient(t_max)
    n = org.shape[0]
    zero = org[..., 0] * 0.0
    prim = zero.astype(jnp.int32) + INVALID_PRIM
    ig = ignore_prim if ignore_prim is not None else prim
    ig2 = ignore_prim2 if ignore_prim2 is not None else prim
    u = zero
    v = zero
    t = jnp.broadcast_to(jnp.asarray(t_max), (n,)) + zero
    inv_dir = _inv_dir(direction)
    ls = jnp.arange(bvh_mod.LEAF_SIZE)
    moving = geom.has_motion and time is not None
    tm = jax.lax.stop_gradient(time) if moving else None

    def any_hit_reduce(tt, ok, t, prim, u, v, ex):
        hit_now = jnp.any(ok, axis=-1)
        return (t, jnp.where(prim >= 0, prim, jnp.where(hit_now, 0, -1)),
                u, v, ex)

    if geom.n_tris:
        if _use_pallas(geom.tri_bvh) and not moving:
            from . import trace_pallas

            def _run(o, d, tt, igp, igp2):
                return trace_pallas.traverse_tris(
                    geom.tri_bvh.wbounds, geom.tri_bvh.wlinks,
                    geom.tri_bvh.leaf_packed, o, d, tt, igp, igp2,
                    any_hit=True)
            _, prim, _, _, _ = _sorted_traverse(
                _run, geom.tri_bvh, org, direction, t, ig, ig2)
        else:
            def leaf_tri(first, t, prim, u, v, ex):
                cslot = first[..., None] + ls
                cand = geom.tri_bvh.leaf_prims[cslot]
                rows = geom.tri_bvh.leaf_data[cslot]
                if moving and geom.tri_bvh.leaf_data_t1 is not None:
                    rows1 = geom.tri_bvh.leaf_data_t1[cslot]
                    w1 = tm[..., None, None]
                    rows = rows * (1.0 - w1) + rows1 * w1
                tt, bu, bv, ok = ray_tri_intersect_packed(rows, org, direction)
                ok &= (cand >= 0) & (tt < t[..., None]) & \
                    (cand != ig[..., None]) & (cand != ig2[..., None])
                return any_hit_reduce(tt, ok, t, prim, u, v, ex)
            _, prim, _, _, _ = _traverse(geom.tri_bvh, leaf_tri, org, inv_dir,
                                         t, prim, u, v, any_hit=True)

    if geom.n_spheres:
        s_off = geom.n_tris
        if moving and geom.sph_c_t1 is not None:
            w1 = tm[..., None, None]
            sph_cb = geom.sph_c[None] * (1.0 - w1) + geom.sph_c_t1[None] * w1
        else:
            sph_cb = geom.sph_c[None]
        if geom.n_spheres <= BRUTE_FORCE_MAX:
            gid = jnp.arange(geom.n_spheres, dtype=jnp.int32) + s_off
            tt, ok = ray_sphere_intersect(sph_cb, geom.sph_r[None],
                                          org, direction)
            ok &= (tt < t[..., None]) & (gid[None] != ig[..., None]) & \
                (gid[None] != ig2[..., None])
            prim = jnp.where(prim >= 0, prim,
                             jnp.where(jnp.any(ok, axis=-1), 0, -1))
        else:
            def leaf_sph(first, t, prim, u, v, ex):
                cslot = first[..., None] + ls
                cand = geom.sph_bvh.leaf_prims[cslot]
                rows = geom.sph_bvh.leaf_data[cslot]
                gid = cand + s_off
                tt, ok = ray_sphere_intersect(rows[..., 0:3], rows[..., 3],
                                              org, direction)
                ok &= (cand >= 0) & (tt < t[..., None]) & \
                    (gid != ig[..., None]) & (gid != ig2[..., None])
                return any_hit_reduce(tt, ok, t, prim, u, v, ex)
            _, prim, _, _, _ = _traverse(geom.sph_bvh, leaf_sph, org, inv_dir,
                                         t, prim, u, v, any_hit=True)

    if geom.n_lines:
        l_off = geom.n_tris + geom.n_spheres
        if geom.n_lines <= BRUTE_FORCE_MAX:
            gid = jnp.arange(geom.n_lines, dtype=jnp.int32) + l_off
            tt, y, ok = ray_cone_intersect(
                geom.line_v0[None], geom.line_v1[None],
                geom.line_r0[None], geom.line_r1[None], org, direction)
            ok &= (tt < t[..., None]) & (gid[None] != ig[..., None]) & \
                (gid[None] != ig2[..., None])
            prim = jnp.where(prim >= 0, prim,
                             jnp.where(jnp.any(ok, axis=-1), 0, -1))
        else:
            def leaf_line(first, t, prim, u, v, ex):
                cslot = first[..., None] + ls
                cand = geom.line_bvh.leaf_prims[cslot]
                rows = geom.line_bvh.leaf_data[cslot]
                gid = cand + l_off
                tt, y, ok = ray_cone_intersect(
                    rows[..., 0:3], rows[..., 3:6], rows[..., 6], rows[..., 7],
                    org, direction)
                ok &= (cand >= 0) & (tt < t[..., None]) & \
                    (gid != ig[..., None]) & (gid != ig2[..., None])
                return any_hit_reduce(tt, ok, t, prim, u, v, ex)
            _, prim, _, _, _ = _traverse(geom.line_bvh, leaf_line, org,
                                         inv_dir, t, prim, u, v,
                                         any_hit=True)

    return prim >= 0
