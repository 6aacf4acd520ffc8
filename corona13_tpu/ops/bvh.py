"""Host-side BVH construction (binned SAH) with a flat, stackless layout.

TPU-native re-design of the reference's 4-wide SIMD QBVH
(corona-13 src/accel.d/qbvhmp.c): instead of a wide tree traversed with a
per-thread stack, we build a binary SAH tree and flatten it in DFS order
with *skip links*, so traversal on device is a single node pointer walked
by a lockstep while-loop — no per-lane stack, which is the representation
that maps onto the VPU/Pallas (see ops/trace.py).

The builder runs on host in numpy at scene-load time (the reference builds
its BVH on the CPU pool too, qbvhmp.c:877-1067) and the arrays are uploaded
once per scene.

Layout (all arrays length = number of nodes, DFS/preorder):
  node_min/max [N, 3]  AABB
  node_skip    [N]     next node when the AABB test fails (or after a leaf)
  node_first   [N]     first entry in ``leaf_prims`` for leaves, -1 for inner
  leaf_prims   [M]     primitive indices, each leaf padded to LEAF_SIZE with -1
On an AABB hit at an inner node, traversal continues at node+1 (the near
child is first in DFS order).
"""

from __future__ import annotations

import dataclasses

import numpy as np

# prims/leaf: on the VPU the leaf test is dense vector math, so deeper
# leaves beat deeper trees (fewer gather-bound walk steps); the reference's
# SIMD width argument (qbvhmp.c 4-wide SSE) lands at 4 on CPU, 8+ here.
# Env-tunable for kernel experiments (a larger leaf = fewer while-loop
# iterations in the packet kernel at more dense MT work per step).
import os as _os
LEAF_SIZE = int(_os.environ.get('C13_LEAF_SIZE', '8'))
SAH_BINS = 16


@dataclasses.dataclass
class FlatBVH:
    node_min: np.ndarray   # [N, 3] float32
    node_max: np.ndarray   # [N, 3] float32
    node_skip: np.ndarray  # [N] int32
    node_first: np.ndarray # [N] int32 (-1 = inner node)
    node_right: np.ndarray # [N] int32 right child (-1 for leaves); left = i+1
    leaf_prims: np.ndarray # [M] int32, padded with -1
    n_prims: int


def _empty_bvh() -> FlatBVH:
    return FlatBVH(
        node_min=np.full((1, 3), np.inf, np.float32),
        node_max=np.full((1, 3), -np.inf, np.float32),
        node_skip=np.array([1], np.int32),
        node_first=np.array([0], np.int32),
        node_right=np.array([-1], np.int32),
        leaf_prims=np.full(LEAF_SIZE, -1, np.int32),
        n_prims=0,
    )


def build_bvh(prim_min: np.ndarray, prim_max: np.ndarray) -> FlatBVH:
    """Binned-SAH binary BVH over primitive AABBs.

    prim_min/prim_max: [P, 3].  Equivalent role to the reference's binned
    SAH build (qbvhmp.c:93-170): the hot path is the native C++ builder
    (corona13_tpu/native/bvh_build.cc, compiled on first use); this numpy
    implementation is the reference/fallback.
    """
    p_min = np.asarray(prim_min, np.float32)
    p_max = np.asarray(prim_max, np.float32)
    n = len(p_min)
    if n == 0:
        return _empty_bvh()

    native = _build_bvh_native(p_min, p_max)
    if native is not None:
        return native
    cent = 0.5 * (p_min + p_max)

    # recursion via explicit stack; children emitted in DFS preorder.
    nodes_min, nodes_max, nodes_first, parent_of, is_right = [], [], [], [], []
    leaf_prims: list[np.ndarray] = []

    def emit(idx_set, parent, right):
        nodes_min.append(p_min[idx_set].min(axis=0))
        nodes_max.append(p_max[idx_set].max(axis=0))
        nodes_first.append(-1)
        parent_of.append(parent)
        is_right.append(right)
        return len(nodes_min) - 1

    # worklist DFS so preorder holds: process left child immediately
    stack = [(np.arange(n), -1, False)]
    while stack:
        idx_set, parent, right = stack.pop()
        me = emit(idx_set, parent, right)
        if len(idx_set) <= LEAF_SIZE:
            nodes_first[me] = len(leaf_prims) * LEAF_SIZE
            pad = np.full(LEAF_SIZE, -1, np.int64)
            pad[:len(idx_set)] = idx_set
            leaf_prims.append(pad)
            continue
        c = cent[idx_set]
        lo = c.min(axis=0)
        hi = c.max(axis=0)
        ext = hi - lo
        axis = int(np.argmax(ext))
        if ext[axis] <= 1e-12:
            # degenerate: median split by index
            half = len(idx_set) // 2
            left_sel = np.zeros(len(idx_set), bool)
            left_sel[:half] = True
        else:
            # binned SAH along the widest centroid axis
            bins = np.minimum(
                ((c[:, axis] - lo[axis]) / ext[axis] * SAH_BINS).astype(np.int64),
                SAH_BINS - 1)
            bin_count = np.bincount(bins, minlength=SAH_BINS)
            bmin = np.full((SAH_BINS, 3), np.inf, np.float32)
            bmax = np.full((SAH_BINS, 3), -np.inf, np.float32)
            for k in range(3):
                np.minimum.at(bmin[:, k], bins, p_min[idx_set][:, k])
                np.maximum.at(bmax[:, k], bins, p_max[idx_set][:, k])
            # prefix/suffix surface areas
            def areas(mins, maxs, counts, rev=False):
                if rev:
                    mins, maxs, counts = mins[::-1], maxs[::-1], counts[::-1]
                cmin = np.minimum.accumulate(mins, axis=0)
                cmax = np.maximum.accumulate(maxs, axis=0)
                d = np.maximum(cmax - cmin, 0.0)
                sa = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
                cnt = np.cumsum(counts)
                if rev:
                    sa, cnt = sa[::-1], cnt[::-1]
                return sa, cnt
            sa_l, cnt_l = areas(bmin, bmax, bin_count)
            sa_r, cnt_r = areas(bmin, bmax, bin_count, rev=True)
            # cost of splitting after bin k: left=bins[0..k], right=bins[k+1..]
            cost = sa_l[:-1] * cnt_l[:-1] + sa_r[1:] * cnt_r[1:]
            cost = np.where((cnt_l[:-1] == 0) | (cnt_r[1:] == 0), np.inf, cost)
            k = int(np.argmin(cost))
            if not np.isfinite(cost[k]):
                half = len(idx_set) // 2
                order = np.argsort(c[:, axis], kind='stable')
                left_sel = np.zeros(len(idx_set), bool)
                left_sel[order[:half]] = True
            else:
                left_sel = bins <= k
        left = idx_set[left_sel]
        right_idx = idx_set[~left_sel]
        # push right first so left is processed next (preorder)
        stack.append((right_idx, me, True))
        stack.append((left, me, False))

    n_nodes = len(nodes_min)
    node_min = np.stack(nodes_min).astype(np.float32)
    node_max = np.stack(nodes_max).astype(np.float32)
    node_first = np.asarray(nodes_first, np.int32)

    # skip links: for node i, skip = right sibling of the nearest ancestor
    # (or itself) that has one; right children skip to parent's skip.
    # compute children from parent links:
    right_child = np.full(n_nodes, -1, np.int32)
    for i in range(1, n_nodes):
        if is_right[i]:
            right_child[parent_of[i]] = i
    # skip[i]: left children continue at their right sibling, right children
    # inherit the parent's skip (preorder guarantees parents come first).
    node_skip = np.full(n_nodes, n_nodes, np.int32)
    node_skip[0] = n_nodes
    for i in range(1, n_nodes):
        p = parent_of[i]
        if is_right[i]:
            node_skip[i] = node_skip[p]
        else:
            node_skip[i] = right_child[p] if right_child[p] >= 0 else node_skip[p]

    lp = (np.stack(leaf_prims).reshape(-1).astype(np.int32)
          if leaf_prims else np.full(LEAF_SIZE, -1, np.int32))
    return FlatBVH(node_min=node_min, node_max=node_max,
                   node_skip=node_skip.astype(np.int32),
                   node_first=node_first, node_right=right_child,
                   leaf_prims=lp, n_prims=n)


def _build_bvh_native(p_min: np.ndarray, p_max: np.ndarray) -> FlatBVH | None:
    """C++ builder fast path (corona13_tpu/native); None -> numpy fallback."""
    import ctypes
    from .. import native
    lib = native.get_lib()
    if lib is None:
        return None
    p_min = np.ascontiguousarray(p_min, np.float32)
    p_max = np.ascontiguousarray(p_max, np.float32)
    n_nodes = ctypes.c_int32()
    n_slots = ctypes.c_int32()
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    h = lib.bvh_build(p_min.ctypes.data_as(fp), p_max.ctypes.data_as(fp),
                      len(p_min), LEAF_SIZE,
                      ctypes.byref(n_nodes), ctypes.byref(n_slots))
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
    return FlatBVH(node_min=node_min, node_max=node_max,
                   node_skip=node_skip, node_first=node_first,
                   node_right=node_right, leaf_prims=leaf_prims,
                   n_prims=len(p_min))


def collapse8(b: FlatBVH):
    """Collapse the binary BVH into an 8-wide tree for the Pallas packet
    kernel (ops/trace_pallas.py): per node, 8 child AABBs are tested in one
    (8, 128) VPU op — sublanes = children, lanes = rays.

    TPU-native re-expression of the reference's 4-wide QBVH
    (src/accel.d/qbvhmp.c:62-81): the VPU's 8 sublanes set the branching
    factor the way SSE's 4 lanes set the reference's.

    Returns (wbounds, wlinks):
      wbounds [Wn, 8, 8] f32: per child row [min3, max3, w, pad] where
        w = 2^c for valid inner children and 256 * 2^c for leaf children
        (0 for empty slots) — reducing hit(8,128)*w over all axes yields
        one scalar whose low/high byte are the inner/leaf push bitmasks.
      wlinks  [Wn * 8] i32: child links (wide node id or leaf id; which one
        is resolved by the bitmask byte).
      depth   int: max wide-tree depth — the traversal stack worst case is
        depth * 7 + 8 entries (each inner pop nets at most +7); callers
        must fall back to the XLA path when that exceeds the kernel's
        MAX_STACK (silent SMEM stack overflow otherwise).
    Empty child slots get inverted boxes and zero weights.
    """
    from collections import deque
    left = np.where(b.node_first >= 0, -(b.node_first // LEAF_SIZE + 1),
                    np.arange(len(b.node_first), dtype=np.int64) + 1)
    right = b.node_right.astype(np.int64)
    nmin, nmax = b.node_min, b.node_max
    d = np.maximum(nmax - nmin, 0.0)
    area = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

    def children8(bn):
        # greedily split the largest-area internal slot until 8 slots
        slots = [bn]
        while len(slots) < 8:
            cands = [(area[s], i) for i, s in enumerate(slots) if left[s] >= 0]
            if not cands:
                break
            _, i = max(cands)
            s = slots.pop(i)
            slots.extend([left[s], right[s]])
        return slots

    wide_children = []
    order = []
    wid_of = {}
    depth_of = {0: 1}
    max_depth = 1
    if left[0] < 0:
        # degenerate single-leaf tree: one wide node holding the leaf
        wide_children.append([0])
        order.append(0)
    else:
        queue = deque([0])
        while queue:
            bn = queue.popleft()
            wid_of[bn] = len(order)
            order.append(bn)
            ch = children8(bn)
            wide_children.append(ch)
            for c in ch:
                if left[c] >= 0:
                    depth_of[c] = depth_of[bn] + 1
                    max_depth = max(max_depth, depth_of[c])
                    queue.append(c)
    wn = len(order)
    wbounds = np.zeros((wn, 8, 8), np.float32)
    wbounds[:, :, 0:3] = 3.0e38
    wbounds[:, :, 3:6] = -3.0e38
    wlinks = np.zeros((wn, 8), np.int32)
    for wi, ch in enumerate(wide_children):
        for ci, c in enumerate(ch):
            wbounds[wi, ci, 0:3] = nmin[c]
            wbounds[wi, ci, 3:6] = nmax[c]
            if left[c] < 0:
                wbounds[wi, ci, 6] = float(256 * (1 << ci))
                wlinks[wi, ci] = -left[c] - 1      # leaf id
            else:
                wbounds[wi, ci, 6] = float(1 << ci)
                wlinks[wi, ci] = wid_of[c]
    return wbounds, wlinks.reshape(-1), max_depth


def tri_bounds(tri_vtx: np.ndarray, tri_vtx_t1: np.ndarray | None = None):
    """AABBs of triangles (union over shutter times, like the dual (t0,t1)
    node boxes in qbvhmp.c:62-81 but conservative)."""
    lo = tri_vtx.min(axis=1)
    hi = tri_vtx.max(axis=1)
    if tri_vtx_t1 is not None:
        lo = np.minimum(lo, tri_vtx_t1.min(axis=1))
        hi = np.maximum(hi, tri_vtx_t1.max(axis=1))
    return lo, hi


def sphere_bounds(center, radius, center_t1=None):
    lo = center - radius[:, None]
    hi = center + radius[:, None]
    if center_t1 is not None:
        lo = np.minimum(lo, center_t1 - radius[:, None])
        hi = np.maximum(hi, center_t1 + radius[:, None])
    return lo, hi


def line_bounds(line_vtx, line_radii, line_vtx_t1=None):
    r = line_radii.max(axis=1)[:, None]
    lo = line_vtx.min(axis=1) - r
    hi = line_vtx.max(axis=1) + r
    if line_vtx_t1 is not None:
        lo = np.minimum(lo, line_vtx_t1.min(axis=1) - r)
        hi = np.maximum(hi, line_vtx_t1.max(axis=1) + r)
    return lo, hi
