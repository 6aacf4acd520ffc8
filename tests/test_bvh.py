"""BVH build + wavefront traversal vs brute-force intersection."""

import jax.numpy as jnp
import numpy as np

from corona13_tpu.ops import bvh as bvh_mod
from corona13_tpu.ops import trace


def _random_tris(n, seed=0):
    r = np.random.default_rng(seed)
    v0 = r.uniform(-10, 10, (n, 3)).astype(np.float32)
    e = r.uniform(-3.0, 3.0, (n, 2, 3)).astype(np.float32)
    return np.stack([v0, v0 + e[:, 0], v0 + e[:, 1]], axis=1)


def _geom_from_tris(tri_v):
    return trace.make_device_geometry(tri_v=tri_v)


def _brute_force(tri_v, org, d):
    v0 = jnp.asarray(tri_v[:, 0])
    e1 = jnp.asarray(tri_v[:, 1] - tri_v[:, 0])
    e2 = jnp.asarray(tri_v[:, 2] - tri_v[:, 0])
    t, u, v, ok = trace.ray_tri_intersect(
        v0[None], e1[None], e2[None], jnp.asarray(org), jnp.asarray(d))
    t = jnp.where(ok, t, trace.MAX_DIST)
    best = jnp.argmin(t, axis=-1)
    tbest = jnp.take_along_axis(t, best[..., None], axis=-1)[..., 0]
    prim = jnp.where(tbest < trace.MAX_DIST, best, -1)
    return np.asarray(tbest), np.asarray(prim)


def test_bvh_matches_brute_force():
    tri_v = _random_tris(500)
    geom = _geom_from_tris(tri_v)
    r = np.random.default_rng(1)
    n = 1000
    org = r.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit = trace.intersect(geom, jnp.asarray(org), jnp.asarray(d))
    t_ref, prim_ref = _brute_force(tri_v, org, d)
    hit_rate = (prim_ref >= 0).mean()
    assert hit_rate > 0.2  # the test covers real hits
    np.testing.assert_allclose(np.asarray(hit.t), t_ref, rtol=1e-5)
    # prim ids must agree except exact-tie distances (none expected here)
    assert (np.asarray(hit.prim) == prim_ref).mean() > 0.999


def test_occlusion_matches_closest_hit():
    tri_v = _random_tris(300, seed=5)
    geom = _geom_from_tris(tri_v)
    r = np.random.default_rng(2)
    n = 500
    org = r.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit = trace.intersect(geom, jnp.asarray(org), jnp.asarray(d))
    t = np.asarray(hit.t)
    has = t < 1e30
    # a segment longer than the closest hit must be blocked
    blocked = np.asarray(trace.occluded(
        geom, jnp.asarray(org), jnp.asarray(d),
        jnp.asarray(np.where(has, t * 1.5, 1e3), np.float32)))
    assert (blocked[has]).all()
    # a segment shorter than the closest hit must be clear
    clear = np.asarray(trace.occluded(
        geom, jnp.asarray(org), jnp.asarray(d),
        jnp.asarray(np.where(has, t * 0.5, 1e-3), np.float32)))
    assert not clear.any()


def test_ignore_prim_excluded():
    tri_v = _random_tris(100, seed=9)
    geom = _geom_from_tris(tri_v)
    r = np.random.default_rng(3)
    org = r.uniform(-12, 12, (200, 3)).astype(np.float32)
    d = r.normal(size=(200, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit = trace.intersect(geom, jnp.asarray(org), jnp.asarray(d))
    hit2 = trace.intersect(geom, jnp.asarray(org), jnp.asarray(d),
                           ignore_prim=hit.prim)
    both = (np.asarray(hit.prim) >= 0) & (np.asarray(hit2.prim) >= 0)
    assert (np.asarray(hit.prim)[both] != np.asarray(hit2.prim)[both]).all()


def test_sphere_intersection():
    c = np.array([[0, 0, 5]], np.float32)
    rad = np.array([1.0], np.float32)
    geom = trace.make_device_geometry(sph_c=c, sph_r=rad)
    org = jnp.asarray(np.array([[0, 0, 0], [0, 0, 0], [3, 0, 0]], np.float32))
    d = jnp.asarray(np.array([[0, 0, 1], [0, 1, 0], [0, 0, 1]], np.float32))
    hit = trace.intersect(geom, org, d)
    np.testing.assert_allclose(np.asarray(hit.t)[0], 4.0, rtol=1e-5)
    assert np.asarray(hit.prim)[1] < 0
    assert np.asarray(hit.prim)[2] < 0


def test_wide_kernel_interpret_matches_xla():
    """The Pallas BVH8 packet kernel (interpret mode) against the XLA
    skip-link traversal — covers the kernel logic on the CPU CI mesh."""
    from corona13_tpu.ops import trace_pallas
    tri_v = _random_tris(700, seed=11)
    geom = _geom_from_tris(tri_v)
    b = geom.tri_bvh
    r = np.random.default_rng(4)
    n = 300
    org = r.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t0 = jnp.full((n,), 3.0e38, jnp.float32)
    ig = jnp.full((n,), -1, jnp.int32)
    t, prim, u, v, slot = trace_pallas.traverse_tris(
        b.wbounds, b.wlinks, b.leaf_packed, jnp.asarray(org),
        jnp.asarray(d), t0, ig, interpret=True)
    hit = trace.intersect(geom, jnp.asarray(org), jnp.asarray(d))
    assert (np.asarray(prim) == np.asarray(hit.prim)).mean() > 0.995
    both = (np.asarray(prim) >= 0) & (np.asarray(hit.prim) >= 0)
    np.testing.assert_allclose(np.asarray(t)[both],
                               np.asarray(hit.t)[both], rtol=1e-4)
    # u/v of agreeing hits match
    agree = both & (np.asarray(prim) == np.asarray(hit.prim))
    np.testing.assert_allclose(np.asarray(u)[agree],
                               np.asarray(hit.u)[agree], atol=1e-4)
    # any-hit agrees with closest-hit blocking
    blocked, = trace_pallas.traverse_tris(
        b.wbounds, b.wlinks, b.leaf_packed, jnp.asarray(org),
        jnp.asarray(d), jnp.full((n,), 20.0, jnp.float32), ig,
        any_hit=True, interpret=True)[1:2]
    expect = np.asarray(hit.valid) & (np.asarray(hit.t) < 20.0)
    assert ((np.asarray(blocked) >= 0) == expect).all()


def test_wide_kernel_ignore_and_counters():
    from corona13_tpu.ops import trace_pallas
    tri_v = _random_tris(200, seed=13)
    geom = _geom_from_tris(tri_v)
    b = geom.tri_bvh
    r = np.random.default_rng(7)
    n = 200
    org = r.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t0 = jnp.full((n,), 3.0e38, jnp.float32)
    ig = jnp.full((n,), -1, jnp.int32)
    t, prim, u, v, slot, iters, leafs = trace_pallas.traverse_tris(
        b.wbounds, b.wlinks, b.leaf_packed, jnp.asarray(org),
        jnp.asarray(d), t0, ig, interpret=True, want_counters=True)
    assert int(iters.sum()) > 0 and int(leafs.sum()) > 0
    # excluding each ray's hit prim removes it from the result
    t2, prim2, *_ = trace_pallas.traverse_tris(
        b.wbounds, b.wlinks, b.leaf_packed, jnp.asarray(org),
        jnp.asarray(d), t0, prim, interpret=True)
    both = (np.asarray(prim) >= 0) & (np.asarray(prim2) >= 0)
    assert (np.asarray(prim)[both] != np.asarray(prim2)[both]).all()
