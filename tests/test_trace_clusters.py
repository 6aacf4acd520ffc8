"""Cluster-wavefront traversal (ops/trace_clusters.py) vs brute force."""

import numpy as np
import pytest
import jax.numpy as jnp

from corona13_tpu.ops import trace_clusters as tc
from corona13_tpu.ops.trace import ray_tri_intersect_packed


def _random_scene(rng, T=200):
    base = rng.uniform(-2, 2, (T, 1, 3)).astype(np.float32)
    tri = base + rng.uniform(-0.4, 0.4, (T, 3, 3)).astype(np.float32)
    return tri


def _brute(tri_v, org, d, t_max, ig):
    rows = np.concatenate([tri_v[:, 0],
                           tri_v[:, 1] - tri_v[:, 0],
                           tri_v[:, 2] - tri_v[:, 0]], axis=1)
    tt, bu, bv, ok = ray_tri_intersect_packed(
        jnp.asarray(rows)[None], jnp.asarray(org), jnp.asarray(d))
    tt, bu, bv, ok = map(np.asarray, (tt, bu, bv, ok))
    cand = np.arange(len(tri_v))
    ok = ok & (tt < t_max[:, None]) & (cand[None] != ig[:, None])
    tt = np.where(ok, tt, 3.4e38)
    best = tt.argmin(axis=1)
    sel = np.take_along_axis(tt, best[:, None], 1)[:, 0]
    hit = sel < t_max
    return np.where(hit, sel, t_max), np.where(hit, best, -1)


def test_cluster_traverse_matches_brute_force():
    rng = np.random.default_rng(0)
    tri_v = _random_scene(rng)
    cs = tc.build_clusters(tri_v, cluster=8)
    n = 512
    org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = np.full(n, 3.4e38, np.float32)
    ig = np.full(n, -1, np.int32)

    t, prim, u, v, slot, ovf = tc.traverse(
        cs, jnp.asarray(org), jnp.asarray(d), jnp.asarray(t_max),
        jnp.asarray(ig), k_slots=64, interpret=True)
    bt, bp = _brute(tri_v, org, d, t_max, ig)
    t, prim, slot = np.asarray(t), np.asarray(prim), np.asarray(slot)
    assert not np.asarray(ovf).any()
    same = prim == bp
    # t-ties on shared geometry can legitimately pick either prim
    ties = (~same) & (np.abs(t - bt) < 1e-5)
    assert (same | ties).mean() == 1.0, (same | ties).mean()
    m = prim >= 0
    assert np.allclose(t[m], bt[m], rtol=1e-5, atol=1e-5)
    # slots point at the right shade rows (prim match through tri_prim)
    sl = slot[m]
    got = np.asarray(cs.tri_prim).reshape(-1)[sl]
    assert (got == prim[m]).all()


def test_cluster_traverse_ignore_and_tmax():
    rng = np.random.default_rng(1)
    tri_v = _random_scene(rng, T=64)
    cs = tc.build_clusters(tri_v, cluster=8)
    n = 256
    org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = np.full(n, 3.4e38, np.float32)
    ig = np.full(n, -1, np.int32)
    t, prim, *_ = tc.traverse(cs, jnp.asarray(org), jnp.asarray(d),
                              jnp.asarray(t_max), jnp.asarray(ig),
                              k_slots=64, interpret=True)
    t, prim = np.asarray(t), np.asarray(prim)
    m = prim >= 0
    assert m.any()
    # excluding the hit prim re-traces past it
    t2, prim2, *_ = tc.traverse(cs, jnp.asarray(org), jnp.asarray(d),
                                jnp.asarray(t_max), jnp.asarray(prim),
                                k_slots=64, interpret=True)
    t2, prim2 = np.asarray(t2), np.asarray(prim2)
    assert (np.where(m, t2 >= t - 1e-5, True)).all()
    assert not (prim2[m] == prim[m]).any()
    # t_max = 0 kills all work
    t3, prim3, *_ = tc.traverse(cs, jnp.asarray(org), jnp.asarray(d),
                                jnp.zeros(n), jnp.asarray(ig),
                                k_slots=64, interpret=True)
    assert (np.asarray(prim3) == -1).all()


def test_cluster_traverse_any_hit():
    rng = np.random.default_rng(2)
    tri_v = _random_scene(rng, T=64)
    cs = tc.build_clusters(tri_v, cluster=8)
    n = 256
    org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = np.full(n, 3.4e38, np.float32)
    ig = np.full(n, -1, np.int32)
    _, prim, *_ = tc.traverse(cs, jnp.asarray(org), jnp.asarray(d),
                              jnp.asarray(t_max), jnp.asarray(ig),
                              k_slots=64, interpret=True)
    _, blocked, *_ = tc.traverse(cs, jnp.asarray(org), jnp.asarray(d),
                                 jnp.asarray(t_max), jnp.asarray(ig),
                                 k_slots=64, any_hit=True, interpret=True)
    assert ((np.asarray(blocked) >= 0) == (np.asarray(prim) >= 0)).all()


def test_overflow_flagging():
    rng = np.random.default_rng(3)
    tri_v = _random_scene(rng, T=200)
    cs = tc.build_clusters(tri_v, cluster=8)   # ~25 clusters
    n = 128
    org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    *_, ovf = tc.traverse(cs, jnp.asarray(org), jnp.asarray(d),
                          jnp.full(n, 3.4e38), jnp.full(n, -1, np.int32),
                          k_slots=2, interpret=True)
    assert np.asarray(ovf).any()    # dense random soup overflows k=2
