"""Time-resolved motion blur: per-ray time lerps triangle vertices and
sphere centers in the leaf tests (reference qbvhmp.c:62-81 dual-time
retime); BVH bounds are the (t0, t1) union so traversal stays
conservative."""

import jax.numpy as jnp
import numpy as np

from corona13_tpu.ops.trace import make_device_geometry, intersect, occluded


def _moving_tri_geom():
    tri0 = np.array([[[-1, -1, 5], [0, -1, 5], [0, 1, 5]]], np.float32)
    tri1 = tri0 + np.array([1.5, 0, 0], np.float32)
    return make_device_geometry(tri_v=tri0, tri_v_t1=tri1)


def test_time_resolved_triangle():
    g = _moving_tri_geom()
    org = jnp.zeros((3, 3)).at[:, 0].set(jnp.array([-0.5, -0.5, 1.2]))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (3, 1))
    tm = jnp.array([0.0, 1.0, 1.0])
    hit = intersect(g, org, d, time=tm)
    v = np.asarray(hit.valid)
    # x=-0.5 visible at shutter open, gone at close; x=1.0 only at close
    assert v.tolist() == [True, False, True], v
    # static call (no time) uses t0 geometry
    v0 = np.asarray(intersect(g, org, d).valid)
    assert v0.tolist() == [True, True, False], v0
    # shadow rays share the semantics
    blocked = np.asarray(occluded(g, org, d, jnp.full((3,), 10.0), time=tm))
    assert blocked.tolist() == [True, False, True], blocked


def test_time_resolved_sphere():
    c0 = np.array([[0.0, 0.0, 5.0]], np.float32)
    c1 = np.array([[3.0, 0.0, 5.0]], np.float32)
    g = make_device_geometry(sph_c=c0, sph_c_t1=c1,
                             sph_r=np.array([1.0], np.float32))
    org = jnp.zeros((2, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (2, 1))
    hit = intersect(g, org, d, time=jnp.array([0.0, 1.0]))
    v = np.asarray(hit.valid)
    assert v.tolist() == [True, False], v


def test_geo_motion_roundtrip(tmp_path):
    """save_geo with t1 verts writes the reference stride-2 layout and
    load_geo recovers both shutter states."""
    from corona13_tpu.io import geo as geo_io
    tri0 = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                     [[2, 0, 0], [3, 0, 0], [2, 1, 0]]], np.float32)
    tri1 = tri0 + np.array([0.5, 0.25, 0.0], np.float32)
    p = str(tmp_path / 'mb.geo')
    geo_io.save_geo(p, tri0, tri_vtx_t1=tri1)
    g = geo_io.load_geo(p)
    assert g.has_motion
    np.testing.assert_allclose(g.tri_vtx, tri0, atol=1e-6)
    np.testing.assert_allclose(g.tri_vtx_t1, tri1, atol=1e-6)


def test_motion_blur_streak(cornell):
    """End-to-end: a sphere displaced over the shutter renders a streak —
    pixels covered only at shutter close receive energy iff time-resolved
    intersection is on (camera exposure_time drives time sampling)."""
    from corona13_tpu import testing
    from corona13_tpu.samplers import pt as pt_mod
    import corona13_tpu.scene as scene_mod
    sc = testing.cornell_scene(sphere='diffuse')
    # displace the sphere by 2 radii over the shutter; exposure wide open
    g = sc.geom.replace(sph_c_t1=sc.geom.sph_c +
                        jnp.array([[4.0, 0.0, 0.0]]), has_motion=True)
    sc_mb = sc.replace(geom=g, camera=sc.camera.replace(
        exposure_time=jnp.float32(1.0)))
    cfg = pt_mod.PTConfig(width=48, height=32, max_verts=3, mf=2,
                          use_nee=True)
    img_s = np.asarray(pt_mod.render_sample(sc, cfg, jnp.uint32(0),
                                            batch=4))
    img_m = np.asarray(pt_mod.render_sample(sc_mb, cfg, jnp.uint32(0),
                                            batch=4))
    diff = np.abs(img_m - img_s).mean(axis=-1)
    assert np.isfinite(img_m).all()
    # the images must differ where the sphere smears
    assert (diff > 1e-3).sum() > 20, diff.max()
