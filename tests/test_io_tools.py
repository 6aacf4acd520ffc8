"""IO, checkpointing, tools (pfmdiff/welch), AOVs, DBOR cascade."""

import os

import jax.numpy as jnp
import numpy as np

from corona13_tpu.io import fb as fb_io
from corona13_tpu.io import pfm as pfm_io
from corona13_tpu.ops import splat as splat_mod
from corona13_tpu.samplers import pt as pt_mod
from corona13_tpu.samplers import vis as vis_mod
from corona13_tpu.tools import pfmdiff, welch


def test_fb_checkpoint_resume(tmp_path):
    path = str(tmp_path / 'r.fb')
    f1 = fb_io.Framebuffer.open(path, 8, 4)
    f1.accumulate(np.full((4, 8, 3), 2.0, np.float32), spp=2)
    f1.flush(iso=100.0)
    # resume accumulates on top
    f2 = fb_io.Framebuffer.open(path, 8, 4, retain=True)
    assert f2.spp == 2
    f2.accumulate(np.full((4, 8, 3), 4.0, np.float32), spp=2)
    f2.flush(iso=100.0)
    f3 = fb_io.Framebuffer.load(path)
    assert f3.spp == 4
    np.testing.assert_allclose(f3.image, (2.0 + 4.0) / 4.0)
    # non-retained open starts fresh
    f4 = fb_io.Framebuffer.open(path, 8, 4, retain=False)
    assert f4.spp == 0


def test_pfmdiff_tool(tmp_path):
    a = np.random.default_rng(0).uniform(0, 1, (6, 8, 3)).astype(np.float32)
    pa = str(tmp_path / 'a.pfm')
    pb = str(tmp_path / 'b.pfm')
    pfm_io.write_pfm(pa, a)
    pfm_io.write_pfm(pb, a + 0.01)
    assert pfmdiff.main([pa, pb, '--max-error', '0.02']) == 0
    assert pfmdiff.main([pa, pb, '--max-error', '0.005']) == 1


def test_welch_tool(tmp_path):
    rngs = np.random.default_rng(1)
    base = rngs.uniform(0.4, 0.6, (64, 64, 3)).astype(np.float32)
    pa = str(tmp_path / 'a.pfm')
    pb = str(tmp_path / 'b.pfm')
    pc = str(tmp_path / 'c.pfm')
    pfm_io.write_pfm(pa, base)
    pfm_io.write_pfm(pb, base + rngs.normal(0, 0.001, base.shape).astype(np.float32))
    pfm_io.write_pfm(pc, base + 0.5)
    assert welch.main([pa, pb]) == 0     # same distribution
    assert welch.main([pa, pc]) == 1     # significantly different


def test_vis_aovs(cornell):
    cfg = pt_mod.PTConfig(width=32, height=24, mf=2)
    for kind in ('normals', 'depth', 'prim', 'shader', 'uv'):
        img = np.asarray(vis_mod.render_aov(cornell, cfg, jnp.uint32(0),
                                            kind=kind))
        assert img.shape == (24, 32, 3)
        assert np.isfinite(img).all()
        assert img.max() > 0, kind


def test_dbor_cascade():
    fbs = jnp.zeros((splat_mod.N_DBOR, 8, 8, 3))
    # many dim splats + one firefly
    n = 256
    pi = jnp.asarray(np.random.default_rng(2).uniform(0, 8, n).astype(np.float32))
    pj = jnp.asarray(np.random.default_rng(3).uniform(0, 8, n).astype(np.float32))
    col = jnp.full((n, 3), 0.5)
    fbs = splat_mod.splat_dbor(fbs, pi, pj, col)
    firefly = 100.0
    fbs = splat_mod.splat_dbor(fbs, jnp.asarray([4.2]), jnp.asarray([4.2]),
                               jnp.asarray([[firefly, firefly, firefly]]))
    # cascade preserves total energy
    total = float(fbs.sum())
    np.testing.assert_allclose(total, 0.5 * 3 * n + 3 * firefly, rtol=1e-5)
    # merged image strongly suppresses the isolated firefly
    merged = splat_mod.dbor_merge(fbs, spp=1)
    assert float(merged[4, 4, 1]) < firefly * 0.2
    # but keeps the dense low-energy splats
    assert float(merged.sum()) > 0.5 * n

def test_obj2geo_round_trip(tmp_path):
    from corona13_tpu.io import geo as geo_io
    from corona13_tpu.tools import obj2geo
    obj = tmp_path / 'c.obj'
    obj.write_text('\n'.join(
        ['v -1 -1 -1', 'v 1 -1 -1', 'v 1 1 -1', 'v -1 1 -1',
         'v -1 -1 1', 'v 1 -1 1', 'v 1 1 1', 'v -1 1 1',
         'f 1 2 3 4', 'f 5 8 7 6', 'f 1 5 6 2',
         'f 2 6 7 3', 'f 3 7 8 4', 'f 4 8 5 1']))
    out = str(tmp_path / 'c.geo')
    assert obj2geo.main([str(obj), out]) == 0
    g = geo_io.load_geo(out)
    assert len(g.tri_vtx) == 12
    assert abs(g.tri_vtx.min() + 1) < 1e-5 and abs(g.tri_vtx.max() - 1) < 1e-5
    gn = np.cross(g.tri_vtx[:, 1] - g.tri_vtx[:, 0],
                  g.tri_vtx[:, 2] - g.tri_vtx[:, 0])
    gn /= np.linalg.norm(gn, axis=-1, keepdims=True)
    assert np.abs((g.tri_ns * gn[:, None, :]).sum(-1) - 1).max() < 1e-3


def test_netdisplay_serves_frames(tmp_path):
    """MJPEG net display (reference display.d/mjpeg.c analogue): watches a
    .fb file and serves JPEG frames over HTTP."""
    import urllib.request
    import numpy as np
    from corona13_tpu.io import fb as fb_io
    from corona13_tpu.tools import netdisplay
    path = str(tmp_path / 'live.fb')
    f = fb_io.Framebuffer.open(path, 16, 12, retain=False)
    img = np.random.default_rng(0).uniform(0, 1, (12, 16, 3)).astype(np.float32)
    f.accumulate(img, 1)
    f.flush(iso=100.0)
    httpd, watcher = netdisplay.serve(path, port=0, fps=20.0,
                                      run_forever=False)
    import threading, time
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        for _ in range(100):
            if watcher.frame:
                break
            time.sleep(0.05)
        port = httpd.server_address[1]
        data = urllib.request.urlopen(
            f'http://127.0.0.1:{port}/frame.jpg', timeout=5).read()
        assert data[:2] == b'\xff\xd8'  # JPEG SOI marker
    finally:
        httpd.shutdown()
        watcher.stop()
