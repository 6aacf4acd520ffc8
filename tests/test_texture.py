"""Image textures: .nra2 `texture` shader -> atlas fetch in shading
(reference src/shaders/texture.c)."""

import os

import numpy as np
import jax.numpy as jnp


def _make_scene(tmp_path):
    from corona13_tpu.io import pfm as pfm_io
    # half red / half green texture
    img = np.zeros((16, 32, 3), np.float32)
    img[:, :16] = [0.8, 0.1, 0.1]
    img[:, 16:] = [0.1, 0.8, 0.1]
    pfm_io.write_pfm(str(tmp_path / 'tex.pfm'), img)
    nra2 = tmp_path / 'test.nra2'
    # a single textured quad facing the camera
    geo = tmp_path / 'quad.geo'
    from corona13_tpu.io import geo as geo_io
    v = np.array([[[-5, -5, 10], [5, -5, 10], [5, 5, 10]],
                  [[-5, -5, 10], [5, 5, 10], [-5, 5, 10]]], np.float32)
    uv = np.array([[[0, 0], [1, 0], [1, 1]],
                   [[0, 0], [1, 1], [0, 1]]], np.float32)
    geo_io.write_geo(str(geo), v, tri_uv=uv)
    nra2.write_text(
        'black\n3\ndiffuse # 0\n'
        'mult 1 2 0 # 1\n'
        'texture d tex.pfm # 2\n'
        '1\n1 quad\n')
    from corona13_tpu import scene as scene_mod
    sc, _ = scene_mod.load_scene(str(nra2))
    return sc


def test_texture_albedo_fetch(tmp_path):
    from corona13_tpu.models import shading as shading_mod
    from corona13_tpu.ops.trace import intersect
    sc = _make_scene(tmp_path)
    assert sc.has_textures
    assert sc.tex_atlas.shape[0] == 1
    n = 8
    # rays hitting the left (red) and right (green) halves
    xs = jnp.array([-2.5, 2.5, -2.5, 2.5, -1.0, 1.0, -3.0, 3.0])
    org = jnp.stack([xs, jnp.zeros(n), jnp.zeros(n)], axis=-1)
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    hit = intersect(sc.geom, org, d)
    assert bool(hit.valid.all())
    x = org + hit.t[..., None] * d
    lam_r = jnp.full((n, 1), 620.0)   # red wavelength
    sp_r = shading_mod.prepare(sc, hit, x, d, lam_r)
    rd_r = np.asarray(sp_r.rd[:, 0])
    left = xs < 0
    assert (rd_r[np.asarray(left)] > 0.4).all()     # red half reflects red
    assert (rd_r[~np.asarray(left)] < 0.3).all()    # green half absorbs red
