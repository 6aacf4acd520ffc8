"""Kelemen PSSMLT: statistical agreement with PT (regression 0016/0017
coverage as a statistical test) and chain mechanics."""

import jax.numpy as jnp
import pytest
import numpy as np

from corona13_tpu.samplers import kmlt as kmlt_mod
from corona13_tpu.samplers import pt as pt_mod

pytestmark = pytest.mark.slow


def test_mutation_kernel_stays_in_unit_interval():
    r = jnp.asarray(np.random.default_rng(0).uniform(0, 1, 4096).astype(np.float32))
    u1 = jnp.asarray(np.random.default_rng(1).uniform(0, 1, 4096).astype(np.float32))
    u2 = jnp.asarray(np.random.default_rng(2).uniform(0, 1, 4096).astype(np.float32))
    r2 = np.asarray(kmlt_mod._mutate_dim(r, u1, u2))
    assert (r2 >= 0).all() and (r2 < 1).all()
    # small steps: median displacement within the kernel range
    d = np.abs(r2 - np.asarray(r))
    d = np.minimum(d, 1 - d)  # wraparound distance
    assert np.median(d) < kmlt_mod.S2
    assert np.median(d) > kmlt_mod.S1 / 4


def test_kmlt_matches_pt(cornell):
    cfg = pt_mod.PTConfig(width=32, height=24, max_verts=4, mf=2,
                          use_nee=True)
    fb_m = kmlt_mod.render_sample(cornell, cfg, jnp.uint32(0),
                                  batch=24, chains=512)
    a = np.asarray(fb_m) / 24
    fb_pt = pt_mod.render_sample(cornell, cfg, jnp.uint32(100), batch=32)
    b = np.asarray(fb_pt) / 32
    assert np.isfinite(a).all()
    ratio = a[..., 1].mean() / b[..., 1].mean()
    assert abs(ratio - 1.0) < 0.08, ratio
    corr = np.corrcoef(a[..., 1].ravel(), b[..., 1].ravel())[0, 1]
    assert corr > 0.5, corr


def test_psd_replay_matches_layout(cornell):
    """The primary-sample replay path produces finite paths over the whole
    image (chains roam across pixels)."""
    d = pt_mod.psd_dims(4)
    c = 1024
    u = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (c, d)).astype(np.float32))
    cfg = pt_mod.PTConfig(width=32, height=24, max_verts=4, mf=2)
    pi, pj, xyz, i = kmlt_mod._eval(cornell, cfg, u)
    assert np.isfinite(np.asarray(xyz)).all()
    assert (np.asarray(pi) >= 0).all() and (np.asarray(pi) < 32).all()
    assert np.asarray(i).max() > 0  # some paths carry light
