"""bdpt1: single-strategy-per-progression BDPT with a host-side adaptive
table (reference src/sampler.d/bdpt1.c; regression 0021_bdpt1 shares the
0010_pt scene)."""

import jax.numpy as jnp
import pytest
import numpy as np

from corona13_tpu.samplers import bdpt as bdpt_mod
from corona13_tpu.samplers import bdpt1 as bdpt1_mod
from corona13_tpu.samplers import pt as pt_mod

pytestmark = pytest.mark.slow


def test_bdpt1_deterministic(cornell):
    """Strategy selection is keyed by the counter RNG on sample_idx —
    rerunning a progression reproduces the image bit-exactly."""
    cfg = pt_mod.PTConfig(width=24, height=16, max_verts=4, mf=2,
                          use_nee=True, rr_start=99)
    t1 = bdpt1_mod.ConfigTable.create(cfg)
    t2 = bdpt1_mod.ConfigTable.create(cfg)
    a, _ = bdpt1_mod.render_sample(cornell, cfg, 5, t1)
    b, _ = bdpt1_mod.render_sample(cornell, cfg, 5, t2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bdpt1_converges_to_bdpt(cornell):
    cfg = pt_mod.PTConfig(width=24, height=16, max_verts=4, mf=2,
                          use_nee=True, rr_start=99)
    table = bdpt1_mod.ConfigTable.create(cfg)
    acc = None
    n = 24
    for s in range(n):
        fb, table = bdpt1_mod.render_sample(cornell, cfg, s, table)
        acc = np.asarray(fb) if acc is None else acc + np.asarray(fb)
    a = acc / n
    full = None
    for s in range(4):
        fb = bdpt_mod.render_sample(cornell, cfg, jnp.uint32(s))
        full = np.asarray(fb) if full is None else full + np.asarray(fb)
    b = full / 4
    assert np.isfinite(a).all()
    ratio = a[..., 1].mean() / b[..., 1].mean()
    assert abs(ratio - 1.0) < 0.35, ratio
    # the table adapted: strategies were visited
    assert table.count.sum() == n
