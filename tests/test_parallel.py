"""Multi-device sharding: sharded render == single-device render, and the
driver dryrun entry points work on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corona13_tpu.parallel import shard
from corona13_tpu.samplers import pt as pt_mod
from corona13_tpu import render as render_mod

pytestmark = pytest.mark.slow


def _cpus():
    return jax.devices('cpu')


@pytest.mark.skipif(len(jax.devices('cpu')) < 4, reason='needs 4 host devices')
def test_sharded_matches_single(cornell):
    cfg = pt_mod.PTConfig(width=16, height=8, max_verts=3, mf=1)
    mesh = shard.make_mesh(n_sp=2, n_px=2, devices=_cpus())
    fb_sharded = shard.render_samples_sharded(cornell, cfg, mesh, 0)
    # counter-based RNG: the same (pixel, sample) pairs give the same paths
    a = pt_mod.render_sample(cornell, cfg, jnp.uint32(0))
    b = pt_mod.render_sample(cornell, cfg, jnp.uint32(1))
    np.testing.assert_allclose(np.asarray(fb_sharded), np.asarray(a + b),
                               rtol=2e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices('cpu')) < 4, reason='needs 4 host devices')
def test_train_step_runs(cornell):
    cfg = pt_mod.PTConfig(width=16, height=8, max_verts=3, mf=1)
    mesh = shard.make_mesh(n_sp=2, n_px=2, devices=_cpus())
    target = jnp.zeros((8, 16, 3))
    theta = {'d_mul': jnp.float32(1.0), 'e_mul': jnp.float32(1.0)}
    loss, grads = shard.train_step(cornell, cfg, mesh, target, theta)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(grads['e_mul']))
    assert float(grads['e_mul']) != 0.0


def test_dryrun_multichip_entry():
    import sys
    sys.path.insert(0, '/root/repo')
    import __graft_entry__ as ge
    ge.dryrun_multichip(min(8, len(jax.devices('cpu'))))


def test_entry_compiles():
    import sys
    sys.path.insert(0, '/root/repo')
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
