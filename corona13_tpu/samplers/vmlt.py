"""Veach-MLT engine: a mutation *registry* driving the PSS replay
machinery (the TPU re-expression of corona-13's vmlt engine,
src/pathspace/vmlt.c:49-146 + the generated build/vmlt_registry.h).

The reference registers mutation strategies (Makefile MUTATIONS= list),
picks one per step by suitability weight (vmlt_mutate, vmlt.c:111-146),
and runs a Metropolis accept on the measurement-contribution ratio times
the strategy's transition ratio (vmlt_accept, vmlt.c:49-109).

TPU-native design: a lockstep batch of chains (like samplers/kmlt.py)
whose per-chain strategy choice is a masked select — every strategy
proposes in primary-sample space (cheap array math), the masks combine
ONE tentative primary-sample array, and a single wavefront re-trace
evaluates all chains together.  Registered mutations:

  * ``largestep`` — independent resample of every dimension
    (include/vmlt_largestep.h:18-34); also feeds the mean-brightness
    estimate b like kmlt.
  * ``lens`` — perturb only the lens subspace (image x/y + aperture x/y)
    with the exponential kernel, keeping the rest of the path's random
    numbers: the classic lens mutation (include/vmlt_lens.h) — it slides
    the eye vertex while the light path replay stays put.
  * ``multichain`` — exponential-kernel perturbation of every dimension
    (the PSS analogue of vmlt_multichain.h's whole-path perturbation;
    identical to kmlt's small step).

Suitabilities are constant per strategy (the reference's suitability is
path-dependent for halfvec/mmlt, constant for largestep/lens — constant
weights make the strategy-selection probability cancel in the acceptance
ratio, so a = min(1, I_t/I_c) with symmetric kernels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import rng
from ..ops import splat as splat_mod
from ..spectral import cie
from . import pt as pt_mod
from .kmlt import _mutate_dim, _eval

# (name, weight) — the registry.  Weights mirror the reference's default
# suitability ordering: exploration (largestep) vs local image-space and
# whole-path moves.
REGISTRY = (('largestep', 0.30), ('lens', 0.35), ('multichain', 0.35))
LENS_DIMS = (0, 1, 4, 5)   # image x/y + aperture x/y (pt.py PSS layout)


def render_sample(scene, cfg: pt_mod.PTConfig, sample_idx, batch: int = 1,
                  chains: int = 8192, burn_in: int = 8,
                  stuck_limit: int = 30000):
    """One vmlt progression; returns the XYZ accumulation FB [H, W, 3].

    Structure mirrors kmlt.render_sample; only the proposal differs:
    a per-chain strategy drawn from the registry (vmlt_mutate's
    suitability-weighted choice, constant weights)."""
    d = pt_mod.psd_dims(cfg.max_verts)
    n_mut = max(1, (cfg.width * cfg.height * batch) // chains)
    cid = jnp.arange(chains, dtype=jnp.uint32)
    base = jnp.uint32(sample_idx) * jnp.uint32(0x85ebca6b)

    def crnd(it, k):
        return rng.uniform(cid, base + jnp.uint32(it), k, cfg.seed)

    w = jnp.asarray([wt for _, wt in REGISTRY])
    cdf = jnp.cumsum(w) / jnp.sum(w)

    u0 = jax.vmap(lambda k: rng.uniform(cid, base, k + 100, cfg.seed),
                  out_axes=1)(jnp.arange(d))
    pi0, pj0, xyz0, i0 = _eval(scene, cfg, u0)
    # stationary seeding: resample starts ~ brightness (see kmlt.py);
    # b comes from the unweighted pool (resampled mean is E[i^2]/E[i])
    b_sum0 = jnp.sum(i0)
    cdf0 = jnp.cumsum(i0)
    tot0 = cdf0[-1]
    r0 = rng.uniform(cid, base, 9999, cfg.seed) * tot0
    idx0 = jnp.clip(jnp.searchsorted(cdf0, r0), 0, chains - 1)
    idx0 = jnp.where(tot0 > 0.0, idx0, cid.astype(idx0.dtype))
    u0, pi0, pj0 = u0[idx0], pi0[idx0], pj0[idx0]
    xyz0, i0 = xyz0[idx0], i0[idx0]
    fb0 = jnp.zeros((cfg.height, cfg.width, 3))

    lens_mask = jnp.zeros((d,), bool).at[jnp.asarray(LENS_DIMS)].set(True)

    def step(carry, it):
        u, pi, pj, xyz, i_cur, fb, b_sum, b_cnt, rejects = carry
        # strategy choice per chain (vmlt_mutate suitability CDF)
        r_s = crnd(it, 0)
        strat = jnp.sum((r_s[:, None] > cdf[None, :]).astype(jnp.int32),
                        axis=1)                          # [C] in 0..2
        fresh = jax.vmap(lambda k: rng.uniform(cid, base + jnp.uint32(it),
                                               k + 200, cfg.seed),
                         out_axes=1)(jnp.arange(d))
        u1 = jax.vmap(lambda k: rng.uniform(cid, base + jnp.uint32(it),
                                            k + 200 + d, cfg.seed),
                      out_axes=1)(jnp.arange(d))
        u2 = jax.vmap(lambda k: rng.uniform(cid, base + jnp.uint32(it),
                                            k + 200 + 2 * d, cfg.seed),
                      out_axes=1)(jnp.arange(d))
        small = _mutate_dim(u, u1, u2)
        lens = jnp.where(lens_mask[None, :], small, u)
        u_t = jnp.where((strat == 0)[:, None], fresh,
                        jnp.where((strat == 1)[:, None], lens, small))
        pi_t, pj_t, xyz_t, i_t = _eval(scene, cfg, u_t)

        large = strat == 0
        b_sum = b_sum + jnp.sum(jnp.where(large, i_t, 0.0))
        b_cnt = b_cnt + jnp.sum(large.astype(jnp.float32))

        # symmetric kernels + constant suitabilities -> T ratio = 1
        # (vmlt_accept's general form reduces to the brightness ratio)
        a = jnp.minimum(1.0, jnp.where(i_cur > 0.0,
                                       i_t / jnp.maximum(i_cur, 1e-30),
                                       1.0))
        gate = (it > burn_in).astype(jnp.float32)
        w_cur = gate * jnp.where(i_cur > 0.0,
                                 (1.0 - a) / jnp.maximum(i_cur, 1e-30), 0.0)
        w_t = gate * jnp.where(i_t > 0.0, a / jnp.maximum(i_t, 1e-30), 0.0)
        fb = splat_mod.splat(fb, pi, pj, xyz * w_cur[:, None])
        fb = splat_mod.splat(fb, pi_t, pj_t, xyz_t * w_t[:, None])

        acc = (crnd(it, 1) < a) | (rejects >= stuck_limit)
        rejects = jnp.where(acc, 0, rejects + 1)
        u = jnp.where(acc[:, None], u_t, u)
        pi = jnp.where(acc, pi_t, pi)
        pj = jnp.where(acc, pj_t, pj)
        xyz = jnp.where(acc[:, None], xyz_t, xyz)
        i_cur = jnp.where(acc, i_t, i_cur)
        return (u, pi, pj, xyz, i_cur, fb, b_sum, b_cnt, rejects), None

    carry = (u0, pi0, pj0, xyz0, i0, fb0, b_sum0,
             jnp.float32(chains), jnp.zeros((chains,), jnp.int32))
    carry, _ = jax.lax.scan(step, carry,
                            jnp.arange(1, n_mut + burn_in + 1))
    _, _, _, _, _, fb, b_sum, b_cnt, _ = carry
    b = b_sum / jnp.maximum(b_cnt, 1.0)
    total = chains * n_mut
    scale = b * (cfg.width * cfg.height * batch) / total
    return fb * scale
