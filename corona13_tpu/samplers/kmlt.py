"""Kelemen-style primary-sample-space MLT (PSSMLT).

TPU-native re-design of the reference kmlt point sampler
(corona-13 src/pointsampler.d/kmlt.c): instead of one Markov chain per
pthread, a *batch* of independent chains advances in lockstep — every
mutation re-runs the wavefront path tracer (samplers/pt.py) with an
explicit primary-sample array (the replay mode of _sample_paths_full),
so the whole proposal/accept/splat loop is one fused jitted scan.

Semantics preserved from the reference:
  * large-step probability 0.2 (kmlt.c:22 P_LARGE_STEP);
  * small steps perturb every dim with the exponential kernel
    r' = r -/+ s1 * exp(-log(s1/s2) * u) (kmlt.c:41-64, mutate_one),
    with wrap-around on [0,1);
  * scalar acceptance on the tonemapped brightness (luminance Y here;
    kmlt.c:252-321) with a = min(1, I_t / I_c);
  * both current and tentative states splat every iteration with weights
    (1-a) and a over their own brightness (the flushed form of the
    reference's accumulate-on-reject trick);
  * the mean brightness b is estimated from large steps only
    (kmlt.c:263-267) and applied as global gain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import rng
from ..ops import splat as splat_mod
from ..spectral import cie
from . import pt as pt_mod

P_LARGE_STEP = 0.2
# the reference's per-dim exponential step sizes (kmlt.c mutate scales)
S1, S2 = 1.0 / 1024.0, 1.0 / 64.0


def _mutate_dim(r, u1, u2):
    """One exponential-kernel perturbation with wraparound (kmlt.c:41-64)."""
    dv = S2 * jnp.exp(-jnp.log(S2 / S1) * u1)
    r2 = jnp.where(u2 < 0.5, r + dv, r - dv)
    return r2 - jnp.floor(r2)


def _eval(scene, cfg, u):
    """Run the path tracer on primary samples u [C, D]; returns
    (pix_i, pix_j, xyz [C,3], brightness [C])."""
    c = u.shape[0]
    pix = jnp.zeros((c,), jnp.uint32)
    accum, lam, pi, pj, _ = pt_mod._sample_paths_full(
        scene, cfg, jnp.uint32(0), pix, u=u)
    accum = jnp.where(jnp.isfinite(accum), accum, 0.0)
    xyz = cie.spectral_to_xyz(lam, accum)
    return pi, pj, xyz, jnp.maximum(xyz[..., 1], 0.0)


def render_sample(scene, cfg: pt_mod.PTConfig, sample_idx, batch: int = 1,
                  chains: int = 8192, burn_in: int = 8,
                  stuck_limit: int = 40000):
    """One kmlt 'progression': runs enough mutations that the total splat
    count matches batch * width * height (like one PT progression per
    batch), returns the accumulated XYZ framebuffer [H, W, 3].

    Chains are re-seeded per launch from the counter RNG (independent
    restarts — the many-short-chains regime that suits lockstep hardware;
    the reference's per-thread chains persist longer but mix the same
    way via 0.2 large steps).  The first ``burn_in`` mutations only move
    the chains (no splats) so the stationary distribution is reached
    before samples count; ``stuck_limit`` consecutive rejections force an
    accept (the reference's stuck-chain escape, kmlt.c:276).
    """
    d = pt_mod.psd_dims(cfg.max_verts)
    n_mut = max(1, (cfg.width * cfg.height * batch) // chains)
    cid = jnp.arange(chains, dtype=jnp.uint32)
    base = jnp.uint32(sample_idx) * jnp.uint32(0x9e3779b9)

    def crnd(it, k):
        return rng.uniform(cid, base + jnp.uint32(it), k, cfg.seed)

    # initial state: one large step per chain, then *stationary seeding* —
    # resample the start states from the pool proportionally to their
    # brightness (the standard MLT seeding; the reference's long-lived
    # per-thread chains amortize the transient instead, kmlt.c:195-240).
    # Without this, a lockstep batch of short chains underestimates the
    # bright modes (e.g. direct emitter hits) by whatever fraction of
    # chains never finds them.
    u0 = jax.vmap(lambda k: rng.uniform(cid, base, k + 100, cfg.seed),
                  out_axes=1)(jnp.arange(d))
    pi0, pj0, xyz0, i0 = _eval(scene, cfg, u0)
    # the mean-brightness estimate must come from the *unweighted*
    # large-step pool — the resampled i0 are stationary-distributed and
    # their mean is E[i^2]/E[i], which would inflate the global gain
    b_sum0 = jnp.sum(i0)
    cdf0 = jnp.cumsum(i0)
    tot0 = cdf0[-1]
    r0 = rng.uniform(cid, base, 9999, cfg.seed) * tot0
    idx0 = jnp.clip(jnp.searchsorted(cdf0, r0), 0, chains - 1)
    idx0 = jnp.where(tot0 > 0.0, idx0, cid.astype(idx0.dtype))
    u0, pi0, pj0 = u0[idx0], pi0[idx0], pj0[idx0]
    xyz0, i0 = xyz0[idx0], i0[idx0]

    fb0 = jnp.zeros((cfg.height, cfg.width, 3))

    def step(carry, it):
        u, pi, pj, xyz, i_cur, fb, b_sum, b_cnt, rejects = carry
        r_large = crnd(it, 0)
        large = r_large < P_LARGE_STEP
        # tentative primary samples
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
        u_t = jnp.where(large[:, None], fresh, small)
        pi_t, pj_t, xyz_t, i_t = _eval(scene, cfg, u_t)

        # mean-brightness estimate from large steps (kmlt.c:263-267)
        b_sum = b_sum + jnp.sum(jnp.where(large, i_t, 0.0))
        b_cnt = b_cnt + jnp.sum(large.astype(jnp.float32))

        a = jnp.minimum(1.0, jnp.where(i_cur > 0.0,
                                       i_t / jnp.maximum(i_cur, 1e-30), 1.0))
        # splat both states, weighted by their selection probabilities;
        # burn-in iterations move the chains without splatting
        gate = (it > burn_in).astype(jnp.float32)
        w_cur = gate * jnp.where(i_cur > 0.0,
                                 (1.0 - a) / jnp.maximum(i_cur, 1e-30), 0.0)
        w_t = gate * jnp.where(i_t > 0.0, a / jnp.maximum(i_t, 1e-30), 0.0)
        fb = splat_mod.splat(fb, pi, pj, xyz * w_cur[:, None])
        fb = splat_mod.splat(fb, pi_t, pj_t, xyz_t * w_t[:, None])

        # stuck-chain escape: force-accept after stuck_limit rejections
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
    # each mutation splats 1 sample; scale so the accumulation normalizes
    # like `batch` PT progressions (W*H samples each)
    total = chains * n_mut
    scale = b * (cfg.width * cfg.height * batch) / total
    return fb * scale
