"""BDPT with a single connection per progression (reference bdpt1.c).

The reference samples one (eye-vertices, light-vertices) configuration per
path from a per-thread table of running mean contributions
(src/sampler.d/bdpt1.c: configuration_t, _configuration_accum/_p).  The
TPU re-design keeps the adaptive table on the HOST and picks one strategy
(s, t) per *launch* (the whole wavefront shares it — lockstep hardware
wants one code path), then runs the bdpt machinery restricted to that
connection (samplers/bdpt.render_sample(only=(s, t))).  The estimator
divides by the selection probability, so the accumulated framebuffer
normalizes exactly like full bdpt; the table adapts the selection toward
high-contribution strategies (the reference's variance-reduction idea).

Useful on its own and as the path-construction backend for Metropolis
samplers (the reference pairs bdpt1 with hslt/vmlt).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import bdpt as bdpt_mod
from .pt import PTConfig


def strategies(cfg: PTConfig):
    """All implemented (s, t) strategies for the config (matches the loop
    structure in bdpt.render_sample)."""
    NT = cfg.max_verts - 1
    NL = max(cfg.max_verts - 2, 1)
    out = []
    for t in range(2, NT + 2):
        out.append((0, t))
    for s in range(1, NL + 1):
        for t in range(2, NT + 2):
            if s + t <= cfg.max_verts:
                out.append((s, t))
    for s in range(1, NL + 1):
        if s + 1 <= cfg.max_verts:
            out.append((s, 1))
    return out


@dataclasses.dataclass
class ConfigTable:
    """Host-side running mean contribution per strategy
    (configuration_t, bdpt1.c:27-66)."""
    strategies: list
    mean: np.ndarray     # running mean contribution per strategy
    count: np.ndarray

    @classmethod
    def create(cls, cfg: PTConfig):
        st = strategies(cfg)
        return cls(strategies=st, mean=np.ones(len(st)),
                   count=np.zeros(len(st)))

    def probs(self) -> np.ndarray:
        # explore floor: never let a strategy starve (the reference's
        # uniform-ish init plays the same role)
        p = np.maximum(self.mean, 1e-3 * max(self.mean.max(), 1e-30))
        return p / p.sum()

    def update(self, idx: int, contrib: float):
        c = self.count[idx]
        self.mean[idx] = self.mean[idx] * (c / (c + 1.0)) + contrib / (c + 1.0)
        self.count[idx] += 1


def render_sample(scene, cfg: PTConfig, sample_idx, table: ConfigTable,
                  batch: int = 1):
    """One bdpt1 progression: pick one strategy from the table, render it,
    update the table.  Returns (fb [H, W, 3], table)."""
    import jax.numpy as jnp
    from ..ops import rng as rng_mod
    p = table.probs()
    # strategy choice rides the framework's counter RNG keyed by the
    # sample index (reproducible-by-construction, like every other
    # dimension; the round-3 version used np.random here)
    u = float(rng_mod.uniform(jnp.zeros((1,), jnp.uint32),
                              jnp.uint32(sample_idx),
                              int(rng_mod.Dim.LIGHTSOURCE) + 7919,
                              cfg.seed)[0])
    idx = int(np.searchsorted(np.cumsum(p), u * p.sum()))
    idx = min(idx, len(p) - 1)
    s, t = table.strategies[idx]
    fb = bdpt_mod.render_sample(scene, cfg, jnp.uint32(sample_idx),
                                batch=batch, only=(s, t))
    fb = fb / p[idx]
    table.update(idx, float(jnp.mean(fb[..., 1])) * p[idx])
    return fb, table
