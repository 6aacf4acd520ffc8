"""Counter-based stateless random number generation.

TPU-native replacement for the reference's stateful per-thread RNGs
(corona-13 src/points.d/sfmt.c Mersenne twister and ext/halton QMC): every
random number is a pure function of ``(pixel, sample_index, dimension,
seed)``, so results are independent of execution order and device count —
the property the reference gets by re-seeding per sample index
(src/render.d/gi.c:86-88) falls out for free.

Dimension assignment follows the reference's fixed per-vertex random
dimension contract (include/pathspace.h:16-53): see :class:`Dim`.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np


class Dim(enum.IntEnum):
    """Named random dimensions, one block per path vertex.

    Mirrors path_sample_dim_t (reference include/pathspace.h:16-53); the
    per-vertex offsets (rand_beg bookkeeping) become static dim computation
    inside the bounce scan.
    """
    # camera start block (7 dims)
    IMAGE_X = 0
    IMAGE_Y = 1
    LAMBDA = 2
    TIME = 3
    APERTURE_X = 4
    APERTURE_Y = 5
    CAMID = 6
    NUM_PT_BEG = 7
    # light start block (8 dims)
    ENVMAP_VS_AREA = 0
    LIGHTSOURCE = 1
    LIGHT_X = 4
    LIGHT_Y = 5
    EDF_X = 6
    EDF_Y = 7
    NUM_LT_BEG = 8
    # extend block (5 dims per bounce)
    FREE_PATH = 0
    OMEGA_X = 1
    OMEGA_Y = 2
    SCATTER_MODE = 3
    RUSSIAN_R = 4
    NUM_EXTEND = 5
    # next-event block (4 dims)
    NEE_LIGHT1 = 0
    NEE_LIGHT2 = 1
    NEE_X = 2
    NEE_Y = 3
    NUM_NEE = 4


def _pcg4d(v0, v1, v2, v3):
    """PCG4D hash (Jarzynski & Olano, JCGT 2020) on uint32 lanes."""
    u = jnp.uint32
    v0 = v0.astype(u) * u(1664525) + u(1013904223)
    v1 = v1.astype(u) * u(1664525) + u(1013904223)
    v2 = v2.astype(u) * u(1664525) + u(1013904223)
    v3 = v3.astype(u) * u(1664525) + u(1013904223)
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    v0 = v0 ^ (v0 >> u(16))
    v1 = v1 ^ (v1 >> u(16))
    v2 = v2 ^ (v2 >> u(16))
    v3 = v3 ^ (v3 >> u(16))
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    return v0, v1, v2, v3


def _to_unit(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> float32 in [0, 1), using the top 24 bits."""
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * np.float32(2.0 ** -24)


def uniform(pixel: jnp.ndarray, sample: jnp.ndarray, dim, seed=0) -> jnp.ndarray:
    """One uniform float in [0,1) per element, from the (pixel, sample, dim,
    seed) counter.  All args broadcast; dim/seed may be python ints."""
    pixel = jnp.asarray(pixel)
    shape = jnp.broadcast_shapes(pixel.shape, jnp.shape(sample), jnp.shape(dim))
    z = jnp.broadcast_to(jnp.asarray(pixel, jnp.uint32), shape)
    s = jnp.broadcast_to(jnp.asarray(sample, jnp.uint32), shape)
    d = jnp.broadcast_to(jnp.asarray(dim, jnp.uint32), shape)
    k = jnp.broadcast_to(jnp.asarray(seed, jnp.uint32), shape)
    v0, _, _, _ = _pcg4d(z, s, d, k ^ jnp.uint32(0x9E3779B9))
    return _to_unit(v0)


def uniform2(pixel, sample, dim, seed=0):
    """Two independent uniforms (saves one hash vs calling uniform twice)."""
    pixel = jnp.asarray(pixel)
    shape = jnp.broadcast_shapes(pixel.shape, jnp.shape(sample), jnp.shape(dim))
    z = jnp.broadcast_to(jnp.asarray(pixel, jnp.uint32), shape)
    s = jnp.broadcast_to(jnp.asarray(sample, jnp.uint32), shape)
    d = jnp.broadcast_to(jnp.asarray(dim, jnp.uint32), shape)
    k = jnp.broadcast_to(jnp.asarray(seed, jnp.uint32), shape)
    v0, v1, _, _ = _pcg4d(z, s, d, k ^ jnp.uint32(0x9E3779B9))
    return _to_unit(v0), _to_unit(v1)


# --- scrambled Halton (QMC point sampler) -----------------------------------

# first 64 primes: bases for Halton dimensions (reference ext/halton supports
# 256 dims; beyond the table we fall back to the hash RNG like the reference
# falls back to SFMT, src/pointsampler.d/halton.c:75-84).
_PRIMES = np.array([
    2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67,
    71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131, 137, 139, 149,
    151, 157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211, 223, 227, 229,
    233, 239, 241, 251, 257, 263, 269, 271, 277, 281, 283, 293, 307, 311,
], dtype=np.uint32)
MAX_HALTON_DIM = len(_PRIMES)
# number of base-b digits needed to exhaust uint32 indices, per base
_NDIGITS = np.ceil(32.0 / np.log2(_PRIMES.astype(np.float64))).astype(np.int32)
_MAX_DIGITS = int(_NDIGITS.max())  # 32 (base 2)


def halton(index: jnp.ndarray, dim: int, seed=0) -> jnp.ndarray:
    """Owen-style scrambled radical inverse of ``index`` in the ``dim``-th
    prime base.  ``dim`` must be a python int < MAX_HALTON_DIM (the bounce
    scan uses static dims, so this holds by construction); digit permutations
    are derived per (digit, seed) from the hash, re-randomizable per frame
    like reference halton_init_random (ext/halton/halton.h:3244)."""
    if dim >= MAX_HALTON_DIM:
        return uniform(index, 0, dim, seed)
    b = int(_PRIMES[dim])
    nd = int(_NDIGITS[dim])
    idx = jnp.asarray(index, jnp.uint32)
    out = jnp.zeros(idx.shape, jnp.float32)
    inv = np.float32(1.0 / b)
    scale = jnp.full(idx.shape, inv, jnp.float32)
    for digit_pos in range(nd):
        digit = (idx % b).astype(jnp.uint32)
        idx = idx // b
        # per-digit-position scramble: digit -> (digit*a + c) % b with a,c
        # hashed from (dim, digit_pos, seed); a coprime to prime b for a != 0
        h0, h1, _, _ = _pcg4d(jnp.full(digit.shape, dim, jnp.uint32),
                              jnp.full(digit.shape, digit_pos, jnp.uint32),
                              jnp.broadcast_to(jnp.asarray(seed, jnp.uint32), digit.shape),
                              jnp.full(digit.shape, 0x5bd1e995, jnp.uint32))
        a = h0 % jnp.uint32(b - 1) + jnp.uint32(1)
        c = h1 % jnp.uint32(b)
        sd = (digit * a + c) % jnp.uint32(b)
        out = out + sd.astype(jnp.float32) * scale
        scale = scale * inv
    return jnp.minimum(out, np.float32(1.0 - 2 ** -24))


def sample_dim(kind: str, pixel, sample, dim: int, seed=0):
    """Dispatch between point samplers ('rand' hash or 'halton' QMC).

    For halton, stratification is over the global sample index with pixel
    scrambling folded into the seed (per-pixel Owen scrambling -> no
    structured aliasing between pixels)."""
    if kind == 'halton':
        pseed = uniform(pixel, 0, 0x7fffffff, seed)  # per-pixel scramble key
        pseed = (pseed * (2.0 ** 31)).astype(jnp.uint32)
        return halton(jnp.asarray(sample, jnp.uint32), dim, seed=pseed)
    return uniform(pixel, sample, dim, seed)
