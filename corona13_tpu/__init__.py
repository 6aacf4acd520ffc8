"""corona13_tpu — a TPU-native differentiable spectral path tracer.

Brand-new JAX/XLA/Pallas framework with the capabilities of the
hanatos/corona-13 research renderer (reference studied, not ported):
wavefront light transport over device arrays, static BSDF dispatch,
counter-based RNG, scatter-add splatting, and shard_map multi-chip tiles.
"""

__version__ = '0.1.0'
