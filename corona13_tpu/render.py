"""Progressive rendering loop and output.

The analogue of the reference's frame loop (corona-13 src/view.c:630-694 +
src/main.c:386-414): progressions accumulate unnormalized splat sums into a
framebuffer; the displayed/stored image is fb * gain with
gain = user_gain * iso / (100 * progressions) (view.c:651-657).
"""

from __future__ import annotations

import dataclasses
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from .samplers import pt as pt_mod
from .io import pfm as pfm_io
from .spectral import colour


@dataclasses.dataclass
class RenderResult:
    fb: np.ndarray          # [H, W, 3] unnormalized XYZ sum
    spp: int
    iso: float
    seconds: float
    rays: int = 0

    @property
    def image_xyz(self) -> np.ndarray:
        return self.fb * (self.iso / (100.0 * max(self.spp, 1)))

    @property
    def image_srgb(self) -> np.ndarray:
        lin = np.asarray(colour.convert(jnp.asarray(self.image_xyz), 'xyz', 'srgb'))
        return np.asarray(colour.srgb_gamma(jnp.asarray(lin)))

    def write_pfm(self, path: str) -> None:
        pfm_io.write_pfm(path, self.image_xyz)

    def write_sidecar(self, path: str, extra: dict | None = None) -> None:
        """Per-render metadata text file (common_write_sidecar,
        src/corona_common.c:70-97)."""
        with open(path, 'w') as f:
            f.write('corona13_tpu render\n')
            f.write(f'spp      : {self.spp}\n')
            f.write(f'time     : {self.seconds:.2f}s total\n')
            if self.spp:
                f.write(f'         : {self.seconds / self.spp:.3f}s/progression\n')
            f.write(f'iso      : {self.iso}\n')
            for k, v in (extra or {}).items():
                f.write(f'{k:9s}: {v}\n')


def render(scene, cfg: pt_mod.PTConfig, spp: int = 16,
           progress: bool = False) -> RenderResult:
    """Render ``spp`` progressions (1 path/pixel each)."""
    step = jax.jit(pt_mod.render_sample, static_argnames=()).lower(
        scene, cfg, jnp.uint32(0)).compile() if False else jax.jit(
        lambda sc, s: pt_mod.render_sample(sc, cfg, s))
    fb = jnp.zeros((cfg.height, cfg.width, 3))
    t0 = _time.time()
    for s in range(spp):
        fb = fb + step(scene, jnp.uint32(s))
        if progress and (s + 1) % 8 == 0:
            fb.block_until_ready()
            dt = _time.time() - t0
            print(f'  [{s + 1}/{spp}] {dt / (s + 1):.3f}s/frame')
    fb.block_until_ready()
    seconds = _time.time() - t0
    return RenderResult(fb=np.asarray(fb), spp=spp,
                        iso=float(scene.camera.iso), seconds=seconds)
