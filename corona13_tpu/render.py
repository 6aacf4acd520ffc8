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
    # per-depth alive lane counts of the last progression (the path-length
    # histogram of the reference sidecar, view.c:758-790); None if the
    # caller skipped profiling
    path_hist: np.ndarray | None = None

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
            if self.path_hist is not None and len(self.path_hist):
                # unicode-bar path-length histogram like the reference
                # sidecar (view.c:758-790): share of paths alive per depth
                bars = ' ▁▂▃▄▅▆▇█'
                top = max(int(self.path_hist[0]), 1)
                line = ''.join(
                    bars[min(8, int(9 * c / top))] for c in self.path_hist)
                f.write(f'pathlen  : [{line}] '
                        f'{[int(c) for c in self.path_hist]}\n')
            for k, v in (extra or {}).items():
                f.write(f'{k:9s}: {v}\n')


def render(scene, cfg: pt_mod.PTConfig, spp: int = 16, batch: int = 0,
           progress: bool = False, path_hist: bool = False) -> RenderResult:
    """Render ``spp`` progressions (1 path/pixel each).

    ``batch`` progressions run per device launch (0 = auto: whole spp in
    one launch for small images, else 1)."""
    if batch <= 0:
        batch = spp if cfg.width * cfg.height * spp <= (1 << 21) else 1
    batch = min(batch, spp)
    if not cfg.media and (scene.has_hete
                          or bool(np.any(np.asarray(
                              scene.materials.med_enabled)))):
        # the scene carries participating media: enable the media path so
        # interior tracking + free flight actually run (forgetting the
        # static flag silently rendered media-free)
        cfg = cfg.replace(media=True)
    step = jax.jit(lambda sc, s: pt_mod.render_sample(sc, cfg, s, batch=batch))
    fb = jnp.zeros((cfg.height, cfg.width, 3))
    t0 = _time.time()
    done = 0
    while done < spp:
        fb = fb + step(scene, jnp.uint32(done))
        done += batch
        if progress:
            fb.block_until_ready()
            dt = _time.time() - t0
            print(f'  [{done}/{spp}] {dt / done:.3f}s/frame')
    fb.block_until_ready()
    seconds = _time.time() - t0
    hist = (np.asarray(pt_mod.alive_profile(scene, cfg, jnp.uint32(0)))
            if path_hist else None)
    return RenderResult(fb=np.asarray(fb), spp=done,
                        iso=float(scene.camera.iso), seconds=seconds,
                        path_hist=hist)
