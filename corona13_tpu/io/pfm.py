"""PFM (portable float map) image IO.

Matches the reference's output format (corona-13 src/screenshot.c /
tools/img/pfmdiff.c:48-50): header ``PF\n<w> <h>\n<scale>\n`` followed by
little-endian float RGB rows; negative scale means little endian.  The
reference writes rows top-to-bottom (regression converts with -flip).
"""

from __future__ import annotations

import numpy as np


def write_pfm(path: str, img: np.ndarray) -> None:
    """img: [h, w, 3] float32, row 0 at the top (reference convention)."""
    img = np.asarray(img, np.float32)
    h, w, c = img.shape
    assert c == 3
    with open(path, 'wb') as f:
        f.write(b'PF\n')
        f.write(f'{w} {h}\n'.encode())
        f.write(b'-1.0\n')
        f.write(img.astype('<f4').tobytes())


def read_pfm(path: str) -> np.ndarray:
    with open(path, 'rb') as f:
        magic = f.readline().strip()
        if magic not in (b'PF', b'Pf'):
            raise ValueError(f'{path}: not a PFM file')
        dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline())
        nchan = 3 if magic == b'PF' else 1
        dtype = '<f4' if scale < 0 else '>f4'
        data = np.frombuffer(f.read(4 * w * h * nchan), dtype)
    return data.reshape(h, w, nchan).astype(np.float32)


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    """Root-mean-square error over all channels — the regression gate metric
    (reference tools/img/pfmdiff.c)."""
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    return float(np.sqrt(np.mean(d * d)))
