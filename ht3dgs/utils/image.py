"""Image output helpers: depth colorization + side-by-side dumps.

Parity with the reference's qualitative outputs (`colorize`
`/root/reference/utils/image_utils.py:90-145`; `visualize`
`trainer/ht3dgs_trainer.py:1299-1336`): magma-colormapped depth/acc PNGs and
GT|render side-by-side frames.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def colorize(value: np.ndarray, vmin: Optional[float] = None,
             vmax: Optional[float] = None, cmap: str = "magma_r",
             invalid_val: float = -99.0) -> np.ndarray:
    """[H, W] scalar map -> [H, W, 3] uint8 colormapped image."""
    value = np.asarray(value, dtype=np.float64).squeeze()
    mask = value != invalid_val
    vmin = np.percentile(value[mask], 2) if vmin is None and mask.any() \
        else (vmin or 0.0)
    vmax = np.percentile(value[mask], 85) if vmax is None and mask.any() \
        else (vmax or 1.0)
    if vmin != vmax:
        value = (value - vmin) / (vmax - vmin)
    else:
        value = value * 0.0
    value = np.clip(value, 0.0, 1.0)
    try:
        import matplotlib

        cm = matplotlib.colormaps[cmap]
        rgba = cm(value, bytes=True)
        out = rgba[..., :3]
    except Exception:
        g = (value * 255).astype(np.uint8)
        out = np.stack([g, g, g], axis=-1)
    out[~mask] = 128
    return out


def save_image(path: str, image: np.ndarray,
               gt_image: Optional[np.ndarray] = None):
    """Save render (optionally GT|render side-by-side) as PNG.
    Inputs [H, W, 3] float in [0, 1]."""
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8)
    if gt_image is not None:
        gt = (np.clip(np.asarray(gt_image), 0, 1) * 255).astype(np.uint8)
        img = np.hstack([gt, img])
    Image.fromarray(img).save(path)


def save_depth(path: str, depth: np.ndarray,
               gt_depth: Optional[np.ndarray] = None, cmap: str = "magma_r"):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    d = colorize(np.asarray(depth), cmap=cmap)
    if gt_depth is not None:
        d = np.hstack([colorize(np.asarray(gt_depth), cmap=cmap), d])
    Image.fromarray(d).save(path)
