"""Video-frame-interpolation (VFI) providers for multi-source supervision.

The reference inlines IFRNet and runs it at t=0.5 between adjacent frames
(`/root/reference/scene/vfi_model.py`, `trainer/trainer.py:60-70,242-261`),
spending ~50% of total training time there (README:132). Provider interface:

- "ifrnet": Flax IFRNet (ht3dgs.data.ifrnet) — the TPU-native port; needs
  the public IFRNet_Vimeo90K checkpoint converted via
  `ht3dgs.data.ifrnet.load_torch_checkpoint`.
- "precomputed": `{dir}/{i}_to_{i+1}.png` midway frames rendered offline.
- "blend": 0.5·(a+b) — a dependency-free fallback; MSS phase 2 degrades to
  frame averaging (useful for smoke tests, not for paper-parity runs).
- "none": disables VFI (multi_source_supervision without 'vfi').
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class VFIProvider:
    def __call__(self, img0: np.ndarray, img1: np.ndarray,
                 pair_name: str) -> np.ndarray:
        """img0/img1: [H, W, 3] float32 -> midway frame [H, W, 3]."""
        raise NotImplementedError


class BlendVFI(VFIProvider):
    def __call__(self, img0, img1, pair_name):
        return 0.5 * (img0 + img1)


class PrecomputedVFI(VFIProvider):
    def __init__(self, directory: str):
        self.dir = directory

    def __call__(self, img0, img1, pair_name):
        from PIL import Image

        for ext in (".png", ".jpg", ".npy"):
            p = os.path.join(self.dir, pair_name + ext)
            if os.path.exists(p):
                if ext == ".npy":
                    return np.load(p).astype(np.float32)
                return np.asarray(Image.open(p).convert("RGB"),
                                  np.float32) / 255.0
        raise FileNotFoundError(
            f"no precomputed VFI frame {pair_name} under {self.dir}")


class IFRNetVFI(VFIProvider):
    def __init__(self, checkpoint: Optional[str] = None):
        from . import ifrnet

        self.module, self.params = ifrnet.build(checkpoint)
        self._apply = None

    def __call__(self, img0, img1, pair_name):
        from . import ifrnet

        return ifrnet.interpolate(self.module, self.params, img0, img1)


def make_vfi_provider(kind: str, **kw) -> Optional[VFIProvider]:
    if kind in ("none", ""):
        return None
    if kind == "blend":
        return BlendVFI()
    if kind == "precomputed":
        return PrecomputedVFI(**kw)
    if kind == "ifrnet":
        return IFRNetVFI(**kw)
    raise ValueError(f"unknown VFI provider {kind}")
