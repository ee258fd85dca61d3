"""Image-quality metrics: PSNR / SSIM / LPIPS.

PSNR and SSIM are jnp (ht3dgs.train.losses). LPIPS follows the reference's
self-contained LPIPS v0.1 with a VGG16 backbone
(`/root/reference/lpipsPyTorch/`): here a *JAX* VGG16 feature stack with the
published linear LPIPS weights. Weights load from a local file
(`HT3DGS_LPIPS_WEIGHTS` or ~/.cache/ht3dgs/lpips_vgg.npz, produced by
`convert_lpips_weights` from the torchvision + LPIPS checkpoints); on hosts
without them `lpips()` raises a clear error and eval reports NaN for LPIPS
rather than failing the run.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..train.losses import psnr, ssim  # re-export  # noqa: F401

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
# LPIPS v0.1 taps the activations after each conv-stage (pre-pool ReLUs)
_TAPS = [1, 3, 6, 9, 12]  # indices into the conv list (0-based, after ReLU)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _weights_path() -> str:
    return os.environ.get(
        "HT3DGS_LPIPS_WEIGHTS",
        os.path.expanduser("~/.cache/ht3dgs/lpips_vgg.npz"))


_cached = None


def _load_weights():
    global _cached
    if _cached is None:
        path = _weights_path()
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"LPIPS weights not found at {path}; run "
                "ht3dgs.eval.metrics.convert_lpips_weights() on a host with "
                "the torchvision VGG16 + LPIPS checkpoints, or set "
                "HT3DGS_LPIPS_WEIGHTS.")
        _cached = dict(np.load(path))
    return _cached


def convert_lpips_weights(out_path: Optional[str] = None) -> str:
    """Export torchvision VGG16 conv weights + LPIPS v0.1 linear weights to
    a npz the JAX evaluator can load. Needs torch + cached checkpoints."""
    import torch
    import torchvision

    out_path = out_path or _weights_path()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features.eval()
    arrs = {}
    conv_idx = 0
    for layer in vgg:
        if isinstance(layer, torch.nn.Conv2d):
            arrs[f"conv{conv_idx}_w"] = layer.weight.detach().numpy()
            arrs[f"conv{conv_idx}_b"] = layer.bias.detach().numpy()
            conv_idx += 1
    url = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity"
           "/master/lpips/weights/v0.1/vgg.pth")
    lin = torch.hub.load_state_dict_from_url(url, map_location="cpu")
    for i in range(5):
        arrs[f"lin{i}"] = lin[f"lin{i}.model.1.weight"].detach().numpy()
    np.savez(out_path, **arrs)
    return out_path


def lpips(img0, img1) -> float:
    """LPIPS(vgg) distance between [H,W,3] images in [0,1]."""
    import jax
    import jax.numpy as jnp

    w = _load_weights()

    def features(x):
        # [H,W,3] in [0,1] -> [-1,1] -> LPIPS scaling
        x = x * 2.0 - 1.0
        x = (x - _SHIFT) / _SCALE
        x = x[None]  # NHWC
        feats = []
        ci = 0
        for v in _VGG_CFG:
            if v == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
                continue
            kern = jnp.asarray(w[f"conv{ci}_w"]).transpose(2, 3, 1, 0)
            x = jax.lax.conv_general_dilated(
                x, kern, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST)
            x = x + jnp.asarray(w[f"conv{ci}_b"])
            x = jax.nn.relu(x)
            if ci in _TAPS:
                feats.append(x)
            ci += 1
        return feats

    f0 = features(jnp.asarray(img0, jnp.float32))
    f1 = features(jnp.asarray(img1, jnp.float32))
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        d = (a - b) ** 2
        lin = jnp.asarray(w[f"lin{i}"]).reshape(-1)  # [C]
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1))
    import numpy as _np

    return float(total)


def try_lpips(img0, img1) -> float:
    try:
        return lpips(img0, img1)
    except FileNotFoundError:
        return float("nan")
