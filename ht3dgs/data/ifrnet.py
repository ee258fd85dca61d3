"""IFRNet video-frame interpolation in JAX (NHWC, TPU-native).

Functional re-implementation of the public IFRNet architecture (Kong et al.,
CVPR 2022) that the reference inlines for its VFI supervision
(`/root/reference/scene/vfi_model.py`; weights `IFRNet_Vimeo90K.pth`):
a 4-level conv encoder (stride-2 pyramids 32/48/72/96 + PReLU) and four
coarse-to-fine decoders, each = convrelu -> side-channel ResBlock ->
4x4/stride-2 transposed conv, predicting bidirectional flows, a merge mask
and a residual; frames are backward-warped (bilinear, border padding,
align_corners=True) and merged at t=0.5.

Parameters are stored under the torch state_dict naming so the public
checkpoint converts 1:1 (`load_torch_checkpoint`); all convs run in NHWC on
the MXU. Per-op parity with torch (conv/transposed-conv/PReLU/warp/resize)
is covered by tests/test_ifrnet.py against torch CPU.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# ops (NHWC)
# ---------------------------------------------------------------------------

def conv2d(x, w_oihw, b, stride=1, padding=1):
    w = jnp.transpose(w_oihw, (2, 3, 1, 0))  # OIHW -> HWIO
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return y + b


def conv_transpose2d_k4s2p1(x, w_iohw, b):
    """torch ConvTranspose2d(k=4, s=2, p=1): H -> 2H. Expressed as the
    gradient of a stride-2 conv: input dilation 2, padding k-1-p = 2,
    flipped kernel."""
    w = jnp.transpose(w_iohw, (2, 3, 0, 1))      # IOHW -> HWIO (I in, O out)
    w = w[::-1, ::-1]                            # flip spatial dims
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=[(2, 2), (2, 2)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return y + b


def prelu(x, a):
    return jnp.where(x >= 0, x, a * x)


def resize_bilinear(x, scale: float):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, int(round(h * scale)),
                                int(round(w * scale)), c), "bilinear")


def warp(img, flow):
    """Backward warp img by flow (pixels), bilinear, border padding,
    align_corners=True grid (parity with the reference's grid_sample call).
    img/flow: NHWC, flow channels (dx, dy)."""
    n, h, w, _ = img.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    fx = gx[None] + flow[..., 0]
    fy = gy[None] + flow[..., 1]
    fx = jnp.clip(fx, 0.0, w - 1.0)
    fy = jnp.clip(fy, 0.0, h - 1.0)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = fx - x0
    wy = fy - y0

    def gather(yy, xx):
        idx = (yy * w + xx).astype(jnp.int32)
        flat = img.reshape(n, h * w, -1)
        return jnp.take_along_axis(flat, idx.reshape(n, -1, 1), axis=1
                                   ).reshape(img.shape)

    i00 = gather(y0, x0)
    i01 = gather(y0, x1)
    i10 = gather(y1, x0)
    i11 = gather(y1, x1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (i00 * (1 - wx) * (1 - wy) + i01 * wx * (1 - wy)
            + i10 * (1 - wx) * wy + i11 * wx * wy)


# ---------------------------------------------------------------------------
# blocks, keyed by torch state_dict names
# ---------------------------------------------------------------------------

def _convrelu(p, prefix, x, stride=1):
    x = conv2d(x, p[f"{prefix}.0.weight"], p[f"{prefix}.0.bias"],
               stride=stride)
    return prelu(x, p[f"{prefix}.1.weight"])


def _resblock(p, prefix, x, side: int = 32):
    out = conv2d(x, p[f"{prefix}.conv1.0.weight"], p[f"{prefix}.conv1.0.bias"])
    out = prelu(out, p[f"{prefix}.conv1.1.weight"])
    s = out[..., -side:]
    s = prelu(conv2d(s, p[f"{prefix}.conv2.0.weight"],
                     p[f"{prefix}.conv2.0.bias"]), p[f"{prefix}.conv2.1.weight"])
    out = jnp.concatenate([out[..., :-side], s], axis=-1)
    out = prelu(conv2d(out, p[f"{prefix}.conv3.0.weight"],
                       p[f"{prefix}.conv3.0.bias"]), p[f"{prefix}.conv3.1.weight"])
    s = out[..., -side:]
    s = prelu(conv2d(s, p[f"{prefix}.conv4.0.weight"],
                     p[f"{prefix}.conv4.0.bias"]), p[f"{prefix}.conv4.1.weight"])
    out = jnp.concatenate([out[..., :-side], s], axis=-1)
    out = conv2d(out, p[f"{prefix}.conv5.weight"], p[f"{prefix}.conv5.bias"])
    return prelu(x + out, p[f"{prefix}.prelu.weight"])


def _encoder(p, img):
    f1 = _convrelu(p, "encoder.pyramid1.0", img, stride=2)
    f1 = _convrelu(p, "encoder.pyramid1.1", f1)
    f2 = _convrelu(p, "encoder.pyramid2.0", f1, stride=2)
    f2 = _convrelu(p, "encoder.pyramid2.1", f2)
    f3 = _convrelu(p, "encoder.pyramid3.0", f2, stride=2)
    f3 = _convrelu(p, "encoder.pyramid3.1", f3)
    f4 = _convrelu(p, "encoder.pyramid4.0", f3, stride=2)
    f4 = _convrelu(p, "encoder.pyramid4.1", f4)
    return f1, f2, f3, f4


def _decoder(p, name, f_in):
    x = _convrelu(p, f"{name}.convblock.0", f_in)
    x = _resblock(p, f"{name}.convblock.1", x)
    return conv_transpose2d_k4s2p1(x, p[f"{name}.convblock.2.weight"],
                                   p[f"{name}.convblock.2.bias"])


def interpolate_fn(params: Dict[str, jnp.ndarray], img0, img1,
                   embt: float = 0.5):
    """img0/img1: [N, H, W, 3] in [0,1], H and W divisible by 16."""
    mean_ = jnp.mean(jnp.concatenate([img0, img1], axis=1),
                     axis=(1, 2, 3), keepdims=True)
    img0 = img0 - mean_
    img1 = img1 - mean_

    f0 = _encoder(params, img0)
    f1 = _encoder(params, img1)

    n, h4, w4, _ = f0[3].shape
    embt_map = jnp.full((n, h4, w4, 1), embt, jnp.float32)
    out4 = _decoder(params, "decoder4",
                    jnp.concatenate([f0[3], f1[3], embt_map], axis=-1))
    up_flow0 = out4[..., 0:2]
    up_flow1 = out4[..., 2:4]
    ft_ = out4[..., 4:]

    for lvl, name in ((2, "decoder3"), (1, "decoder2"), (0, "decoder1")):
        f0w = warp(f0[lvl], up_flow0)
        f1w = warp(f1[lvl], up_flow1)
        f_in = jnp.concatenate([ft_, f0w, f1w, up_flow0, up_flow1], axis=-1)
        out = _decoder(params, name, f_in)
        up_flow0 = out[..., 0:2] + 2.0 * resize_bilinear(up_flow0, 2.0)
        up_flow1 = out[..., 2:4] + 2.0 * resize_bilinear(up_flow1, 2.0)
        if name == "decoder1":
            mask = jax.nn.sigmoid(out[..., 4:5])
            res = out[..., 5:8]
        else:
            ft_ = out[..., 4:]

    img0_warp = warp(img0, up_flow0)
    img1_warp = warp(img1, up_flow1)
    merged = mask * img0_warp + (1.0 - mask) * img1_warp + mean_
    return jnp.clip(merged + res, 0.0, 1.0)


# ---------------------------------------------------------------------------
# checkpoint / API
# ---------------------------------------------------------------------------

def param_spec() -> Dict[str, Tuple[int, ...]]:
    """Complete name -> shape map of the IFRNet(Vimeo90K) weights under the
    torch state_dict naming (pyramid channels 32/48/72/96; decoders
    193->192->76, 220->216->52, 148->144->36, 100->96->8). Used to validate
    converted checkpoints for completeness and by tests to run the network
    with random weights (the published .pth cannot be fetched from a
    zero-egress host)."""
    spec: Dict[str, Tuple[int, ...]] = {}

    def convrelu(prefix, cin, cout, k=3):
        spec[f"{prefix}.0.weight"] = (cout, cin, k, k)
        spec[f"{prefix}.0.bias"] = (cout,)
        spec[f"{prefix}.1.weight"] = (cout,)      # per-channel PReLU

    def resblock(prefix, c, side=32):
        convrelu(f"{prefix}.conv1", c, c)
        convrelu(f"{prefix}.conv2", side, side)
        convrelu(f"{prefix}.conv3", c, c)
        convrelu(f"{prefix}.conv4", side, side)
        spec[f"{prefix}.conv5.weight"] = (c, c, 3, 3)
        spec[f"{prefix}.conv5.bias"] = (c,)
        spec[f"{prefix}.prelu.weight"] = (c,)

    pyramids = [("pyramid1", 3, 32), ("pyramid2", 32, 48),
                ("pyramid3", 48, 72), ("pyramid4", 72, 96)]
    for name, cin, cout in pyramids:
        convrelu(f"encoder.{name}.0", cin, cout)
        convrelu(f"encoder.{name}.1", cout, cout)
    decoders = [("decoder4", 193, 192, 76), ("decoder3", 220, 216, 52),
                ("decoder2", 148, 144, 36), ("decoder1", 100, 96, 8)]
    for name, cin, cmid, cout in decoders:
        convrelu(f"{name}.convblock.0", cin, cmid)
        resblock(f"{name}.convblock.1", cmid)
        # ConvTranspose2d stores IOHW
        spec[f"{name}.convblock.2.weight"] = (cmid, cout, 4, 4)
        spec[f"{name}.convblock.2.bias"] = (cout,)
    return spec


def random_params(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random parameters matching `param_spec` (He-ish scaling, PReLU slopes
    at the torch init 0.25). For tests and smoke runs only."""
    rng = np.random.default_rng(seed)
    out = {}
    for k, shape in param_spec().items():
        if k.endswith("1.weight") and len(shape) == 1 or \
                k.endswith("prelu.weight"):
            out[k] = np.full(shape, 0.25, np.float32)
        elif k.endswith("bias"):
            out[k] = np.zeros(shape, np.float32)
        else:
            fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
            out[k] = (rng.standard_normal(shape) *
                      np.sqrt(2.0 / max(fan_in, 1))).astype(np.float32)
    return out


def validate_params(params: Dict[str, np.ndarray]):
    """Raise if a converted checkpoint is missing weights or has shape
    mismatches; returns the list of unused extra keys (e.g. optimizer
    buffers) that were ignored."""
    spec = param_spec()
    missing = [k for k in spec if k not in params]
    if missing:
        raise ValueError(f"IFRNet checkpoint is missing {len(missing)} "
                         f"weights, e.g. {missing[:5]}")
    bad = [(k, tuple(np.shape(params[k])), spec[k]) for k in spec
           if tuple(np.shape(params[k])) != spec[k]]
    if bad:
        raise ValueError(f"IFRNet checkpoint shape mismatches: {bad[:5]}")
    return [k for k in params if k not in spec]


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "")
        out[k] = v.detach().numpy().astype(np.float32)
    return out


def build(checkpoint: Optional[str] = None):
    if checkpoint is None:
        raise ValueError(
            "IFRNet needs a converted IFRNet_Vimeo90K checkpoint; use the "
            "'blend' or 'precomputed' VFI provider on hosts without it")
    if checkpoint.endswith(".npz"):
        loaded = dict(np.load(checkpoint))
    else:
        loaded = load_torch_checkpoint(checkpoint)
    validate_params(loaded)
    params = {k: jnp.asarray(v) for k, v in loaded.items()
              if k in param_spec()}
    return None, params


_jit_interp = jax.jit(interpolate_fn, static_argnames=("embt",))


def interpolate(module, params, img0: np.ndarray, img1: np.ndarray,
                embt: float = 0.5) -> np.ndarray:
    """[H, W, 3] float32 frames -> midway frame. Pads to /16 internally
    (InputPadder semantics, /root/reference/utils/vfi_utils.py:4-23)."""
    h, w, _ = img0.shape
    ph = (-h) % 16
    pw = (-w) % 16
    a = np.pad(img0, ((0, ph), (0, pw), (0, 0)), mode="edge")[None]
    b = np.pad(img1, ((0, ph), (0, pw), (0, 0)), mode="edge")[None]
    out = _jit_interp(params, jnp.asarray(a), jnp.asarray(b), embt=embt)
    return np.asarray(out)[0, :h, :w]
