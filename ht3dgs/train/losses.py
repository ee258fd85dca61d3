"""Training losses.

Parity with the reference `Loss` module (`/root/reference/trainer/losses.py`):
total = (1-λ_dssim)·L1 + λ_dssim·(1-SSIM) + λ_depth·ScaleShiftInvariant,
defaults λ_dssim=0.2, λ_depth=0.0 (`/root/reference/arguments/__init__.py:134-135`)
— the depth term is off by default; mono depth is used for point-cloud init.

SSIM is the classic 11×11 Gaussian-window (σ=1.5) version, implemented as two
separable depthwise convolutions in NHWC (TPU-friendly); zero padding matches
torch's conv2d(padding=window//2).
Images here are channel-last [H, W, 3] in [0, 1].
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_blur(x: jax.Array, window: np.ndarray) -> jax.Array:
    """x: [H, W, C] -> separable depthwise conv, zero padding."""
    C = x.shape[-1]
    k = window.shape[0]
    pad = k // 2
    kx = jnp.asarray(window).reshape(1, k, 1, 1) * jnp.ones((1, 1, 1, C))
    ky = jnp.asarray(window).reshape(k, 1, 1, 1) * jnp.ones((1, 1, 1, C))
    y = x[None]
    # HIGHEST: TPU conv default precision is bf16; SSIM feeds the training
    # loss, so keep it f32-exact like the reference's torch conv
    y = jax.lax.conv_general_dilated(
        y, kx, (1, 1), [(0, 0), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST)
    y = jax.lax.conv_general_dilated(
        y, ky, (1, 1), [(pad, pad), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST)
    return y[0]


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """Mean SSIM over [H, W, C] images (matches SSIM_V2,
    /root/reference/trainer/losses.py:212-251)."""
    w = _gaussian_window(window_size)
    mu1 = _depthwise_blur(img1, w)
    mu2 = _depthwise_blur(img2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, w) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, w) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, w) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return jnp.mean(ssim_map)


def l1_loss(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


# ---------------------------------------------------------------------------
# sharded (row-block) variants — exact under shard_map over a named axis
# ---------------------------------------------------------------------------

def _exchange_row_halos(x: jax.Array, axis_name: str, halo: int) -> jax.Array:
    """[bh, W, C] local row-block -> [bh + 2*halo, W, C] with the neighbor
    shards' boundary rows attached. Blocks are assumed laid out in axis-index
    order along the image height. Missing neighbors (global image top/bottom)
    contribute zeros — exactly the single-device conv's zero padding."""
    n = jax.lax.axis_size(axis_name)
    # my bottom rows -> next shard's top halo (ppermute zero-fills the edges)
    top = jax.lax.ppermute(x[-halo:], axis_name,
                           [(i, i + 1) for i in range(n - 1)])
    bot = jax.lax.ppermute(x[:halo], axis_name,
                           [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([top, x, bot], axis=0)


def ssim_sharded(img1: jax.Array, img2: jax.Array, axis_name: str,
                 window_size: int = 11) -> jax.Array:
    """Exact mean SSIM when the image rows are sharded over `axis_name`.

    A 5-row halo exchange (lax.ppermute over ICI) reproduces the full-image
    11x11 window at shard boundaries; the halo'd SSIM map is cropped back to
    the local block and pmean'ed, so the result (and its gradient) matches
    the single-device `ssim` bitwise up to reduction order."""
    halo = window_size // 2
    e1 = _exchange_row_halos(img1, axis_name, halo)
    e2 = _exchange_row_halos(img2, axis_name, halo)
    w = _gaussian_window(window_size)
    mu1 = _depthwise_blur(e1, w)
    mu2 = _depthwise_blur(e2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(e1 * e1, w) - mu1_sq
    sigma2_sq = _depthwise_blur(e2 * e2, w) - mu2_sq
    sigma12 = _depthwise_blur(e1 * e2, w) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    local = jnp.mean(ssim_map[halo:-halo])
    return jax.lax.pmean(local, axis_name)


def scale_shift_invariant_depth_loss_sharded(
        depth_pred, depth_gt, axis_name: str, mask=None,
        alpha: float = 0.5) -> jax.Array:
    """Row-block-sharded twin of `scale_shift_invariant_depth_loss`: the
    scale/shift normal equations and all sums are psum'ed over the axis, and
    the vertical gradient-matching term exchanges a 1-row halo so boundary
    row pairs are counted exactly once (by the shard that owns the upper
    row of the pair)."""
    if mask is None:
        mask = (depth_gt > 0.02).astype(depth_pred.dtype)

    def gsum(x):
        return jax.lax.psum(jnp.sum(x), axis_name)

    a00 = gsum(mask * depth_pred * depth_pred)
    a01 = gsum(mask * depth_pred)
    a11 = gsum(mask)
    b0 = gsum(mask * depth_pred * depth_gt)
    b1 = gsum(mask * depth_gt)
    det = a00 * a11 - a01 * a01
    ok = det != 0.0
    det_safe = jnp.where(ok, det, 1.0)
    s = jnp.where(ok, (a11 * b0 - a01 * b1) / det_safe, 0.0)
    t = jnp.where(ok, (-a01 * b0 + a00 * b1) / det_safe, 0.0)

    res = s * depth_pred + t - depth_gt
    denom = jnp.maximum(a11, 1.0)
    data_term = gsum(mask * res * res) / (2.0 * denom)

    diff = mask * res
    gx = jnp.abs(diff[:, 1:] - diff[:, :-1]) * (mask[:, 1:] * mask[:, :-1])
    # vertical pairs crossing the boundary: fetch the next shard's first row
    n = jax.lax.axis_size(axis_name)
    nxt_d = jax.lax.ppermute(diff[:1], axis_name,
                             [(i + 1, i) for i in range(n - 1)])
    nxt_m = jax.lax.ppermute(mask[:1], axis_name,
                             [(i + 1, i) for i in range(n - 1)])
    is_last = jax.lax.axis_index(axis_name) == n - 1
    dext = jnp.concatenate([diff, nxt_d], axis=0)
    mext = jnp.concatenate([mask, jnp.where(is_last, 0.0, nxt_m)], axis=0)
    gy = jnp.abs(dext[1:] - dext[:-1]) * (mext[1:] * mext[:-1])
    grad_term = (gsum(gx) + gsum(gy)) / denom
    return data_term + alpha * grad_term


# ---------------------------------------------------------------------------
# MiDaS scale/shift-invariant depth loss (+ gradient matching), parity with
# ScaleAndShiftInvariantLoss(alpha=0.5, scales=1)
# (/root/reference/trainer/losses.py:259-398)
# ---------------------------------------------------------------------------

def compute_scale_and_shift(prediction, target, mask):
    """Closed-form least-squares (scale, shift) aligning pred to target.
    All inputs [H, W]."""
    a00 = jnp.sum(mask * prediction * prediction)
    a01 = jnp.sum(mask * prediction)
    a11 = jnp.sum(mask)
    b0 = jnp.sum(mask * prediction * target)
    b1 = jnp.sum(mask * target)
    det = a00 * a11 - a01 * a01
    ok = det != 0.0
    det_safe = jnp.where(ok, det, 1.0)
    x0 = jnp.where(ok, (a11 * b0 - a01 * b1) / det_safe, 0.0)
    x1 = jnp.where(ok, (-a01 * b0 + a00 * b1) / det_safe, 0.0)
    return x0, x1


def _gradient_matching(diff, mask):
    gx = jnp.abs(diff[:, 1:] - diff[:, :-1]) * (mask[:, 1:] * mask[:, :-1])
    gy = jnp.abs(diff[1:, :] - diff[:-1, :]) * (mask[1:, :] * mask[:-1, :])
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return (jnp.sum(gx) + jnp.sum(gy)) / denom


def scale_shift_invariant_depth_loss(depth_pred, depth_gt, mask=None,
                                     alpha: float = 0.5) -> jax.Array:
    """[H, W] depths. mask defaults to depth_gt > 0.02 (the trainer's rule,
    /root/reference/trainer/losses.py:90-95)."""
    if mask is None:
        mask = (depth_gt > 0.02).astype(depth_pred.dtype)
    s, t = compute_scale_and_shift(depth_pred, depth_gt, mask)
    pred_ssi = s * depth_pred + t
    res = pred_ssi - depth_gt
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    data_term = jnp.sum(mask * res * res) / (2.0 * denom)
    grad_term = _gradient_matching(mask * res, mask)
    return data_term + alpha * grad_term


def compute_loss(
    image: jax.Array,
    gt_image: jax.Array,
    lambda_dssim: float = 0.2,
    lambda_depth: float = 0.0,
    depth_pred: Optional[jax.Array] = None,
    depth_gt: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Total loss, parity with Loss.forward
    (/root/reference/trainer/losses.py:98-136)."""
    rgb_full = (1.0 - lambda_dssim) * l1_loss(image, gt_image)
    dssim = 1.0 - ssim(image, gt_image) if lambda_dssim != 0.0 else jnp.asarray(0.0)
    if lambda_depth != 0.0 and depth_pred is not None and depth_gt is not None:
        dp = jnp.clip(depth_pred, 0.02, 20.0)
        depth_loss = scale_shift_invariant_depth_loss(dp, depth_gt)
    else:
        depth_loss = jnp.asarray(0.0)
    loss = rgb_full + lambda_dssim * dssim + lambda_depth * depth_loss
    return {
        "loss": loss,
        "loss_rgb": rgb_full,
        "loss_dssim": dssim,
        "loss_depth": depth_loss,
    }


def psnr(pred, gt):
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
