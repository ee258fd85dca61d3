"""Loss parity: SSIM vs torch reference implementation, scale/shift-invariant
depth loss properties, total-loss composition."""

import numpy as np
import pytest

import jax.numpy as jnp

from ht3dgs.train import losses


def test_ssim_matches_torch_conv():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    a = rng.random((33, 47, 3)).astype(np.float32)
    b = np.clip(a + rng.standard_normal(a.shape).astype(np.float32) * 0.05,
                0, 1)
    ours = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))

    # reference formulation (11x11 gaussian window, sigma 1.5, zero pad)
    w1d = np.exp(-((np.arange(11) - 5) ** 2) / (2 * 1.5 ** 2))
    w1d = (w1d / w1d.sum()).astype(np.float32)
    w2d = np.outer(w1d, w1d)
    kernel = torch.from_numpy(np.tile(w2d[None, None], (3, 1, 1, 1)))

    def blur(x):
        return F.conv2d(x, kernel, padding=5, groups=3)

    ta = torch.from_numpy(a.transpose(2, 0, 1))[None]
    tb = torch.from_numpy(b.transpose(2, 0, 1))[None]
    mu1, mu2 = blur(ta), blur(tb)
    s1 = blur(ta * ta) - mu1 ** 2
    s2 = blur(tb * tb) - mu2 ** 2
    s12 = blur(ta * tb) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    smap = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))
    ref = float(smap.mean())
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ssim_identity_is_one():
    rng = np.random.default_rng(1)
    a = rng.random((20, 30, 3)).astype(np.float32)
    assert float(losses.ssim(jnp.asarray(a), jnp.asarray(a))) > 0.9999


def test_depth_loss_affine_invariance():
    """Loss must be ~0 when pred differs from gt by any positive affine."""
    rng = np.random.default_rng(2)
    gt = (rng.random((24, 32)) * 3 + 0.5).astype(np.float32)
    pred = (2.5 * gt + 1.2).astype(np.float32)
    loss = float(losses.scale_shift_invariant_depth_loss(
        jnp.asarray(pred), jnp.asarray(gt)))
    assert loss < 1e-5


def test_depth_loss_positive_for_mismatch():
    rng = np.random.default_rng(3)
    gt = (rng.random((24, 32)) * 3 + 0.5).astype(np.float32)
    pred = (rng.random((24, 32)) * 3 + 0.5).astype(np.float32)
    loss = float(losses.scale_shift_invariant_depth_loss(
        jnp.asarray(pred), jnp.asarray(gt)))
    assert loss > 1e-3


def test_total_loss_composition():
    rng = np.random.default_rng(4)
    a = rng.random((16, 16, 3)).astype(np.float32)
    b = rng.random((16, 16, 3)).astype(np.float32)
    d = losses.compute_loss(jnp.asarray(a), jnp.asarray(b),
                            lambda_dssim=0.2)
    expect = (0.8 * float(losses.l1_loss(jnp.asarray(a), jnp.asarray(b)))
              + 0.2 * (1 - float(losses.ssim(jnp.asarray(a),
                                             jnp.asarray(b)))))
    np.testing.assert_allclose(float(d["loss"]), expect, rtol=1e-6)
    assert float(d["loss_depth"]) == 0.0


def test_psnr():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(float(losses.psnr(a, b)), 20.0, atol=1e-4)
