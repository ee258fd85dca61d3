"""LPIPS evaluator: math parity vs a torch twin with random VGG16 weights.

The real torchvision VGG16 + LPIPS v0.1 linear weights cannot be fetched on
this zero-egress host (convert_lpips_weights documents the offline path);
this test proves the JAX feature stack + normalization + linear combination
reproduces the torch semantics bit-for-bit given *any* weights, so the only
remaining variable is the weight files themselves."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ht3dgs.eval import metrics  # noqa: E402


def _random_vgg_weights(rng):
    w = {}
    cin = 3
    ci = 0
    for v in metrics._VGG_CFG:
        if v == "M":
            continue
        w[f"conv{ci}_w"] = (rng.standard_normal((v, cin, 3, 3)) *
                            np.sqrt(2.0 / (cin * 9))).astype(np.float32)
        w[f"conv{ci}_b"] = np.zeros(v, np.float32)
        cin = v
        ci += 1
    taps_c = [64, 128, 256, 512, 512]
    for i, c in enumerate(taps_c):
        w[f"lin{i}"] = rng.random((1, c, 1, 1)).astype(np.float32) * 0.1
    return w


def _torch_lpips(w, img0, img1):
    import torch.nn.functional as F

    shift = torch.tensor(metrics._SHIFT)
    scale = torch.tensor(metrics._SCALE)

    def feats(img):
        x = torch.from_numpy(img).permute(2, 0, 1)[None] * 2.0 - 1.0
        x = (x - shift[:, None, None]) / scale[:, None, None]
        fs = []
        ci = 0
        for v in metrics._VGG_CFG:
            if v == "M":
                x = F.max_pool2d(x, 2)
                continue
            x = F.relu(F.conv2d(x, torch.from_numpy(w[f"conv{ci}_w"]),
                                torch.from_numpy(w[f"conv{ci}_b"]),
                                padding=1))
            if ci in metrics._TAPS:
                fs.append(x)
            ci += 1
        return fs

    f0, f1 = feats(img0), feats(img1)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        a = a / a.norm(dim=1, keepdim=True).clamp_min(1e-10)
        b = b / b.norm(dim=1, keepdim=True).clamp_min(1e-10)
        lin = torch.from_numpy(w[f"lin{i}"]).reshape(1, -1, 1, 1)
        total = total + (lin * (a - b) ** 2).sum(dim=1).mean()
    return float(total)


def test_lpips_matches_torch_twin(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    w = _random_vgg_weights(rng)
    path = str(tmp_path / "lpips_vgg.npz")
    np.savez(path, **w)
    monkeypatch.setenv("HT3DGS_LPIPS_WEIGHTS", path)
    metrics._cached = None
    try:
        img0 = rng.random((33, 41, 3)).astype(np.float32)
        img1 = rng.random((33, 41, 3)).astype(np.float32)
        ours = metrics.lpips(img0, img1)
        ref = _torch_lpips(w, img0, img1)
        np.testing.assert_allclose(ours, ref, rtol=2e-4)
        # identical images -> exactly zero
        assert metrics.lpips(img0, img0) == pytest.approx(0.0, abs=1e-9)
        assert ours > 0.0
    finally:
        metrics._cached = None


def test_try_lpips_nan_without_weights(monkeypatch, tmp_path):
    monkeypatch.setenv("HT3DGS_LPIPS_WEIGHTS",
                       str(tmp_path / "missing.npz"))
    metrics._cached = None
    try:
        assert np.isnan(metrics.try_lpips(np.zeros((8, 8, 3), np.float32),
                                          np.zeros((8, 8, 3), np.float32)))
    finally:
        metrics._cached = None
