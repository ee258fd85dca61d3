"""IFRNet JAX port: per-op parity vs torch CPU + end-to-end smoke with
random weights (the real Vimeo90K checkpoint is not shipped; op parity is
what guarantees correct conversion)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from ht3dgs.data import ifrnet  # noqa: E402


def test_conv2d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 10, 12, 5)).astype(np.float32)
    w = rng.standard_normal((7, 5, 3, 3)).astype(np.float32)
    b = rng.standard_normal(7).astype(np.float32)
    ours = np.asarray(ifrnet.conv2d(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(b), stride=2))
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), stride=2, padding=1)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4)


def test_conv_transpose_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 6, 7, 4)).astype(np.float32)
    w = rng.standard_normal((4, 9, 4, 4)).astype(np.float32)  # IOHW
    b = rng.standard_normal(9).astype(np.float32)
    ours = np.asarray(ifrnet.conv_transpose2d_k4s2p1(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), stride=2, padding=1)
    assert ours.shape == (1, 12, 14, 9)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4)


def test_warp_matches_grid_sample():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((2, 9, 11, 3)).astype(np.float32)
    flow = (rng.standard_normal((2, 9, 11, 2)) * 2).astype(np.float32)
    ours = np.asarray(ifrnet.warp(jnp.asarray(img), jnp.asarray(flow)))

    B, H, W, _ = img.shape
    t_img = torch.from_numpy(img.transpose(0, 3, 1, 2))
    t_flow = torch.from_numpy(flow.transpose(0, 3, 1, 2))
    xx = torch.linspace(-1, 1, W).view(1, 1, 1, W).expand(B, -1, H, -1)
    yy = torch.linspace(-1, 1, H).view(1, 1, H, 1).expand(B, -1, -1, W)
    grid = torch.cat([xx, yy], 1)
    flow_ = torch.cat([t_flow[:, 0:1] / ((W - 1) / 2.0),
                       t_flow[:, 1:2] / ((H - 1) / 2.0)], 1)
    ref = torch.nn.functional.grid_sample(
        t_img, (grid + flow_).permute(0, 2, 3, 1), mode="bilinear",
        padding_mode="border", align_corners=True)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_resize_matches_torch_bilinear():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8, 10, 3)).astype(np.float32)
    ours = np.asarray(ifrnet.resize_bilinear(jnp.asarray(x), 2.0))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2.0,
        mode="bilinear", align_corners=False)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def _random_params(rng):
    """Random weights with the exact IFRNet state_dict shapes."""
    p = {}

    def conv(prefix, cin, cout, prelu=True):
        p[f"{prefix}.0.weight"] = rng.standard_normal(
            (cout, cin, 3, 3)).astype(np.float32) * 0.05
        p[f"{prefix}.0.bias"] = np.zeros(cout, np.float32)
        if prelu:
            p[f"{prefix}.1.weight"] = np.full(cout, 0.25, np.float32)

    def resblock(prefix, c, side=32):
        for name, ci, co in (("conv1", c, c), ("conv2", side, side),
                             ("conv3", c, c), ("conv4", side, side)):
            p[f"{prefix}.{name}.0.weight"] = rng.standard_normal(
                (co, ci, 3, 3)).astype(np.float32) * 0.05
            p[f"{prefix}.{name}.0.bias"] = np.zeros(co, np.float32)
            p[f"{prefix}.{name}.1.weight"] = np.full(co, 0.25, np.float32)
        p[f"{prefix}.conv5.weight"] = rng.standard_normal(
            (c, c, 3, 3)).astype(np.float32) * 0.05
        p[f"{prefix}.conv5.bias"] = np.zeros(c, np.float32)
        p[f"{prefix}.prelu.weight"] = np.full(c, 0.25, np.float32)

    def deconv(prefix, cin, cout):
        p[f"{prefix}.weight"] = rng.standard_normal(
            (cin, cout, 4, 4)).astype(np.float32) * 0.05
        p[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    chans = [(3, 32), (32, 48), (48, 72), (72, 96)]
    for i, (ci, co) in enumerate(chans, start=1):
        conv(f"encoder.pyramid{i}.0", ci, co)
        conv(f"encoder.pyramid{i}.1", co, co)
    specs = {"decoder4": (193, 192, 76), "decoder3": (220, 216, 52),
             "decoder2": (148, 144, 36), "decoder1": (100, 96, 8)}
    for name, (cin, mid, cout) in specs.items():
        conv(f"{name}.convblock.0", cin, mid)
        resblock(f"{name}.convblock.1", mid)
        deconv(f"{name}.convblock.2", mid, cout)
    return p


def test_interpolate_end_to_end_shapes():
    rng = np.random.default_rng(4)
    params = {k: jnp.asarray(v) for k, v in _random_params(rng).items()}
    img0 = rng.random((37, 45, 3)).astype(np.float32)
    img1 = rng.random((37, 45, 3)).astype(np.float32)
    out = ifrnet.interpolate(None, params, img0, img1)
    assert out.shape == (37, 45, 3)
    assert np.all(np.isfinite(out))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_param_spec_matches_network_consumption():
    """ifrnet.param_spec() must name exactly the weights interpolate_fn
    reads (same keys/shapes the public IFRNet_Vimeo90K.pth provides)."""
    rng = np.random.default_rng(5)
    spec = ifrnet.param_spec()
    test_keys = set(_random_params(rng).keys())
    assert set(spec.keys()) == test_keys
    for k, v in _random_params(rng).items():
        assert tuple(v.shape) == spec[k], k


def test_checkpoint_conversion_roundtrip(tmp_path):
    """torch.save -> build(): the full conversion path (module.-prefix strip,
    dtype cast, key/shape validation) produces a working network; an extra
    optimizer buffer is ignored, a missing weight raises."""
    rng = np.random.default_rng(6)
    raw = ifrnet.random_params(seed=6)
    sd = {f"module.{k}": torch.from_numpy(v.copy()).double()
          for k, v in raw.items()}
    sd["module.optimizer_junk"] = torch.zeros(3)
    path = str(tmp_path / "ckpt.pth")
    torch.save(sd, path)

    _, params = ifrnet.build(path)
    assert set(params.keys()) == set(ifrnet.param_spec().keys())
    img0 = rng.random((32, 48, 3)).astype(np.float32)
    img1 = rng.random((32, 48, 3)).astype(np.float32)
    out_ckpt = ifrnet.interpolate(None, params, img0, img1)
    out_direct = ifrnet.interpolate(
        None, {k: jnp.asarray(v) for k, v in raw.items()}, img0, img1)
    np.testing.assert_allclose(out_ckpt, out_direct, atol=1e-6)

    # npz flavor
    npz = str(tmp_path / "ckpt.npz")
    np.savez(npz, **raw)
    _, params2 = ifrnet.build(npz)
    out_npz = ifrnet.interpolate(None, params2, img0, img1)
    np.testing.assert_allclose(out_npz, out_direct, atol=1e-6)

    # missing weight -> hard error
    bad = dict(raw)
    bad.pop("decoder1.convblock.2.weight")
    with pytest.raises(ValueError, match="missing"):
        ifrnet.validate_params(bad)
