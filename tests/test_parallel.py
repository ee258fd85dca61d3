"""Sharded train step on the virtual 8-device CPU mesh (2 segments x 4
tile-shards): must run, reduce loss, and match a single-device step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ht3dgs.core import adam as adam_lib
from ht3dgs.core import gaussians as G
from ht3dgs.core.camera import intrinsics_from_fov, make_camera
from ht3dgs.parallel import mesh as mesh_lib
from ht3dgs.raster import render
from ht3dgs.train.losses import l1_loss

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def make_segment(seed, n=64, cap=128):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32) * 0.4
    pts[:, 2] += 3.0
    return G.create_from_pcd(pts, rng.random((n, 3)).astype(np.float32),
                             capacity=cap)


def test_sharded_step_runs_and_learns():
    H, W = 32, 48
    mesh = mesh_lib.make_mesh(2, 4)
    K = intrinsics_from_fov(1.2, H, W)
    cam = make_camera(H, W, K)

    states = [make_segment(i) for i in range(2)]
    targets = [np.asarray(render(s, cam, mode="oracle")["image"])
               for s in states]
    # perturb
    perturbed = [dataclasses.replace(
        s, means=s.means + 0.05 * jax.random.normal(
            jax.random.PRNGKey(7 + i), s.means.shape)) for i, s in
        enumerate(states)]
    opts = [adam_lib.init(s.params()) for s in perturbed]

    states_b = mesh_lib.batch_segments(perturbed)
    opts_b = mesh_lib.batch_segments(opts)
    cams_b = mesh_lib.batch_segments([cam, cam])
    gts = jnp.stack([jnp.asarray(t) for t in targets])
    lr = {k: jnp.full((2,), v, jnp.float32) for k, v in {
        "means": 2e-3, "quats": 1e-3, "log_scales": 5e-3, "sh_dc": 2.5e-2,
        "sh_rest": 1e-3, "opacity_logit": 5e-2}.items()}

    step = mesh_lib.build_sharded_train_step(
        mesh, H, W, mode="tiled",
        tile_args=dict(tile_h=8, tile_w=16, max_per_tile=128))

    losses = []
    for i in range(25):
        states_b, opts_b, loss = step(states_b, opts_b, cams_b, gts, lr)
        losses.append(np.asarray(loss))
    losses = np.stack(losses)  # [25, 2]
    assert np.all(np.isfinite(losses))
    # both segments improve
    assert losses[-1, 0] < losses[0, 0] * 0.7
    assert losses[-1, 1] < losses[0, 1] * 0.7


def test_sharded_matches_single_device_grads():
    """One sharded step == an equivalent unsharded step (L1-only so SSIM
    boundary effects don't enter)."""
    H, W = 32, 32
    mesh = mesh_lib.make_mesh(1, 4)
    cam = make_camera(H, W, intrinsics_from_fov(1.2, H, W))
    state = make_segment(0)
    opt = adam_lib.init(state.params())
    gt = jnp.asarray(np.asarray(
        render(make_segment(99), cam, mode="oracle")["image"]))
    lrs_scalar = {k: jnp.asarray(1e-2) for k in state.params()}

    # single device reference
    def loss_fn(params):
        s = state.replace_params(params)
        out = render(s, cam, mode="tiled",
                     tile_args=dict(tile_h=8, tile_w=16, max_per_tile=128))
        return l1_loss(out["image"], gt)

    _, g_ref = jax.value_and_grad(loss_fn)(state.params())
    p_ref, _ = adam_lib.apply(state.params(), g_ref, opt, lrs_scalar)

    step = mesh_lib.build_sharded_train_step(
        mesh, H, W, lambda_dssim=0.0, mode="tiled",
        tile_args=dict(tile_h=8, tile_w=16, max_per_tile=128))
    sb, ob, loss = step(
        mesh_lib.batch_segments([state]), mesh_lib.batch_segments([opt]),
        mesh_lib.batch_segments([cam]), gt[None],
        {k: jnp.full((1,), 1e-2) for k in state.params()})

    for k in p_ref:
        np.testing.assert_allclose(
            np.asarray(jax.tree.map(lambda x: x[0], sb.params()[k])),
            np.asarray(p_ref[k]), atol=1e-5, err_msg=k)
