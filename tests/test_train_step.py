"""Train-step + densification integration tests (single segment, fixed pose).

This is BASELINE.json config 1: fit a synthetic scene, PSNR must rise; then
exercise densify/prune/reset compaction and the pose-fitting step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ht3dgs.core import adam as adam_lib
from ht3dgs.core import gaussians as G
from ht3dgs.core import se3
from ht3dgs.core.camera import intrinsics_from_fov, make_camera
from ht3dgs.raster import render
from ht3dgs.train import densify as densify_lib
from ht3dgs.train import step as step_lib


def toy_scene(n=128, cap=256, seed=0, h=40, w=56):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32) * 0.4
    pts[:, 2] += 3.0
    colors = rng.random((n, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, colors, capacity=cap)
    cam = make_camera(h, w, intrinsics_from_fov(1.2, h, w))
    return state, cam


def default_lrs(spatial_scale=1.0):
    return {
        "means": jnp.asarray(1.6e-4 * spatial_scale * 100),
        "quats": jnp.asarray(1e-3),
        "log_scales": jnp.asarray(5e-3),
        "sh_dc": jnp.asarray(2.5e-3),
        "sh_rest": jnp.asarray(2.5e-3 / 20),
        "opacity_logit": jnp.asarray(5e-2),
    }


def test_fit_psnr_rises():
    gt_state, cam = toy_scene(seed=1)
    target = render(gt_state, cam, mode="oracle")["image"]

    rng = np.random.default_rng(2)
    state = dataclasses.replace(
        gt_state,
        means=gt_state.means + jnp.asarray(
            rng.standard_normal(gt_state.means.shape).astype(np.float32)) * 0.08,
        sh_dc=jnp.zeros_like(gt_state.sh_dc),
    )
    opt = adam_lib.init(state.params())
    lrs = default_lrs()

    first_psnr = None
    for i in range(200):
        state, opt, m = step_lib.gaussian_train_step(
            state, opt, cam, target, lrs, mode="oracle", track_stats=True)
        if first_psnr is None:
            first_psnr = float(m["psnr"])
    assert float(m["psnr"]) > max(first_psnr + 5.0, 36.0)
    assert np.isfinite(float(m["loss"]))
    # stats accumulated
    assert float(jnp.max(state.grad_denom)) > 0


def test_densify_clone_and_split():
    state, cam = toy_scene(n=64, cap=512)
    opt = adam_lib.init(state.params())
    # fake stats: strong gradients on the first 10 live gaussians
    ga = state.grad_accum.at[:10].set(1.0)
    gd = state.grad_denom.at[:10].set(1.0)
    state = dataclasses.replace(state, grad_accum=ga, grad_denom=gd)
    # make 5 of them large (split), 5 small (clone)
    ls = state.log_scales
    ls = ls.at[:5].set(jnp.log(0.5))    # large -> split
    ls = ls.at[5:10].set(jnp.log(1e-3))  # small -> clone
    state = dataclasses.replace(state, log_scales=ls)
    # dirty moments to check they follow rows
    opt = adam_lib.AdamState(
        m={k: v + 1.0 for k, v in opt.m.items()}, v=opt.v, step=opt.step)

    n_before = int(state.n_live())
    st2, opt2, dropped = step_lib.densify_and_prune(
        state, opt, jax.random.PRNGKey(0),
        jnp.asarray(0.5),      # max_grad
        jnp.asarray(0.005),    # min_opacity
        jnp.asarray(10.0),     # extent
        jnp.asarray(0.01),     # percent_dense
        jnp.asarray(20.0),     # max_screen
        jnp.asarray(False),    # use_screen_test
    )
    # 5 clones (+5), 5 splits (-5 +10) => +10 net
    assert int(st2.n_live()) == n_before + 10
    assert int(dropped) == 0
    # stats reset
    assert float(jnp.max(st2.grad_accum)) == 0.0
    # new rows have zero moments, surviving rows keep theirs
    m_means = np.asarray(opt2.m["means"])
    live = np.asarray(st2.live)
    n_new = 15  # 5 clones + 10 children appended after survivors
    assert np.allclose(m_means[live][-n_new:], 0.0)
    assert np.allclose(m_means[live][: n_before - 5], 1.0)


def test_prune_low_opacity():
    state, cam = toy_scene(n=64, cap=128)
    opt = adam_lib.init(state.params())
    op = state.opacity_logit.at[:20].set(-10.0)  # ~0 opacity
    state = dataclasses.replace(state, opacity_logit=op)
    st2, _, _ = step_lib.densify_and_prune(
        state, opt, jax.random.PRNGKey(0), jnp.asarray(1e9),
        jnp.asarray(0.005), jnp.asarray(10.0), jnp.asarray(0.01),
        jnp.asarray(20.0), jnp.asarray(False))
    assert int(st2.n_live()) == 64 - 20


def test_reset_opacity():
    state, _ = toy_scene(n=32, cap=64)
    opt = adam_lib.init(state.params())
    opt = adam_lib.AdamState(
        m={k: v + 3.0 for k, v in opt.m.items()}, v=opt.v, step=opt.step)
    st2, opt2 = step_lib.reset_opacity(state, opt)
    assert float(jnp.max(st2.opacities()[st2.live])) <= 0.01 + 1e-6
    assert float(jnp.max(jnp.abs(opt2.m["opacity_logit"]))) == 0.0
    assert float(jnp.max(opt2.m["means"])) == 3.0  # others untouched


def test_capacity_overflow_reported():
    state, cam = toy_scene(n=120, cap=128)
    opt = adam_lib.init(state.params())
    ga = state.grad_accum.at[:120].set(1.0)
    gd = state.grad_denom.at[:120].set(1.0)
    state = dataclasses.replace(state, grad_accum=ga, grad_denom=gd)
    st2, _, dropped = step_lib.densify_and_prune(
        state, opt, jax.random.PRNGKey(0), jnp.asarray(0.5),
        jnp.asarray(0.005), jnp.asarray(10.0), jnp.asarray(0.01),
        jnp.asarray(20.0), jnp.asarray(False))
    assert int(st2.n_live()) == 128  # saturated
    assert int(dropped) > 0


def test_step_metrics_split_drop_counters():
    """gaussian_train_step must plumb the rasterizer's split overflow
    diagnostics (n_dropped_m / n_dropped_tile) so the trainer's auto-grow
    can widen only the exhausted capacity (round-3 regression: only the
    combined count reached the trainer, so tile overflow grew dup_factor
    and max_per_tile was never grown)."""
    state, cam = toy_scene(n=256, cap=256)
    # dense cluster => per-tile overflow at a tiny max_per_tile
    state = dataclasses.replace(
        state, means=state.means * jnp.asarray([0.1, 0.1, 1.0]))
    opt = adam_lib.init(state.params())
    gt = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
    lrs = default_lrs()

    _, _, m_tile = step_lib.gaussian_train_step(
        state, opt, cam, gt, lrs, mode="tiled",
        tile_args=tuple(sorted(dict(max_per_tile=8, dup_factor=16).items())))
    assert int(m_tile["n_dropped_tile"]) > 0
    assert int(m_tile["n_dropped_m"]) == 0
    assert int(m_tile["n_dropped"]) == int(m_tile["n_dropped_tile"])

    _, _, m_m = step_lib.gaussian_train_step(
        state, opt, cam, gt, lrs, mode="tiled",
        tile_args=tuple(sorted(dict(max_per_tile=512, dup_factor=1).items())))
    assert int(m_m["n_dropped_m"]) > 0
    assert int(m_m["n_dropped_tile"]) == 0


def test_pose_fit_recovers_transform():
    """Freeze Gaussians, apply a known SE(3) to generate the target, and
    recover it by pose-only optimization — the reference's relative-pose
    estimation primitive."""
    state, cam = toy_scene(n=128, cap=128, h=48, w=64)
    true_delta = jnp.asarray([0.02, -0.015, 0.01, 0.008, -0.01, 0.006])
    true_pose = se3.se3_exp(true_delta)
    target = render(state, cam, pose=true_pose, mode="oracle")["image"]

    delta = jnp.zeros(6)
    popt = step_lib.init_pose_opt()
    base = se3.se3_identity()
    for i in range(300):
        delta, popt, m = step_lib.pose_train_step(
            state, delta, base, popt, cam, target, jnp.asarray(1e-3),
            mode="oracle")
    final = np.asarray(se3.se3_retr(delta, base))
    np.testing.assert_allclose(final, np.asarray(true_pose), atol=5e-3)
    assert float(m["psnr"]) > 35.0
