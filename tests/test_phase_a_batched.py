"""Batched Phase A: vmapped fits must converge and produce relative poses
consistent with the sequential reference-parity path."""

import numpy as np
import pytest

from ht3dgs.train.hierarchy import HTGaussianTrainer
from ht3dgs.utils import synthetic
from ht3dgs.utils.config import load_configs


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    scene = synthetic.generate(n_frames=6, height=40, width=56,
                               n_gaussians=300, seed=11)
    d = tmp_path_factory.mktemp("pa")
    synthetic.write_images_only(scene, str(d / "images"),
                                depth_dir=str(d / "depth"))
    return scene, str(d)


def make_trainer(d, batch, vfi, tmp):
    import os

    model, pipe, optim = load_configs()
    model.FovX = 1.2
    model.eval = False
    model.source_path = os.path.join(d, "images")
    model.data_type = "images_only"
    model.expname = "pa"
    model.category = "s"
    model.seq_name = f"b{batch}{vfi}"
    pipe.train_level = 1
    pipe.render_mode = "oracle"
    pipe.capacity_presize = 2.0   # keep CPU-test capacities small
    pipe.depth_provider = "precomputed"
    pipe.depth_dir = os.path.join(d, "depth")
    pipe.vfi_provider = "blend" if vfi else "none"
    pipe.train_pose_mode = "vfi" if vfi else None
    pipe.init_max_points = 256
    pipe.phase_a_batch = batch
    optim.phase_a_fit_iters = 150
    optim.phase_a_pose_iters = 150
    os.chdir(tmp)
    return HTGaussianTrainer(os.path.join(d, "images"), model, pipe, optim,
                             seed=0)


def test_batched_matches_sequential(setup, tmp_path, monkeypatch):
    scene, d = setup
    monkeypatch.chdir(tmp_path)

    tr_b = make_trainer(d, batch=5, vfi=False, tmp=tmp_path)
    tr_b.compute_relative_poses_batched()
    assert len([k for k in tr_b.pose_dict if k.startswith("rel_pose")]) == 5

    tr_s = make_trainer(d, batch=0, vfi=False, tmp=tmp_path)
    tr_s.compute_relative_pose(1, 0)

    rb = tr_b.pose_dict["rel_pose_0_to_1"]
    rs = tr_s.pose_dict["rel_pose_0_to_1"]
    # same algorithm, different RNG for the model init — poses must agree
    # to within the optimization noise floor
    dR = rb[:3, :3] @ rs[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.5, f"batched vs sequential rotation differs {ang} deg"
    assert np.linalg.norm(rb[:3, 3] - rs[:3, 3]) < 0.08

    # and both roughly approach the ground truth relative rotation (the
    # tight budget here — 150/150 iters — bounds accuracy; the strict GT
    # test with the full budget lives in test_hierarchy_e2e)
    gt_rel = scene.poses_w2c[1] @ np.linalg.inv(scene.poses_w2c[0])
    dRg = rb[:3, :3] @ gt_rel[:3, :3].T
    angg = np.degrees(np.arccos(np.clip((np.trace(dRg) - 1) / 2, -1, 1)))
    assert angg < 6.0


def test_batched_fit_early_stop_freezes():
    """The batched fit must reproduce the reference's early-stop dynamics
    (PSNR>35 after the stop threshold freezes the model,
    /root/reference/trainer/ht3dgs_trainer.py:299): once a model converges
    past the threshold its params stop changing, while early_stop=False
    keeps optimizing."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ht3dgs.core import adam as adam_lib, gaussians as G
    from ht3dgs.core.camera import intrinsics_from_fov, make_camera
    from ht3dgs.raster import render
    from ht3dgs.train import phase_a as pa
    from ht3dgs.train.losses import psnr

    rng = np.random.default_rng(4)
    pts = rng.standard_normal((96, 3)).astype(np.float32) * 0.4
    pts[:, 2] += 3.0
    gt_state = G.create_from_pcd(pts, rng.random((96, 3)).astype(np.float32),
                                 capacity=96)
    cam = make_camera(32, 48, intrinsics_from_fov(1.2, 32, 48))
    gt = render(gt_state, cam, mode="oracle")["image"]
    # near-converged start => crosses 35 dB quickly
    start = dataclasses.replace(
        gt_state, means=gt_state.means + 0.002 * jax.random.normal(
            jax.random.PRNGKey(0), gt_state.means.shape))

    def run(n_iters, early_stop):
        states = pa.stack_states([start])
        opts = pa.stack_states([adam_lib.init(start.params())])
        cams = pa.stack_cameras([cam])
        lr_args = (jnp.asarray([1e-4]), jnp.asarray([1e-5]), 1000,
                   {k: jnp.asarray([v]) for k, v in
                    {"sh_dc": 2.5e-3, "sh_rest": 1.25e-4,
                     "opacity_logit": 5e-2, "log_scales": 5e-3,
                     "quats": 1e-3}.items()})
        states, _ = pa.batched_fit(states, opts, cams, gt[None], lr_args,
                                   mode="oracle", n_iters=n_iters,
                                   early_stop=early_stop, exec_chunk=10,
                                   stop_after=20)
        return jax.tree.map(lambda x: np.asarray(x[0]), states)

    # sanity: this case does trigger the threshold
    assert float(psnr(render(start, cam, mode="oracle")["image"], gt)) > 30

    s60 = run(60, True)
    s120 = run(120, True)
    # both runs freeze at the same iteration (same stop_after=20), so the
    # extra 60 iterations change nothing
    np.testing.assert_array_equal(s120.means, s60.means)
    np.testing.assert_array_equal(s120.sh_dc, s60.sh_dc)

    s120_nostop = run(120, False)
    assert not np.array_equal(s120_nostop.means, s60.means)


def test_shared_state_pose_fit_matches_sequential():
    """batched_pose_fit(shared_state=True) — the eval_nvs test-time pose
    optimization — must reproduce the sequential per-frame pose_train_step
    loop exactly (frames are independent; same Adam chain per frame)."""
    import dataclasses

    import jax.numpy as jnp

    from ht3dgs.core import gaussians as G, se3
    from ht3dgs.core.camera import intrinsics_from_fov, make_camera
    from ht3dgs.raster import render
    from ht3dgs.train import phase_a as pa, step as step_lib

    rng = np.random.default_rng(3)
    pts = rng.standard_normal((128, 3)).astype(np.float32) * 0.4
    pts[:, 2] += 3.0
    state = G.create_from_pcd(pts, rng.random((128, 3)).astype(np.float32),
                              capacity=128)
    cam = make_camera(40, 56, intrinsics_from_fov(1.2, 40, 56))
    true = [jnp.asarray([0.02, -0.01, 0.01, 0.006, -0.008, 0.004]) * s
            for s in (1.0, -0.7, 0.4)]
    gts = [render(state, cam, pose=se3.se3_exp(t), mode="oracle")["image"]
           for t in true]
    lr, n_iters = jnp.asarray(1e-3), 40

    seq = []
    for gt in gts:
        delta, opt = jnp.zeros(6), step_lib.init_pose_opt()
        for _ in range(n_iters):
            delta, opt, _ = step_lib.pose_train_step(
                state, delta, se3.se3_identity(), opt, cam, gt, lr,
                mode="oracle")
        seq.append(np.asarray(delta))

    bases = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1], jnp.float32),
                     (3, 1))
    batched = np.asarray(pa.batched_pose_fit(
        state, bases, pa.stack_cameras([cam] * 3), jnp.stack(gts), lr,
        mode="oracle", n_iters=n_iters, shared_state=True))
    np.testing.assert_allclose(batched, np.stack(seq), atol=2e-5)


def test_batched_vfi_composes(setup, tmp_path, monkeypatch):
    scene, d = setup
    monkeypatch.chdir(tmp_path)
    tr = make_trainer(d, batch=3, vfi=True, tmp=tmp_path)
    tr.compute_relative_poses_batched()
    for f in range(1, 6):
        assert f"rel_pose_{f - 1}_to_{f}" in tr.pose_dict
        assert f"rel_pose_{f - 1}_to_{f - 1}.5" in tr.pose_dict
    r = tr.pose_dict["rel_pose_0_to_1"]
    r1 = tr.pose_dict["rel_pose_0_to_0.5"]
    r2 = tr.pose_dict["rel_pose_0.5_to_1"]
    np.testing.assert_allclose(r, r2 @ r1, atol=1e-5)
    assert np.all(np.isfinite(r))


def test_c2f_pose_fit_converges_on_large_motion():
    """Coarse-to-fine pose fit (ht3dgs improvement, pipe.pose_c2f): on a
    LARGE inter-frame motion the pyramid warm start must land at least as
    close as the plain full-res fit at the same iteration budget, and
    recover the pose accurately."""
    import jax.numpy as jnp

    from ht3dgs.core import gaussians as G, se3
    from ht3dgs.core.camera import intrinsics_from_fov, make_camera
    from ht3dgs.raster import render
    from ht3dgs.train import phase_a as pa

    rng = np.random.default_rng(7)
    pts = rng.standard_normal((256, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 3.0
    state = G.create_from_pcd(
        pts, rng.random((256, 3)).astype(np.float32), capacity=256)
    states = pa.stack_states([state])
    cam = make_camera(48, 64, intrinsics_from_fov(1.2, 48, 64))
    true = jnp.asarray([[0.12, -0.06, 0.05, 0.03, -0.04, 0.02]])
    gts = jnp.stack([render(state, cam, pose=se3.se3_exp(true[0]),
                            mode="oracle")["image"]])

    cams = pa.stack_cameras([cam])
    bases = jnp.asarray([[0, 0, 0, 0, 0, 0, 1]], jnp.float32)
    lr, n_iters = jnp.asarray(3e-3), 120

    c2f = np.asarray(pa.batched_pose_fit_c2f(
        states, bases, cams, gts, lr, mode="oracle", n_iters=n_iters,
        stages=((4, 0.4), (1, 0.6))))

    err_c2f = float(np.linalg.norm(c2f[0] - np.asarray(true[0])))
    assert np.all(np.isfinite(c2f))
    # convergence, not superiority: whether the pyramid helps is
    # scene-dependent (tools/pose_ablation.py measures it on the photo
    # scene); this pins the wrapper's mechanics — warm start, pyramid
    # camera/image consistency — by requiring an accurate recovery
    assert err_c2f < 0.05, err_c2f
