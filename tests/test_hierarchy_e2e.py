"""End-to-end hierarchical training on a synthetic video (tiny budgets).

Exercises the full pipeline: Phase A relative poses (with VFI-blend), v1
partition, leaf training with replay + MSS phase 2, non-leaf MSS phase 1
(pseudo-views from frozen children) + phase 2, importance-pruned merge, and
checkpoint/restore."""

import os

import numpy as np
import pytest

from ht3dgs.train.hierarchy import HTGaussianTrainer
from ht3dgs.utils import synthetic
from ht3dgs.utils.config import load_configs


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    scene = synthetic.generate(n_frames=9, height=40, width=56,
                               n_gaussians=300, seed=3)
    d = tmp_path_factory.mktemp("synt")
    synthetic.write_images_only(scene, str(d / "images"),
                                depth_dir=str(d / "depth"))
    return scene, str(d / "images")


def tiny_cfg(img_dir, **over):
    model, pipe, optim = load_configs()
    model.FovX = 1.2
    model.eval = False          # keep all frames in the train split
    model.source_path = img_dir
    model.data_type = "images_only"
    model.expname = "test"
    model.category = "synt"
    model.seq_name = "a"
    pipe.train_level = 1
    pipe.render_mode = "oracle"
    pipe.capacity_presize = 2.0   # keep CPU-test capacities small
    pipe.depth_provider = "precomputed"
    pipe.depth_dir = os.path.join(os.path.dirname(img_dir), "depth")
    pipe.vfi_provider = "blend"
    pipe.init_max_points = 300
    optim.single_step = 12
    optim.phase_a_fit_iters = 40
    optim.phase_a_pose_iters = 25
    optim.leaf_init_iters = 40
    optim.reset_recovery_iters = 5
    optim.mss_phase1_iteration_per_frame = 3
    optim.num_iterations_per_frame_each_level = [6, 6, 6]
    optim.densification_interval = 50
    optim.densification_interval_leaf = 50
    optim.densify_from_iter = 20
    for k, v in over.items():
        for c in (model, pipe, optim):
            if hasattr(c, k):
                setattr(c, k, v)
    return model, pipe, optim


def test_hierarchical_training_e2e(dataset, tmp_path, monkeypatch):
    scene, img_dir = dataset
    monkeypatch.chdir(tmp_path)
    model, pipe, optim = tiny_cfg(img_dir)
    tr = HTGaussianTrainer(img_dir, model, pipe, optim, seed=0)
    assert tr.seq_len == 9

    bundle = tr.hierarchical_training()

    # full pose chain exists and is finite
    assert bundle.poses is not None
    assert np.all(np.isfinite(bundle.poses))
    # the merged model covers all frames
    assert bundle.to_visit_frames == list(range(9))
    # phase A produced relative poses for every pair (+ VFI half-steps)
    for f in range(1, 9):
        assert f"rel_pose_{f - 1}_to_{f}" in tr.pose_dict
    # checkpoint round-trips
    ckpt = os.path.join(tr.result_path, "chkpnt", "model.npz")
    assert os.path.exists(ckpt)
    n_before = int(bundle.state.n_live())
    b2 = tr.load_checkpoint(ckpt)
    assert int(b2.state.n_live()) == n_before
    np.testing.assert_allclose(np.asarray(b2.state.means),
                               np.asarray(bundle.state.means))
    # the restored multi-merge, post-densify model renders identically
    _, out_a = tr.render_frame(bundle, 0)
    _, out_b = tr.render_frame(b2, 0)
    np.testing.assert_array_equal(np.asarray(out_a["image"]),
                                  np.asarray(out_b["image"]))
    # capacity pre-sizing keeps mid-run recompiles off the hot path
    assert getattr(tr, "n_capacity_grows", 0) == 0
    # training quality: reasonable reconstruction of the training frames
    psnr = tr.evaluate_on_training_images()
    assert psnr > 18.0


def test_relative_pose_accuracy(dataset, tmp_path, monkeypatch):
    """Phase A on two adjacent synthetic frames: the recovered relative pose
    must roughly match ground truth (pose chain sanity)."""
    scene, img_dir = dataset
    monkeypatch.chdir(tmp_path)
    model, pipe, optim = tiny_cfg(img_dir)
    optim.phase_a_fit_iters = 250
    optim.phase_a_pose_iters = 300
    pipe.train_pose_mode = None   # direct (non-VFI) for a sharper check
    tr = HTGaussianTrainer(img_dir, model, pipe, optim, seed=0)
    tr.compute_relative_pose(1, 0)
    rel = tr.pose_dict["rel_pose_0_to_1"]
    # ground truth relative pose between w2c frames: w2c_1 @ inv(w2c_0)
    gt_rel = scene.poses_w2c[1] @ np.linalg.inv(scene.poses_w2c[0])
    # rotation error (degrees)
    dR = rel[:3, :3] @ gt_rel[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 3.0, f"rotation error {ang} deg"
    # translation *direction* must match; metric scale depends on the local
    # model's absolute depth, which short fits under-estimate — the full
    # pipeline (and the reference's eval) handles scale via Procrustes
    # alignment, so the test checks what the algorithm actually needs.
    t_est = rel[:3, 3] / max(np.linalg.norm(rel[:3, 3]), 1e-9)
    t_gt = gt_rel[:3, 3] / max(np.linalg.norm(gt_rel[:3, 3]), 1e-9)
    cos = float(t_est @ t_gt)
    assert cos > 0.95, f"translation direction cos {cos}"


def test_partition_even_and_v1(dataset, tmp_path, monkeypatch):
    scene, img_dir = dataset
    monkeypatch.chdir(tmp_path)
    model, pipe, optim = tiny_cfg(img_dir)
    pipe.partition_strategy = "even"
    tr = HTGaussianTrainer(img_dir, model, pipe, optim, seed=0)
    res = tr.partition(16, 2)
    assert res[0][0] == list(range(16))
    assert len(res[2]) == 4
    # overlap of 1 frame between adjacent even segments
    assert res[1][0][-1] >= res[1][1][0]

    # v1 needs pose_dict populated
    for i in range(15):
        tr.pose_dict[f"rel_pose_{i}_to_{i + 1}"] = np.eye(4, dtype=np.float32)
    tr.pipe_cfg.partition_strategy = "v1"
    res = tr.partition(16, 2)
    assert res[0][0] == list(range(16))
    assert len(res[2]) == 4


def test_derive_schedule_reset_override():
    """opacity_reset_interval_override (toy-scale schedule correction)
    replaces the derived num_iterations//10 cadence; unset keeps reference
    parity (/root/reference/trainer/ht3dgs_trainer.py:675-681)."""
    import dataclasses

    from ht3dgs.utils.config import OptimizationConfig

    tr = HTGaussianTrainer.__new__(HTGaussianTrainer)
    tr.optim_cfg = OptimizationConfig(single_step=25)
    tr.seq_len = 10
    tr.sched = dataclasses.replace(tr.optim_cfg)
    tr.derive_schedule()
    assert tr.sched.opacity_reset_interval == 25  # 25*(10//10)*10 // 10

    tr.optim_cfg = OptimizationConfig(
        single_step=25, opacity_reset_interval_override=7777)
    tr.sched = dataclasses.replace(tr.optim_cfg)
    tr.derive_schedule()
    assert tr.sched.opacity_reset_interval == 7777


def test_bundle_breadcrumb_roundtrip(dataset, tmp_path, monkeypatch):
    """Crash-resume breadcrumbs: a trained segment bundle round-trips
    through _save/_load_bundle_breadcrumb (params, Adam moments, poses,
    counters) so a watchdog restart skips finished segments."""
    import dataclasses

    import jax.numpy as jnp

    from ht3dgs.core import gaussians as G

    scene, img_dir = dataset
    monkeypatch.chdir(tmp_path)
    model, pipe, optim = tiny_cfg(img_dir)
    tr = HTGaussianTrainer(img_dir, model, pipe, optim, seed=0)
    pcd = tr.prepare_pcd(0)
    b = tr.make_model(pcd)
    b.poses = np.tile(np.eye(4, dtype=np.float32), (tr.seq_len, 1, 1))
    b.poses[1, 0, 3] = 0.25
    b.global_iteration = 77
    b.start_fidx = 3
    b.to_visit_frames = [3, 4, 5]

    assert tr._load_bundle_breadcrumb("lv1_seg0") is None
    tr._save_bundle_breadcrumb(b, "lv1_seg0")
    r = tr._load_bundle_breadcrumb("lv1_seg0")
    assert r is not None
    for f in G.PARAM_FIELDS:
        np.testing.assert_array_equal(np.asarray(getattr(r.state, f)),
                                      np.asarray(getattr(b.state, f)))
        np.testing.assert_array_equal(np.asarray(r.opt.m[f]),
                                      np.asarray(b.opt.m[f]))
    np.testing.assert_array_equal(r.poses, b.poses)
    assert r.global_iteration == 77
    assert r.start_fidx == 3
    assert r.to_visit_frames == [3, 4, 5]
    assert int(r.state.n_live()) == int(b.state.n_live())

    # crumbs carry a config fingerprint: a relaunch under a changed
    # schedule/partition/seed must refuse them (ADVICE r4, medium)
    tr._crumb_fp = tr._config_fingerprint([[0, 1, 2]])
    assert tr._load_bundle_breadcrumb("lv1_seg0") is None
    tr._save_bundle_breadcrumb(b, "lv1_seg0")
    assert tr._load_bundle_breadcrumb("lv1_seg0") is not None
    fp1 = tr._crumb_fp
    tr.optim_cfg = dataclasses.replace(tr.optim_cfg, single_step=999)
    tr._crumb_fp = tr._config_fingerprint([[0, 1, 2]])
    assert tr._crumb_fp != fp1
    assert tr._load_bundle_breadcrumb("lv1_seg0") is None
