"""eval_nvs / eval_pose / render_nvs / pose_only end-to-end on the synthetic
scene (tiny budgets)."""

import os

import numpy as np
import pytest

from ht3dgs.train.hierarchy import HTGaussianTrainer
from ht3dgs.utils import synthetic
from ht3dgs.utils.config import load_configs


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train a tiny model once; reuse across eval-mode tests."""
    scene = synthetic.generate(n_frames=8, height=40, width=56,
                               n_gaussians=300, seed=7)
    d = tmp_path_factory.mktemp("evalmodes")
    synthetic.write_images_only(scene, str(d / "images"),
                                depth_dir=str(d / "depth"))
    cwd = os.getcwd()
    os.chdir(str(d))
    try:
        model, pipe, optim = load_configs()
        model.FovX = 1.2
        model.eval = False
        model.source_path = str(d / "images")
        model.data_type = "images_only"
        model.expname = "em"
        model.category = "s"
        model.seq_name = "x"
        pipe.train_level = 0          # progressive-style single segment
        pipe.render_mode = "oracle"
        pipe.depth_provider = "precomputed"
        pipe.depth_dir = str(d / "depth")
        pipe.vfi_provider = "blend"
        pipe.init_max_points = 300
        pipe.capacity_presize = 2.0   # keep CPU-test capacities small
        pipe.train_pose_mode = None
        pipe.multi_source_supervision = "vfi"
        optim.single_step = 15
        optim.phase_a_fit_iters = 120
        optim.phase_a_pose_iters = 120
        optim.leaf_init_iters = 80
        optim.reset_recovery_iters = 5
        optim.eval_nvs_epochs = 15
        tr = HTGaussianTrainer(str(d / "images"), model, pipe, optim, seed=0)
        tr.hierarchical_training()
    finally:
        os.chdir(cwd)
    return scene, str(d), tr


def test_train_level_zero_single_segment(trained):
    scene, d, tr = trained
    assert tr.gs_bundle.to_visit_frames == list(range(8))
    assert os.path.exists(os.path.join(d, "output/em/s_x/chkpnt/model.npz"))
    assert os.path.exists(os.path.join(d, "output/em/s_x/pose/pose.npz"))


def test_eval_pose_against_gt(trained, monkeypatch):
    scene, d, tr = trained
    monkeypatch.chdir(d)
    # monkeypatch the trainer's GT poses with the synthetic ground truth
    import ht3dgs.train.trainer as trainer_mod

    gt = scene.poses_w2c[: tr.seq_len]
    monkeypatch.setattr(type(tr), "gt_poses_w2c", lambda self: gt)
    res = tr.eval_pose(pose_file=os.path.join(
        d, "output/em/s_x/pose/pose.npz"))
    assert np.isfinite(res["ATE"])
    assert res["ATE"] < 0.5  # aligned trajectory in a unit-ish scene
    assert os.path.exists(os.path.join(d, "output/em/s_x/pose",
                                       "pose_eval.txt"))


def test_eval_nvs_writes_metrics(trained, monkeypatch):
    scene, d, tr = trained
    monkeypatch.chdir(d)
    res = tr.eval_nvs(
        checkpoint=os.path.join(d, "output/em/s_x/chkpnt/model.npz"),
        pose_file=os.path.join(d, "output/em/s_x/pose/pose.npz"))
    assert np.isfinite(res["psnr"]) and res["psnr"] > 10
    assert 0 <= res["ssim"] <= 1
    assert os.path.exists(os.path.join(d, "output/em/s_x/test/test.txt"))


def test_render_nvs_writes_frames(trained, monkeypatch):
    scene, d, tr = trained
    monkeypatch.chdir(d)
    out = tr.render_nvs(
        checkpoint=os.path.join(d, "output/em/s_x/chkpnt/model.npz"),
        pose_file=os.path.join(d, "output/em/s_x/pose/pose.npz"),
        n_novel=10)
    img_dir = os.path.join(d, "output/em/s_x/nvs/bspline/img_out")
    assert len(os.listdir(img_dir)) == 10


def test_pose_only_mode(trained, monkeypatch, tmp_path):
    scene, d, tr = trained
    monkeypatch.chdir(d)
    tr.pose_dict = {}
    poses = tr.train_pose_only()
    assert poses.shape == (tr.seq_len, 4, 4)
    assert np.all(np.isfinite(poses))
