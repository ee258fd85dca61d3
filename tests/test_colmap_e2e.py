"""COLMAP-format ingestion, end to end (VERDICT r4 missing #5 / next #8):
write a synthetic scene out in COLMAP *binary* layout (cameras.bin /
images.bin / points3D.bin + images/), train the SfM-free pipeline on it
with --data_type colmap, and run eval_pose against the COLMAP ground-truth
poses — the real-data ingestion path the unit tests alone never drove.

Round-trip coverage: writers in ht3dgs.data.colmap mirror the readers
(format per colmap reconstruction.cc, the layout
/root/reference/scene/colmap_loader.py parses)."""

import os

import numpy as np
import pytest

from ht3dgs.data import colmap as cl
from ht3dgs.train.hierarchy import HTGaussianTrainer
from ht3dgs.utils import synthetic
from ht3dgs.utils.config import load_configs


@pytest.fixture(scope="module")
def colmap_dataset(tmp_path_factory):
    scene = synthetic.generate(n_frames=8, height=40, width=56,
                               n_gaussians=300, seed=7)
    d = str(tmp_path_factory.mktemp("colmap_scene"))
    synthetic.write_images_only(scene, os.path.join(d, "images"),
                                depth_dir=os.path.join(d, "depth"))

    K = scene.intrinsics
    cams = {1: cl.ColmapCamera(
        1, "PINHOLE", scene.width, scene.height,
        np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], float))}
    images = {}
    for i, w2c in enumerate(scene.poses_w2c):
        images[i + 1] = cl.ColmapImage(
            i + 1, cl.rotmat2qvec(w2c[:3, :3]), w2c[:3, 3].astype(float),
            1, f"{i:04d}.png")
    pts = np.asarray(scene.state.means)
    cols = np.clip(np.asarray(scene.state.sh_dc[:, 0, :]) * 0.282 + 0.5,
                   0, 1)
    cl.write_model(os.path.join(d, "sparse", "0"), cams, images, pts, cols)
    return scene, d


def test_binary_roundtrip(colmap_dataset):
    scene, d = colmap_dataset
    cams, images, points = cl.read_model(os.path.join(d, "sparse", "0"))
    assert cams[1].model == "PINHOLE"
    assert cams[1].width == scene.width
    np.testing.assert_allclose(cams[1].params[0], scene.intrinsics[0, 0])
    assert len(images) == 8
    for i, w2c in enumerate(scene.poses_w2c):
        im = images[i + 1]
        np.testing.assert_allclose(cl.qvec2rotmat(im.qvec), w2c[:3, :3],
                                   atol=1e-6)
        np.testing.assert_allclose(im.tvec, w2c[:3, 3], atol=1e-7)
        assert im.name == f"{i:04d}.png"
    xyz, rgb, err = points
    np.testing.assert_allclose(xyz, np.asarray(scene.state.means),
                               atol=1e-7)
    assert rgb.min() >= 0 and rgb.max() <= 1


def test_colmap_train_and_eval_pose(colmap_dataset, tmp_path, monkeypatch):
    scene, d = colmap_dataset
    monkeypatch.chdir(tmp_path)
    model, pipe, optim = load_configs()
    model.eval = False                 # all frames train (quirk-free)
    model.source_path = d
    model.data_type = "colmap"
    model.expname = "test_colmap"
    model.category = "synt"
    model.seq_name = "cm"
    pipe.train_level = 1
    pipe.render_mode = "oracle"
    pipe.capacity_presize = 2.0
    pipe.depth_provider = "precomputed"
    pipe.depth_dir = os.path.join(d, "depth")
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

    tr = HTGaussianTrainer(d, model, pipe, optim, seed=0)
    assert tr.seq_len == 8
    # the COLMAP reader surfaced the GT poses
    gt = tr.gt_poses_w2c()
    np.testing.assert_allclose(gt, scene.poses_w2c, atol=1e-5)

    bundle = tr.hierarchical_training()
    assert np.all(np.isfinite(bundle.poses))

    from ht3dgs.train import evals

    res = evals.eval_pose(tr)
    assert np.isfinite(res["ATE"])
    # loose bound: the budgets here are CI-tiny (25-iter pose fits) — the
    # test pins the ingestion path (COLMAP binary -> frames -> training ->
    # GT-pose eval), not pose accuracy (the tier runs cover that)
    assert res["ATE"] * 100 < 40.0, res
    assert os.path.exists(f"{tr.result_path}/pose/pose_eval.txt")
