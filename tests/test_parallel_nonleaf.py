"""Parallel non-leaf (upper-hierarchy) training through the orchestrator.

train_level=2 on a 12-frame synthetic video with a (segment=2, tile=2) mesh
on the 8 virtual CPU devices: leaves train in two parallel chunks, the two
level-1 siblings run MSS phase 1 + 2 concurrently, and the root (S=1)
tile-shards its images — the full production multi-chip path of
hierarchy.hierarchical_training."""

import os

import numpy as np
import pytest

from ht3dgs.train.hierarchy import HTGaussianTrainer
from ht3dgs.utils import synthetic
from ht3dgs.utils.config import load_configs


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    scene = synthetic.generate(n_frames=12, height=40, width=56,
                               n_gaussians=300, seed=5)
    d = tmp_path_factory.mktemp("synt_nl")
    synthetic.write_images_only(scene, str(d / "images"),
                                depth_dir=str(d / "depth"))
    return scene, str(d / "images")


def test_parallel_nonleaf_e2e(dataset, tmp_path, monkeypatch):
    scene, img_dir = dataset
    monkeypatch.chdir(tmp_path)
    model, pipe, optim = load_configs()
    model.FovX = 1.2
    model.eval = False
    model.source_path = img_dir
    model.data_type = "images_only"
    model.expname = "test_nl"
    model.category = "synt"
    model.seq_name = "a"
    pipe.train_level = 2
    pipe.render_mode = "oracle"
    pipe.capacity_presize = 2.0
    pipe.depth_provider = "precomputed"
    pipe.depth_dir = os.path.join(os.path.dirname(img_dir), "depth")
    pipe.vfi_provider = "blend"
    pipe.init_max_points = 300
    pipe.mesh_segments = 2
    pipe.mesh_tiles = 2
    optim.single_step = 10
    optim.phase_a_fit_iters = 30
    optim.phase_a_pose_iters = 20
    optim.leaf_init_iters = 30
    optim.reset_recovery_iters = 4
    optim.mss_phase1_iteration_per_frame = 2
    optim.num_iterations_per_frame_each_level = [4, 4, 4]
    optim.densification_interval = 40
    optim.densification_interval_leaf = 40
    optim.densify_from_iter = 15

    # packed pseudo renders: the old path dispatched one child render per
    # phase-1 iteration (discarding non-pseudo lanes); the packed queue
    # dispatches ~mss_phase1_ratio per iteration — count them
    import ht3dgs.train.parallel_nonleaf as pnl

    calls = {"n": 0}
    orig_render = pnl._batched_child_render

    def counting_render(*a, **k):
        calls["n"] += 1
        return orig_render(*a, **k)

    monkeypatch.setattr(pnl, "_batched_child_render", counting_render)

    tr = HTGaussianTrainer(img_dir, model, pipe, optim, seed=0)
    assert tr.seq_len == 12
    bundle = tr.hierarchical_training()

    # phase-1 iteration count with these budgets: level 1 = 2 iters/frame
    # x ~7 union frames (x2 sibling segs in lockstep), level 0 = 2 x 12;
    # the OLD path dispatched one render per iteration (~38); the packed
    # queue needs ~ratio (0.5) of that
    assert 0 < calls["n"] <= 24, calls["n"]

    # the parallel non-leaf path actually ran (level 1 has 2 siblings)
    timing = tr.timer.summary()
    assert "nonleaf_parallel" in timing, timing
    # ... and replaced the sequential phases for the pre-trained segments:
    # level 1 (2 segs) and level 0 (1 seg, tile-sharded) both go parallel
    assert "nonleaf_phase1" not in timing, timing
    assert "nonleaf_phase2" not in timing, timing

    assert bundle.poses is not None
    assert np.all(np.isfinite(bundle.poses))
    assert bundle.to_visit_frames == list(range(12))
    live = np.asarray(bundle.state.live)
    assert np.all(np.isfinite(np.asarray(bundle.state.means)[live]))
    psnr = tr.evaluate_on_training_images()
    assert psnr > 10.5
