#!/usr/bin/env python
"""Real-image end-to-end benchmark (zero-egress substitute for T&T runs).

Generates the real-photograph multi-plane scene (ht3dgs.utils.photo_scene:
real texture, exact GT poses + depth), trains the full SfM-free
hierarchical pipeline on it, then reports train-view PSNR and pose ATE/RPE
against the exact ground truth. Appends a row to RESULTS.md.

Usage: python tools/real_image_bench.py [out_dir] [--full|--medium]
  default:  quick CPU-sized run (96x128, 10 frames, short budgets)
  --medium: CPU-feasible overnight tier (160x208, 12 frames, ~1/3 of the
            reference per-stage budgets)
  --full:   video-sized run for a real chip (tiled renderer, 288x384)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 and \
        not sys.argv[1].startswith("-") else "/tmp/ht3dgs_real_bench"
    full = "--full" in sys.argv
    medium = "--medium" in sys.argv
    if "--cpu" in sys.argv:
        # sitecustomize pre-imports jax on the axon TPU platform; the env
        # var is too late — force via jax.config (CLAUDE.md gotcha)
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from ht3dgs.utils import photo_scene
    from ht3dgs.utils.config import load_configs
    from ht3dgs.train.hierarchy import HTGaussianTrainer
    from ht3dgs.eval.pose_eval import evaluate_poses

    os.makedirs(out_dir, exist_ok=True)
    data_dir = os.path.join(out_dir, "data")
    if full:
        # sized for the remote (axon) single-chip service: the 288x384/24f
        # variant's post-merge root phase (auto-grown capacities on the
        # ~200k-gaussian merged model) exceeds the service's tolerance
        h, w, n_frames = 192, 256, 16
    elif medium:
        h, w, n_frames = 160, 208, 12
    else:
        h, w, n_frames = 96, 128, 10
    gt_w2c, _ = photo_scene.write_dataset(data_dir, n_frames=n_frames,
                                          height=h, width=w)

    model, pipe, optim = load_configs()
    model.eval = False
    model.source_path = data_dir
    model.data_type = "blender"
    model.expname = "real_bench"
    model.category = "photo"
    model.seq_name = "hopper"
    pipe.train_level = 1
    pipe.render_mode = "tiled"
    pipe.depth_provider = "precomputed"
    pipe.depth_dir = os.path.join(data_dir, "depth")
    if full:
        # ~110k unprojected points/frame at 288x384; cap the init clouds and
        # the Phase A batch so 8 concurrent local models fit 16G HBM
        pipe.init_max_points = 20_000
        pipe.phase_a_batch = 4
        # preset binning capacities for this dense close-range scene: the
        # auto-grow otherwise recompiles the big leaf graph mid-run
        # (minutes over the remote tunnel per growth step)
        pipe.tile_max_per_tile = 2048
        pipe.tile_dup_factor = 32
        optim.single_step = 100
        optim.phase_a_fit_iters = 400
        optim.phase_a_pose_iters = 150
        optim.leaf_init_iters = 400
    elif medium:
        pipe.init_max_points = 4_000
        pipe.phase_a_batch = 4
        optim.single_step = 80
        optim.phase_a_fit_iters = 300
        optim.phase_a_pose_iters = 120
        optim.leaf_init_iters = 300
        optim.mss_phase1_iteration_per_frame = 10
        optim.densification_interval = 100
        optim.densification_interval_leaf = 100
        optim.densify_from_iter = 50
    else:
        pipe.init_max_points = 400
        optim.single_step = 25
        optim.phase_a_fit_iters = 80
        optim.phase_a_pose_iters = 60
        optim.leaf_init_iters = 80
        optim.reset_recovery_iters = 5
        optim.mss_phase1_iteration_per_frame = 4
        optim.densification_interval = 60
        optim.densification_interval_leaf = 60
        optim.densify_from_iter = 30

    cwd = os.getcwd()
    os.chdir(out_dir)
    try:
        tr = HTGaussianTrainer(data_dir, model, pipe, optim, seed=0)
        bundle = tr.hierarchical_training()
        psnr = tr.evaluate_on_training_images(save_images=False)
        pred = bundle.poses[:tr.seq_len]
        stats = evaluate_poses(gt_w2c, pred)
    finally:
        os.chdir(cwd)

    tier = "full" if full else ("medium" if medium else "quick")
    line = (f"| photo-plane ({w}x{h}, {n_frames}f, "
            f"{tier}) | {psnr:.2f} dB | "
            f"{stats['ATE'] * 100:.3f} | "
            f"{stats['RPE_trans_x100']:.3f} | "
            f"{stats['RPE_rot_deg']:.3f} |")
    print(line)
    res = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "RESULTS.md")
    header = ("# Real-image benchmark results\n\n"
              "Multi-plane real-photograph scene (utils/photo_scene): real "
              "texture,\nexact GT poses/depth. `python "
              "tools/real_image_bench.py [--full]`.\n\n"
              "| scene | train PSNR | ATE (x100) | RPE trans | RPE rot |\n"
              "|---|---|---|---|---|\n")
    if not os.path.exists(res):
        with open(res, "w") as f:
            f.write(header)
    with open(res, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
