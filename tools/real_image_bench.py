#!/usr/bin/env python
"""Real-image end-to-end benchmark (zero-egress substitute for T&T runs).

Generates the real-photograph multi-plane scene (ht3dgs.utils.photo_scene:
real texture, exact GT poses + depth), trains the full SfM-free
hierarchical pipeline on it, then reports train-view PSNR and pose ATE/RPE
against the exact ground truth. Appends a row to RESULTS.md.

Usage: python tools/real_image_bench.py [out_dir] [--full|--medium|--scale]
  default:  quick CPU-sized run (96x128, 10 frames, short budgets)
  --medium: CPU-feasible overnight tier (160x208, 12 frames, ~1/3 of the
            reference per-stage budgets)
  --full:   video-sized run for a real chip (tiled renderer; dims in
            tools/_tiers.py, sized for the remote single-chip service)
  --scale:  reference-shaped run: 48 frames, train_level=2 (two merge
            levels, MSS phase 1 on merged children), 160x208
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 and \
        not sys.argv[1].startswith("-") else "/tmp/ht3dgs_real_bench"
    full = "--full" in sys.argv
    medium = "--medium" in sys.argv
    scale = "--scale" in sys.argv
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
    from _tiers import apply_tier, tier_dims

    os.makedirs(out_dir, exist_ok=True)
    data_dir = os.path.join(out_dir, "data")
    tier = ("scale" if scale else "full" if full
            else "medium" if medium else "quick")
    h, w, n_frames = tier_dims(tier)
    gt_w2c, _ = photo_scene.write_dataset(data_dir, n_frames=n_frames,
                                          height=h, width=w)

    model, pipe, optim = load_configs()
    apply_tier(tier, model, pipe, optim, data_dir)

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

    import jax as _jax

    backend = _jax.default_backend()
    line = (f"| {tier} {w}x{h}, {n_frames}f ({backend}) | {psnr:.2f} dB | "
            f"{stats['ATE'] * 100:.3f} | "
            f"{stats['RPE_trans_x100']:.3f} | "
            f"{stats['RPE_rot_deg']:.3f} | |")
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
