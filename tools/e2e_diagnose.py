#!/usr/bin/env python
"""Stage-level diagnosis of the photo-plane end-to-end pipeline.

The photo scene (ht3dgs.utils.photo_scene) has EXACT ground-truth poses and
depth, so every stage of the SfM-free pipeline can be checked against truth:

  1. Phase A   — per-pair relative-pose error (rot deg / trans)
  2. leaves    — per-frame PSNR of each leaf model + pose-chain drift vs GT
  3. merge     — PSNR of the merged model on both segments' frames, BEFORE
                 the root-level MSS training
  4. root      — per-frame PSNR after nonleaf phase 1 / phase 2

Usage: python tools/e2e_diagnose.py [out_dir] [--quick|--medium|--full]
          [--cpu] [--gt-poses] [--seed N]
  --gt-poses : bypass Phase A with the exact GT relative poses — isolates
               3DGS-training failure from pose-estimation failure.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def rot_err_deg(Ra, Rb):
    import numpy as np

    c = (np.trace(Ra @ Rb.T) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 and \
        not sys.argv[1].startswith("-") else "/tmp/ht3dgs_diag"
    full = "--full" in sys.argv
    medium = "--medium" in sys.argv
    gt_poses_mode = "--gt-poses" in sys.argv
    seed = 0
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])
    if "--cpu" in sys.argv:
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
    tier = "full" if full else ("medium" if medium else "quick")
    h, w, n_frames = tier_dims(tier)
    gt_w2c, _ = photo_scene.write_dataset(data_dir, n_frames=n_frames,
                                          height=h, width=w)

    model, pipe, optim = load_configs()
    apply_tier(tier, model, pipe, optim, data_dir)
    model.expname = "diag"

    report = {"tier": tier,
              "seed": seed, "gt_poses": gt_poses_mode, "stages": {}}

    def emit(stage, payload):
        report["stages"][stage] = payload
        print(f"[diag::{stage}] {json.dumps(payload)}", flush=True)

    class DiagTrainer(HTGaussianTrainer):
        def _leaf_eval(self, bundle, tag):
            rows = []
            f0 = bundle.start_fidx
            for fidx in bundle.to_visit_frames:
                p, _ = self.render_frame(bundle, fidx)
                gt_rel = gt_w2c[fidx] @ np.linalg.inv(gt_w2c[f0])
                pred = bundle.get_RT(fidx)
                rows.append({
                    "frame": fidx, "psnr": round(p, 2),
                    "rot_err_deg": round(
                        rot_err_deg(pred[:3, :3], gt_rel[:3, :3]), 3),
                    "trans_err": round(float(np.linalg.norm(
                        pred[:3, 3] - gt_rel[:3, 3])), 4),
                })
            emit(tag, {"frames": rows,
                       "n_live": int(bundle.state.n_live()),
                       "tile_args": dict(self._tile_args or {}),
                       "mean_psnr": round(
                           float(np.mean([r["psnr"] for r in rows])), 2)})

        def partition(self, n, level, overlap=2):
            # called right after Phase A — report pose errors here
            rows = []
            for f in range(1, self.seq_len):
                key = f"rel_pose_{f - 1}_to_{f}"
                if key not in self.pose_dict:
                    continue
                pred = self.pose_dict[key]
                gt_rel = gt_w2c[f] @ np.linalg.inv(gt_w2c[f - 1])
                rows.append({
                    "pair": f"{f - 1}->{f}",
                    "rot_err_deg": round(
                        rot_err_deg(pred[:3, :3], gt_rel[:3, :3]), 3),
                    "trans_err": round(float(np.linalg.norm(
                        pred[:3, 3] - gt_rel[:3, 3])), 4),
                    "gt_trans": round(float(np.linalg.norm(
                        gt_rel[:3, 3])), 4),
                })
            emit("phase_a", {"pairs": rows})
            return super().partition(n, level, overlap)

        def _train_leaf_segment(self, frames):
            b = super()._train_leaf_segment(frames)
            self._leaf_eval(b, f"leaf_{frames[0]}_{frames[-1]}")
            return b

        def merge_two(self, dst, src, transform):
            super().merge_two(dst, src, transform)
            # poses for src-only frames are chained by the driver AFTER this
            # returns; evaluate on dst's own frames now, full range later
            self._leaf_eval(dst, f"post_merge_dstframes_{dst.start_fidx}")

        def train_nonleaf_phase1(self, bundle, children):
            super().train_nonleaf_phase1(bundle, children)
            self._leaf_eval(bundle, f"post_phase1_{bundle.start_fidx}")

        def train_nonleaf_phase2(self, bundle, indices, n_it):
            self._leaf_eval(bundle, f"pre_phase2_{bundle.start_fidx}")
            super().train_nonleaf_phase2(bundle, indices, n_it)
            self._leaf_eval(bundle, f"post_phase2_{bundle.start_fidx}")

    cwd = os.getcwd()
    os.chdir(out_dir)
    try:
        tr = DiagTrainer(data_dir, model, pipe, optim, seed=seed)
        if gt_poses_mode:
            for f in range(1, tr.seq_len):
                rel = (gt_w2c[f] @ np.linalg.inv(gt_w2c[f - 1])
                       ).astype(np.float32)
                tr.pose_dict[f"rel_pose_{f - 1}_to_{f}"] = rel
        bundle = tr.hierarchical_training()
        psnr = tr.evaluate_on_training_images(save_images=False)
        pred = bundle.poses[:tr.seq_len]
        stats = evaluate_poses(gt_w2c, pred)
        emit("final", {"train_psnr": round(psnr, 2),
                       "ATE_x100": round(stats["ATE"] * 100, 3),
                       "RPE_trans_x100": round(
                           stats["RPE_trans_x100"], 3),
                       "RPE_rot_deg": round(stats["RPE_rot_deg"], 3),
                       "n_capacity_grows": getattr(
                           tr, "n_capacity_grows", 0),
                       "tile_args": dict(tr._tile_args or {})})
    finally:
        os.chdir(cwd)

    rep_path = os.path.join(out_dir, "diag_report.json")
    with open(rep_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {rep_path}")


if __name__ == "__main__":
    main()
