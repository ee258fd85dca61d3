#!/usr/bin/env python
"""Phase A pose-accuracy ablation on the photo-plane scene (exact GT).

Compares relative-pose estimation strategies at matched compute:
  vfi:N    — reference semantics: two half-pose fits through the blended
             midpoint frame (train_pose_mode='vfi', vfi_provider='blend'),
             N iters per half-fit
  direct:N — single direct pose fit prev->next, N iters

Usage: python tools/pose_ablation.py [--tier quick|medium] [--cpu]
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
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    tier = "medium" if "--medium" in sys.argv else "quick"

    import numpy as np

    from ht3dgs.utils import photo_scene
    from ht3dgs.utils.config import load_configs
    from ht3dgs.train.hierarchy import HTGaussianTrainer
    from _tiers import apply_tier, tier_dims

    out_dir = "/tmp/pose_ablation"
    data_dir = os.path.join(out_dir, "data")
    h, w, n_frames = tier_dims(tier)
    gt_w2c, _ = photo_scene.write_dataset(data_dir, n_frames=n_frames,
                                          height=h, width=w)

    def run(label, pose_mode, pose_iters, c2f=False, pose_lr=None):
        model, pipe, optim = load_configs()
        apply_tier(tier, model, pipe, optim, data_dir)
        model.expname = f"ablate_{label}"
        pipe.train_pose_mode = pose_mode
        pipe.pose_c2f = c2f
        optim.phase_a_pose_iters = pose_iters
        if pose_lr is not None:
            optim.pose_lr = pose_lr
        os.makedirs(os.path.join(out_dir, label), exist_ok=True)
        cwd = os.getcwd()
        os.chdir(os.path.join(out_dir, label))
        try:
            tr = HTGaussianTrainer(data_dir, model, pipe, optim, seed=0)
            tr.compute_relative_poses_batched()
            for f in range(1, tr.seq_len):
                if f"rel_pose_{f - 1}_to_{f}" not in tr.pose_dict:
                    tr.compute_relative_pose(f, f - 1)
            rows = []
            for f in range(1, tr.seq_len):
                pred = tr.pose_dict[f"rel_pose_{f - 1}_to_{f}"]
                gt_rel = gt_w2c[f] @ np.linalg.inv(gt_w2c[f - 1])
                rows.append({
                    "pair": f"{f - 1}->{f}",
                    "rot": round(rot_err_deg(pred[:3, :3],
                                             gt_rel[:3, :3]), 3),
                    "trans": round(float(np.linalg.norm(
                        pred[:3, 3] - gt_rel[:3, 3])), 4),
                    "gt_trans": round(float(np.linalg.norm(
                        gt_rel[:3, 3])), 4),
                })
        finally:
            os.chdir(cwd)
        mean_rot = round(float(np.mean([r["rot"] for r in rows])), 3)
        mean_rel = round(float(np.mean(
            [r["trans"] / max(r["gt_trans"], 1e-9) for r in rows])), 3)
        print(f"[ablate::{label}] mean_rot_deg={mean_rot} "
              f"mean_trans_rel={mean_rel} "
              f"{json.dumps(rows)}", flush=True)
        return mean_rot, mean_rel

    configs = [
        # (label, pose_mode, pose_iters, c2f, pose_lr)
        ("vfi60", "vfi", 60, False, None),
        ("direct120", None, 120, False, None),
        ("vfi150", "vfi", 150, False, None),
        ("direct300", None, 300, False, None),
        ("vfi60c2f", "vfi", 60, True, None),
        # Adam moves ~lr per step, so a fit can cover at most ~lr*iters of
        # tangent motion; edge pairs need 0.174 (direct) / 0.087 (vfi
        # half-steps) vs 60*1e-3 = 0.06 budget — these test the
        # reach-limited hypothesis at matched compute
        ("vfi60lr3", "vfi", 60, False, 3e-3),
        ("direct120lr3", None, 120, False, 3e-3),
    ]
    if tier == "medium":
        configs = [("vfi120", "vfi", 120, False, None),
                   ("direct240", None, 240, False, None)]
    only = os.environ.get("ABLATE_ONLY")
    if only:
        want = set(only.split(","))
        configs = [c for c in configs if c[0] in want]
    summary = {}
    for label, mode, iters, c2f, plr in configs:
        summary[label] = run(label, mode, iters, c2f, plr)
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
