#!/usr/bin/env python
"""CLI entry point.

Mirror of the reference CLI (`/root/reference/run.py`):

    python run.py --mode {train,pose_only,eval_pose,eval_nvs,render} \
                  --config configs/tanks/Francis.yml [--flag value ...]

Modes:
  train      hierarchical training (train_level=0 degenerates to a single
             progressive segment — the reference's 'progressive_training'
             dispatch target does not exist there; see SURVEY.md §3.5)
  pose_only  Phase A only: relative-pose chain -> pose/pose.npz
  eval_pose  ATE/RPE against dataset GT poses
  eval_nvs   test-time pose optimization + PSNR/SSIM/LPIPS
  render     novel-trajectory video from a checkpoint
"""

import sys
import time


def main(argv=None):
    from ht3dgs.train.hierarchy import HTGaussianTrainer
    from ht3dgs.utils.config import configs_from_cli

    model, pipe, optim, args = configs_from_cli(argv)
    if getattr(pipe, "distributed", False):
        # multi-host bring-up BEFORE any other jax call: after this,
        # jax.devices() spans the pod slice and mesh_segments/mesh_tiles
        # address global devices (segment over DCN, tile within ICI)
        from ht3dgs.parallel.mesh import init_distributed

        import jax

        n = init_distributed()
        print(f"[distributed] process {jax.process_index()}"
              f"/{jax.process_count()} — {n} global devices")
    start = time.time()

    from ht3dgs.utils.profiling import jax_trace

    trainer = HTGaussianTrainer(model.source_path, model, pipe, optim)
    with jax_trace(pipe.trace_dir):
        if args.mode == "train":
            trainer.hierarchical_training()
        elif args.mode == "pose_only":
            trainer.train_pose_only()
        elif args.mode == "eval_pose":
            trainer.eval_pose()
        elif args.mode == "eval_nvs":
            trainer.eval_nvs()
        elif args.mode == "render":
            trainer.render_nvs(traj_opt=model.traj_opt)
        else:
            raise SystemExit(f"unknown mode {args.mode}")

    dt = time.time() - start
    print(f"[{args.mode}] finished in {dt / 60:.1f} min")


if __name__ == "__main__":
    main(sys.argv[1:])
