#!/usr/bin/env python
"""Minimal repro for the TPU worker crash seen in batched Phase A of the
full real_image_bench (288x384, B=4, ~90k-capacity local models).

Usage: phase_a_repro.py [B] [cap] [iters] [H W]"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 90112
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    H = int(sys.argv[4]) if len(sys.argv) > 4 else 288
    W = int(sys.argv[5]) if len(sys.argv) > 5 else 384

    from ht3dgs.core import gaussians as G
    from ht3dgs.core import adam as adam_lib
    from ht3dgs.core.camera import intrinsics_from_fov, make_camera
    from ht3dgs.train import phase_a as pa

    rng = np.random.default_rng(0)
    n = int(cap / 1.5)
    states, opts = [], []
    for b in range(B):
        pts = rng.standard_normal((n, 3)).astype(np.float32) * 0.8
        pts[:, 2] += 4.0
        st = G.create_from_pcd(pts, rng.random((n, 3)).astype(np.float32),
                               capacity=cap)
        states.append(st)
        opts.append(adam_lib.init(st.params()))
    cam = make_camera(H, W, intrinsics_from_fov(1.1, H, W))
    cams = pa.stack_cameras([cam] * B)
    gts = jnp.stack([jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
                     for _ in range(B)])
    sb = pa.stack_states(states)
    ob = pa.stack_states(opts)
    lr_args = (jnp.full((B,), 1.6e-4, jnp.float32),
               jnp.full((B,), 1.6e-6, jnp.float32),
               30_000,
               {k: jnp.full((B,), v, jnp.float32) for k, v in
                dict(sh_dc=2.5e-3, sh_rest=1.25e-4, opacity_logit=5e-2,
                     log_scales=5e-3, quats=1e-3).items()})
    rounds = int(os.environ.get("ROUNDS", "1"))
    print(f"B={B} cap={cap} iters={iters} {W}x{H} rounds={rounds}",
          flush=True)
    for r in range(rounds):
        # fresh data each round (mirrors per-chunk model rebuilds)
        sb2 = jax.tree.map(
            lambda x: x + (0.001 * (r + 1)) if x.dtype == jnp.float32 else x,
            sb)
        out = pa.batched_fit(sb2, ob, cams, gts, lr_args, mode="tiled",
                             tile_args=None, lambda_dssim=0.2,
                             n_iters=iters)
        bases = jnp.tile(jnp.asarray([[0., 0, 0, 0, 0, 0, 1]], jnp.float32),
                         (B, 1))
        deltas = pa.batched_pose_fit(out[0], bases, cams, gts,
                                     jnp.asarray(1e-3), mode="tiled",
                                     tile_args=None, n_iters=150)
        leaf = jax.tree_util.tree_leaves(deltas)[0]
        print(f"round {r} result", float(jnp.ravel(leaf)[0]), flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
