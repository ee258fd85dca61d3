#!/usr/bin/env python
"""3M-Gaussian benchmark (BASELINE config 5 single-chip leg): the fwd+bwd
train step at 3M Gaussians / 1080p must fit one chip's HBM and sustain
throughput; the multi-chip leg (row-sharded Gaussians with all-gathered
culling) is exercised by dryrun_multichip / tests/test_parallel.

Appends a row to RESULTS.md."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    N, H, W = 3_000_000, 1080, 1920
    from ht3dgs.core import gaussians as G
    from ht3dgs.core.camera import intrinsics_from_fov, make_camera
    from ht3dgs.raster import render

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((N, 3)).astype(np.float32) * 1.5
    pts[:, 2] += 6.0
    colors = rng.random((N, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, colors, capacity=N)
    cam = make_camera(H, W, intrinsics_from_fov(1.2, H, W))
    target = jnp.zeros((H, W, 3), jnp.float32)
    # (dup=4, K=512, bf16) is in tools/route_sweep.py's validated config
    # list; at 3M the average per-Gaussian tile coverage is lower than at
    # 1M (same screen area split over 3x the Gaussians), so dup=4 drops
    # no more than the swept dup=6-at-1M point does.
    ta = dict(tile_h=16, tile_w=16, max_per_tile=512, dup_factor=4,
              backend="pallas", route_bf16=True)

    @jax.jit
    def step(means, sh_dc, opacity_logit):
        def loss_fn(m, s, o):
            st = dataclasses.replace(state, means=m, sh_dc=s,
                                     opacity_logit=o)
            out = render(st, cam, mode="tiled", tile_args=ta)
            return jnp.mean((out["image"] - target) ** 2)
        return jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
            means, sh_dc, opacity_logit)

    args = (state.means, state.sh_dc, state.opacity_logit)
    t0 = time.perf_counter()
    l, g = step(*args)
    print(f"compile+1st {time.perf_counter() - t0:.1f}s loss={float(l):.6f}",
          flush=True)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        l, g = step(*args)
        float(l)
    dt = (time.perf_counter() - t0) / iters * 1e3
    mps = H * W / 1e3 / dt
    line = (f"| rasterizer bench 3M Gaussians 1080p (single chip) | "
            f"{dt:.0f} ms/step | {mps:.2f} MP/s fwd+bwd | - | - |")
    print(line, flush=True)
    res = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "RESULTS.md")
    with open(res, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
