#!/usr/bin/env python
"""Sweep the Pallas blend grid knobs (TB tiles/program, C_STEP entries/step)
at the current bench operating point (K=384, dup=6, bf16 routing).

Larger TB amortizes grid overhead but coarsens the early-out granularity
(a block skips a chunk only when EVERY tile in it is done); larger C_STEP
deepens the double-buffered entry block but rounds the per-tile work up to
a coarser multiple. Deviations vs (8, 64) should be exactly 0 — the math
is identical, only the blocking changes.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    N, H, W = 1_000_000, 1080, 1920
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

    def make_step(tile_args):
        @jax.jit
        def step(means, sh_dc, opacity_logit):
            def loss_fn(m, s, o):
                st = dataclasses.replace(state, means=m, sh_dc=s,
                                         opacity_logit=o)
                out = render(st, cam, mode="tiled", tile_args=tile_args)
                return jnp.mean((out["image"] - target) ** 2), out["image"]

            (l, img), g = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2), has_aux=True)(
                    means, sh_dc, opacity_logit)
            return l, img, g
        return step

    # tb*cs*P*4B is the per-temporary VMEM stack unit of the blend kernels
    # (~10 live [tb, cs, P] f32 temps in the backward); tb*cs > 1024 at
    # P=256 exceeds the 16M scoped-vmem limit (measured: (16,128) OOMs at
    # 27.9M). Feasible sweep: products <= 1024.
    ref = None
    for tb, cs in [(8, 64), (16, 64), (4, 64), (8, 128), (4, 128)]:
        ta = dict(tile_h=16, tile_w=16, max_per_tile=384, dup_factor=6,
                  backend="pallas", route_bf16=True, blend_tb=tb,
                  blend_cs=cs)
        step = make_step(ta)
        args = (state.means, state.sh_dc, state.opacity_logit)
        t0 = time.perf_counter()
        try:
            out = step(*args)
            float(out[0])
        except Exception as e:  # noqa: BLE001 — sweep survives OOM configs
            print(f"tb={tb:2d} cs={cs:4d}: FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)
            continue
        compile_s = time.perf_counter() - t0
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*args)
        float(out[0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        l, img, g = out
        img_h = np.asarray(img)
        gm = np.asarray(g[0])
        if ref is None:
            ref = (img_h, gm)
            di = dg = 0.0
        else:
            di = float(np.max(np.abs(img_h - ref[0])))
            denom = float(np.max(np.abs(ref[1]))) or 1.0
            dg = float(np.max(np.abs(gm - ref[1]))) / denom
        print(f"tb={tb:2d} cs={cs:4d}: {dt:7.1f} ms  "
              f"({H*W/1e3/dt:5.2f} MP/s)  loss={float(l):.6f}  "
              f"d_img={di:.2e}  d_gmeans(rel)={dg:.2e}  "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
