#!/usr/bin/env python
"""Is the Pallas blend dominated by dead-chunk overhead?

Builds the bench-scale tile lists once (K=384), then times the blend
fwd/fwd+bwd on K-truncated views ent[:, :K']. If per-pixel transmittance
termination means only ~1 chunk is live, time ~ linear in K' reveals the
dead chunks (DMA + zero-write + program overhead) as the real cost.
Also prints kept-count stats (ncon) to size the live work.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=8):
    out = fn(*args)
    float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N, H, W = 1_000_000, 1080, 1920
    from ht3dgs.core import gaussians as G
    from ht3dgs.core.camera import intrinsics_from_fov, make_camera
    from ht3dgs.raster.projection import project
    from ht3dgs.raster.tiled import build_tile_lists
    from ht3dgs.raster.pallas_blend import (ATTRS, _blend_tiles_pallas_raw,
                                            blend_pallas)

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((N, 3)).astype(np.float32) * 1.5
    pts[:, 2] += 6.0
    colors = rng.random((N, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, colors, capacity=N)
    cam = make_camera(H, W, intrinsics_from_fov(1.2, H, W))

    @jax.jit
    def front(means):
        p = project(means, state.scales(), state.quats, state.opacities(),
                    state.sh(), state.live, cam, state.active_sh_degree,
                    state.max_sh_degree)
        ent, meta, total, nd, ndt, *_ = build_tile_lists(
            p, H, W, 16, 16, max_per_tile=384, dup_factor=4)
        return jnp.pad(ent, ((0, 0), (0, 0), (0, ATTRS - ent.shape[-1]))), \
            meta, total

    ent16, meta, total = jax.block_until_ready(front(state.means))
    print(f"total entries {int(total)}", flush=True)

    # kept-count stats from one raw forward
    _, _, _, ncon = jax.jit(
        lambda e, m: _blend_tiles_pallas_raw(e, m, tile_h=16, tile_w=16)
    )(ent16, meta)
    nc = np.asarray(ncon)
    cnts = np.asarray(meta[:, 0])
    print(f"counts: mean {cnts.mean():.0f} p50 {np.percentile(cnts, 50):.0f} "
          f"p95 {np.percentile(cnts, 95):.0f} max {cnts.max()}", flush=True)
    print(f"ncon per-pixel: mean {nc.mean():.1f} p95 "
          f"{np.percentile(nc, 95):.0f} max {nc.max():.0f}; per-tile max: "
          f"mean {nc.max(1).mean():.1f} p95 "
          f"{np.percentile(nc.max(1), 95):.0f}", flush=True)

    for Kp in (384, 256, 128, 64):
        e = ent16[:, :Kp]
        m = jnp.concatenate(
            [jnp.minimum(meta[:, :1], Kp), meta[:, 1:]], axis=1)

        @jax.jit
        def fwd(e_, m_):
            return blend_pallas(e_, m_, 16, 16)

        @jax.jit
        def fwdbwd(e_, m_):
            def f(x):
                rgb, tb_, dep = blend_pallas(x, m_, 16, 16)
                return jnp.mean(rgb ** 2) + jnp.mean(tb_) + 0.1 * jnp.mean(dep)
            return jax.grad(f)(e_)

        t1 = timeit(fwd, e, m)
        t2 = timeit(fwdbwd, e, m)
        print(f"K'={Kp:4d}: blend fwd {t1:7.1f} ms   fwd+bwd {t2:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
