#!/usr/bin/env python
"""Report binning entry statistics for the bench scene (TPU)."""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n_gauss, H, W = 1_000_000, 1080, 1920
    from ht3dgs.core import gaussians as G
    from ht3dgs.core.camera import intrinsics_from_fov, make_camera
    from ht3dgs.raster.projection import project
    from ht3dgs.raster.tiled import build_tile_lists

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((n_gauss, 3)).astype(np.float32) * 1.5
    pts[:, 2] += 6.0
    colors = rng.random((n_gauss, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, colors, capacity=n_gauss)
    cam = make_camera(H, W, intrinsics_from_fov(1.2, H, W))

    @jax.jit
    def stats(means):
        p = project(means, state.scales(), state.quats, state.opacities(),
                    state.sh(), state.live, cam, state.active_sh_degree,
                    state.max_sh_degree)
        ent, meta, total, nd_m, nd_tile, *_ = build_tile_lists(
            p, H, W, 16, 16, 1024, 16)
        counts = meta[:, 0]
        return (total, nd_m + nd_tile, counts.max(), counts.mean(),
                jnp.percentile(counts.astype(jnp.float32),
                               jnp.array([50.0, 90.0, 99.0])))

    total, nd, cmax, cmean, pct = stats(state.means)
    print("total entries:", int(total))
    print("dropped:", int(nd))
    print("per-tile count max:", int(cmax), "mean:", float(cmean))
    print("percentiles 50/90/99:", np.asarray(pct))


if __name__ == "__main__":
    main()
