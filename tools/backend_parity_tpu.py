#!/usr/bin/env python
"""On-hardware parity: pallas vs xla blend backends, fwd image + grads.

Mid-size scene (100k Gaussians, 960x544) so the XLA scan path stays
tractable. Catches Mosaic-compile divergences the CPU interpreter tests
cannot (cf. the round-2 untile fusion miscompile)."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    N, H, W = 100_000, 544, 960
    from ht3dgs.core import gaussians as G
    from ht3dgs.core.camera import intrinsics_from_fov, make_camera
    from ht3dgs.raster import render

    rng = np.random.default_rng(3)
    pts = rng.standard_normal((N, 3)).astype(np.float32) * 1.2
    pts[:, 2] += 5.0
    state = G.create_from_pcd(pts, rng.random((N, 3)).astype(np.float32),
                              capacity=N)
    # anisotropy + varied opacity so every gradient path is exercised
    state = dataclasses.replace(
        state,
        log_scales=state.log_scales + jnp.asarray(
            rng.normal(0, 0.5, (N, 3)).astype(np.float32)),
        opacity_logit=jnp.asarray(
            rng.normal(-1.5, 1.0, (N, 1)).astype(np.float32)))
    cam = make_camera(H, W, intrinsics_from_fov(1.1, H, W))
    target = jnp.zeros((H, W, 3), jnp.float32)

    def make(backend):
        ta = dict(tile_h=16, tile_w=16, max_per_tile=256, dup_factor=12,
                  backend=backend)

        @jax.jit
        def step(means, sh_dc, op, ls):
            def loss_fn(m, s, o, l):
                st = dataclasses.replace(state, means=m, sh_dc=s,
                                         opacity_logit=o, log_scales=l)
                out = render(st, cam, mode="tiled", tile_args=ta)
                return jnp.mean((out["image"] - target) ** 2), out["image"]

            (lo, img), g = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(
                    means, sh_dc, op, ls)
            return lo, img, g
        return step

    args = (state.means, state.sh_dc, state.opacity_logit, state.log_scales)
    ref = None
    names = ["xla", "xla_early", "pallas"]
    for be in names:
        lo, img, g = make(be)(*args)
        lo = float(lo)
        img = np.asarray(img)
        g = [np.asarray(x) for x in g]
        if ref is None:
            ref = (lo, img, g)
            print(f"{be:10s} loss={lo:.8f} (reference)", flush=True)
        else:
            di = float(np.max(np.abs(img - ref[1])))
            dgs = []
            for a, b in zip(g, ref[2]):
                den = max(float(np.max(np.abs(b))), 1e-20)
                dgs.append(float(np.max(np.abs(a - b))) / den)
            print(f"{be:10s} loss={lo:.8f} d_img={di:.2e} "
                  f"d_g(rel)={['%.2e' % d for d in dgs]}", flush=True)
            # kept-threshold crossings flip discretely under f32
            # reassociation between compilations, so small cross-backend
            # deviations are inherent; the probe exists to catch GROSS
            # miscompiles (losses off by orders of magnitude)
            assert np.isfinite(lo) and abs(lo - ref[0]) < 1e-3 * (
                abs(ref[0]) + 1e-6), f"{be} loss diverges"
            assert di < 2e-3, f"{be} image diverges"
            assert all(np.isfinite(d) and d < 2e-2 for d in dgs), \
                f"{be} grads diverge"
    print("BACKEND PARITY OK", flush=True)


if __name__ == "__main__":
    main()
