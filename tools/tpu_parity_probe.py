#!/usr/bin/env python
"""TPU-vs-CPU parity probe: render + gradients of the tiled path on the
real TPU compared against the same computation on CPU."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(platform):
    import jax

    dev = jax.devices(platform)[0]
    import jax.numpy as jnp
    import dataclasses
    from ht3dgs.core import gaussians as G
    from ht3dgs.core.camera import intrinsics_from_fov, make_camera
    from ht3dgs.raster import render

    rng = np.random.default_rng(7)
    n = 3000
    pts = rng.standard_normal((n, 3)).astype(np.float32) * 1.2
    pts[:, 2] += 5.0
    cols = rng.random((n, 3)).astype(np.float32)
    with jax.default_device(dev):
        state = G.create_from_pcd(pts, cols, 4096)
        cam = make_camera(192, 256, intrinsics_from_fov(1.1, 192, 256))
        ta = dict(max_per_tile=512, dup_factor=12, backend="xla")
        target = jnp.zeros((192, 256, 3), jnp.float32)

        @jax.jit
        def loss_and_grads(means, op):
            def f(m, o):
                s = dataclasses.replace(state, means=m, opacity_logit=o)
                out = render(s, cam, mode="tiled", tile_args=ta)
                return jnp.mean((out["image"] - target) ** 2), out["image"]

            (l, img), g = jax.value_and_grad(f, argnums=(0, 1),
                                             has_aux=True)(means, op)
            return l, img, g

        l, img, (gm, go) = loss_and_grads(state.means, state.opacity_logit)
        return (np.asarray(l), np.asarray(img), np.asarray(gm),
                np.asarray(go))


def main():
    import jax

    plats = {d.platform for d in jax.devices()}
    l_t, img_t, gm_t, go_t = run("tpu" if "tpu" in plats else "axon")
    l_c, img_c, gm_c, go_c = run("cpu")
    print("loss  tpu", l_t, " cpu", l_c, flush=True)
    print("img   max|d|", np.abs(img_t - img_c).max())
    print("gmean max|d|", np.abs(gm_t - gm_c).max(),
          " rel", np.abs(gm_t - gm_c).max() / (np.abs(gm_c).max() + 1e-12))
    print("gop   max|d|", np.abs(go_t - go_c).max(),
          " rel", np.abs(go_t - go_c).max() / (np.abs(go_c).max() + 1e-12))
    ok = (abs(l_t - l_c) < 1e-5 and np.abs(img_t - img_c).max() < 1e-3
          and np.abs(gm_t - gm_c).max() / (np.abs(gm_c).max() + 1e-12) < 1e-2)
    print("PARITY", "OK" if ok else "FAIL")


if __name__ == "__main__":
    main()
