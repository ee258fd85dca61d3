#!/usr/bin/env python
"""Bench-scene realism probe: trained-scene opacity statistics vs the
uniform-0.1 init the bench has used so far.

Trained 3DGS opacity histograms are strongly bimodal: opacity-reset cycles
push everything to 0.01 and surface splats re-learn toward the 0.99 clamp,
while pruning removes < 0.005 (reference train loop,
/root/reference/trainer/ht3dgs_trainer.py:150-157). The CUDA reference's
representative throughput (~24 fwd+bwd it/s at 1M/2MP, the 50 MP/s nominal
in BASELINE.md) is measured on such scenes, where per-pixel transmittance
termination does real work. The uniform-0.1 scene never terminates
(every pixel keeps all K entries) — an adversarial stress case, not the
like-for-like workload.

Prints counts/ncon stats + step time for both scenes at several K."""
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
    from ht3dgs.raster.projection import project
    from ht3dgs.raster.tiled import build_tile_lists
    from ht3dgs.raster.pallas_blend import ATTRS, _blend_tiles_pallas_raw

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((N, 3)).astype(np.float32) * 1.5
    pts[:, 2] += 6.0
    colors = rng.random((N, 3)).astype(np.float32)
    base = G.create_from_pcd(pts, colors, capacity=N)
    cam = make_camera(H, W, intrinsics_from_fov(1.2, H, W))
    target = jnp.zeros((H, W, 3), jnp.float32)

    # trained-like opacity: bimodal (reset->0.01 floaters, surface splats
    # near the 0.99 activation ceiling), pruned below 0.005
    u = rng.random(N)
    op = np.where(u < 0.45, rng.uniform(0.60, 0.99, N),
                  np.where(u < 0.75, rng.uniform(0.15, 0.60, N),
                           rng.uniform(0.01, 0.15, N))).astype(np.float32)
    logit = np.log(op / (1 - op)).astype(np.float32)[:, None]
    trained = dataclasses.replace(base, opacity_logit=jnp.asarray(logit))

    for name, state in (("uniform0.1", base), ("trained", trained)):
        @jax.jit
        def front(means, st=state):
            p = project(means, st.scales(), st.quats, st.opacities(),
                        st.sh(), st.live, cam, st.active_sh_degree,
                        st.max_sh_degree)
            ent, meta, total, nd, ndt, *_ = build_tile_lists(
                p, H, W, 16, 16, max_per_tile=384, dup_factor=4)
            return jnp.pad(ent, ((0, 0), (0, 0),
                                 (0, ATTRS - ent.shape[-1]))), meta, total

        ent16, meta, total = jax.block_until_ready(front(state.means))
        _, _, _, ncon = jax.jit(
            lambda e, m: _blend_tiles_pallas_raw(e, m, tile_h=16, tile_w=16)
        )(ent16, meta)
        nc = np.asarray(ncon)
        cnts = np.asarray(meta[:, 0])
        print(f"[{name}] total={int(total)} counts p50/p95/max "
              f"{np.percentile(cnts,50):.0f}/{np.percentile(cnts,95):.0f}/"
              f"{cnts.max()}  ncon mean/p95 {nc.mean():.0f}/"
              f"{np.percentile(nc,95):.0f} per-tile-max p95 "
              f"{np.percentile(nc.max(1),95):.0f}", flush=True)

        for K in ((384, 192, 128) if name == "trained" else (384,)):
            ta = dict(tile_h=16, tile_w=16, max_per_tile=K, dup_factor=4,
                      backend="pallas", route_bf16=True)

            @jax.jit
            def step(means, sh_dc, opacity_logit, st=state, ta=ta):
                def loss_fn(m, s, o):
                    s2 = dataclasses.replace(st, means=m, sh_dc=s,
                                             opacity_logit=o)
                    out = render(s2, cam, mode="tiled", tile_args=ta)
                    return (jnp.mean((out["image"] - target) ** 2),
                            out["image"])
                (l, img), g = jax.value_and_grad(
                    loss_fn, argnums=(0, 1, 2), has_aux=True)(
                        means, sh_dc, opacity_logit)
                return l, img, g

            args = (state.means, state.sh_dc, state.opacity_logit)
            out = step(*args)
            float(out[0])
            iters = 8
            t0 = time.perf_counter()
            for _ in range(iters):
                out = step(*args)
            float(out[0])
            dt = (time.perf_counter() - t0) / iters * 1e3
            img = np.asarray(out[1])
            gm = np.asarray(out[2][0])
            print(f"[{name}] K={K:4d}: {dt:7.1f} ms ({H*W/1e3/dt:5.2f} "
                  f"MP/s)  img_ref_hash={float(np.abs(img).mean()):.6f} "
                  f"gm_absmax={float(np.abs(gm).max()):.3e}", flush=True)


if __name__ == "__main__":
    main()
