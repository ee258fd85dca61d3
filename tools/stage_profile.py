#!/usr/bin/env python
"""Stage-level throughput profile of the tiled rasterizer on the current
JAX default device (the real TPU under axon; CPU elsewhere).

Times, per stage, fwd and fwd+bwd:
  - projection (project + pack)
  - binning (build_tile_lists: expand + sort + gather)
  - blend (per backend: pallas / xla_early)
  - full step (render + MSE loss + grads) per backend

Usage: python tools/stage_profile.py [n_gauss] [H] [W] [iters] \
           [backends] [max_per_tile] [dup_factor] [route_bf16]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5, warmup=True):
    if warmup:
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    n_gauss = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 544
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 960
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    backends = sys.argv[5].split(",") if len(sys.argv) > 5 else \
        ["pallas", "xla_early"]
    max_per_tile = int(sys.argv[6]) if len(sys.argv) > 6 else 1024
    dup_factor = int(sys.argv[7]) if len(sys.argv) > 7 else 16
    route_bf16 = bool(int(sys.argv[8])) if len(sys.argv) > 8 else False
    trained = "--trained" in sys.argv

    from ht3dgs.core import gaussians as G
    from ht3dgs.core.camera import intrinsics_from_fov, make_camera
    from ht3dgs.raster import render
    from ht3dgs.raster.projection import project
    from ht3dgs.raster.tiled import build_tile_lists

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from _sweep_common import bench_scene

    state, cam, target = bench_scene(n_gauss, H, W, trained=trained)
    tile_kw = dict(tile_h=16, tile_w=16, max_per_tile=max_per_tile,
                   dup_factor=dup_factor, route_bf16=route_bf16)

    print(f"device={jax.devices()[0].platform} n={n_gauss} {W}x{H}")

    # --- projection ---------------------------------------------------------
    @jax.jit
    def proj_fwd(means):
        p = project(means, state.scales(), state.quats, state.opacities(),
                    state.sh(), state.live, cam, state.active_sh_degree,
                    state.max_sh_degree)
        return p

    @jax.jit
    def proj_fwdbwd(means):
        def f(m):
            p = proj_fwd(m)
            return jnp.sum(p.means2d) + jnp.sum(p.conics) + \
                jnp.sum(p.colors) + jnp.sum(p.opacities)
        return jax.grad(f)(means)

    t = timeit(proj_fwd, state.means, iters=iters)
    print(f"projection fwd        {t*1e3:8.1f} ms")
    t = timeit(proj_fwdbwd, state.means, iters=iters)
    print(f"projection fwd+bwd    {t*1e3:8.1f} ms")

    proj = jax.jit(proj_fwd)(state.means)
    proj = jax.block_until_ready(proj)

    # --- binning ------------------------------------------------------------
    @jax.jit
    def binning(p):
        ent, meta, total, nd, ndt, *_ = build_tile_lists(p, H, W, **tile_kw)
        return ent, meta

    t = timeit(binning, proj, iters=iters)
    print(f"binning fwd           {t*1e3:8.1f} ms")
    ent, meta = jax.block_until_ready(jax.jit(binning)(proj))

    from ht3dgs.raster.tiled import _pack_attr_rows, build_tile_lists_from_rows

    @jax.jit
    def binning_fwdbwd(p):
        rows = _pack_attr_rows(p)

        def f(r):
            e, _, _, _, _, _ = build_tile_lists_from_rows(
                r, p.valid, p.depths, H, W, **tile_kw)
            return jnp.mean(e ** 2)

        return jax.grad(f)(rows)

    t = timeit(binning_fwdbwd, proj, iters=iters)
    print(f"binning fwd+bwd       {t*1e3:8.1f} ms")

    # --- blend per backend --------------------------------------------------
    from ht3dgs.raster.pallas_blend import ATTRS, blend_pallas, \
        blend_xla_early

    ent16 = jnp.pad(ent, ((0, 0), (0, 0), (0, ATTRS - ent.shape[-1])))

    for name, fn, e in (("pallas", blend_pallas, ent16),
                        ("xla_early", blend_xla_early, ent)):
        if name not in backends:
            continue

        @jax.jit
        def blend_fwd(e_, fn=fn):
            return fn(e_, meta, 16, 16)

        @jax.jit
        def blend_fwdbwd(e_, fn=fn):
            def f(x):
                rgb, tb, dep = fn(x, meta, 16, 16)
                return jnp.mean(rgb ** 2) + jnp.mean(tb) + \
                    0.1 * jnp.mean(dep)
            return jax.grad(f)(e_)

        t = timeit(blend_fwd, e, iters=iters)
        print(f"blend[{name:9s}] fwd     {t*1e3:8.1f} ms")
        t = timeit(blend_fwdbwd, e, iters=iters)
        print(f"blend[{name:9s}] fwd+bwd {t*1e3:8.1f} ms")

    # --- full step ----------------------------------------------------------
    import dataclasses

    for name in backends:
        targs = dict(tile_kw, backend=name)

        @jax.jit
        def step(means, sh_dc, opacity_logit, targs=targs):
            def loss_fn(m, s, o):
                st = dataclasses.replace(state, means=m, sh_dc=s,
                                         opacity_logit=o)
                out = render(st, cam, mode="tiled", tile_args=targs)
                return jnp.mean((out["image"] - target) ** 2)
            return jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
                means, sh_dc, opacity_logit)

        t = timeit(step, state.means, state.sh_dc, state.opacity_logit,
                   iters=iters)
        mps = H * W / 1e6 / t
        print(f"step[{name:9s}] fwd+bwd  {t*1e3:8.1f} ms  ({mps:.2f} MP/s)")


if __name__ == "__main__":
    main()
