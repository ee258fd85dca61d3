#!/usr/bin/env python
"""Per-stage TPU profile of the 1M/1080p bench workload.

Usage: quick_profile.py [K] [dup] — default 1024 16.
Stages: projection fwd / fwd+bwd, binning fwd / fwd+bwd, blend fwd /
fwd+bwd (pallas), full step."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    """Host-fetch one element: the only reliable completion barrier on the
    remote runtime (block_until_ready can return early)."""
    import jax.tree_util as jtu
    leaf = jtu.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(fn, *args, iters=3):
    t0 = time.perf_counter()
    _force(fn(*args))
    print(f"   (compile+1st: {time.perf_counter() - t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        _force(fn(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dup = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    N, H, W = 1_000_000, 1080, 1920
    from ht3dgs.core import gaussians as G
    from ht3dgs.core.camera import intrinsics_from_fov, make_camera
    from ht3dgs.raster import render
    from ht3dgs.raster.pallas_blend import ATTRS, blend_pallas
    from ht3dgs.raster.projection import project
    from ht3dgs.raster.tiled import (_pack_attr_rows, build_tile_lists,
                                     build_tile_lists_from_rows)

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((N, 3)).astype(np.float32) * 1.5
    pts[:, 2] += 6.0
    colors = rng.random((N, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, colors, capacity=N)
    cam = make_camera(H, W, intrinsics_from_fov(1.2, H, W))
    target = jnp.zeros((H, W, 3), jnp.float32)
    tile_kw = dict(tile_h=16, tile_w=16, max_per_tile=K, dup_factor=dup)
    print(f"device={jax.devices()[0].platform}  K={K} dup={dup}", flush=True)

    def proj_fn(means):
        return project(means, state.scales(), state.quats, state.opacities(),
                       state.sh(), state.live, cam, state.active_sh_degree,
                       state.max_sh_degree)

    t = timeit(jax.jit(proj_fn), state.means)
    print(f"projection fwd        {t:8.1f} ms", flush=True)

    @jax.jit
    def proj_fb(means):
        def f(m):
            p = proj_fn(m)
            return (jnp.sum(p.means2d) + jnp.sum(p.conics)
                    + jnp.sum(p.colors) + jnp.sum(p.extents))
        return jax.grad(f)(means)

    t = timeit(proj_fb, state.means)
    print(f"projection fwd+bwd    {t:8.1f} ms", flush=True)

    proj = jax.block_until_ready(jax.jit(proj_fn)(state.means))

    @jax.jit
    def binning(p):
        ent, meta, total, nd, ndt, *_ = build_tile_lists(p, H, W, **tile_kw)
        return ent, meta

    t = timeit(binning, proj)
    print(f"binning fwd           {t:8.1f} ms", flush=True)

    @jax.jit
    def binning_fb(p):
        rows = _pack_attr_rows(p)

        def f(r):
            e, _, _, _, _, _ = build_tile_lists_from_rows(
                r, p.valid, p.depths, H, W, **tile_kw)
            return jnp.mean(e ** 2)

        return jax.grad(f)(rows)

    t = timeit(binning_fb, proj)
    print(f"binning fwd+bwd       {t:8.1f} ms", flush=True)

    ent, meta = jax.block_until_ready(binning(proj))
    ent16 = jnp.pad(ent, ((0, 0), (0, 0), (0, ATTRS - ent.shape[-1])))

    @jax.jit
    def blend_f(e, m):
        rgb, tb, dep = blend_pallas(e, m, 16, 16)
        return rgb

    t = timeit(blend_f, ent16, meta)
    print(f"blend fwd [pallas]    {t:8.1f} ms", flush=True)

    @jax.jit
    def blend_fb(e, m):
        def f(ee):
            rgb, tb, dep = blend_pallas(ee, m, 16, 16)
            return jnp.mean(rgb ** 2) + jnp.mean(tb ** 2)
        return jax.grad(f)(e)

    t = timeit(blend_fb, ent16, meta)
    print(f"blend fwd+bwd         {t:8.1f} ms", flush=True)

    targs = dict(tile_kw, backend="pallas")

    @jax.jit
    def step(means, sh_dc, opacity_logit):
        def loss_fn(m, s, o):
            st = dataclasses.replace(state, means=m, sh_dc=s,
                                     opacity_logit=o)
            out = render(st, cam, mode="tiled", tile_args=targs)
            return jnp.mean((out["image"] - target) ** 2)
        return jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
            means, sh_dc, opacity_logit)

    t = timeit(step, state.means, state.sh_dc, state.opacity_logit)
    print(f"step[pallas] fwd+bwd  {t:8.1f} ms  ({H*W/1e3/t:.2f} MP/s)",
          flush=True)


if __name__ == "__main__":
    main()
