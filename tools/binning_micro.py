#!/usr/bin/env python
"""Micro-profile of binning sub-stages at the bench workload (K=512, dup=8),
plus candidate-optimization probes (scatter sizes, pos_ff-from-src)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(fn, *args, iters=4):
    force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        force(fn(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N, H, W = 1_000_000, 1080, 1920
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    dup = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from ht3dgs.core import gaussians as G
    from ht3dgs.core.camera import intrinsics_from_fov, make_camera
    from ht3dgs.raster.projection import project
    from ht3dgs.raster import tiled as TL

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((N, 3)).astype(np.float32) * 1.5
    pts[:, 2] += 6.0
    colors = rng.random((N, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, colors, capacity=N)
    cam = make_camera(H, W, intrinsics_from_fov(1.2, H, W))

    @jax.jit
    def proj_f(means):
        return project(means, state.scales(), state.quats, state.opacities(),
                       state.sh(), state.live, cam, state.active_sh_degree,
                       state.max_sh_degree)

    proj = jax.block_until_ready(proj_f(state.means))
    tile_w = tile_h = 16
    ntx, nty = W // 16, -(-H // 16)
    T = ntx * nty
    M = N * dup
    print(f"device={jax.devices()[0].platform} M={M} T={T} K={K}",
          flush=True)

    attrs0 = TL._pack_attr_rows(proj)
    valid0 = proj.valid
    depths0 = proj.depths

    # stage 1-2: depth sort + row takes
    @jax.jit
    def s12(attrs, valid, depths):
        order = jnp.argsort(depths).astype(jnp.int32)
        return (jnp.take(attrs, order, axis=0), jnp.take(valid, order),
                order)
    print(f"s12 depth-sort+takes  {timeit(s12, attrs0, valid0, depths0):7.1f}"
          " ms", flush=True)
    attrs, valid, order = jax.block_until_ready(
        jax.jit(s12)(attrs0, valid0, depths0))

    # stage 3a: rect spans + cumsum
    @jax.jit
    def s3a(attrs, valid):
        mx, my = attrs[:, 0], attrs[:, 1]
        ex, ey = attrs[:, 10], attrs[:, 11]
        x0 = jnp.clip(jnp.floor((mx - ex) / tile_w), 0, ntx).astype(jnp.int32)
        x1 = jnp.clip(jnp.floor((mx + ex + tile_w - 1) / tile_w), 0, ntx
                      ).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor((my - ey) / tile_h), 0, nty).astype(jnp.int32)
        y1 = jnp.clip(jnp.floor((my + ey + tile_h - 1) / tile_h), 0, nty
                      ).astype(jnp.int32)
        span_x = jnp.maximum(x1 - x0, 0)
        span = jnp.where(valid, span_x * jnp.maximum(y1 - y0, 0), 0)
        offs = jnp.cumsum(span) - span
        return x0, y0, span_x, span, offs
    print(f"s3a spans             {timeit(s3a, attrs, valid):7.1f} ms",
          flush=True)
    x0, y0, span_x, span, offs = jax.block_until_ready(
        jax.jit(s3a)(attrs, valid))

    # stage 3b: expansion fills
    bits = max(int(ntx).bit_length(), int(nty).bit_length())

    @jax.jit
    def s3b(x0, y0, span_x, span, offs):
        has = (span > 0) & (offs < M)
        tgt = jnp.where(has, offs, M - 1)
        seg_mark = jnp.zeros((M,), jnp.int32).at[tgt].max(
            jnp.where(has, jnp.arange(N, dtype=jnp.int32) + 1, 0))
        src = jnp.clip(jax.lax.cummax(seg_mark) - 1, 0, N - 1)
        packed = (((x0 << bits) | y0) << bits) | span_x
        pos_ff = jax.lax.cummax(jnp.zeros((M,), jnp.int32).at[tgt].max(
            jnp.where(has, offs + 1, 0)))
        pay_ff = TL._seg_ffill(
            jnp.zeros((M,), jnp.int32).at[tgt].max(
                jnp.where(has, packed, 0)), 3 * bits)
        m = jnp.arange(M, dtype=jnp.int32)
        local = m - (pos_ff - 1)
        mask = (1 << bits) - 1
        sx = jnp.maximum(pay_ff & mask, 1)
        q = jnp.floor((local.astype(jnp.float32) + 0.5)
                      / sx.astype(jnp.float32)).astype(jnp.int32)
        rem = local - q * sx
        tx = (pay_ff >> (2 * bits)) + rem
        ty = ((pay_ff >> bits) & mask) + q
        total = offs[-1] + span[-1]
        tile_id = jnp.where(m < total, ty * ntx + tx, T)
        return tile_id, src
    t = timeit(s3b, x0, y0, span_x, span, offs)
    print(f"s3b fills             {t:7.1f} ms", flush=True)
    tile_id, src = jax.block_until_ready(jax.jit(s3b)(x0, y0, span_x, span,
                                                      offs))

    # stage 4: main sort
    @jax.jit
    def s4(tile_id, src):
        return jax.lax.sort((tile_id, src), num_keys=1, is_stable=True)
    print(f"s4 sort 2-op          {timeit(s4, tile_id, src):7.1f} ms",
          flush=True)
    sorted_tile, sorted_src = jax.block_until_ready(
        jax.jit(s4)(tile_id, src))

    # stage 5: searchsorted + slices + gather
    @jax.jit
    def s5(sorted_tile, sorted_src, attrs):
        tids = jnp.arange(T, dtype=sorted_tile.dtype)
        starts = jnp.searchsorted(sorted_tile, tids, side="left")
        ends = jnp.searchsorted(sorted_tile, tids, side="right")
        src_pad = jnp.concatenate([sorted_src, jnp.zeros((K,), jnp.int32)])
        csrc = jax.vmap(
            lambda s: jax.lax.dynamic_slice(src_pad, (s,), (K,)))(
                jnp.minimum(starts, M))
        ent = jnp.take(attrs[:, :10], csrc, axis=0)
        return ent, csrc
    t = timeit(s5, sorted_tile, sorted_src, attrs)
    print(f"s5 slices+gather      {t:7.1f} ms", flush=True)
    ent, csrc = jax.block_until_ready(jax.jit(s5)(sorted_tile, sorted_src,
                                                  attrs))

    # ---- backward pieces ----
    TK = T * K
    d_ent = jax.block_until_ready(ent * 0.5)

    @jax.jit
    def b1(csrc, d_ent):
        key = csrc.reshape(-1)
        d_flat = d_ent.reshape(TK, 10)
        return jax.lax.sort((key,) + tuple(d_flat[:, i] for i in range(10)),
                            num_keys=1, is_stable=True)
    print(f"b1 route sort 11-op   {timeit(b1, csrc, d_ent):7.1f} ms",
          flush=True)
    outs = jax.block_until_ready(jax.jit(b1)(csrc, d_ent))
    skey = outs[0]

    @jax.jit
    def b2(skey):
        pos1 = jnp.arange(1, TK + 1, dtype=jnp.int32)
        return jax.lax.cummax(jnp.zeros((N,), jnp.int32).at[skey].max(pos1))
    print(f"b2 scatter-max bounds {timeit(b2, skey):7.1f} ms", flush=True)

    @jax.jit
    def b3(outs):
        return jnp.stack([jnp.cumsum(outs[1 + i]) for i in range(10)],
                         axis=-1)
    print(f"b3 cumsums+stack      {timeit(b3, outs):7.1f} ms", flush=True)
    c = jax.block_until_ready(jax.jit(b3)(outs))
    khi = jax.block_until_ready(jax.jit(b2)(skey))

    @jax.jit
    def b4(c, khi, order):
        klo = jnp.concatenate([jnp.zeros((1,), jnp.int32), khi[:-1]])
        h = jnp.take(c, jnp.maximum(khi - 1, 0), axis=0)
        lo = jnp.where((klo > 0)[:, None],
                       jnp.take(c, jnp.maximum(klo - 1, 0), axis=0), 0.0)
        d_sorted = jnp.where((khi > klo)[:, None], h - lo, 0.0)
        iota_n = jnp.arange(N, dtype=jnp.int32)
        _, inv_order = jax.lax.sort((order, iota_n), num_keys=1,
                                    is_stable=True)
        return jnp.take(d_sorted, inv_order, axis=0)
    print(f"b4 takes+unsort       {timeit(b4, c, khi, order):7.1f} ms",
          flush=True)

    # candidate: pos_ff from src transitions (no second scatter)
    @jax.jit
    def cand_posff(src):
        m = jnp.arange(M, dtype=jnp.int32)
        chg = src != jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), src[:-1]])
        return jax.lax.cummax(jnp.where(chg, m + 1, 0))
    print(f"cand pos_ff-from-src  {timeit(cand_posff, src):7.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
