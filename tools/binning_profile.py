#!/usr/bin/env python
"""Sub-stage timing of the binning forward at bench workload (TPU), plus
candidate restructures:
  A. status quo stages 1-5 individually
  B. 12-operand tile sort carrying attrs (kills post-sort ent gather)
  C. sorted_attrs materialization + per-tile contiguous dynamic-slice gather
  D. residual extras (3-op sort + payload sort) for the custom VJP
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N, H, W = 1_000_000, 1080, 1920
    tile_h = tile_w = 16
    K = 1024
    dup = 16
    M = N * dup
    ntx, nty = -(-W // tile_w), -(-H // tile_h)
    T = ntx * nty

    from ht3dgs.core import gaussians as G
    from ht3dgs.core.camera import intrinsics_from_fov, make_camera
    from ht3dgs.raster.projection import project
    from ht3dgs.raster.tiled import _pack_attr_rows

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((N, 3)).astype(np.float32) * 1.5
    pts[:, 2] += 6.0
    colors = rng.random((N, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, colors, capacity=N)
    cam = make_camera(H, W, intrinsics_from_fov(1.2, H, W))

    @jax.jit
    def get_rows(means):
        p = project(means, state.scales(), state.quats, state.opacities(),
                    state.sh(), state.live, cam, state.active_sh_degree,
                    state.max_sh_degree)
        return _pack_attr_rows(p), p.valid, p.depths

    attrs, valid, depths = jax.block_until_ready(get_rows(state.means))

    # ---- stage 1-2: depth sort + row gather
    @jax.jit
    def s12(attrs, valid, depths):
        order = jnp.argsort(depths).astype(jnp.int32)
        return (jnp.take(attrs, order, axis=0),
                jnp.take(valid, order, axis=0), order)

    attrs_s, valid_s, order = jax.block_until_ready(s12(attrs, valid, depths))
    print(f"s12 depth argsort + [N,16] take   {timeit(s12, attrs, valid, depths):8.1f} ms")

    # ---- stage 3a: spans + cumsum
    @jax.jit
    def s3a(attrs, valid):
        mx, my, r = attrs[:, 0], attrs[:, 1], attrs[:, 10]
        x0 = jnp.clip(jnp.floor((mx - r) / tile_w), 0, ntx).astype(jnp.int32)
        x1 = jnp.clip(jnp.floor((mx + r + tile_w - 1) / tile_w), 0, ntx).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor((my - r) / tile_h), 0, nty).astype(jnp.int32)
        y1 = jnp.clip(jnp.floor((my + r + tile_h - 1) / tile_h), 0, nty).astype(jnp.int32)
        span_x = jnp.maximum(x1 - x0, 0)
        span = jnp.where(valid, span_x * jnp.maximum(y1 - y0, 0), 0)
        offs = jnp.cumsum(span) - span
        return x0, y0, span_x, span, offs

    x0, y0, span_x, span, offs = jax.block_until_ready(s3a(attrs_s, valid_s))
    print(f"s3a spans + cumsum[N]             {timeit(s3a, attrs_s, valid_s):8.1f} ms")

    # ---- stage 3b: seg_mark scatter-max + cummax + geo gather + tile coords
    @jax.jit
    def s3b(x0, y0, span_x, span, offs):
        has = (span > 0) & (offs < M)
        seg_mark = jnp.zeros((M,), jnp.int32).at[
            jnp.where(has, offs, M - 1)
        ].max(jnp.where(has, jnp.arange(N, dtype=jnp.int32) + 1, 0))
        src = jnp.clip(jax.lax.cummax(seg_mark) - 1, 0, N - 1)
        geo = jnp.stack([x0, y0, span_x, offs], axis=-1)
        geo_e = jnp.take(geo, src, axis=0)
        m = jnp.arange(M, dtype=jnp.int32)
        local = m - geo_e[:, 3]
        sx = jnp.maximum(geo_e[:, 2], 1)
        q = jnp.floor((local.astype(jnp.float32) + 0.5)
                      / sx.astype(jnp.float32)).astype(jnp.int32)
        rem = local - q * sx
        tx = geo_e[:, 0] + rem
        ty = geo_e[:, 1] + q
        total = offs[-1] + span[-1]
        tile_id = jnp.where(m < total, ty * ntx + tx, T)
        return tile_id, src

    tile_id, src = jax.block_until_ready(s3b(x0, y0, span_x, span, offs))
    print(f"s3b expand (scat/cummax/geo-gather) {timeit(s3b, x0, y0, span_x, span, offs):6.1f} ms")

    # 3b variant: gather-free forward-fill of offs; cummax per channel
    @jax.jit
    def s3b_ff(x0, y0, span_x, span, offs):
        has = (span > 0) & (offs < M)
        tgt = jnp.where(has, offs, M - 1)
        m = jnp.arange(M, dtype=jnp.int32)
        # forward-fill offs (monotone -> plain cummax of scattered value)
        offs_e = jax.lax.cummax(jnp.zeros((M,), jnp.int32).at[tgt].max(
            jnp.where(has, offs, 0)))
        local = m - offs_e
        # forward-fill the three non-monotone channels: pack below offs
        # offs<2^24 fits f64? keep int32 pairs: c = offs*? -> skip; emulate
        # with two scatters packing 14 bits (x0|y0) and span_x under offs?
        # not representable in int32 -> use float64-free two-channel trick:
        # channel packs value in low 8 bits of (offs<<8) via int64? absent.
        # So this variant only kills the offs column of the gather.
        geo = jnp.stack([x0, y0, span_x], axis=-1)
        src = jnp.clip(jax.lax.cummax(
            jnp.zeros((M,), jnp.int32).at[tgt].max(
                jnp.where(has, jnp.arange(N, dtype=jnp.int32) + 1, 0))) - 1,
            0, N - 1)
        geo_e = jnp.take(geo, src, axis=0)
        sx = jnp.maximum(geo_e[:, 2], 1)
        q = jnp.floor((local.astype(jnp.float32) + 0.5)
                      / sx.astype(jnp.float32)).astype(jnp.int32)
        rem = local - q * sx
        tx = geo_e[:, 0] + rem
        ty = geo_e[:, 1] + q
        total = offs[-1] + span[-1]
        tile_id = jnp.where(m < total, ty * ntx + tx, T)
        return tile_id, src

    jax.block_until_ready(s3b_ff(x0, y0, span_x, span, offs))
    print(f"s3b variant ff-offs               {timeit(s3b_ff, x0, y0, span_x, span, offs):8.1f} ms")

    # ---- stage 4: sorts
    @jax.jit
    def s4_2op(tile_id, src):
        return jax.lax.sort((tile_id, src), num_keys=1, is_stable=True)

    sorted_tile, sorted_src = jax.block_until_ready(s4_2op(tile_id, src))
    print(f"s4 sort 2-op [M]                  {timeit(s4_2op, tile_id, src):8.1f} ms")

    @jax.jit
    def s4_3op(tile_id, src):
        m = jnp.arange(M, dtype=jnp.int32)
        return jax.lax.sort((tile_id, src, m), num_keys=1, is_stable=True)

    jax.block_until_ready(s4_3op(tile_id, src))
    print(f"s4 sort 3-op [M] (res path)       {timeit(s4_3op, tile_id, src):8.1f} ms")

    # ---- stage 5: searchsorted + gid + ent gathers
    @jax.jit
    def s5(sorted_tile, sorted_src, attrs_s):
        tids = jnp.arange(T, dtype=sorted_tile.dtype)
        starts = jnp.searchsorted(sorted_tile, tids, side="left")
        ends = jnp.searchsorted(sorted_tile, tids, side="right")
        idx = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
        gid = jnp.take(sorted_src, jnp.clip(idx, 0, M - 1))
        ent = jnp.take(attrs_s[:, :10], gid, axis=0)
        return ent, starts, ends

    ent, starts, ends = jax.block_until_ready(s5(sorted_tile, sorted_src, attrs_s))
    print(f"s5 searchsorted + gid + ent gather {timeit(s5, sorted_tile, sorted_src, attrs_s):7.1f} ms")

    # ---- C: sorted-order attrs materialization + contiguous block slice
    @jax.jit
    def s5_blk(sorted_tile, sorted_src, attrs_s):
        tids = jnp.arange(T, dtype=sorted_tile.dtype)
        starts = jnp.searchsorted(sorted_tile, tids, side="left")
        ends = jnp.searchsorted(sorted_tile, tids, side="right")
        sa = jnp.take(attrs_s[:, :10], sorted_src, axis=0)   # [M,10] gather
        sa = jnp.concatenate([sa, jnp.zeros((K, 10), sa.dtype)], axis=0)
        ent = jax.vmap(
            lambda s: jax.lax.dynamic_slice(sa, (s, 0), (K, 10)))(
                jnp.minimum(starts, M))
        return ent, starts, ends

    jax.block_until_ready(s5_blk(sorted_tile, sorted_src, attrs_s))
    print(f"s5 variant sortedattr+blockslice  {timeit(s5_blk, sorted_tile, sorted_src, attrs_s):8.1f} ms")

    # ---- B: carry 10 attr cols through the sort (no post-sort gather)
    @jax.jit
    def s45_carry(tile_id, src, attrs_s):
        cols = [attrs_s[:, i] for i in range(10)]
        cols_e = [jnp.take(c, src) for c in cols]      # [M] gathers pre-sort
        outs = jax.lax.sort(tuple([tile_id] + cols_e), num_keys=1,
                            is_stable=True)
        sorted_tile = outs[0]
        tids = jnp.arange(T, dtype=sorted_tile.dtype)
        starts = jnp.searchsorted(sorted_tile, tids, side="left")
        ends = jnp.searchsorted(sorted_tile, tids, side="right")
        sa = jnp.stack(outs[1:], axis=-1)
        sa = jnp.concatenate([sa, jnp.zeros((K, 10), sa.dtype)], axis=0)
        ent = jax.vmap(
            lambda s: jax.lax.dynamic_slice(sa, (s, 0), (K, 10)))(
                jnp.minimum(starts, M))
        return ent, starts, ends

    jax.block_until_ready(s45_carry(tile_id, src, attrs_s))
    print(f"s45 variant 11-op sort carry      {timeit(s45_carry, tile_id, src, attrs_s):8.1f} ms")

    # ---- D: residual extras — payload sort for j_idx
    @jax.jit
    def d_payload(sorted_tile, tile_id):
        m = jnp.arange(M, dtype=jnp.int32)
        perm = m  # stand-in with same shape/dtype
        j_sorted = jnp.where(sorted_tile < T, sorted_tile, T)
        _, j_idx = jax.lax.sort((perm, j_sorted), num_keys=1, is_stable=True)
        return j_idx

    jax.block_until_ready(d_payload(sorted_tile, tile_id))
    print(f"D payload sort [M] (res path)     {timeit(d_payload, sorted_tile, tile_id):8.1f} ms")

    # raw gather cost scale reference
    @jax.jit
    def raw_gather(attrs_s, src):
        return jnp.take(attrs_s[:, :10], src, axis=0)

    jax.block_until_ready(raw_gather(attrs_s, src))
    print(f"raw [M] row-gather from [N,10]    {timeit(raw_gather, attrs_s, src):8.1f} ms")


if __name__ == "__main__":
    main()
