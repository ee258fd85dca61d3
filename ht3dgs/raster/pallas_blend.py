"""Pallas TPU kernel for the per-tile alpha-blend (the rasterizer hot loop).

The binning front-end (raster/tiled.py) produces per-tile front-to-back
entry lists; this kernel composites them. Design (per pallas_guide.md):

- grid over tiles; BlockSpec streams one tile's pre-gathered entry block
  [K, ATTRS=16] HBM->VMEM with automatic double buffering while the previous
  tile computes; per-tile meta (entry count, tile origin) rides the scalar-
  prefetch path in SMEM. Chunks are sliced on the sublane axis (8-aligned);
  the pixel axis P (= tile_h·tile_w = 256 for 16×16 tiles) is the last dim
  of all compute shapes — VPU-native (8, 128) tiling.
- entries are processed in chunks of C=8: alpha [C, P] on the VPU, the
  in-chunk sequential transmittance as an unrolled exclusive product, and
  the rgb+depth accumulation as a [4, C] × [C, P] matmul on the MXU.
- per-chunk early-out: once every pixel's transmittance is below the 1e-4
  stop threshold, or the entry count is exhausted, remaining chunks are
  skipped (lax.cond), mirroring the CUDA reference's per-tile early
  termination.

Output is one [T, 8, P] buffer (rows: r, g, b, depth, T_final, pad) —
a single aligned store per tile.

Backward: `blend_pallas` is wrapped in jax.custom_vjp in tiled.py; the VJP
replays the mathematically identical jnp chunked blend under jax.vjp — same
semantics, XLA-compiled — so gradients stay exact while the forward runs at
kernel speed. A hand-written backward kernel is the next optimization.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .projection import ALPHA_MAX, ALPHA_MIN, T_EPS

ATTRS = 16   # attribute rows: mx,my,ca,cb,cc,r,g,b,op,depth,(pad)
CHUNK = 8
OUT_ROWS = 8  # r,g,b,depth,Tfinal,(pad)


def _blend_tile_kernel(meta_ref, ent_ref, out_ref, *, K: int, P: int,
                       tile_w: int):
    """One grid step = one tile. ent_ref: [1, K, ATTRS] VMEM;
    meta_ref: scalar-prefetch [T*4] int32 (count, origin_x, origin_y, pad)
    per tile; out_ref: [1, OUT_ROWS, P]."""
    from jax.experimental import pallas as pl

    t = pl.program_id(0)
    n = meta_ref[4 * t]
    ox = meta_ref[4 * t + 1].astype(jnp.float32)
    oy = meta_ref[4 * t + 2].astype(jnp.float32)
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    pxv = ox + (pidx % tile_w).astype(jnp.float32)   # [1, P]
    pyv = oy + (pidx // tile_w).astype(jnp.float32)

    acc0 = jnp.zeros((4, P), jnp.float32)   # r, g, b, depth
    tbuf0 = jnp.ones((1, P), jnp.float32)

    n_chunks = K // CHUNK

    def chunk_body(ci, carry):
        acc, tbuf = carry

        def do(carry):
            acc, tbuf = carry
            start = pl.multiple_of(ci * CHUNK, CHUNK)
            block = ent_ref[0, pl.ds(start, CHUNK), :]  # [CHUNK, ATTRS]
            mx = block[:, 0:1]                      # [C, 1]
            my = block[:, 1:2]
            ca = block[:, 2:3]
            cb = block[:, 3:4]
            cc = block[:, 4:5]
            op = block[:, 8:9]
            idxv = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
            evalid = (ci * CHUNK + idxv) < n

            dx = pxv - mx                           # [C, P]
            dy = pyv - my
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
            alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN) & evalid,
                              alpha, 0.0)

            # sequential front-to-back over the C=8 chunk, fully unrolled:
            # per-entry weight alpha_i * T_before, early-stop when the next
            # transmittance would cross T_EPS (CUDA reference semantics;
            # expressed without cumprod/reduce_prod, which Mosaic lacks)
            tb = tbuf                               # [1, P]
            w_rows = []
            for c in range(CHUNK):
                a = alpha[c:c + 1, :]
                tb_next = tb * (1.0 - a)
                keep = tb_next >= T_EPS
                w_rows.append(jnp.where(keep, a * tb, 0.0))
                tb = jnp.where(keep, tb_next, tb)
            w = jnp.concatenate(w_rows, axis=0)     # [C, P]

            attr = jnp.concatenate(
                [block[:, 5:8], block[:, 9:10]], axis=1)  # [C, 4]
            acc = acc + jax.lax.dot_general(
                attr, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [4, P]
            return acc, tb

        live = (ci * CHUNK < n) & (jnp.max(tbuf) >= T_EPS)
        return jax.lax.cond(live, do, lambda c: c, (acc, tbuf))

    acc, tbuf = jax.lax.fori_loop(0, n_chunks, chunk_body, (acc0, tbuf0))
    out = jnp.concatenate(
        [acc, tbuf, jnp.zeros((OUT_ROWS - 5, P), jnp.float32)], axis=0)
    out_ref[0, :, :] = out


def blend_tiles_pallas(ent: jax.Array, meta: jax.Array, *, tile_h: int,
                       tile_w: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """ent: [T, K, ATTRS] packed entry-major rows; meta: [T, 4] int32
    (count, origin_x, origin_y, pad). Returns (rgb [T,P,3], T_buf [T,P],
    dep [T,P])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, K, _ = ent.shape
    assert K % CHUNK == 0
    P = tile_h * tile_w

    kernel = functools.partial(_blend_tile_kernel, K=K, P=P, tile_w=tile_w)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, K, ATTRS), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, OUT_ROWS, P), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, OUT_ROWS, P), jnp.float32),
    )(meta.reshape(-1), ent)

    rgb = jnp.moveaxis(out[:, 0:3, :], 1, 2)   # [T, P, 3]
    dep = out[:, 3, :]
    tbuf = out[:, 4, :]
    return rgb, tbuf, dep


def _jnp_blend_from_ent(ent: jax.Array, meta: jax.Array, *, tile_h: int,
                        tile_w: int, chunk: int = 32):
    """Mathematically identical jnp blend over the packed entries — the
    custom-VJP backward path (and the interpret-mode oracle for the
    kernel)."""
    T, K, _ = ent.shape
    P = tile_h * tile_w
    tile_px = jnp.asarray(np.arange(P) % tile_w, jnp.float32)
    tile_py = jnp.asarray(np.arange(P) // tile_w, jnp.float32)
    pxv = meta[:, 1].astype(jnp.float32)[:, None] + tile_px[None, :]  # [T,P]
    pyv = meta[:, 2].astype(jnp.float32)[:, None] + tile_py[None, :]
    counts = meta[:, 0]

    C = min(chunk, K)
    n_chunks = K // C
    ent_c = ent.reshape(T, n_chunks, C, ATTRS)

    def body(carry, xs):
        acc, tbuf = carry
        blk, base = xs          # blk [T, C, ATTRS]
        mx = blk[:, :, 0][:, :, None]
        my = blk[:, :, 1][:, :, None]
        ca = blk[:, :, 2][:, :, None]
        cb = blk[:, :, 3][:, :, None]
        cc = blk[:, :, 4][:, :, None]
        op = blk[:, :, 8][:, :, None]
        idxv = base + jnp.arange(C, dtype=jnp.int32)[None, :]
        evalid = (idxv < counts[:, None])[:, :, None]

        dx = pxv[:, None, :] - mx           # [T, C, P]
        dy = pyv[:, None, :] - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN) & evalid,
                          alpha, 0.0)
        one_minus = 1.0 - alpha
        t_within = jnp.cumprod(one_minus, axis=1)
        t_excl = tbuf[:, None, :] * jnp.concatenate(
            [jnp.ones_like(t_within[:, :1]), t_within[:, :-1]], axis=1)
        t_after = tbuf[:, None, :] * t_within
        kept = t_after >= T_EPS
        w = jnp.where(kept, alpha * t_excl, 0.0)

        attr = jnp.concatenate([blk[:, :, 5:8], blk[:, :, 9:10]], axis=2)
        acc = acc + jnp.einsum("tcp,tca->tap", w, attr)
        tbuf = tbuf * jnp.prod(jnp.where(kept, one_minus, 1.0), axis=1)
        return (acc, tbuf), None

    init = (jnp.zeros((T, 4, P), jnp.float32), jnp.ones((T, P), jnp.float32))
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * C
    (acc, tbuf), _ = jax.lax.scan(
        jax.checkpoint(body), init,
        (jnp.moveaxis(ent_c, 1, 0), bases))
    rgb = jnp.moveaxis(acc[:, 0:3, :], 1, 2)
    dep = acc[:, 3, :]
    return rgb, tbuf, dep


def _make_blend_vjp(tile_h: int, tile_w: int):
    @jax.custom_vjp
    def blend(ent, meta):
        return blend_tiles_pallas(ent, meta, tile_h=tile_h, tile_w=tile_w)

    def fwd(ent, meta):
        return blend(ent, meta), (ent, meta)

    def bwd(res, cts):
        ent, meta = res
        _, vjp_fn = jax.vjp(
            lambda e: _jnp_blend_from_ent(e, meta, tile_h=tile_h,
                                          tile_w=tile_w), ent)
        (d_ent,) = vjp_fn(cts)
        d_meta = np.zeros(meta.shape, jax.dtypes.float0)
        return d_ent, d_meta

    blend.defvjp(fwd, bwd)
    return blend


_BLEND_CACHE = {}


def blend_pallas(ent, meta, tile_h: int, tile_w: int):
    key = (tile_h, tile_w)
    if key not in _BLEND_CACHE:
        _BLEND_CACHE[key] = _make_blend_vjp(tile_h, tile_w)
    return _BLEND_CACHE[key](ent, meta)


def pack_entries(means2d, conics, colors, opac, depths, gid, entry_valid,
                 ntx: int, tile_h: int, tile_w: int):
    """Gather per-gaussian attrs into the packed [T, ATTRS, K] layout
    (XLA gather — fast on TPU) + [T, 4] int32 meta."""
    T, K = gid.shape
    opac_e = jnp.where(entry_valid, jnp.take(opac, gid, axis=0), 0.0)
    rows = [
        jnp.take(means2d[:, 0], gid, axis=0),
        jnp.take(means2d[:, 1], gid, axis=0),
        jnp.take(conics[:, 0], gid, axis=0),
        jnp.take(conics[:, 1], gid, axis=0),
        jnp.take(conics[:, 2], gid, axis=0),
        jnp.take(colors[:, 0], gid, axis=0),
        jnp.take(colors[:, 1], gid, axis=0),
        jnp.take(colors[:, 2], gid, axis=0),
        opac_e,
        jnp.take(depths, gid, axis=0),
    ]
    ent = jnp.stack(
        rows + [jnp.zeros_like(rows[0])] * (ATTRS - len(rows)), axis=-1)
    counts = jnp.sum(entry_valid.astype(jnp.int32), axis=1)
    tid = jnp.arange(T, dtype=jnp.int32)
    meta = jnp.stack([counts,
                      (tid % ntx) * tile_w,
                      (tid // ntx) * tile_h,
                      jnp.zeros_like(tid)], axis=1)
    return ent, meta
