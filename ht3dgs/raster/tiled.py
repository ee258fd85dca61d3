"""Tile-binned Gaussian rasterizer in pure XLA (static shapes).

TPU-native re-design of the CUDA reference's tile pipeline (frustum cull →
duplicate-per-tile → radix sort by (tile, depth) → per-tile front-to-back
blend). XLA needs static shapes, so the dynamic duplication becomes a
fixed-capacity gather expansion:

1. depth-sort the Gaussians once (invalid → +inf, sorted last);
2. compute each Gaussian's tile-bbox span and an exclusive cumsum of spans;
3. expand into `M = dup_factor·N` static entry slots via searchsorted — slot
   m belongs to the Gaussian whose [offset, offset+span) interval contains m;
4. *stable* argsort entries by tile id — stability preserves the global depth
   order within each tile, exactly reproducing the CUDA (tile|depth) key sort;
5. per-tile segments located by searchsorted, padded to `max_per_tile` slots;
6. blend: a lax.scan over entry chunks with a [tiles, pixels] transmittance
   carry; the in-chunk sequential compositing is expressed with a cumulative
   product (same semantics as raster/reference.py, verified against it).

Everything is jnp gathers/where/cumprod, so JAX AD provides the backward
(gather VJP = scatter-add); the chunk body is rematerialized
(jax.checkpoint) to keep backward memory at O(tiles·pixels), not
O(entries·pixels). The Pallas kernels in pallas_blend.py replace stage 6 on
TPU for speed-of-light blending; this module remains the portable path and
the binning front-end.

Capacity overflow policy: entries beyond M or per-tile lists beyond
max_per_tile are dropped *farthest-first* (they are at the back of the
depth order, where transmittance has usually saturated); the returned
diagnostics let the host grow capacities if it matters.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from .projection import ALPHA_MAX, ALPHA_MIN, Projected, T_EPS


def _cdiv(a, b):
    return -(-a // b)


@partial(jax.checkpoint, static_argnums=())
def _blend_chunk(carry, chunk, tile_px, tile_py):
    """One chunk of entries for every tile.

    carry: (T_buf [T,P], rgb [T,P,3], dep [T,P])
    chunk: ids [T,C] into per-gaussian arrays + per-entry validity, plus the
           gathered per-gaussian attributes.
    """
    T_buf, rgb, dep = carry
    mm, con, col, op, gdep, evalid = chunk

    dx = tile_px[:, None, :] - mm[..., 0:1]          # [T, C, P]
    dy = tile_py[:, None, :] - mm[..., 1:2]
    a = con[..., 0:1]
    b = con[..., 1:2]
    c = con[..., 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op[..., None] * jnp.exp(power))
    alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN)
                      & evalid[..., None], alpha, 0.0)

    one_minus = 1.0 - alpha
    T_within = jnp.cumprod(one_minus, axis=1)        # [T, C, P]
    T_before = T_buf[:, None, :] * jnp.concatenate(
        [jnp.ones_like(T_within[:, :1]), T_within[:, :-1]], axis=1)
    T_after = T_buf[:, None, :] * T_within
    kept = T_after >= T_EPS
    w = jnp.where(kept, alpha * T_before, 0.0)

    rgb = rgb + jnp.einsum("tcp,tcd->tpd", w, col)
    dep = dep + jnp.sum(w * gdep[..., None], axis=1)
    T_buf = T_buf * jnp.prod(jnp.where(kept, one_minus, 1.0), axis=1)
    return (T_buf, rgb, dep), None


def rasterize_tiled(
    proj: Projected,
    height: int,
    width: int,
    bg_color: jax.Array,
    tile_h: int = 16,
    tile_w: int = 16,
    max_per_tile: int = 1024,
    dup_factor: int = 16,
    chunk: int = 32,
    backend: str = "xla",   # "xla" | "pallas" (TPU kernel forward)
) -> Dict[str, jax.Array]:
    N = proj.means2d.shape[0]
    ntx = _cdiv(width, tile_w)
    nty = _cdiv(height, tile_h)
    T = ntx * nty
    P = tile_h * tile_w
    M = N * dup_factor

    # ---- 1. depth order ---------------------------------------------------
    order = jnp.argsort(proj.depths)
    means2d = jnp.take(proj.means2d, order, axis=0)
    conics = jnp.take(proj.conics, order, axis=0)
    colors = jnp.take(proj.colors, order, axis=0)
    opac = jnp.take(proj.opacities, order, axis=0)
    depths = jnp.take(
        jnp.where(jnp.isfinite(proj.depths), proj.depths, 0.0), order, axis=0)
    radii = jnp.take(proj.radii, order, axis=0)
    valid = jnp.take(proj.valid, order, axis=0)

    # ---- 2. tile spans (CUDA getRect semantics) ---------------------------
    mx = means2d[:, 0]
    my = means2d[:, 1]
    r = radii.astype(means2d.dtype)
    x0 = jnp.clip(jnp.floor((mx - r) / tile_w), 0, ntx).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + r + tile_w - 1) / tile_w), 0, ntx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / tile_h), 0, nty).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((my + r + tile_h - 1) / tile_h), 0, nty).astype(jnp.int32)
    span_x = jnp.maximum(x1 - x0, 0)
    span = jnp.where(valid, span_x * jnp.maximum(y1 - y0, 0), 0)

    offs = jnp.cumsum(span) - span          # exclusive
    total = offs[-1] + span[-1]

    # ---- 3. static expansion ---------------------------------------------
    m = jnp.arange(M, dtype=jnp.int32)
    src = jnp.searchsorted(offs, m, side="right").astype(jnp.int32) - 1
    src = jnp.clip(src, 0, N - 1)
    local = m - jnp.take(offs, src)
    sx = jnp.maximum(jnp.take(span_x, src), 1)
    tx = jnp.take(x0, src) + local % sx
    ty = jnp.take(y0, src) + local // sx
    tile_id = ty * ntx + tx
    slot_ok = m < total
    tile_id = jnp.where(slot_ok, tile_id, T)  # sentinel sorts to the end

    # ---- 4. stable sort by tile (preserves depth order in ties) ----------
    perm = jnp.argsort(tile_id, stable=True)
    sorted_tile = jnp.take(tile_id, perm)
    sorted_src = jnp.take(src, perm)

    # ---- 5. per-tile padded lists ----------------------------------------
    tids = jnp.arange(T, dtype=sorted_tile.dtype)
    starts = jnp.searchsorted(sorted_tile, tids, side="left")
    ends = jnp.searchsorted(sorted_tile, tids, side="right")
    K = max_per_tile
    idx = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    entry_valid = idx < ends[:, None]
    gid = jnp.take(sorted_src, jnp.clip(idx, 0, M - 1))  # [T, K]

    # ---- 6. blend ---------------------------------------------------------
    if backend == "pallas":
        from .pallas_blend import blend_pallas, pack_entries

        ent, meta = pack_entries(means2d, conics, colors, opac, depths,
                                 gid, entry_valid, ntx, tile_h, tile_w)
        rgb_t, T_t, dep_t = blend_pallas(ent, meta, tile_h, tile_w)
        return _assemble(rgb_t, T_t, dep_t, height, width, ntx, nty,
                         tile_h, tile_w, bg_color, total, M, starts, ends, K)

    tx_of_tile = (jnp.arange(T, dtype=jnp.int32) % ntx)
    ty_of_tile = (jnp.arange(T, dtype=jnp.int32) // ntx)
    p = jnp.arange(P, dtype=jnp.int32)
    dtype = means2d.dtype
    tile_px = (tx_of_tile[:, None] * tile_w + p[None, :] % tile_w).astype(dtype)
    tile_py = (ty_of_tile[:, None] * tile_h + p[None, :] // tile_w).astype(dtype)

    C = min(chunk, K)
    n_chunks = _cdiv(K, C)
    pad = n_chunks * C - K
    if pad:
        gid = jnp.pad(gid, ((0, 0), (0, pad)))
        entry_valid = jnp.pad(entry_valid, ((0, 0), (0, pad)))
    gid_c = gid.reshape(T, n_chunks, C).transpose(1, 0, 2)
    ev_c = entry_valid.reshape(T, n_chunks, C).transpose(1, 0, 2)

    def scan_body(carry, xs):
        ids, ev = xs
        chunk_data = (
            jnp.take(means2d, ids, axis=0),
            jnp.take(conics, ids, axis=0),
            jnp.take(colors, ids, axis=0),
            jnp.take(opac, ids, axis=0),
            jnp.take(depths, ids, axis=0),
            ev,
        )
        return _blend_chunk(carry, chunk_data, tile_px, tile_py)

    init = (
        jnp.ones((T, P), dtype),
        jnp.zeros((T, P, 3), dtype),
        jnp.zeros((T, P), dtype),
    )
    (T_buf, rgb, dep), _ = jax.lax.scan(scan_body, init, (gid_c, ev_c))
    return _assemble(rgb, T_buf, dep, height, width, ntx, nty, tile_h,
                     tile_w, bg_color, total, M, starts, ends, K)


def _assemble(rgb, T_buf, dep, height, width, ntx, nty, tile_h, tile_w,
              bg_color, total, M, starts, ends, K) -> Dict[str, jax.Array]:
    def untile(x, ch=None):
        shape = (nty, ntx, tile_h, tile_w) + ((ch,) if ch else ())
        x = x.reshape(shape)
        x = jnp.moveaxis(x, 2, 1)  # [nty, th, ntx, tw, (ch)]
        x = x.reshape((nty * tile_h, ntx * tile_w) + ((ch,) if ch else ()))
        return x[:height, :width]

    image = untile(rgb, 3) + untile(T_buf)[..., None] * bg_color[None, None, :]
    n_dropped_global = jnp.maximum(total - M, 0)
    n_dropped_tiles = jnp.sum(jnp.maximum(ends - starts - K, 0))
    return {
        "image": jnp.clip(image, 0.0, 1.0),
        "depth": untile(dep),
        "alpha": 1.0 - untile(T_buf),
        "n_entries": total,
        "n_dropped": n_dropped_global + n_dropped_tiles,
    }
