"""Tile-binned Gaussian rasterizer in pure XLA (static shapes).

TPU-native re-design of the CUDA reference's tile pipeline (frustum cull →
duplicate-per-tile → radix sort by (tile, depth) → per-tile front-to-back
blend). XLA needs static shapes, so the dynamic duplication becomes a
fixed-capacity expansion, engineered around TPU's strengths/weaknesses
(sorts are fine, random scalar gathers and large searchsorted queries are
not — measured on v5e):

1. pack all per-Gaussian attributes into one [N, 16] row table (means2d,
   conic, color, opacity, depth, radius, valid) so every later reorder is a
   single contiguous row gather;
2. depth-sort once (argsort over N);
3. compute tile-bbox spans + exclusive cumsum; expand into `M = dup_factor·N`
   entry slots — slot→gaussian mapping via a boundary scatter-max +
   cummax (O(M), no searchsorted over M);
4. *stable* argsort entries by tile id (stability preserves the global depth
   order within each tile, exactly reproducing the CUDA (tile|depth) sort);
5. per-tile segments located by a tiny searchsorted (T queries), padded to
   `max_per_tile` slots; one row gather builds the packed per-tile entry
   blocks [T, K, 16] consumed by the blend;
6. blend: either the Pallas TPU kernel (pallas_blend) or the batched-XLA
   scan (same module) — identical semantics, verified against the oracle.

Capacity overflow policy: entries beyond M or per-tile lists beyond
max_per_tile are dropped *farthest-first* (back of the depth order, where
transmittance has usually saturated); diagnostics let the host grow
capacities when it matters.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .pallas_blend import (ATTRS, _jnp_blend_from_ent, blend_pallas,
                           blend_xla)
from .projection import Projected


def _cdiv(a, b):
    return -(-a // b)


def _pack_attr_rows(proj: Projected) -> jax.Array:
    """[N, 16]: mx, my, ca, cb, cc, r, g, b, op, depth, radius, pad..."""
    depths = jnp.where(jnp.isfinite(proj.depths), proj.depths, 0.0)
    cols = [
        proj.means2d[:, 0], proj.means2d[:, 1],
        proj.conics[:, 0], proj.conics[:, 1], proj.conics[:, 2],
        proj.colors[:, 0], proj.colors[:, 1], proj.colors[:, 2],
        proj.opacities, depths,
        proj.radii.astype(proj.means2d.dtype),
    ]
    n = proj.means2d.shape[0]
    pad = [jnp.zeros((n,), proj.means2d.dtype)] * (ATTRS - len(cols))
    return jnp.stack(cols + pad, axis=-1)


def build_tile_lists(
    proj: Projected,
    height: int,
    width: int,
    tile_h: int = 16,
    tile_w: int = 16,
    max_per_tile: int = 1024,
    dup_factor: int = 16,
):
    """Binning stages 1-5: packed per-tile entry blocks + meta.

    Returns (ent [T,K,16], meta [T,4] int32, total, n_dropped)."""
    return build_tile_lists_from_rows(
        _pack_attr_rows(proj), proj.valid, proj.depths, height, width,
        tile_h=tile_h, tile_w=tile_w, max_per_tile=max_per_tile,
        dup_factor=dup_factor)


def build_tile_lists_from_rows(
    attrs: jax.Array,        # [N, 16] packed rows (_pack_attr_rows layout)
    valid: jax.Array,        # [N] bool
    depths: jax.Array,       # [N]; +inf for invalid rows (sort key)
    height: int,
    width: int,
    tile_h: int = 16,
    tile_w: int = 16,
    max_per_tile: int = 1024,
    dup_factor: int = 16,
):
    """Row-table flavor of the binning front-end: consumes pre-packed
    attribute rows (e.g. the all-gathered frustum survivors of a
    range-partitioned Gaussian set — parallel.gauss_shard) instead of a
    Projected. Semantically identical to `build_tile_lists`."""
    N = attrs.shape[0]
    ntx = _cdiv(width, tile_w)
    nty = _cdiv(height, tile_h)
    T = ntx * nty
    M = N * dup_factor

    # ---- 1-2. depth order --------------------------------------------------
    order = jnp.argsort(depths)  # invalid have depth=+inf -> last
    attrs = jnp.take(attrs, order, axis=0)       # single row gather
    valid = jnp.take(valid, order, axis=0)

    # ---- 3. tile spans (CUDA getRect semantics) + O(M) expansion ----------
    mx = attrs[:, 0]
    my = attrs[:, 1]
    r = attrs[:, 10]
    x0 = jnp.clip(jnp.floor((mx - r) / tile_w), 0, ntx).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + r + tile_w - 1) / tile_w), 0, ntx
                  ).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / tile_h), 0, nty).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((my + r + tile_h - 1) / tile_h), 0, nty
                  ).astype(jnp.int32)
    span_x = jnp.maximum(x1 - x0, 0)
    span = jnp.where(valid, span_x * jnp.maximum(y1 - y0, 0), 0)

    offs = jnp.cumsum(span) - span          # exclusive
    total = offs[-1] + span[-1]

    # slot -> source gaussian: scatter each segment start into its slot and
    # forward-fill with a cumulative max (gather-free, O(M))
    has = (span > 0) & (offs < M)
    seg_mark = jnp.zeros((M,), jnp.int32).at[
        jnp.where(has, offs, M - 1)
    ].max(jnp.where(has, jnp.arange(N, dtype=jnp.int32) + 1, 0))
    src = jnp.clip(jax.lax.cummax(seg_mark) - 1, 0, N - 1)

    # per-entry tile coordinates (4 small row-gathers fused into one).
    # TPU has no hardware integer division — local//sx over M entries is
    # pathologically slow — so the quotient is computed in f32 with a +0.5
    # bias (exact for local < 2^22 and the rounding margin 0.5/sx >> f32 eps)
    geo = jnp.stack([x0, y0, span_x, offs], axis=-1)      # [N, 4] int32
    geo_e = jnp.take(geo, src, axis=0)                    # [M, 4]
    m = jnp.arange(M, dtype=jnp.int32)
    local = m - geo_e[:, 3]
    sx = jnp.maximum(geo_e[:, 2], 1)
    q = jnp.floor((local.astype(jnp.float32) + 0.5)
                  / sx.astype(jnp.float32)).astype(jnp.int32)
    rem = local - q * sx
    tx = geo_e[:, 0] + rem
    ty = geo_e[:, 1] + q
    tile_id = jnp.where(m < total, ty * ntx + tx, T)  # sentinel -> end

    # ---- 4. stable sort by tile (preserves depth order in ties) ----------
    # multi-operand lax.sort co-sorts src with the keys in one pass —
    # measurably cheaper than argsort + two 1.6M random gathers on TPU
    sorted_tile, sorted_src = jax.lax.sort(
        (tile_id, src), num_keys=1, is_stable=True)

    # ---- 5. per-tile padded lists -----------------------------------------
    tids = jnp.arange(T, dtype=sorted_tile.dtype)
    starts = jnp.searchsorted(sorted_tile, tids, side="left")
    ends = jnp.searchsorted(sorted_tile, tids, side="right")
    K = max_per_tile
    idx = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    entry_valid = idx < ends[:, None]
    gid = jnp.take(sorted_src, jnp.clip(idx, 0, M - 1))   # [T, K]

    counts = jnp.sum(entry_valid.astype(jnp.int32), axis=1)
    tid = jnp.arange(T, dtype=jnp.int32)
    meta = jnp.stack([counts, (tid % ntx) * tile_w, (tid // ntx) * tile_h,
                      jnp.zeros_like(tid)], axis=1)

    # XLA blends consume only the first 10 attribute columns; gathering
    # (and, in backward, scattering) the 6 pad lanes wastes ~38% of the
    # entry traffic. The Pallas kernel path re-pads to 16 for alignment.
    ent = jnp.take(attrs[:, :10], gid, axis=0)            # [T, K, 10]
    n_dropped = (jnp.maximum(total - M, 0)
                 + jnp.sum(jnp.maximum(ends - starts - K, 0)))
    return ent, meta, total, n_dropped


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
    backend: str = "xla",   # "xla" | "xla_analytic" | "pallas"
) -> Dict[str, jax.Array]:
    ntx = _cdiv(width, tile_w)
    nty = _cdiv(height, tile_h)
    ent, meta, total, n_dropped = build_tile_lists(
        proj, height, width, tile_h, tile_w, max_per_tile, dup_factor)

    # ---- 6. blend ---------------------------------------------------------
    # default "xla": AD-differentiated log-space scan (fastest measured:
    # 188ms fwd+bwd vs 205ms for the analytic VJP at 100k/960x544 — the
    # log-space cumsum transpose beats two analytic forward replays).
    # "xla_analytic" keeps the closed-form VJP exercised: it is the
    # blueprint for the future Pallas backward kernel.
    if backend == "pallas":
        ent16 = jnp.pad(ent, ((0, 0), (0, 0), (0, ATTRS - ent.shape[-1])))
        rgb_t, T_t, dep_t = blend_pallas(ent16, meta, tile_h, tile_w)
    elif backend == "xla_analytic":
        rgb_t, T_t, dep_t = blend_xla(ent, meta, tile_h, tile_w)
    elif backend == "xla_early":
        from .pallas_blend import blend_xla_early

        rgb_t, T_t, dep_t = blend_xla_early(ent, meta, tile_h, tile_w)
    else:
        rgb_t, T_t, dep_t = _jnp_blend_from_ent(
            ent, meta, tile_h=tile_h, tile_w=tile_w, chunk=chunk)

    return _assemble(rgb_t, T_t, dep_t, height, width, ntx, nty, tile_h,
                     tile_w, bg_color, total, n_dropped)


def rasterize_from_rows(
    attrs: jax.Array,
    valid: jax.Array,
    depths: jax.Array,
    height: int,
    width: int,
    bg_color: jax.Array,
    tile_h: int = 16,
    tile_w: int = 16,
    max_per_tile: int = 1024,
    dup_factor: int = 16,
    chunk: int = 32,
    backend: str = "pallas",
) -> Dict[str, jax.Array]:
    """rasterize_tiled over a pre-packed row table (gauss_shard path)."""
    ntx = _cdiv(width, tile_w)
    nty = _cdiv(height, tile_h)
    ent, meta, total, n_dropped = build_tile_lists_from_rows(
        attrs, valid, depths, height, width, tile_h, tile_w, max_per_tile,
        dup_factor)
    if backend == "pallas":
        ent16 = jnp.pad(ent, ((0, 0), (0, 0), (0, ATTRS - ent.shape[-1])))
        rgb_t, T_t, dep_t = blend_pallas(ent16, meta, tile_h, tile_w)
    elif backend == "xla_early":
        from .pallas_blend import blend_xla_early

        rgb_t, T_t, dep_t = blend_xla_early(ent, meta, tile_h, tile_w)
    else:
        rgb_t, T_t, dep_t = _jnp_blend_from_ent(
            ent, meta, tile_h=tile_h, tile_w=tile_w, chunk=chunk)
    return _assemble(rgb_t, T_t, dep_t, height, width, ntx, nty, tile_h,
                     tile_w, bg_color, total, n_dropped)


def _assemble(rgb, T_buf, dep, height, width, ntx, nty, tile_h, tile_w,
              bg_color, total, n_dropped) -> Dict[str, jax.Array]:
    def untile(x, ch=None):
        shape = (nty, ntx, tile_h, tile_w) + ((ch,) if ch else ())
        x = x.reshape(shape)
        x = jnp.moveaxis(x, 2, 1)  # [nty, th, ntx, tw, (ch)]
        x = x.reshape((nty * tile_h, ntx * tile_w) + ((ch,) if ch else ()))
        return x[:height, :width]

    image = untile(rgb, 3) + untile(T_buf)[..., None] * bg_color[None, None, :]
    return {
        "image": jnp.clip(image, 0.0, 1.0),
        "depth": untile(dep),
        "alpha": 1.0 - untile(T_buf),
        "n_entries": total,
        "n_dropped": n_dropped,
    }
