"""Tile-binned Gaussian rasterizer in pure XLA (static shapes).

TPU-native re-design of the CUDA reference's tile pipeline (frustum cull →
duplicate-per-tile → radix sort by (tile, depth) → per-tile front-to-back
blend). XLA needs static shapes, so the dynamic duplication becomes a
fixed-capacity expansion, engineered around TPU's strengths/weaknesses
(sorts are fine, random scalar gathers and large searchsorted queries are
not — measured on v5e):

1. pack all per-Gaussian attributes into one [N, 16] row table (means2d,
   conic, color, opacity, depth, tight per-axis extents) so every later
   reorder is a single contiguous row gather;
2. depth-sort once (argsort over N);
3. compute tile-bbox spans + exclusive cumsum; expand into `M = dup_factor·N`
   entry slots — slot→gaussian mapping via a boundary scatter-max +
   blocked forward-fill (O(M), no searchsorted over M), carrying ORIGINAL
   row ids so nothing downstream ever un-sorts;
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
import numpy as np

from .pallas_blend import (ATTRS, _jnp_blend_from_ent, blend_pallas,
                           blend_xla)
from .projection import Projected


def _cdiv(a, b):
    return -(-a // b)


def _seg_ffill(key: jax.Array, pb: int) -> jax.Array:
    """Inclusive segmented forward-fill of sparse payloads, gather-free.

    key [L] int32: 0 at empty positions, else a NONZERO payload in the low
    `pb` bits at set positions. Returns, per position, the payload of the
    latest set position <= it (0 before the first).

    Built from blocked `lax.cummax` only: within a block of B = 2^(30-pb)
    positions the (local_index+1 << pb | payload) key is monotone in
    position, so one axis-1 cummax forward-fills it; block carries recurse
    on the per-block summaries. All ops are dense reshapes/cummax — unlike
    `lax.associative_scan`, whose strided-slice recursion is both slow to
    compile (minutes on the remote TPU service at L=16M) and strided-access
    hostile to the VPU."""
    L = key.shape[0]
    mask = (1 << pb) - 1
    B = 1 << (30 - pb)
    if L <= B:
        pos = jnp.arange(L, dtype=jnp.int32) + 1
        k = jnp.where(key != 0, (pos << pb) | (key & mask), 0)
        return jax.lax.cummax(k) & mask
    nb = _cdiv(L, B)
    kp = jnp.pad(key, (0, nb * B - L)).reshape(nb, B)
    local = (jnp.arange(B, dtype=jnp.int32) + 1)[None, :]
    c1 = jax.lax.cummax(
        jnp.where(kp != 0, (local << pb) | (kp & mask), 0), axis=1)
    carry = _seg_ffill(c1[:, -1] & mask, pb)
    carry = jnp.concatenate([jnp.zeros((1,), jnp.int32), carry[:-1]])
    out = jnp.where(c1 != 0, c1 & mask, carry[:, None])
    return out.reshape(nb * B)[:L]


def _seg_ffill_pos(key: jax.Array, pb: int):
    """`_seg_ffill` that ALSO returns, per position, the 1-based GLOBAL
    index of the set position each payload came from (0 before the first).
    Single-channel view of `_seg_ffill2_pos` (one implementation; the
    unit test pins both through this entry point)."""
    vals, poss = _seg_ffill2_pos(key[None, :], pb)
    return vals[0], poss[0]


def _seg_ffill2_pos(keys: jax.Array, pb: int):
    """Two-channel `_seg_ffill_pos`: keys [C, L] share one blocked-cummax
    dispatch (the fills stage runs two fills over the same segment starts —
    src ids and packed geometry — so batching them halves the number of
    full-length scan kernels). Returns (vals [C, L], pos [C, L])."""
    C, L = keys.shape
    mask = (1 << pb) - 1
    B = 1 << (30 - pb)
    nb = _cdiv(L, B)
    kp = jnp.pad(keys, ((0, 0), (0, nb * B - L))).reshape(C, nb, B)
    local = (jnp.arange(B, dtype=jnp.int32) + 1)[None, None, :]
    c1 = jax.lax.cummax(
        jnp.where(kp != 0, (local << pb) | (kp & mask), 0), axis=2)
    last = c1[:, :, -1]                                   # [C, nb]
    cb = jax.lax.cummax(jnp.where(
        last != 0, (jnp.arange(nb, dtype=jnp.int32) + 1)[None, :], 0),
        axis=1)
    cb_prev = jnp.concatenate(
        [jnp.zeros((C, 1), jnp.int32), cb[:, :-1]], axis=1)
    src_blk = jnp.maximum(cb_prev - 1, 0)
    carry_last = jnp.take_along_axis(last, src_blk, axis=1)
    carry_val = jnp.where(cb_prev > 0, carry_last & mask, 0)
    carry_pos = jnp.where(cb_prev > 0,
                          src_blk * B + (carry_last >> pb), 0)
    blk_base = (jnp.arange(nb, dtype=jnp.int32) * B)[None, :, None]
    val = jnp.where(c1 != 0, c1 & mask, carry_val[:, :, None])
    pos = jnp.where(c1 != 0, blk_base + (c1 >> pb),
                    carry_pos[:, :, None])
    return (val.reshape(C, nb * B)[:, :L],
            pos.reshape(C, nb * B)[:, :L])


def _pack_attr_rows(proj: Projected) -> jax.Array:
    """[N, 16]: mx, my, ca, cb, cc, r, g, b, op, depth, ex, ey, pad..."""
    depths = jnp.where(jnp.isfinite(proj.depths), proj.depths, 0.0)
    cols = [
        proj.means2d[:, 0], proj.means2d[:, 1],
        proj.conics[:, 0], proj.conics[:, 1], proj.conics[:, 2],
        proj.colors[:, 0], proj.colors[:, 1], proj.colors[:, 2],
        proj.opacities, depths,
        proj.extents[:, 0], proj.extents[:, 1],
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
    route_bf16: bool = False,
    compact_n: int | None = None,
):
    """Binning stages 1-5: packed per-tile entry blocks + meta.

    Returns (ent [T,K,16], meta [T,4] int32, total, n_dropped_m,
    n_dropped_tile, n_dropped_compact) — the overflow diagnostics are
    separate so the trainer's auto-grow can widen only the exhausted
    capacity (dup_factor for global M overflow, max_per_tile for per-tile
    overflow, compact_n for cull-compaction overflow)."""
    return build_tile_lists_from_rows(
        _pack_attr_rows(proj), proj.valid, proj.depths, height, width,
        tile_h=tile_h, tile_w=tile_w, max_per_tile=max_per_tile,
        dup_factor=dup_factor, route_bf16=route_bf16, compact_n=compact_n)


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
    route_bf16: bool = False,
    compact_n: int | None = None,
):
    """Row-table flavor of the binning front-end: consumes pre-packed
    attribute rows (e.g. the all-gathered frustum survivors of a
    range-partitioned Gaussian set — parallel.gauss_shard) instead of a
    Projected. Semantically identical to `build_tile_lists`.

    Differentiable w.r.t. `attrs` through a custom VJP: the cotangent of the
    binning is a per-Gaussian segment-sum of entry cotangents, which XLA
    would execute as a serial scatter-add (~680 ms at 1M Gaussians / 1080p
    on v5e). The custom backward instead routes the compacted [T*K] entry
    cotangents to per-gaussian groups with ONE multi-payload lax.sort
    (key = the original gaussian id of each entry, free from the forward's
    slice) and segment-sums with a cumsum + boundary difference — several
    times faster, identical up to f32 cumsum rounding.

    route_bf16=True quantizes the entry cotangents to bfloat16 and packs
    them pairwise into int32 sort payloads (6 sort operands instead of 11;
    lax.sort cost is per operand). Per-entry gradient error ~0.4% before
    the f32 segment sums — below the CUDA reference's own atomic-order
    run-to-run noise, but opt-in so exact f32 routing stays the default.

    compact_n: cull-compact the depth-sorted live rows to this static
    capacity BEFORE the expansion — the depth co-sort already parks
    zero-span rows (culled, or outside this camera's tile grid) at the
    end, so compaction is a free slice of the sorted payloads. Under tile
    sharding each chip renders a row-block camera whose tile grid rejects
    every Gaussian outside its block, so with compact_n ~= N/n_tiles the
    M-sized fills, the [M] tile sort and the expansion all shrink
    n_tiles-fold per chip (the round-4 36 ms N-bound floor,
    tools/pod_scaling_probe.py). Live rows beyond compact_n drop
    farthest-first (depth order), reported as n_dropped_compact."""
    key = (height, width, tile_h, tile_w, max_per_tile, dup_factor,
           bool(route_bf16), attrs.shape[0],
           int(compact_n) if compact_n else 0)
    if key not in _BINNING_CACHE:
        _BINNING_CACHE[key] = _make_binning_vjp(*key)
    return _BINNING_CACHE[key](attrs, valid, depths)


_BINNING_CACHE = {}


def _binning_impl(attrs, valid, depths, height, width, tile_h, tile_w,
                  max_per_tile, dup_factor, compact_n, want_res: bool):
    """Binning stages 1-5. With want_res=True additionally returns the int
    residuals consumed by the custom backward."""
    N = attrs.shape[0]
    ntx = _cdiv(width, tile_w)
    nty = _cdiv(height, tile_h)
    T = ntx * nty
    Nc = min(compact_n, N) if compact_n else N
    # fractional dup_factor allowed: M tracks the TRUE total entry count
    # (n_entries diagnostic), not a per-row worst case — the fills and the
    # [M] tile sort are M-bound, so e.g. dup 1.3 vs 2 cuts them ~35%
    M = max(int(round(Nc * dup_factor)), 1)

    # ---- 1-3. tile spans (getRect semantics, per-axis tight extents) ------
    # ex/ey are the exact alpha>=1/255 support bbox (projection.py), so the
    # rect is tighter than the CUDA reference's isotropic radius square but
    # covers every tile that can receive a nonzero sample or gradient.
    # Spans/geometry are computed in ORIGINAL row order (cheap elementwise),
    # then only the two ints the expansion needs are routed through the
    # depth order with one packed pair-table gather — gathers cost per
    # *index*, so one [N,2] row take beats taking the [N,16] attr rows plus
    # the valid column (and the attr table stays unsorted, which makes the
    # stage-5 gather and the whole backward original-indexed: no
    # un-depth-sort permutation anywhere).
    mx = attrs[:, 0]
    my = attrs[:, 1]
    ex = attrs[:, 10]
    ey = attrs[:, 11]
    x0 = jnp.clip(jnp.floor((mx - ex) / tile_w), 0, ntx).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + ex + tile_w - 1) / tile_w), 0, ntx
                  ).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - ey) / tile_h), 0, nty).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((my + ey + tile_h - 1) / tile_h), 0, nty
                  ).astype(jnp.int32)
    span_x = jnp.maximum(x1 - x0, 0)
    span_y = jnp.maximum(y1 - y0, 0)
    span0 = jnp.where(valid, span_x * span_y, 0)

    bits = max(int(ntx).bit_length(), int(nty).bit_length())
    assert 3 * bits <= 27, f"tile grid {ntx}x{nty} overflows payload packing"
    # span_x >= 1 wherever span0 > 0, so the packed payload is nonzero there
    packed3 = (((x0 << bits) | y0) << bits) | span_x

    # depth sort carrying (original id, packed rect, span) as sort payloads —
    # one multi-operand lax.sort beats argsort (itself a 2-operand sort) plus
    # a [N,2] row gather at the sorted order: gathers cost ~11 ns/index on
    # v5e while an extra sort operand costs ~1.6 ns/row. When the tile grid
    # fits (4*bits <= 31, i.e. up to ~2K-resolution grids at 16px tiles),
    # span_y rides INSIDE the packed payload and the sort drops to 3
    # operands (span = sx*sy decoded post-sort; the fills only consume the
    # 3-field packed geometry, so the extra field is stripped before the
    # scatter and nothing downstream changes). r5 measured: -1.2 ms at the
    # 1M bench point, and ~6% of the pod H/8 block step where the O(N)
    # co-sort is the dominant non-dividing term.
    # Zero-span gaussians sort to the END (key = +inf like culled rows):
    # they emit no entries, so this is semantics-free, it makes offs
    # STRICTLY increasing over the live prefix, and it is what makes the
    # compact_n cull-compaction below a free slice.
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
    dkey = jnp.where(span0 > 0, depths, jnp.inf)
    if 4 * bits <= 31:
        # validity folds into the packed span_y so the decoded product
        # reproduces span0 exactly (invalid rows decode to span 0)
        packed0 = (packed3 << bits) | jnp.where(valid, span_y, 0)
        _, order, packed_sy = jax.lax.sort(
            (dkey, iota_n, packed0), num_keys=1, is_stable=True)
        mask_b = (1 << bits) - 1
        span = ((packed_sy >> bits) & mask_b) * (packed_sy & mask_b)
        packed_d = packed_sy >> bits
    else:
        _, order, packed_d, span = jax.lax.sort(
            (dkey, iota_n, packed3, span0), num_keys=1, is_stable=True)

    if Nc < N:
        # cull-compaction: zero-span rows sorted to the end, so the live
        # set is the leading prefix — a free static slice. Live rows past
        # Nc (depth-farthest) drop; their would-be entries are counted.
        # NEGATIVE RESULT (r5, measured on v5e): compacting BEFORE the
        # sort with a cumsum mask-scatter into [Nc] buffers (4 hinted
        # masked stores, then a 4-op sort over only Nc rows) LOSES badly —
        # culled H/2 block step 52.9 -> 76.2 ms; XLA's scatter lowering
        # dominates. The depth co-sort over N + free slice stands.
        total_all = jnp.sum(span0)
        order, packed_d, span = order[:Nc], packed_d[:Nc], span[:Nc]

    offs = jnp.cumsum(span) - span          # exclusive
    total = offs[-1] + span[-1]
    nd_compact = total_all - total if Nc < N else jnp.asarray(0, jnp.int32)

    # slot -> (source gaussian, tile id): scatter each segment start into
    # its slot and forward-fill (gather-free, O(M), _seg_ffill), carrying
    # ORIGINAL row ids, so every downstream consumer (ent gather, backward
    # segment sums) indexes the unsorted attr table directly: no
    # un-depth-sort permutation anywhere.
    # (A Pallas merge-kernel expansion — one sequential pass over the M
    # slots against the depth-sorted table — was built, tested, and
    # benchmarked in rounds 3-4: 26 ms vs 21 ms for this XLA chain at
    # M=4M on v5e (~20% VPU efficiency on its [L, W] compare/dot volume).
    # Deleted in round 5 after losing twice; see git history
    # raster/pallas_binfill.py if a future toolchain reopens the gap.)
    m = jnp.arange(M, dtype=jnp.int32)
    pb = max(int(N).bit_length(), 1)
    assert pb <= 27, f"capacity {N} overflows the ffill payload"
    # `offs` is strictly increasing over the has-prefix (span >= 1,
    # zero-span/culled rows depth-sort to the end), so the segment
    # starts scatter at sorted unique in-bounds targets — the hints
    # turn XLA's serial scatter into a vectorized masked store, and
    # out-of-range rows are dropped instead of parked at M-1
    has = (span > 0) & (offs < M)
    tgt = jnp.where(has, offs, M)
    # HT3DGS_PLAIN_SCATTER=1 drops the sorted/unique hints (A/B lever:
    # scatter lowering differs per backend/toolchain).
    # NOTE on the hints' contract: in-bounds targets are sorted and
    # unique, but every dropped row shares tgt == M, and duplicate
    # out-of-range indices under mode='drop' with unique_indices=True
    # are not covered by the XLA scatter spec. Current lowerings drop
    # them before the uniqueness assumption matters; any new
    # backend/toolchain must be gated through `bench.py --validate`,
    # which diff-checks this path against the hint-free
    # (HT3DGS_PLAIN_SCATTER=1) graph on device.
    import os as _os
    _hints = _os.environ.get("HT3DGS_PLAIN_SCATTER", "0") != "1"
    _kw = (dict(indices_are_sorted=True, unique_indices=True)
           if _hints else {})
    # NEGATIVE RESULT (r5, measured): fusing these two scatters into ONE
    # [2, M] columns-scatter wins isolated (49.7 vs 55.6 ms at N=1M) but
    # regresses the FUSED train step 22.1 -> 15.8 MP/s — the 2-D scatter
    # breaks XLA's masked-store lowering of the 1-D hinted pattern. Two
    # separate [M] scatters stand (isolated micro-benchmarks mislead on
    # TPU, in both directions).
    starts_src = jnp.zeros((M,), jnp.int32).at[tgt].set(
        order + 1, mode="drop", **_kw)
    # per-entry tile geometry, gather-free: forward-fill (x0, y0,
    # span_x) bit-packed into one payload (each < 2^bits; 3*bits <= 27
    # holds to ~8K resolutions) from each segment start via the
    # blocked-cummax fill
    starts_pay = jnp.zeros((M,), jnp.int32).at[tgt].set(
        packed_d, mode="drop", **_kw)
    # the src fill also yields each entry's segment-start POSITION
    # (one blocked cummax carries both), replacing the old separate
    # change-detect + cummax chain for `local`; both channels (src ids
    # + packed geometry) share one batched scan dispatch
    pb2 = max(pb, 3 * bits)
    vals, poss = _seg_ffill2_pos(
        jnp.stack([starts_src, starts_pay]), pb2)
    src = jnp.clip(vals[0] - 1, 0, N - 1)
    pay_ff = vals[1]
    pos_ff = poss[0]
    local = m - (pos_ff - 1)
    mask = (1 << bits) - 1
    sx = jnp.maximum(pay_ff & mask, 1)
    # TPU has no hardware integer division — local//sx over M entries
    # is pathologically slow — so the quotient is computed in f32 with
    # a +0.5 bias (exact for local < 2^22; margin 0.5/sx >> f32 eps)
    q = jnp.floor((local.astype(jnp.float32) + 0.5)
                  / sx.astype(jnp.float32)).astype(jnp.int32)
    rem = local - q * sx
    tx = (pay_ff >> (2 * bits)) + rem
    ty = ((pay_ff >> bits) & mask) + q
    tile_id = jnp.where(m < total, ty * ntx + tx, T)  # sentinel -> end

    # ---- 4. stable sort by tile (preserves depth order in ties) ----------
    # multi-operand lax.sort co-sorts src with the keys in one pass —
    # measurably cheaper than argsort + two random gathers on TPU.
    sorted_tile, sorted_src = jax.lax.sort(
        (tile_id, src), num_keys=1, is_stable=True)

    # ---- 5. per-tile padded lists -----------------------------------------
    tids = jnp.arange(T, dtype=sorted_tile.dtype)
    starts = jnp.searchsorted(sorted_tile, tids, side="left")
    ends = jnp.searchsorted(sorted_tile, tids, side="right")
    K = max_per_tile

    counts = jnp.minimum(ends - starts, K)
    tid = jnp.arange(T, dtype=jnp.int32)
    meta = jnp.stack([counts, (tid % ntx) * tile_w, (tid // ntx) * tile_h,
                      jnp.zeros_like(tid)], axis=1)

    # Entry blocks: per-tile segments are CONTIGUOUS in the sorted array, so
    # the per-tile gaussian ids come from one contiguous K-slice of
    # sorted_src per tile (cheap, bandwidth-bound) and the entries from ONE
    # row-gather of the [N,10] attr table at those T*K indices. TPU gathers
    # cost per *index* (~7.5 ns from a VMEM-cacheable table), so gathering
    # at the [T*K] kept set (~8.35M at the bench workload) beats both the
    # old [T,K] double gather (2x indices + searchsorted-adjacent work,
    # 285 ms) and an [M]-index sorted-order materialization (~108 ms).
    # Rows past a tile's count alias the next tile's segment; every blend
    # backend masks by meta counts. XLA blends consume only the first 10
    # attribute columns; moving the 6 pad lanes would waste ~38% of the
    # traffic (the Pallas kernel path re-pads to 16 for alignment).
    src_pad = jnp.concatenate([sorted_src, jnp.zeros((K,), jnp.int32)])
    # NOTE r4: a flat [T*K] jnp.take looked 2x cheaper than these vmapped
    # slices in ISOLATION (9.9 vs 19.7 ms) but regressed the fused step
    # 22.4 -> 19.6 MP/s — XLA fuses the slice loop into the downstream
    # consumers while the gather materializes. Keep the slices.
    csrc = jax.vmap(
        lambda s: jax.lax.dynamic_slice(src_pad, (s,), (K,)))(
            jnp.minimum(starts, M))                        # [T, K]
    ent = jnp.take(attrs[:, :10], csrc, axis=0)            # [T, K, 10]
    nd_m = jnp.maximum(total - M, 0)
    nd_tile = jnp.sum(jnp.maximum(ends - starts - K, 0))
    outs = (ent, meta, total, nd_m, nd_tile, nd_compact)
    if not want_res:
        return outs, None

    # ---- residuals for the custom backward --------------------------------
    # The backward sorts the COMPACTED [T*K] ent-row cotangents by the
    # ORIGINAL row id of the gaussian each row came from (csrc — already
    # built for the ent gather, so the residual is free), then segment-sums
    # with a cumsum + boundary difference straight into [N] rows. Pad rows
    # (k >= count) alias the next tile's gaussians but carry exactly-zero
    # cotangents from every blend backend (the evalid gate), so no masking
    # is needed — they add zeros into some other gaussian's segment.
    return outs, (csrc,)


def _make_binning_vjp(height, width, tile_h, tile_w, max_per_tile,
                      dup_factor, route_bf16, n_rows, compact_n=0):
    args = (height, width, tile_h, tile_w, max_per_tile, dup_factor,
            compact_n or None)

    @jax.custom_vjp
    def binning(attrs, valid, depths):
        outs, _ = _binning_impl(attrs, valid, depths, *args, want_res=False)
        return outs

    def fwd(attrs, valid, depths):
        outs, res = _binning_impl(attrs, valid, depths, *args, want_res=True)
        return outs, res

    def bwd(res, cts):
        (csrc,) = res
        d_ent = cts[0]                                    # [T, K, 10]
        A = d_ent.shape[-1]
        n = n_rows
        key = csrc.reshape(-1)
        TK = key.shape[0]
        # Route entry cotangents to per-gaussian groups with ONE
        # multi-payload sort over the compacted [T*K] rows instead of a
        # random row gather (TPU gathers from HBM-resident tables cost
        # ~8 ns per index) or XLA's serial scatter-add. csrc holds ORIGINAL
        # row ids, so the segment sums land directly in output order.
        d_flat = d_ent.reshape(TK, A)
        if route_bf16:
            db = d_flat.astype(jnp.bfloat16)
            db = jnp.pad(db, ((0, 0), (0, (-A) % 2)))
            packs = jax.lax.bitcast_convert_type(
                db.reshape(TK, -1, 2), jnp.int32)         # [TK, ceil(A/2)]
            srt = jax.lax.sort(
                (key,) + tuple(packs[:, i] for i in range(packs.shape[1])),
                num_keys=1, is_stable=True)
            skey = srt[0]
            unpacked = jax.lax.bitcast_convert_type(
                jnp.stack(srt[1:], axis=1), jnp.bfloat16
            ).reshape(TK, -1)[:, :A]
            outs_s = (skey,) + tuple(
                unpacked[:, i].astype(jnp.float32) for i in range(A))
        else:
            outs_s = jax.lax.sort(
                (key,) + tuple(d_flat[:, i] for i in range(A)),
                num_keys=1, is_stable=True)
            skey = outs_s[0]
        # per-gaussian segment boundaries in the sorted order: last
        # position+1 per key. Scatter cost is per *update*, so the updates
        # are first compacted to the <=n segment-end rows with one cheap
        # 2-op sort (sentinel-keyed), then scattered from the leading n
        # rows only (~4x fewer updates than scattering all TK positions).
        pos1 = jnp.arange(1, TK + 1, dtype=jnp.int32)
        is_end = jnp.concatenate(
            [skey[1:] != skey[:-1], jnp.ones((1,), jnp.bool_)])
        key_m = jnp.where(is_end, skey, n)
        pos_m = jnp.where(is_end, pos1, 0)
        k2, p2 = jax.lax.sort((key_m, pos_m), num_keys=1, is_stable=True)
        k2 = jnp.minimum(k2[:n], n - 1)
        khi = jax.lax.cummax(
            jnp.zeros((n,), jnp.int32).at[k2].max(p2[:n]))
        klo = jnp.concatenate([jnp.zeros((1,), jnp.int32), khi[:-1]])
        # contiguous per-gaussian segments: 1-D column cumsums + boundary
        # difference (1-D cumsums are ~free on TPU; the 2-D layout is not).
        # f32 rounding of the running sum is the only divergence from the
        # exact scatter-add (error ~ eps·log2(TK)·|prefix|, negligible vs
        # the stochastic densify threshold this feeds).
        ok = (khi > klo)[:, None]
        hi_i = jnp.maximum(khi - 1, 0)
        # 1-D per-column cumsums (~free on TPU vs the 2-D layout), restacked
        # once so the boundary lookup is ONE row-gather (gathers cost per
        # *index*). The lower boundary needs no gather: klo[g] = khi[g-1],
        # so c[klo-1] is just the previous gaussian's upper value shifted
        # down one row (khi is cummax-filled, so the shift is exact even
        # across empty gaussians).
        c = jnp.stack([jnp.cumsum(outs_s[1 + i]) for i in range(A)],
                      axis=-1)                            # [TK, A]
        h = jnp.where((khi > 0)[:, None], jnp.take(c, hi_i, axis=0), 0.0)
        lo = jnp.concatenate([jnp.zeros((1, A), h.dtype), h[:-1]], axis=0)
        d_attrs10 = jnp.where(ok, h - lo, 0.0)            # [n, A]
        d_attrs = jnp.pad(d_attrs10, ((0, 0), (0, ATTRS - A)))
        d_valid = np.zeros((n,), jax.dtypes.float0)
        # order is non-differentiable; attrs carries the grad-relevant depth
        d_depths = jnp.zeros((n,), d_attrs.dtype)
        return d_attrs, d_valid, d_depths

    binning.defvjp(fwd, bwd)
    return binning


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
    route_bf16: bool = False,
    blend_tb: int = 8,
    blend_cs: int = 64,
    compact_n: int | None = None,
) -> Dict[str, jax.Array]:
    ntx = _cdiv(width, tile_w)
    nty = _cdiv(height, tile_h)
    ent, meta, total, nd_m, nd_tile, nd_c = build_tile_lists(
        proj, height, width, tile_h, tile_w, max_per_tile, dup_factor,
        route_bf16, compact_n)

    # ---- 6. blend ---------------------------------------------------------
    # default "xla": AD-differentiated log-space scan (fastest measured:
    # 188ms fwd+bwd vs 205ms for the analytic VJP at 100k/960x544 — the
    # log-space cumsum transpose beats two analytic forward replays).
    # "xla_analytic" keeps the closed-form VJP exercised: it is the
    # blueprint for the future Pallas backward kernel.
    if backend == "pallas":
        ent16 = jnp.pad(ent, ((0, 0), (0, 0), (0, ATTRS - ent.shape[-1])))
        rgb_t, T_t, dep_t = blend_pallas(ent16, meta, tile_h, tile_w,
                                         tb=blend_tb, cs=blend_cs)
    elif backend == "xla_analytic":
        rgb_t, T_t, dep_t = blend_xla(ent, meta, tile_h, tile_w)
    elif backend == "xla_early":
        from .pallas_blend import blend_xla_early

        rgb_t, T_t, dep_t = blend_xla_early(ent, meta, tile_h, tile_w)
    else:
        rgb_t, T_t, dep_t = _jnp_blend_from_ent(
            ent, meta, tile_h=tile_h, tile_w=tile_w, chunk=chunk)

    return _assemble(rgb_t, T_t, dep_t, height, width, ntx, nty, tile_h,
                     tile_w, bg_color, total, nd_m, nd_tile, nd_c)


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
    route_bf16: bool = False,
    blend_tb: int = 8,
    blend_cs: int = 64,
    compact_n: int | None = None,
) -> Dict[str, jax.Array]:
    """rasterize_tiled over a pre-packed row table (gauss_shard path)."""
    ntx = _cdiv(width, tile_w)
    nty = _cdiv(height, tile_h)
    ent, meta, total, nd_m, nd_tile, nd_c = build_tile_lists_from_rows(
        attrs, valid, depths, height, width, tile_h, tile_w, max_per_tile,
        dup_factor, route_bf16, compact_n)
    if backend == "pallas":
        ent16 = jnp.pad(ent, ((0, 0), (0, 0), (0, ATTRS - ent.shape[-1])))
        rgb_t, T_t, dep_t = blend_pallas(ent16, meta, tile_h, tile_w,
                                         tb=blend_tb, cs=blend_cs)
    elif backend == "xla_early":
        from .pallas_blend import blend_xla_early

        rgb_t, T_t, dep_t = blend_xla_early(ent, meta, tile_h, tile_w)
    else:
        rgb_t, T_t, dep_t = _jnp_blend_from_ent(
            ent, meta, tile_h=tile_h, tile_w=tile_w, chunk=chunk)
    return _assemble(rgb_t, T_t, dep_t, height, width, ntx, nty, tile_h,
                     tile_w, bg_color, total, nd_m, nd_tile, nd_c)


def _assemble(rgb, T_buf, dep, height, width, ntx, nty, tile_h, tile_w,
              bg_color, total, nd_m, nd_tile,
              nd_compact=None) -> Dict[str, jax.Array]:
    def untile(x, ch=None):
        shape = (nty, ntx, tile_h, tile_w) + ((ch,) if ch else ())
        x = x.reshape(shape)
        x = jnp.moveaxis(x, 2, 1)  # [nty, th, ntx, tw, (ch)]
        x = x.reshape((nty * tile_h, ntx * tile_w) + ((ch,) if ch else ()))
        return x[:height, :width]

    image = untile(rgb, 3) + untile(T_buf)[..., None] * bg_color[None, None, :]
    # optimization_barrier: on the TPU backend, fusing this untile
    # (reshape/moveaxis/slice) into a downstream reduction inside a
    # value_and_grad graph MISCOMPILES — the fused reduce reads garbage
    # (loss off by 2000x while a materialized copy of the same tensor is
    # correct; reproduced back to round 1, tools/tpu_parity_probe.py). The
    # barrier forces materialization at the tile boundary; cost is one
    # HBM round-trip that the blend output pays anyway.
    image, dep_u, alpha = jax.lax.optimization_barrier(
        (jnp.clip(image, 0.0, 1.0), untile(dep), 1.0 - untile(T_buf)))
    nd_c = (jnp.asarray(0, jnp.int32) if nd_compact is None
            else nd_compact)
    return {
        "image": image,
        "depth": dep_u,
        "alpha": alpha,
        "n_entries": total,
        "n_dropped": nd_m + nd_tile + nd_c,
        "n_dropped_m": nd_m,
        "n_dropped_tile": nd_tile,
        "n_dropped_compact": nd_c,
    }
