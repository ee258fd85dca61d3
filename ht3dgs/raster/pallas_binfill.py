"""Pallas TPU kernel for the binning expansion ("fills") stage.

Replaces raster/tiled.py's scatter + segmented-forward-fill expansion
(2 scatters over [M] + 2 blocked cummax fills + 1 cummax + per-slot
arithmetic) with ONE sequential merge pass over the M-slot stream against
the depth-sorted gaussian table.

Semantics (identical to the XLA path): slot m's owner is the last gaussian
g (in depth order) with offs[g] <= m, where offs is the exclusive cumsum of
per-gaussian tile-rect spans. The kernel emits, per slot,
  src[m]      = original row id of the owner (order payload)
  tile_id[m]  = tile of the owner's rect at rect-local index m - offs[g]
                (row-major: q = local // span_x, rem = local % span_x).
Slots >= total are masked to the sentinel OUTSIDE the kernel (one cheap
[M] where in XLA), so the kernel needs no scalar->vector broadcasts.

Merge invariant: the caller sorts ZERO-SPAN gaussians to the end of the
depth order (depth' = +inf where span == 0, tiled._binning_impl), so in the
live prefix offs is STRICTLY increasing — at most L starts fall in any L
consecutive slots, which bounds the gaussian window a chunk must inspect.
A carried cursor g_lo (aligned down by ALIGN=128, the lane-tiling quantum,
so the dynamic lane-dim DMA slice stays legal) tracks the window base;
owner(m) = g_lo + cnt(m) - 1 with cnt(m) = #{j in window : offs[j] <= m}.
The formula self-corrects for the alignment slack — every gaussian before
the window also has offs <= m — so only window coverage of owner(m)
matters: owner(m0+L-1) <= g_lo + (ALIGN-1) + (L-1) < g_lo + W for
W = L + 2*ALIGN within the strictly-increasing prefix.

Layout: ONE transposed [NCOLS, Npad] f32 table (lane dim = gaussians) so
the per-chunk window is a single 128-aligned lane-slice DMA — narrow
trailing dims ([N, k] with k < 128) are not legally sliceable on TPU.

Numerics: the [L, W] compare matrix and the count/one-hot reduction
weights are 0/1 (exact in bfloat16) and the MXU accumulates in f32
(exact for W < 2^24 terms), so `cnt` is exact despite DEFAULT-precision
matmuls. Selected attribute values up to 2^24 are split into three 8-bit
pieces (each an integer < 256, exact in bfloat16) and recombined after the
one-hot dot, so the select is exact too. The raw-offs row used by the
compare is f32 (values beyond 2^24 may round, but they also exceed every
slot id by construction, so the compare is unaffected); the SELECTED
offs/order come from the exact pieces.

This is the TPU counterpart of the entry-duplication the CUDA reference
performs inside duplicateWithKeys (consumed via
/root/reference/scene/gaussian_model_ht.py:871-894).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


L_SLOTS = 1024  # slots per grid step
ALIGN = 128     # cursor alignment = lane-tiling quantum
NCOLS = 16      # offs_f, x0, y0, sx, offs pieces (3), order pieces (3),
                # + 6 zero rows: HBM window slices need 8-aligned sublanes


def _fills_kernel(glo_ref, m0_ref, colsT_ref, tile_ref, src_ref,
                  win, sem, *, L: int, W: int, ntx: int):
    """Grid (M/L,). glo_ref [G+1] i32 scalar-prefetch: per-chunk window
    base (ALIGN-aligned, precomputed in XLA by searchsorted at chunk
    boundaries — no carried state, so chunks pipeline freely and the next
    window is double-buffered while this one computes). m0_ref [1, 1, 1]
    f32 VMEM block (per-chunk first slot id — a VMEM input because Mosaic
    cannot splat SMEM scalars into vectors); colsT_ref [NCOLS, Npad] f32
    (HBM, build_colsT layout). tile_ref/src_ref [L, 1] i32 output blocks.
    win [2, NCOLS, W] VMEM double buffer; sem DMA[2]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(slot, idx):
        return pltpu.make_async_copy(
            colsT_ref.at[:, pl.ds(pl.multiple_of(glo_ref[idx], ALIGN), W)],
            win.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    wref = win.at[i % 2]

    m0 = m0_ref[0, :, :]                                      # [1, 1] f32
    mv_sub = m0 + jax.lax.broadcasted_iota(
        jnp.int32, (L, 1), 0).astype(jnp.float32)             # [L, 1]

    offs_lane = wref[0:1, :]                                  # [1, W] f32
    cmp = (offs_lane <= mv_sub).astype(jnp.bfloat16)          # [L, W]
    # offs is non-decreasing, so each cmp row is a PREFIX mask up to the
    # owner — the one-hot select telescopes into a single dot against the
    # in-window difference table: sum_j cmp[j] * (val[j] - val[j-1]) =
    # val[owner] (lane 0 keeps its raw value: cmp[0] == 1 always because
    # the window base g_lo <= owner(m0)). Differences of the 8-bit piece
    # columns stay in [-255, 255] (exact in bf16) and the f32 accumulator
    # sums integers < 2^24, so the select is exact in ONE default-precision
    # matmul — no cnt pass, no one-hot.
    vals = wref[:, :]                                         # [NCOLS, W]
    prev = pltpu.roll(vals, shift=1, axis=1)
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) == 0
    dval = jnp.where(lane0, vals, vals - prev).astype(jnp.bfloat16)
    sel = jax.lax.dot_general(
        cmp, dval, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [L, NCOLS]

    # build_colsT layout (col 0 of sel is the bf16-truncated raw offs —
    # unused; the exact value comes from the pieces)
    x0 = sel[:, 1:2]
    y0 = sel[:, 2:3]
    sx = jnp.maximum(sel[:, 3:4], 1.0)
    offs_sel = sel[:, 4:5] * 65536.0 + sel[:, 5:6] * 256.0 + sel[:, 6:7]
    order_sel = sel[:, 7:8] * 65536.0 + sel[:, 8:9] * 256.0 + sel[:, 9:10]

    local = mv_sub - offs_sel
    # f32 quotient with +0.5 bias: exact for local < 2^22 (tiled.py trick)
    q = jnp.floor((local + 0.5) / sx)
    rem = local - q * sx
    tile = (y0 + q) * float(ntx) + x0 + rem
    tile_ref[:, :] = tile.astype(jnp.int32)
    src_ref[:, :] = order_sel.astype(jnp.int32)


def build_colsT(x0, y0, span_x, offs, order):
    """[NCOLS, N] f32 transposed column table (see module docstring).

    Row 0 carries raw offs for the window compare (f32; rounding above
    2^24 is harmless — such values exceed every slot id). x0/y0/span_x
    < 2^8 stay whole; offs/order < 2^24 split into three 8-bit pieces so
    the bf16 one-hot dot reconstructs them exactly."""
    def pieces(v):
        return [(v >> 16).astype(jnp.float32),
                ((v >> 8) & 0xFF).astype(jnp.float32),
                (v & 0xFF).astype(jnp.float32)]

    rows = ([offs.astype(jnp.float32), x0.astype(jnp.float32),
             y0.astype(jnp.float32), span_x.astype(jnp.float32)]
            + pieces(offs) + pieces(order))
    rows += [jnp.zeros_like(rows[0])] * (NCOLS - len(rows))
    return jnp.stack(rows, axis=0)


def fills_pallas(colsT, M: int, ntx: int, interpret: bool = False):
    """colsT [NCOLS, N] f32 from build_colsT, depth-ordered with zero-span
    rows last (offs ascending in the live prefix). Returns (tile_raw [M]
    i32 — caller masks slots >= total to the sentinel — and src [M] i32
    original row ids)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # The bf16 adjacent-difference dot reconstructs x0/y0/span_x exactly
    # only for whole values < 2^8; x0 ranges over the tile grid, so bound
    # the grid to 256 tiles per axis (~4K at 16px tiles). Larger grids
    # need the same 8-bit piece split build_colsT applies to offs/order.
    assert ntx < 256, (
        f"fills_pallas: tile grid width {ntx} >= 256 breaks bf16-exact "
        f"column reconstruction (split x0/y0/span_x into 8-bit pieces)")

    L = L_SLOTS
    W = L + 2 * ALIGN
    Mp = -(-M // L) * L    # rounded up; extra slots sliced off below
    N = colsT.shape[1]
    # pad the gaussian table by a full window: offs row = 2^25 (> every
    # slot id, f32-exact) so padded rows never count; other rows = 0
    npad = -(-(N + W) // ALIGN) * ALIGN - N
    pad = jnp.zeros((NCOLS, npad), colsT.dtype).at[0, :].set(
        jnp.float32(1 << 25))
    colsT_pad = jnp.concatenate([colsT, pad], axis=1)

    G = Mp // L
    m0s = (jnp.arange(G, dtype=jnp.int32) * L
           ).astype(jnp.float32)[:, None, None]
    # per-chunk window base: owner(i*L) aligned down to ALIGN — the only
    # searchsorted in the pipeline, at G ~ M/512 queries (trivially cheap)
    offs_col = colsT[0, :].astype(jnp.float32)
    g_own = jnp.searchsorted(
        offs_col, (jnp.arange(G, dtype=jnp.int32) * L).astype(jnp.float32),
        side="right").astype(jnp.int32) - 1
    g_los = jnp.concatenate(
        [(jnp.maximum(g_own, 0) // ALIGN) * ALIGN,
         jnp.zeros((1,), jnp.int32)])          # +1 pad: prefetch of i+1
    kernel = functools.partial(_fills_kernel, L=L, W=W, ntx=ntx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i, g: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((L, 1), lambda i, g: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i, g: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NCOLS, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    tile_raw, src = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((Mp, 1), jnp.int32),
                   jax.ShapeDtypeStruct((Mp, 1), jnp.int32)),
        interpret=interpret,
    )(g_los, m0s, colsT_pad)
    return tile_raw[:M, 0], src[:M, 0]
