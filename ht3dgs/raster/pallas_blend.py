"""Pallas TPU kernels for the per-tile alpha-blend (the rasterizer hot loop).

The binning front-end (raster/tiled.py) produces per-tile front-to-back
entry lists packed as [T, K, ATTRS=16] rows; this module composites them and
computes the parameter gradients. It is the TPU counterpart of the CUDA
forward+backward rasterizer pair the reference consumes at
/root/reference/scene/gaussian_model_ht.py:871-894.

Kernel structure (v3, per pallas_guide.md):
- 2D grid (tile-block, entry-chunk): each program owns TB=8 tiles and one
  C_STEP=64-entry chunk of each. Mosaic's pipeline double-buffers the next
  [TB, C, 16] entry block from HBM while the current one computes.
- fully vectorized chunk math: alpha [TB, C, P] on the VPU, within-chunk
  transmittance via a direct Hillis-Steele prefix-*product* along the
  sublane axis (matching the CUDA reference's running products — no
  log/exp transcendentals on the hot path), and one [4, C] x [C, P] MXU
  matmul per tile for the color/depth accumulation. No per-entry
  sequential loop.
- accumulators (rgb, depth, transmittance, done-flag) live in VMEM scratch
  persisting across the sequential entry-chunk axis.
- termination is *sticky* (CUDA `done` flag): once a pixel's transmittance
  would fall below T_EPS it stops accumulating permanently, even if a later
  tiny alpha would pass the threshold again. All backends (oracle, XLA scan,
  XLA while, Pallas) share this semantic via `_chunk_core`/`_chunk_weights`.
- early-out: a chunk is skipped entirely once every tile in the block is
  past its entry count or every pixel is done.

Backward: analytic VJP. Per pixel, with front-to-back weights
w_i = alpha_i * T_i:

    dL/dalpha_i = T_i (a_i . dA) - [ sum_{j>i} w_j (a_j . dA)
                                     + T_fin * dT ] / (1 - alpha_i)
    dL/da_i     = w_i * dA

The Pallas backward is a SINGLE back-to-front pass (the CUDA kernel's
replay): the forward additionally records each pixel's kept-entry count
(`kept` is a prefix over the entry index — t_after monotone, done sticky),
and the backward reconstructs transmittance downward from T_fin by
un-multiplying kept (1-alpha) factors while the suffix sum accumulates
naturally. A jnp twin (`_blend_bwd_analytic`, two forward-ordered passes —
mathematically identical) is the interpretable oracle, verified against
JAX AD of the scan blend in tests/test_analytic_bwd.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .projection import ALPHA_MAX, ALPHA_MIN, T_EPS

ATTRS = 16    # packed row: mx,my,ca,cb,cc,r,g,b,op,depth,radius,pad...
TB = 8        # tiles per program (default; tunable per call)
C_STEP = 64   # entries per grid step per tile (default; tunable per call)
OUT_ROWS = 8  # r,g,b,depth,Tfinal,done,ncon,pad


# --------------------------------------------------------------------------
# shared chunk math (used by the XLA paths and, with a Mosaic-safe scan, by
# the kernels — single source of truth for the blending semantics)

def _sublane_cumsum(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum along axis 1 via log2(C) shifted adds
    (Mosaic-safe; used by the backward's suffix accumulation)."""
    C = x.shape[1]
    sh = 1
    while sh < C:
        x = x + jnp.concatenate(
            [jnp.zeros_like(x[:, :sh, :]), x[:, :C - sh, :]], axis=1)
        sh *= 2
    return x


def _sublane_cumprod(x: jax.Array) -> jax.Array:
    """Inclusive prefix product along axis 1 via log2(C) shifted multiplies.

    Mosaic-safe replacement for jnp.cumprod (static concats along the
    sublane dim only). Direct products match the CUDA reference (and the
    jnp oracle, raster/reference.py) and cost 2-3 transcendentals per
    entry-pixel less than the previous exp(cumsum(log1p)) formulation."""
    C = x.shape[1]
    sh = 1
    while sh < C:
        x = x * jnp.concatenate(
            [jnp.ones_like(x[:, :sh, :]), x[:, :C - sh, :]], axis=1)
        sh *= 2
    return x


def _chunk_core(blk, pxv, pyv, n_vec, base, cumprod1):
    """Per-chunk alpha + within-chunk transmittance.

    blk: [B, C, A] packed entries; pxv/pyv: [B, 1, P] pixel coords;
    n_vec: float entry counts broadcastable against [B, C, P];
    base: scalar index of the chunk's first entry; cumprod1: inclusive
    prefix-product along axis 1.
    Returns (alpha, one_minus, t_within, res) with res the residues
    needed by the backward: (dx, dy, power, raw, gate).
    """
    C = blk.shape[1]
    mx = blk[:, :, 0][:, :, None]
    my = blk[:, :, 1][:, :, None]
    ca = blk[:, :, 2][:, :, None]
    cb = blk[:, :, 3][:, :, None]
    cc = blk[:, :, 4][:, :, None]
    op = blk[:, :, 8][:, :, None]
    idxv = (base + jax.lax.broadcasted_iota(jnp.int32, (1, C, 1), 1)
            ).astype(jnp.float32)
    evalid = idxv < n_vec

    dx = pxv - mx                               # [B, C, P]
    dy = pyv - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    raw = op * jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, raw)
    gate = (power <= 0.0) & (alpha >= ALPHA_MIN) & evalid
    alpha = jnp.where(gate, alpha, 0.0)
    one_minus = 1.0 - alpha
    # cumprod1=None skips the scan (the one-pass backward re-masks by the
    # kept prefix and runs its own)
    t_within = None if cumprod1 is None else cumprod1(one_minus)
    return alpha, one_minus, t_within, (dx, dy, power, raw, gate)


def _chunk_weights(alpha, t_within, tbuf, done):
    """Front-to-back weights with sticky termination.

    tbuf/done: [B, 1, P] carried transmittance and done-flag (float 0/1).
    Returns (w, kept, t_excl, tbuf_next, done_next)."""
    t_excl = tbuf * jnp.concatenate(
        [jnp.ones_like(t_within[:, :1, :]), t_within[:, :-1, :]], axis=1)
    t_after = tbuf * t_within
    kept = (t_after >= T_EPS) & (done < 0.5)
    w = jnp.where(kept, alpha * t_excl, 0.0)
    # t_after is monotone non-increasing within the chunk, so `kept` is a
    # prefix: the carried transmittance after the chunk is the last kept
    # t_after (tbuf >= t_after everywhere makes the min pick exactly it,
    # or tbuf when nothing was kept)
    tbuf_next = jnp.min(jnp.where(kept, t_after, tbuf), axis=1,
                        keepdims=True)
    # ... and the last row detects whether any entry crossed the threshold
    # (the CUDA `done`)
    done_next = jnp.maximum(
        done, (t_after[:, -1:, :] < T_EPS).astype(tbuf.dtype))
    return w, kept, t_excl, tbuf_next, done_next


def _attr_cols(blk):
    """[B, C, 4]: r, g, b, depth."""
    return jnp.concatenate([blk[:, :, 5:8], blk[:, :, 9:10]], axis=2)


def _bdot(a, b, contract_a, contract_b):
    """Batched (leading-axis) contraction on the MXU."""
    return jax.lax.dot_general(
        a, b, ((( contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------
# Pallas forward kernel

def _blend_fwd_kernel(meta_ref, aux_ref, ent_ref, out_ref, acc_ref, *,
                      P: int, n_chunks: int, tb: int, cs: int):
    """Grid (T/tb, K/cs). aux_ref [tb, 8, P] (rows: px, py, count);
    ent_ref [tb, cs, ATTRS]; out_ref [tb, OUT_ROWS, P]; acc_ref scratch
    [tb, OUT_ROWS, P] persistent across the entry-chunk axis (rows 0-2 rgb,
    3 depth, 4 transmittance, 5 done). Scalars (meta_ref prefetch) are used
    only for control flow — Mosaic cannot build vectors from SMEM scalars."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        acc_ref[:, 0:4, :] = jnp.zeros((tb, 4, P), jnp.float32)
        acc_ref[:, 4:5, :] = jnp.ones((tb, 1, P), jnp.float32)
        acc_ref[:, 5:8, :] = jnp.zeros((tb, 3, P), jnp.float32)

    max_n = meta_ref[4 * (i * tb)]
    for j in range(1, tb):
        max_n = jnp.maximum(max_n, meta_ref[4 * (i * tb + j)])

    tbuf = acc_ref[:, 4:5, :]
    done = acc_ref[:, 5:6, :]
    live = (c * cs < max_n) & \
        (jnp.max(jnp.where(done < 0.5, tbuf, 0.0)) >= T_EPS)

    @pl.when(live)
    def _():
        blk = ent_ref[:, :, :]
        alpha, _, t_within, _ = _chunk_core(
            blk, aux_ref[:, 0:1, :], aux_ref[:, 1:2, :], aux_ref[:, 2:3, :],
            c * cs, _sublane_cumprod)
        w, kept, _, tbuf2, done2 = _chunk_weights(alpha, t_within, tbuf,
                                                  done)
        attr_t = jnp.swapaxes(_attr_cols(blk), 1, 2)        # [TB, 4, C]
        acc_ref[:, 0:4, :] = acc_ref[:, 0:4, :] + _bdot(attr_t, w, 2, 1)
        acc_ref[:, 4:5, :] = tbuf2
        acc_ref[:, 5:6, :] = done2
        # kept-count (CUDA last_contributor): `kept` is a prefix over the
        # entry index per pixel (t_after monotone, done sticky), so the
        # count alone reconstructs the gating for the one-pass backward
        acc_ref[:, 6:7, :] = acc_ref[:, 6:7, :] + jnp.sum(
            kept.astype(jnp.float32), axis=1, keepdims=True)

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[:, :, :] = acc_ref[:, :, :]


def _pad_tk(ent, meta, tb=TB, cs=C_STEP):
    T, K, _ = ent.shape
    T_pad = (-T) % tb
    K_pad = (-K) % cs
    if T_pad or K_pad:
        ent = jnp.pad(ent, ((0, T_pad), (0, K_pad), (0, 0)))
        meta = jnp.pad(meta, ((0, T_pad), (0, 0)))
    return ent, meta, T + T_pad, K + K_pad


def _make_aux(meta, Tp, P, tile_w):
    """[Tp, 8, P] f32 rows: pixel x, pixel y, entry count, zeros."""
    pix = jnp.arange(P, dtype=jnp.int32)
    px = meta[:, 1, None].astype(jnp.float32) + (pix % tile_w)[None, :]
    py = meta[:, 2, None].astype(jnp.float32) + (pix // tile_w)[None, :]
    cnt = jnp.broadcast_to(meta[:, 0, None].astype(jnp.float32), (Tp, P))
    return jnp.stack([px, py, cnt] + [jnp.zeros_like(px)] * 5, axis=1)


def _blend_tiles_pallas_raw(ent: jax.Array, meta: jax.Array, *, tile_h: int,
                            tile_w: int, tb: int = TB, cs: int = C_STEP):
    """Runs the forward kernel; returns (rgb [T,P,3], T_buf [T,P],
    dep [T,P], ncon [T,P] kept-entry count)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, K, _ = ent.shape
    P = tile_h * tile_w
    ent, meta, Tp, Kp = _pad_tk(ent, meta, tb, cs)
    n_chunks = Kp // cs
    aux = _make_aux(meta, Tp, P, tile_w)

    kernel = functools.partial(_blend_fwd_kernel, P=P, n_chunks=n_chunks,
                               tb=tb, cs=cs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tp // tb, n_chunks),
        in_specs=[
            pl.BlockSpec((tb, 8, P), lambda i, c, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, cs, ATTRS), lambda i, c, *_: (i, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, OUT_ROWS, P), lambda i, c, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tb, OUT_ROWS, P), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, OUT_ROWS, P), jnp.float32),
    )(meta.reshape(-1), aux, ent)

    out = out[:T]
    rgb = jnp.moveaxis(out[:, 0:3, :], 1, 2)   # [T, P, 3]
    dep = out[:, 3, :]
    tbuf = out[:, 4, :]
    ncon = out[:, 6, :]
    return rgb, tbuf, dep, ncon


def blend_tiles_pallas(ent: jax.Array, meta: jax.Array, *, tile_h: int,
                       tile_w: int, tb: int = TB, cs: int = C_STEP,
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """ent: [T, K, ATTRS] packed entries; meta: [T, 4] int32 (count,
    origin_x, origin_y, pad). Returns (rgb [T,P,3], T_buf [T,P], dep [T,P])."""
    rgb, tbuf, dep, _ = _blend_tiles_pallas_raw(ent, meta, tile_h=tile_h,
                                                tile_w=tile_w, tb=tb, cs=cs)
    return rgb, tbuf, dep


# --------------------------------------------------------------------------
# Pallas backward kernel (single-pass, back-to-front replay)

def _bwd_onepass_kernel(meta_ref, aux_ref, ent_ref, dg_ref, out_ref, acc_ref,
                        *, P: int, n_chunks: int, tb: int, cs: int,
                        tile_w: int):
    """One reversed sweep over the entry chunks (the CUDA backward's
    back-to-front replay): transmittance is reconstructed downward from
    T_fin by un-multiplying each kept entry's (1-alpha), and the suffix
    sum S_after = sum_{j>i} w_j (a_j . dA) accumulates naturally — no
    pass-A prefix total needed.

    Gating: `kept` in the forward is a prefix over the entry index per
    pixel (t_after is monotone non-increasing and `done` is sticky), so
    the forward's kept-count ncon fully reconstructs it: kept(i) = i < ncon.
    Within a chunk, products of kept (1-alpha) are bounded below by
    T_fin/T_enter >= T_EPS * (1-ALPHA_MAX), so the divisions never
    underflow (same argument as the CUDA kernel's T /= (1-alpha)).

    Grid (T/tb, K/cs) with the chunk axis index-mapped in REVERSE.
    dg_ref [tb, 8, P]: rows 0-2 d_rgb, 3 d_depth, 4 tail (= T_fin * dT),
    5 ncon. out_ref [tb, cs, ATTRS] gradient block for this
    (tile-block, chunk). acc_ref scratch rows: 0 suffix S_after, 1 T_exit
    (transmittance after this chunk's kept entries)."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    cr = pl.program_id(1)
    c = n_chunks - 1 - cr                  # actual chunk index (reversed)

    @pl.when(cr == 0)
    def _():
        acc_ref[:, 0:1, :] = jnp.zeros((tb, 1, P), jnp.float32)
        acc_ref[:, 1:2, :] = dg_ref[:, 6:7, :]       # T_fin

    max_n = meta_ref[4 * (i * tb)]
    for j in range(1, tb):
        max_n = jnp.maximum(max_n, meta_ref[4 * (i * tb + j)])

    ncon = dg_ref[:, 5:6, :]
    # a chunk is dead if no tile in the block has entries there, or no
    # pixel's kept prefix reaches it
    live = (c * cs < max_n) & (jnp.max(ncon) > c * cs)

    # dead chunks have all-zero weights hence all-zero gradients
    out_ref[:, :, :] = jnp.zeros((tb, cs, ATTRS), jnp.float32)

    @pl.when(live)
    def _():
        blk = ent_ref[:, :, :]
        C = blk.shape[1]
        alpha, one_minus, _, res = _chunk_core(
            blk, aux_ref[:, 0:1, :], aux_ref[:, 1:2, :], aux_ref[:, 2:3, :],
            c * cs, None)
        dx, dy, power, raw, gate = res
        idxv = (c * cs + jax.lax.broadcasted_iota(
            jnp.int32, (1, C, 1), 1)).astype(jnp.float32)
        ki = idxv < ncon                                    # kept prefix
        r = jnp.where(ki, one_minus, 1.0)
        p_inc = _sublane_cumprod(r)                         # [TB, C, P]
        p_exc = jnp.concatenate(
            [jnp.ones_like(p_inc[:, :1, :]), p_inc[:, :-1, :]], axis=1)
        p_tot = p_inc[:, -1:, :]                            # >= T_EPS*0.01
        t_exit = acc_ref[:, 1:2, :]
        t_enter = t_exit / p_tot
        t_excl = t_enter * p_exc                            # T before entry
        w = jnp.where(ki, alpha, 0.0) * t_excl

        dA = dg_ref[:, 0:4, :]
        a_dot = _bdot(_attr_cols(blk), dA, 2, 1)            # [TB, C, P]
        contrib = w * a_dot
        s_incl = _sublane_cumsum(contrib)
        suffix = acc_ref[:, 0:1, :] + (s_incl[:, -1:, :] - s_incl)
        d_alpha = jnp.where(
            ki,
            t_excl * a_dot - (suffix + dg_ref[:, 4:5, :]) / one_minus,
            0.0)
        d_raw = jnp.where(gate & (raw < ALPHA_MAX), d_alpha, 0.0)
        d_power = d_raw * raw                               # d(op*e^p)/dp
        ca = blk[:, :, 2][:, :, None]
        cb = blk[:, :, 3][:, :, None]
        cc = blk[:, :, 4][:, :, None]
        op = blk[:, :, 8][:, :, None]

        # Per-entry pixel reductions via ONE MXU contraction. All six
        # gradient sums are linear in the moments S_k = sum_P d_power *
        # {1, u, v, u^2, v^2, uv} over the TILE-LOCAL pixel basis
        # u = px - origin_x in [0, tile_w) (an entry-independent constant,
        # so the basis is one [6, P] matrix shared by every tile): with
        # mxl = mx - origin_x,  sum d_power*dx = S_u - mxl*S_1, etc.
        # Tile-local coords keep the f32 cancellation bounded (|u| < 16;
        # |mxl| <= extent+16, and whenever dx is small mxl is too), where
        # global pixel coords (~1e3) would lose ~1e8*eps of precision.
        # This replaces six VPU lane-reductions, the d_dx/d_dy products,
        # and a second exp() with one [tb*cs, P]x[P, 6] matmul.
        u = (jax.lax.broadcasted_iota(jnp.int32, (1, P), 1) % tile_w
             ).astype(jnp.float32)
        v = (jax.lax.broadcasted_iota(jnp.int32, (1, P), 1) // tile_w
             ).astype(jnp.float32)
        mono = jnp.concatenate(
            [jnp.ones((1, P), jnp.float32), u, v, u * u, v * v, u * v],
            axis=0)                                         # [6, P]
        S = jax.lax.dot_general(
            d_power.reshape(tb * C, P), mono, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).reshape(tb, C, 6)
        # tile-local entry center: u - dx = (px-ox) - (px-mx) = mx - ox is
        # constant across the lane axis, so a max-reduce extracts it exactly
        mxl = jnp.max(u[None] - dx, axis=2, keepdims=True)  # [tb, C, 1]
        myl = jnp.max(v[None] - dy, axis=2, keepdims=True)
        s1 = S[:, :, 0:1]
        sdx = S[:, :, 1:2] - mxl * s1                       # sum d_p*dx
        sdy = S[:, :, 2:3] - myl * s1
        sdxx = S[:, :, 3:4] - mxl * (2.0 * S[:, :, 1:2] - mxl * s1)
        sdyy = S[:, :, 4:5] - myl * (2.0 * S[:, :, 2:3] - myl * s1)
        sdxy = (S[:, :, 5:6] - mxl * S[:, :, 2:3] - myl * S[:, :, 1:2]
                + mxl * myl * s1)
        d_mx = ca * sdx + cb * sdy
        d_my = cc * sdy + cb * sdx
        d_ca = -0.5 * sdxx
        d_cb = -sdxy
        d_cc = -0.5 * sdyy
        # d_op = sum d_raw*exp(power) = sum (d_power/op): op is constant
        # per entry and exact in f32, so the division recovers it exactly
        d_op = jnp.where(op > 0.0, s1 / jnp.maximum(op, 1e-30), 0.0)
        d_a = _bdot(w, dA, 2, 2)                            # [tb, C, 4]
        zeros = jnp.zeros((tb, cs, ATTRS - 10), jnp.float32)
        out_ref[:, :, :] = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_a[:, :, 0:3], d_op,
             d_a[:, :, 3:4], zeros], axis=2)

        acc_ref[:, 0:1, :] = acc_ref[:, 0:1, :] + s_incl[:, -1:, :]
        acc_ref[:, 1:2, :] = t_enter


def _blend_bwd_pallas(ent, meta, tbuf_out, ncon, cts, *, tile_h: int,
                      tile_w: int, tb: int = TB, cs: int = C_STEP):
    """Pallas single-pass analytic backward. Returns d_ent [T, K, ATTRS]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d_rgb, d_tbuf, d_dep = cts                  # [T,P,3], [T,P], [T,P]
    T, K, A = ent.shape
    P = tile_h * tile_w
    ent, meta, Tp, Kp = _pad_tk(ent, meta, tb, cs)
    n_chunks = Kp // cs
    aux = _make_aux(meta, Tp, P, tile_w)

    def padT(x):
        return jnp.pad(x, ((0, Tp - T),) + ((0, 0),) * (x.ndim - 1))

    dA = jnp.concatenate(
        [jnp.moveaxis(padT(d_rgb), 2, 1), padT(d_dep)[:, None, :]], axis=1)
    tbuf_p = padT(tbuf_out)[:, None, :]
    tail = tbuf_p * padT(d_tbuf)[:, None, :]                # [Tp, 1, P]
    ncon_p = padT(ncon)[:, None, :]

    dg = jnp.concatenate([dA, tail, ncon_p, tbuf_p,
                          jnp.zeros((Tp, 1, P), jnp.float32)], axis=1)

    nc = n_chunks
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tp // tb, n_chunks),
        in_specs=[
            pl.BlockSpec((tb, 8, P), lambda i, c, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, cs, ATTRS),
                         lambda i, c, *_: (i, nc - 1 - c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 8, P), lambda i, c, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, cs, ATTRS),
                               lambda i, c, *_: (i, nc - 1 - c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tb, 8, P), jnp.float32)],
    )
    d_ent = pl.pallas_call(
        functools.partial(_bwd_onepass_kernel, P=P, n_chunks=n_chunks,
                          tb=tb, cs=cs, tile_w=tile_w),
        grid_spec=grid,
        out_shape=jax.ShapeDtypeStruct((Tp, Kp, ATTRS), jnp.float32),
    )(meta.reshape(-1), aux, ent, dg)
    return d_ent[:T, :K, :A]


# --------------------------------------------------------------------------
# XLA twins (oracle semantics for the kernels; AD ground truth)

def _tile_pix(meta, tile_w, P):
    tile_px = jnp.asarray(np.arange(P) % tile_w, jnp.float32)
    tile_py = jnp.asarray(np.arange(P) // tile_w, jnp.float32)
    pxv = meta[:, 1].astype(jnp.float32)[:, None] + tile_px[None, :]
    pyv = meta[:, 2].astype(jnp.float32)[:, None] + tile_py[None, :]
    return pxv[:, None, :], pyv[:, None, :]     # [T, 1, P]


def _cumprod1(x):
    return jnp.cumprod(x, axis=1)


def _jnp_blend_from_ent(ent: jax.Array, meta: jax.Array, *, tile_h: int,
                        tile_w: int, chunk: int = 32):
    """Mathematically identical jnp blend over the packed entries — the
    default XLA path and the AD ground truth for the analytic backward."""
    T, K, A = ent.shape
    P = tile_h * tile_w
    pxv, pyv = _tile_pix(meta, tile_w, P)
    n_vec = meta[:, 0].astype(jnp.float32)[:, None, None]

    C = min(chunk, K)
    n_chunks = K // C
    ent_c = ent.reshape(T, n_chunks, C, A)

    def body(carry, xs):
        acc, tbuf, done = carry
        blk, base = xs          # blk [T, C, A]
        alpha, _, t_within, _ = _chunk_core(blk, pxv, pyv, n_vec, base,
                                            _cumprod1)
        w, _, _, tbuf, done = _chunk_weights(alpha, t_within, tbuf, done)
        acc = acc + _bdot(jnp.swapaxes(_attr_cols(blk), 1, 2), w, 2, 1)
        return (acc, tbuf, done), None

    init = (jnp.zeros((T, 4, P), jnp.float32),
            jnp.ones((T, 1, P), jnp.float32),
            jnp.zeros((T, 1, P), jnp.float32))
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * C
    (acc, tbuf, _), _ = jax.lax.scan(
        jax.checkpoint(body), init,
        (jnp.moveaxis(ent_c, 1, 0), bases))
    rgb = jnp.moveaxis(acc[:, 0:3, :], 1, 2)
    dep = acc[:, 3, :]
    return rgb, tbuf[:, 0, :], dep


def _jnp_blend_early(ent: jax.Array, meta: jax.Array, *, tile_h: int,
                     tile_w: int, chunk: int = 32):
    """While-loop blend with global early termination (stops as soon as no
    tile has both entries left and a live pixel). Exactly equivalent to the
    scan blend. Not AD-differentiable (while_loop); used as a custom-VJP
    forward with the analytic backward."""
    T_, K, A = ent.shape
    P = tile_h * tile_w
    pxv, pyv = _tile_pix(meta, tile_w, P)
    counts = meta[:, 0]
    n_vec = counts.astype(jnp.float32)[:, None, None]

    C = min(chunk, K)
    n_chunks = K // C
    ent_c = jnp.moveaxis(ent.reshape(T_, n_chunks, C, A), 1, 0)

    def cond(carry):
        ci, acc, tbuf, done = carry
        alive = (counts > ci * C) & \
            (jnp.max(jnp.where(done < 0.5, tbuf, 0.0), axis=(1, 2)) >= T_EPS)
        return (ci < n_chunks) & jnp.any(alive)

    def body(carry):
        ci, acc, tbuf, done = carry
        blk = jax.lax.dynamic_index_in_dim(ent_c, ci, 0, keepdims=False)
        alpha, _, t_within, _ = _chunk_core(blk, pxv, pyv, n_vec,
                                            ci * C, _cumprod1)
        w, _, _, tbuf, done = _chunk_weights(alpha, t_within, tbuf, done)
        acc = acc + _bdot(jnp.swapaxes(_attr_cols(blk), 1, 2), w, 2, 1)
        return ci + 1, acc, tbuf, done

    init = (jnp.asarray(0, jnp.int32),
            jnp.zeros((T_, 4, P), jnp.float32),
            jnp.ones((T_, 1, P), jnp.float32),
            jnp.zeros((T_, 1, P), jnp.float32))
    _, acc, tbuf, _ = jax.lax.while_loop(cond, body, init)
    rgb = jnp.moveaxis(acc[:, 0:3, :], 1, 2)
    dep = acc[:, 3, :]
    return rgb, tbuf[:, 0, :], dep


def _blend_bwd_analytic(ent, meta, tbuf_out, cts, *, tile_h: int,
                        tile_w: int, chunk: int = 32):
    """jnp twin of the Pallas two-pass backward (interpretable oracle).
    Matches JAX AD of `_jnp_blend_from_ent` away from the (measure-zero)
    gating thresholds."""
    d_rgb, d_tbuf, d_dep = cts                  # [T,P,3], [T,P], [T,P]
    dA = jnp.concatenate([jnp.moveaxis(d_rgb, 2, 1), d_dep[:, None, :]],
                         axis=1)                # [T, 4, P]

    T_, K, A = ent.shape
    P = tile_h * tile_w
    pxv, pyv = _tile_pix(meta, tile_w, P)
    counts = meta[:, 0]
    n_vec = counts.astype(jnp.float32)[:, None, None]

    C = min(chunk, K)
    n_chunks = K // C
    ent_c = jnp.moveaxis(ent.reshape(T_, n_chunks, C, A), 1, 0)

    def live_cond(ci, tbuf, done):
        alive = (counts > ci * C) & \
            (jnp.max(jnp.where(done < 0.5, tbuf, 0.0), axis=(1, 2)) >= T_EPS)
        return (ci < n_chunks) & jnp.any(alive)

    # pass A: total per-pixel weighted cotangent sum (early-exit)
    def passA_body(carry):
        ci, s_tot, tbuf, done = carry
        blk = jax.lax.dynamic_index_in_dim(ent_c, ci, 0, keepdims=False)
        alpha, _, t_within, _ = _chunk_core(blk, pxv, pyv, n_vec,
                                            ci * C, _cumprod1)
        w, _, _, tbuf, done = _chunk_weights(alpha, t_within, tbuf, done)
        a_dot = _bdot(_attr_cols(blk), dA, 2, 1)            # [T, C, P]
        s_tot = s_tot + jnp.sum(w * a_dot, axis=1, keepdims=True)
        return ci + 1, s_tot, tbuf, done

    _, s_total, _, _ = jax.lax.while_loop(
        lambda c: live_cond(c[0], c[2], c[3]), passA_body,
        (jnp.asarray(0, jnp.int32), jnp.zeros((T_, 1, P), jnp.float32),
         jnp.ones((T_, 1, P), jnp.float32),
         jnp.zeros((T_, 1, P), jnp.float32)))

    tail = (tbuf_out * d_tbuf)[:, None, :]                  # [T, 1, P]

    # pass B: prefix -> suffix, emit entry gradients (early-exit; skipped
    # chunks have zero weights hence zero gradients)
    def passB_body(carry):
        ci, s_pref, tbuf, done, d_acc = carry
        blk = jax.lax.dynamic_index_in_dim(ent_c, ci, 0, keepdims=False)
        alpha, one_minus, t_within, res = _chunk_core(
            blk, pxv, pyv, n_vec, ci * C, _cumprod1)
        dx, dy, power, raw, gate = res
        w, kept, t_excl, tbuf, done = _chunk_weights(alpha, t_within,
                                                     tbuf, done)
        a_dot = _bdot(_attr_cols(blk), dA, 2, 1)            # [T, C, P]
        contrib = w * a_dot
        s_incl = s_pref + jnp.cumsum(contrib, axis=1)
        suffix = s_total - s_incl                           # sum_{j>i}
        d_alpha = jnp.where(
            kept, t_excl * a_dot - (suffix + tail) / one_minus, 0.0)
        d_raw = jnp.where(gate & (raw < ALPHA_MAX), d_alpha, 0.0)
        d_power = d_raw * raw
        ca = blk[:, :, 2][:, :, None]
        cb = blk[:, :, 3][:, :, None]
        cc = blk[:, :, 4][:, :, None]
        d_dx = d_power * (-(ca * dx) - cb * dy)
        d_dy = d_power * (-(cc * dy) - cb * dx)

        def lsum(x):
            return jnp.sum(x, axis=2, keepdims=True)

        d_a = _bdot(w, dA, 2, 2)                            # [T, C, 4]
        zeros = jnp.zeros((T_, C, A - 10), jnp.float32)
        d_blk = jnp.concatenate(
            [-lsum(d_dx), -lsum(d_dy), lsum(d_power * (-0.5 * dx * dx)),
             lsum(d_power * (-dx * dy)), lsum(d_power * (-0.5 * dy * dy)),
             d_a[:, :, 0:3], lsum(d_raw * jnp.exp(power)), d_a[:, :, 3:4],
             zeros], axis=2)                                # [T, C, A]
        d_acc = jax.lax.dynamic_update_index_in_dim(d_acc, d_blk, ci, 0)
        return ci + 1, s_incl[:, -1:, :], tbuf, done, d_acc

    _, _, _, _, d_chunks = jax.lax.while_loop(
        lambda c: live_cond(c[0], c[2], c[3]), passB_body,
        (jnp.asarray(0, jnp.int32), jnp.zeros((T_, 1, P), jnp.float32),
         jnp.ones((T_, 1, P), jnp.float32),
         jnp.zeros((T_, 1, P), jnp.float32),
         jnp.zeros((n_chunks, T_, C, A), jnp.float32)))
    d_ent = jnp.moveaxis(d_chunks, 0, 1).reshape(T_, K, A)
    return d_ent


# --------------------------------------------------------------------------
# custom-VJP assembly

def _make_blend_vjp(tile_h: int, tile_w: int, forward: str, backward: str,
                    tb: int = TB, cs: int = C_STEP):
    @jax.custom_vjp
    def blend(ent, meta):
        if forward == "pallas":
            return blend_tiles_pallas(ent, meta, tile_h=tile_h,
                                      tile_w=tile_w, tb=tb, cs=cs)
        if forward == "xla_early":
            return _jnp_blend_early(ent, meta, tile_h=tile_h, tile_w=tile_w)
        return _jnp_blend_from_ent(ent, meta, tile_h=tile_h, tile_w=tile_w)

    def fwd(ent, meta):
        if forward == "pallas":
            rgb, tbuf, dep, ncon = _blend_tiles_pallas_raw(
                ent, meta, tile_h=tile_h, tile_w=tile_w, tb=tb, cs=cs)
            # save T_fin (tail) + kept-count (one-pass backward gating)
            return (rgb, tbuf, dep), (ent, meta, tbuf, ncon)
        out = blend(ent, meta)
        return out, (ent, meta, out[1], None)

    def bwd(res, cts):
        ent, meta, tbuf_out, ncon = res
        if backward == "pallas":
            d_ent = _blend_bwd_pallas(ent, meta, tbuf_out, ncon, cts,
                                      tile_h=tile_h, tile_w=tile_w,
                                      tb=tb, cs=cs)
        else:
            d_ent = _blend_bwd_analytic(ent, meta, tbuf_out, cts,
                                        tile_h=tile_h, tile_w=tile_w)
        d_meta = np.zeros(meta.shape, jax.dtypes.float0)
        return d_ent, d_meta

    blend.defvjp(fwd, bwd)
    return blend


_BLEND_CACHE = {}


def _cached(tile_h, tile_w, forward, backward, tb=TB, cs=C_STEP):
    key = (tile_h, tile_w, forward, backward, tb, cs)
    if key not in _BLEND_CACHE:
        _BLEND_CACHE[key] = _make_blend_vjp(tile_h, tile_w, forward,
                                            backward, tb, cs)
    return _BLEND_CACHE[key]


def blend_pallas(ent, meta, tile_h: int, tile_w: int, tb: int = TB,
                 cs: int = C_STEP):
    """Pallas forward + Pallas one-pass analytic backward."""
    return _cached(tile_h, tile_w, "pallas", "pallas", tb, cs)(ent, meta)


def blend_xla(ent, meta, tile_h: int, tile_w: int):
    """XLA-scan forward + jnp analytic backward."""
    return _cached(tile_h, tile_w, "xla", "jnp")(ent, meta)


def blend_xla_early(ent, meta, tile_h: int, tile_w: int):
    """Early-terminating while-loop forward + early-terminating analytic
    backward — the fast XLA path for dense scenes."""
    return _cached(tile_h, tile_w, "xla_early", "jnp")(ent, meta)
