"""Pallas TPU kernels for the per-tile alpha-blend (the rasterizer hot loop).

The binning front-end (raster/tiled.py) produces per-tile front-to-back
entry lists packed as [T, K, ATTRS=16] rows; these kernels composite them.

Kernel structure (v2, per pallas_guide.md):
- 2D grid (tile-block, entry-chunk): each program owns TB=8 tiles and one
  C=64-entry chunk of each. Mosaic's pipeline double-buffers the next
  [TB, C, 16] entry block from HBM while the current one computes.
- accumulators (rgb, depth, transmittance) live in VMEM scratch that
  persists across the sequential entry-chunk axis; initialized at chunk 0,
  flushed to the output block at the last chunk.
- compute: alpha [TB, 8, P] on the VPU; the sequential front-to-back
  transmittance runs on [TB, 1, P] vectors (2048 lanes — full VPU rows);
  color/depth accumulation is a batched [TB](4×8 · 8×P) matmul on the MXU.
- per-tile meta (entry count, tile origin) rides the scalar-prefetch path.
- early-out: a chunk is skipped entirely once every tile in the block is
  past its entry count or transmittance-saturated (CUDA early termination).

Backward: `blend_pallas` is wrapped in jax.custom_vjp; the VJP replays the
mathematically identical jnp chunked blend (log-space cumulative products —
cumsum VJPs are cheap on TPU) under jax.vjp, so gradients stay exact while
the forward runs at kernel speed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .projection import ALPHA_MAX, ALPHA_MIN, T_EPS

ATTRS = 16    # packed row: mx,my,ca,cb,cc,r,g,b,op,depth,radius,pad...
TB = 8        # tiles per program
SUB = 8       # entries per sequential micro-step
C_STEP = 64   # entries per grid step (per tile)
OUT_ROWS = 8  # r,g,b,depth,Tfinal,pad...


def _blend_kernel_v2(meta_ref, aux_ref, ent_ref, out_ref, acc_ref, *,
                     K: int, P: int, tile_w: int, n_chunks: int):
    """Grid (T/TB, K/C_STEP). aux_ref [TB, 8, P] (rows: px, py, count);
    ent_ref [TB, C_STEP, ATTRS]; out_ref [TB, OUT_ROWS, P]; acc_ref scratch
    [TB, OUT_ROWS, P] persistent across the entry-chunk axis. Scalars
    (meta_ref prefetch) are used only for control flow — Mosaic cannot
    build vectors from SMEM scalars."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        acc_ref[:, 0:4, :] = jnp.zeros((TB, 4, P), jnp.float32)
        acc_ref[:, 4:5, :] = jnp.ones((TB, 1, P), jnp.float32)

    pxv = aux_ref[:, 0:1, :]                         # [TB, 1, P]
    pyv = aux_ref[:, 1:2, :]
    n_vec = aux_ref[:, 2:3, :]                       # float32 counts

    # scalar max entry count over this tile block (SMEM scalar ops)
    max_n = meta_ref[4 * (i * TB)]
    for j in range(1, TB):
        max_n = jnp.maximum(max_n, meta_ref[4 * (i * TB + j)])

    tbuf0 = acc_ref[:, 4:5, :]
    live = (c * C_STEP < max_n) & (jnp.max(tbuf0) >= T_EPS)

    @pl.when(live)
    def _():
        def sub_body(sub, carry):
            acc, tb = carry
            start = pl.multiple_of(sub * SUB, SUB)
            block = ent_ref[:, pl.ds(start, SUB), :]  # [TB,SUB,A]
            mx = block[:, :, 0][:, :, None]           # [TB, SUB, 1]
            my = block[:, :, 1][:, :, None]
            ca = block[:, :, 2][:, :, None]
            cb = block[:, :, 3][:, :, None]
            cc = block[:, :, 4][:, :, None]
            op = block[:, :, 8][:, :, None]
            e0 = c * C_STEP + sub * SUB
            idxv = (e0 + jax.lax.broadcasted_iota(
                jnp.int32, (1, SUB, 1), 1)).astype(jnp.float32)
            evalid = idxv < n_vec                     # [TB, SUB, P] bcast

            dx = pxv - mx                             # [TB, SUB, P]
            dy = pyv - my
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
            alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN) & evalid,
                              alpha, 0.0)

            # sequential front-to-back, unrolled over SUB; [TB, 1, P] vector
            # ops (2048 lanes). No cumprod: Mosaic lacks reduce_prod.
            w_rows = []
            for s in range(SUB):
                a = alpha[:, s:s + 1, :]
                tb_next = tb * (1.0 - a)
                keep = tb_next >= T_EPS
                w_rows.append(jnp.where(keep, a * tb, 0.0))
                tb = jnp.where(keep, tb_next, tb)
            w = jnp.concatenate(w_rows, axis=1)       # [TB, SUB, P]

            attr = jnp.concatenate(
                [block[:, :, 5:8], block[:, :, 9:10]], axis=2)  # [TB,SUB,4]
            attr_t = jnp.swapaxes(attr, 1, 2)                   # [TB,4,SUB]
            acc = acc + jax.lax.dot_general(
                attr_t, w,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # [TB, 4, P]
            return acc, tb

        acc, tb = jax.lax.fori_loop(
            0, C_STEP // SUB, sub_body,
            (acc_ref[:, 0:4, :], acc_ref[:, 4:5, :]))
        acc_ref[:, 0:4, :] = acc
        acc_ref[:, 4:5, :] = tb

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[:, :, :] = acc_ref[:, :, :]


def blend_tiles_pallas(ent: jax.Array, meta: jax.Array, *, tile_h: int,
                       tile_w: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """ent: [T, K, ATTRS] packed entries; meta: [T, 4] int32 (count,
    origin_x, origin_y, pad). Returns (rgb [T,P,3], T_buf [T,P], dep [T,P])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, K, _ = ent.shape
    P = tile_h * tile_w

    # pad tiles to a TB multiple and entries to a C_STEP multiple
    T_pad = (-T) % TB
    K_pad = (-K) % C_STEP
    if T_pad or K_pad:
        ent = jnp.pad(ent, ((0, T_pad), (0, K_pad), (0, 0)))
        meta = jnp.pad(meta, ((0, T_pad), (0, 0)))
    Tp = T + T_pad
    Kp = K + K_pad
    n_chunks = Kp // C_STEP

    # aux rows per tile: pixel x / pixel y / entry count (vector-friendly)
    pix = jnp.arange(P, dtype=jnp.int32)
    px = meta[:, 1, None].astype(jnp.float32) + (pix % tile_w)[None, :]
    py = meta[:, 2, None].astype(jnp.float32) + (pix // tile_w)[None, :]
    cnt = jnp.broadcast_to(meta[:, 0, None].astype(jnp.float32), (Tp, P))
    aux = jnp.stack([px, py, cnt] + [jnp.zeros_like(px)] * 5, axis=1)

    kernel = functools.partial(_blend_kernel_v2, K=Kp, P=P, tile_w=tile_w,
                               n_chunks=n_chunks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tp // TB, n_chunks),
        in_specs=[
            pl.BlockSpec((TB, 8, P), lambda i, c, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, C_STEP, ATTRS), lambda i, c, *_: (i, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, OUT_ROWS, P), lambda i, c, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TB, OUT_ROWS, P), jnp.float32)],
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
    return rgb, tbuf, dep


def _jnp_blend_from_ent(ent: jax.Array, meta: jax.Array, *, tile_h: int,
                        tile_w: int, chunk: int = 32):
    """Mathematically identical jnp blend over the packed entries — the
    default XLA path, the custom-VJP backward, and the interpret-mode
    oracle for the kernel."""
    T, K, A = ent.shape
    P = tile_h * tile_w
    tile_px = jnp.asarray(np.arange(P) % tile_w, jnp.float32)
    tile_py = jnp.asarray(np.arange(P) // tile_w, jnp.float32)
    pxv = meta[:, 1].astype(jnp.float32)[:, None] + tile_px[None, :]  # [T,P]
    pyv = meta[:, 2].astype(jnp.float32)[:, None] + tile_py[None, :]
    counts = meta[:, 0]

    C = min(chunk, K)
    n_chunks = K // C
    ent_c = ent.reshape(T, n_chunks, C, A)

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
        # cumulative product in log space: cumsum's VJP (a reverse cumsum)
        # is far cheaper on TPU than cumprod's division-based transpose
        t_within = jnp.exp(jnp.cumsum(jnp.log(one_minus), axis=1))
        t_excl = tbuf[:, None, :] * jnp.concatenate(
            [jnp.ones_like(t_within[:, :1]), t_within[:, :-1]], axis=1)
        t_after = tbuf[:, None, :] * t_within
        kept = t_after >= T_EPS
        w = jnp.where(kept, alpha * t_excl, 0.0)

        attr = jnp.concatenate([blk[:, :, 5:8], blk[:, :, 9:10]], axis=2)
        acc = acc + jnp.einsum("tcp,tca->tap", w, attr)
        tbuf = tbuf * jnp.exp(
            jnp.sum(jnp.where(kept, jnp.log(one_minus), 0.0), axis=1))
        return (acc, tbuf), None

    init = (jnp.zeros((T, 4, P), jnp.float32), jnp.ones((T, P), jnp.float32))
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * C
    (acc, tbuf), _ = jax.lax.scan(
        jax.checkpoint(body), init,
        (jnp.moveaxis(ent_c, 1, 0), bases))
    rgb = jnp.moveaxis(acc[:, 0:3, :], 1, 2)
    dep = acc[:, 3, :]
    return rgb, tbuf, dep


def _blend_bwd_analytic(ent: jax.Array, meta: jax.Array, cts, *,
                        tile_h: int, tile_w: int, chunk: int = 32):
    """Analytic VJP of the blend w.r.t. the packed entries.

    Standard 3DGS backward identity, per pixel with front-to-back weights
    w_i = α_i·T_i (T_i = transmittance before entry i, early-stop gated):

      dL/dα_i = T_i·(a_i·dA) − [ Σ_{j>i} w_j·(a_j·dA) + T_out·dT ] / (1−α_i)
      dL/da_i = w_i · dA

    computed with TWO forward-ordered replays (pass A accumulates the total
    Σ_j w_j (a_j·dA); pass B turns prefix sums into suffixes) — no reverse
    scan, no rematerialization stack, and the structure ports directly to a
    Pallas backward kernel. Matches JAX AD of `_jnp_blend_from_ent` away
    from the (measure-zero) gating thresholds.
    """
    d_rgb, d_tbuf, d_dep = cts                     # [T,P,3], [T,P], [T,P]
    dA = jnp.concatenate([jnp.moveaxis(d_rgb, 2, 1), d_dep[:, None, :]],
                         axis=1)                   # [T, 4, P]

    T_, K, A = ent.shape
    P = tile_h * tile_w
    tile_px = jnp.asarray(np.arange(P) % tile_w, jnp.float32)
    tile_py = jnp.asarray(np.arange(P) // tile_w, jnp.float32)
    pxv = meta[:, 1].astype(jnp.float32)[:, None] + tile_px[None, :]
    pyv = meta[:, 2].astype(jnp.float32)[:, None] + tile_py[None, :]
    counts = meta[:, 0]

    C = min(chunk, K)
    n_chunks = K // C
    ent_c = jnp.moveaxis(ent.reshape(T_, n_chunks, C, A), 1, 0)

    def alpha_of(blk, base, tbuf):
        mx = blk[:, :, 0][:, :, None]
        my = blk[:, :, 1][:, :, None]
        ca = blk[:, :, 2][:, :, None]
        cb = blk[:, :, 3][:, :, None]
        cc = blk[:, :, 4][:, :, None]
        op = blk[:, :, 8][:, :, None]
        idxv = base + jnp.arange(C, dtype=jnp.int32)[None, :]
        evalid = (idxv < counts[:, None])[:, :, None]
        dx = pxv[:, None, :] - mx
        dy = pyv[:, None, :] - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        raw = op * jnp.exp(power)
        alpha = jnp.minimum(ALPHA_MAX, raw)
        gate = (power <= 0.0) & (alpha >= ALPHA_MIN) & evalid
        alpha = jnp.where(gate, alpha, 0.0)
        one_minus = 1.0 - alpha
        t_within = jnp.exp(jnp.cumsum(jnp.log(one_minus), axis=1))
        t_excl = tbuf[:, None, :] * jnp.concatenate(
            [jnp.ones_like(t_within[:, :1]), t_within[:, :-1]], axis=1)
        kept = tbuf[:, None, :] * t_within >= T_EPS
        w = jnp.where(kept, alpha * t_excl, 0.0)
        tbuf_next = tbuf * jnp.exp(
            jnp.sum(jnp.where(kept, jnp.log(one_minus), 0.0), axis=1))
        aux = (dx, dy, power, raw, gate, kept, t_excl, one_minus)
        return alpha, w, tbuf_next, aux

    def live_cond(ci, tbuf):
        live = (counts > ci * C) & (jnp.max(tbuf, axis=1) >= T_EPS)
        return (ci < n_chunks) & jnp.any(live)

    # pass A: total per-pixel weighted cotangent sum + T_out (early-exit)
    def passA_body(carry):
        ci, s_tot, tbuf = carry
        blk = jax.lax.dynamic_index_in_dim(ent_c, ci, 0, keepdims=False)
        _, w, tbuf_next, _ = alpha_of(blk, ci * C, tbuf)
        a = jnp.concatenate([blk[:, :, 5:8], blk[:, :, 9:10]], axis=2)
        a_dot = jnp.einsum("tca,tap->tcp", a, dA)   # [T, C, P]
        s_tot = s_tot + jnp.sum(w * a_dot, axis=1)
        return ci + 1, s_tot, tbuf_next

    _, s_total, t_out = jax.lax.while_loop(
        lambda c: live_cond(c[0], c[2]), passA_body,
        (jnp.asarray(0, jnp.int32), jnp.zeros((T_, P), jnp.float32),
         jnp.ones((T_, P), jnp.float32)))

    tail = t_out * d_tbuf                           # [T, P]

    # pass B: prefix -> suffix, emit entry gradients (early-exit; skipped
    # chunks have zero weights hence zero gradients)
    def passB(s_pref, tbuf, blk, base):
        alpha, w, tbuf_next, aux = alpha_of(blk, base, tbuf)
        dx, dy, power, raw, gate, kept, t_excl, one_minus = aux
        a = jnp.concatenate([blk[:, :, 5:8], blk[:, :, 9:10]], axis=2)
        a_dot = jnp.einsum("tca,tap->tcp", a, dA)   # [T, C, P]
        contrib = w * a_dot
        # prefix including entry i (within-chunk cumsum + carried prefix)
        s_incl = s_pref[:, None, :] + jnp.cumsum(contrib, axis=1)
        suffix = s_total[:, None, :] - s_incl       # Σ_{j>i}
        d_alpha = jnp.where(
            kept,
            t_excl * a_dot - (suffix + tail[:, None, :]) / one_minus,
            0.0)
        # α = min(0.99, raw) gated
        d_raw = jnp.where(gate & (raw < ALPHA_MAX), d_alpha, 0.0)
        d_power = d_raw * raw                       # d(op·e^p)/dp = raw
        d_op = jnp.sum(d_raw * jnp.exp(power), axis=2)
        ca = blk[:, :, 2][:, :, None]
        cb = blk[:, :, 3][:, :, None]
        cc = blk[:, :, 4][:, :, None]
        d_dx = d_power * (-(ca * dx) - cb * dy)
        d_dy = d_power * (-(cc * dy) - cb * dx)
        d_mx = -jnp.sum(d_dx, axis=2)
        d_my = -jnp.sum(d_dy, axis=2)
        d_ca = jnp.sum(d_power * (-0.5 * dx * dx), axis=2)
        d_cb = jnp.sum(d_power * (-dx * dy), axis=2)
        d_cc = jnp.sum(d_power * (-0.5 * dy * dy), axis=2)
        d_a = jnp.einsum("tcp,tap->tca", w, dA)     # [T, C, 4]

        zeros = jnp.zeros_like(d_mx)
        d_blk = jnp.stack(
            [d_mx, d_my, d_ca, d_cb, d_cc,
             d_a[:, :, 0], d_a[:, :, 1], d_a[:, :, 2],
             d_op, d_a[:, :, 3]]
            + [zeros] * (A - 10), axis=-1)          # [T, C, A]
        return s_incl[:, -1, :], tbuf_next, d_blk

    def passB_body(carry):
        ci, s_pref, tbuf, d_acc = carry
        blk = jax.lax.dynamic_index_in_dim(ent_c, ci, 0, keepdims=False)
        s_pref, tbuf, d_blk = passB(s_pref, tbuf, blk, ci * C)
        d_acc = jax.lax.dynamic_update_index_in_dim(d_acc, d_blk, ci, 0)
        return ci + 1, s_pref, tbuf, d_acc

    _, _, _, d_chunks = jax.lax.while_loop(
        lambda c: live_cond(c[0], c[2]), passB_body,
        (jnp.asarray(0, jnp.int32), jnp.zeros((T_, P), jnp.float32),
         jnp.ones((T_, P), jnp.float32),
         jnp.zeros((n_chunks, T_, C, A), jnp.float32)))
    d_ent = jnp.moveaxis(d_chunks, 0, 1).reshape(T_, K, A)
    return d_ent


def _jnp_blend_early(ent: jax.Array, meta: jax.Array, *, tile_h: int,
                     tile_w: int, chunk: int = 32):
    """While-loop blend with *global early termination*.

    The scan blend computes every entry chunk and masks dead contributions;
    for dense scenes (1M Gaussians saturate every tile's transmittance
    within a few dozen entries) that wastes most of the work. This variant
    stops as soon as no tile both (a) has entries left and (b) retains
    transmittance >= 1e-4 — the CUDA reference's early termination at the
    granularity of chunks. Exactly equivalent to the scan blend (skipped
    chunks contribute all-zero weights). Not AD-differentiable (while_loop);
    used as the custom-VJP forward with the analytic backward.
    """
    T_, K, A = ent.shape
    P = tile_h * tile_w
    tile_px = jnp.asarray(np.arange(P) % tile_w, jnp.float32)
    tile_py = jnp.asarray(np.arange(P) // tile_w, jnp.float32)
    pxv = meta[:, 1].astype(jnp.float32)[:, None] + tile_px[None, :]
    pyv = meta[:, 2].astype(jnp.float32)[:, None] + tile_py[None, :]
    counts = meta[:, 0]

    C = min(chunk, K)
    n_chunks = K // C
    ent_c = jnp.moveaxis(ent.reshape(T_, n_chunks, C, A), 1, 0)

    def chunk_update(blk, base, acc, tbuf):
        mx = blk[:, :, 0][:, :, None]
        my = blk[:, :, 1][:, :, None]
        ca = blk[:, :, 2][:, :, None]
        cb = blk[:, :, 3][:, :, None]
        cc = blk[:, :, 4][:, :, None]
        op = blk[:, :, 8][:, :, None]
        idxv = base + jnp.arange(C, dtype=jnp.int32)[None, :]
        evalid = (idxv < counts[:, None])[:, :, None]
        dx = pxv[:, None, :] - mx
        dy = pyv[:, None, :] - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN) & evalid,
                          alpha, 0.0)
        one_minus = 1.0 - alpha
        t_within = jnp.exp(jnp.cumsum(jnp.log(one_minus), axis=1))
        t_excl = tbuf[:, None, :] * jnp.concatenate(
            [jnp.ones_like(t_within[:, :1]), t_within[:, :-1]], axis=1)
        kept = tbuf[:, None, :] * t_within >= T_EPS
        w = jnp.where(kept, alpha * t_excl, 0.0)
        attr = jnp.concatenate([blk[:, :, 5:8], blk[:, :, 9:10]], axis=2)
        acc = acc + jnp.einsum("tcp,tca->tap", w, attr)
        tbuf = tbuf * jnp.exp(
            jnp.sum(jnp.where(kept, jnp.log(one_minus), 0.0), axis=1))
        return acc, tbuf

    def cond(carry):
        ci, acc, tbuf = carry
        live = (counts > ci * C) & \
            (jnp.max(tbuf, axis=1) >= T_EPS)
        return (ci < n_chunks) & jnp.any(live)

    def body(carry):
        ci, acc, tbuf = carry
        blk = jax.lax.dynamic_index_in_dim(ent_c, ci, 0, keepdims=False)
        acc, tbuf = chunk_update(blk, ci * C, acc, tbuf)
        return ci + 1, acc, tbuf

    init = (jnp.asarray(0, jnp.int32),
            jnp.zeros((T_, 4, P), jnp.float32),
            jnp.ones((T_, P), jnp.float32))
    _, acc, tbuf = jax.lax.while_loop(cond, body, init)
    rgb = jnp.moveaxis(acc[:, 0:3, :], 1, 2)
    dep = acc[:, 3, :]
    return rgb, tbuf, dep


def _make_blend_vjp(tile_h: int, tile_w: int, forward: str):
    @jax.custom_vjp
    def blend(ent, meta):
        if forward == "pallas":
            return blend_tiles_pallas(ent, meta, tile_h=tile_h,
                                      tile_w=tile_w)
        if forward == "xla_early":
            return _jnp_blend_early(ent, meta, tile_h=tile_h, tile_w=tile_w)
        return _jnp_blend_from_ent(ent, meta, tile_h=tile_h, tile_w=tile_w)

    def fwd(ent, meta):
        return blend(ent, meta), (ent, meta)

    def bwd(res, cts):
        ent, meta = res
        d_ent = _blend_bwd_analytic(ent, meta, cts, tile_h=tile_h,
                                    tile_w=tile_w)
        d_meta = np.zeros(meta.shape, jax.dtypes.float0)
        return d_ent, d_meta

    blend.defvjp(fwd, bwd)
    return blend


_BLEND_CACHE = {}


def blend_pallas(ent, meta, tile_h: int, tile_w: int):
    key = (tile_h, tile_w, "pallas")
    if key not in _BLEND_CACHE:
        _BLEND_CACHE[key] = _make_blend_vjp(tile_h, tile_w, "pallas")
    return _BLEND_CACHE[key](ent, meta)


def blend_xla(ent, meta, tile_h: int, tile_w: int):
    """XLA-scan forward + analytic backward."""
    key = (tile_h, tile_w, "xla")
    if key not in _BLEND_CACHE:
        _BLEND_CACHE[key] = _make_blend_vjp(tile_h, tile_w, "xla")
    return _BLEND_CACHE[key](ent, meta)


def blend_xla_early(ent, meta, tile_h: int, tile_w: int):
    """Early-terminating while-loop forward + early-terminating analytic
    backward — the fast path for dense scenes."""
    key = (tile_h, tile_w, "xla_early")
    if key not in _BLEND_CACHE:
        _BLEND_CACHE[key] = _make_blend_vjp(tile_h, tile_w, "xla_early")
    return _BLEND_CACHE[key](ent, meta)
