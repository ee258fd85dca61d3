#!/usr/bin/env python
"""Measured radix/bucket-binning experiment (VERDICT r4 next #3).

Question: can a counting/radix sort over T tile buckets beat the 2-operand
stable lax.sort that routes the M expansion entries to tiles
(raster/tiled.py stage 4)? The CUDA reference does exactly this with a
device radix sort over (tile|depth) keys
(/root/reference/scene/gaussian_model_ht.py:871-894 consumes the
duplicated keys; CUB radix under the hood).

A counting sort needs three passes:
  1. histogram  counts[T] of tile_id over M entries
  2. exclusive cumsum -> bucket offsets            (free, T ~ 8K)
  3. permutation WRITE  out[offs[tile]+rank] = entry

Pass 3 additionally needs each entry's stable RANK within its bucket,
which itself costs a sort, a segmented scan over sorted data (circular),
or an O(M*T) blocked triangular one-hot contraction (~2.6 TFLOP at the
bench point — ~13 ms of pure MXU before any memory traffic).

This probe therefore measures a STRICT LOWER BOUND for any radix shape:
histogram + cumsum + permutation scatter-write with the ranks assumed
FREE (dest precomputed on host), against the production 2-op lax.sort at
the same shapes. If the lower bound already loses, the full radix path
(which still owes the rank computation) is measured-dead on this
toolchain, upgrading ROADMAP.md's analytic argument to a measurement.

Shapes: bench operating point (1M Gaussians / 1080p / 16x16 tiles,
dup=1.25 -> M=1.25M, T=8160) plus M=2M for continuity with the r4 split.
Run on the real chip (default axon platform).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    """Median over iters — the remote axon tunnel has multi-ms jitter."""
    float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    T = 8160  # 1080p / 16x16: 120 * 68
    rng = np.random.default_rng(0)

    for M in (1_250_000, 2_000_000):
        # realistic bucket loads: tile_ids clustered (entries of one
        # gaussian land in adjacent tiles), emulated by sorting the depth
        # axis locally — distribution does not change any measured op's
        # cost class, but keep it non-uniform for honesty
        tile_id = jnp.asarray(rng.integers(0, T, M), jnp.int32)
        src = jnp.asarray(rng.integers(0, 1 << 20, M), jnp.int32)

        # remote-dispatch floor (axon tunnel): every isolated timing below
        # carries this constant; subtract it to compare in-graph costs
        f_null = jax.jit(lambda k: jnp.sum(k[:8]).astype(jnp.float32))
        t_null = timeit(f_null, tile_id)

        # ---- baseline: the production stage-4 sort -----------------------
        f_sort = jax.jit(lambda k, s: sum(
            jnp.sum(o[:8]) for o in jax.lax.sort(
                (k, s), num_keys=1, is_stable=True)).astype(jnp.float32))
        t_sort = timeit(f_sort, tile_id, src)

        # ---- radix pass 1: histogram -------------------------------------
        # (a) scatter-add (the natural XLA spelling)
        f_hist_sc = jax.jit(lambda k: jnp.sum(
            jnp.zeros((T,), jnp.int32).at[k].add(1)).astype(jnp.float32))
        t_hist_sc = timeit(f_hist_sc, tile_id)

        # (b) comparison-reduction (VPU, fusable, no scatter): blocked so
        # the [B, T] eq-matrix stays on-chip
        B = 4096
        nb = -(-M // B)
        pad = nb * B - M

        def hist_cmp(k):
            # pad with T (matches no tid -> contributes nothing)
            kb = jnp.concatenate(
                [k, jnp.full((pad,), T, jnp.int32)]).reshape(nb, B)
            tids = jnp.arange(T, dtype=jnp.int32)

            def body(c, kr):
                c = c + jnp.sum(
                    (kr[:, None] == tids[None, :]).astype(jnp.int32), 0)
                return c, None

            c, _ = jax.lax.scan(body, jnp.zeros((T,), jnp.int32), kb)
            return jnp.sum(c).astype(jnp.float32)

        t_hist_cmp = timeit(jax.jit(hist_cmp), tile_id)

        # (c) MXU one-hot dot: bf16 one-hot [B, T] @ ones, accumulated
        def hist_dot(k):
            kb = jnp.concatenate(
                [k, jnp.full((pad,), T, jnp.int32)]).reshape(nb, B)
            tids = jnp.arange(T, dtype=jnp.int32)

            def body(c, kr):
                oh = (kr[:, None] == tids[None, :]).astype(jnp.bfloat16)
                c = c + jnp.sum(oh, 0).astype(jnp.float32)
                return c, None

            c, _ = jax.lax.scan(body, jnp.zeros((T,), jnp.float32), kb)
            return jnp.sum(c)

        t_hist_dot = timeit(jax.jit(hist_dot), tile_id)

        # ---- radix pass 3: permutation write, ranks FREE -----------------
        # dest is a true permutation (host-computed stable counting-sort
        # destinations for this tile_id draw), so unique hints are honest
        order = np.argsort(np.asarray(tile_id), kind="stable")
        dest_np = np.empty(M, np.int32)
        dest_np[order] = np.arange(M, dtype=np.int32)
        dest = jnp.asarray(dest_np)

        f_wr = jax.jit(lambda d, k, s: (
            jnp.sum(jnp.zeros((M,), jnp.int32).at[d].set(
                k, unique_indices=True)[:8]) +
            jnp.sum(jnp.zeros((M,), jnp.int32).at[d].set(
                s, unique_indices=True)[:8])).astype(jnp.float32))
        t_write = timeit(f_wr, dest, tile_id, src)

        f_wr_plain = jax.jit(lambda d, k, s: (
            jnp.sum(jnp.zeros((M,), jnp.int32).at[d].set(k)[:8]) +
            jnp.sum(jnp.zeros((M,), jnp.int32).at[d].set(s)[:8])
        ).astype(jnp.float32))
        t_write_plain = timeit(f_wr_plain, dest, tile_id, src)

        # gather flavor of pass 3: out[i] = in[perm[i]] (needs the INVERSE
        # permutation, i.e. the ranks problem again, but measures whether
        # the write direction is the bottleneck)
        inv = jnp.asarray(order.astype(np.int32))
        f_gather = jax.jit(lambda p, k, s: (
            jnp.sum(jnp.take(k, p)[:8]) + jnp.sum(jnp.take(s, p)[:8])
        ).astype(jnp.float32))
        t_gather = timeit(f_gather, inv, tile_id, src)

        c = t_null  # dispatch-floor correction
        best_hist = min(t_hist_sc, t_hist_cmp, t_hist_dot) - c
        best_write = min(t_write, t_write_plain, t_gather) - c
        print(f"M={M/1e6:.2f}M T={T}   (dispatch floor {t_null:.2f} ms,"
              f" subtracted from corrected column)")
        print(f"  baseline 2-op stable lax.sort      {t_sort:7.2f} ms"
              f"  corrected {t_sort - c:7.2f}")
        print(f"  hist scatter-add                   {t_hist_sc:7.2f} ms"
              f"  corrected {t_hist_sc - c:7.2f}")
        print(f"  hist cmp-reduce (VPU)              {t_hist_cmp:7.2f} ms"
              f"  corrected {t_hist_cmp - c:7.2f}")
        print(f"  hist one-hot bf16 (MXU)            {t_hist_dot:7.2f} ms"
              f"  corrected {t_hist_dot - c:7.2f}")
        print(f"  perm write x2 (hinted)             {t_write:7.2f} ms"
              f"  corrected {t_write - c:7.2f}")
        print(f"  perm write x2 (plain)              {t_write_plain:7.2f} ms"
              f"  corrected {t_write_plain - c:7.2f}")
        print(f"  perm gather x2 (inverse)           {t_gather:7.2f} ms"
              f"  corrected {t_gather - c:7.2f}")
        lb = best_hist + best_write
        ratio = lb / max(t_sort - c, 1e-9)
        print(f"  radix LOWER BOUND (hist+write, ranks free)"
              f"   {lb:7.2f} ms = {ratio:.1f}x the sort "
              f"{'LOSES' if lb >= t_sort - c else 'wins'}", flush=True)


if __name__ == "__main__":
    main()
