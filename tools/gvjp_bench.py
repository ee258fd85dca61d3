#!/usr/bin/env python
"""Microbenchmark: candidate backward implementations for the binning
entry-gather (the dominant cost of the 1M/1080p train step).

Shapes mirror bench.py's headline config: N=1M Gaussians, 1920x1080,
T=8160 tiles, K=1024 entries/tile (8.35M gathered rows), expansion
capacity M=10M.

Run on the real TPU (one process at a time):  python tools/gvjp_bench.py
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
T = 8160
K = 1024
M = 10_000_000
A = 10


def timed(name, fn, *args, reps=5):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:8.1f} ms")
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0].platform, file=sys.stderr)

    attrs = jnp.asarray(rng.standard_normal((N, A)), jnp.float32)
    gid = jnp.asarray(rng.integers(0, N, (T, K)), jnp.int32)
    d_ent = jnp.asarray(rng.standard_normal((T, K, A)) * 1e-3, jnp.float32)
    j_idx = jnp.asarray(rng.integers(0, T * K, (M,)), jnp.int32)
    # grouped-order segment offsets: N segments over M slots
    seg = np.sort(rng.integers(0, M, (N - 1,))).astype(np.int32)
    offs = jnp.asarray(np.concatenate([[0], seg]), jnp.int32)
    ends = jnp.asarray(np.concatenate([seg, [M]]), jnp.int32)
    src_slot = np.repeat(np.arange(N, dtype=np.int32),
                         np.diff(np.concatenate([[0], seg, [M]])))
    src_slot = jnp.asarray(src_slot)
    dsort = jnp.asarray(rng.permutation(N).astype(np.int32))

    # 1. forward slot gather (as in build_tile_lists)
    timed("fwd: take(attrs,[T,K]) -> [T,K,10]",
          lambda a, g: jnp.take(a, g, axis=0), attrs, gid)

    # 2. current AD backward (scatter-add)
    def f(a):
        return jnp.take(a, gid, axis=0)
    def ad_bwd(a, ct):
        return jax.vjp(f, a)[1](ct)[0]
    timed("bwd A: AD scatter-add", ad_bwd, attrs, d_ent)

    # 3. permutation gather [M,10] from [T*K,10]
    flat = d_ent.reshape(T * K, A)
    timed("bwd B1: take(d_ent,[M]) -> [M,10]",
          lambda x, j: jnp.take(x, j, axis=0), flat, j_idx)

    # 4. cumsum over [M,10] axis 0 + boundary gathers
    d_exp = jnp.take(flat, j_idx, axis=0)
    def segsum_cumsum(x, o, e):
        c = jnp.cumsum(x, axis=0)
        hi = jnp.take(c, e - 1, axis=0)
        lo = jnp.where((o > 0)[:, None], jnp.take(c, o - 1, axis=0), 0.0)
        return hi - lo
    timed("bwd B2: cumsum[M,10] + 2x[N] gathers", segsum_cumsum,
          d_exp, offs, ends)

    # 5. cumsum lane-major [10,M]
    d_exp_t = d_exp.T.copy()
    def segsum_cumsum_T(x, o, e):
        c = jnp.cumsum(x, axis=1)
        hi = jnp.take(c, e - 1, axis=1)
        lo = jnp.where((o > 0)[None, :], jnp.take(c, o - 1, axis=1), 0.0)
        return (hi - lo).T
    timed("bwd B2': cumsum[10,M] lane-major", segsum_cumsum_T,
          d_exp_t, offs, ends)

    # 6. un-depth-sort gather [N,10]
    dsorted = jnp.asarray(rng.standard_normal((N, A)), jnp.float32)
    timed("bwd B3: take([N,10],[N]) unsort",
          lambda x, o: jnp.take(x, o, axis=0), dsorted, dsort)

    # 7. int gather / sort primitives at M
    keys = jnp.asarray(rng.integers(0, N, (M,)), jnp.int32)
    pay = jnp.arange(M, dtype=jnp.int32)
    timed("sort (int32[M], 1 payload)",
          lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=True),
          keys, pay)
    timed("int32 [M] gather",
          lambda x, j: jnp.take(x, j), pay, j_idx)

    # 8. matmul-style segreduce: one-hot per 512-chunk against local window
    #    (XLA formulation; estimates MXU segreduce cost without Pallas)
    C = 512
    nch = M // C
    def chunk_matmul(x, s):
        xc = x.reshape(nch, C, A)
        sc = s.reshape(nch, C)
        base = sc[:, :1]
        local = (sc - base).astype(jnp.int32)
        oh = (local[:, None, :] ==
              jnp.arange(C, dtype=jnp.int32)[None, :, None]
              ).astype(jnp.float32)                      # [nch, C(out), C(in)]
        part = jnp.einsum("coi,cia->coa", oh, xc)        # [nch, C, A]
        return part.sum()  # just force the compute
    timed("segreduce est: per-512-chunk one-hot matmul", chunk_matmul,
          d_exp, src_slot)


if __name__ == "__main__":
    main()
