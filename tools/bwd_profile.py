#!/usr/bin/env python
"""Micro-profile of the binning custom-VJP backward at bench scale (TPU).

Times each piece of tiled._make_binning_vjp's bwd on synthetic inputs of the
exact shapes: route gather [M] from [T*K+1,10], cumsum [M,10], boundary
gathers, unsort gather — plus layout alternatives.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=3):
    """fn must return a SCALAR; a host fetch forces real execution on the
    remote runtime (block_until_ready alone returns early there)."""
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N = 1_000_000
    M = 16 * N
    T = 120 * 68
    K = 1024
    rng = np.random.default_rng(0)
    d_ent = jnp.asarray(rng.standard_normal((T * K + 1, 10)), jnp.float32)
    j_idx = jnp.asarray(rng.integers(0, T * K + 1, M), jnp.int32)
    seg_lo = jnp.asarray(np.sort(rng.integers(0, M, N)), jnp.int32)
    seg_hi = jnp.minimum(seg_lo + 16, M)
    inv_order = jnp.asarray(rng.permutation(N), jnp.int32)
    d_exp = jnp.asarray(rng.standard_normal((M, 10)), jnp.float32)
    print("shapes ready", flush=True)

    f = jax.jit(lambda fl, ji: jnp.sum(jnp.take(fl, ji, axis=0)))
    print(f"route gather [M]<-[T*K,10]   {timeit(f, d_ent, j_idx):8.1f} ms",
          flush=True)

    f = jax.jit(lambda x: jnp.sum(jnp.cumsum(x, axis=0)[-1]))
    print(f"cumsum [M,10] axis0          {timeit(f, d_exp):8.1f} ms",
          flush=True)

    f = jax.jit(lambda x: jnp.sum(jnp.cumsum(x, axis=1)[:, -1]))
    xt = jnp.asarray(rng.standard_normal((10, M)), jnp.float32)
    print(f"cumsum [10,M] axis1          {timeit(f, xt):8.1f} ms",
          flush=True)

    f = jax.jit(lambda x: jnp.sum(jnp.cumsum(
        x.reshape(-1, 2000, 10), axis=1)[:, -1]))
    print(f"cumsum blocked [Mb,2000,10]  {timeit(f, d_exp):8.1f} ms",
          flush=True)

    @jax.jit
    def boundaries(c, lo, hi):
        h = jnp.take(c, jnp.clip(hi - 1, 0, M - 1), axis=0)
        l = jnp.where((lo > 0)[:, None],
                      jnp.take(c, jnp.clip(lo - 1, 0, M - 1), axis=0), 0.0)
        return jnp.sum(h - l)

    c = jnp.cumsum(d_exp, axis=0)
    print(f"boundary gathers 2x[N,10]    {timeit(boundaries, c, seg_lo, seg_hi):8.1f} ms",
          flush=True)

    f = jax.jit(lambda d, io: jnp.sum(jnp.take(d, io, axis=0)))
    dn = jnp.asarray(rng.standard_normal((N, 10)), jnp.float32)
    print(f"unsort gather [N,10]         {timeit(f, dn, inv_order):8.1f} ms",
          flush=True)

    # two-level segment-sum: block sums + block-prefix + boundary partials
    B = 512
    Mb = M // B

    @jax.jit
    def seg2level(d_exp, lo, hi):
        blocks = d_exp.reshape(Mb, B, 10)
        intra = jnp.cumsum(blocks, axis=1)          # intra-block prefix
        bsum = intra[:, -1, :]                      # block totals
        bpre = jnp.cumsum(bsum, axis=0) - bsum      # exclusive block prefix
        # global prefix at any position p = bpre[p//B] + intra[p//B, p%B]
        def pref(p):
            pb = p // B
            return jnp.take(bpre, pb, axis=0) + \
                jnp.take(intra.reshape(M, 10), p, axis=0)
        h = pref(jnp.clip(hi - 1, 0, M - 1))
        l = jnp.where((lo > 0)[:, None], pref(jnp.clip(lo - 1, 0, M - 1)),
                      0.0)
        return jnp.sum(h - l)

    print(f"2-level segsum (cumsum+bnd)  {timeit(seg2level, d_exp, seg_lo, seg_hi):8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
