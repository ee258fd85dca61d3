#!/usr/bin/env python
"""Does the [T*K] ent row-gather cost scale with row WIDTH or only with the
index count? Decides whether narrowing/packing the attr table can cut the
binning forward's dominant stage (~35 ms at the bench op point).

Times jnp.take(table[N, w], idx[TK], axis=0) for several widths/dtypes,
plus the two-table split variant (f32 positions + packed rest).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5):
    out = fn(*args)
    float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N = 1_000_000
    T, K = 120 * 68, 384
    TK = T * K
    rng = np.random.default_rng(0)
    # indices with per-tile depth-sorted structure approximated by sorted
    # runs of K (the real csrc is ascending within each tile segment)
    idx = np.sort(rng.integers(0, N, (T, K)), axis=1).reshape(-1)
    idx_j = jnp.asarray(idx, jnp.int32)
    print(f"gather {TK/1e6:.2f}M rows from [{N}, w]")

    for w, dt in [(16, jnp.float32), (12, jnp.float32), (8, jnp.float32),
                  (4, jnp.float32), (2, jnp.float32), (1, jnp.float32),
                  (16, jnp.bfloat16), (8, jnp.bfloat16)]:
        tab = jnp.asarray(rng.standard_normal((N, w)), dt)
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        ms = timeit(f, tab, idx_j)
        print(f"w={w:3d} {np.dtype(dt).name:9s}: {ms:7.1f} ms "
              f"({ms*1e6/TK:.2f} ns/idx)")

    # 1-D gather (flat element take) for reference
    tab1 = jnp.asarray(rng.standard_normal(N), jnp.float32)
    f1 = jax.jit(lambda t, i: jnp.take(t, i))
    ms = timeit(f1, tab1, idx_j)
    print(f"1-D element take     : {ms:7.1f} ms ({ms*1e6/TK:.2f} ns/idx)")


if __name__ == "__main__":
    main()
