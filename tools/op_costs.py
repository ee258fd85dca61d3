#!/usr/bin/env python
"""Measure TPU primitive costs that drive the binning design decisions:
layout padding of narrow trailing dims, lax.sort scaling, gather cost,
cumsum variants, scatter-max. Informs raster/tiled.py optimization."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(fn, *args, iters=5):
    force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        force(fn(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def mem_probe():
    """Does [N, 16] f32 pad its trailing dim to 128 in HBM? Timing probe:
    x*2+1 over each shape — if the narrow trailing dim is physically padded
    to 128 lanes, the elementwise op's HBM traffic (and time) matches the
    wide array's."""
    mul = jax.jit(lambda x: x * 2.0 + 1.0)
    for shape in [(1 << 23, 16), (1 << 20, 128), (8160, 1024, 16),
                  (8160, 1024, 128), (1 << 23, 10), (8160 * 1024, 10),
                  (10, 8160 * 1024), (8160, 16, 1024)]:
        x = jnp.ones(shape, jnp.float32)
        t = timeit(mul, x)
        mb = np.prod(shape) * 4 / 2**20
        print(f"mul {str(shape):>18} {mb:7.0f} MiB logical  {t:8.2f} ms",
              flush=True)


def main():
    print(f"device={jax.devices()[0].platform}", flush=True)
    mem_probe()

    rng = np.random.default_rng(0)
    M = 16 * (1 << 20)
    TK = 8160 * 1024

    keys = jnp.asarray(rng.integers(0, 8160, M), jnp.int32)
    pay = jnp.asarray(rng.integers(0, 1 << 20, M), jnp.int32)
    pay2 = jnp.asarray(rng.integers(0, M, M), jnp.int32)

    f = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1,
                                          is_stable=True))
    print(f"sort 16M 2-op      {timeit(f, keys, pay):8.1f} ms", flush=True)
    f = jax.jit(lambda k, p, q: jax.lax.sort((k, p, q), num_keys=1,
                                             is_stable=True))
    print(f"sort 16M 3-op      {timeit(f, keys, pay, pay2):8.1f} ms",
          flush=True)
    ke = keys[:M // 2]
    f = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1,
                                          is_stable=True))
    print(f"sort 8M 2-op       {timeit(f, ke, pay[:M//2]):8.1f} ms",
          flush=True)

    # gather of [N,16] rows at 8.35M random indices
    tab = jnp.asarray(rng.standard_normal((1 << 20, 16)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 1 << 20, TK), jnp.int32)
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    print(f"gather 8.35M x16   {timeit(f, tab, idx):8.1f} ms", flush=True)
    tab10 = tab[:, :10]
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    print(f"gather 8.35M x10   {timeit(f, tab10, idx):8.1f} ms", flush=True)

    # cumsum layouts at [TK, 10]
    d = jnp.asarray(rng.standard_normal((TK, 10)), jnp.float32)
    f = jax.jit(lambda x: jnp.cumsum(x, axis=0))
    print(f"cumsum [8.35M,10]  {timeit(f, d):8.1f} ms", flush=True)
    dt = jnp.asarray(np.asarray(d).T.copy())
    f = jax.jit(lambda x: jnp.cumsum(x, axis=1))
    print(f"cumsum [10,8.35M]  {timeit(f, dt):8.1f} ms", flush=True)
    d1 = dt[0]
    f = jax.jit(lambda x: jnp.cumsum(x))
    print(f"cumsum [8.35M] x1  {timeit(f, d1):8.1f} ms", flush=True)

    # scatter-max 1M -> 16M (the expansion fills)
    src = jnp.asarray(rng.integers(1, 1 << 20, 1 << 20), jnp.int32)
    tgt = jnp.sort(jnp.asarray(rng.integers(0, M, 1 << 20), jnp.int32))
    f = jax.jit(lambda t, s: jnp.zeros((M,), jnp.int32).at[t].max(s))
    print(f"scatter-max 1M>16M {timeit(f, tgt, src):8.1f} ms", flush=True)

    # cummax over 16M
    f = jax.jit(lambda x: jax.lax.cummax(x))
    print(f"cummax 16M         {timeit(f, pay2):8.1f} ms", flush=True)

    # argsort 1M f32 (depth sort)
    depths = jnp.asarray(rng.standard_normal(1 << 20), jnp.float32)
    f = jax.jit(lambda x: jnp.argsort(x))
    print(f"argsort 1M f32     {timeit(f, depths):8.1f} ms", flush=True)

    # searchsorted T queries over 16M
    sk = jnp.sort(keys)
    q = jnp.arange(8160, dtype=jnp.int32)
    f = jax.jit(lambda s, qq: jnp.searchsorted(s, qq))
    print(f"searchsorted 8160  {timeit(f, sk, q):8.1f} ms", flush=True)

    # vmap dynamic-slice T x K from 16M
    starts = jnp.sort(jnp.asarray(rng.integers(0, M - 1024, 8160), jnp.int32))
    f = jax.jit(lambda a, s: jax.vmap(
        lambda ss: jax.lax.dynamic_slice(a, (ss,), (1024,)))(s))
    print(f"slice 8160x1024    {timeit(f, pay2, starts):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
