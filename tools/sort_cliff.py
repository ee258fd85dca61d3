#!/usr/bin/env python
"""lax.sort cost vs operand count at M=16M (TPU), and the sort-as-router
candidate: key permutation + 5 packed-f32x2->int32-pair payloads."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=3):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    M = 16_000_000
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.permutation(M), jnp.int32)
    pays = [jnp.asarray(rng.integers(0, 1 << 30, M), jnp.int32)
            for _ in range(9)]

    for nops in (2, 3, 4, 5, 6, 8, 11):
        f = jax.jit(lambda k, *ps: sum(
            jnp.sum(o[:8]) for o in jax.lax.sort((k,) + ps, num_keys=1,
                                                 is_stable=True)).astype(
                                                     jnp.float32))
        t = timeit(f, key, *pays[: nops - 1])
        print(f"sort {nops}-op [16M]      {t:8.1f} ms", flush=True)

    # f32 payload flavor (what the router would carry)
    fpays = [jnp.asarray(rng.standard_normal(M), jnp.float32)
             for _ in range(5)]
    f = jax.jit(lambda k, *ps: sum(
        jnp.sum(o[:8]) for o in jax.lax.sort((k,) + ps, num_keys=1,
                                             is_stable=True)[1:]))
    t = timeit(f, key, *fpays)
    print(f"sort 1key+5xf32 [16M] {t:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
