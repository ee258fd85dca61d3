#!/usr/bin/env python
"""Host-fetch-forced timings for the binning int ops (forward additions)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
E = 8_355_840
M = 10_000_000
T = 8160
K = 1024


def timed(name, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    float(fn_j(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:52s} {min(ts)*1e3:8.1f} ms")


def main():
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(M).astype(np.int32))
    iota = jnp.arange(M, dtype=jnp.int32)
    tile_id = jnp.asarray(np.sort(rng.integers(0, T, M)).astype(np.int32))
    tile_rnd = jnp.asarray(rng.integers(0, T, M).astype(np.int32))
    starts = jnp.asarray(np.sort(rng.integers(0, M, T)).astype(np.int32))
    keys = jnp.asarray(rng.integers(0, T + 1, M).astype(np.int32))
    src = jnp.asarray(rng.integers(0, N, M).astype(np.int32))

    timed("baseline fetch overhead (sum iota)",
          lambda x: x.sum(), iota)
    timed("sort (int[M]) 2-payload",
          lambda k, s, i: sum(o.sum() for o in jax.lax.sort(
              (k, s, i), num_keys=1, is_stable=True)), keys, src, iota)
    timed("sort (int[M]) 1-payload",
          lambda k, i: sum(o.sum() for o in jax.lax.sort(
              (k, i), num_keys=1, is_stable=True)), keys, iota)
    timed("inverse perm via sort(perm, iota)",
          lambda p, i: jax.lax.sort((p, i), num_keys=1)[1].sum(), perm, iota)
    timed("int32 [M] gather from [M]",
          lambda x, j: jnp.take(x, j).sum(), iota, perm)
    timed("int32 [M] gather from [T] (starts)",
          lambda s, t: jnp.take(s, t).sum(), starts, tile_rnd)
    timed("scatter-max [M]<-N",
          lambda z, o: z.at[jnp.clip(o[:N] , 0, M - 1)].max(
              jnp.arange(N, dtype=jnp.int32)).sum(), jnp.zeros((M,), jnp.int32), perm)
    timed("cummax [M]", lambda x: jax.lax.cummax(x).sum(), tile_rnd)
    timed("cumsum [M] int", lambda x: jnp.cumsum(x).sum(), tile_rnd)
    # fused j_idx computation
    def jidx(tile, inv_pos, st):
        stg = jnp.take(st, jnp.clip(tile, 0, T - 1))
        k = inv_pos - stg
        ok = (tile < T) & (k >= 0) & (k < K)
        j = jnp.clip(tile, 0, T - 1) * K + jnp.clip(k, 0, K - 1)
        return (jnp.where(ok, j, 0)).sum()
    timed("j_idx int ops [M]", jidx, tile_rnd, perm, starts)


if __name__ == "__main__":
    main()
