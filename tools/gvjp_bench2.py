#!/usr/bin/env python
"""Verify the suspicious 0.1ms forward-gather measurement."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
T = 8160
K = 1024
A = 10


def timed(name, fn, args_list, reps=5):
    fn_j = jax.jit(fn)
    jax.block_until_ready(fn_j(*args_list[0]))
    ts = []
    for r in range(reps):
        a = args_list[r % len(args_list)]
        t0 = time.perf_counter()
        jax.block_until_ready(fn_j(*a))
        ts.append(time.perf_counter() - t0)
    print(f"{name:46s} min {min(ts)*1e3:8.1f}  med {sorted(ts)[len(ts)//2]*1e3:8.1f} ms")


def main():
    rng = np.random.default_rng(0)
    attrs = jnp.asarray(rng.standard_normal((N, A)), jnp.float32)
    attrs16 = jnp.asarray(rng.standard_normal((N, 16)), jnp.float32)
    gids = [jnp.asarray(rng.integers(0, N, (T, K)), jnp.int32)
            for _ in range(3)]
    gflat = [g.reshape(-1) for g in gids]

    timed("take(attrs10,[T,K]) same idx", lambda a, g: jnp.take(a, g, axis=0),
          [(attrs, gids[0])])
    timed("take(attrs10,[T,K]) fresh idx", lambda a, g: jnp.take(a, g, axis=0),
          [(attrs, g) for g in gids])
    timed("take(attrs10,[T*K]) flat idx", lambda a, g: jnp.take(a, g, axis=0),
          [(attrs, g) for g in gflat])
    timed("take(attrs10,[T,K]) +sum",
          lambda a, g: jnp.take(a, g, axis=0).sum(),
          [(attrs, g) for g in gids])
    timed("take(attrs16,[T,K])", lambda a, g: jnp.take(a, g, axis=0),
          [(attrs16, g) for g in gids])
    # sorted (ascending) indices — binning indices are clip(idx) which are
    # mostly monotone segments
    sidx = jnp.sort(gflat[0])
    timed("take(attrs10,[T*K]) sorted idx",
          lambda a, g: jnp.take(a, g, axis=0), [(attrs, sidx)])
    # gather via one-hot? no. gather along axis=1 lane-major
    attrs_T = attrs.T.copy()
    timed("take(attrs10.T,[T*K],axis=1)",
          lambda a, g: jnp.take(a, g, axis=1), [(attrs_T, g) for g in gflat])


if __name__ == "__main__":
    main()
