#!/usr/bin/env python
"""Chained-gather timing: forces serial execution of R gathers."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
E = 8_355_840  # 8160*1024
A = 10
R = 8


def main():
    rng = np.random.default_rng(0)
    attrs = jnp.asarray(rng.standard_normal((N, A)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (E,)), jnp.int32)

    @jax.jit
    def chain(a, g):
        s = jnp.float32(0)
        for _ in range(R):
            ent = jnp.take(a, g, axis=0)
            s = s + ent[17, 3]
            # make next indices depend on previous output (serialization)
            g = (g + ent[3, 2].astype(jnp.int32) % 2 + 1) % N
        return s

    out = chain(attrs, idx)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    jax.block_until_ready(chain(attrs, idx))
    dt = time.perf_counter() - t0
    print(f"chained x{R} row-gathers [E={E}]: {dt*1e3:.1f} ms total, "
          f"{dt/R*1e3:.2f} ms per gather")

    # same but with scalar (width-1) gathers for comparison
    vec = attrs[:, 0].copy()

    @jax.jit
    def chain1(v, g):
        s = jnp.float32(0)
        for _ in range(R):
            x = jnp.take(v, g)
            s = s + x[17]
            g = (g + x[3].astype(jnp.int32) % 2 + 1) % N
        return s

    jax.block_until_ready(chain1(vec, idx))
    t0 = time.perf_counter()
    jax.block_until_ready(chain1(vec, idx))
    dt = time.perf_counter() - t0
    print(f"chained x{R} scalar gathers [E={E}]: {dt*1e3:.1f} ms total, "
          f"{dt/R*1e3:.2f} ms per gather")


if __name__ == "__main__":
    main()
