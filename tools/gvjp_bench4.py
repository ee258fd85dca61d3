#!/usr/bin/env python
"""Force host readback to get true gather timings under the axon runtime."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
E = 8_355_840
A = 10


def timed_fetch(name, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    float(fn_j(*args))  # compile + execute + fetch
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:46s} {min(ts)*1e3:8.1f} ms (host-fetched)")


def main():
    rng = np.random.default_rng(0)
    attrs = jnp.asarray(rng.standard_normal((N, A)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (E,)), jnp.int32)
    d_ent = jnp.asarray(rng.standard_normal((E, A)) * 1e-3, jnp.float32)

    timed_fetch("row-gather [E,10] + sum",
                lambda a, g: jnp.take(a, g, axis=0).sum(), attrs, idx)
    timed_fetch("baseline: sum(attrs) only",
                lambda a: a.sum(), attrs)
    timed_fetch("baseline: sum(d_ent[E,10]) only",
                lambda d: d.sum(), d_ent)

    def f(a):
        return jnp.take(a, idx, axis=0)

    timed_fetch("AD scatter-add + sum",
                lambda a, d: jax.vjp(f, a)[1](d)[0].sum(), attrs, d_ent)
    timed_fetch("cumsum [E,10] + sum",
                lambda d: jnp.cumsum(d, axis=0)[-1].sum(), d_ent)


if __name__ == "__main__":
    main()
