"""Shared harness for the on-device rasterizer config sweeps.

Builds the 1M-Gaussian / 1080p bench scene, compiles a fwd+bwd train step
per tile-args config, and reports steady-state ms plus image / means-grad
deviation against the first (reference) config. Used by tools/route_sweep.py
and tools/blend_sweep.py.
"""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_scene(n=1_000_000, h=1080, w=1920, seed=0, trained=False):
    """trained=True swaps the uniform create_from_pcd opacity (0.1
    everywhere — an adversarial scene where transmittance never
    terminates) for trained-3DGS statistics: bimodal opacity from the
    reference's opacity-reset/prune cycle
    (/root/reference/trainer/ht3dgs_trainer.py:150-157)."""
    from ht3dgs.core import gaussians as G
    from ht3dgs.core.camera import intrinsics_from_fov, make_camera

    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32) * 1.5
    pts[:, 2] += 6.0
    colors = rng.random((n, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, colors, capacity=n)
    if trained:
        import dataclasses

        u = rng.random(n)
        op = np.where(u < 0.45, rng.uniform(0.60, 0.99, n),
                      np.where(u < 0.75, rng.uniform(0.15, 0.60, n),
                               rng.uniform(0.01, 0.15, n))).astype(
                                   np.float32)
        logit = np.log(op / (1 - op)).astype(np.float32)[:, None]
        state = dataclasses.replace(state,
                                    opacity_logit=jnp.asarray(logit))
    cam = make_camera(h, w, intrinsics_from_fov(1.2, h, w))
    target = jnp.zeros((h, w, 3), jnp.float32)
    return state, cam, target


def make_step(state, cam, target, tile_args):
    from ht3dgs.raster import render

    @jax.jit
    def step(means, sh_dc, opacity_logit):
        def loss_fn(m, s, o):
            st = dataclasses.replace(state, means=m, sh_dc=s,
                                     opacity_logit=o)
            out = render(st, cam, mode="tiled", tile_args=tile_args)
            return jnp.mean((out["image"] - target) ** 2), out["image"]

        (l, img), g = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
                means, sh_dc, opacity_logit)
        return l, img, g

    return step


def run_configs(configs, iters=8, n=1_000_000, h=1080, w=1920,
                trained=False):
    """configs: iterable of (label, tile_args). Prints a timing +
    deviation-vs-first-config line per entry and returns a list of
    {label, ms, mps, d_img, d_gmeans} dicts (ms=None for failed configs),
    so callers select rows by label instead of parsing stdout."""
    state, cam, target = bench_scene(n, h, w, trained=trained)
    args = (state.means, state.sh_dc, state.opacity_logit)
    ref = None
    results = []
    for label, ta in configs:
        step = make_step(state, cam, target, ta)
        t0 = time.perf_counter()
        try:
            out = step(*args)
            float(out[0])
        except Exception as e:  # noqa: BLE001 — sweep survives OOM configs
            print(f"{label}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)
            results.append(dict(label=label, ms=None, mps=None,
                                d_img=None, d_gmeans=None))
            continue
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*args)
        float(out[0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        l, img, g = out
        img_h = np.asarray(img)
        gm = np.asarray(g[0])
        if ref is None:
            ref = (img_h, gm)
            di = dg = 0.0
        else:
            di = float(np.max(np.abs(img_h - ref[0])))
            denom = float(np.max(np.abs(ref[1]))) or 1.0
            dg = float(np.max(np.abs(gm - ref[1]))) / denom
        print(f"{label}: {dt:7.1f} ms  ({h*w/1e3/dt:5.2f} MP/s)  "
              f"loss={float(l):.6f}  d_img={di:.2e}  d_gmeans(rel)={dg:.2e}  "
              f"(compile {compile_s:.0f}s)", flush=True)
        results.append(dict(label=label, ms=dt, mps=h * w / 1e3 / dt,
                            d_img=di, d_gmeans=dg))
    return results
