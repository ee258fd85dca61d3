"""Pure-jnp oracle renderer: exact front-to-back alpha compositing.

Correctness oracle for the tiled/Pallas fast path (SURVEY.md §7 build order
step 2). Every pixel composites *all* depth-sorted Gaussians — O(N·H·W) — so
it is only for tests and small fits, but it is fully differentiable by JAX AD
and runs on CPU. Blending semantics mirror the CUDA reference forward
(alpha = min(0.99, op·exp(power)), skip alpha < 1/255, stop once the
transmittance would fall below 1e-4), with the sequential stop expressed as a
monotone cumulative-product mask so the whole thing stays a fused scan.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .projection import ALPHA_MAX, ALPHA_MIN, Projected, T_EPS


def _pixel_grid(height: int, width: int, dtype=jnp.float32):
    ys = jnp.arange(height, dtype=dtype)
    xs = jnp.arange(width, dtype=dtype)
    return jnp.meshgrid(xs, ys)  # px[H,W], py[H,W]


def blend_chunk(carry, chunk, px, py):
    """Composite one depth-ordered chunk of Gaussians over the full image.

    carry: (T [H,W], rgb [H,W,3], depth [H,W], done [H,W] bool)
    chunk: (means2d [C,2], conics [C,3], colors [C,3], opac [C], depth [C],
            valid [C])
    """
    T, rgb, dep, done = carry
    means2d, conics, colors, opac, g_depth, valid = chunk

    dx = px[None] - means2d[:, 0][:, None, None]          # [C, H, W]
    dy = py[None] - means2d[:, 1][:, None, None]
    a, b, c = conics[:, 0], conics[:, 1], conics[:, 2]
    power = (-0.5 * (a[:, None, None] * dx * dx + c[:, None, None] * dy * dy)
             - b[:, None, None] * dx * dy)
    alpha = jnp.minimum(ALPHA_MAX, opac[:, None, None] * jnp.exp(power))
    alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN)
                      & valid[:, None, None], alpha, 0.0)

    one_minus = 1.0 - alpha
    # transmittance *before* each gaussian in the chunk (exclusive cumprod)
    T_within = jnp.cumprod(one_minus, axis=0)
    T_before = T[None] * jnp.concatenate(
        [jnp.ones_like(T_within[:1]), T_within[:-1]], axis=0)
    T_after = T[None] * T_within
    # sticky termination (the CUDA `done` flag): once a pixel's
    # transmittance would cross T_EPS it stops accumulating permanently —
    # T_after is monotone within the chunk, so the last row detects the
    # crossing and latches `done` for all later chunks
    kept = (T_after >= T_EPS) & ~done[None]
    w = jnp.where(kept, alpha * T_before, 0.0)

    # HIGHEST: the oracle is the parity ground truth — its accumulation must
    # be f32-exact on every backend (TPU default einsum precision is bf16)
    rgb = rgb + jnp.einsum("chw,cd->hwd", w, colors,
                           precision=jax.lax.Precision.HIGHEST)
    dep = dep + jnp.einsum("chw,c->hw", w, g_depth,
                           precision=jax.lax.Precision.HIGHEST)
    T = T * jnp.prod(jnp.where(kept, one_minus, 1.0), axis=0)
    done = done | (T_after[-1] < T_EPS)
    return (T, rgb, dep, done), None


def rasterize_oracle(
    proj: Projected,
    height: int,
    width: int,
    bg_color: jax.Array,
    chunk: int = 256,
) -> Dict[str, jax.Array]:
    """Render projected Gaussians. Returns image/depth/alpha [H,W(,3)]."""
    N = proj.means2d.shape[0]
    C = min(chunk, N)
    pad = (-N) % C
    order = jnp.argsort(proj.depths)  # invalid have depth=+inf -> sorted last

    def g(x):
        x = jnp.take(x, order, axis=0)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        return x.reshape(-1, C, *x.shape[1:])

    chunks = (
        g(proj.means2d),
        g(proj.conics),
        g(proj.colors),
        g(proj.opacities),
        g(jnp.where(jnp.isfinite(proj.depths), proj.depths, 0.0)),
        g(proj.valid),
    )

    dtype = proj.means2d.dtype
    px, py = _pixel_grid(height, width, dtype=dtype)
    init = (
        jnp.ones((height, width), dtype),
        jnp.zeros((height, width, 3), dtype),
        jnp.zeros((height, width), dtype),
        jnp.zeros((height, width), bool),
    )
    (T, rgb, dep, _), _ = jax.lax.scan(
        lambda carry, ch: blend_chunk(carry, ch, px, py), init, chunks)

    image = rgb + T[..., None] * bg_color[None, None, :]
    return {
        "image": jnp.clip(image, 0.0, 1.0),
        "depth": dep,
        "alpha": 1.0 - T,
    }
