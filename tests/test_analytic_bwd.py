"""Analytic blend backward vs JAX AD of the scan blend (must match away from
gating thresholds)."""

import jax
import jax.numpy as jnp
import numpy as np

from ht3dgs.core import gaussians as G
from ht3dgs.core.camera import intrinsics_from_fov, make_camera
from ht3dgs.raster import render
from ht3dgs.raster.projection import project
from ht3dgs.raster.tiled import rasterize_tiled


def scene(n=128, h=48, w=64, seed=0, spread=0.5):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32) * spread
    pts[:, 2] += 3.0
    state = G.create_from_pcd(pts, rng.random((n, 3)).astype(np.float32),
                              capacity=n)
    cam = make_camera(h, w, intrinsics_from_fov(1.2, h, w))
    proj = project(state.means, state.scales(), state.quats,
                   state.opacities(), state.sh(), state.live, cam,
                   jnp.asarray(3), 3)
    return state, cam, proj


def test_analytic_grads_match_ad():
    state, cam, proj = scene()
    bg = jnp.asarray([0.1, 0.2, 0.05])
    kw = dict(tile_h=16, tile_w=16, max_per_tile=256)
    target = jnp.zeros((cam.height, cam.width, 3))

    def loss(means2d, conics, colors, opac, backend):
        p = proj._replace(means2d=means2d, conics=conics, colors=colors,
                          opacities=opac)
        out = rasterize_tiled(p, cam.height, cam.width, bg, backend=backend,
                              **kw)
        return (jnp.mean((out["image"] - target) ** 2)
                + 0.1 * jnp.mean(out["alpha"])
                + 0.05 * jnp.mean(out["depth"]))

    args = (proj.means2d, proj.conics, proj.colors, proj.opacities)
    g_ad = jax.grad(lambda *a: loss(*a, "xla"), argnums=(0, 1, 2, 3))(*args)
    g_an = jax.grad(lambda *a: loss(*a, "xla_analytic"), argnums=(0, 1, 2, 3))(*args)
    names = ["means2d", "conics", "colors", "opacities"]
    for n_, a, b in zip(names, g_ad, g_an):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-3, err_msg=n_)


def test_analytic_bwd_through_full_render():
    """End-to-end grads (through projection) with the analytic path stay
    finite and match the AD path."""
    import dataclasses

    state, cam, _ = scene(n=96)
    target = jnp.zeros((cam.height, cam.width, 3))

    def loss(means, backend):
        s = dataclasses.replace(state, means=means)
        out = render(s, cam, mode="tiled",
                     tile_args=dict(max_per_tile=256, backend=backend))
        return jnp.mean((out["image"] - target) ** 2)

    g_ad = np.asarray(jax.grad(lambda m: loss(m, "xla"))(state.means))
    g_an = np.asarray(jax.grad(lambda m: loss(m, "xla_analytic"))(state.means))
    assert np.all(np.isfinite(g_an))
    np.testing.assert_allclose(g_an, g_ad, atol=2e-5, rtol=1e-3)
