"""Early-terminating blend (while_loop + analytic VJP) vs the scan blend:
identical outputs and gradients, including on a dense saturated scene."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ht3dgs.core import gaussians as G
from ht3dgs.core.camera import intrinsics_from_fov, make_camera
from ht3dgs.raster import render
from ht3dgs.raster.projection import project
from ht3dgs.raster.tiled import rasterize_tiled


def scene(n=256, h=48, w=64, seed=0, spread=0.5, opacity=None):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32) * spread
    pts[:, 2] += 3.0
    state = G.create_from_pcd(pts, rng.random((n, 3)).astype(np.float32),
                              capacity=n)
    if opacity is not None:
        state.opacity_logit = jnp.full_like(state.opacity_logit, opacity)
    cam = make_camera(h, w, intrinsics_from_fov(1.2, h, w))
    proj = project(state.means, state.scales(), state.quats,
                   state.opacities(), state.sh(), state.live, cam,
                   jnp.asarray(3), 3)
    return state, cam, proj


def _compare(proj, cam, dense):
    bg = jnp.asarray([0.2, 0.1, 0.3])
    kw = dict(tile_h=16, tile_w=16, max_per_tile=256)
    a = rasterize_tiled(proj, cam.height, cam.width, bg, backend="xla", **kw)
    b = rasterize_tiled(proj, cam.height, cam.width, bg,
                        backend="xla_early", **kw)
    np.testing.assert_allclose(np.asarray(b["image"]), np.asarray(a["image"]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(b["alpha"]), np.asarray(a["alpha"]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(b["depth"]), np.asarray(a["depth"]),
                               atol=3e-4)


def test_early_blend_matches_sparse():
    state, cam, proj = scene()
    _compare(proj, cam, dense=False)


def test_early_blend_matches_dense_saturated():
    # high-opacity dense cloud: transmittance saturates within a few entries
    state, cam, proj = scene(n=512, spread=0.15, opacity=3.0)
    _compare(proj, cam, dense=True)


def test_early_blend_grads_match():
    state, cam, proj = scene(n=128)
    target = jnp.zeros((cam.height, cam.width, 3))

    def loss(means, backend):
        s = dataclasses.replace(state, means=means)
        out = render(s, cam, mode="tiled",
                     tile_args=dict(max_per_tile=256, backend=backend))
        return (jnp.mean((out["image"] - target) ** 2)
                + 0.1 * jnp.mean(out["alpha"]))

    g_ref = np.asarray(jax.grad(lambda m: loss(m, "xla"))(state.means))
    g_e = np.asarray(jax.grad(lambda m: loss(m, "xla_early"))(state.means))
    np.testing.assert_allclose(g_e, g_ref, atol=2e-5, rtol=1e-3)
