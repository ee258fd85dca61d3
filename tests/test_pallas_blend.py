"""Pallas blend kernel vs the XLA tiled path (interpret mode on CPU).

On CPU the kernel runs through the Pallas interpreter (numerics identical);
on a real TPU the same test exercises the compiled kernel."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ht3dgs.core import gaussians as G
from ht3dgs.core.camera import intrinsics_from_fov, make_camera
from ht3dgs.raster.projection import project
from ht3dgs.raster.tiled import rasterize_tiled

_ON_CPU = jax.default_backend() == "cpu"


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    if _ON_CPU:
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
        yield
        ctx.__exit__(None, None, None)
    else:
        yield


def scene(n=192, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 3.0
    state = G.create_from_pcd(pts, rng.random((n, 3)).astype(np.float32),
                              capacity=n)
    cam = make_camera(h, w, intrinsics_from_fov(1.2, h, w))
    proj = project(state.means, state.scales(), state.quats,
                   state.opacities(), state.sh(), state.live, cam,
                   jnp.asarray(3), 3)
    return proj, cam


# non-default (tb, cs) blockings must stay semantics-identical: tb only
# re-groups tiles per program; cs reshapes the Hillis-Steele prefix trees
# (ulp-level FP re-association only)
_BLOCKINGS = [(8, 64), (4, 128), (16, 64)]


@pytest.mark.parametrize("tb,cs", _BLOCKINGS)
def test_pallas_forward_matches_xla(tb, cs):
    proj, cam = scene()
    bg = jnp.asarray([0.15, 0.05, 0.25])
    kw = dict(tile_h=16, tile_w=16, max_per_tile=256)
    ref = rasterize_tiled(proj, cam.height, cam.width, bg, **kw)
    out = rasterize_tiled(proj, cam.height, cam.width, bg, backend="pallas",
                          blend_tb=tb, blend_cs=cs, **kw)
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(ref["image"]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.asarray(ref["alpha"]), atol=3e-5)


@pytest.mark.parametrize("tb,cs", _BLOCKINGS)
def test_pallas_backward_matches_xla(tb, cs):
    proj, cam = scene(n=96, h=32, w=32)
    bg = jnp.zeros(3)
    kw = dict(tile_h=16, tile_w=16, max_per_tile=128)

    def loss(means2d, backend, **bkw):
        p = proj._replace(means2d=means2d)
        out = rasterize_tiled(p, cam.height, cam.width, bg, backend=backend,
                              **bkw, **kw)
        return jnp.mean(out["image"] ** 2) + 0.01 * jnp.mean(out["depth"])

    g_ref = np.asarray(jax.grad(lambda m: loss(m, "xla"))(proj.means2d))
    g_pal = np.asarray(jax.grad(
        lambda m: loss(m, "pallas", blend_tb=tb, blend_cs=cs))(proj.means2d))
    np.testing.assert_allclose(g_pal, g_ref, atol=1e-5)
