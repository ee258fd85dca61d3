"""Multi-chip training: device mesh + shard_map sharded train step.

The reference is strictly single-GPU (SURVEY.md §2.3); this module is the
TPU-native distributed backend designed from scratch:

mesh axes
  segment — data-parallel over hierarchy segments: leaf 3DGS models are
            data-independent until merge (reference README:132), so each
            segment group trains its own replica with NO collectives.
  tile    — intra-segment sharding of the rasterized image: the image is
            row-partitioned across chips; every chip rasterizes its row
            block against the full (replicated) Gaussian set, and the loss
            (hence every parameter gradient) is `pmean`ed over this axis —
            shard_map emits the ICI all-reduce, which XLA overlaps with the
            backward schedule.

The row-block render needs no halo for the rasterizer itself (Gaussian
footprints are evaluated per pixel from replicated parameters); only the
SSIM term is computed block-locally, which perturbs gradients within one
11-px window of shard boundaries — an accepted, documented approximation
(exact SSIM sharding via halo exchange is a planned kernel).

For pods: initialize jax.distributed, build the mesh over all devices;
segments map across hosts (DCN), tiles across intra-host chips (ICI).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import adam as adam_lib
from ..core.camera import Camera
from ..core.gaussians import GaussianState
from ..raster import render
from ..train.losses import l1_loss, ssim


def make_mesh(n_segments: int, n_tiles: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_segments * n_tiles, (
        f"need {n_segments * n_tiles} devices, have {len(devices)}")
    dev = np.asarray(devices[: n_segments * n_tiles]).reshape(
        n_segments, n_tiles)
    return Mesh(dev, axis_names=("segment", "tile"))


def build_sharded_train_step(mesh: Mesh, height: int, width: int,
                             lambda_dssim: float = 0.2,
                             mode: str = "tiled",
                             tile_args: Optional[dict] = None):
    """Returns a jitted step over [S, ...]-batched per-segment states.

    Args of the returned step (leading S = segment-axis size):
      states: GaussianState pytree with leading S on every leaf
      opts:   AdamState likewise
      cameras: Camera pytree with leading S (world_view [S,4,4], fx [S], ...)
      gts:    [S, H, W, 3]
      lrs:    dict of [S]-shaped per-group LRs
    Returns (states', opts', loss [S]).
    """
    n_tiles = mesh.shape["tile"]
    assert height % n_tiles == 0, (
        f"image height {height} must divide the tile axis size {n_tiles}")
    block_h = height // n_tiles

    def per_device(state: GaussianState, opt, camera: Camera, gt_block, lrs):
        row0 = jax.lax.axis_index("tile") * block_h
        cam_local = dataclasses.replace(
            camera, cy=camera.cy - row0.astype(jnp.float32), height=block_h,
            # keep the full-image EWA clamp so projection is shard-invariant
            clip_tan_x=camera.tan_half_fovx,
            clip_tan_y=camera.tan_half_fovy)

        def loss_fn(params):
            s = state.replace_params(params)
            out = render(s, cam_local, mode=mode, tile_args=tile_args)
            l1 = jax.lax.pmean(l1_loss(out["image"], gt_block), "tile")
            if lambda_dssim:
                ds = jax.lax.pmean(1.0 - ssim(out["image"], gt_block), "tile")
            else:
                ds = 0.0
            return (1.0 - lambda_dssim) * l1 + lambda_dssim * ds

        loss, grads = jax.value_and_grad(loss_fn)(state.params())
        # params are replicated over 'tile': each shard's AD yields only its
        # local row-block contribution, so the parameter gradients must be
        # explicitly all-reduced (this is THE DP collective; XLA overlaps it
        # with the backward schedule). Adam then applies replicated.
        grads = jax.lax.pmean(grads, "tile")
        new_params, new_opt = adam_lib.apply(state.params(), grads, opt, lrs)
        return state.replace_params(new_params), new_opt, loss

    from jax import shard_map

    def spec_tree(tree, spec):
        return jax.tree.map(lambda _: spec, tree)

    def body(states, opts, cameras, gts, lrs):
        # each device sees a [1, ...] segment slice and a row block of gt
        s1 = jax.tree.map(lambda x: x[0], states)
        o1 = jax.tree.map(lambda x: x[0], opts)
        c1 = jax.tree.map(lambda x: x[0], cameras)
        l1 = jax.tree.map(lambda x: x[0], lrs)
        ns, no, loss = per_device(s1, o1, c1, gts[0], l1)
        return (jax.tree.map(lambda x: x[None], ns),
                jax.tree.map(lambda x: x[None], no),
                loss[None])

    @jax.jit
    def step(states, opts, cameras, gts, lrs):
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(
                spec_tree(states, P("segment")),
                spec_tree(opts, P("segment")),
                spec_tree(cameras, P("segment")),
                P("segment", "tile", None, None),
                spec_tree(lrs, P("segment")),
            ),
            out_specs=(
                spec_tree(states, P("segment")),
                spec_tree(opts, P("segment")),
                P("segment"),
            ),
            check_vma=False,
        )
        return fn(states, opts, cameras, gts, lrs)

    return step


def batch_segments(items):
    """Stack a list of pytrees along a new leading segment axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *items)
