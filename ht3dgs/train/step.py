"""Jitted training steps.

The reference's inner loop (`train_step`,
`/root/reference/trainer/ht3dgs_trainer.py:81-169`) = render → loss →
backward → stats/densify bookkeeping → Adam. Here the whole iteration is one
jitted pure function; densify/prune/opacity-reset are separate jitted
compaction calls made by the host orchestrator at the reference's cadence
(its torch-Adam quirk — params replaced mid-iteration lose their pending
grads — is reproduced by the `apply_adam` mode).

Two step flavors:
- `gaussian_train_step`: optimizes Gaussian parameters; the camera carries
  the (fixed) pose baked into world_view, as the reference does when
  `rotate_seq=False`.
- `pose_train_step`: optimizes a single SE(3) tangent delta against frozen
  Gaussians rendered through an identity camera — the reference's
  relative-pose / test-time-pose-optimization path (SURVEY.md §3.2).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import adam as adam_lib
from ..core.camera import Camera
from ..core.gaussians import GaussianState
from ..core.se3 import se3_retr
from ..raster import render
from . import densify as densify_lib
from .losses import compute_loss, psnr


@partial(jax.jit, static_argnames=("mode", "apply_adam", "track_stats",
                                   "lambda_dssim", "lambda_depth",
                                   "tile_args"))
def gaussian_train_step(
    state: GaussianState,
    opt: adam_lib.AdamState,
    camera: Camera,
    gt_image: jax.Array,
    lrs: Dict[str, jax.Array],
    depth_gt: Optional[jax.Array] = None,
    *,
    mode: str = "auto",
    apply_adam: str = "all",        # "all" | "skip" | "no_opacity"
    track_stats: bool = True,
    lambda_dssim: float = 0.2,
    lambda_depth: float = 0.0,
    tile_args: Optional[tuple] = None,
) -> Tuple[GaussianState, adam_lib.AdamState, Dict[str, jax.Array]]:
    probe0 = jnp.zeros((state.capacity, 2), state.means.dtype)

    def loss_fn(params, probe):
        s = state.replace_params(params)
        out = render(s, camera, means2d_probe=probe, mode=mode,
                     tile_args=dict(tile_args) if tile_args else None)
        ld = compute_loss(out["image"], gt_image,
                          lambda_dssim=lambda_dssim,
                          lambda_depth=lambda_depth,
                          depth_pred=out["depth"] if lambda_depth else None,
                          depth_gt=depth_gt)
        return ld["loss"], (out, ld)

    (_, (out, ld)), (grads, probe_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(state.params(), probe0)

    if track_stats:
        state = densify_lib.accumulate_stats(state, probe_grad, out["radii"])

    if apply_adam == "skip":
        new_params, new_opt = state.params(), opt
    else:
        if apply_adam == "no_opacity":
            grads = dict(grads)
            grads["opacity_logit"] = jnp.zeros_like(grads["opacity_logit"])
            # matches torch: a replaced param has grad None -> no update and
            # no moment change; zeroing the grad changes moments slightly but
            # reset_opacity zeroes those moments right before anyway.
        new_params, new_opt = adam_lib.apply(state.params(), grads, opt, lrs)
    state = state.replace_params(new_params)

    metrics = {
        "loss": ld["loss"],
        "loss_rgb": ld["loss_rgb"],
        "loss_dssim": ld["loss_dssim"],
        "loss_depth": ld["loss_depth"],
        "psnr": psnr(out["image"], gt_image),
        "n_visible": jnp.sum((out["radii"] > 0).astype(jnp.int32)),
        "n_dropped": out.get("n_dropped", jnp.asarray(0, jnp.int32)),
        # split overflow diagnostics: the auto-grow policy must know WHICH
        # capacity (global M dup pool vs per-tile list) overflowed so it can
        # grow only that knob (hierarchy.py host_train_step)
        "n_dropped_m": out.get("n_dropped_m", jnp.asarray(0, jnp.int32)),
        "n_dropped_tile": out.get("n_dropped_tile",
                                  jnp.asarray(0, jnp.int32)),
    }
    return state, new_opt, metrics


@partial(jax.jit, static_argnames=("mode", "lambda_dssim", "lambda_depth",
                                   "tile_args", "update_pose"))
def pose_train_step(
    state: GaussianState,
    pose_delta: jax.Array,          # [6] tangent
    pose_base: jax.Array,           # [7] frozen base pose
    pose_opt: adam_lib.AdamState,
    camera: Camera,                 # identity extrinsics
    gt_image: jax.Array,
    lr: jax.Array,
    *,
    mode: str = "auto",
    lambda_dssim: float = 0.2,
    lambda_depth: float = 0.0,
    tile_args: Optional[tuple] = None,
    update_pose: bool = True,
) -> Tuple[jax.Array, adam_lib.AdamState, Dict[str, jax.Array]]:
    def loss_fn(delta):
        pose = se3_retr(delta, pose_base)
        out = render(state, camera, pose=pose, mode=mode,
                     tile_args=dict(tile_args) if tile_args else None)
        ld = compute_loss(out["image"], gt_image,
                          lambda_dssim=lambda_dssim,
                          lambda_depth=lambda_depth)
        return ld["loss"], (out, ld)

    (_, (out, ld)), g = jax.value_and_grad(loss_fn, has_aux=True)(pose_delta)

    if update_pose:
        params, new_opt = adam_lib.apply(
            {"pose": pose_delta}, {"pose": g}, pose_opt, {"pose": lr})
        pose_delta = params["pose"]
    else:
        new_opt = pose_opt

    metrics = {
        "loss": ld["loss"],
        "psnr": psnr(out["image"], gt_image),
        "grad_norm": jnp.linalg.norm(g),
    }
    return pose_delta, new_opt, metrics


def init_pose_opt() -> adam_lib.AdamState:
    return adam_lib.init({"pose": jnp.zeros(6, jnp.float32)})


@partial(jax.jit, static_argnames=("mode", "tile_args"))
def render_eval(state: GaussianState, camera: Camera,
                pose: Optional[jax.Array] = None, *, mode: str = "auto",
                tile_args: Optional[tuple] = None) -> Dict[str, jax.Array]:
    return render(state, camera, pose=pose, mode=mode,
                  tile_args=dict(tile_args) if tile_args else None)


# jitted wrappers for the compaction ops (thresholds traced => no recompile)
densify_and_prune = jax.jit(densify_lib.densify_and_prune)
reset_opacity = jax.jit(densify_lib.reset_opacity)
jit_importance_prune = jax.jit(densify_lib.importance_prune)
