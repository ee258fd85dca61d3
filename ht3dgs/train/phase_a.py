"""Batched Phase A: parallel relative-pose estimation.

The reference runs Phase A strictly sequentially — fit a local 3DGS to
frame f-1 (1000 iters), then pose-fit to the VFI midpoint and to frame f
(300 iters each), for every adjacent pair
(`/root/reference/trainer/ht3dgs_trainer.py:336-431`) — and reports that
pose estimation dominates training time together with VFI (README:130-132).
The pairs are data-independent, so on TPU we vmap B local models through a
single jitted fori_loop: one dispatch for the whole fit instead of
B·1000 host round-trips, with the VPU/MXU batching across models. On a
multi-chip mesh the batch axis shards across chips (embarrassingly
parallel).

Early stopping (reference: PSNR>35 after 500 iters) is reproduced with a
per-model `active` mask folded into the update, so batched results match
the sequential schedule's dynamics.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core import adam as adam_lib
from ..core.camera import Camera
from ..core.gaussians import GaussianState
from ..core.se3 import se3_retr
from ..raster import render
from .losses import compute_loss, psnr


def _one_fit_step(state: GaussianState, opt, camera: Camera, gt, lrs,
                  active, *, mode, tile_args, lambda_dssim):
    def loss_fn(params):
        s = state.replace_params(params)
        out = render(s, camera, mode=mode,
                     tile_args=dict(tile_args) if tile_args else None)
        ld = compute_loss(out["image"], gt, lambda_dssim=lambda_dssim)
        return ld["loss"], out["image"]

    (_, img), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params())
    # tiny unconverged fits occasionally spike; drop non-finite grads rather
    # than poisoning the whole batch (outputs are re-validated on the host,
    # with a sequential fallback per pair)
    grads = jax.tree.map(lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
    new_params, new_opt = adam_lib.apply(state.params(), grads, opt, lrs)
    # frozen (early-stopped) models keep their params and optimizer state
    sel = lambda n, o: jnp.where(active, n, o)
    new_params = jax.tree.map(sel, new_params, state.params())
    new_opt = adam_lib.AdamState(
        m=jax.tree.map(sel, new_opt.m, opt.m),
        v=jax.tree.map(sel, new_opt.v, opt.v),
        step=jnp.where(active, new_opt.step, opt.step))
    return state.replace_params(new_params), new_opt, psnr(img, gt)


@partial(jax.jit, static_argnames=("mode", "tile_args", "lambda_dssim",
                                   "n_iters", "early_stop"))
def batched_fit(states, opts, cameras, gts, lr_args, *, mode="auto",
                tile_args=None, lambda_dssim=0.2, n_iters=1000,
                early_stop=True):
    """Fit B local models to their target frames in one compiled loop.

    states/opts/cameras/gts: pytrees with leading B axis.
    lr_args: (lr_init_xyz [B], lr_final_xyz [B], max_steps, fixed_lrs dict
    of [B] per-group LRs for the non-xyz groups).
    """
    lr_init, lr_final, max_steps, fixed = lr_args
    B = gts.shape[0]

    step = jax.vmap(
        partial(_one_fit_step, mode=mode, tile_args=tile_args,
                lambda_dssim=lambda_dssim),
        in_axes=(0, 0, 0, 0, 0, 0))

    # match the sequential fallback (hierarchy.fit_single_image): 1-based
    # iterations for the xyz LR schedule, early stop after
    # min(500, iterations // 2)
    stop_after = min(500, n_iters // 2)

    def body(it, carry):
        states, opts, active = carry
        xyz_lr = jax.vmap(
            lambda i, f: adam_lib.expon_lr(it + 1, i, f, max_steps=max_steps)
        )(lr_init, lr_final)
        lrs = dict(fixed, means=xyz_lr)
        states, opts, ps = step(states, opts, cameras, gts, lrs, active)
        if early_stop:
            active = active & ~((ps > 35.0) & (it + 1 > stop_after))
        return states, opts, active

    active0 = jnp.ones((B,), bool)
    states, opts, _ = jax.lax.fori_loop(0, n_iters, body,
                                        (states, opts, active0))
    return states, opts


def _one_pose_step(state, delta, base, opt, camera, gt, lr, *,
                   mode, tile_args, lambda_dssim):
    def loss_fn(d):
        pose = se3_retr(d, base)
        out = render(state, camera, pose=pose, mode=mode,
                     tile_args=dict(tile_args) if tile_args else None)
        ld = compute_loss(out["image"], gt, lambda_dssim=lambda_dssim)
        return ld["loss"]

    g = jax.grad(loss_fn)(delta)
    g = jnp.where(jnp.isfinite(g), g, 0.0)
    params, new_opt = adam_lib.apply({"pose": delta}, {"pose": g}, opt,
                                     {"pose": lr})
    return params["pose"], new_opt


@partial(jax.jit, static_argnames=("mode", "tile_args", "lambda_dssim",
                                   "n_iters"))
def batched_pose_fit(states, bases, cameras, gts, lr, *, mode="auto",
                     tile_args=None, lambda_dssim=0.2, n_iters=300):
    """Optimize B SE(3) tangents against B frozen models. Returns [B, 6]."""
    B = gts.shape[0]
    deltas = jnp.zeros((B, 6), jnp.float32)
    opts = jax.vmap(lambda _: adam_lib.init(
        {"pose": jnp.zeros(6, jnp.float32)}))(jnp.arange(B))

    step = jax.vmap(
        partial(_one_pose_step, mode=mode, tile_args=tile_args,
                lambda_dssim=lambda_dssim),
        in_axes=(0, 0, 0, 0, 0, 0, None))

    def body(it, carry):
        deltas, opts = carry
        return step(states, deltas, bases, opts, cameras, gts, lr)

    deltas, opts = jax.lax.fori_loop(0, n_iters, body, (deltas, opts))
    return deltas


def stack_states(states) -> GaussianState:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def stack_cameras(cams) -> Camera:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
