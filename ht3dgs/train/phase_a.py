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
parallel): `shard_batch` places the stacked inputs with the leading axis
partitioned over all devices and GSPMD partitions the whole vmapped fit
graph along it — no collectives exist in the graph, so per-chip work is
B/n fits (the orchestrator applies it whenever B divides the device
count; hierarchy.py Phase A batched path and __graft_entry__'s dryrun).

Early stopping (reference: PSNR>35 after 500 iters) is reproduced with a
per-model `active` mask folded into the update, so batched results match
the sequential schedule's dynamics.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

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


# Iterations per device execution. The remote single-chip TPU service
# (axon) kills its worker when ONE device execution runs longer than
# roughly a minute (measured: a pure-matmul fori_loop survives at 38 s and
# crashes at ~75 s; a batched Phase A fit at 288x384 crashed reproducibly
# past ~40 s — tools/phase_a_repro.py). Long fitting loops therefore run
# as host-chunked segments of EXEC_CHUNK iterations: semantically
# identical (the iteration offset threads through the LR schedule and
# early-stop, and masked iterations freeze the carry), at one dispatch
# round-trip per chunk. The kill threshold is nondeterministic (a ~25 s
# execution survived once and hung the worker the next time), so the chunk
# targets single-digit-second executions for the heaviest Phase A shapes.
EXEC_CHUNK = 25


@partial(jax.jit, static_argnames=("mode", "tile_args", "lambda_dssim",
                                   "n_iters", "early_stop"))
def _batched_fit_exec(states, opts, cameras, gts, lr_args, active, it0,
                      n_total, stop_after, *, mode="auto", tile_args=None,
                      lambda_dssim=0.2, n_iters=EXEC_CHUNK,
                      early_stop=True):
    lr_init, lr_final, max_steps, fixed = lr_args

    step = jax.vmap(
        partial(_one_fit_step, mode=mode, tile_args=tile_args,
                lambda_dssim=lambda_dssim),
        in_axes=(0, 0, 0, 0, 0, 0))

    def body(it, carry):
        states, opts, active = carry
        g = it0 + it
        # match the sequential fallback (hierarchy.fit_single_image):
        # 1-based iterations for the xyz LR schedule
        xyz_lr = jax.vmap(
            lambda i, f: adam_lib.expon_lr(g + 1, i, f, max_steps=max_steps)
        )(lr_init, lr_final)
        lrs = dict(fixed, means=xyz_lr)
        eff = active & (g < n_total)     # pad iterations freeze the carry
        states, opts, ps = step(states, opts, cameras, gts, lrs, eff)
        if early_stop:
            active = active & ~((ps > 35.0) & (g + 1 > stop_after))
        return states, opts, active

    return jax.lax.fori_loop(0, n_iters, body, (states, opts, active))


def shard_batch(tree, devices=None, batch_dim: Optional[int] = None):
    """Place every [B, ...] leaf of a stacked pytree with its leading
    batch axis partitioned across the devices (1-D "batch" mesh); leaves
    whose leading dim does not divide the device count stay replicated.
    The batched Phase A fits are collective-free, so GSPMD partitions the
    whole vmapped graph along the batch axis — embarrassingly parallel
    pose/fit work at B/n models per chip.

    No-op (tree untouched, single-device placement) when the batch size —
    `batch_dim` if given, else the largest leaf leading dim — does not
    divide the device count: replicating everything onto an n-device SPMD
    program would multiply the work n-fold for nothing."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # LOCAL devices only: device_put of host arrays onto a sharding that
    # spans other processes' devices is rejected by JAX. Multi-host Phase
    # A parallelism comes from segment-level work division, not this.
    devices = list(devices) if devices is not None else jax.local_devices()
    n = len(devices)
    if n <= 1:
        return tree
    if batch_dim is None:
        dims = [x.shape[0] for x in jax.tree.leaves(tree)
                if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1]
        batch_dim = max(dims) if dims else 0
    if batch_dim % n != 0 or batch_dim == 0:
        return tree
    mesh = Mesh(np.asarray(devices), ("batch",))

    def place(x):
        x = jnp.asarray(x)
        spec = (P("batch") if x.ndim >= 1 and x.shape[0] % n == 0
                else P())
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def batched_fit(states, opts, cameras, gts, lr_args, *, mode="auto",
                tile_args=None, lambda_dssim=0.2, n_iters=1000,
                early_stop=True, exec_chunk=EXEC_CHUNK, stop_after=None):
    """Fit B local models to their target frames (host-chunked compiled
    loops — see EXEC_CHUNK).

    states/opts/cameras/gts: pytrees with leading B axis.
    lr_args: (lr_init_xyz [B], lr_final_xyz [B], max_steps, fixed_lrs dict
    of [B] per-group LRs for the non-xyz groups).
    """
    B = gts.shape[0]
    active = jnp.ones((B,), bool)
    if stop_after is None:
        # early stop after min(500, iterations // 2), as the sequential path
        stop_after = min(500, n_iters // 2)
    stop_after = jnp.asarray(stop_after, jnp.int32)
    n_total = jnp.asarray(n_iters, jnp.int32)
    chunk = min(exec_chunk, n_iters)
    it0 = jnp.asarray(0, jnp.int32)
    for _ in range(-(-n_iters // chunk)):
        states, opts, active = _batched_fit_exec(
            states, opts, cameras, gts, lr_args, active, it0, n_total,
            stop_after, mode=mode, tile_args=tile_args,
            lambda_dssim=lambda_dssim, n_iters=chunk,
            early_stop=early_stop)
        it0 = it0 + chunk
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
                                   "n_iters", "shared_state"))
def _batched_pose_exec(states, bases, cameras, gts, lr, deltas, opts, it0,
                       n_total, *, mode="auto", tile_args=None,
                       lambda_dssim=0.2, n_iters=EXEC_CHUNK,
                       shared_state=False):
    # shared_state: ONE frozen model serves every pose in the batch
    # (eval_nvs test-time pose optimization) — broadcast instead of
    # stacking B copies of the full Gaussian state
    step = jax.vmap(
        partial(_one_pose_step, mode=mode, tile_args=tile_args,
                lambda_dssim=lambda_dssim),
        in_axes=(None if shared_state else 0, 0, 0, 0, 0, 0, None))

    def body(it, carry):
        deltas, opts = carry
        new_deltas, new_opts = step(states, deltas, bases, opts, cameras,
                                    gts, lr)
        live = it0 + it < n_total        # pad iterations freeze the carry
        deltas = jnp.where(live, new_deltas, deltas)
        opts = jax.tree.map(lambda n, o: jnp.where(live, n, o),
                            new_opts, opts)
        return deltas, opts

    return jax.lax.fori_loop(0, n_iters, body, (deltas, opts))


def batched_pose_fit(states, bases, cameras, gts, lr, *, mode="auto",
                     tile_args=None, lambda_dssim=0.2, n_iters=300,
                     exec_chunk=EXEC_CHUNK, shared_state=False,
                     deltas0=None):
    """Optimize B SE(3) tangents against B frozen models (host-chunked
    compiled loops — see EXEC_CHUNK). Returns [B, 6].

    shared_state=True: `states` is ONE (unstacked) frozen model shared by
    every pose in the batch — the eval_nvs test-time-pose-optimization
    shape, where stacking B copies of the full scene model would blow HBM.
    deltas0: warm-start tangents (the coarse-to-fine wrapper's fine stage).
    """
    B = gts.shape[0]
    deltas = (jnp.zeros((B, 6), jnp.float32) if deltas0 is None
              else jnp.asarray(deltas0))
    opts = jax.vmap(lambda _: adam_lib.init(
        {"pose": jnp.zeros(6, jnp.float32)}))(jnp.arange(B))
    n_total = jnp.asarray(n_iters, jnp.int32)
    chunk = min(exec_chunk, n_iters)
    it0 = jnp.asarray(0, jnp.int32)
    for _ in range(-(-n_iters // chunk)):
        deltas, opts = _batched_pose_exec(
            states, bases, cameras, gts, lr, deltas, opts, it0, n_total,
            mode=mode, tile_args=tile_args, lambda_dssim=lambda_dssim,
            n_iters=chunk, shared_state=shared_state)
        it0 = it0 + chunk
    return deltas


def downscale_camera(cam: Camera, f: int) -> Camera:
    """Integer-divisor pyramid camera: same FoV, 1/f resolution."""
    import dataclasses

    assert cam.height % f == 0 and cam.width % f == 0, (cam.height,
                                                        cam.width, f)
    return dataclasses.replace(
        cam, fx=cam.fx / f, fy=cam.fy / f, cx=cam.cx / f, cy=cam.cy / f,
        height=cam.height // f, width=cam.width // f)


def downscale_images(imgs: jax.Array, f: int) -> jax.Array:
    """[B, H, W, 3] -> [B, H/f, W/f, 3] box average (antialiased)."""
    B, H, W, C = imgs.shape
    return imgs.reshape(B, H // f, f, W // f, f, C).mean(axis=(2, 4))


def batched_pose_fit_c2f(states, bases, cameras, gts, lr, *, mode="auto",
                         tile_args=None, lambda_dssim=0.2, n_iters=300,
                         exec_chunk=EXEC_CHUNK, shared_state=False,
                         stages=((4, 0.4), (1, 0.6))):
    """Coarse-to-fine batched pose fit: run `frac` of the budget at 1/f
    resolution (box-averaged gt, FoV-preserving pyramid camera), warm-
    starting each finer stage from the coarser tangents.

    An ht3dgs improvement over the reference (which fits at full
    resolution only, trainer/ht3dgs_trainer.py:307-333): large inter-frame
    motions put full-res photometric alignment outside its convergence
    basin; the coarse stage widens the basin at 1/f^2 the pixel cost.
    Opt-in (pipe.pose_c2f) — default OFF for reference parity."""
    deltas = None
    fracs = [frac for (_, frac) in stages]
    total = sum(fracs)
    H, W = int(gts.shape[1]), int(gts.shape[2])
    for (f, frac) in stages:
        # graceful degrade: if the resolution is not divisible by the
        # requested pyramid factor, fall back to the largest divisor <= f
        # (worst case 1 = skip the coarse stage) instead of aborting
        while f > 1 and (H % f or W % f):
            f -= 1
        it = max(1, int(round(n_iters * frac / total)))
        if f > 1:
            cams_f = downscale_camera(cameras, f)
            gts_f = downscale_images(gts, f)
        else:
            cams_f, gts_f = cameras, gts
        deltas = batched_pose_fit(
            states, bases, cams_f, gts_f, lr, mode=mode,
            tile_args=tile_args, lambda_dssim=lambda_dssim, n_iters=it,
            exec_chunk=exec_chunk, shared_state=shared_state,
            deltas0=deltas)
    return deltas


def stack_states(states) -> GaussianState:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def stack_cameras(cams) -> Camera:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
