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
footprints are evaluated per pixel from replicated parameters); the SSIM
term exchanges a 5-row halo between neighbor shards (losses.ssim_sharded),
so sharded gradients match the single-device step exactly.

Two step builders:
- `build_sharded_train_step`: minimal (render + L1/SSIM + Adam) — kept for
  the standalone-step tests and as the simplest template.
- `build_hierarchy_step`: full parity with train.step.gaussian_train_step
  (densification-probe gradients psum'ed over tiles, stats accumulation,
  traced apply_adam/track_stats flags so the densify/reset cadence causes
  zero recompiles, optional sharded depth loss) — this is what the
  orchestrator's parallel leaf trainer drives.

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
from ..train import densify as densify_lib
from ..train.losses import (l1_loss, psnr, ssim_sharded,
                            scale_shift_invariant_depth_loss_sharded)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host bring-up: initialize the JAX distributed runtime so
    `jax.devices()` spans every host of the pod slice.

    On TPU pods the three arguments are auto-discovered from the TPU
    metadata (plain `jax.distributed.initialize()`); for manual clusters
    (e.g. CPU multi-process tests) pass coordinator "host:port",
    num_processes and process_id explicitly. Idempotent: safe to call when
    the runtime is already up or when running single-process (the common
    single-host case is a no-op). Returns the global device count.

    The reference has no counterpart — it is single-GPU by construction
    (SURVEY.md §2.3); this is the pod-scale entry point that
    `run.py --distributed` calls before building the (segment, tile) mesh.
    """
    state = getattr(jax._src.distributed, "global_state", None)
    already = getattr(state, "client", None) if state is not None else None
    if already is None and (coordinator is not None
                            or num_processes is not None
                            or jax.process_count() == 1):
        try:
            if coordinator is None and num_processes is None:
                jax.distributed.initialize()     # TPU-pod auto-discovery
            else:
                jax.distributed.initialize(
                    coordinator_address=coordinator,
                    num_processes=num_processes, process_id=process_id)
        except (RuntimeError, ValueError):
            # single-process (no coordinator discoverable) — run local-only
            pass
    return len(jax.devices())


def make_mesh(n_segments: int, n_tiles: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_segments * n_tiles, (
        f"need {n_segments * n_tiles} devices, have {len(devices)}")
    dev = np.asarray(devices[: n_segments * n_tiles]).reshape(
        n_segments, n_tiles)
    return Mesh(dev, axis_names=("segment", "tile"))


def make_pod_mesh(n_tiles_per_segment: Optional[int] = None,
                  devices=None) -> Mesh:
    """Pod-topology (segment, tile) mesh: the tile axis (per-step pmean +
    halo exchange every iteration) stays inside a host's ICI domain; the
    segment axis (no per-step collectives — leaves are data-independent
    until merge) crosses hosts over DCN.

    Default: tile = all local devices of one process, segment = processes.
    With `n_tiles_per_segment` set, a process's devices are further split
    into multiple segments (n_local must divide evenly)."""
    devices = devices if devices is not None else jax.devices()
    n_local = max(1, len(devices) // max(1, jax.process_count()))
    tiles = n_tiles_per_segment or n_local
    n_seg = len(devices) // tiles
    # jax.devices() orders by (process, local id): reshaping (seg, tile)
    # keeps each tile group within one process's contiguous block whenever
    # tiles <= n_local, which is what pins the per-step collective to ICI
    dev = np.asarray(devices[: n_seg * tiles]).reshape(n_seg, tiles)
    return Mesh(dev, axis_names=("segment", "tile"))


def _row_block_camera(camera: Camera, block_h: int) -> Camera:
    """Camera for this shard's row block: shift cy, keep the full-image EWA
    clamp so projection (radii, valid) is shard-invariant."""
    row0 = jax.lax.axis_index("tile") * block_h
    return dataclasses.replace(
        camera, cy=camera.cy - row0.astype(jnp.float32), height=block_h,
        clip_tan_x=camera.tan_half_fovx,
        clip_tan_y=camera.tan_half_fovy)


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
        cam_local = _row_block_camera(camera, block_h)

        def loss_fn(params):
            s = state.replace_params(params)
            out = render(s, cam_local, mode=mode, tile_args=tile_args)
            l1 = jax.lax.pmean(l1_loss(out["image"], gt_block), "tile")
            if lambda_dssim:
                ds = 1.0 - ssim_sharded(out["image"], gt_block, "tile")
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


def unbatch_segments(tree, n: int):
    """Split a leading-axis-stacked pytree back into n per-segment pytrees."""
    return [jax.tree.map(lambda x: x[i], tree) for i in range(n)]


# ---------------------------------------------------------------------------
# full-featured sharded step (parity with train.step.gaussian_train_step)
# ---------------------------------------------------------------------------

# traced apply_adam codes (no recompiles across the densify/reset cadence)
APPLY_ALL = 0
APPLY_SKIP = 1          # densify iteration: grads dropped (reference quirk)
APPLY_NO_OPACITY = 2    # opacity-reset iteration


def build_hierarchy_step(mesh: Mesh, height: int, width: int, *,
                         mode: str = "tiled",
                         tile_args: Optional[dict] = None,
                         lambda_dssim: float = 0.2,
                         lambda_depth: float = 0.0):
    """The orchestrator's multi-leaf train step over the (segment, tile)
    mesh. Semantics match `gaussian_train_step` exactly (same loss, same
    densification-probe gradients psum'ed over the tile axis, same
    apply_adam modes — but batched over S data-independent leaf segments
    and row-block-sharded over the tile axis.

    step(states, opts, cameras, gts, lrs, depth_gts, apply_code, track_stats)
      states/opts/cameras: pytrees with leading S; gts [S, H, W, 3];
      lrs: dict of [S] per-group LRs; depth_gts [S, H, W] (zeros when
      lambda_depth == 0); apply_code: [] int32 (APPLY_*); track_stats []
      bool; active: [S] bool — inactive segments keep params/opt/stats.
    Returns (states', opts', metrics dict of [S] arrays).
    """
    n_tiles = mesh.shape["tile"]
    assert height % n_tiles == 0, (
        f"image height {height} must divide the tile axis size {n_tiles}")
    block_h = height // n_tiles

    def per_device(state: GaussianState, opt, camera, gt_block, depth_block,
                   lrs, apply_code, track_stats, active):
        cam_local = _row_block_camera(camera, block_h)
        probe0 = jnp.zeros((state.capacity, 2), state.means.dtype)

        def loss_fn(params, probe):
            s = state.replace_params(params)
            out = render(s, cam_local, means2d_probe=probe, mode=mode,
                         tile_args=tile_args)
            l1 = jax.lax.pmean(l1_loss(out["image"], gt_block), "tile")
            rgb = (1.0 - lambda_dssim) * l1
            ds = (1.0 - ssim_sharded(out["image"], gt_block, "tile")
                  ) if lambda_dssim else jnp.asarray(0.0)
            if lambda_depth:
                dp = jnp.clip(out["depth"], 0.02, 20.0)
                dep = scale_shift_invariant_depth_loss_sharded(
                    dp, depth_block, "tile")
            else:
                dep = jnp.asarray(0.0)
            loss = rgb + lambda_dssim * ds + lambda_depth * dep
            return loss, out

        (loss, out), (grads, probe_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params(), probe0)
        grads = jax.lax.pmean(grads, "tile")
        # the probe cotangent is in NDC*(0.5*camera.height) units; the local
        # camera's height is block_h, so rescale y to the full-image
        # convention before reducing
        probe_grad = probe_grad * jnp.asarray([1.0, float(n_tiles)],
                                              jnp.float32)
        probe_grad = jax.lax.pmean(probe_grad, "tile")

        upd = active.astype(jnp.float32)

        # stats (radii are shard-invariant by construction)
        tracked = densify_lib.accumulate_stats(state, probe_grad,
                                               out["radii"])
        do_track = track_stats.astype(jnp.float32) * upd
        state = dataclasses.replace(
            state,
            grad_accum=jnp.where(do_track > 0, tracked.grad_accum,
                                 state.grad_accum),
            grad_denom=jnp.where(do_track > 0, tracked.grad_denom,
                                 state.grad_denom),
            max_radii2d=jnp.where(do_track > 0, tracked.max_radii2d,
                                  state.max_radii2d))

        zero_op = (apply_code == APPLY_NO_OPACITY)
        grads = dict(grads)
        grads["opacity_logit"] = jnp.where(
            zero_op, 0.0, grads["opacity_logit"])
        cand_params, cand_opt = adam_lib.apply(state.params(), grads, opt,
                                               lrs)
        do_apply = (apply_code != APPLY_SKIP).astype(jnp.float32) * upd
        sel = lambda n, o: jnp.where(do_apply > 0, n, o)
        new_params = jax.tree.map(sel, cand_params, state.params())
        new_opt = adam_lib.AdamState(
            m=jax.tree.map(sel, cand_opt.m, opt.m),
            v=jax.tree.map(sel, cand_opt.v, opt.v),
            step=jnp.where(do_apply > 0, cand_opt.step, opt.step))

        mse = jax.lax.pmean(jnp.mean((out["image"] - gt_block) ** 2), "tile")
        metrics = {
            "loss": loss,
            "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-12)),
            "n_visible": jnp.sum((out["radii"] > 0).astype(jnp.int32)),
            "n_dropped": jax.lax.psum(
                out.get("n_dropped", jnp.asarray(0, jnp.int32)), "tile"),
            # split overflow diagnostics so the parallel auto-grow can grow
            # only the exhausted capacity (same policy as the single-chip
            # trainer's host_train_step)
            "n_dropped_m": jax.lax.psum(
                out.get("n_dropped_m", jnp.asarray(0, jnp.int32)), "tile"),
            "n_dropped_tile": jax.lax.psum(
                out.get("n_dropped_tile", jnp.asarray(0, jnp.int32)),
                "tile"),
            "n_dropped_compact": jax.lax.psum(
                out.get("n_dropped_compact", jnp.asarray(0, jnp.int32)),
                "tile"),
        }
        return state.replace_params(new_params), new_opt, metrics

    from jax import shard_map

    def spec_tree(tree, spec):
        return jax.tree.map(lambda _: spec, tree)

    def body(states, opts, cameras, gts, depth_gts, lrs, apply_code,
             track_stats, active):
        s1 = jax.tree.map(lambda x: x[0], states)
        o1 = jax.tree.map(lambda x: x[0], opts)
        c1 = jax.tree.map(lambda x: x[0], cameras)
        l1 = jax.tree.map(lambda x: x[0], lrs)
        ns, no, metrics = per_device(s1, o1, c1, gts[0], depth_gts[0], l1,
                                     apply_code, track_stats, active[0])
        return (jax.tree.map(lambda x: x[None], ns),
                jax.tree.map(lambda x: x[None], no),
                jax.tree.map(lambda x: x[None], metrics))

    @jax.jit
    def step(states, opts, cameras, gts, depth_gts, lrs, apply_code,
             track_stats, active):
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(
                spec_tree(states, P("segment")),
                spec_tree(opts, P("segment")),
                spec_tree(cameras, P("segment")),
                P("segment", "tile", None, None),
                P("segment", "tile", None),
                spec_tree(lrs, P("segment")),
                P(),
                P(),
                P("segment"),
            ),
            out_specs=(
                spec_tree(states, P("segment")),
                spec_tree(opts, P("segment")),
                {"loss": P("segment"), "psnr": P("segment"),
                 "n_visible": P("segment"), "n_dropped": P("segment"),
                 "n_dropped_m": P("segment"),
                 "n_dropped_tile": P("segment"),
                 "n_dropped_compact": P("segment")},
            ),
            check_vma=False,
        )
        return fn(states, opts, cameras, gts, depth_gts, lrs,
                  apply_code, track_stats, active)

    def step_fixed(states, opts, cameras, gts, lrs, depth_gts=None,
                   apply_code=APPLY_ALL, track_stats=True, active=None):
        S = gts.shape[0]
        if depth_gts is None:
            depth_gts = jnp.zeros(gts.shape[:3], jnp.float32)
        if active is None:
            active = jnp.ones((S,), bool)
        return step(states, opts, cameras, gts, depth_gts, lrs,
                    jnp.asarray(apply_code, jnp.int32),
                    jnp.asarray(track_stats, bool), jnp.asarray(active))

    return step_fixed


# vmapped compaction ops for stacked leaf states (run jitted on the stacked
# [S, ...] arrays; with a (segment, tile) mesh XLA shards them over the
# leading axis and replicates the result)
batched_densify_and_prune = jax.jit(jax.vmap(
    densify_lib.densify_and_prune,
    in_axes=(0, 0, 0, None, None, 0, None, None, None)))
batched_reset_opacity = jax.jit(jax.vmap(densify_lib.reset_opacity))
