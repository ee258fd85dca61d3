"""Parallel leaf-segment training over the (segment, tile) device mesh.

The reference trains hierarchy leaves strictly sequentially on one GPU
(`/root/reference/trainer/ht3dgs_trainer.py:710-764`); leaf segments are
data-independent until merge, so on TPU we train S of them concurrently:
each leaf's model replicates over its segment group's tile shards, images
row-shard over the tile axis, and parameter gradients pmean over tiles
(parallel.mesh.build_hierarchy_step). The host walks all S leaves in
lockstep — the 'even' partition gives every leaf the same schedule
(init fit, per-frame replay counts, densify/reset cadence), so one shared
iteration counter drives the whole batch; leaves that run out of frames
early are frozen via the step's `active` mask.

Semantics parity with the sequential path (hierarchy._train_leaf_segment /
train_leaf): same losses, same apply_adam modes, same densify cadence and
use_screen rule, same replay sampling distribution and VFI multi-source
supervision — only the RNG stream differs (one independent stream per leaf
instead of one shared stream; same distributions).
"""

from __future__ import annotations

import random
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..core import adam as adam_lib
from ..parallel import mesh as mesh_lib
from . import phase_a as pa
from .lockstep import LockstepEngine, _grow_stacked, _stack_images

__all__ = ["train_leaf_segments_parallel", "_grow_stacked",
           "_stack_images"]


class _LeafCtx:
    """Host-side bookkeeping for one leaf while its state lives stacked on
    the device."""

    def __init__(self, frames, seed, seq_len):
        self.frames = frames
        self.rng = random.Random(seed)
        self.visited = [frames[0]]
        self.poses = np.tile(np.eye(4, dtype=np.float32), (seq_len, 1, 1))
        self.start_fidx = frames[0]
        self.active = True

    def get_RT(self, idx):
        return self.poses[idx]

    def set_RT(self, idx, pose):
        self.poses[idx] = pose.astype(np.float32)

    def sample_training_frame(self):
        """70% recent-half bias (same distribution as
        HTGaussianTrainer.sample_training_frame)."""
        last = max(1, len(self.visited) // 2)
        if self.rng.random() < 0.7:
            i = self.rng.randint(last, len(self.visited) - 1)
        else:
            i = self.rng.randint(1, last)
        return self.visited[i]


def train_leaf_segments_parallel(tr, frame_lists: List[List[int]],
                                 devices=None):
    """Train S = len(frame_lists) leaf segments concurrently. Returns a list
    of ModelBundle (same contract as HTGaussianTrainer._train_leaf_segment,
    including tr.global_iteration left at the shared final value)."""
    from .hierarchy import ModelBundle, _round_capacity

    S = len(frame_lists)
    n_tiles = max(1, tr.pipe_cfg.mesh_tiles)
    mesh = mesh_lib.make_mesh(S, n_tiles, devices=devices)
    o = tr.sched
    use_vfi_mss = ("vfi" in tr.pipe_cfg.multi_source_supervision
                   and tr.vfi_provider is not None)

    f0s = [fr[0] for fr in frame_lists]
    pcds = [tr.prepare_pcd(f0) for f0 in f0s]
    # pre-size the shared static capacity from the init point clouds so
    # densification does not force mid-run re-allocs (each one recompiles
    # the stacked graph)
    presize = max(1.0, getattr(tr.pipe_cfg, "capacity_presize", 1.0))
    cap = max(_round_capacity(int(len(p.points) * 1.5 * presize))
              for p in pcds)
    bundles = [tr.make_model(p, capacity=cap) for p in pcds]
    radii = jnp.asarray([b.radius for b in bundles], jnp.float32)
    ctxs = [_LeafCtx(fr, seed=1000 + 7 * i, seq_len=tr.seq_len)
            for i, fr in enumerate(frame_lists)]

    cam0 = tr.camera_for(f0s[0])
    H, W = int(cam0.height), int(cam0.width)

    states = pa.stack_states([b.state for b in bundles])
    opts = pa.stack_states([b.opt for b in bundles])
    eng = LockstepEngine(tr, mesh, states, opts, radii,
                         [b.spatial_scale for b in bundles], H, W,
                         label="parallel leaves")

    # ------------------------------------------------------------------ #
    # leaf init: leaf_init_iters on each first frame, densify off
    tr.logger.info(f"[parallel leaves] init fit on frames {f0s} "
                   f"(mesh {dict(mesh.shape)}, cap {cap})")
    cams_init = pa.stack_cameras([tr.camera_for(f0) for f0 in f0s])
    gts_init = _stack_images([tr.load_image(f0) for f0 in f0s])
    depth_init = None
    if o.lambda_depth:
        depth_init = _stack_images([tr.get_depth(f0) for f0 in f0s])
    for it in range(1, o.leaf_init_iters + 1):
        eng.states, eng.opts, m = eng.step(
            eng.states, eng.opts, cams_init, gts_init, eng.lrs_for(it),
            depth_gts=depth_init, apply_code=mesh_lib.APPLY_ALL,
            track_stats=False)
        if it % 200 == 0:
            tr.logger.info(f"[parallel init] it {it} "
                           f"psnr {np.asarray(m['psnr']).round(2)}")
    # training_setup(fit_pose=True) recreates Adam (moments zeroed)
    eng.opts = adam_lib.AdamState(
        m=jax.tree.map(jnp.zeros_like, eng.states.params()),
        v=jax.tree.map(jnp.zeros_like, eng.states.params()),
        step=jnp.zeros((S,), jnp.int32))

    giter = 0

    def one_iteration(cam_gt_per_leaf, iteration, *, densify=True,
                      interval=None, sched=None, active=None):
        """One lockstep train iteration across all leaves (shared engine,
        lockstep.LockstepEngine.one_iteration)."""
        if active is None:
            active = [c.active for c in ctxs]
        return eng.one_iteration(
            cam_gt_per_leaf, iteration, sched=sched, interval=interval,
            active=active, densify=densify,
            gts=_stack_images([g for (_, g) in cam_gt_per_leaf]))

    def cam_gt(ctx, fidx, use_vfi):
        """_frame_camera_gt against host-side leaf poses."""
        pose = ctx.get_RT(fidx)
        if use_vfi:
            half = tr.pose_dict.get(f"rel_pose_{fidx}_to_{fidx}.5")
            if half is None:
                return tr.camera_for(fidx, pose=pose), tr.load_image(fidx)
            return (tr.camera_for(fidx, pose=half @ pose), tr.get_vfi(fidx))
        return tr.camera_for(fidx, pose=pose), tr.load_image(fidx)

    # ------------------------------------------------------------------ #
    # lockstep frame walk
    n_steps = max(len(fr) for fr in frame_lists) - 1
    for j in range(n_steps):
        for ctx in ctxs:
            if j + 1 < len(ctx.frames):
                fidx = ctx.frames[j + 1]
                rel = tr.pose_dict[f"rel_pose_{fidx - 1}_to_{fidx}"]
                ctx.set_RT(fidx, rel @ ctx.get_RT(fidx - 1))
                ctx.visited.append(fidx)
                ctx.active = True
            else:
                ctx.active = False
        cur = [ctx.frames[min(j + 1, len(ctx.frames) - 1)] for ctx in ctxs]

        # reset-recovery replay (train_leaf, just_reset branch)
        if eng.just_reset:
            eng.just_reset = False
            for _ in range(1, o.reset_recovery_iters):
                giter += 1
                pairs = []
                for ctx, f in zip(ctxs, cur):
                    fr = ctx.rng.randint(0, max(0, f - 1))
                    pairs.append(cam_gt(ctx, fr, False))
                one_iteration(pairs, giter,
                              interval=o.densification_interval_leaf)

        for it in range(1, o.single_step + 1):
            giter += 1
            pairs = []
            for ctx in ctxs:
                fidx = ctx.sample_training_frame()
                use_vfi = (use_vfi_mss and fidx + 1 < tr.seq_len
                           and ctx.rng.random() < o.mss_phase2_ratio)
                pairs.append(cam_gt(ctx, fidx, use_vfi))
            m = one_iteration(pairs, giter,
                              interval=o.densification_interval_leaf)
            if it % 100 == 0:
                tr.logger.info(
                    f"[parallel leaves] git {giter} frames {cur} "
                    f"psnr {np.asarray(m['psnr']).round(2)}")
        tr.logger.info(f"[parallel leaves] finished frame step {j + 1}"
                       f"/{n_steps} (frames {cur})")

    # ------------------------------------------------------------------ #
    # unstack into ModelBundles
    out = []
    states_list = mesh_lib.unbatch_segments(eng.states, S)
    opts_list = mesh_lib.unbatch_segments(eng.opts, S)
    for i, (st, op) in enumerate(zip(states_list, opts_list)):
        b = bundles[i]
        out.append(ModelBundle(
            state=st, opt=op, radius=b.radius,
            spatial_scale=b.spatial_scale, poses=ctxs[i].poses,
            global_iteration=giter, start_fidx=ctxs[i].start_fidx,
            to_visit_frames=list(frame_lists[i])))
    tr.global_iteration = giter
    return out
