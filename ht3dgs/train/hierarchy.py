"""Hierarchical-training orchestrator.

TPU-native re-implementation of the reference `HTGaussianTrainer`
(`/root/reference/trainer/ht3dgs_trainer.py`): per-frame relative-pose
estimation through a differentiable renderer (Phase A), binary-hierarchy
partition of the frame sequence (Phase B), leaf-segment training with replay
sampling + VFI multi-source supervision, non-leaf training with pseudo-views
from frozen children (MSS phase 1) and replay+VFI (phase 2), importance-
pruned SE(3)-re-anchored merges, and the eval/render modes.

All device work happens in the jitted steps of `ht3dgs.train.step`; this
module is host-side control flow (python), which is the correct split on
TPU: the inner loop stays compiled, while the schedule — which the
reference interleaves with CUDA calls — costs nothing here.

Poses are stored as numpy [4,4] w2c matrices per frame per model, anchored
at each segment's first frame (identity there), exactly like the reference's
lietorch pose list `P` with zero tangents.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
import random
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import adam as adam_lib
from ..core import gaussians as G
from ..core import se3
from ..core.gaussians import GaussianState
from ..data.pointcloud import PointCloud
from ..raster import render
from . import step as step_lib
from .trainer import GaussianTrainer


def _round_capacity(n: int) -> int:
    cap = 512
    while cap < n:
        cap *= 2
    return cap


def _sync_device(tree) -> None:
    """Hard execution barrier: host-fetch one scalar. The remote (axon)
    TPU client wedges when a deep queue of executions and transfers builds
    up (and block_until_ready can return before execution completes on this
    runtime), so the batched Phase A synchronizes between its big dispatch
    groups."""
    import jax.tree_util as jtu

    leaf = jtu.tree_leaves(tree)[0]
    float(jnp.ravel(leaf)[0])


@dataclass
class ModelBundle:
    """One 3DGS model (a leaf or merged segment) + its optimizer + poses."""

    state: GaussianState
    opt: adam_lib.AdamState
    radius: float               # scene extent for densify thresholds
    spatial_scale: float        # xyz-LR scale (create_from_pcd arg)
    poses: Optional[np.ndarray] = None   # [F, 4, 4] w2c
    global_iteration: int = 0
    start_fidx: int = 0
    to_visit_frames: List[int] = field(default_factory=list)

    def get_RT(self, idx: int) -> np.ndarray:
        if self.poses is None:
            return np.eye(4, dtype=np.float32)
        return self.poses[idx]

    def set_RT(self, idx: int, pose: np.ndarray):
        self.poses[idx] = pose.astype(np.float32)

    def fresh_adam(self):
        """training_setup semantics: torch recreates Adam => moments reset."""
        self.opt = adam_lib.init(self.state.params())


class HTGaussianTrainer(GaussianTrainer):
    def __init__(self, data_path, model_cfg, pipe_cfg, optim_cfg, seed=0):
        super().__init__(data_path, model_cfg, pipe_cfg, optim_cfg)
        self.train_level = pipe_cfg.train_level
        self.seed = seed
        self.rng = random.Random(seed)
        self.key = jax.random.PRNGKey(seed)
        self.pose_dict: Dict[str, np.ndarray] = {}
        self.just_reset = False
        self.global_iteration = 0
        self.near = 0.01
        # mutated schedule copy (hierarchical_training derives its own)
        self.sched = dataclasses.replace(optim_cfg)
        self._mode = pipe_cfg.render_mode
        self._tile_args = None  # auto-grown on overflow diagnostics
        k0 = getattr(pipe_cfg, "tile_max_per_tile", 0)
        d0 = getattr(pipe_cfg, "tile_dup_factor", 0)
        if k0 or d0:
            ta = {}
            if k0:
                ta["max_per_tile"] = int(k0)
            if d0:
                ta["dup_factor"] = int(d0)
            self._tile_args = tuple(sorted(ta.items()))
        self._steps_since_tune = 0
        from ..utils.profiling import PhaseTimer

        self.timer = PhaseTimer()

    # ------------------------------------------------------------------ #
    # model construction
    def make_model(self, pcd: PointCloud,
                   capacity: Optional[int] = None) -> ModelBundle:
        """init_model(BasicPointCloud) parity
        (/root/reference/scene/gaussian_model_ht.py:762-766)."""
        radius = float(np.linalg.norm(pcd.points, axis=1).max())
        # capacity_presize adds densification headroom up front so the 2x
        # realloc in _grow_capacity (a minutes-long recompile on the big
        # graph) stays a cold path; growths are counted + logged.
        presize = max(1.0, getattr(self.pipe_cfg, "capacity_presize", 1.0))
        cap = capacity or _round_capacity(int(len(pcd.points) * 1.5
                                              * presize))
        state = G.create_from_pcd(
            pcd.points, pcd.colors, cap,
            max_sh_degree=self.model_cfg.sh_degree,
            view_dependent=self.model_cfg.view_dependent)
        opt = adam_lib.init(state.params())
        return ModelBundle(state=state, opt=opt, radius=radius,
                           spatial_scale=radius)

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _lrs(self, iteration: int, bundle: ModelBundle,
             fix_feat: bool = False) -> Dict[str, jnp.ndarray]:
        o = self.sched
        xyz = adam_lib.expon_lr(
            iteration, o.position_lr_init * bundle.spatial_scale,
            o.position_lr_final * bundle.spatial_scale,
            max_steps=o.position_lr_max_steps)
        feat = 0.0 if fix_feat else 1.0
        return {
            "means": xyz,
            "sh_dc": jnp.asarray(o.feature_lr * feat, jnp.float32),
            "sh_rest": jnp.asarray(o.feature_lr / 20.0 * feat, jnp.float32),
            "opacity_logit": jnp.asarray(o.opacity_lr * feat, jnp.float32),
            "log_scales": jnp.asarray(o.scaling_lr * feat, jnp.float32),
            "quats": jnp.asarray(o.rotation_lr * feat, jnp.float32),
        }

    # ------------------------------------------------------------------ #
    # the host-side inner iteration (reference train_step,
    # ht3dgs_trainer.py:81-169)
    def host_train_step(self, bundle: ModelBundle, camera, gt_image,
                        iteration: int, *, densify=True, reset=True,
                        sched=None, densification_interval=None,
                        depth_gt=None, fix_feat=False):
        o = sched or self.sched
        interval = densification_interval or o.densification_interval

        in_densify_window = densify and iteration < o.densify_until_iter
        do_densify = (in_densify_window and iteration > o.densify_from_iter
                      and iteration % interval == 0)
        do_reset = (in_densify_window and reset
                    and iteration % o.opacity_reset_interval == 0
                    and iteration < o.reset_until_iter)

        apply_adam = "skip" if do_densify else (
            "no_opacity" if do_reset else "all")

        state, opt, metrics = step_lib.gaussian_train_step(
            bundle.state, bundle.opt, camera,
            jnp.asarray(gt_image),
            self._lrs(iteration, bundle, fix_feat=fix_feat),
            depth_gt=jnp.asarray(depth_gt) if depth_gt is not None else None,
            mode=self._mode,
            apply_adam=apply_adam,
            track_stats=in_densify_window,
            lambda_dssim=o.lambda_dssim,
            lambda_depth=o.lambda_depth if depth_gt is not None else 0.0,
            tile_args=self._tile_args,
        )
        bundle.state, bundle.opt = state, opt

        # auto-grow tile capacities when the tiled renderer reports entry
        # drops (checked sparsely — reading the metric syncs the device)
        self._steps_since_tune += 1
        if self._mode in ("tiled", "pallas", "auto") \
                and self._steps_since_tune >= 50:
            self._steps_since_tune = 0
            nd_m = int(metrics.get("n_dropped_m",
                                   metrics.get("n_dropped", 0)))
            nd_tile = int(metrics.get("n_dropped_tile", 0))
            if nd_m > 0 or nd_tile > 0:
                # grow only the exhausted capacity: global M overflow needs
                # a bigger dup_factor; per-tile list overflow a bigger
                # max_per_tile. Growing both on either signal (the old
                # policy) quadrupled step cost on dense leaf scenes whose
                # drops were M-side only.
                ta = dict(self._tile_args or {})
                if nd_tile > 0:
                    ta["max_per_tile"] = min(
                        2 * ta.get("max_per_tile", 1024), 4096)
                if nd_m > 0:
                    ta["dup_factor"] = min(2 * ta.get("dup_factor", 16), 64)
                new_args = tuple(sorted(ta.items()))
                if new_args != self._tile_args:   # silent once saturated
                    self._tile_args = new_args
                    self.logger.info(f"tile capacity grown: {ta}")

        if do_densify:
            use_screen = iteration > o.opacity_reset_interval
            bundle.state, bundle.opt, dropped = step_lib.densify_and_prune(
                bundle.state, bundle.opt, self._next_key(),
                jnp.asarray(o.densify_grad_threshold),
                jnp.asarray(0.005),
                jnp.asarray(bundle.radius),
                jnp.asarray(o.percent_dense),
                jnp.asarray(20.0),
                jnp.asarray(use_screen))
            if int(dropped) > 0:
                self._grow_capacity(bundle)
        if do_reset:
            bundle.state, bundle.opt = step_lib.reset_opacity(
                bundle.state, bundle.opt)
            self.just_reset = True
        return metrics

    def _grow_capacity(self, bundle: ModelBundle):
        """Double the static capacity (host-side realloc; triggers one
        recompile at the new shape).

        HT3DGS_MAX_CAPACITY (env) clamps growth: densify overflow past
        the clamp drops new Gaussians instead of reallocating — the
        bounded-memory/ops escape hatch for remote services whose
        compiler falls over on the doubled graph (observed: the axon
        worker dies compiling a 1M-cap 160x208 step mid-run). An env
        knob rather than config so a clamped relaunch keeps the same
        crumb config-fingerprint and resumes its own breadcrumbs."""
        st = bundle.state
        cap = st.capacity
        max_cap = int(os.environ.get("HT3DGS_MAX_CAPACITY", "0"))
        if max_cap and 2 * cap > max_cap:
            self.logger.warning(
                f"capacity growth {cap} -> {2 * cap} clamped by "
                f"HT3DGS_MAX_CAPACITY={max_cap}; densify overflow will "
                f"drop new Gaussians")
            return
        pad_rows = cap  # double

        def pad(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad_rows,) + x.shape[1:], x.dtype)], axis=0)

        bundle.state = dataclasses.replace(
            st,
            **{f: pad(getattr(st, f)) for f in G.PARAM_FIELDS},
            live=jnp.concatenate(
                [st.live, jnp.zeros((pad_rows,), bool)]),
            max_radii2d=pad(st.max_radii2d),
            grad_accum=pad(st.grad_accum),
            grad_denom=pad(st.grad_denom),
        )
        bundle.opt = adam_lib.AdamState(
            m={k: pad(v) for k, v in bundle.opt.m.items()},
            v={k: pad(v) for k, v in bundle.opt.v.items()},
            step=bundle.opt.step)
        self.n_capacity_grows = getattr(self, "n_capacity_grows", 0) + 1
        self.logger.info(
            f"capacity grown {cap} -> {2 * cap} "
            f"(growth/recompile #{self.n_capacity_grows})")

    # ------------------------------------------------------------------ #
    # Phase A primitives
    def fit_single_image(self, bundle: ModelBundle, idx: int,
                         iterations: int, early_stop: bool = True,
                         depth_gt=None):
        """train_single_image_3DGS / init fitting: fixed identity camera,
        densify off (ht3dgs_trainer.py:274-304)."""
        cam = self.camera_for(idx)
        gt = self.load_image(idx)
        bundle.fresh_adam()
        psnr = 0.0
        stop_after = min(500, iterations // 2)
        for it in range(1, iterations + 1):
            m = self.host_train_step(bundle, cam, gt, it, densify=False,
                                     depth_gt=depth_gt)
            # reading the metric syncs the device; poll the early-stop
            # sparsely so steps stay enqueued ahead of the host
            if it % 25 == 0 or it == iterations:
                psnr = float(m["psnr"])
                if early_stop and psnr > 35.0 and it > stop_after:
                    break
            if it % 100 == 0:
                self.logger.info(
                    f"[fit_single {idx}] it {it} psnr {psnr:.2f} "
                    f"n={int(bundle.state.n_live())}")
        return psnr

    def fit_single_image_vfi(self, bundle: ModelBundle, idx: int,
                             iterations: int):
        cam = self.camera_for(idx)
        gt = self.get_vfi(idx)
        bundle.fresh_adam()
        stop_after = min(500, iterations // 2)
        for it in range(1, iterations + 1):
            m = self.host_train_step(bundle, cam, gt, it, densify=False)
            if (it % 25 == 0 and float(m["psnr"]) > 35.0
                    and it > stop_after):
                break

    def _pose_fitter(self):
        """batched_pose_fit, or its coarse-to-fine wrapper when
        pipe.pose_c2f is set (phase_a.batched_pose_fit_c2f)."""
        from . import phase_a as pa

        if getattr(self.pipe_cfg, "pose_c2f", False):
            return pa.batched_pose_fit_c2f
        return pa.batched_pose_fit

    def fit_relative_pose(self, bundle: ModelBundle, gt_image,
                          camera, iterations: int = 300) -> np.ndarray:
        """train_relative_pose: optimize only an SE(3) tangent against
        frozen Gaussians (ht3dgs_trainer.py:307-333). Returns w2c 4x4."""
        from . import phase_a as pa

        # all `iterations` pose steps run in ONE jitted fori_loop (B=1 batch
        # of the batched Phase A kernel) — no per-iteration host round-trip
        states = pa.stack_states([bundle.state])
        bases = jnp.asarray([[0, 0, 0, 0, 0, 0, 1]], jnp.float32)
        cams = pa.stack_cameras([camera])
        gts = jnp.asarray(gt_image)[None]
        lr = jnp.asarray(self.sched.rotation_lr
                 if self.sched.pose_lr is None
                 else self.sched.pose_lr, jnp.float32)
        deltas = self._pose_fitter()(
            states, bases, cams, gts, lr, mode=self._mode,
            tile_args=self._tile_args,
            lambda_dssim=self.sched.lambda_dssim, n_iters=iterations)
        pose = se3.se3_exp(deltas[0])
        return np.asarray(se3.se3_to_matrix(pose), np.float32)

    def compute_relative_pose(self, view_idx: int, view_idx_prev: int):
        """Phase A: pose of frame `view_idx` w.r.t. `view_idx_prev`
        (ht3dgs_trainer.py:336-431). With train_pose_mode='vfi', two
        half-steps through the interpolated frame are composed."""
        key = f"rel_pose_{view_idx_prev}_to_{view_idx}"
        if key in self.pose_dict:
            return
        use_vfi = (self.pipe_cfg.train_pose_mode == "vfi"
                   and self.vfi_provider is not None)

        pcd = self.prepare_pcd(view_idx_prev)
        local = self.make_model(pcd)
        self.logger.info(f"[Phase A] fit frame {view_idx_prev}")
        self.fit_single_image(local, view_idx_prev, self.sched.phase_a_fit_iters)

        cam_ref = self.camera_for(view_idx)
        gt_ref = self.load_image(view_idx)

        if not use_vfi:
            rel = self.fit_relative_pose(local, gt_ref, cam_ref, self.sched.phase_a_pose_iters)
            self.pose_dict[key] = rel
            self._save_partial_poses()
            return

        pcd_vfi = self.prepare_pcd(view_idx_prev, use_vfi_frame=True)
        local_vfi = self.make_model(pcd_vfi)
        self.logger.info(f"[Phase A] fit frame {view_idx_prev}+0.5 (VFI)")
        self.fit_single_image_vfi(local_vfi, view_idx_prev, self.sched.phase_a_fit_iters)

        gt_vfi = self.get_vfi(view_idx_prev)
        cam_vfi = self.camera_for(view_idx_prev)
        rel1 = self.fit_relative_pose(local, gt_vfi, cam_vfi, self.sched.phase_a_pose_iters)
        rel2 = self.fit_relative_pose(local_vfi, gt_ref, cam_ref, self.sched.phase_a_pose_iters)
        self.pose_dict[f"rel_pose_{view_idx_prev}_to_{view_idx_prev}.5"] = rel1
        self.pose_dict[f"rel_pose_{view_idx_prev}.5_to_{view_idx}"] = rel2
        self.pose_dict[key] = rel2 @ rel1
        self._save_partial_poses()

    # ------------------------------------------------------------------ #
    # Phase A, batched (TPU-parallel pairs; see train.phase_a)
    def compute_relative_poses_batched(self):
        from . import phase_a as pa

        B = self.pipe_cfg.phase_a_batch
        pairs = [(f, f - 1) for f in range(1, self.seq_len)
                 if f"rel_pose_{f - 1}_to_{f}" not in self.pose_dict]
        if not pairs or B <= 0:
            return
        use_vfi = (self.pipe_cfg.train_pose_mode == "vfi"
                   and self.vfi_provider is not None)
        o = self.sched
        self.logger.info(f"[Phase A/batched] {len(pairs)} pairs, batch {B}")

        # Prepare ALL point clouds up front and fit every chunk at ONE
        # common capacity: a single compiled fit executable serves the whole
        # phase (per-chunk capacities forced a recompile per distinct cap),
        # and the depth-unprojection device work stays out of the fit
        # dispatch stream — interleaving many distinct executables with the
        # chunked fits wedged the remote TPU client (see _sync_device).
        all_pcds = {prev: self.prepare_pcd(prev) for (_, prev) in pairs}
        all_vfi_pcds = {}
        if use_vfi:
            all_vfi_pcds = {prev: self.prepare_pcd(prev, use_vfi_frame=True)
                            for (_, prev) in pairs}
        cap = max(_round_capacity(int(len(p.points) * 1.5))
                  for p in list(all_pcds.values())
                  + list(all_vfi_pcds.values()))

        for i0 in range(0, len(pairs), B):
            chunk = pairs[i0:i0 + B]
            # pad the chunk by repeating the last pair (results discarded)
            padded = chunk + [chunk[-1]] * (B - len(chunk))

            pcds = [all_pcds[prev] for (_, prev) in padded]
            bundles = [self.make_model(p, capacity=cap) for p in pcds]
            states = pa.stack_states([b.state for b in bundles])
            opts = pa.stack_states([b.opt for b in bundles])
            cams = pa.stack_cameras(
                [self.camera_for(prev) for (_, prev) in padded])
            gts = jnp.stack([jnp.asarray(self.load_image(prev))
                             for (_, prev) in padded])
            lr_args = (
                jnp.asarray([o.position_lr_init * b.spatial_scale
                             for b in bundles], jnp.float32),
                jnp.asarray([o.position_lr_final * b.spatial_scale
                             for b in bundles], jnp.float32),
                o.position_lr_max_steps,
                {
                    "sh_dc": jnp.full((B,), o.feature_lr, jnp.float32),
                    "sh_rest": jnp.full((B,), o.feature_lr / 20.0,
                                        jnp.float32),
                    "opacity_logit": jnp.full((B,), o.opacity_lr,
                                              jnp.float32),
                    "log_scales": jnp.full((B,), o.scaling_lr, jnp.float32),
                    "quats": jnp.full((B,), o.rotation_lr, jnp.float32),
                },
            )
            # multi-chip: partition the batch axis across the devices —
            # the fits are collective-free, so GSPMD runs B/n per chip
            states, opts, cams, gts, lr_args = pa.shard_batch(
                (states, opts, cams, gts, lr_args))
            states, opts = pa.batched_fit(
                states, opts, cams, gts, lr_args, mode=self._mode,
                tile_args=self._tile_args, lambda_dssim=o.lambda_dssim,
                n_iters=o.phase_a_fit_iters)
            _sync_device(states)
            self.logger.info(f"[Phase A/batched] fitted pairs {chunk}")

            bases = pa.shard_batch(jnp.broadcast_to(
                jnp.asarray([0, 0, 0, 0, 0, 0, 1], jnp.float32), (B, 7)))
            lr = jnp.asarray(o.rotation_lr if o.pose_lr is None
                 else o.pose_lr, jnp.float32)

            if not use_vfi:
                cams_ref, gts_ref = pa.shard_batch((
                    pa.stack_cameras(
                        [self.camera_for(f) for (f, _) in padded]),
                    jnp.stack([jnp.asarray(self.load_image(f))
                               for (f, _) in padded])))
                deltas = self._pose_fitter()(
                    states, bases, cams_ref, gts_ref, lr, mode=self._mode,
                    tile_args=self._tile_args, lambda_dssim=o.lambda_dssim,
                    n_iters=o.phase_a_pose_iters)
                rels = np.asarray(se3.se3_to_matrix(se3.se3_exp(deltas)))
                for (f, prev), rel in zip(chunk, rels):
                    self.pose_dict[f"rel_pose_{prev}_to_{f}"] = \
                        rel.astype(np.float32)
                self._save_partial_poses()
                continue

            # VFI: fit a second batch of local models to the midway frames,
            # then compose the two half-step poses
            pcds_v = [all_vfi_pcds[prev] for (_, prev) in padded]
            bundles_v = [self.make_model(p, capacity=cap) for p in pcds_v]
            states_v = pa.stack_states([b.state for b in bundles_v])
            opts_v = pa.stack_states([b.opt for b in bundles_v])
            gts_v = jnp.stack([jnp.asarray(self.get_vfi(prev))
                               for (_, prev) in padded])
            lr_args_v = (
                jnp.asarray([o.position_lr_init * b.spatial_scale
                             for b in bundles_v], jnp.float32),
                jnp.asarray([o.position_lr_final * b.spatial_scale
                             for b in bundles_v], jnp.float32),
                o.position_lr_max_steps, lr_args[3])
            states_v, opts_v, gts_v, lr_args_v = pa.shard_batch(
                (states_v, opts_v, gts_v, lr_args_v))
            states_v, opts_v = pa.batched_fit(
                states_v, opts_v, cams, gts_v, lr_args_v, mode=self._mode,
                tile_args=self._tile_args, lambda_dssim=o.lambda_dssim,
                n_iters=o.phase_a_fit_iters)
            _sync_device(states_v)

            # half-step 1: base model -> VFI frame; half-step 2: VFI model
            # -> frame f
            deltas1 = self._pose_fitter()(
                states, bases, cams, gts_v, lr, mode=self._mode,
                tile_args=self._tile_args, lambda_dssim=o.lambda_dssim,
                n_iters=o.phase_a_pose_iters)
            _sync_device(deltas1)
            cams_ref, gts_ref = pa.shard_batch((
                pa.stack_cameras(
                    [self.camera_for(f) for (f, _) in padded]),
                jnp.stack([jnp.asarray(self.load_image(f))
                           for (f, _) in padded])))
            deltas2 = self._pose_fitter()(
                states_v, bases, cams_ref, gts_ref, lr, mode=self._mode,
                tile_args=self._tile_args, lambda_dssim=o.lambda_dssim,
                n_iters=o.phase_a_pose_iters)
            rel1 = np.asarray(se3.se3_to_matrix(se3.se3_exp(deltas1)))
            rel2 = np.asarray(se3.se3_to_matrix(se3.se3_exp(deltas2)))
            for (f, prev), r1, r2 in zip(chunk, rel1, rel2):
                self.pose_dict[f"rel_pose_{prev}_to_{prev}.5"] = \
                    r1.astype(np.float32)
                self.pose_dict[f"rel_pose_{prev}.5_to_{f}"] = \
                    r2.astype(np.float32)
                self.pose_dict[f"rel_pose_{prev}_to_{f}"] = \
                    (r2 @ r1).astype(np.float32)
            self._save_partial_poses()

        # validate: any non-finite batched result falls back to the
        # sequential reference-parity path for that pair
        for (f, prev) in pairs:
            keys = [k for k in (f"rel_pose_{prev}_to_{f}",
                                f"rel_pose_{prev}_to_{prev}.5",
                                f"rel_pose_{prev}.5_to_{f}")
                    if k in self.pose_dict]
            if any(not np.all(np.isfinite(self.pose_dict[k])) for k in keys):
                self.logger.warning(
                    f"[Phase A/batched] non-finite result for pair "
                    f"({prev}->{f}); falling back to sequential fit")
                for k in keys:
                    self.pose_dict.pop(k, None)
                self.compute_relative_pose(f, prev)

    # ------------------------------------------------------------------ #
    # partition (ht3dgs_trainer.py:1338-1395)
    def partition(self, n: int, level: int, overlap: int = 2):
        if self.pipe_cfg.partition_strategy == "v1" and level > 0:
            diffs = []
            for idx in range(n - 1):
                rel = self.pose_dict[f"rel_pose_{idx}_to_{idx + 1}"]
                diffs.append((self._pose_size(rel), idx))
            num_segment = 2 ** level
            len_segment = n // num_segment
            len_sub = n // (num_segment * 4)
            key_indices = []
            for i in range(num_segment - 1):
                idx = (i + 1) * len_segment
                window = diffs[max(0, idx - len_sub):idx + len_sub + 1]
                key_indices.append(sorted(window)[-1][1])
            result = {}
            for lv in range(level, -1, -1):
                result[lv] = []
                if lv == level:
                    prev = 0
                    for k in key_indices:
                        result[lv].append(list(range(prev, k + 1 + overlap)))
                        prev = k + 1
                    result[lv].append(list(range(prev, n)))
                else:
                    for i in range(0, len(result[lv + 1]), 2):
                        l1 = result[lv + 1][i]
                        l2 = result[lv + 1][i + 1]
                        result[lv].append(sorted(set(l1 + l2)))
            assert result[0][0] == list(range(n))
            return result
        # 'even': recursive halving with 1-frame overlap
        result = {0: [list(range(n))]}
        for lv in range(1, level + 1):
            result[lv] = []
            for ind in result[lv - 1]:
                h = len(ind) // 2
                result[lv].append(ind[:h + 1])
                result[lv].append(ind[h - 1:])
        return result

    @staticmethod
    def _pose_size(pose: np.ndarray) -> float:
        t = float(np.linalg.norm(pose[:3, 3]))
        tr = float(np.trace(pose[:3, :3]))
        ang = float(np.arccos(np.clip((tr - 1) / 2, -1.0, 1.0)))
        return t + ang

    # ------------------------------------------------------------------ #
    # leaf / non-leaf training loops
    def sample_training_frame(self, visited: List[int]) -> int:
        """70% recent-half bias (ht3dgs_trainer.py:482-507)."""
        last = max(1, len(visited) // 2)
        if self.rng.random() < 0.7:
            i = self.rng.randint(last, len(visited) - 1)
        else:
            i = self.rng.randint(1, last)
        return visited[i]

    def _frame_camera_gt(self, bundle: ModelBundle, fidx: int,
                         use_vfi: bool):
        """Pick (camera, gt) for one training iteration — original frame, or
        the VFI midway frame with its adjusted pose (MSS phase 2,
        ht3dgs_trainer.py:530-545)."""
        pose = bundle.get_RT(fidx)
        if use_vfi:
            half = self.pose_dict.get(f"rel_pose_{fidx}_to_{fidx}.5")
            if half is None:
                # No half-step pose recorded (e.g. train_pose_mode != 'vfi'
                # but 'vfi' listed in multi_source_supervision): supervising
                # the midway VFI image at the unadjusted pose would be a
                # mismatched pose/image pair, so fall back to the original
                # frame instead (the reference raises KeyError here).
                gt = self.load_image(fidx)
                return self.camera_for(fidx, pose=pose), gt
            pose = half @ pose
            gt = self.get_vfi(fidx)
        else:
            gt = self.load_image(fidx)
        return self.camera_for(fidx, pose=pose), gt

    def train_leaf(self, bundle: ModelBundle, view_idx: int,
                   view_idx_prev: int, visited: List[int]):
        """train_leaf_3DGS (ht3dgs_trainer.py:510-585)."""
        o = self.sched
        use_vfi_mss = ("vfi" in self.pipe_cfg.multi_source_supervision
                       and self.vfi_provider is not None)

        if self.just_reset:
            self.just_reset = False
            for _ in range(1, self.sched.reset_recovery_iters):
                fidx = self.rng.randint(0, view_idx_prev)
                self.global_iteration += 1
                cam, gt = self._frame_camera_gt(bundle, fidx, False)
                self.host_train_step(
                    bundle, cam, gt, self.global_iteration,
                    densification_interval=o.densification_interval_leaf)

        for it in range(1, o.single_step + 1):
            fidx = self.sample_training_frame(visited)
            self.global_iteration += 1
            use_vfi = (use_vfi_mss and fidx + 1 < self.seq_len
                       and self.rng.random() < o.mss_phase2_ratio)
            cam, gt = self._frame_camera_gt(bundle, fidx, use_vfi)
            m = self.host_train_step(
                bundle, cam, gt, self.global_iteration,
                densification_interval=o.densification_interval_leaf)
            if it % 25 == 0:
                # bounded dispatch queue: the remote TPU client wedges when
                # too many executions are enqueued unfetched (round-2
                # reliability finding; Phase A syncs the same way)
                _sync_device(m["psnr"])
            if self.global_iteration % 1000 == 0:
                bundle.state = G.oneup_sh_degree(bundle.state)
            if it % 100 == 0:
                self.logger.info(
                    f"[leaf] git {self.global_iteration} it {it} "
                    f"psnr {float(m['psnr']):.2f} "
                    f"n={int(bundle.state.n_live())}")

    def train_nonleaf_phase2(self, bundle: ModelBundle, indices: List[int],
                             num_iterations: int):
        """Replay all segment frames + VFI (ht3dgs_trainer.py:588-641)."""
        o = dataclasses.replace(
            self.sched,
            densification_interval=self.sched.mss_phase2_densification_interval)
        if self.sched.mss_phase2_densify_until_iter_ratio is not None:
            o.densify_until_iter = int(
                num_iterations * self.sched.mss_phase2_densify_until_iter_ratio)
        use_vfi_mss = ("vfi" in self.pipe_cfg.multi_source_supervision
                       and self.vfi_provider is not None)
        for it in range(1, num_iterations + 1):
            fidx = self.rng.choice(indices)
            self.global_iteration += 1
            use_vfi = (use_vfi_mss and fidx + 1 < self.seq_len
                       and self.rng.random() < o.mss_phase2_ratio)
            cam, gt = self._frame_camera_gt(bundle, fidx, use_vfi)
            m = self.host_train_step(bundle, cam, gt, self.global_iteration,
                                     sched=o)
            if it % 25 == 0:
                _sync_device(m["psnr"])
            if self.global_iteration % 1000 == 0:
                bundle.state = G.oneup_sh_degree(bundle.state)
            if it % 100 == 0:
                self.logger.info(
                    f"[nonleaf p2] git {self.global_iteration} it {it} "
                    f"psnr {float(m['psnr']):.2f} "
                    f"n={int(bundle.state.n_live())}")

    def train_nonleaf_phase1(self, bundle: ModelBundle,
                             children: List[ModelBundle]):
        """Pseudo-views rendered by frozen children at SE(3)-interpolated
        poses (MSS phase 1, ht3dgs_trainer.py:815-914)."""
        indices = sorted({f for c in children for f in c.to_visit_frames})
        o = dataclasses.replace(self.sched)
        if self.sched.mss_phase1_densification_interval is not None:
            o.densification_interval = \
                self.sched.mss_phase1_densification_interval
        num_iterations = self.sched.mss_phase1_iteration_per_frame * len(indices)
        if self.sched.mss_phase1_densify_until_iter_ratio is not None:
            o.densify_until_iter = int(
                num_iterations * self.sched.mss_phase1_densify_until_iter_ratio)

        for it in range(1, num_iterations + 1):
            fidx = self.rng.choice(indices)
            self.global_iteration += 1
            if self.rng.random() < self.sched.mss_phase1_ratio:
                alpha = self.rng.random()
                if fidx == indices[-1]:
                    fidx -= 1
                p0 = se3.se3_from_matrix(jnp.asarray(bundle.get_RT(fidx)))
                p1 = se3.se3_from_matrix(jnp.asarray(bundle.get_RT(fidx + 1)))
                pose_i = np.asarray(
                    se3.se3_to_matrix(se3.se3_interp(p0, p1, alpha)),
                    np.float32)
                child = None
                for c in children[::-1]:
                    if fidx >= c.start_fidx and fidx in c.to_visit_frames:
                        child = c
                        break
                if child is None:
                    raise ValueError(f"no child covers frame {fidx}")
                pose_wrt_child = pose_i @ np.linalg.inv(
                    bundle.get_RT(child.start_fidx))
                cam_child = self.camera_for(0, pose=pose_wrt_child)
                pseudo = np.asarray(step_lib.render_eval(
                    child.state, cam_child, mode=self._mode,
                    tile_args=self._tile_args)["image"])
                cam = self.camera_for(0, pose=pose_i)
                m = self.host_train_step(bundle, cam, pseudo,
                                         self.global_iteration, sched=o)
            else:
                cam, gt = self._frame_camera_gt(bundle, fidx, False)
                m = self.host_train_step(bundle, cam, gt,
                                         self.global_iteration, sched=o)
            if it % 25 == 0:
                _sync_device(m["psnr"])
            if self.global_iteration % 1000 == 0:
                bundle.state = G.oneup_sh_degree(bundle.state)
            if it % 100 == 0:
                self.logger.info(
                    f"[nonleaf p1] git {self.global_iteration} it {it} "
                    f"psnr {float(m['psnr']):.2f}")

    # ------------------------------------------------------------------ #
    # merge (ht3dgs_trainer.py:214-272, 1427-1462)
    def calc_importance(self, bundle: ModelBundle,
                        frame_indices: List[int]) -> np.ndarray:
        """c3dgs-style color importance: Σ_cams |∂ Σpix / ∂ SH| / n_pixels,
        max over coefficients."""

        from ..raster import render as render_fn

        mode = self._mode
        tile_args = dict(self._tile_args) if self._tile_args else None

        @jax.jit
        def grads_for(state, camera):
            def total(sh_dc, sh_rest):
                s = dataclasses.replace(state, sh_dc=sh_dc, sh_rest=sh_rest)
                out = render_fn(s, camera, mode=mode, tile_args=tile_args)
                return jnp.sum(out["image"])

            g_dc, g_rest = jax.grad(total, argnums=(0, 1))(
                state.sh_dc, state.sh_rest)
            return jnp.abs(g_dc), jnp.abs(g_rest)

        acc_dc = np.zeros_like(np.asarray(bundle.state.sh_dc))
        acc_rest = np.zeros_like(np.asarray(bundle.state.sh_rest))
        n_pix = 0
        for fidx in frame_indices:
            cam = self.camera_for(fidx, pose=bundle.get_RT(fidx))
            g_dc, g_rest = grads_for(bundle.state, cam)
            acc_dc += np.asarray(g_dc)
            acc_rest += np.asarray(g_rest)
            n_pix += cam.height * cam.width
        imp = np.concatenate(
            [acc_dc.reshape(len(acc_dc), -1),
             acc_rest.reshape(len(acc_rest), -1)], axis=1) / n_pix
        return imp.max(axis=1)

    def merge_two(self, dst: ModelBundle, src: ModelBundle,
                  transform: np.ndarray):
        """Importance-prune both, SE(3)-transform src into dst's frame,
        concatenate. Fresh Adam afterwards (the reference re-creates the
        optimizer post-merge, so no moment surgery is needed)."""
        ratio = self.pipe_cfg.prune_ratio
        self.logger.info(
            f"[merge] dst n={int(dst.state.n_live())} "
            f"src n={int(src.state.n_live())}")

        imp_dst = self.calc_importance(dst, dst.to_visit_frames)
        dst.state, dst.opt = step_lib.jit_importance_prune(
            dst.state, dst.opt, jnp.asarray(imp_dst), jnp.asarray(ratio))
        imp_src = self.calc_importance(src, src.to_visit_frames)
        src_state, _ = step_lib.jit_importance_prune(
            src.state, src.opt, jnp.asarray(imp_src), jnp.asarray(ratio))

        # host-side concat of live rows (merge happens a handful of times;
        # host copies are fine and keep capacity management simple)
        dstd = {f: np.asarray(getattr(dst.state, f)) for f in G.PARAM_FIELDS}
        srcd = {f: np.asarray(getattr(src_state, f)) for f in G.PARAM_FIELDS}
        live_d = np.asarray(dst.state.live)
        live_s = np.asarray(src_state.live)

        pts = srcd["means"][live_s]
        hom = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], axis=1)
        aligned = hom @ transform.T.astype(np.float32)
        srcd["means"] = np.zeros_like(srcd["means"])
        srcd["means"][live_s] = aligned[:, :3] / aligned[:, 3:4]

        n_total = int(live_d.sum() + live_s.sum())
        cap = _round_capacity(int(n_total * 1.5))
        merged = {}
        for f in G.PARAM_FIELDS:
            rows = np.concatenate([dstd[f][live_d], srcd[f][live_s]], axis=0)
            out = np.zeros((cap,) + rows.shape[1:], rows.dtype)
            out[:n_total] = rows
            merged[f] = jnp.asarray(out)
        live = np.zeros(cap, bool)
        live[:n_total] = True
        zeros = jnp.zeros((cap,), jnp.float32)
        dst.state = dataclasses.replace(
            dst.state, **merged, live=jnp.asarray(live),
            max_radii2d=zeros, grad_accum=zeros, grad_denom=zeros)
        dst.fresh_adam()
        dst.radius = max(dst.radius, src.radius)
        self.logger.info(f"[merge] merged n={n_total} cap={cap}")

    # ------------------------------------------------------------------ #
    # the driver (ht3dgs_trainer.py:664-813)
    def derive_schedule(self):
        o = self.sched
        o.single_step = self.optim_cfg.single_step
        num_iterations = o.single_step * (self.seq_len // 10) * 10
        o.iterations = num_iterations
        o.position_lr_max_steps = num_iterations
        o.opacity_reset_interval = (
            max(num_iterations // 10, 1)
            if o.opacity_reset_interval_override is None
            else o.opacity_reset_interval_override)
        o.densify_until_iter = num_iterations
        o.reset_until_iter = int(num_iterations * 0.8)
        o.densify_from_iter = o.single_step

    def hierarchical_training(self):
        self.derive_schedule()
        os.makedirs(f"{self.result_path}/chkpnt", exist_ok=True)
        os.makedirs(f"{self.result_path}/pose", exist_ok=True)

        if self.pipe_cfg.load_pose and os.path.exists(self.pipe_cfg.load_pose):
            self.load_pose_dict(self.pipe_cfg.load_pose)
            self.logger.info(f"loaded poses from {self.pipe_cfg.load_pose}")
        # crash resume: Phase A persists its pose dict after every chunk —
        # the remote TPU service can wedge mid-run (ROADMAP: reliability
        # findings), and a restarted process skips every finished pair
        partial = f"{self.result_path}/pose/pose_partial.npz"
        if not self.pose_dict and os.path.exists(partial):
            self.load_pose_dict(partial)
            self.logger.info(
                f"resumed {len(self.pose_dict)} poses from {partial}")

        # Phase A — relative poses for every adjacent pair
        with self.timer.phase("phase_a"):
            if getattr(self.pipe_cfg, "phase_a_batch", 0) > 0:
                self.compute_relative_poses_batched()
            for fidx in range(1, self.seq_len):
                self.compute_relative_pose(fidx, fidx - 1)

        # Phase B — partition
        lists = self.partition(self.seq_len, self.train_level)
        self.logger.info(f"partition: {lists}")
        # crumbs saved under one (config, partition, seed) fingerprint
        # must not resume a run launched under another (mixed-config
        # models with no warning otherwise — ADVICE r4)
        self._crumb_fp = self._config_fingerprint(lists)

        use_base = "base" in self.pipe_cfg.multi_source_supervision
        # bundles[level][segment]
        bundles: Dict[int, List[Optional[ModelBundle]]] = {
            lv: [None] * len(lists[lv]) for lv in lists}

        # multi-chip: train leaf segments concurrently over the (segment,
        # tile) mesh in chunks of mesh_segments (leftovers run sequentially)
        S = max(1, self.pipe_cfg.mesh_segments)
        n_tiles = max(1, self.pipe_cfg.mesh_tiles)
        leaf_lists = lists[self.train_level]
        if (S > 1 or n_tiles > 1) and len(jax.devices()) >= S * n_tiles:
            from . import parallel_leaves as pl

            for i0 in range(0, len(leaf_lists) - (len(leaf_lists) % S), S):
                chunk = leaf_lists[i0:i0 + S]
                tags = [f"lv{self.train_level}_seg{i0 + k}"
                        for k in range(len(chunk))]
                crumbs = [self._load_bundle_breadcrumb(t) for t in tags]
                if all(c is not None for c in crumbs):
                    for k, b in enumerate(crumbs):
                        bundles[self.train_level][i0 + k] = b
                    self._commit_crumb_rng(crumbs[-1])
                    continue
                with self.timer.phase("leaf_parallel"):
                    trained = pl.train_leaf_segments_parallel(self, chunk)
                for k, b in enumerate(trained):
                    bundles[self.train_level][i0 + k] = b
                    self._save_bundle_breadcrumb(b, tags[k])

        for level in range(self.train_level, -1, -1):
            seg_lists = lists[level]

            # multi-chip: sibling non-leaf segments are data-independent
            # until their own merge — run phase 1/2 for chunks of Sp of
            # them concurrently (Sp = 1 still tile-shards the root's
            # images over the mesh)
            nonleaf_pretrained = set()
            if level < self.train_level and (S > 1 or n_tiles > 1):
                from . import parallel_nonleaf as pnl

                Sp = min(S, len(seg_lists))
                if len(jax.devices()) >= Sp * n_tiles:
                    for i0 in range(0, len(seg_lists)
                                    - (len(seg_lists) % Sp), Sp):
                        idxs = list(range(i0, i0 + Sp))
                        tags = [f"lv{level}_seg{i}" for i in idxs]
                        crumbs = [self._load_bundle_breadcrumb(t)
                                  for t in tags]
                        if all(c is not None for c in crumbs):
                            for i, c in zip(idxs, crumbs):
                                bundles[level][i] = c
                            self._commit_crumb_rng(crumbs[-1])
                            nonleaf_pretrained.update(idxs)
                            continue
                        chunk = [bundles[level][i] for i in idxs]
                        kids = ([tuple(bundles[level + 1][2 * i: 2 * i + 2])
                                 for i in idxs] if use_base else None)
                        with self.timer.phase("nonleaf_parallel"):
                            pnl.train_nonleaf_segments_parallel(
                                self, chunk, [seg_lists[i] for i in idxs],
                                level, children_pairs=kids)
                        for i, t in zip(idxs, tags):
                            self._save_bundle_breadcrumb(bundles[level][i],
                                                         t)
                        nonleaf_pretrained.update(idxs)

            for seg_idx, frames in enumerate(seg_lists):
                self.logger.info(f"level {level} seg {seg_idx}: {frames}")
                tag = f"lv{level}_seg{seg_idx}"
                crumb = (None if seg_idx in nonleaf_pretrained
                         else self._load_bundle_breadcrumb(tag))
                if crumb is not None:
                    bundle = crumb
                    bundles[level][seg_idx] = bundle
                    self._commit_crumb_rng(bundle)
                    self.global_iteration = bundle.global_iteration
                elif level == self.train_level:
                    bundle = bundles[level][seg_idx]  # parallel-pre-trained
                    if bundle is None:
                        with self.timer.phase("leaf"):
                            bundle = self._train_leaf_segment(frames)
                        bundles[level][seg_idx] = bundle
                        bundle.global_iteration = self.global_iteration
                        self._save_bundle_breadcrumb(bundle, tag)
                    else:
                        self.global_iteration = bundle.global_iteration
                elif seg_idx in nonleaf_pretrained:
                    bundle = bundles[level][seg_idx]  # parallel-pre-trained
                    self.global_iteration = bundle.global_iteration
                else:
                    bundle = bundles[level][seg_idx]  # restored from child
                    if use_base:
                        children = bundles[level + 1][seg_idx * 2:
                                                      seg_idx * 2 + 2]
                        self.global_iteration = bundle.global_iteration
                        with self.timer.phase("nonleaf_phase1"):
                            self.train_nonleaf_phase1(bundle, children)
                    n_it = self.sched.num_iterations_per_frame_each_level[
                        level] * len(frames)
                    with self.timer.phase("nonleaf_phase2"):
                        self.train_nonleaf_phase2(bundle, frames, n_it)
                    bundle.global_iteration = self.global_iteration
                    self._save_bundle_breadcrumb(bundle, tag)
                bundle.global_iteration = self.global_iteration

                if (seg_idx + 1) % 2 == 0:
                    prev = bundles[level][seg_idx - 1]
                    # destination at level-1 restores the left sibling
                    dst = ModelBundle(
                        state=prev.state, opt=prev.opt, radius=prev.radius,
                        spatial_scale=prev.spatial_scale,
                        poses=prev.poses.copy(),
                        start_fidx=prev.start_fidx,
                        to_visit_frames=list(prev.to_visit_frames))
                    pose_between = dst.get_RT(bundle.start_fidx)
                    with self.timer.phase("merge"):
                        self.merge_two(dst, bundle,
                                       np.linalg.inv(pose_between))
                    # chain poses for the newly covered frames
                    for pf in frames:
                        if pf in seg_lists[seg_idx - 1]:
                            continue
                        rel = self.pose_dict[f"rel_pose_{pf - 1}_to_{pf}"]
                        dst.set_RT(pf, rel @ dst.get_RT(pf - 1))
                    dst.global_iteration = 0
                    dst.to_visit_frames = sorted(
                        set(bundle.to_visit_frames + dst.to_visit_frames))
                    bundles[level - 1][(seg_idx - 1) // 2] = dst

        self.gs_bundle = bundles[0][0]
        with self.timer.phase("eval"):
            self.evaluate_on_training_images()
        self.save_checkpoint()
        # drop crash-resume breadcrumbs: the run completed, and stale
        # crumbs must not leak into a rerun with different budgets
        import glob as _glob
        for f in _glob.glob(f"{self.result_path}/chkpnt/crumb_*.npz"):
            os.remove(f)
        self.logger.info(f"phase timing: {self.timer.summary()}")
        self.logger.info(
            f"capacity growths (recompiles): "
            f"{getattr(self, 'n_capacity_grows', 0)}")
        self.timer.dump(os.path.join(self.result_path, "phase_timing.json"))
        return self.gs_bundle

    def _config_fingerprint(self, lists) -> str:
        """Hash of everything that shapes a segment's training: optim +
        pipe config, partition, seq_len, seed. Stamped into every
        breadcrumb; mismatching crumbs are refused on load so a relaunch
        under a changed schedule/budget/partition cannot silently splice
        segments trained under the old configuration."""
        import hashlib
        import json

        payload = {
            "optim": {k: repr(v)
                      for k, v in sorted(vars(self.optim_cfg).items())},
            "pipe": {k: repr(v)
                     for k, v in sorted(vars(self.pipe_cfg).items())},
            "seq_len": self.seq_len,
            "seed": getattr(self, "seed", 0),
            "partition": repr(lists),
        }
        return hashlib.sha256(
            json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]

    def _bundle_breadcrumb_path(self, tag: str) -> str:
        return f"{self.result_path}/chkpnt/crumb_{tag}.npz"

    def _save_bundle_breadcrumb(self, bundle: ModelBundle, tag: str):
        """Crash-resume breadcrumb for a finished sub-training (leaf or
        merged segment): the remote TPU client can wedge mid-run and the
        watchdog restart should not redo finished segments (same rationale
        as the Phase A pose breadcrumbs)."""
        path = self._bundle_breadcrumb_path(tag)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        arrs = {f: np.asarray(getattr(bundle.state, f))
                for f in G.PARAM_FIELDS}
        arrs.update(
            live=np.asarray(bundle.state.live),
            active_sh_degree=np.asarray(bundle.state.active_sh_degree),
            max_sh_degree=np.asarray(bundle.state.max_sh_degree),
            poses=bundle.poses,
            radius=np.asarray(bundle.radius),
            spatial_scale=np.asarray(bundle.spatial_scale),
            global_iteration=np.asarray(bundle.global_iteration),
            start_fidx=np.asarray(bundle.start_fidx),
            to_visit=np.asarray(bundle.to_visit_frames, np.int32),
        )
        for f in G.PARAM_FIELDS:
            arrs[f"adam_m_{f}"] = np.asarray(bundle.opt.m[f])
            arrs[f"adam_v_{f}"] = np.asarray(bundle.opt.v[f])
        arrs["adam_step"] = np.asarray(bundle.opt.step)
        # config fingerprint + trainer RNG stream so a resume neither
        # mixes configurations nor diverges from the uninterrupted run
        import pickle

        arrs["config_fp"] = np.array(
            getattr(self, "_crumb_fp", ""), dtype="U16")
        arrs["py_rng_state"] = np.frombuffer(
            pickle.dumps(self.rng.getstate()), np.uint8)
        arrs["jax_key"] = np.asarray(self.key)
        np.savez_compressed(path + ".tmp.npz", **arrs)
        os.replace(path + ".tmp.npz", path)
        self.logger.info(f"breadcrumb -> {path}")

    def _load_bundle_breadcrumb(self, tag: str) -> Optional[ModelBundle]:
        path = self._bundle_breadcrumb_path(tag)
        if not os.path.exists(path):
            return None
        z = np.load(path)
        saved_fp = str(z["config_fp"]) if "config_fp" in z.files else None
        if saved_fp != getattr(self, "_crumb_fp", ""):
            self.logger.warning(
                f"REFUSING breadcrumb {path}: config fingerprint "
                f"{saved_fp!r} != current {getattr(self, '_crumb_fp', '')!r}"
                " (schedule/partition/budget/seed changed since the crumb"
                " was written) — retraining this segment")
            return None
        rng_payload = None
        if "py_rng_state" in z.files:
            rng_payload = (z["py_rng_state"].tobytes(),
                           np.asarray(z["jax_key"]))
        zeros = jnp.zeros((z["live"].shape[0],), jnp.float32)
        state = GaussianState(
            **{f: jnp.asarray(z[f]) for f in G.PARAM_FIELDS},
            live=jnp.asarray(z["live"]),
            max_radii2d=zeros, grad_accum=zeros, grad_denom=zeros,
            active_sh_degree=jnp.asarray(z["active_sh_degree"]),
            max_sh_degree=int(z["max_sh_degree"]),
        )
        opt = adam_lib.AdamState(
            m={f: jnp.asarray(z[f"adam_m_{f}"]) for f in G.PARAM_FIELDS},
            v={f: jnp.asarray(z[f"adam_v_{f}"]) for f in G.PARAM_FIELDS},
            step=jnp.asarray(z["adam_step"]))
        b = ModelBundle(
            state=state, opt=opt, radius=float(z["radius"]),
            spatial_scale=float(z["spatial_scale"]), poses=z["poses"],
            global_iteration=int(z["global_iteration"]),
            start_fidx=int(z["start_fidx"]),
            to_visit_frames=[int(x) for x in z["to_visit"]])
        # the RNG payload is NOT applied here: a caller may discard the
        # crumb (e.g. a partial parallel chunk retrains the whole chunk),
        # and a discarded load must not fast-forward the trainer streams.
        # Callers commit via _commit_crumb_rng once a crumb is accepted.
        b._rng_payload = rng_payload
        self.logger.info(f"resumed breadcrumb {path}")
        return b

    def _commit_crumb_rng(self, bundle) -> None:
        """Apply the trainer RNG stream saved in an ACCEPTED breadcrumb
        so the resumed run continues the uninterrupted run's streams."""
        payload = getattr(bundle, "_rng_payload", None)
        if payload is not None:
            import pickle

            self.rng.setstate(pickle.loads(payload[0]))
            self.key = jnp.asarray(payload[1])

    def _train_leaf_segment(self, frames: List[int]) -> ModelBundle:
        """Leaf: init on first frame, then walk the segment chaining poses
        (driver leaf branch, ht3dgs_trainer.py:729-764)."""
        f0 = frames[0]
        pcd = self.prepare_pcd(f0)
        bundle = self.make_model(pcd)
        bundle.poses = np.tile(np.eye(4, dtype=np.float32),
                               (self.seq_len, 1, 1))
        bundle.start_fidx = f0
        bundle.to_visit_frames = frames
        self.global_iteration = 0
        self.just_reset = False

        # init_leaf_3DGS: 1000 iters on the first frame, densify off
        self.logger.info(f"[leaf init] frame {f0}")
        self.fit_single_image(bundle, f0, self.sched.leaf_init_iters, early_stop=False,
                              depth_gt=self.get_depth(f0)
                              if self.sched.lambda_depth else None)
        bundle.fresh_adam()   # training_setup(fit_pose=True) recreates Adam

        visited = [f0]
        for fidx in frames[1:]:
            rel = self.pose_dict[f"rel_pose_{fidx - 1}_to_{fidx}"]
            bundle.set_RT(fidx, rel @ bundle.get_RT(fidx - 1))
            visited.append(fidx)
            self.train_leaf(bundle, fidx, fidx - 1, visited)
            psnr, _ = self.render_frame(bundle, fidx)
            self.logger.info(
                f"Frames {fidx:03d}/{self.seq_len - 1}, PSNR : {psnr:.3f}")
        return bundle

    # ------------------------------------------------------------------ #
    def render_frame(self, bundle: ModelBundle, fidx: int):
        cam = self.camera_for(fidx, pose=bundle.get_RT(fidx))
        out = step_lib.render_eval(bundle.state, cam, mode=self._mode,
                                   tile_args=self._tile_args)
        gt = self.load_image(fidx)
        from .losses import psnr as psnr_fn

        p = float(psnr_fn(out["image"], jnp.asarray(gt)))
        return p, out

    def evaluate_on_training_images(self, save_images: bool = True):
        """Train-view PSNR sweep. Frames render vmap-BATCHED in chunks of
        `eval_batch` (one device dispatch per chunk instead of one per
        frame — the sequential per-frame loop crawled on the remote TPU
        service exactly like pre-round-2 Phase A; reference equivalent is
        the eval loop at trainer/ht3dgs_trainer.py:1100-1140)."""
        from ..utils.image import save_image
        from . import phase_a as pa

        out_dir = os.path.join(self.result_path, "eval")
        bundle = self.gs_bundle
        B = max(1, int(getattr(self.pipe_cfg, "eval_batch", 8)))
        psnrs = []
        if self._mode in ("tiled", "pallas"):
            # settle tile capacities for THIS model before the sweep: a
            # freshly-built trainer's presets can silently truncate a
            # big post-merge model (round-5 scale run: 454k dropped
            # per-tile entries, 32 -> 18.5 dB)
            from . import evals as _evals

            _evals.settle_eval_tile_args(
                self, bundle.state,
                self.camera_for(0, pose=bundle.get_RT(0)))

        @partial(jax.jit, static_argnames=("mode", "tile_args"))
        def render_chunk(state, cams, mode, tile_args):
            def one(cam):
                return render(state, cam, mode=mode,
                              tile_args=dict(tile_args) if tile_args
                              else None)["image"]

            return jax.vmap(one)(cams)

        for c0 in range(0, self.seq_len, B):
            idxs = list(range(c0, min(c0 + B, self.seq_len)))
            # pad the tail chunk to B so every dispatch reuses one graph
            padded = idxs + [idxs[-1]] * (B - len(idxs))
            cams = pa.stack_cameras(
                [self.camera_for(f, pose=bundle.get_RT(f))
                 for f in padded])
            imgs = np.asarray(render_chunk(
                bundle.state, cams, self._mode, self._tile_args))
            for k, fidx in enumerate(idxs):
                gt = self.load_image(fidx)
                mse = float(np.mean((imgs[k] - gt) ** 2))
                p = -10.0 * float(np.log10(max(mse, 1e-12)))
                psnrs.append(p)
                if save_images:
                    save_image(os.path.join(out_dir, f"{fidx:03d}.png"),
                               imgs[k], gt_image=gt)
                self.logger.info(f"Frame {fidx}: PSNR = {p:.3f}")
        mean_psnr = float(np.mean(psnrs))
        self.logger.info(f"train-view mean PSNR: {mean_psnr:.3f}")
        print(f"train-view mean PSNR: {mean_psnr:.3f}")
        return mean_psnr

    # ------------------------------------------------------------------ #
    # pose-only mode (ht3dgs_trainer.py:916-962)
    def train_pose_only(self):
        self.derive_schedule()
        os.makedirs(f"{self.result_path}/pose", exist_ok=True)
        if getattr(self.pipe_cfg, "phase_a_batch", 0) > 0:
            self.compute_relative_poses_batched()
        for fidx in range(1, self.seq_len):
            self.compute_relative_pose(fidx, fidx - 1)
        poses = [np.eye(4, dtype=np.float32)]
        for fidx in range(1, self.seq_len):
            rel = self.pose_dict[f"rel_pose_{fidx - 1}_to_{fidx}"]
            poses.append(rel @ poses[-1])
        self.pose_dict["poses_pred"] = np.stack(poses)
        self.save_pose_dict(f"{self.result_path}/pose/pose.npz")
        return self.pose_dict["poses_pred"]

    # ------------------------------------------------------------------ #
    # checkpointing (capture/restore parity: params + stats + opt + poses,
    # /root/reference/scene/gaussian_model_ht.py:90-124)
    def save_checkpoint(self, path: Optional[str] = None):
        b = self.gs_bundle
        path = path or f"{self.result_path}/chkpnt/model.npz"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        arrs = {f: np.asarray(getattr(b.state, f)) for f in G.PARAM_FIELDS}
        arrs.update(
            live=np.asarray(b.state.live),
            max_radii2d=np.asarray(b.state.max_radii2d),
            grad_accum=np.asarray(b.state.grad_accum),
            grad_denom=np.asarray(b.state.grad_denom),
            active_sh_degree=np.asarray(b.state.active_sh_degree),
            max_sh_degree=np.asarray(b.state.max_sh_degree),
            poses=b.poses if b.poses is not None else np.zeros((0, 4, 4)),
            radius=np.asarray(b.radius),
            spatial_scale=np.asarray(b.spatial_scale),
            adam_step=np.asarray(b.opt.step),
        )
        for f in G.PARAM_FIELDS:
            arrs[f"adam_m_{f}"] = np.asarray(b.opt.m[f])
            arrs[f"adam_v_{f}"] = np.asarray(b.opt.v[f])
        np.savez_compressed(path, **arrs)
        self.logger.info(f"checkpoint -> {path}")

        pose_path = f"{self.result_path}/pose/pose.npz"
        if b.poses is not None:
            self.pose_dict["poses_pred"] = b.poses[:self.seq_len]
        self.save_pose_dict(pose_path)

    def load_checkpoint(self, path: str) -> ModelBundle:
        z = np.load(path)
        state = GaussianState(
            **{f: jnp.asarray(z[f]) for f in G.PARAM_FIELDS},
            live=jnp.asarray(z["live"]),
            max_radii2d=jnp.asarray(z["max_radii2d"]),
            grad_accum=jnp.asarray(z["grad_accum"]),
            grad_denom=jnp.asarray(z["grad_denom"]),
            active_sh_degree=jnp.asarray(z["active_sh_degree"]),
            max_sh_degree=int(z["max_sh_degree"]),
        )
        opt = adam_lib.AdamState(
            m={f: jnp.asarray(z[f"adam_m_{f}"]) for f in G.PARAM_FIELDS},
            v={f: jnp.asarray(z[f"adam_v_{f}"]) for f in G.PARAM_FIELDS},
            step=jnp.asarray(z["adam_step"]))
        bundle = ModelBundle(
            state=state, opt=opt, radius=float(z["radius"]),
            spatial_scale=float(z["spatial_scale"]),
            poses=z["poses"] if z["poses"].size else None)
        self.gs_bundle = bundle
        return bundle

    def save_pose_dict(self, path: str):
        np.savez_compressed(path, **self.pose_dict)
        self.logger.info(f"poses -> {path}")

    def _save_partial_poses(self):
        """Crash-resume breadcrumb: Phase A results so far (cheap npz; a
        restarted run skips every pair already present)."""
        path = f"{self.result_path}/pose/pose_partial.npz"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez_compressed(path, **self.pose_dict)

    def load_pose_dict(self, path: str):
        self.pose_dict = dict(np.load(path))

    # ------------------------------------------------------------------ #
    # eval / render modes (implemented in train.evals)
    def eval_nvs(self, **kw):
        from . import evals

        return evals.eval_nvs(self, **kw)

    def eval_pose(self, **kw):
        from . import evals

        return evals.eval_pose(self, **kw)

    def render_nvs(self, **kw):
        from . import evals

        return evals.render_nvs(self, **kw)
