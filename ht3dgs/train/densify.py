"""Adaptive density control as static-shape masked compaction.

Re-design of the reference's densify/clone/split/prune + optimizer surgery
(`/root/reference/scene/gaussian_model_ht.py:548-721`) for XLA: instead of
resizing tensors, we build a 4×cap candidate table
[survivors | clones | split-a | split-b], stable-sort keep-flags to the
front, and gather the first `cap` rows — parameters and Adam moments move
together, with new rows' moments zeroed and the shared step count kept,
which is exactly the torch surgery semantics.

Behavioral parity notes:
- clone: grad >= thresh and max scale <= percent_dense·extent; exact copy.
- split: grad >= thresh and max scale > percent_dense·extent; 2 children at
  x + R(q)·N(0, S), scales /(0.8·2); parent pruned.
- prune: opacity < min_opacity, plus (when screen-size test active)
  max scale > 0.1·extent. The reference *textually* also tests
  `max_radii2D > max_screen_size`, but `densification_postfix` (called
  unconditionally by clone and split) zeroes the whole max_radii2D tensor
  right before the prune in `densify_and_prune`
  (gaussian_model_ht.py:629,689), so that test is always false there (and
  the standalone `prune()` where it would bite is never called). We
  reproduce the *effective* behavior: no screen-radius prune term.
  Applied to parents *and* inherited by children the same way the
  reference's post-densify prune sweeps the concatenated tensors.
- all densification stats (grad accum/denom/max_radii2D) reset to zero
  afterwards (densification_postfix semantics).
- reset_opacity: logit(min(opacity, 0.01)) with opacity Adam moments zeroed
  (replace_tensor_to_optimizer semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import adam as adam_lib
from ..core.gaussians import PARAM_FIELDS, GaussianState
from ..core.se3 import quat_normalize, quat_rotate


def accumulate_stats(state: GaussianState, probe_grad: jax.Array,
                     radii: jax.Array) -> GaussianState:
    """add_densification_stats + max_radii2D tracking
    (/root/reference/trainer/ht3dgs_trainer.py:141-148)."""
    visible = radii > 0
    gnorm = jnp.linalg.norm(probe_grad[:, :2], axis=-1)
    return dataclasses.replace(
        state,
        grad_accum=state.grad_accum + jnp.where(visible, gnorm, 0.0),
        grad_denom=state.grad_denom + visible.astype(jnp.float32),
        max_radii2d=jnp.where(
            visible,
            jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
            state.max_radii2d),
    )


def densify_and_prune(
    state: GaussianState,
    opt: adam_lib.AdamState,
    key: jax.Array,
    max_grad,
    min_opacity,
    extent,
    percent_dense,
    max_screen_size,
    use_screen_test,
) -> Tuple[GaussianState, adam_lib.AdamState, jax.Array]:
    """Returns (state, opt, n_dropped_for_capacity). All thresholds traced."""
    cap = state.capacity
    live = state.live

    grads = jnp.where(state.grad_denom > 0,
                      state.grad_accum / jnp.maximum(state.grad_denom, 1.0),
                      0.0)
    scales = state.scales()
    max_scale = jnp.max(scales, axis=-1)
    opacity = state.opacities()

    hot = live & (grads >= max_grad)
    clone_sel = hot & (max_scale <= percent_dense * extent)
    split_sel = hot & (max_scale > percent_dense * extent)

    base_prune = opacity < min_opacity
    # No max_radii2d term: the reference zeroes max_radii2D inside
    # densification_postfix before this test ever runs (see module
    # docstring), so only the world-size term is live.
    screen_prune = max_scale > 0.1 * extent
    prune = jnp.where(use_screen_test, base_prune | screen_prune, base_prune)

    survivors_keep = live & ~split_sel & ~prune
    clone_keep = clone_sel & ~prune  # clones inherit parent attrs → same test

    # split children: new scale -> prune test uses the *new* attributes
    child_scales = scales / (0.8 * 2.0)
    child_max_scale = jnp.max(child_scales, axis=-1)
    child_screen_prune = child_max_scale > 0.1 * extent  # max_radii2d starts 0
    child_prune = jnp.where(use_screen_test,
                            (opacity < min_opacity) | child_screen_prune,
                            opacity < min_opacity)
    split_keep = split_sel & ~child_prune

    # sampled child positions
    k1, k2 = jax.random.split(key)
    q = quat_normalize(state.quats)

    def child_means(k):
        noise = jax.random.normal(k, (cap, 3), state.means.dtype) * scales
        return state.means + quat_rotate(q, noise)

    child_log_scales = state.log_scales - jnp.log(0.8 * 2.0)

    params = state.params()

    def candidate(field):
        x = params[field]
        if field == "means":
            rows = [x, x, child_means(k1), child_means(k2)]
        elif field == "log_scales":
            rows = [x, x, child_log_scales, child_log_scales]
        else:
            rows = [x, x, x, x]
        return jnp.concatenate(rows, axis=0)

    keep = jnp.concatenate([survivors_keep, clone_keep, split_keep,
                            split_keep])
    # stable sort: keeps first, preserving order (survivors, clones, splits)
    order = jnp.argsort(~keep, stable=True)[:cap]
    new_live = jnp.take(keep, order)
    n_keep_total = jnp.sum(keep.astype(jnp.int32))
    n_dropped = jnp.maximum(n_keep_total - cap, 0)

    new_params = {}
    new_m, new_v = {}, {}
    for f in PARAM_FIELDS:
        cand = candidate(f)
        new_params[f] = jnp.take(cand, order, axis=0)
        mom_m = jnp.concatenate(
            [opt.m[f]] + [jnp.zeros_like(opt.m[f])] * 3, axis=0)
        mom_v = jnp.concatenate(
            [opt.v[f]] + [jnp.zeros_like(opt.v[f])] * 3, axis=0)
        new_m[f] = jnp.take(mom_m, order, axis=0)
        new_v[f] = jnp.take(mom_v, order, axis=0)

    zeros = jnp.zeros((cap,), jnp.float32)
    new_state = dataclasses.replace(
        state,
        **new_params,
        live=new_live,
        max_radii2d=zeros,
        grad_accum=zeros,
        grad_denom=zeros,
    )
    new_opt = adam_lib.AdamState(m=new_m, v=new_v, step=opt.step)
    return new_state, new_opt, n_dropped


def reset_opacity(
    state: GaussianState, opt: adam_lib.AdamState
) -> Tuple[GaussianState, adam_lib.AdamState]:
    """Clamp opacity to <= 0.01 and zero its Adam moments
    (/root/reference/scene/gaussian_model_ht.py:469-474,532-546)."""
    new_op = jnp.minimum(state.opacities(), 0.01)
    logit = jnp.log(new_op / (1.0 - new_op))[:, None]
    new_state = dataclasses.replace(state, opacity_logit=logit)
    new_opt = adam_lib.AdamState(
        m={**opt.m, "opacity_logit": jnp.zeros_like(opt.m["opacity_logit"])},
        v={**opt.v, "opacity_logit": jnp.zeros_like(opt.v["opacity_logit"])},
        step=opt.step,
    )
    return new_state, new_opt


def importance_prune(
    state: GaussianState,
    opt: adam_lib.AdamState,
    importance: jax.Array,
    prune_ratio,
) -> Tuple[GaussianState, adam_lib.AdamState]:
    """Drop the `prune_ratio` fraction of *live* Gaussians with lowest
    importance (merge-time pruning, mirrors the topk(largest=False) mask in
    merge_two_3DGS, /root/reference/trainer/ht3dgs_trainer.py:237-272)."""
    cap = state.capacity
    n_live = state.n_live()
    k = (n_live.astype(jnp.float32) * prune_ratio).astype(jnp.int32)
    score = jnp.where(state.live, importance, jnp.inf)
    rank = jnp.argsort(jnp.argsort(score))  # rank 0 = least important live
    drop = (rank < k) & state.live
    new_live = state.live & ~drop
    return dataclasses.replace(state, live=new_live), opt
