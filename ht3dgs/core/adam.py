"""Adam with explicit, surgery-friendly state.

The reference trains with per-group torch.Adam (eps=1e-15, default betas)
and performs *state surgery* on densify/prune: moments of surviving rows are
kept, moments of new rows start at zero, and the shared step count carries
over (`/root/reference/scene/gaussian_model_ht.py:532-629`). Matching those
dynamics is required for training parity (SURVEY.md §7 "hard parts"), so we
implement Adam directly as a pytree-of-arrays state that the densification
compaction can permute/zero alongside the parameters — something an opaque
optax chain state makes awkward.

LRs are per-group *traced* scalars so the exponential xyz schedule
(`get_expon_lr_func`, /root/reference/utils/general_utils.py:27-60) never
triggers recompilation.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-15


class AdamState(NamedTuple):
    m: Dict[str, jax.Array]
    v: Dict[str, jax.Array]
    step: jax.Array  # [] int32, shared across groups (torch keeps per-param
    #                  steps but they advance in lockstep here)


def init(params: Dict[str, jax.Array]) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.asarray(0, jnp.int32))


def apply(
    params: Dict[str, jax.Array],
    grads: Dict[str, jax.Array],
    state: AdamState,
    lrs: Dict[str, jax.Array],
):
    """One Adam step. `lrs` maps param name -> scalar LR (0 freezes a group,
    exactly like the reference's fix_pos/fix_feat zero-LR groups)."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - BETA1 ** t
    bc2 = 1.0 - BETA2 ** t

    new_params, new_m, new_v = {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        m = BETA1 * state.m[k] + (1.0 - BETA1) * g
        v = BETA2 * state.v[k] + (1.0 - BETA2) * (g * g)
        update = (m / bc1) / (jnp.sqrt(v / bc2) + EPS)
        new_params[k] = p - lrs[k] * update
        new_m[k] = m
        new_v[k] = v
    return new_params, AdamState(m=new_m, v=new_v, step=step)


def zero_rows(state: AdamState, mask: jax.Array) -> AdamState:
    """Zero first-axis rows where mask is True (new/replaced Gaussians)."""

    def z(x):
        m = mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, 0.0, x)

    return AdamState(m=jax.tree.map(z, state.m), v=jax.tree.map(z, state.v),
                     step=state.step)


def permute_rows(state: AdamState, perm: jax.Array) -> AdamState:
    take = lambda x: jnp.take(x, perm, axis=0)
    return AdamState(m=jax.tree.map(take, state.m),
                     v=jax.tree.map(take, state.v), step=state.step)


def expon_lr(step, lr_init: float, lr_final: float, max_steps: int,
             lr_delay_steps: int = 0, lr_delay_mult: float = 1.0):
    """Log-linear LR schedule, parity with `get_expon_lr_func`
    (/root/reference/utils/general_utils.py:27-60). Works with python floats
    or traced (e.g. vmapped) lr values."""
    static_lrs = isinstance(lr_init, (int, float)) and \
        isinstance(lr_final, (int, float))
    if static_lrs and lr_init == 0.0 and lr_final == 0.0:
        return jnp.asarray(0.0, jnp.float32)
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * np.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    lr_init = jnp.asarray(lr_init, jnp.float32)
    lr_final = jnp.asarray(lr_final, jnp.float32)
    ok = (lr_init > 0.0) & (lr_final > 0.0)
    log_lerp = jnp.exp(jnp.log(jnp.where(ok, lr_init, 1.0)) * (1.0 - t)
                       + jnp.log(jnp.where(ok, lr_final, 1.0)) * t)
    out = delay * log_lerp
    return jnp.where((step < 0) | ~ok, 0.0, out)
