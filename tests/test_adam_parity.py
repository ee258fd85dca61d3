"""Adam parity vs torch.optim.Adam (eps=1e-15, the reference's optimizer) —
training dynamics depend on exact Adam semantics (SURVEY.md §7 hard parts)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from ht3dgs.core import adam as adam_lib  # noqa: E402


def test_adam_matches_torch():
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((50, 3)).astype(np.float32)
    grads = [rng.standard_normal((50, 3)).astype(np.float32)
             for _ in range(10)]
    lr = 1e-2

    # torch
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([tp], lr=lr, eps=1e-15)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()

    # ours
    params = {"p": jnp.asarray(p0)}
    state = adam_lib.init(params)
    for g in grads:
        params, state = adam_lib.apply(params, {"p": jnp.asarray(g)}, state,
                                       {"p": jnp.asarray(lr)})

    np.testing.assert_allclose(np.asarray(params["p"]),
                               tp.detach().numpy(), atol=2e-6)


def test_adam_zero_rows_matches_torch_surgery():
    """Zeroing moments of selected rows == the reference's
    cat_tensors_to_optimizer zero-init for new gaussians."""
    rng = np.random.default_rng(1)
    p0 = rng.standard_normal((8, 2)).astype(np.float32)
    params = {"p": jnp.asarray(p0)}
    state = adam_lib.init(params)
    g = rng.standard_normal((8, 2)).astype(np.float32)
    params, state = adam_lib.apply(params, {"p": jnp.asarray(g)}, state,
                                   {"p": jnp.asarray(1e-2)})
    mask = jnp.asarray([False] * 4 + [True] * 4)
    state2 = adam_lib.zero_rows(state, mask)
    assert np.allclose(np.asarray(state2.m["p"])[4:], 0)
    assert np.allclose(np.asarray(state2.m["p"])[:4],
                       np.asarray(state.m["p"])[:4])
    assert int(state2.step) == int(state.step)


def test_expon_lr_matches_reference_formula():
    import math

    lr_init, lr_final, max_steps = 1.6e-4, 1.6e-6, 30000
    for step in (0, 1, 100, 15000, 30000, 50000):
        ours = float(adam_lib.expon_lr(step, lr_init, lr_final, max_steps))
        t = min(max(step / max_steps, 0.0), 1.0)
        ref = math.exp(math.log(lr_init) * (1 - t) + math.log(lr_final) * t)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)
    assert float(adam_lib.expon_lr(-1, lr_init, lr_final, max_steps)) == 0.0
