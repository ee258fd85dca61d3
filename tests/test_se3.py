"""SE(3)/SO(3) ops vs scipy oracles (SURVEY.md §4: math unit tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from ht3dgs.core import se3

jax.config.update("jax_enable_x64", False)


def random_pose(rng):
    q = R.random(random_state=rng).as_quat()  # [x,y,z,w]
    t = rng.standard_normal(3)
    return np.concatenate([t, q]).astype(np.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quat_to_matrix_vs_scipy(rng):
    q = R.random(10, random_state=rng).as_quat().astype(np.float32)
    ours = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
    ref = R.from_quat(q).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_matrix_to_quat_roundtrip(rng):
    m = R.random(50, random_state=rng).as_matrix().astype(np.float32)
    q = np.asarray(se3.matrix_to_quat(jnp.asarray(m)))
    m2 = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(m2, m, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = R.random(8, random_state=rng).as_quat().astype(np.float32)
    v = rng.standard_normal((8, 3)).astype(np.float32)
    ours = np.asarray(se3.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    ref = R.from_quat(q).apply(v)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_se3_act_mul_inv(rng):
    a = random_pose(rng)
    b = random_pose(rng)
    p = rng.standard_normal((5, 3)).astype(np.float32)
    ab = se3.se3_mul(jnp.asarray(a), jnp.asarray(b))
    lhs = se3.se3_act(ab, jnp.asarray(p))
    rhs = se3.se3_act(jnp.asarray(a), se3.se3_act(jnp.asarray(b), jnp.asarray(p)))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)

    ident = se3.se3_mul(jnp.asarray(a), se3.se3_inv(jnp.asarray(a)))
    np.testing.assert_allclose(np.asarray(ident[:3]), 0.0, atol=1e-5)
    np.testing.assert_allclose(abs(float(ident[6])), 1.0, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    phi = rng.standard_normal((20, 3)).astype(np.float32) * 1.5
    q = se3.so3_exp(jnp.asarray(phi))
    ref = R.from_rotvec(phi).as_quat()
    ours = np.asarray(q)
    # sign ambiguity
    sign = np.sign(np.sum(ours * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours * sign, ref, atol=1e-5)
    # log returns the canonical theta <= pi representative; roundtrip holds
    # only for such inputs
    phi_small = phi / np.maximum(
        1.0, np.linalg.norm(phi, axis=-1, keepdims=True) / 2.8)
    q_small = se3.so3_exp(jnp.asarray(phi_small))
    back = np.asarray(se3.so3_log(q_small))
    np.testing.assert_allclose(back, phi_small, atol=1e-4)


def test_so3_exp_small_angle():
    phi = jnp.asarray([[1e-9, -1e-9, 2e-9], [0.0, 0.0, 0.0]])
    q = se3.so3_exp(phi)
    assert np.all(np.isfinite(np.asarray(q)))
    np.testing.assert_allclose(np.asarray(se3.so3_log(q)), np.asarray(phi),
                               atol=1e-8)


def test_se3_exp_log_roundtrip(rng):
    tau = rng.standard_normal((20, 6)).astype(np.float32)
    pose = se3.se3_exp(jnp.asarray(tau))
    back = np.asarray(se3.se3_log(pose))
    np.testing.assert_allclose(back, tau, atol=1e-4)


def test_se3_exp_matches_matrix_exp(rng):
    """exp([v,w]) as 4x4 must equal scipy expm of the twist matrix."""
    from scipy.linalg import expm

    tau = rng.standard_normal(6).astype(np.float32) * 0.7
    v, w = tau[:3], tau[3:]
    twist = np.zeros((4, 4))
    twist[:3, :3] = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                              [-w[1], w[0], 0]])
    twist[:3, 3] = v
    ref = expm(twist)
    ours = np.asarray(se3.se3_to_matrix(se3.se3_exp(jnp.asarray(tau))))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_retr_at_zero_is_base(rng):
    base = jnp.asarray(random_pose(rng))
    out = se3.se3_retr(jnp.zeros(6), base)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


def test_retr_differentiable(rng):
    base = jnp.asarray(random_pose(rng))
    pts = jnp.asarray(rng.standard_normal((10, 3)).astype(np.float32))

    def loss(delta):
        pose = se3.se3_retr(delta, base)
        return jnp.sum(se3.se3_act(pose, pts) ** 2)

    g = jax.grad(loss)(jnp.zeros(6))
    assert np.all(np.isfinite(np.asarray(g)))
    # finite-difference check
    eps = 1e-3
    for i in range(6):
        d = np.zeros(6, np.float32)
        d[i] = eps
        fd = (loss(jnp.asarray(d)) - loss(jnp.asarray(-d))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=2e-2, atol=1e-2)


def test_se3_interp_endpoints(rng):
    p0 = jnp.asarray(random_pose(rng))
    p1 = jnp.asarray(random_pose(rng))
    np.testing.assert_allclose(np.asarray(se3.se3_interp(p0, p1, 0.0)),
                               np.asarray(p0), atol=1e-5)
    m1 = np.asarray(se3.se3_to_matrix(se3.se3_interp(p0, p1, 1.0)))
    ref1 = np.asarray(se3.se3_to_matrix(p1))
    np.testing.assert_allclose(m1, ref1, atol=1e-4)


def test_se3_matrix_roundtrip(rng):
    pose = jnp.asarray(random_pose(rng))
    T = se3.se3_to_matrix(pose)
    back = se3.se3_from_matrix(T)
    np.testing.assert_allclose(
        np.asarray(se3.se3_to_matrix(back)), np.asarray(T), atol=1e-5)
