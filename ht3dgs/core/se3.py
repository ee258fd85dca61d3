"""SE(3) / SO(3) Lie-group operations in pure JAX.

TPU-native replacement for the lietorch CUDA extension used by the reference
(`/root/reference/scene/gaussian_model_ht.py:11,346-386`): poses are stored as
7-vectors ``[tx, ty, tz, qx, qy, qz, qw]`` (lietorch memory order), optimized
parameters are 6-dim tangent vectors ``[v, w]`` (translation first), and the
retraction is a *left* update ``retr(delta, base) = exp(delta) ∘ base`` —
matching ``LieGroupParameter.retr()`` semantics so training dynamics carry
over. All ops are differentiable by JAX AD; no custom kernels are needed
because these are tiny per-pose computations.

Conventions:
- quaternion layout ``[x, y, z, w]`` (scipy/lietorch order), normalized.
- ``act(pose, p) = R(q) @ p + t`` maps points from the pose's source frame
  into its target frame (here: model/world frame -> camera frame).
- tangent layout ``[rho(3), phi(3)]`` = (translation, rotation), as lietorch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product, [x,y,z,w] layout. Rotation composition R(q1)R(q2)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v[..., 3] by unit quaternions q[..., 4]."""
    qvec = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion [x,y,z,w] -> rotation matrix [..., 3, 3]."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> unit quaternion [x,y,z,w].

    Branch-free Shepperd-style selection of the numerically best row, safe
    under jit/vmap (no data-dependent python control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate (unnormalized) quats, one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    # candidates in [w,x,y,z] order per row
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4, 4]
    scores = jnp.stack(
        [tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1
    )
    best = jnp.argmax(scores, axis=-1)
    q_wxyz = jnp.take_along_axis(
        cand, best[..., None, None].astype(jnp.int32).repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    q_wxyz = quat_normalize(q_wxyz)
    # reorder to [x,y,z,w] and fix sign (w >= 0 canonical form)
    q = jnp.concatenate([q_wxyz[..., 1:4], q_wxyz[..., 0:1]], axis=-1)
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


# ---------------------------------------------------------------------------
# SO(3) exp / log
# ---------------------------------------------------------------------------

def so3_exp(phi: jax.Array) -> jax.Array:
    """Rotation-vector [..., 3] -> unit quaternion [x,y,z,w]. Taylor-safe.

    Denominators are sanitized *before* the where so reverse-mode AD never
    sees 0/0 in the unselected branch (the where-NaN pitfall).
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    theta_sq_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    half = 0.5 * theta
    # sin(theta/2)/theta with Taylor fallback: 1/2 - theta^2/48
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([k * phi, w], axis=-1)


def so3_log(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation vector. Taylor-safe near identity."""
    qv = q[..., :3]
    w = q[..., 3:4]
    # make w >= 0 so theta in [0, pi]
    sign = jnp.where(w < 0, -1.0, 1.0)
    qv = qv * sign
    w = w * sign
    nv_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = nv_sq < 1e-12
    nv = jnp.sqrt(jnp.where(small, 1.0, nv_sq))
    theta = 2.0 * jnp.arctan2(nv, w)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 1e-8), theta / nv)
    return scale * qv


def _hat(phi: jax.Array) -> jax.Array:
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zeros = jnp.zeros_like(x)
    return jnp.stack(
        [zeros, -z, y, z, zeros, -x, -y, x, zeros], axis=-1
    ).reshape(phi.shape[:-1] + (3, 3))


def _so3_left_jacobian(phi: jax.Array) -> jax.Array:
    """V such that exp_SE3([v, w]).t = V @ v."""
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = theta_sq < 1e-8
    theta_sq_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    Phi = _hat(phi)
    Phi2 = jnp.matmul(Phi, Phi, precision=jax.lax.Precision.HIGHEST)
    a = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / theta_sq_safe)
    b = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (theta - jnp.sin(theta)) / (theta_sq_safe * theta),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye + a * Phi + b * Phi2


def _so3_left_jacobian_inv(phi: jax.Array) -> jax.Array:
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = theta_sq < 1e-8
    theta_sq_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    Phi = _hat(phi)
    Phi2 = jnp.matmul(Phi, Phi, precision=jax.lax.Precision.HIGHEST)
    half_theta = 0.5 * theta
    sin_half = jnp.where(small, 1.0, jnp.sin(half_theta))
    # coefficient for Phi2: (1/theta^2)(1 - theta*cot(theta/2)/2)
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / sin_half) / theta_sq_safe,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye - 0.5 * Phi + cot_term * Phi2


# ---------------------------------------------------------------------------
# SE(3): 7-vector [t(3), q(4)]
# ---------------------------------------------------------------------------

def se3_identity(batch_shape=(), dtype=jnp.float32) -> jax.Array:
    ident = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dtype=dtype)
    return jnp.broadcast_to(ident, tuple(batch_shape) + (7,))


def se3_act(pose: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply pose [..., 7] to points [..., 3] (broadcasting over leading dims)."""
    t = pose[..., :3]
    q = quat_normalize(pose[..., 3:7])
    return quat_rotate(q, pts) + t


def se3_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose: (a ∘ b)(p) = a(b(p))."""
    qa = quat_normalize(a[..., 3:7])
    ta = a[..., :3]
    qb = quat_normalize(b[..., 3:7])
    tb = b[..., :3]
    q = quat_mul(qa, qb)
    t = quat_rotate(qa, tb) + ta
    return jnp.concatenate([t, q], axis=-1)


def se3_inv(pose: jax.Array) -> jax.Array:
    q = quat_normalize(pose[..., 3:7])
    qi = quat_conj(q)
    ti = -quat_rotate(qi, pose[..., :3])
    return jnp.concatenate([ti, qi], axis=-1)


def se3_exp(tau: jax.Array) -> jax.Array:
    """Tangent [..., 6] = [v, w] -> SE(3) 7-vector."""
    v = tau[..., :3]
    w = tau[..., 3:6]
    q = so3_exp(w)
    V = _so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([t, q], axis=-1)


def se3_log(pose: jax.Array) -> jax.Array:
    """SE(3) 7-vector -> tangent [..., 6] = [v, w]."""
    q = quat_normalize(pose[..., 3:7])
    w = so3_log(q)
    Vinv = _so3_left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, pose[..., :3],
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([v, w], axis=-1)


def se3_retr(delta: jax.Array, base: jax.Array) -> jax.Array:
    """Left retraction exp(delta) ∘ base (lietorch LieGroupParameter.retr)."""
    return se3_mul(se3_exp(delta), base)


def se3_to_matrix(pose: jax.Array) -> jax.Array:
    """SE(3) 7-vector -> homogeneous [..., 4, 4]."""
    R = quat_to_matrix(quat_normalize(pose[..., 3:7]))
    t = pose[..., :3]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype),
        pose.shape[:-1] + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T: jax.Array) -> jax.Array:
    q = matrix_to_quat(T[..., :3, :3])
    t = T[..., :3, 3]
    return jnp.concatenate([t, q], axis=-1)


def se3_interp(pose0: jax.Array, pose1: jax.Array, alpha) -> jax.Array:
    """Geodesic interpolation pose0 ∘ exp(alpha * log(pose0⁻¹ ∘ pose1)).

    Matches the reference's virtual-view pose synthesis
    (`/root/reference/trainer/ht3dgs_trainer.py:462-479`, which computes
    pose0 * exp(log(pose0.inv() * pose1) * alpha)).
    """
    rel = se3_mul(se3_inv(pose0), pose1)
    return se3_mul(pose0, se3_exp(se3_log(rel) * alpha))


def se3_from_Rt(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Numpy convenience: world2cam R (3,3), t (3,) -> 7-vector."""
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = R
    T[:3, 3] = t
    return np.asarray(se3_from_matrix(jnp.asarray(T)), dtype=np.float32)
