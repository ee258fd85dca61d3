"""Real spherical harmonics for view-dependent Gaussian color.

Same real-SH basis (degrees 0..3) as the reference's hardcoded evaluator
(`/root/reference/utils/sh_utils.py:57-118`); constants are the standard
normalization coefficients of the real spherical harmonics basis. Implemented
as a vectorized polynomial evaluation that XLA fuses into the projection
pipeline — no per-degree python branching at trace time beyond the static
`deg` argument.
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def num_sh_coeffs(deg: int) -> int:
    return (deg + 1) ** 2


def eval_sh(deg: int, sh, dirs):
    """Evaluate SH at unit directions.

    Args:
      deg: static degree 0..3.
      sh: [..., K, 3] coefficients with K >= (deg+1)^2 (extra coeffs ignored).
      dirs: [..., 3] unit view directions.
    Returns:
      [..., 3] color (pre +0.5 offset, like the reference).
    """
    assert 0 <= deg <= 3
    result = C0 * sh[..., 0, :]
    if deg >= 1:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = (result
                  - C1 * y * sh[..., 1, :]
                  + C1 * z * sh[..., 2, :]
                  - C1 * x * sh[..., 3, :])
    if deg >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = (result
                  + C2[0] * xy * sh[..., 4, :]
                  + C2[1] * yz * sh[..., 5, :]
                  + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                  + C2[3] * xz * sh[..., 7, :]
                  + C2[4] * (xx - yy) * sh[..., 8, :])
    if deg >= 3:
        result = (result
                  + C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                  + C3[1] * xy * z * sh[..., 10, :]
                  + C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                  + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                  + C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                  + C3[5] * z * (xx - yy) * sh[..., 14, :]
                  + C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :])
    return result


def sh_degree_mask(active_deg, max_deg: int):
    """[K] 0/1 mask selecting coefficients of degree <= active_deg.

    Lets a jitted renderer take the *active* SH degree as a traced scalar
    (the reference bumps it every 1000 iters,
    `/root/reference/trainer/ht3dgs_trainer.py:571-572`) without recompiling:
    evaluate at max degree and zero out inactive bands.
    """
    K = num_sh_coeffs(max_deg)
    idx = jnp.arange(K)
    deg_of = jnp.floor(jnp.sqrt(idx.astype(jnp.float32))).astype(jnp.int32)
    return (deg_of <= active_deg).astype(jnp.float32)


def rgb2sh(rgb):
    return (rgb - 0.5) / C0


def sh2rgb(sh):
    return sh * C0 + 0.5
