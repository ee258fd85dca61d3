"""Shared projection stage of the differentiable Gaussian rasterizer.

Re-derivation of the preprocess performed inside the reference's CUDA
`diff-gaussian-rasterization` forward (consumed at
`/root/reference/scene/gaussian_model_ht.py:871-894`): frustum cull, 3D->2D
EWA covariance projection, screen radius, conic, and SH->RGB. Everything here
is pure jnp — it vmaps/fuses onto the VPU/MXU and is reused by both the
pure-jnp oracle renderer and the tiled/Pallas fast path. All functions are
differentiable by JAX AD (the backward of this stage is where the reference's
means2D/SH/scale/rotation/pose gradients come from).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import sh as sh_lib
from ..core.camera import Camera

# CUDA-reference constants (behavioral parity targets)
NEAR_CULL = 0.2          # camera-space z cull
COV2D_BLUR = 0.3         # low-pass added to the projected covariance diagonal
ALPHA_MIN = 1.0 / 255.0  # per-sample alpha cutoff
ALPHA_MAX = 0.99         # per-sample alpha clamp
T_EPS = 1e-4             # transmittance early-stop threshold


class Projected(NamedTuple):
    """Per-Gaussian screen-space quantities. N is the (static) capacity."""

    means2d: jax.Array   # [N, 2] pixel coords
    depths: jax.Array    # [N] camera-space z
    conics: jax.Array    # [N, 3] upper-tri inverse 2D covariance (a, b, c)
    radii: jax.Array     # [N] int32 screen radius, 0 => culled
    colors: jax.Array    # [N, 3] RGB (SH evaluated, clamped >= 0)
    opacities: jax.Array  # [N] post-sigmoid opacity
    valid: jax.Array     # [N] bool: live && in frustum && radius > 0
    extents: jax.Array   # [N, 2] per-axis binning half-extents (pixels)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    from ..core.se3 import quat_to_matrix, quat_normalize

    return quat_to_matrix(quat_normalize(q))


def _quat_rotmat_cols(quats: jax.Array):
    """Rotation-matrix entries of normalized quats as nine [N] arrays.

    Column form instead of [N,3,3]: XLA lays [N,3,3] out with the trailing
    (3,3) padded to a full (8,128) memory tile — a 57x HBM expansion that
    OOMs batched/vmapped graphs and wastes 92% of every vector op. All the
    3x3 algebra in this stage is therefore unrolled over scalar columns.
    """
    from ..core.se3 import quat_normalize

    x, y, z, w = jnp.moveaxis(quat_normalize(quats), -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return ((1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)),
            (2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)),
            (2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)))


def compute_cov3d(scales: jax.Array, quats: jax.Array,
                  scale_modifier: float = 1.0) -> jax.Array:
    """Σ = L Lᵀ with L = R(q) diag(s·mod). Returns [N, 3, 3]."""
    R = quat_to_rotmat(quats)
    L = R * (scales * scale_modifier)[..., None, :]
    # HIGHEST: TPU default matmul precision is bf16 (see project())
    return jnp.matmul(L, jnp.swapaxes(L, -1, -2),
                      precision=jax.lax.Precision.HIGHEST)


def project(
    means3d: jax.Array,
    scales: jax.Array,
    quats: jax.Array,
    opacities: jax.Array,
    sh: jax.Array,
    live: jax.Array,
    camera: Camera,
    active_sh_degree,
    max_sh_degree: int,
    campos_override: Optional[jax.Array] = None,
    sh_means_override: Optional[jax.Array] = None,
    scale_modifier: float = 1.0,
) -> Projected:
    """Project N Gaussians into screen space of `camera`.

    Args:
      means3d: [N,3] positions in the render frame (already pose-transformed
        by the caller when doing SfM-free pose fitting, mirroring
        `get_xyz`'s `P.retr().act(xyz)` at
        /root/reference/scene/gaussian_model_ht.py:136-148).
      sh: [N,K,3] SH coefficients (K = (max_sh_degree+1)^2).
      live: [N] bool capacity mask (dead slots render as invisible).
      active_sh_degree: traced int scalar — bands above it are masked so the
        jitted renderer never recompiles when the degree is bumped.
      campos_override: [3] camera position used *only* for the SH view
        direction. During pose fitting the reference evaluates SH at the
        detached pose-inverse camera center with *model-frame* means
        (/root/reference/scene/gaussian_model_ht.py:846-864).
      sh_means_override: [N,3] model-frame means for the SH direction.
    """
    N = means3d.shape[0]
    W = camera.world_view
    Rcw = W[:3, :3]
    tcw = W[:3, 3]

    # Point transforms unrolled over scalar columns: a [N,3]@[3,3] jnp
    # matmul executes on the TPU MXU at DEFAULT precision = bf16 inputs —
    # ~0.4% relative coordinate error, which at scene scale is a multi-pixel
    # screen-space distortion that silently degrades pose fitting on TPU
    # while every CPU test stays exact. Elementwise math is f32 on every
    # backend (and for K=3 costs the same).
    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]

    def _xform_rows(M3, t3):
        return [mx * M3[j, 0] + my * M3[j, 1] + mz * M3[j, 2] + t3[j]
                for j in range(M3.shape[0])]

    p_view = jnp.stack(_xform_rows(Rcw, tcw), axis=-1)
    depths = p_view[:, 2]

    # --- perspective projection to pixels --------------------------------
    full_proj = camera.full_proj
    p_hom = jnp.stack(_xform_rows(full_proj[:, :3], full_proj[:, 3]),
                      axis=-1)
    inv_w = 1.0 / (p_hom[:, 3] + 1e-7)
    ndc = p_hom[:, :3] * inv_w[:, None]
    px = ((ndc[:, 0] + 1.0) * camera.width - 1.0) * 0.5
    py = ((ndc[:, 1] + 1.0) * camera.height - 1.0) * 0.5
    means2d = jnp.stack([px, py], axis=-1)

    # --- EWA 2D covariance -------------------------------------------------
    # Fully unrolled over scalar [N] columns: no [N,3,3]/[N,2,3]
    # intermediates (see _quat_rotmat_cols for why). cov2d = A Aᵀ with
    # A = (J Rcw) (Rq diag(s)) — J the 2x3 perspective Jacobian.
    tan_fovx = camera.tan_half_fovx
    tan_fovy = camera.tan_half_fovy
    tz = p_view[:, 2]
    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(p_view[:, 0] / tz_safe, -limx, limx) * tz_safe
    ty = jnp.clip(p_view[:, 1] / tz_safe, -limy, limy) * tz_safe

    fx, fy = camera.fx, camera.fy
    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2
    # m[r][k] = (J @ Rcw)[r,k]; Rcw entries are compile-time-shared scalars
    m0 = [j00 * Rcw[0, k] + j02 * Rcw[2, k] for k in range(3)]
    m1 = [j11 * Rcw[1, k] + j12 * Rcw[2, k] for k in range(3)]
    rq = _quat_rotmat_cols(quats)
    s = scales * scale_modifier
    # a[r][j] = sum_k m[r][k] * Rq[k][j] * s_j
    a0 = [(m0[0] * rq[0][j] + m0[1] * rq[1][j] + m0[2] * rq[2][j]) * s[:, j]
          for j in range(3)]
    a1 = [(m1[0] * rq[0][j] + m1[1] * rq[1][j] + m1[2] * rq[2][j]) * s[:, j]
          for j in range(3)]
    c00 = a0[0] * a0[0] + a0[1] * a0[1] + a0[2] * a0[2] + COV2D_BLUR
    c01 = a0[0] * a1[0] + a0[1] * a1[1] + a0[2] * a1[2]
    c11 = a1[0] * a1[0] + a1[1] * a1[1] + a1[2] * a1[2] + COV2D_BLUR

    det = c00 * c11 - c01 * c01
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    conics = jnp.stack([c11 * inv_det, -c01 * inv_det, c00 * inv_det], axis=-1)

    mid = 0.5 * (c00 + c11)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

    # Tight per-axis binning extents. The blend gates every sample at
    # alpha = op*exp(-0.5 d^T C^-1 d) >= 1/255, so the support is the
    # ellipse 0.5 d^T C^-1 d <= ln(255*op), whose axis-aligned bbox is
    # |dx| <= sqrt(2 ln(255 op) * cov_xx) (and likewise y). Tiles outside
    # that bbox contribute exactly zero forward value AND zero gradient
    # (the gate also zeroes the backward), so binning with these extents is
    # bit-equivalent to the oracle while generating far fewer tile entries
    # than the CUDA reference's isotropic 3-sigma square (which we keep as
    # a cap: the reference drops the alpha>=1/255 tail beyond 3 sigma for
    # near-opaque Gaussians, and `radii` stays the densification metric).
    # +1 px guards the floor/ceil tile rounding at tiny extents.
    # stop_gradient: extents only gate DISCRETE tile-rect decisions (no
    # continuous dependence), and sqrt has an inf-gradient at 0 (opacity at
    # the 1/255 cutoff makes lvl2 exactly 0) — 0-cotangent x inf = NaN
    # would otherwise poison every parameter gradient via the pack VJP.
    lvl2 = 2.0 * jnp.maximum(jnp.log(255.0 * jnp.maximum(opacities, 1e-9)),
                             0.0)
    ex = jnp.minimum(jnp.sqrt(lvl2 * jnp.maximum(c00, 0.0)), radius_f) + 1.0
    ey = jnp.minimum(jnp.sqrt(lvl2 * jnp.maximum(c11, 0.0)), radius_f) + 1.0
    extents = jax.lax.stop_gradient(jnp.stack([ex, ey], axis=-1))

    in_front = depths > NEAR_CULL
    ok = in_front & (det > 0.0) & live
    radii = jnp.where(ok, radius_f, 0.0).astype(jnp.int32)
    # opacity cull is exact: alpha = op * exp(power) <= op, so op below the
    # per-sample cutoff can never pass the blend's alpha test — excluding
    # such Gaussians from binning changes nothing downstream. Only `valid`
    # is gated (not `radii`): the reference counts them visible in the
    # densification stats, and radii parity preserves that.
    valid = ok & (radii > 0) & (opacities >= ALPHA_MIN)

    # --- SH -> RGB ----------------------------------------------------------
    campos = camera.camera_center if campos_override is None else campos_override
    sh_means = means3d if sh_means_override is None else sh_means_override
    dirs = sh_means - campos[None, :]
    # NaN-safe normalization: linalg.norm has a NaN gradient at 0, and dead
    # capacity slots (means == 0) can coincide with the camera center; a NaN
    # cotangent there would poison the whole step via 0·NaN in the blend.
    dirs = dirs * jax.lax.rsqrt(
        jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-12)
    band_mask = sh_lib.sh_degree_mask(active_sh_degree, max_sh_degree)
    color = sh_lib.eval_sh(max_sh_degree, sh * band_mask[None, :, None], dirs)
    colors = jnp.maximum(color + 0.5, 0.0)

    # sanitize culled/dead rows so no NaN/garbage can leak through masked
    # arithmetic (0·NaN = NaN) anywhere downstream
    v1 = valid[:, None]
    return Projected(
        means2d=jnp.where(v1, means2d, 0.0),
        depths=jnp.where(valid, depths, jnp.inf),
        conics=jnp.where(v1, conics, 0.0),
        radii=radii,
        colors=jnp.where(v1, colors, 0.0),
        opacities=jnp.where(valid, opacities, 0.0),
        valid=valid,
        extents=jnp.where(v1, extents, 0.0),
    )
