"""Camera model.

Mirrors the reference's `Camera` semantics (`/root/reference/scene/cameras.py:16-103`)
— the hierarchical-training path always takes the `is_co3d=True` branch there:
``world_view = [[R, T], [0, 1]]`` with **R not transposed**, and an
OpenGL-style projection built directly from pixel intrinsics::

    [[2fx/w, 0, -(w-2cx)/w, 0],
     [0, 2fy/h, -(h-2cy)/h, 0],
     [0, 0, zf/(zf-zn), -(zf*zn)/(zf-zn)],
     [0, 0, 1, 0]]

We store matrices in math convention (row-vector-free: ``p_clip = P @ W @ p``)
rather than the reference's torch-transposed layout. Images are channel-last
``[H, W, 3]`` float32 in [0, 1] — the natural TPU layout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

ZNEAR = 0.01
ZFAR = 100.0


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * float(np.arctan(pixels / (2.0 * focal)))


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * float(np.tan(fov / 2.0)))


def projection_from_intrinsics(fx, fy, cx, cy, w, h,
                               znear=ZNEAR, zfar=ZFAR) -> np.ndarray:
    return np.asarray(
        [
            [2.0 * fx / w, 0.0, -(w - 2.0 * cx) / w, 0.0],
            [0.0, 2.0 * fy / h, -(h - 2.0 * cy) / h, 0.0],
            [0.0, 0.0, zfar / (zfar - znear), -(zfar * znear) / (zfar - znear)],
            [0.0, 0.0, 1.0, 0.0],
        ],
        dtype=np.float32,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Per-view container. H/W are static (recompile per resolution, which is
    constant within a scene); matrices/scalars are traced leaves."""

    world_view: jax.Array          # [4, 4] world -> camera (w2c)
    fx: jax.Array                  # scalar
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    # EWA Jacobian clamp limits (tan of half-FoV). Default None = derive from
    # this camera's own height/width. A sharded row-block render must pass
    # the FULL image's limits here so per-shard projection matches the
    # unsharded render exactly (see parallel.mesh).
    clip_tan_x: Optional[jax.Array] = None
    clip_tan_y: Optional[jax.Array] = None

    @property
    def tan_half_fovx(self):
        if self.clip_tan_x is not None:
            return self.clip_tan_x
        return 0.5 * self.width / self.fx

    @property
    def tan_half_fovy(self):
        if self.clip_tan_y is not None:
            return self.clip_tan_y
        return 0.5 * self.height / self.fy

    @property
    def full_proj(self):
        import jax.numpy as jnp

        proj = jnp.zeros((4, 4), dtype=jnp.float32)
        w, h = float(self.width), float(self.height)
        proj = proj.at[0, 0].set(2.0 * self.fx / w)
        proj = proj.at[0, 2].set(-(w - 2.0 * self.cx) / w)
        proj = proj.at[1, 1].set(2.0 * self.fy / h)
        proj = proj.at[1, 2].set(-(h - 2.0 * self.cy) / h)
        proj = proj.at[2, 2].set(ZFAR / (ZFAR - ZNEAR))
        proj = proj.at[2, 3].set(-(ZFAR * ZNEAR) / (ZFAR - ZNEAR))
        proj = proj.at[3, 2].set(1.0)
        # HIGHEST: TPU default matmul precision is bf16; the projection
        # matrix feeds every screen-space coordinate (raster/projection.py)
        return jnp.matmul(proj, self.world_view,
                          precision=jax.lax.Precision.HIGHEST)

    @property
    def camera_center(self):
        import jax.numpy as jnp

        R = self.world_view[:3, :3]
        t = self.world_view[:3, 3]
        return -jnp.matmul(R.T, t, precision=jax.lax.Precision.HIGHEST)


def make_camera(
    height: int,
    width: int,
    intrinsics: np.ndarray,
    world_view: Optional[np.ndarray] = None,
    R: Optional[np.ndarray] = None,
    T: Optional[np.ndarray] = None,
) -> Camera:
    """Build a Camera from a 3x3 K and either a 4x4 w2c or (R, T) with R the
    w2c rotation (reference `getWorld2View3` convention: R not transposed)."""
    import jax.numpy as jnp

    if world_view is None:
        world_view = np.eye(4, dtype=np.float32)
        if R is not None:
            world_view[:3, :3] = R
        if T is not None:
            world_view[:3, 3] = T
    K = np.asarray(intrinsics, dtype=np.float32)
    return Camera(
        world_view=jnp.asarray(world_view, dtype=jnp.float32),
        fx=jnp.asarray(K[0, 0]),
        fy=jnp.asarray(K[1, 1]),
        cx=jnp.asarray(K[0, 2]),
        cy=jnp.asarray(K[1, 2]),
        height=int(height),
        width=int(width),
    )


def intrinsics_from_fov(fovx: float, height: int, width: int,
                        fovy: Optional[float] = None) -> np.ndarray:
    """K with principal point at the image center, from horizontal FoV
    (reference images_only loaders derive fy from FovY or aspect)."""
    fx = fov2focal(fovx, width)
    fy = fov2focal(fovy, height) if fovy is not None else fx
    return np.asarray(
        [[fx, 0.0, width / 2.0], [0.0, fy, height / 2.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
