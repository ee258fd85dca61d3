"""Differentiable Gaussian rasterization (TPU-native).

`render()` is the single entry point; it glues projection + blending and is
the functional equivalent of `CF3DGS_Render.render`
(`/root/reference/scene/gaussian_model_ht.py:775-909`), with the camera-pose
gradient path made explicit: an optional SE(3) `pose` rigidly transforms the
Gaussians before rasterization (the reference's `get_xyz` lietorch trick,
`:136-148`), so `jax.grad` w.r.t. the pose tangent gives pose gradients.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.gaussians import GaussianState
from ..core.se3 import se3_act, se3_inv
from .projection import Projected, project
from .reference import rasterize_oracle


def render(
    state: GaussianState,
    camera: Camera,
    pose: Optional[jax.Array] = None,
    bg_color: Optional[jax.Array] = None,
    means2d_probe: Optional[jax.Array] = None,
    scale_modifier: float = 1.0,
    view_dependent: bool = True,
    mode: str = "auto",
    tile_args: Optional[dict] = None,
) -> Dict[str, jax.Array]:
    """Render a GaussianState through `camera`.

    Args:
      pose: optional SE(3) 7-vector applied to the means only (covariances
        deliberately stay model-frame-aligned — parity with the reference,
        where `P.retr().act(xyz)` moves points but `_rotation` is untouched
        during pose fitting).
      means2d_probe: optional [cap, 2] zeros; its cotangent is the
        screen-space mean gradient in the reference's NDC·(0.5·size)
        convention used for densification stats
        (/root/reference/scene/gaussian_model_ht.py:718-721).
      mode: "oracle" (pure-jnp, any device), "tiled" (tile-binned fast path),
        or "auto" (tiled for large N·pixels, else oracle).
    Returns:
      dict(image [H,W,3], depth [H,W], alpha [H,W], radii [cap], valid [cap]).
    """
    if bg_color is None:
        bg_color = jnp.zeros((3,), jnp.float32)

    means = state.means
    campos_override = None
    sh_means_override = None
    if pose is not None:
        means_render = se3_act(pose, means)
        # SH view dirs use model-frame means and the detached pose-inverse
        # camera center (reference convert_SHs_python path, gaussian_model_ht
        # .py:846-864).
        campos_override = jax.lax.stop_gradient(se3_inv(pose)[..., :3])
        sh_means_override = means
    else:
        means_render = means

    proj = project(
        means_render,
        state.scales(),
        state.quats,
        state.opacities(),
        state.sh(),
        state.live,
        camera,
        state.active_sh_degree,
        state.max_sh_degree,
        campos_override=campos_override,
        sh_means_override=sh_means_override,
        scale_modifier=scale_modifier,
    )
    if not view_dependent:
        proj = proj._replace(colors=jnp.maximum(state.sh_dc[:, 0, :], 0.0))

    if means2d_probe is not None:
        scale = jnp.asarray(
            [0.5 * camera.width, 0.5 * camera.height], jnp.float32)
        proj = proj._replace(means2d=proj.means2d + means2d_probe * scale)

    n_pix = camera.height * camera.width
    if mode == "auto":
        mode = "tiled" if (state.capacity >= 8192 or n_pix >= 128 * 128) else "oracle"

    if mode == "oracle":
        out = rasterize_oracle(proj, camera.height, camera.width, bg_color)
    elif mode in ("tiled", "pallas"):
        from .tiled import rasterize_tiled

        args = dict(tile_args or {})
        if mode == "pallas":
            args.setdefault("backend", "pallas")
        out = rasterize_tiled(proj, camera.height, camera.width, bg_color,
                              **args)
    else:
        raise ValueError(f"unknown render mode: {mode}")

    out["radii"] = proj.radii
    out["valid"] = proj.valid
    return out


__all__ = ["render", "project", "Projected", "rasterize_oracle"]
