"""Gaussian scene state as a fixed-capacity pytree.

TPU-native redesign of the reference's `HTGaussianModel` parameter store
(`/root/reference/scene/gaussian_model_ht.py:67-233`). XLA requires static
shapes, so instead of the reference's optimizer-state surgery on growing
tensors (`:548-629`) we keep a fixed capacity `cap` with a `live` mask;
densify writes into free slots and prune clears the mask (see
`ht3dgs.train.densify`). The host orchestrator re-allocates to a larger
capacity (one recompile) when occupancy crosses a threshold.

Parameter groups and their activations match the reference:
  means (xyz), quats (rotation, normalized at use), log_scales (scaling,
  exp), sh_dc / sh_rest (f_dc / f_rest), opacity_logit (opacity, sigmoid).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import sh as sh_lib

PARAM_FIELDS = ("means", "quats", "log_scales", "sh_dc", "sh_rest",
                "opacity_logit")

# reference LR-group names (training_setup,
# /root/reference/scene/gaussian_model_ht.py:263-318)
GROUP_OF_FIELD = {
    "means": "xyz",
    "quats": "rotation",
    "log_scales": "scaling",
    "sh_dc": "f_dc",
    "sh_rest": "f_rest",
    "opacity_logit": "opacity",
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianState:
    # --- optimized parameters (capacity-padded) ---
    means: jax.Array          # [cap, 3]
    quats: jax.Array          # [cap, 4] (x? no: [w-first? see below)
    log_scales: jax.Array     # [cap, 3]
    sh_dc: jax.Array          # [cap, 1, 3]
    sh_rest: jax.Array        # [cap, K-1, 3]
    opacity_logit: jax.Array  # [cap, 1]
    # --- capacity / stats (not optimized) ---
    live: jax.Array           # [cap] bool
    max_radii2d: jax.Array    # [cap] float32
    grad_accum: jax.Array     # [cap] float32 (sum of ||dL/dmeans2D||, NDC conv.)
    grad_denom: jax.Array     # [cap] float32
    active_sh_degree: jax.Array  # [] int32
    # --- static ---
    max_sh_degree: int = dataclasses.field(metadata=dict(static=True))

    # NOTE on quats: stored [x, y, z, w] like ht3dgs.core.se3. The reference
    # stores [w, x, y, z] with identity (1,0,0,0); only the layout differs.

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def num_sh_rest(self) -> int:
        return self.sh_rest.shape[1]

    def n_live(self) -> jax.Array:
        return jnp.sum(self.live.astype(jnp.int32))

    def params(self) -> Dict[str, jax.Array]:
        return {f: getattr(self, f) for f in PARAM_FIELDS}

    def replace_params(self, params: Dict[str, jax.Array]) -> "GaussianState":
        return dataclasses.replace(self, **params)

    # --- activations -------------------------------------------------------
    def scales(self) -> jax.Array:
        return jnp.exp(self.log_scales)

    def opacities(self) -> jax.Array:
        return jax.nn.sigmoid(self.opacity_logit[:, 0])

    def sh(self) -> jax.Array:
        return jnp.concatenate([self.sh_dc, self.sh_rest], axis=1)


def inverse_sigmoid(x):
    return np.log(x / (1.0 - x))


def mean_sq_dist_to_3nn(points: np.ndarray) -> np.ndarray:
    """Mean squared distance to the 3 nearest neighbors.

    Replaces simple-knn's `distCUDA2` (init-only,
    /root/reference/scene/gaussian_model_ht.py:211-217). Uses the native C++
    grid-KNN when built (ht3dgs.native), else a scipy KDTree — this runs once
    per model init on the host, so it is not a hot path.
    """
    try:
        from ..native import knn as native_knn

        return native_knn.mean_sq_dist_3nn(points.astype(np.float32))
    except Exception:
        from scipy.spatial import KDTree

        d, _ = KDTree(points).query(points, k=4)
        return (d[:, 1:] ** 2).mean(axis=1).astype(np.float32)


def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    capacity: int,
    max_sh_degree: int = 3,
    view_dependent: bool = True,
) -> GaussianState:
    """Initialize from a point cloud.

    Parity with `create_from_pcd` (/root/reference/scene/gaussian_model_ht.py:197-233):
    SH DC from RGB2SH(color), rest zero, log-scale = log(sqrt(mean sq 3-NN
    dist)) isotropic, identity rotation, opacity logit of 0.1.
    """
    n = points.shape[0]
    cap = max(capacity, n)
    K = sh_lib.num_sh_coeffs(max_sh_degree)

    dist2 = np.maximum(mean_sq_dist_to_3nn(points), 1e-7)
    log_scale = 0.5 * np.log(dist2)  # log(sqrt(dist2))

    means = np.zeros((cap, 3), np.float32)
    means[:n] = points
    quats = np.zeros((cap, 4), np.float32)
    quats[:, 3] = 1.0  # identity [x,y,z,w]
    log_scales = np.full((cap, 3), -10.0, np.float32)
    log_scales[:n] = log_scale[:, None]
    sh_dc = np.zeros((cap, 1, 3), np.float32)
    if view_dependent:
        sh_dc[:n, 0] = sh_lib.rgb2sh(colors.astype(np.float32))
    else:
        sh_dc[:n, 0] = colors.astype(np.float32)
    sh_rest = np.zeros((cap, K - 1, 3), np.float32)
    opacity_logit = np.full((cap, 1), inverse_sigmoid(0.1), np.float32)
    live = np.zeros((cap,), bool)
    live[:n] = True

    return GaussianState(
        means=jnp.asarray(means),
        quats=jnp.asarray(quats),
        log_scales=jnp.asarray(log_scales),
        sh_dc=jnp.asarray(sh_dc),
        sh_rest=jnp.asarray(sh_rest),
        opacity_logit=jnp.asarray(opacity_logit),
        live=jnp.asarray(live),
        max_radii2d=jnp.zeros((cap,), jnp.float32),
        grad_accum=jnp.zeros((cap,), jnp.float32),
        grad_denom=jnp.zeros((cap,), jnp.float32),
        active_sh_degree=jnp.asarray(0, jnp.int32),
        max_sh_degree=max_sh_degree,
    )


def random_sphere_pcd(num_pts: int = 10000, radius: float = 1.0,
                      seed: int = 0) -> Tuple[np.ndarray, np.ndarray, float]:
    """Random ball init (CF3DGS_Render.init_model(None),
    /root/reference/scene/gaussian_model_ht.py:741-760). Returns
    (points, colors, max_radius)."""
    rng = np.random.default_rng(seed)
    phis = rng.random(num_pts) * 2 * np.pi
    costheta = rng.random(num_pts) * 2 - 1
    thetas = np.arccos(costheta)
    r = radius * np.cbrt(rng.random(num_pts))
    x = r * np.sin(thetas) * np.cos(phis)
    y = r * np.sin(thetas) * np.sin(phis)
    z = r * np.cos(thetas)
    points = np.stack([x, y, z], axis=1).astype(np.float32)
    colors = sh_lib.sh2rgb(rng.random((num_pts, 3)) / 255.0).astype(np.float32)
    return points, colors, float(r.max())


def oneup_sh_degree(state: GaussianState) -> GaussianState:
    return dataclasses.replace(
        state,
        active_sh_degree=jnp.minimum(
            state.active_sh_degree + 1, state.max_sh_degree),
    )
