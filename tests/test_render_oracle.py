"""Oracle renderer: blending vs a sequential numpy re-implementation, plus
projection sanity and gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np

from ht3dgs.core import gaussians as G
from ht3dgs.core.camera import intrinsics_from_fov, make_camera
from ht3dgs.raster import render
from ht3dgs.raster.projection import (ALPHA_MAX, ALPHA_MIN, T_EPS, project)
from ht3dgs.raster.reference import rasterize_oracle


def make_scene(n=64, seed=0, cap=None):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32) * 0.3
    pts[:, 2] += 3.0  # in front of the camera
    colors = rng.random((n, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, colors, capacity=cap or n)
    K = intrinsics_from_fov(1.2, 32, 48)
    cam = make_camera(32, 48, K)
    return state, cam


def numpy_blend(proj, H, W, bg):
    """Sequential per-pixel front-to-back compositing — the plain-python
    definition of the CUDA reference semantics."""
    means2d = np.asarray(proj.means2d)
    conics = np.asarray(proj.conics)
    colors = np.asarray(proj.colors)
    opac = np.asarray(proj.opacities)
    depths = np.asarray(proj.depths)
    valid = np.asarray(proj.valid)
    order = np.argsort(depths, kind="stable")

    img = np.zeros((H, W, 3))
    dep = np.zeros((H, W))
    alpha_map = np.zeros((H, W))
    for y in range(H):
        for x in range(W):
            T = 1.0
            for i in order:
                if not valid[i]:
                    continue
                dx = x - means2d[i, 0]
                dy = y - means2d[i, 1]
                a, b, c = conics[i]
                power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                if power > 0:
                    continue
                al = min(ALPHA_MAX, opac[i] * np.exp(power))
                if al < ALPHA_MIN:
                    continue
                Tn = T * (1 - al)
                if Tn < T_EPS:
                    break
                img[y, x] += al * T * colors[i]
                dep[y, x] += al * T * depths[i]
                T = Tn
            img[y, x] += T * bg
            alpha_map[y, x] = 1 - T
    return np.clip(img, 0, 1), dep, alpha_map


def test_blend_matches_numpy_sequential():
    state, cam = make_scene(n=48)
    proj = project(state.means, state.scales(), state.quats,
                   state.opacities(), state.sh(), state.live, cam,
                   jnp.asarray(3), 3)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    out = rasterize_oracle(proj, cam.height, cam.width, jnp.asarray(bg))
    ref_img, ref_dep, ref_alpha = numpy_blend(proj, cam.height, cam.width, bg)
    np.testing.assert_allclose(np.asarray(out["image"]), ref_img, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), ref_dep, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["alpha"]), ref_alpha, atol=2e-5)


def test_projection_center_point():
    """A point on the optical axis lands at the principal point with depth z."""
    state, _ = make_scene(n=4)
    state.means = state.means.at[0].set(jnp.asarray([0.0, 0.0, 2.0]))
    K = intrinsics_from_fov(1.0, 64, 64)
    cam = make_camera(64, 64, K)
    proj = project(state.means, state.scales(), state.quats,
                   state.opacities(), state.sh(), state.live, cam,
                   jnp.asarray(0), 3)
    # ndc2pix([0,0]) = (S-1)/2
    np.testing.assert_allclose(np.asarray(proj.means2d[0]),
                               [(64 - 1) / 2, (64 - 1) / 2], atol=1e-3)
    np.testing.assert_allclose(float(proj.depths[0]), 2.0, atol=1e-5)


def test_dead_slots_invisible():
    state, cam = make_scene(n=16, cap=32)
    out = render(state, cam, mode="oracle")
    # re-render after marking half the live ones dead: image must change,
    # dead-slot garbage must not contribute
    state2 = state
    state2.live = state.live.at[8:].set(False)
    out2 = render(state2, cam, mode="oracle")
    assert not np.allclose(np.asarray(out["image"]), np.asarray(out2["image"]))
    # all-dead renders pure background
    state3 = state
    state3.live = jnp.zeros_like(state.live)
    out3 = render(state3, cam, mode="oracle",
                  bg_color=jnp.asarray([0.5, 0.5, 0.5]))
    np.testing.assert_allclose(np.asarray(out3["image"]), 0.5, atol=1e-6)


def test_render_grads_finite_and_nonzero():
    state, cam = make_scene(n=32)
    target = jnp.zeros((cam.height, cam.width, 3))

    def loss_fn(means, log_scales, sh_dc, opacity_logit):
        import dataclasses

        s = dataclasses.replace(state, means=means, log_scales=log_scales,
                                sh_dc=sh_dc, opacity_logit=opacity_logit)
        out = render(s, cam, mode="oracle")
        return jnp.mean(jnp.abs(out["image"] - target))

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(
        state.means, state.log_scales, state.sh_dc, state.opacity_logit)
    for g in grads:
        g = np.asarray(g)
        assert np.all(np.isfinite(g))
        assert np.abs(g).max() > 0


def test_means_grad_finite_difference():
    """FD check on x/y mean perturbations.

    The renderer has genuine discontinuities (alpha cutoffs, transmittance
    early-stop, depth-sort order), so the scene keeps depths well separated
    and only x/y are perturbed; the smooth part of the gradient must match.
    """
    import dataclasses

    with jax.enable_x64():
        state, cam = make_scene(n=8)
        to64 = lambda x: x.astype(jnp.float64) if jnp.issubdtype(
            x.dtype, jnp.floating) else x
        state = jax.tree.map(to64, state)
        cam = jax.tree.map(to64, cam)
        # well-separated depths, no reordering under perturbation
        z = jnp.asarray(np.linspace(2.0, 6.0, 8))
        state.means = state.means.at[:, 2].set(z)

        def loss_fn(means):
            s = dataclasses.replace(state, means=means)
            return jnp.sum(render(s, cam, mode="oracle")["image"])

        g = np.asarray(jax.grad(loss_fn)(state.means))
        eps = 1e-6
        rng = np.random.default_rng(0)
        checked = 0
        for _ in range(8):
            i = int(rng.integers(0, 8))
            j = int(rng.integers(0, 2))  # x/y only
            if abs(g[i, j]) < 1e-3:
                continue
            d = np.zeros_like(np.asarray(state.means))
            d[i, j] = eps
            lp = float(loss_fn(state.means + jnp.asarray(d)))
            lm = float(loss_fn(state.means - jnp.asarray(d)))
            fd = (lp - lm) / (2 * eps)
            np.testing.assert_allclose(g[i, j], fd, rtol=1e-4, atol=1e-6)
            checked += 1
        assert checked >= 3


def test_pose_gradient_path():
    """Rendering with an SE(3) pose produces nonzero pose-tangent grads —
    the reference's lietorch pose-optimization path (SURVEY.md §3.2)."""
    from ht3dgs.core import se3

    state, cam = make_scene(n=32)
    base = se3.se3_identity()
    target = render(state, cam, mode="oracle")["image"]

    def loss_fn(delta):
        pose = se3.se3_retr(delta, base)
        out = render(state, cam, pose=pose, mode="oracle")
        return jnp.mean((out["image"] - target) ** 2)

    g = np.asarray(jax.grad(loss_fn)(jnp.zeros(6)))
    assert np.all(np.isfinite(g))
    # at delta=0 the image matches the target; grad should be ~0
    np.testing.assert_allclose(g, 0.0, atol=1e-5)
    g2 = np.asarray(jax.grad(loss_fn)(jnp.full((6,), 0.05)))
    assert np.abs(g2).max() > 0


def test_means2d_probe_grad():
    """The probe cotangent carries the densification signal (NDC conv.)."""
    state, cam = make_scene(n=16)

    def loss_fn(probe):
        out = render(state, cam, means2d_probe=probe, mode="oracle")
        return jnp.sum(out["image"])

    g = np.asarray(jax.grad(loss_fn)(jnp.zeros((state.capacity, 2))))
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0
