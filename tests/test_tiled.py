"""Tiled renderer vs the oracle: images, depths, alphas, and gradients must
agree (the binning must not change blending semantics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ht3dgs.core import gaussians as G
from ht3dgs.core.camera import intrinsics_from_fov, make_camera
from ht3dgs.raster import render
from ht3dgs.raster.projection import project
from ht3dgs.raster.reference import rasterize_oracle
from ht3dgs.raster.tiled import rasterize_tiled


def make_scene(n=256, seed=0, h=48, w=64, spread=0.5):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32) * spread
    pts[:, 2] += 3.0
    colors = rng.random((n, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, colors, capacity=n)
    cam = make_camera(h, w, intrinsics_from_fov(1.2, h, w))
    return state, cam


def project_scene(state, cam):
    return project(state.means, state.scales(), state.quats,
                   state.opacities(), state.sh(), state.live, cam,
                   jnp.asarray(3), 3)


def test_tiled_matches_oracle():
    state, cam = make_scene(n=256)
    proj = project_scene(state, cam)
    bg = jnp.asarray([0.2, 0.1, 0.4])
    ora = rasterize_oracle(proj, cam.height, cam.width, bg)
    til = rasterize_tiled(proj, cam.height, cam.width, bg,
                          tile_h=16, tile_w=16, max_per_tile=256, chunk=16)
    assert int(til["n_dropped"]) == 0
    np.testing.assert_allclose(np.asarray(til["image"]),
                               np.asarray(ora["image"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(til["depth"]),
                               np.asarray(ora["depth"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(til["alpha"]),
                               np.asarray(ora["alpha"]), atol=2e-5)


def test_tiled_nonmultiple_image_size():
    state, cam = make_scene(n=128, h=37, w=53)
    proj = project_scene(state, cam)
    bg = jnp.zeros(3)
    ora = rasterize_oracle(proj, cam.height, cam.width, bg)
    til = rasterize_tiled(proj, cam.height, cam.width, bg, tile_h=16,
                          tile_w=16, max_per_tile=256)
    np.testing.assert_allclose(np.asarray(til["image"]),
                               np.asarray(ora["image"]), atol=2e-5)


def test_tiled_gradients_match_oracle():
    state, cam = make_scene(n=64, h=32, w=32)
    target = jnp.zeros((cam.height, cam.width, 3))

    def loss(means, mode):
        s = dataclasses.replace(state, means=means)
        out = render(s, cam, mode=mode,
                     tile_args=dict(max_per_tile=128, chunk=16))
        return jnp.mean((out["image"] - target) ** 2)

    g_o = np.asarray(jax.grad(lambda m: loss(m, "oracle"))(state.means))
    g_t = np.asarray(jax.grad(lambda m: loss(m, "tiled"))(state.means))
    np.testing.assert_allclose(g_t, g_o, atol=1e-5)


def test_tiled_overflow_reported():
    # tiny per-tile cap on a dense scene must report drops, not crash
    state, cam = make_scene(n=256, spread=0.05)
    proj = project_scene(state, cam)
    til = rasterize_tiled(proj, cam.height, cam.width, jnp.zeros(3),
                          max_per_tile=8, dup_factor=2)
    assert np.all(np.isfinite(np.asarray(til["image"])))
    assert int(til["n_dropped"]) > 0


def test_overflow_diagnostics_are_selective():
    """The two overflow counters must identify WHICH capacity overflowed —
    the trainer's auto-grow widens only the exhausted knob."""
    state, cam = make_scene(n=256, spread=0.05)
    proj = project_scene(state, cam)
    bg = jnp.zeros(3)

    # per-tile-only overflow: huge dup pool, tiny per-tile lists
    t = rasterize_tiled(proj, cam.height, cam.width, bg,
                        max_per_tile=8, dup_factor=16)
    assert int(t["n_dropped_tile"]) > 0
    assert int(t["n_dropped_m"]) == 0
    assert int(t["n_dropped"]) == int(t["n_dropped_tile"])

    # M-only overflow: dup_factor=1 with multi-tile footprints, wide lists
    m = rasterize_tiled(proj, cam.height, cam.width, bg,
                        max_per_tile=512, dup_factor=1)
    assert int(m["n_dropped_m"]) > 0
    assert int(m["n_dropped_tile"]) == 0
    assert int(m["n_dropped"]) == int(m["n_dropped_m"])


def test_tiled_jit_and_probe_grad():
    state, cam = make_scene(n=128)

    @jax.jit
    def f(probe):
        out = render(state, cam, means2d_probe=probe, mode="tiled",
                     tile_args=dict(max_per_tile=256))
        return jnp.sum(out["image"])

    g = np.asarray(jax.grad(f)(jnp.zeros((state.capacity, 2))))
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0


def test_grads_finite_with_subcutoff_opacity():
    """Opacity at/below the 1/255 alpha cutoff makes the tight-extent level
    set exactly zero; sqrt's inf-gradient there must not leak NaN into any
    parameter gradient (extents are stop_gradient'ed — regression for a
    round-2 bug caught by tools/backend_parity_tpu.py)."""
    state, cam = make_scene(n=128)
    logit = np.full((128, 1), -8.0, np.float32)   # sigmoid ~ 3e-4 < 1/255
    logit[:32] = 0.0                               # keep some visible
    state = dataclasses.replace(state, opacity_logit=jnp.asarray(logit))

    def loss(means, op, ls):
        st = dataclasses.replace(state, means=means, opacity_logit=op,
                                 log_scales=ls)
        out = render(st, cam, mode="tiled",
                     tile_args=dict(max_per_tile=128))
        return jnp.mean(out["image"] ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(
        state.means, state.opacity_logit, state.log_scales)
    for arr in g:
        assert np.all(np.isfinite(np.asarray(arr)))


def test_bf16_route_grads_close():
    """Opt-in bf16-packed backward routing: grads must match the exact f32
    routing to bf16 quantization tolerance (~0.5% of the grad scale)."""
    state, cam = make_scene(n=256)
    proj = project_scene(state, cam)
    bg = jnp.zeros((3,), jnp.float32)

    def loss(means2d, bf16):
        p = proj._replace(means2d=means2d)
        out = rasterize_tiled(p, cam.height, cam.width, bg,
                              max_per_tile=256, route_bf16=bf16)
        return jnp.mean(out["image"] ** 2)

    g0 = np.asarray(jax.grad(lambda m: loss(m, False))(proj.means2d))
    g1 = np.asarray(jax.grad(lambda m: loss(m, True))(proj.means2d))
    scale = np.abs(g0).max()
    assert np.all(np.isfinite(g1))
    assert np.max(np.abs(g1 - g0)) < 8e-3 * scale


def test_seg_ffill_pos_matches_reference():
    """_seg_ffill_pos: payload fill must match _seg_ffill and the returned
    position must be the 1-based global index of the supplying set slot —
    including across block boundaries of the blocked-cummax recursion."""
    from ht3dgs.raster.tiled import _seg_ffill, _seg_ffill_pos

    rng = np.random.default_rng(0)
    pb = 21  # block size 2^9 = 512 -> the 5000-long key spans ~10 blocks
    for L in (5000, 512, 511, 513, 37):
        key = np.zeros(L, np.int32)
        n_set = max(3, L // 97)
        idx = np.sort(rng.choice(L, size=n_set, replace=False))
        key[idx] = rng.integers(1, 1 << pb, size=n_set)
        val, pos = _seg_ffill_pos(jnp.asarray(key), pb)
        val, pos = np.asarray(val), np.asarray(pos)
        np.testing.assert_array_equal(
            val, np.asarray(_seg_ffill(jnp.asarray(key), pb)))
        # numpy reference
        ref_val = np.zeros(L, np.int64)
        ref_pos = np.zeros(L, np.int64)
        cur_v, cur_p = 0, 0
        for i in range(L):
            if key[i] != 0:
                cur_v, cur_p = key[i], i + 1
            ref_val[i], ref_pos[i] = cur_v, cur_p
        np.testing.assert_array_equal(val, ref_val)
        np.testing.assert_array_equal(pos, ref_pos)


def test_compact_n_exact_and_counts_drops():
    """Cull-compaction (tile_args compact_n): with capacity covering the
    live set the binning is BIT-identical to the uncompacted path — for the
    full image and for a row-block camera (the tile-sharded per-chip view,
    where compaction is what makes per-chip binning cost divide,
    VERDICT r4 missing #1). Undersized capacity drops farthest-first and
    reports n_dropped_compact."""
    from ht3dgs.raster.tiled import build_tile_lists

    state, cam = make_scene(n=512, h=64, w=64)
    # park a block of rows behind the camera so live < N and a
    # compact_n < N is lossless — the slice branch must actually RUN for
    # the parity assertions to mean anything
    means = np.asarray(state.means).copy()
    means[:100, 2] = -5.0
    state = dataclasses.replace(state, means=jnp.asarray(means))
    compact = 448      # >= 412 live rows, < N=512
    for camera in (
        cam,
        dataclasses.replace(cam, cy=cam.cy - 32.0, height=32,
                            clip_tan_x=cam.tan_half_fovx,
                            clip_tan_y=cam.tan_half_fovy),
    ):
        proj = project_scene(state, camera)
        assert int(jnp.sum(proj.valid.astype(jnp.int32))) <= compact
        a = build_tile_lists(proj, camera.height, camera.width, 16, 16,
                             1024, 16)
        b = build_tile_lists(proj, camera.height, camera.width, 16, 16,
                             1024, 16, compact_n=compact)
        for xa, xb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))

    # gradients identical too (the backward routes by original row ids)
    proj = project_scene(state, cam)

    def loss(means2d, compact_n):
        p = proj._replace(means2d=means2d)
        out = rasterize_tiled(p, cam.height, cam.width, jnp.zeros(3),
                              max_per_tile=1024, dup_factor=16,
                              compact_n=compact_n)
        return jnp.mean(out["image"] ** 2)

    g0 = np.asarray(jax.grad(lambda m: loss(m, None))(proj.means2d))
    g1 = np.asarray(jax.grad(lambda m: loss(m, compact))(proj.means2d))
    np.testing.assert_array_equal(g0, g1)

    # undersized: live rows past compact_n drop, and the counter says so
    live = int(jnp.sum((proj.valid).astype(jnp.int32)))
    small = max(8, live // 4)
    out = rasterize_tiled(proj, cam.height, cam.width, jnp.zeros(3),
                          max_per_tile=1024, dup_factor=16,
                          compact_n=small)
    assert int(out["n_dropped_compact"]) > 0
    assert int(out["n_dropped"]) >= int(out["n_dropped_compact"])


def test_wide_grid_4op_fallback_matches_oracle():
    """Grids with 4*bits > 31 take the 4-operand co-sort fallback (span as
    its own sort payload instead of packed span_y); pin it against the
    oracle — every other test runs the 3-op packed path (small grids)."""
    from ht3dgs.raster import tiled as TL

    h, w = 16, 4176                      # ntx=261 -> bits=9 -> 4*bits=36
    ntx = -(-w // 16)
    bits = max(int(ntx).bit_length(), int(-(-h // 16)).bit_length())
    assert 4 * bits > 31, "scene no longer exercises the fallback path"

    state, cam = make_scene(n=64, h=h, w=w, spread=2.0)
    proj = project_scene(state, cam)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    ora = rasterize_oracle(proj, cam.height, cam.width, bg)
    til = rasterize_tiled(proj, cam.height, cam.width, bg,
                          tile_h=16, tile_w=16, max_per_tile=2048,
                          dup_factor=512)
    assert int(til["n_dropped"]) == 0
    np.testing.assert_allclose(np.asarray(til["image"]),
                               np.asarray(ora["image"]), atol=2e-5)

    # gradients route through the same binning: keep them pinned too
    target = jnp.zeros((cam.height, cam.width, 3))

    def loss(means, mode):
        s = dataclasses.replace(state, means=means)
        out = render(s, cam, mode=mode,
                     tile_args=dict(max_per_tile=2048, dup_factor=512))
        return jnp.mean((out["image"] - target) ** 2)

    g_o = np.asarray(jax.grad(lambda m: loss(m, "oracle"))(state.means))
    g_t = np.asarray(jax.grad(lambda m: loss(m, "tiled"))(state.means))
    np.testing.assert_allclose(g_t, g_o, atol=1e-5)
