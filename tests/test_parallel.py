"""Sharded train step on the virtual 8-device CPU mesh (2 segments x 4
tile-shards): must run, reduce loss, and match a single-device step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ht3dgs.core import adam as adam_lib
from ht3dgs.core import gaussians as G
from ht3dgs.core.camera import intrinsics_from_fov, make_camera
from jax.sharding import PartitionSpec as P

from ht3dgs.parallel import mesh as mesh_lib
from ht3dgs.raster import render
from ht3dgs.train.losses import l1_loss

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def make_segment(seed, n=64, cap=128):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32) * 0.4
    pts[:, 2] += 3.0
    state = G.create_from_pcd(pts, rng.random((n, 3)).astype(np.float32),
                              capacity=cap)
    # Anisotropic scales + off-identity quats: create_from_pcd's isotropic
    # init makes the rotation unidentifiable (quat grad == 0 up to fp
    # noise), and with Adam eps=1e-15 the first step is ±lr·sign(noise) —
    # the exact-match assertions below would then compare amplified
    # summation-order noise between the sharded and single-device paths.
    q = np.tile([0.1, -0.05, 0.08, 1.0], (cap, 1)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return dataclasses.replace(
        state,
        log_scales=state.log_scales + jnp.asarray(
            rng.normal(0.0, 0.4, (cap, 3)).astype(np.float32)),
        quats=jnp.asarray(q))


def test_sharded_step_runs_and_learns():
    H, W = 32, 48
    mesh = mesh_lib.make_mesh(2, 4)
    K = intrinsics_from_fov(1.2, H, W)
    cam = make_camera(H, W, K)

    states = [make_segment(i) for i in range(2)]
    targets = [np.asarray(render(s, cam, mode="oracle")["image"])
               for s in states]
    # perturb
    perturbed = [dataclasses.replace(
        s, means=s.means + 0.05 * jax.random.normal(
            jax.random.PRNGKey(7 + i), s.means.shape)) for i, s in
        enumerate(states)]
    opts = [adam_lib.init(s.params()) for s in perturbed]

    states_b = mesh_lib.batch_segments(perturbed)
    opts_b = mesh_lib.batch_segments(opts)
    cams_b = mesh_lib.batch_segments([cam, cam])
    gts = jnp.stack([jnp.asarray(t) for t in targets])
    lr = {k: jnp.full((2,), v, jnp.float32) for k, v in {
        "means": 2e-3, "quats": 1e-3, "log_scales": 5e-3, "sh_dc": 2.5e-2,
        "sh_rest": 1e-3, "opacity_logit": 5e-2}.items()}

    step = mesh_lib.build_sharded_train_step(
        mesh, H, W, mode="tiled",
        tile_args=dict(tile_h=8, tile_w=16, max_per_tile=128))

    losses = []
    for i in range(25):
        states_b, opts_b, loss = step(states_b, opts_b, cams_b, gts, lr)
        losses.append(np.asarray(loss))
    losses = np.stack(losses)  # [25, 2]
    assert np.all(np.isfinite(losses))
    # both segments improve
    assert losses[-1, 0] < losses[0, 0] * 0.7
    assert losses[-1, 1] < losses[0, 1] * 0.7


def test_hierarchy_step_matches_gaussian_train_step():
    """The full-featured sharded step (1 segment x 4 tile shards, SSIM on)
    must reproduce train.step.gaussian_train_step exactly — the halo'd
    sharded SSIM makes boundary gradients exact, so tolerance is tight."""
    from ht3dgs.train import step as step_lib

    H, W = 32, 32
    mesh = mesh_lib.make_mesh(1, 4)
    cam = make_camera(H, W, intrinsics_from_fov(1.2, H, W))
    state = make_segment(0)
    opt = adam_lib.init(state.params())
    gt = jnp.asarray(np.asarray(
        render(make_segment(99), cam, mode="oracle")["image"]))
    lrs = {k: jnp.asarray(1e-2) for k in state.params()}
    targs = dict(tile_h=8, tile_w=16, max_per_tile=128)

    s_ref, o_ref, m_ref = step_lib.gaussian_train_step(
        state, opt, cam, gt, lrs, mode="tiled", apply_adam="all",
        track_stats=True, lambda_dssim=0.2,
        tile_args=tuple(sorted(targs.items())))

    hstep = mesh_lib.build_hierarchy_step(
        mesh, H, W, mode="tiled", tile_args=targs, lambda_dssim=0.2)
    sb, ob, mb = hstep(
        mesh_lib.batch_segments([state]), mesh_lib.batch_segments([opt]),
        mesh_lib.batch_segments([cam]), gt[None],
        {k: jnp.full((1,), 1e-2) for k in state.params()})

    for k in s_ref.params():
        np.testing.assert_allclose(
            np.asarray(sb.params()[k][0]), np.asarray(s_ref.params()[k]),
            atol=1e-6, err_msg=k)
    # densification stats must match too (probe grads psum'ed over tiles)
    np.testing.assert_allclose(np.asarray(sb.grad_accum[0]),
                               np.asarray(s_ref.grad_accum), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sb.max_radii2d[0]),
                               np.asarray(s_ref.max_radii2d), atol=1e-6)
    np.testing.assert_allclose(float(mb["psnr"][0]), float(m_ref["psnr"]),
                               atol=1e-3)


def test_hierarchy_step_apply_modes_and_active():
    """APPLY_SKIP keeps params+opt; active=False freezes a segment."""
    H, W = 32, 32
    mesh = mesh_lib.make_mesh(2, 4)
    cam = make_camera(H, W, intrinsics_from_fov(1.2, H, W))
    states = mesh_lib.batch_segments([make_segment(0), make_segment(1)])
    opts = mesh_lib.batch_segments(
        [adam_lib.init(make_segment(i).params()) for i in range(2)])
    cams = mesh_lib.batch_segments([cam, cam])
    gts = jnp.zeros((2, H, W, 3), jnp.float32)
    lrs = {k: jnp.full((2,), 1e-2) for k in states.params()}
    hstep = mesh_lib.build_hierarchy_step(
        mesh, H, W, mode="tiled",
        tile_args=dict(tile_h=8, tile_w=16, max_per_tile=128))

    sb, ob, _ = hstep(states, opts, cams, gts, lrs,
                      apply_code=mesh_lib.APPLY_SKIP, track_stats=True)
    for k in states.params():
        np.testing.assert_array_equal(np.asarray(sb.params()[k]),
                                      np.asarray(states.params()[k]))
    assert np.all(np.asarray(ob.step) == 0)
    # stats were still tracked
    assert np.any(np.asarray(sb.grad_denom) > 0)

    sb2, ob2, _ = hstep(states, opts, cams, gts, lrs,
                        apply_code=mesh_lib.APPLY_ALL, track_stats=False,
                        active=jnp.asarray([True, False]))
    assert not np.allclose(np.asarray(sb2.means[0]),
                           np.asarray(states.means[0]))
    np.testing.assert_array_equal(np.asarray(sb2.means[1]),
                                  np.asarray(states.means[1]))
    assert int(ob2.step[0]) == 1 and int(ob2.step[1]) == 0


def test_hierarchy_step_split_drop_counters():
    """The sharded step must expose the split overflow diagnostics so the
    parallel-leaf auto-grow can widen only the exhausted capacity."""
    H, W = 32, 32
    mesh = mesh_lib.make_mesh(1, 4)
    cam = make_camera(H, W, intrinsics_from_fov(1.2, H, W))
    state = make_segment(0, n=128, cap=128)
    state = dataclasses.replace(
        state, means=state.means * jnp.asarray([0.1, 0.1, 1.0]))
    opt = adam_lib.init(state.params())
    gts = jnp.zeros((1, H, W, 3), jnp.float32)
    lrs = {k: jnp.full((1,), 1e-2) for k in state.params()}

    hstep = mesh_lib.build_hierarchy_step(
        mesh, H, W, mode="tiled",
        tile_args=dict(tile_h=8, tile_w=16, max_per_tile=4, dup_factor=16))
    _, _, m = hstep(mesh_lib.batch_segments([state]),
                    mesh_lib.batch_segments([opt]),
                    mesh_lib.batch_segments([cam]), gts, lrs)
    assert int(np.max(np.asarray(m["n_dropped_tile"]))) > 0
    assert int(np.max(np.asarray(m["n_dropped_m"]))) == 0

    hstep2 = mesh_lib.build_hierarchy_step(
        mesh, H, W, mode="tiled",
        tile_args=dict(tile_h=8, tile_w=16, max_per_tile=512, dup_factor=1))
    _, _, m2 = hstep2(mesh_lib.batch_segments([state]),
                      mesh_lib.batch_segments([opt]),
                      mesh_lib.batch_segments([cam]), gts, lrs)
    assert int(np.max(np.asarray(m2["n_dropped_m"]))) > 0
    assert int(np.max(np.asarray(m2["n_dropped_tile"]))) == 0


def test_ssim_sharded_exact():
    """ssim_sharded over 4 row shards == single-device ssim (value + grad)."""
    from jax import shard_map
    from ht3dgs.train.losses import ssim, ssim_sharded

    H, W = 32, 16
    mesh = mesh_lib.make_mesh(1, 4)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((H, W, 3), np.float32))
    b = jnp.asarray(rng.random((H, W, 3), np.float32))

    def sharded(a, b):
        fn = shard_map(
            lambda x, y: ssim_sharded(x, y, "tile"), mesh=mesh,
            in_specs=(P("tile"), P("tile")), out_specs=P(),
            check_vma=False)
        return fn(a, b)

    v_ref, g_ref = jax.value_and_grad(ssim)(a, b)
    v_sh, g_sh = jax.value_and_grad(sharded)(a, b)
    np.testing.assert_allclose(float(v_sh), float(v_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               atol=1e-6)


def test_depth_loss_sharded_exact():
    from jax import shard_map
    from ht3dgs.train.losses import (scale_shift_invariant_depth_loss,
                                     scale_shift_invariant_depth_loss_sharded)

    H, W = 32, 16
    mesh = mesh_lib.make_mesh(1, 4)
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.random((H, W), np.float32) * 3.0)
    gt = jnp.asarray(rng.random((H, W), np.float32) * 3.0)

    def sharded(p, g):
        fn = shard_map(
            lambda x, y: scale_shift_invariant_depth_loss_sharded(
                x, y, "tile"), mesh=mesh,
            in_specs=(P("tile"), P("tile")), out_specs=P(),
            check_vma=False)
        return fn(p, g)

    v_ref, g_ref = jax.value_and_grad(scale_shift_invariant_depth_loss)(
        pred, gt)
    v_sh, g_sh = jax.value_and_grad(sharded)(pred, gt)
    np.testing.assert_allclose(float(v_sh), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               atol=1e-5)


def test_sharded_matches_single_device_grads():
    """One sharded step == an equivalent unsharded step (L1-only so SSIM
    boundary effects don't enter)."""
    H, W = 32, 32
    mesh = mesh_lib.make_mesh(1, 4)
    cam = make_camera(H, W, intrinsics_from_fov(1.2, H, W))
    state = make_segment(0)
    opt = adam_lib.init(state.params())
    gt = jnp.asarray(np.asarray(
        render(make_segment(99), cam, mode="oracle")["image"]))
    lrs_scalar = {k: jnp.asarray(1e-2) for k in state.params()}

    # single device reference
    def loss_fn(params):
        s = state.replace_params(params)
        out = render(s, cam, mode="tiled",
                     tile_args=dict(tile_h=8, tile_w=16, max_per_tile=128))
        return l1_loss(out["image"], gt)

    _, g_ref = jax.value_and_grad(loss_fn)(state.params())
    p_ref, _ = adam_lib.apply(state.params(), g_ref, opt, lrs_scalar)

    step = mesh_lib.build_sharded_train_step(
        mesh, H, W, lambda_dssim=0.0, mode="tiled",
        tile_args=dict(tile_h=8, tile_w=16, max_per_tile=128))
    sb, ob, loss = step(
        mesh_lib.batch_segments([state]), mesh_lib.batch_segments([opt]),
        mesh_lib.batch_segments([cam]), gt[None],
        {k: jnp.full((1,), 1e-2) for k in state.params()})

    for k in p_ref:
        np.testing.assert_allclose(
            np.asarray(jax.tree.map(lambda x: x[0], sb.params()[k])),
            np.asarray(p_ref[k]), atol=1e-5, err_msg=k)


def test_gauss_sharded_step_matches_single_device():
    """Range-partitioned Gaussians (4 row shards) must reproduce the
    single-device gaussian_train_step: params, Adam moments and
    densification stats all match after one step."""
    from ht3dgs.parallel import gauss_shard as gs
    from ht3dgs.train import step as step_lib

    H, W = 32, 32
    mesh = mesh_lib.make_mesh(1, 4)
    cam = make_camera(H, W, intrinsics_from_fov(1.2, H, W))
    state = make_segment(0, n=96, cap=128)
    opt = adam_lib.init(state.params())
    gt = jnp.asarray(np.asarray(
        render(make_segment(99), cam, mode="oracle")["image"]))
    lrs = {k: jnp.asarray(1e-2) for k in state.params()}
    targs = dict(tile_h=8, tile_w=16, max_per_tile=256, dup_factor=32,
                 backend="xla")

    s_ref, o_ref, m_ref = step_lib.gaussian_train_step(
        state, opt, cam, gt, lrs, mode="tiled", apply_adam="all",
        track_stats=True, lambda_dssim=0.2,
        tile_args=tuple(sorted(targs.items())))

    # plain; with post-gather block cull-compaction; and the POD
    # configuration (no source cull, raw rows gathered, destination
    # block-compaction) — all must reproduce the single-device step
    # exactly (VERDICT r4 #1). compact_n=96 < gathered N=128 so the
    # compaction slice actually RUNS (>= the 96 live rows -> lossless)
    for cull, targs_s in ((32, targs), (32, dict(targs, compact_n=96)),
                          (None, dict(targs, compact_n=96))):
        step = gs.build_gauss_sharded_step(mesh, H, W, cull_cap=cull,
                                           tile_args=targs_s,
                                           lambda_dssim=0.2)
        sh, oh = gs.shard_state(state, 4), gs.shard_opt(opt, 4)
        sh, oh, m = step(sh, oh, cam, gt, lrs)
        su, ou = gs.unshard_state(sh), gs.unshard_opt(oh)

        assert int(m["n_culled_dropped"]) == 0
        np.testing.assert_allclose(float(m["psnr"]), float(m_ref["psnr"]),
                                   atol=1e-3)
        for k in s_ref.params():
            np.testing.assert_allclose(
                np.asarray(su.params()[k]), np.asarray(s_ref.params()[k]),
                atol=1e-5, err_msg=k)
            np.testing.assert_allclose(
                np.asarray(ou.m[k]), np.asarray(o_ref.m[k]), atol=1e-5,
                err_msg=k)
        np.testing.assert_allclose(np.asarray(su.grad_accum),
                                   np.asarray(s_ref.grad_accum), atol=1e-5)
        np.testing.assert_allclose(np.asarray(su.max_radii2d),
                                   np.asarray(s_ref.max_radii2d), atol=1e-4)


def test_gauss_sharded_densify_runs():
    from ht3dgs.parallel import gauss_shard as gs

    mesh = mesh_lib.make_mesh(1, 4)
    state = make_segment(0, n=96, cap=128)
    opt = adam_lib.init(state.params())
    # make some rows hot so clone/split trigger
    state = dataclasses.replace(
        state,
        grad_accum=jnp.full((128,), 1.0),
        grad_denom=jnp.ones((128,)))
    dens = gs.build_sharded_densify(mesh)
    sh, oh = gs.shard_state(state, 4), gs.shard_opt(opt, 4)
    sh, oh, dropped = dens(sh, oh, jax.random.PRNGKey(0),
                           0.0002, 0.005, 3.0, 0.01, 20.0, False)
    su = gs.unshard_state(sh)
    assert int(su.n_live()) >= int(state.n_live())
    assert np.all(np.isfinite(np.asarray(su.means)))


def test_pod_mesh_and_init_distributed():
    """Multi-host entry points: init_distributed is a safe no-op on a
    single process; make_pod_mesh lays segments over processes and tiles
    within a process's contiguous device block."""
    n = mesh_lib.init_distributed()
    assert n == len(jax.devices())
    m = mesh_lib.make_pod_mesh(4)
    assert m.axis_names == ("segment", "tile")
    assert m.shape["tile"] == 4 and m.shape["segment"] == n // 4
    # default: one segment per process (single process -> all-tile mesh)
    m2 = mesh_lib.make_pod_mesh()
    assert m2.shape["segment"] * m2.shape["tile"] == n
    # idempotent re-init
    assert mesh_lib.init_distributed() == n
