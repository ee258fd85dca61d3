"""Pose-eval alignment + trajectory synthesis tests."""

import numpy as np

from ht3dgs.eval import pose_eval as pe
from ht3dgs.eval import traj as traj_lib


def random_traj(n=20, seed=0):
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(seed)
    out = np.tile(np.eye(4), (n, 1, 1))
    t = np.cumsum(rng.standard_normal((n, 3)) * 0.1, axis=0)
    out[:, :3, 3] = t
    out[:, :3, :3] = Rotation.random(n, random_state=rng).as_matrix()
    return out


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(1)
    from scipy.spatial.transform import Rotation

    data = rng.standard_normal((30, 3))
    R = Rotation.random(random_state=rng).as_matrix()
    s, t = 2.5, np.array([1.0, -2.0, 0.5])
    model = s * data @ R.T + t
    s2, R2, t2 = pe.align_umeyama(model, data)
    np.testing.assert_allclose(s2, s, rtol=1e-6)
    np.testing.assert_allclose(R2, R, atol=1e-8)
    np.testing.assert_allclose(t2, t, atol=1e-8)


def test_ate_zero_for_similarity_transformed_traj():
    """A trajectory differing from GT only by a sim(3) must align to ~0 ATE."""
    gt_c2w = random_traj()
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(2)
    S = np.eye(4)
    S[:3, :3] = 1.7 * Rotation.random(random_state=rng).as_matrix()
    S[:3, 3] = [0.3, -0.1, 2.0]
    pred_c2w = np.einsum("ij,njk->nik", S, gt_c2w)
    # fix scale of rotation block for a valid SE(3)*scale decomposition:
    # only centers matter for ATE; normalize rotation part
    for T in pred_c2w:
        U, _, Vt = np.linalg.svd(T[:3, :3])
        T[:3, :3] = U @ Vt

    res = pe.evaluate_poses(np.linalg.inv(gt_c2w), np.linalg.inv(pred_c2w))
    assert res["ATE"] < 1e-3
    assert res["RPE_trans_x100"] < 0.5


def test_rpe_identity():
    gt = random_traj()
    rpe_t, rpe_r = pe.compute_rpe(gt, gt)
    assert rpe_t < 1e-12 and rpe_r < 1e-6


def test_bspline_traj_smooth_and_endpoints():
    c2ws = random_traj(10, seed=3)
    out = traj_lib.interp_poses_bspline(c2ws, n_novel=50)
    assert out.shape == (50, 4, 4)
    # rotations stay orthonormal
    RtR = np.einsum("nij,nik->njk", out[:, :3, :3], out[:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (50, 1, 1)), atol=1e-5)
    # endpoints near the original end cameras
    assert np.linalg.norm(out[0, :3, 3] - c2ws[0, :3, 3]) < 0.5
    assert np.linalg.norm(out[-1, :3, 3] - c2ws[-1, :3, 3]) < 0.5


def test_config_yaml_roundtrip(tmp_path):
    from ht3dgs.utils.config import load_configs

    y = tmp_path / "c.yml"
    y.write_text("""
OptimizationParams:
    single_step: 123
    mss_phase1_ratio: 0.25
ModelParams:
    FovX: 1.354
    seq_name: Francis
PipelineParams:
    train_level: 3
    multi_source_supervision: base+vfi
""")
    m, p, o = load_configs(str(y))
    assert o.single_step == 123
    assert o.mss_phase1_ratio == 0.25
    assert m.FovX == 1.354
    assert p.train_level == 3
