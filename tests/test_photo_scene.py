"""Real-photograph multi-plane benchmark scene: exact geometry checks.

The scene generator is the zero-egress stand-in for Tanks&Temples video
(see utils/photo_scene docstring); these tests pin its contracts: dataset
layout readable by the blender reader, exact GT pose round-trip, depth maps
consistent with unprojection, and real parallax between frames."""

import numpy as np
import pytest

from ht3dgs.data import readers
from ht3dgs.utils import photo_scene


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("photo"))
    poses, K = photo_scene.write_dataset(d, n_frames=5, height=48,
                                         width=64)
    return d, poses, K


def test_reader_roundtrip(dataset):
    d, poses, K = dataset
    info = readers.read_blender(d)
    assert len(info.train_frames) == 5
    for i, f in enumerate(info.train_frames):
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = f.R
        w2c[:3, 3] = f.T
        np.testing.assert_allclose(w2c, poses[i], atol=1e-5)
    # frame 0 anchored at identity
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)


def test_images_have_real_texture_and_parallax(dataset):
    d, poses, K = dataset
    info = readers.read_blender(d)
    im0 = info.train_frames[0].load_image()
    im4 = info.train_frames[4].load_image()
    assert im0.shape == (48, 64, 3)
    # real photo: non-trivial texture variance
    assert im0.std() > 0.05
    # camera motion: frames differ
    assert np.abs(im0 - im4).mean() > 0.01


def test_depth_consistent_with_planes(dataset):
    d, poses, K = dataset
    dep = np.load(f"{d}/depth/r_000.npy")
    assert dep.shape == (48, 64)
    # frame 0 is the identity camera: fronto-parallel planes show up as
    # constant-depth regions at exactly the plane depths
    vals = np.unique(np.round(dep, 3))
    assert dep.min() >= 3.0 and dep.max() <= 8.01
    for z in (3.2, 5.0, 8.0):
        assert np.any(np.abs(vals - z) < 1e-3), z


def test_unprojection_matches_scene(dataset):
    """pcd init from the exact depth must land on the plane surfaces."""
    from ht3dgs.data.pointcloud import pcd_from_depth_image

    d, poses, K = dataset
    info = readers.read_blender(d)
    f = info.train_frames[0]
    img = f.load_image()
    dep = np.load(f"{d}/depth/r_000.npy")
    pcd = pcd_from_depth_image(img, dep, f.intrinsics, down_sample=False)
    z = pcd.points[:, 2]
    on_plane = np.min(np.abs(z[:, None]
                             - np.array([3.2, 5.0, 8.0])[None]), axis=1)
    assert np.quantile(on_plane, 0.95) < 1e-2
