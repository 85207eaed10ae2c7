"""Offline pipeline tests: depth geometry, warping, ResNet featurizer."""

import numpy as np
import pytest

from dasa_tpu.pipelines.depth_features import (
    ViewFeaturizer,
    featurize_views,
    normalize_depth,
)
from dasa_tpu.pipelines.enable_depth import (
    CUBE_FACE_ROTATIONS,
    depth_to_skybox_faces,
    fill_holes,
    intrinsic_matrix,
    warp_homography,
    z_to_euclid,
)


def test_z_to_euclid_center_ray_unchanged():
    k = intrinsic_matrix(64, 64)
    depth = np.full((64, 64), 10.0)
    out = z_to_euclid(np.linalg.inv(k), depth)
    # optical axis pixel keeps its distance; off-axis rays get longer
    assert out[32, 32] == pytest.approx(10.0, rel=1e-6)
    assert out[0, 0] > 10.0
    # corner ray at 90-deg-fov face: direction (-1,-1,1)/sqrt(3)
    assert out[0, 0] == pytest.approx(10.0 * np.sqrt(3.0), rel=1e-2)


def test_warp_identity():
    img = np.arange(36.0).reshape(6, 6)
    out, valid = warp_homography(img, np.eye(3), (6, 6))
    np.testing.assert_allclose(out, img)
    assert valid.all()


def test_warp_translation():
    img = np.arange(36.0).reshape(6, 6)
    h = np.eye(3)
    h[0, 2] = 2.0  # shift +x by 2
    out, valid = warp_homography(img, h, (6, 6))
    np.testing.assert_allclose(out[:, 2:], img[:, :4])
    assert not valid[:, :2].any()


def test_cube_rotations_orthonormal():
    for r in CUBE_FACE_ROTATIONS:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(r) == pytest.approx(1.0)


def test_fill_holes():
    d = np.ones((8, 8))
    d[3:5, 3:5] = 0
    out = fill_holes(d)
    assert (out > 0).all()
    np.testing.assert_allclose(out, 1.0)


def test_depth_to_skybox_front_face_identity():
    """A single camera aligned with the skybox base must reproject its
    own depth onto the front face (constant image -> constant face)."""
    size = 32
    k = intrinsic_matrix(size, size)
    depth = np.full((size, size), 5.0)
    faces = depth_to_skybox_faces(
        {"cam": depth}, {"cam": k},
        {"cam": np.eye(4)}, np.eye(3), face_size=size, out_size=size,
        do_fill=True)
    assert len(faces) == 6
    front = faces[0]
    np.testing.assert_allclose(front, 5.0, rtol=1e-6)


def test_normalize_and_featurizer_shapes():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 4000, (16, 20)).astype(np.float32)
    n = normalize_depth(img)
    assert n.min() == pytest.approx(0.0, abs=1e-6)
    assert n.max() == pytest.approx(1.0, abs=1e-3)

    feat = ViewFeaturizer(batch_size=2, image_size=(32, 32))
    out = feat(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    assert out.shape == (3, 2048)
    assert np.isfinite(out).all()


def test_featurize_views_npy_pair(tmp_path):
    rng = np.random.default_rng(1)
    feat = ViewFeaturizer(batch_size=4, image_size=(32, 32))

    def load_views(scan, vp):
        return rng.uniform(0, 1, (4, 32, 32)).astype(np.float32)

    prefix = str(tmp_path / "depthfeat")
    values = featurize_views([("s1", "v1"), ("s1", "v2")], load_views,
                             prefix, featurizer=feat, views=4)
    assert values.shape == (2, 4, 2048)
    ids = np.load(prefix + "-index.npy")
    assert list(ids) == ["s1_v1", "s1_v2"]
    vals = np.load(prefix + ".npy")
    np.testing.assert_allclose(vals, values)
