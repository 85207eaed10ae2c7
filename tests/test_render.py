"""Cubemap renderer tests on synthetic skyboxes."""

import math

import numpy as np
import pytest

from dasa_tpu.sim.render import (
    FACE_BACK,
    FACE_DOWN,
    FACE_FRONT,
    FACE_LEFT,
    FACE_RIGHT,
    FACE_UP,
    camera_rays,
    render_panorama,
    render_view,
)


def solid_faces(size=16):
    """Face i is the constant value i+1."""
    return [np.full((size, size, 1), float(i + 1)) for i in range(6)]


def test_camera_rays_axes():
    rays = camera_rays(9, 9, heading=0.0, elevation=0.0,
                       vfov=math.radians(60))
    center = rays[4, 4]
    np.testing.assert_allclose(center, [0, 1, 0], atol=1e-9)  # +y forward
    rays_r = camera_rays(9, 9, heading=math.pi / 2, elevation=0.0,
                         vfov=math.radians(60))
    np.testing.assert_allclose(rays_r[4, 4], [1, 0, 0], atol=1e-9)  # +x
    rays_u = camera_rays(9, 9, heading=0.0, elevation=math.pi / 2,
                         vfov=math.radians(60))
    np.testing.assert_allclose(rays_u[4, 4], [0, 0, 1], atol=1e-7)  # up


@pytest.mark.parametrize("heading,elevation,face", [
    (0.0, 0.0, FACE_FRONT),
    (math.pi / 2, 0.0, FACE_RIGHT),
    (math.pi, 0.0, FACE_BACK),
    (3 * math.pi / 2, 0.0, FACE_LEFT),
    (0.0, math.pi / 2 - 1e-3, FACE_UP),
    (0.0, -math.pi / 2 + 1e-3, FACE_DOWN),
])
def test_view_center_hits_expected_face(heading, elevation, face):
    img = render_view(solid_faces(), heading, elevation, width=21,
                      height=21, vfov=math.radians(40))
    assert img[10, 10, 0] == pytest.approx(face + 1)


def test_view_continuity_across_face_edge():
    """A smooth cubemap (value = ray x-coordinate) must render smoothly
    across face boundaries."""
    size = 64
    faces = []
    from dasa_tpu.sim.render import _face_uv

    # build faces by inverse-sampling a smooth function of direction
    for f in range(6):
        us, vs = np.meshgrid(
            np.linspace(-1 + 1e-6, 1 - 1e-6, size),
            np.linspace(-1 + 1e-6, 1 - 1e-6, size))
        # reconstruct direction for each face pixel
        if f == 1:    # front +y
            d = np.stack([us, np.ones_like(us), -vs], -1)
        elif f == 3:  # back -y
            d = np.stack([-us, -np.ones_like(us), -vs], -1)
        elif f == 2:  # right +x
            d = np.stack([np.ones_like(us), -us, -vs], -1)
        elif f == 4:  # left -x
            d = np.stack([-np.ones_like(us), us, -vs], -1)
        elif f == 0:  # up +z
            d = np.stack([us, vs, np.ones_like(us)], -1)
        else:         # down -z
            d = np.stack([us, -vs, -np.ones_like(us)], -1)
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        faces.append(d[..., 0:1])  # value = x component of direction
    # wide view spanning front->right boundary
    img = render_view(faces, heading=math.radians(45), elevation=0.0,
                      width=120, height=40, vfov=math.radians(40))
    row = img[20, :, 0]
    # compare against ground truth x-component of the rays
    rays = camera_rays(120, 40, math.radians(45), 0.0,
                       math.radians(40))
    np.testing.assert_allclose(row, rays[20, :, 0], atol=0.02)
    # no discontinuities
    assert np.abs(np.diff(row)).max() < 0.05


def test_render_panorama_shape():
    pano = render_panorama(solid_faces(8), width=12, height=10,
                           vfov=math.radians(60))
    assert pano.shape == (36, 10, 12, 1)
    # horizon row (views 12..23) never shows up/down faces at center
    for v in range(12, 24):
        assert pano[v, 5, 6, 0] not in (FACE_UP + 1, FACE_DOWN + 1)


# ---------------------------------------------------------------------
# golden-render regression harness (src/test/main.cpp:302-338)
# ---------------------------------------------------------------------
SPEC = "/root/reference/src/test/rendertest_spec.json"


@pytest.mark.skipif(not __import__("os").path.exists(SPEC),
                    reason="reference spec not mounted")
def test_reference_render_spec_parses(connectivity_dir):
    """The committed rendertest_spec.json loads with typed fields, the
    poses reference real viewpoints in the real scan graphs, and each
    golden filename embeds its own pose."""
    from dasa_tpu.sim.graph import load_scan_graph
    from dasa_tpu.sim.render import load_render_spec

    spec = load_render_spec(SPEC)
    assert len(spec) == 20
    for case in spec:
        g = load_scan_graph(case["scan"], connectivity_dir)
        assert case["viewpoint"] in g.id2ix
        assert case["reference_image"].startswith(
            f"{case['scan']}_{case['viewpoint']}_")
        assert -math.pi / 2 < case["elevation"] < math.pi / 2


def test_render_regression_roundtrip(tmp_path):
    """The regression harness end-to-end on synthetic cubemaps: our own
    renders written as goldens must score error ~0 (pass), and a
    corrupted golden must fail the 0.15 per-pixel-normalized L2 gate —
    so the harness is ready the moment real webgl_imgs/ goldens mount."""
    from PIL import Image

    from dasa_tpu.sim.render import render_regression, render_view

    rng = np.random.default_rng(0)
    worlds = {}

    def faces_for(scan, vp):
        key = (scan, vp)
        if key not in worlds:
            worlds[key] = [
                rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
                .astype(np.float64) for _ in range(6)]
        return worlds[key]

    spec = [{"scan": "synthA", "viewpoint": f"vp{i}",
             "heading": 0.7 * i, "elevation": 0.1 * (i - 1),
             "reference_image": f"case{i}.png"} for i in range(3)]
    golden = tmp_path / "goldens"
    golden.mkdir()
    for case in spec:
        img = render_view(faces_for(case["scan"], case["viewpoint"]),
                          case["heading"], case["elevation"], 64, 48)
        Image.fromarray(np.clip(np.round(img), 0, 255).astype(
            np.uint8)).save(golden / case["reference_image"])

    out = tmp_path / "sim_imgs"
    results = render_regression(spec, faces_for, str(golden),
                                out_dir=str(out), width=64, height=48)
    assert all(r["passed"] for r in results), results
    assert all(r["error"] < 1e-9 for r in results)
    assert (out / "case0.png").exists()

    # corrupt one golden: uniform +32 offset -> err = sqrt(sum(32^2))
    # / (H*W) = 32*sqrt(3*H*W)/(H*W) ~ 1.0 >> 0.15
    bad = np.asarray(Image.open(golden / "case1.png")).astype(np.int64)
    Image.fromarray(np.clip(bad + 32, 0, 255).astype(np.uint8)).save(
        golden / "case1.png")
    results = render_regression(spec, faces_for, str(golden),
                                width=64, height=48)
    assert not results[1]["passed"]
    assert results[0]["passed"] and results[2]["passed"]
