"""Semantic-view asset loading (reference semantic_views/ — SURVEY L0)."""

import os

import numpy as np
import pytest

from dasa_tpu.data.semantic import (
    SemanticPalette,
    list_semantic_viewpoints,
    load_label2color,
    load_semantic_views,
    semantic_view_paths,
)

ROOT = "/root/reference/semantic_views"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ROOT), reason="semantic_views not mounted")


def test_palette_roundtrip():
    l2c = load_label2color(os.path.join(ROOT, "label2color.json"))
    assert len(l2c) == 42
    assert l2c["wall"] == (0, 0, 255)
    pal = SemanticPalette(l2c)
    assert pal.labels[0] == "void"
    # encode a tiny image from palette colors and decode it back
    ids = np.array([[0, 1], [2, 41]], np.int32)
    rgb = pal.colors[ids].astype(np.uint8)
    np.testing.assert_array_equal(pal.decode(rgb), ids)
    # off-palette color -> unknown
    assert pal.decode(np.full((1, 1, 3), 7, np.uint8))[0, 0] == -1


def test_committed_sample_views_load():
    scan = "17DRP5sb8fy"
    vps = list_semantic_viewpoints(ROOT, scan)
    assert vps, "sample viewpoint missing"
    vp = vps[0]
    paths = semantic_view_paths(ROOT, scan, vp)
    assert len(paths) == 36 and all(os.path.exists(p) for p in paths)
    rgb_paths = semantic_view_paths(ROOT, scan, vp, rgb=True)
    assert all(os.path.exists(p) for p in rgb_paths)

    pal = SemanticPalette(
        load_label2color(os.path.join(ROOT, "label2color.json")))
    # two views: raw colors and decoded labels
    raw = load_semantic_views(ROOT, scan, vp, views=[0, 12])
    assert raw.shape[0] == 2 and raw.shape[-1] == 3
    ids = load_semantic_views(ROOT, scan, vp, palette=pal,
                              views=[0, 12])
    assert ids.shape == raw.shape[:-1]
    known = ids >= 0
    # the renders are palette-colored (edges may antialias off-palette)
    assert known.mean() > 0.95
    assert set(np.unique(ids[known])) <= set(range(len(pal)))
