"""On-device observation featurization.

Feature tables stay resident in HBM; per step the host ships only int32
row ids and small candidate geometry, and these pure functions gather and
assemble the (B, 36, F) panorama and (B, K, F) candidate tensors the
models consume.  This replaces the reference's per-step host-side numpy
concatenation + PCIe upload of full feature blocks
(r2r_src/agent_dg.py:286-323, env.py:317-410).
"""

from __future__ import annotations

import jax.numpy as jnp


def angle_feature(heading, elevation, angle_feat_size: int):
    """[sin h, cos h, sin e, cos e] tiled — jnp version of
    utils.angle_feature (reference: r2r_src/utils.py:361-368)."""
    quad = jnp.stack(
        [jnp.sin(heading), jnp.cos(heading),
         jnp.sin(elevation), jnp.cos(elevation)], axis=-1)
    return jnp.tile(quad, (1,) * (quad.ndim - 1) + (angle_feat_size // 4,))


def assemble_pano(feat_table, angle_table, feat_row, view_index):
    """(B,) rows + (B,) base views -> (B, 36, D + A) panorama features.
    angle_table is the (36, 36, A) all-point table."""
    vis = feat_table[feat_row]                   # (B, 36, D)
    ang = angle_table[view_index]                # (B, 36, A)
    return jnp.concatenate([vis, ang.astype(vis.dtype)], axis=-1)


def assemble_candidates(feat_table, feat_row, cand_point_id, cand_heading,
                        cand_elevation, cand_n, angle_feat_size: int):
    """Candidate features: the current panorama's view at each candidate's
    pointId + fresh angle features from its relative heading / absolute
    elevation (reference: env.py:263-315).  Slots >= cand_n (STOP and
    padding) are zero, matching the reference's zero END feature
    (agent_dg.py:301-313)."""
    pano = feat_table[feat_row]                                   # (B,36,D)
    vis = jnp.take_along_axis(
        pano, cand_point_id[..., None].astype(jnp.int32), axis=1)  # (B,K,D)
    ang = angle_feature(cand_heading, cand_elevation,
                        angle_feat_size).astype(vis.dtype)          # (B,K,A)
    feat = jnp.concatenate([vis, ang], axis=-1)
    k = cand_point_id.shape[1]
    real = (jnp.arange(k)[None, :] < cand_n[:, None])
    return feat * real[..., None]


def action_angle_feat(heading, elevation, angle_feat_size: int):
    """input_a_t: (B,) heading/elevation -> (B, A)
    (agent_dg.py:315-319)."""
    return angle_feature(heading, elevation, angle_feat_size)
