"""3D sincos positional embedding parity vs independent torch/numpy
reference math (embeddings.py:81-179)."""

import numpy as np

from s2v_tpu.ops.sincos import (
    get_1d_sincos_pos_embed_from_grid,
    get_3d_sincos_pos_embed,
    joint_text_video_pos_embedding,
)


def ref_1d(embed_dim, pos):
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def ref_3d(embed_dim, spatial_size, temporal_size, s_scale, t_scale):
    dim_spatial = 3 * embed_dim // 4
    dim_temporal = embed_dim // 4
    grid_h = np.arange(spatial_size[1], dtype=np.float32) / s_scale
    grid_w = np.arange(spatial_size[0], dtype=np.float32) / s_scale
    grid = np.meshgrid(grid_w, grid_h)
    grid = np.stack(grid, axis=0).reshape([2, 1, spatial_size[1], spatial_size[0]])
    emb_h = ref_1d(dim_spatial // 2, grid[0])
    emb_w = ref_1d(dim_spatial // 2, grid[1])
    pos_spatial = np.concatenate([emb_h, emb_w], axis=1)
    grid_t = np.arange(temporal_size, dtype=np.float32) / t_scale
    pos_temporal = ref_1d(dim_temporal, grid_t)
    pos_spatial = np.repeat(pos_spatial[np.newaxis], temporal_size, axis=0)
    pos_temporal = np.repeat(pos_temporal[:, np.newaxis], spatial_size[0] * spatial_size[1], axis=1)
    return np.concatenate([pos_temporal, pos_spatial], axis=-1)


def test_3d_sincos_matches_reference():
    ours = get_3d_sincos_pos_embed(16, (6, 4), 3, 1.875, 1.0)
    theirs = ref_3d(16, (6, 4), 3, 1.875, 1.0)
    np.testing.assert_allclose(ours, theirs, atol=1e-7)
    assert ours.shape == (3, 24, 16)


def test_joint_table_layout():
    table = joint_text_video_pos_embedding(
        embed_dim=16, sample_height=8, sample_width=8, sample_frames=9,
        patch_size=2, temporal_compression_ratio=4, text_seq_length=5,
    )
    # text span zero, video span = sincos
    assert table.shape == (5 + 3 * 16, 16)
    np.testing.assert_array_equal(table[:5], 0.0)
    assert np.abs(table[5:]).sum() > 0
