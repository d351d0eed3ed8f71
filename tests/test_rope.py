"""RoPE parity vs an independent torch implementation of the reference math
(embeddings.py:505-570, 673-785 — interleaved repeat_interleave(2) tables +
rotate-half application)."""

import numpy as np
import jax.numpy as jnp
import torch

from s2v_tpu.ops.rope import (
    apply_rotary_emb,
    build_segmented_rope,
    get_3d_rotary_pos_embed,
    get_resize_crop_region_for_grid,
    prepare_video_and_ref_rope,
)


def torch_1d_rope(dim, pos, theta=10000.0):
    pos = torch.from_numpy(np.asarray(pos, np.float32))
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 2, dtype=torch.float32)[: dim // 2] / dim))
    freqs = torch.outer(pos, freqs)
    cos = freqs.cos().repeat_interleave(2, dim=1)
    sin = freqs.sin().repeat_interleave(2, dim=1)
    return cos, sin


def torch_3d_rope(embed_dim, crops_coords, grid_size, temporal_size):
    start, stop = crops_coords
    gh, gw = grid_size
    grid_h = np.linspace(start[0], stop[0], gh, endpoint=False, dtype=np.float32)
    grid_w = np.linspace(start[1], stop[1], gw, endpoint=False, dtype=np.float32)
    grid_t = np.linspace(0, temporal_size, temporal_size, endpoint=False, dtype=np.float32)
    dim_t, dim_h, dim_w = embed_dim // 4, embed_dim // 8 * 3, embed_dim // 8 * 3
    ct, st = torch_1d_rope(dim_t, grid_t)
    ch, sh = torch_1d_rope(dim_h, grid_h)
    cw, sw = torch_1d_rope(dim_w, grid_w)

    def combine(ft, fh, fw):
        t = ft[:, None, None, :].expand(-1, gh, gw, -1)
        h = fh[None, :, None, :].expand(temporal_size, -1, gw, -1)
        w = fw[None, None, :, :].expand(temporal_size, gh, -1, -1)
        return torch.cat([t, h, w], dim=-1).reshape(temporal_size * gh * gw, -1)

    return combine(ct, ch, cw), combine(st, sh, sw)


def torch_apply_rope(x, cos, sin):
    # reference apply_rotary_emb (embeddings.py:739-785), x: [B, H, S, D]
    cos, sin = cos[None, None], sin[None, None]
    x_real, x_imag = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
    x_rot = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
    return (x.float() * cos + x_rot.float() * sin).to(x.dtype)


def pair_to_interleaved(cos_half):
    """[S, D/2] pair layout -> [S, D] interleaved layout."""
    return np.repeat(cos_half, 2, axis=-1)


def test_3d_table_matches_reference():
    cos, sin = get_3d_rotary_pos_embed(64, ((0, 0), (30, 45)), (30, 45), 14)
    tcos, tsin = torch_3d_rope(64, ((0, 0), (30, 45)), (30, 45), 14)
    np.testing.assert_allclose(pair_to_interleaved(cos), tcos.numpy(), atol=1e-5)
    np.testing.assert_allclose(pair_to_interleaved(sin), tsin.numpy(), atol=1e-5)


def test_crop_region():
    # 480x720 default: grid == base -> full-cover crop
    assert get_resize_crop_region_for_grid((30, 45), 45, 30) == ((0, 0), (30, 45))
    # non-default aspect: taller than base
    top_left, bottom_right = get_resize_crop_region_for_grid((60, 45), 45, 30)
    assert top_left[0] == 0 or top_left[1] == 0


def test_apply_matches_reference():
    rng = np.random.RandomState(0)
    B, H, S, D = 2, 4, 10, 16
    x = rng.randn(B, H, S, D).astype(np.float32)
    cos, sin = get_3d_rotary_pos_embed(D, ((0, 0), (5, 2)), (5, 2), 1)
    # ours: [B, S, H, D] layout with [S, 1, D/2] tables
    out = apply_rotary_emb(
        jnp.asarray(x.transpose(0, 2, 1, 3)), jnp.asarray(cos)[:, None, :], jnp.asarray(sin)[:, None, :]
    )
    out = np.asarray(out).transpose(0, 2, 1, 3)
    t_out = torch_apply_rope(
        torch.from_numpy(x),
        torch.from_numpy(pair_to_interleaved(cos)),
        torch.from_numpy(pair_to_interleaved(sin)),
    )
    np.testing.assert_allclose(out, t_out.numpy(), atol=1e-5)


def test_segmented_table_spans():
    vid_cos, vid_sin, ref_cos, ref_sin = prepare_video_and_ref_rope(480, 720, 13, 64)
    assert ref_cos.shape == (1350, 32)
    assert vid_cos.shape == (13 * 1350, 32)
    cos, sin = build_segmented_rope(226, ref_cos, ref_sin, vid_cos, vid_sin)
    assert cos.shape == (226 + 1350 + 17550, 32)
    # text span must be the identity rotation
    np.testing.assert_array_equal(np.asarray(cos[:226]), 1.0)
    np.testing.assert_array_equal(np.asarray(sin[:226]), 0.0)
    # ref span is frame 0 == first 1350 rows of the 14-frame table
    full_cos, _ = get_3d_rotary_pos_embed(64, ((0, 0), (30, 45)), (30, 45), 14)
    np.testing.assert_allclose(np.asarray(cos[226 : 226 + 1350]), full_cos[:1350], atol=1e-6)
    # video span starts at frame 1
    np.testing.assert_allclose(np.asarray(cos[226 + 1350 :]), full_cos[1350 : 14 * 1350], atol=1e-6)
    # identity application on text tokens
    x = jnp.ones((1, 226 + 1350 + 17550, 1, 64), jnp.float32)
    y = apply_rotary_emb(x, cos[:, None, :], sin[:, None, :])
    np.testing.assert_allclose(np.asarray(y[0, :226]), np.ones((226, 1, 64)), atol=1e-6)
