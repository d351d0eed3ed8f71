"""Tiny-config tests for the 3-stream transformer (upstream-diffusers-style
fixtures, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from s2v_tpu.config import TransformerConfig
from s2v_tpu.models.transformer import (
    block_forward,
    init_transformer_params,
    transformer_forward,
)
from s2v_tpu.ops.rope import build_segmented_rope, prepare_video_and_ref_rope



# jit-heavy full-coverage module (see pyproject markers); the fast tier
# (pytest -m 'not slow') keeps kernels/ops/loaders/scheduler coverage
pytestmark = __import__('pytest').mark.slow

def _tiny_inputs(cfg, key, batch=2, frames=3):
    ks = jax.random.split(key, 4)
    h = w = cfg.sample_height // 2  # latent-ish small
    video = jax.random.normal(ks[0], (batch, frames, h, w, cfg.in_channels), jnp.float32)
    ref = jax.random.normal(ks[1], (batch, 1, h, w, cfg.in_channels), jnp.float32)
    text = jax.random.normal(ks[2], (batch, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32)
    t = jnp.array([500] * batch, jnp.int32)
    return video, ref, text, t


def _tiny_rope(cfg, frames, h, w):
    grid_h, grid_w = h // cfg.patch_size, w // cfg.patch_size
    from s2v_tpu.ops.rope import get_3d_rotary_pos_embed

    cos, sin = get_3d_rotary_pos_embed(
        cfg.attention_head_dim, ((0, 0), (grid_h, grid_w)), (grid_h, grid_w), frames + 1
    )
    tok = grid_h * grid_w
    return build_segmented_rope(
        cfg.max_text_seq_length,
        cos[:tok], sin[:tok],
        cos[tok : tok * (frames + 1)], sin[tok : tok * (frames + 1)],
    )


def test_forward_shapes():
    cfg = TransformerConfig.tiny()
    key = jax.random.PRNGKey(0)
    params = init_transformer_params(key, cfg)
    video, ref, text, t = _tiny_inputs(cfg, key)
    cos, sin = _tiny_rope(cfg, 3, video.shape[2], video.shape[3])
    out = transformer_forward(params, cfg, video, ref, text, t, cos, sin)
    assert out.shape == (2, 3, video.shape[2], video.shape[3], cfg.out_channels)
    assert jnp.isfinite(out).all()


def test_ref_stream_conditions_output():
    """The subject image must influence the video prediction (the whole point
    of the 3-stream design)."""
    cfg = TransformerConfig.tiny()
    key = jax.random.PRNGKey(1)
    params = init_transformer_params(key, cfg)
    video, ref, text, t = _tiny_inputs(cfg, key)
    cos, sin = _tiny_rope(cfg, 3, video.shape[2], video.shape[3])
    out1 = transformer_forward(params, cfg, video, ref, text, t, cos, sin)
    out2 = transformer_forward(params, cfg, video, ref + 1.0, text, t, cos, sin)
    assert not np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_scan_matches_python_loop():
    """lax.scan over stacked layers == sequential per-layer application."""
    cfg = TransformerConfig.tiny()
    key = jax.random.PRNGKey(2)
    params = init_transformer_params(key, cfg)
    video, ref, text, t = _tiny_inputs(cfg, key)
    cos, sin = _tiny_rope(cfg, 3, video.shape[2], video.shape[3])

    out_scan = transformer_forward(params, cfg, video, ref, text, t, cos, sin)

    # manual: unstack blocks and loop in python
    from s2v_tpu.ops.patchify import patchify_video, unpatchify_video
    from s2v_tpu.ops.timestep import get_timestep_embedding, timestep_embedding_mlp
    from s2v_tpu.ops.adaln import ada_layer_norm_out
    from s2v_tpu.ops.norms import layer_norm

    t_emb = get_timestep_embedding(t, cfg.inner_dim, True, 0.0)
    temb = timestep_embedding_mlp(params["time_embedding"], t_emb)
    pe = params["patch_embed"]
    text_s = text @ pe["text_proj"]["kernel"] + pe["text_proj"]["bias"]
    ref_s = patchify_video(ref, pe["proj"]["kernel"], pe["proj"]["bias"], cfg.patch_size)
    vid_s = patchify_video(video, pe["proj"]["kernel"], pe["proj"]["bias"], cfg.patch_size)
    for i in range(cfg.num_layers):
        layer = jax.tree.map(lambda x: x[i], params["blocks"])
        vid_s, text_s, ref_s = block_forward(layer, vid_s, text_s, ref_s, temb, cos, sin, cfg)
    joint = jnp.concatenate([text_s, vid_s], axis=1)
    joint = layer_norm(joint, params["norm_final"]["weight"], params["norm_final"]["bias"], cfg.norm_eps)
    vid_s = joint[:, text_s.shape[1] :]
    vid_s = ada_layer_norm_out(params["norm_out"], vid_s, temb, cfg.norm_eps)
    vid_s = vid_s @ params["proj_out"]["kernel"] + params["proj_out"]["bias"]
    out_loop = unpatchify_video(vid_s, 3, video.shape[2], video.shape[3], cfg.patch_size, cfg.out_channels)

    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop), atol=1e-5)


def test_jit_compiles_once_and_matches():
    cfg = TransformerConfig.tiny()
    key = jax.random.PRNGKey(3)
    params = init_transformer_params(key, cfg)
    video, ref, text, t = _tiny_inputs(cfg, key)
    cos, sin = _tiny_rope(cfg, 3, video.shape[2], video.shape[3])
    fwd = jax.jit(lambda p, v, r, te, ts: transformer_forward(p, cfg, v, r, te, ts, cos, sin))
    out_jit = fwd(params, video, ref, text, t)
    out_eager = transformer_forward(params, cfg, video, ref, text, t, cos, sin)
    np.testing.assert_allclose(np.asarray(out_jit), np.asarray(out_eager), atol=1e-5)
