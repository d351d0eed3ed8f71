"""Production-shape golden parity (VERDICT r1 next-round #5a).

The tiny-dim golden tests can hide dtype/layout bugs that only appear at
real dimensions (3072 hidden, 48 heads x d=64, 1350 tokens/frame at the
true 30x45 patch grid).  This runs the independent torch 3-stream model
from test_loaders at a 1-layer production-dim config, through the real
state-dict converter, in fp32 on CPU, with a per-output drift budget.

Sequence: 226 text + 1350 ref + 2x1350 video = 4276 tokens (the full 13
video frames would need a ~50 GB fp32 logits tensor on the torch side;
two frames at real spatial geometry exercise every dimension-dependent
code path — head folding, RoPE axis split 16/24/24, patchify layout).
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from s2v_tpu.config import TransformerConfig
from s2v_tpu.loaders import convert_transformer_state_dict
from s2v_tpu.models.transformer import transformer_forward
from s2v_tpu.ops.rope import build_segmented_rope, get_3d_rotary_pos_embed

from test_loaders import TorchTinyTransformer, rope_interleaved

pytestmark = pytest.mark.slow


def test_one_block_production_dims_parity():
    cfg = TransformerConfig.cogvideox_5b(
        num_layers=1,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    assert cfg.inner_dim == 3072 and cfg.num_attention_heads == 48

    torch.manual_seed(0)
    model = TorchTinyTransformer(cfg).eval().float()
    params = convert_transformer_state_dict(model.hf_state_dict(), cfg)

    rng = np.random.RandomState(0)
    B, Fv, H, W = 1, 2, 60, 90  # latent 60x90 -> 30x45 = 1350 tokens/frame
    video = rng.randn(B, Fv, H, W, cfg.in_channels).astype(np.float32)
    ref = rng.randn(B, 1, H, W, cfg.in_channels).astype(np.float32)
    text = rng.randn(B, cfg.max_text_seq_length, cfg.text_embed_dim).astype(np.float32)
    t = np.array([999.0], np.float32)

    gh, gw = H // cfg.patch_size, W // cfg.patch_size
    cos, sin = get_3d_rotary_pos_embed(
        cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), Fv + 1
    )
    tok = gh * gw
    cos_seg, sin_seg = build_segmented_rope(
        cfg.max_text_seq_length, cos[:tok], sin[:tok],
        cos[tok : tok * (Fv + 1)], sin[tok : tok * (Fv + 1)],
    )
    # chunked attention keeps the jax-side logits at O(block * S) — the xla
    # backend would also pass but doubles peak memory
    ours = np.asarray(
        transformer_forward(
            params, cfg, jnp.asarray(video), jnp.asarray(ref), jnp.asarray(text),
            jnp.asarray(t), cos_seg, sin_seg, attention_backend="chunked",
        )
    )

    with torch.no_grad():
        half = cfg.attention_head_dim // 2
        full_cos = np.concatenate(
            [np.ones((cfg.max_text_seq_length, half), np.float32),
             cos[:tok], cos[tok : tok * (Fv + 1)]], axis=0)
        full_sin = np.concatenate(
            [np.zeros((cfg.max_text_seq_length, half), np.float32),
             sin[:tok], sin[tok : tok * (Fv + 1)]], axis=0)
        tcos, tsin = rope_interleaved(full_cos, full_sin)
        theirs = model(
            torch.from_numpy(video).permute(0, 1, 4, 2, 3),
            torch.from_numpy(ref).permute(0, 1, 4, 2, 3),
            torch.from_numpy(text),
            torch.from_numpy(t),
            tcos, tsin,
        ).permute(0, 1, 3, 4, 2).numpy()

    assert ours.shape == theirs.shape
    # drift budget at production dims: fp32 matmul reassociation over a
    # 3072-wide contraction + softmax over 4276 keys
    err = np.abs(ours - theirs)
    scale = np.abs(theirs).max()
    assert err.max() <= 2e-3 * max(scale, 1.0), (
        f"max abs err {err.max():.3e} (out scale {scale:.2f})"
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=2e-3)


@pytest.mark.heavy  # 27 min on a 1-CPU host (r5 durations profile)
def test_full_depth_42_block_parity_with_per_block_drift():
    """The FULL 42-block stacked forward at real hidden dims (3072 / 48xd64),
    fp32 on CPU, with a per-block drift budget (VERDICT r2 #3 proxy
    tightening: 1-block parity can hide drift that only compounds with
    depth — converter stacking order, scan carry handling, accumulated
    fp32 reassociation).

    Spatial grid reduced to 8x12 (96 tokens/frame; 514-token sequence) so
    the ~5.5e9-param fp32 model fits RAM and runs in minutes on CPU; every
    dimension-dependent code path (head folding, RoPE 16/24/24 axis split,
    3072-wide contractions) still runs at real width.  Both sides walk the
    blocks together and the per-depth video/text/ref stream drift is
    asserted against a depth-linear budget; the final output additionally
    goes through the REAL scan path (transformer_forward) to pin the
    lax.scan carry semantics against the per-block loop.
    """
    import jax

    from s2v_tpu.models.transformer import block_forward
    from s2v_tpu.ops.patchify import patchify_video
    from s2v_tpu.ops.timestep import (
        get_timestep_embedding,
        timestep_embedding_mlp,
    )

    L = 42
    cfg = TransformerConfig.cogvideox_5b(
        num_layers=L, dtype=jnp.float32, param_dtype=jnp.float32,
    )
    assert cfg.inner_dim == 3072 and cfg.num_attention_heads == 48

    torch.manual_seed(0)
    model = TorchTinyTransformer(cfg).eval().float()
    host = convert_transformer_state_dict(model.hf_state_dict(), cfg, device=False)

    rng = np.random.RandomState(0)
    B, Fv, H, W = 1, 2, 16, 24  # latent 16x24 -> 8x12 = 96 tokens/frame
    video = rng.randn(B, Fv, H, W, cfg.in_channels).astype(np.float32)
    ref = rng.randn(B, 1, H, W, cfg.in_channels).astype(np.float32)
    text = rng.randn(B, cfg.max_text_seq_length, cfg.text_embed_dim).astype(np.float32)
    t = np.array([999.0], np.float32)

    gh, gw = H // cfg.patch_size, W // cfg.patch_size
    cos, sin = get_3d_rotary_pos_embed(
        cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), Fv + 1
    )
    tok = gh * gw
    cos_seg, sin_seg = build_segmented_rope(
        cfg.max_text_seq_length, cos[:tok], sin[:tok],
        cos[tok : tok * (Fv + 1)], sin[tok : tok * (Fv + 1)],
    )

    # ---- torch side: walk the blocks, recording every depth's streams
    half = cfg.attention_head_dim // 2
    full_cos = np.concatenate(
        [np.ones((cfg.max_text_seq_length, half), np.float32),
         cos[:tok], cos[tok : tok * (Fv + 1)]], axis=0)
    full_sin = np.concatenate(
        [np.zeros((cfg.max_text_seq_length, half), np.float32),
         sin[:tok], sin[tok : tok * (Fv + 1)]], axis=0)
    tcos, tsin = rope_interleaved(full_cos, full_sin)
    with torch.no_grad():
        temb_t = model.time_embed(torch.from_numpy(t))
        text_t = model.text_proj(torch.from_numpy(text))
        vid_t = model.patchify(torch.from_numpy(video).permute(0, 1, 4, 2, 3))
        ref_t = model.patchify(torch.from_numpy(ref).permute(0, 1, 4, 2, 3))
        torch_streams = []
        for blk in model.blocks:
            vid_t, text_t, ref_t = blk(vid_t, text_t, ref_t, temb_t, tcos, tsin)
            torch_streams.append(
                (vid_t.numpy().copy(), text_t.numpy().copy(), ref_t.numpy().copy())
            )
        out_t = model(
            torch.from_numpy(video).permute(0, 1, 4, 2, 3),
            torch.from_numpy(ref).permute(0, 1, 4, 2, 3),
            torch.from_numpy(text), torch.from_numpy(t), tcos, tsin,
        ).permute(0, 1, 3, 4, 2).numpy()

    # ---- jax side: same walk through block_forward on per-layer slices
    t_emb = get_timestep_embedding(
        jnp.asarray(t), cfg.inner_dim, cfg.flip_sin_to_cos, float(cfg.freq_shift)
    )
    temb = timestep_embedding_mlp(
        jax.tree.map(jnp.asarray, host["time_embedding"]), t_emb
    )
    pe = host["patch_embed"]
    text_j = jnp.asarray(text) @ pe["text_proj"]["kernel"] + pe["text_proj"]["bias"]
    proj_k, proj_b = jnp.asarray(pe["proj"]["kernel"]), jnp.asarray(pe["proj"]["bias"])
    vid_j = patchify_video(jnp.asarray(video), proj_k, proj_b, cfg.patch_size)
    ref_j = patchify_video(jnp.asarray(ref), proj_k, proj_b, cfg.patch_size)

    step = jax.jit(
        lambda p, v, tx, r: block_forward(
            p, v, tx, r, temb, cos_seg, sin_seg, cfg, attention_backend="xla"
        )
    )
    worst = 0.0
    for k in range(L):
        layer = jax.tree.map(lambda x: jnp.asarray(x[k]), host["blocks"])
        vid_j, text_j, ref_j = step(layer, vid_j, text_j, ref_j)
        for ours, theirs in zip(
            (vid_j, text_j, ref_j), torch_streams[k]
        ):
            scale = max(float(np.abs(theirs).max()), 1.0)
            err = float(np.abs(np.asarray(ours) - theirs).max()) / scale
            # depth-linear fp32 drift budget: measured worst rel drift is
            # ~1e-5/block at these widths; 4x headroom
            assert err <= 4e-5 * (k + 1), (
                f"block {k}: rel drift {err:.3e} > {4e-5 * (k + 1):.3e}"
            )
            worst = max(worst, err / (k + 1))
    print(f"worst per-depth rel drift / depth: {worst:.3e}")

    # ---- the REAL scan path end-to-end must agree with torch AND with the
    # per-block walk above (pins lax.scan stacking/carry order)
    params = jax.device_put(host)
    ours = np.asarray(
        transformer_forward(
            params, cfg, jnp.asarray(video), jnp.asarray(ref), jnp.asarray(text),
            jnp.asarray(t), cos_seg, sin_seg, attention_backend="xla",
        )
    )
    assert ours.shape == out_t.shape
    scale = max(float(np.abs(out_t).max()), 1.0)
    err = float(np.abs(ours - out_t).max()) / scale
    assert err <= 4e-5 * (L + 1), f"full-depth output rel err {err:.3e}"


@pytest.mark.heavy  # 5.4 min on a 1-CPU host (r5 durations profile)
def test_one_block_production_dims_gradient_parity():
    """Training-path numerics at real dims: d<loss>/dW through the jax
    block (chunked attention custom VJP, remat) must match torch autograd
    through the independent model — pins the backward pass the way the
    forward test above pins inference.  Probe scalar = sum(out * fixed
    cotangent), so every output element's gradient contributes."""
    import jax

    cfg = TransformerConfig.cogvideox_5b(
        num_layers=1, dtype=jnp.float32, param_dtype=jnp.float32,
    )
    d = cfg.inner_dim

    torch.manual_seed(0)
    model = TorchTinyTransformer(cfg).float()
    params = convert_transformer_state_dict(model.hf_state_dict(), cfg)

    rng = np.random.RandomState(1)
    B, Fv, H, W = 1, 2, 60, 90
    video = rng.randn(B, Fv, H, W, cfg.in_channels).astype(np.float32)
    ref = rng.randn(B, 1, H, W, cfg.in_channels).astype(np.float32)
    text = rng.randn(B, cfg.max_text_seq_length, cfg.text_embed_dim).astype(np.float32)
    t = np.array([999.0], np.float32)
    ct = rng.randn(B, Fv, H, W, cfg.out_channels).astype(np.float32)

    gh, gw = H // cfg.patch_size, W // cfg.patch_size
    cos, sin = get_3d_rotary_pos_embed(
        cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), Fv + 1
    )
    tok = gh * gw
    cos_seg, sin_seg = build_segmented_rope(
        cfg.max_text_seq_length, cos[:tok], sin[:tok],
        cos[tok : tok * (Fv + 1)], sin[tok : tok * (Fv + 1)],
    )

    def probe(p):
        out = transformer_forward(
            p, cfg, jnp.asarray(video), jnp.asarray(ref), jnp.asarray(text),
            jnp.asarray(t), cos_seg, sin_seg, attention_backend="chunked",
            remat=True,
        )
        return jnp.sum(out * jnp.asarray(ct))

    g = jax.grad(probe)(params)

    half = cfg.attention_head_dim // 2
    full_cos = np.concatenate(
        [np.ones((cfg.max_text_seq_length, half), np.float32),
         cos[:tok], cos[tok : tok * (Fv + 1)]], axis=0)
    full_sin = np.concatenate(
        [np.zeros((cfg.max_text_seq_length, half), np.float32),
         sin[:tok], sin[tok : tok * (Fv + 1)]], axis=0)
    tcos, tsin = rope_interleaved(full_cos, full_sin)
    out_t = model(
        torch.from_numpy(video).permute(0, 1, 4, 2, 3),
        torch.from_numpy(ref).permute(0, 1, 4, 2, 3),
        torch.from_numpy(text),
        torch.from_numpy(t),
        tcos, tsin,
    )
    loss_t = (out_t * torch.from_numpy(ct).permute(0, 1, 4, 2, 3)).sum()
    loss_t.backward()

    blk = model.blocks[0]
    pairs = [
        ("attn.to_q", np.asarray(g["blocks"]["attn"]["qkv"]["kernel"][0][:, :d]).T,
         blk.to_q.weight.grad.numpy()),
        ("attn.to_v", np.asarray(g["blocks"]["attn"]["qkv"]["kernel"][0][:, 2 * d:]).T,
         blk.to_v.weight.grad.numpy()),
        ("attn.to_out", np.asarray(g["blocks"]["attn"]["to_out"]["kernel"][0]).T,
         blk.to_out.weight.grad.numpy()),
        ("ff.net.2", np.asarray(g["blocks"]["ff"]["net_2"]["kernel"][0]).T,
         blk.ff2.weight.grad.numpy()),
        ("norm1.linear", np.asarray(g["blocks"]["norm1"]["linear"]["kernel"][0]).T,
         blk.norm1.linear.weight.grad.numpy()),
        ("text_proj", np.asarray(g["patch_embed"]["text_proj"]["kernel"]).T,
         model.text_proj.weight.grad.numpy()),
        ("time_1", np.asarray(g["time_embedding"]["linear_1"]["kernel"]).T,
         model.time_1.weight.grad.numpy()),
    ]
    for name, ours_g, theirs_g in pairs:
        assert ours_g.shape == theirs_g.shape, (name, ours_g.shape, theirs_g.shape)
        scale = max(np.abs(theirs_g).max(), 1e-3)
        err = np.abs(ours_g - theirs_g).max()
        assert err <= 3e-3 * scale, f"{name}: max abs grad err {err:.3e} vs scale {scale:.3e}"
