"""Loader + full-model golden parity.

Builds an independent torch model of the 3-stream CogVideoX transformer
(from the reference's documented behaviour: cogvideox_transformer_3d.py
:42-186, :450-560), exports an HF-style state dict, converts it through
``s2v_tpu.loaders.hf`` and checks full-forward equivalence.  Also covers the
LoRA merge math (linear + conv targets) and safetensors round-trips.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from s2v_tpu.config import TransformerConfig
from s2v_tpu.loaders.hf import convert_transformer_state_dict
from s2v_tpu.loaders.lora import merge_lora_into_state_dict, normalize_lora_keys
from s2v_tpu.loaders.safetensors_io import best_guess_lora_file, load_safetensors, save_safetensors
from s2v_tpu.models.transformer import transformer_forward
from s2v_tpu.ops.rope import build_segmented_rope, get_3d_rotary_pos_embed


# --------------------------------------------------------------------------
# independent torch model of the 3-stream transformer (tiny)
# --------------------------------------------------------------------------


class TorchLayerNormZero(nn.Module):
    def __init__(self, cond_dim, dim):
        super().__init__()
        self.linear = nn.Linear(cond_dim, 6 * dim)
        self.norm = nn.LayerNorm(dim, eps=1e-5)

    def forward(self, video, text, ref, temb):
        shift, scale, gate, t_shift, t_scale, t_gate = self.linear(F.silu(temb)).chunk(6, dim=1)
        v = self.norm(video) * (1 + scale)[:, None] + shift[:, None]
        t = self.norm(text) * (1 + t_scale)[:, None] + t_shift[:, None]
        r = self.norm(ref) * (1 + scale)[:, None] + shift[:, None]
        return v, t, r, gate[:, None], t_gate[:, None], gate[:, None]


def rope_interleaved(cos_half, sin_half):
    return torch.from_numpy(np.repeat(cos_half, 2, -1)), torch.from_numpy(np.repeat(sin_half, 2, -1))


def torch_apply_rope(x, cos, sin):
    if x.shape[2] == 0:  # zero-width segment (T2V's empty ref stream)
        return x
    x_real, x_imag = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
    x_rot = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
    return (x.float() * cos[None, None] + x_rot.float() * sin[None, None]).to(x.dtype)


class TorchBlock(nn.Module):
    def __init__(self, dim, heads, cond_dim, ff_mult=4):
        super().__init__()
        self.heads = heads
        self.head_dim = dim // heads
        self.norm1 = TorchLayerNormZero(cond_dim, dim)
        self.norm2 = TorchLayerNormZero(cond_dim, dim)
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.to_out = nn.Linear(dim, dim)
        self.norm_q = nn.LayerNorm(self.head_dim, eps=1e-6)
        self.norm_k = nn.LayerNorm(self.head_dim, eps=1e-6)
        self.ff1 = nn.Linear(dim, ff_mult * dim)
        self.ff2 = nn.Linear(ff_mult * dim, dim)

    def attention(self, x, cos, sin, text_len, ref_len):
        b, s, d = x.shape
        q = self.to_q(x).view(b, s, self.heads, self.head_dim).transpose(1, 2)
        k = self.to_k(x).view(b, s, self.heads, self.head_dim).transpose(1, 2)
        v = self.to_v(x).view(b, s, self.heads, self.head_dim).transpose(1, 2)
        q, k = self.norm_q(q), self.norm_k(k)
        # video span rope + ref span rope (text untouched)
        vid_cos, vid_sin = cos[text_len + ref_len :], sin[text_len + ref_len :]
        ref_cos, ref_sin = cos[text_len : text_len + ref_len], sin[text_len : text_len + ref_len]
        q = torch.cat(
            [
                q[:, :, :text_len],
                torch_apply_rope(q[:, :, text_len : text_len + ref_len], ref_cos, ref_sin),
                torch_apply_rope(q[:, :, text_len + ref_len :], vid_cos, vid_sin),
            ],
            dim=2,
        )
        k = torch.cat(
            [
                k[:, :, :text_len],
                torch_apply_rope(k[:, :, text_len : text_len + ref_len], ref_cos, ref_sin),
                torch_apply_rope(k[:, :, text_len + ref_len :], vid_cos, vid_sin),
            ],
            dim=2,
        )
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, s, d)
        return self.to_out(o)

    def forward(self, video, text, ref, temb, cos, sin):
        t_len, r_len = text.shape[1], ref.shape[1]
        v_n, t_n, r_n, g_v, g_t, g_r = self.norm1(video, text, ref, temb)
        x = torch.cat([t_n, r_n, v_n], dim=1)
        attn = self.attention(x, cos, sin, t_len, r_len)
        video = video + g_v * attn[:, t_len + r_len :]
        text = text + g_t * attn[:, :t_len]
        ref = ref + g_r * attn[:, t_len : t_len + r_len]
        v_n, t_n, r_n, g_v, g_t, g_r = self.norm2(video, text, ref, temb)
        y = torch.cat([t_n, r_n, v_n], dim=1)
        ff = self.ff2(F.gelu(self.ff1(y), approximate="tanh"))
        video = video + g_v * ff[:, t_len + r_len :]
        text = text + g_t * ff[:, :t_len]
        ref = ref + g_r * ff[:, t_len : t_len + r_len]
        return video, text, ref


class TorchTinyTransformer(nn.Module):
    def __init__(self, cfg: TransformerConfig):
        super().__init__()
        d = cfg.inner_dim
        self.cfg = cfg
        self.patch_proj = nn.Conv2d(cfg.in_channels, d, cfg.patch_size, cfg.patch_size)
        self.text_proj = nn.Linear(cfg.text_embed_dim, d)
        self.time_1 = nn.Linear(d, cfg.time_embed_dim)
        self.time_2 = nn.Linear(cfg.time_embed_dim, cfg.time_embed_dim)
        self.blocks = nn.ModuleList(
            [TorchBlock(d, cfg.num_attention_heads, cfg.time_embed_dim, cfg.ff_mult) for _ in range(cfg.num_layers)]
        )
        self.norm_final = nn.LayerNorm(d, eps=1e-5)
        self.norm_out_linear = nn.Linear(cfg.time_embed_dim, 2 * d)
        self.norm_out_norm = nn.LayerNorm(d, eps=1e-5)
        self.proj_out = nn.Linear(d, cfg.patch_size**2 * cfg.out_channels)

    def time_embed(self, t):
        d = self.cfg.inner_dim
        half = d // 2
        exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
        emb = t[:, None].float() * torch.exp(exponent)[None]
        emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)  # flip sin->cos
        return self.time_2(F.silu(self.time_1(emb)))

    def patchify(self, x):  # x: [B, F, C, H, W]
        b, f, c, h, w = x.shape
        y = self.patch_proj(x.reshape(b * f, c, h, w))
        y = y.reshape(b, f, y.shape[1], y.shape[2], y.shape[3])
        return y.flatten(3).transpose(2, 3).flatten(1, 2)

    def forward(self, video, ref, text_embeds, t, cos, sin):
        b, f, c, h, w = video.shape
        p = self.cfg.patch_size
        temb = self.time_embed(t)
        text = self.text_proj(text_embeds)
        vid = self.patchify(video)
        ref_tok = self.patchify(ref)
        for blk in self.blocks:
            vid, text, ref_tok = blk(vid, text, ref_tok, temb, cos, sin)
        joint = self.norm_final(torch.cat([text, vid], dim=1))
        vid = joint[:, text.shape[1] :]
        shift, scale = self.norm_out_linear(F.silu(temb)).chunk(2, dim=1)
        vid = self.norm_out_norm(vid) * (1 + scale)[:, None] + shift[:, None]
        vid = self.proj_out(vid)
        out = vid.reshape(b, f, h // p, w // p, -1, p, p)
        return out.permute(0, 1, 4, 2, 5, 3, 6).flatten(5, 6).flatten(3, 4)  # [B,F,C,H,W]

    def hf_state_dict(self):
        """Export under the HF CogVideoX naming the converter expects."""
        sd = {}
        sd["patch_embed.proj.weight"] = self.patch_proj.weight
        sd["patch_embed.proj.bias"] = self.patch_proj.bias
        sd["patch_embed.text_proj.weight"] = self.text_proj.weight
        sd["patch_embed.text_proj.bias"] = self.text_proj.bias
        sd["time_embedding.linear_1.weight"] = self.time_1.weight
        sd["time_embedding.linear_1.bias"] = self.time_1.bias
        sd["time_embedding.linear_2.weight"] = self.time_2.weight
        sd["time_embedding.linear_2.bias"] = self.time_2.bias
        for i, blk in enumerate(self.blocks):
            pre = f"transformer_blocks.{i}"
            sd[f"{pre}.norm1.linear.weight"] = blk.norm1.linear.weight
            sd[f"{pre}.norm1.linear.bias"] = blk.norm1.linear.bias
            sd[f"{pre}.norm1.norm.weight"] = blk.norm1.norm.weight
            sd[f"{pre}.norm1.norm.bias"] = blk.norm1.norm.bias
            sd[f"{pre}.norm2.linear.weight"] = blk.norm2.linear.weight
            sd[f"{pre}.norm2.linear.bias"] = blk.norm2.linear.bias
            sd[f"{pre}.norm2.norm.weight"] = blk.norm2.norm.weight
            sd[f"{pre}.norm2.norm.bias"] = blk.norm2.norm.bias
            for name, mod in [("to_q", blk.to_q), ("to_k", blk.to_k), ("to_v", blk.to_v)]:
                sd[f"{pre}.attn1.{name}.weight"] = mod.weight
                sd[f"{pre}.attn1.{name}.bias"] = mod.bias
            sd[f"{pre}.attn1.norm_q.weight"] = blk.norm_q.weight
            sd[f"{pre}.attn1.norm_q.bias"] = blk.norm_q.bias
            sd[f"{pre}.attn1.norm_k.weight"] = blk.norm_k.weight
            sd[f"{pre}.attn1.norm_k.bias"] = blk.norm_k.bias
            sd[f"{pre}.attn1.to_out.0.weight"] = blk.to_out.weight
            sd[f"{pre}.attn1.to_out.0.bias"] = blk.to_out.bias
            sd[f"{pre}.ff.net.0.proj.weight"] = blk.ff1.weight
            sd[f"{pre}.ff.net.0.proj.bias"] = blk.ff1.bias
            sd[f"{pre}.ff.net.2.weight"] = blk.ff2.weight
            sd[f"{pre}.ff.net.2.bias"] = blk.ff2.bias
        sd["norm_final.weight"] = self.norm_final.weight
        sd["norm_final.bias"] = self.norm_final.bias
        sd["norm_out.linear.weight"] = self.norm_out_linear.weight
        sd["norm_out.linear.bias"] = self.norm_out_linear.bias
        sd["norm_out.norm.weight"] = self.norm_out_norm.weight
        sd["norm_out.norm.bias"] = self.norm_out_norm.bias
        sd["proj_out.weight"] = self.proj_out.weight
        sd["proj_out.bias"] = self.proj_out.bias
        return {k: v.detach().numpy() for k, v in sd.items()}


def _tiny_rope_tables(cfg, frames, h, w):
    gh, gw = h // cfg.patch_size, w // cfg.patch_size
    cos, sin = get_3d_rotary_pos_embed(
        cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), frames + 1
    )
    tok = gh * gw
    return cos, sin, tok


def test_full_transformer_golden_parity():
    """Independent torch model -> HF state dict -> converter -> bitwise-close
    full forward.  This is the core method-parity check (SURVEY.md §7 stage 4)."""
    cfg = TransformerConfig.tiny()
    torch.manual_seed(0)
    model = TorchTinyTransformer(cfg).eval()
    sd = model.hf_state_dict()
    params = convert_transformer_state_dict(sd, cfg)

    rng = np.random.RandomState(0)
    B, Fv, H, W = 2, 3, 16, 16
    video = rng.randn(B, Fv, H, W, cfg.in_channels).astype(np.float32)
    ref = rng.randn(B, 1, H, W, cfg.in_channels).astype(np.float32)
    text = rng.randn(B, cfg.max_text_seq_length, cfg.text_embed_dim).astype(np.float32)
    t = np.array([999, 40], np.float32)

    cos, sin, tok = _tiny_rope_tables(cfg, Fv, H, W)
    cos_seg, sin_seg = build_segmented_rope(
        cfg.max_text_seq_length, cos[:tok], sin[:tok], cos[tok : tok * (Fv + 1)], sin[tok : tok * (Fv + 1)]
    )
    ours = transformer_forward(
        params, cfg, jnp.asarray(video), jnp.asarray(ref), jnp.asarray(text), jnp.asarray(t),
        cos_seg, sin_seg,
    )

    with torch.no_grad():
        # torch model consumes [text | ref | video]-ordered interleaved tables
        full_cos = np.concatenate(
            [np.ones((cfg.max_text_seq_length, cfg.attention_head_dim // 2), np.float32),
             cos[:tok], cos[tok : tok * (Fv + 1)]], axis=0)
        full_sin = np.concatenate(
            [np.zeros((cfg.max_text_seq_length, cfg.attention_head_dim // 2), np.float32),
             sin[:tok], sin[tok : tok * (Fv + 1)]], axis=0)
        tcos, tsin = rope_interleaved(full_cos, full_sin)
        theirs = model(
            torch.from_numpy(video).permute(0, 1, 4, 2, 3),
            torch.from_numpy(ref).permute(0, 1, 4, 2, 3),
            torch.from_numpy(text),
            torch.from_numpy(t),
            tcos,
            tsin,
        )
    theirs = theirs.permute(0, 1, 3, 4, 2).numpy()  # -> channels-last
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-4, rtol=1e-4)


# --------------------------------------------------------------------------
# LoRA merge
# --------------------------------------------------------------------------


def test_lora_merge_linear_and_conv():
    rng = np.random.RandomState(0)
    base = {
        "transformer_blocks.0.attn1.to_q.weight": rng.randn(8, 8).astype(np.float32),
        "patch_embed.proj.weight": rng.randn(8, 4, 2, 2).astype(np.float32),
    }
    A_lin = rng.randn(2, 8).astype(np.float32)
    B_lin = rng.randn(8, 2).astype(np.float32)
    A_conv = rng.randn(2, 4, 2, 2).astype(np.float32)
    B_conv = rng.randn(8, 2, 1, 1).astype(np.float32)
    lora = {
        "transformer.transformer_blocks.0.attn1.to_q.lora.down.weight": A_lin,
        "transformer.transformer_blocks.0.attn1.to_q.lora.up.weight": B_lin,
        "transformer.patch_embed.proj.lora.down.weight": A_conv,
        "transformer.patch_embed.proj.lora.up.weight": B_conv,
    }
    merged, touched = merge_lora_into_state_dict(base, lora, alpha=64.0)
    assert sorted(touched) == ["patch_embed.proj", "transformer_blocks.0.attn1.to_q"]
    scale = 64.0 / 2
    np.testing.assert_allclose(
        merged["transformer_blocks.0.attn1.to_q.weight"],
        base["transformer_blocks.0.attn1.to_q.weight"] + scale * (B_lin @ A_lin),
        rtol=1e-5,
    )
    expected_conv = base["patch_embed.proj.weight"] + scale * (
        B_conv.reshape(8, 2) @ A_conv.reshape(2, 16)
    ).reshape(8, 4, 2, 2)
    np.testing.assert_allclose(merged["patch_embed.proj.weight"], expected_conv, rtol=1e-5)


def test_lora_merge_equals_runtime_lora_forward():
    """merged W @ x == W @ x + scale * B (A x) — the PEFT runtime semantics."""
    rng = np.random.RandomState(1)
    W = rng.randn(6, 5).astype(np.float32)
    A = rng.randn(3, 5).astype(np.float32)
    B = rng.randn(6, 3).astype(np.float32)
    x = rng.randn(4, 5).astype(np.float32)
    merged, _ = merge_lora_into_state_dict(
        {"m.weight": W}, {"m.lora_A.weight": A, "m.lora_B.weight": B}, alpha=64.0
    )
    runtime = x @ W.T + (64.0 / 3) * (x @ A.T) @ B.T
    np.testing.assert_allclose(x @ merged["m.weight"].T, runtime, rtol=1e-4)


def test_safetensors_roundtrip_and_best_guess(tmp_path):
    rng = np.random.RandomState(2)
    sd = {"a.weight": rng.randn(3, 3).astype(np.float32)}
    d = tmp_path / "ckpt"
    d.mkdir()
    save_safetensors(sd, str(d / "pytorch_lora_weights_transformer.safetensors"))
    # distractors the reference's best-guess filter must skip
    save_safetensors(sd, str(d / "optimizer.safetensors"))
    (d / "random_states_0.pkl").write_bytes(b"x")
    f = best_guess_lora_file(str(d))
    assert f.endswith("pytorch_lora_weights_transformer.safetensors")
    loaded = load_safetensors(f)
    np.testing.assert_array_equal(loaded["a.weight"], sd["a.weight"])


def test_save_safetensors_noncontiguous_views(tmp_path):
    """safetensors 0.8 serializes the raw buffer of non-contiguous arrays
    (a .T view silently round-trips as its un-transposed buffer); every
    export converter emits transposed views, so the writer must
    contiguous-ify.  Regression for a bug that mangled every exported
    linear weight."""
    rng = np.random.RandomState(3)
    a = rng.randn(4, 6).astype(np.float32)
    c = rng.randn(2, 3, 5).astype(np.float32)
    p = str(tmp_path / "t.safetensors")
    save_safetensors({"t": a.T, "p": c.transpose(2, 0, 1)}, p)
    back = load_safetensors(p)
    np.testing.assert_array_equal(back["t"], a.T)
    np.testing.assert_array_equal(back["p"], c.transpose(2, 0, 1))


def test_normalize_peft_default_keys():
    sd = {"transformer.x.lora_A.default.weight": np.zeros(1), "transformer.x.lora_B.default.weight": np.zeros(1)}
    out = normalize_lora_keys(sd)
    assert set(out) == {"x.lora_A.weight", "x.lora_B.weight"}


def test_disentangled_modulation_loader_and_forward():
    """convert_transformer_state_dict picks up stashed base_linear keys, and
    transformer_forward with disentangled_modulation routes video/text
    modulation through them (equal when base == merged, different after a
    simulated merge)."""
    import dataclasses

    cfg = TransformerConfig.tiny()
    cfg_d = dataclasses.replace(cfg, disentangled_modulation=True)
    torch.manual_seed(1)
    sd = TorchTinyTransformer(cfg).eval().hf_state_dict()
    for i in range(cfg.num_layers):
        for n in ("norm1", "norm2"):
            for wb in ("weight", "bias"):
                sd[f"transformer_blocks.{i}.{n}.base_linear.{wb}"] = sd[
                    f"transformer_blocks.{i}.{n}.linear.{wb}"
                ].copy()

    rng = np.random.RandomState(1)
    B, Fv, H, W = 1, 2, 8, 8
    video = jnp.asarray(rng.randn(B, Fv, H, W, cfg.in_channels).astype(np.float32))
    ref = jnp.asarray(rng.randn(B, 1, H, W, cfg.in_channels).astype(np.float32))
    text = jnp.asarray(rng.randn(B, cfg.max_text_seq_length, cfg.text_embed_dim).astype(np.float32))
    t = jnp.asarray([500.0])
    cos, sin, tok = _tiny_rope_tables(cfg, Fv, H, W)
    cs, sn = build_segmented_rope(
        cfg.max_text_seq_length, cos[:tok], sin[:tok], cos[tok : tok * (Fv + 1)], sin[tok : tok * (Fv + 1)]
    )

    params = convert_transformer_state_dict(sd, cfg_d)
    assert "base_linear" in params["blocks"]["norm1"]
    out_plain = transformer_forward(params, cfg, video, ref, text, t, cs, sn)
    out_disent = transformer_forward(params, cfg_d, video, ref, text, t, cs, sn)
    # base == merged -> identical
    np.testing.assert_allclose(np.asarray(out_disent), np.asarray(out_plain), atol=1e-6)

    # simulate a LoRA merge on the live modulation linears only
    for i in range(cfg.num_layers):
        for n in ("norm1", "norm2"):
            sd[f"transformer_blocks.{i}.{n}.linear.weight"] = (
                sd[f"transformer_blocks.{i}.{n}.linear.weight"] + 0.05
            )
    params2 = convert_transformer_state_dict(sd, cfg_d)
    out_m_plain = transformer_forward(params2, cfg, video, ref, text, t, cs, sn)
    out_m_disent = transformer_forward(params2, cfg_d, video, ref, text, t, cs, sn)
    # merged != base -> the switch changes the output, and neither matches
    # the all-merged forward (video/text follow base now)
    assert float(jnp.abs(out_m_disent - out_m_plain).max()) > 1e-4
    assert float(jnp.abs(out_m_disent - out_plain).max()) > 1e-4


def test_t2v_two_stream_golden_parity():
    """No-ref T2V mode (VERDICT r3 #5): our transformer with
    ``ref_latents=None`` vs the independent torch model run with a
    zero-frame ref stream — certifies the 2-stream [text | video]
    semantics stock CogVideoX checkpoints need (the reference's own T2V
    pipeline is broken against its modified transformer,
    pipeline_cogvideox.py:685-686 FIXME)."""
    cfg = TransformerConfig.tiny()
    torch.manual_seed(0)
    model = TorchTinyTransformer(cfg).eval()
    params = convert_transformer_state_dict(model.hf_state_dict(), cfg)

    rng = np.random.RandomState(0)
    B, Fv, H, W = 2, 3, 16, 16
    video = rng.randn(B, Fv, H, W, cfg.in_channels).astype(np.float32)
    text = rng.randn(B, cfg.max_text_seq_length, cfg.text_embed_dim).astype(np.float32)
    t = np.array([999, 40], np.float32)

    cos, sin, tok = _tiny_rope_tables(cfg, Fv, H, W)
    # zero-width ref segment: [text (identity) | video]
    cos_seg, sin_seg = build_segmented_rope(
        cfg.max_text_seq_length, cos[:0], sin[:0],
        cos[tok : tok * (Fv + 1)], sin[tok : tok * (Fv + 1)],
    )
    ours = transformer_forward(
        params, cfg, jnp.asarray(video), None, jnp.asarray(text), jnp.asarray(t),
        cos_seg, sin_seg,
    )

    with torch.no_grad():
        full_cos = np.concatenate(
            [np.ones((cfg.max_text_seq_length, cfg.attention_head_dim // 2), np.float32),
             cos[tok : tok * (Fv + 1)]], axis=0)
        full_sin = np.concatenate(
            [np.zeros((cfg.max_text_seq_length, cfg.attention_head_dim // 2), np.float32),
             sin[tok : tok * (Fv + 1)]], axis=0)
        tcos, tsin = rope_interleaved(full_cos, full_sin)
        theirs = model(
            torch.from_numpy(video).permute(0, 1, 4, 2, 3),
            torch.zeros((B, 0, cfg.in_channels, H, W)),  # zero-frame ref
            torch.from_numpy(text),
            torch.from_numpy(t),
            tcos,
            tsin,
        )
    theirs = theirs.permute(0, 1, 3, 4, 2).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-4, rtol=1e-4)
