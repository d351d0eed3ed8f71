"""Unit tests for core ops: timestep embedding, adaLN, patchify, norms,
attention — parity vs independent torch implementations of the reference
semantics."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from s2v_tpu.ops.adaln import ada_layer_norm_out, ada_layer_norm_zero_3stream
from s2v_tpu.ops.attention import init_attention_params, joint_attention
from s2v_tpu.ops.norms import group_norm, layer_norm, rms_norm
from s2v_tpu.ops.patchify import patchify_video, unpatchify_video, conv2d_kernel_to_matrix
from s2v_tpu.ops.timestep import get_timestep_embedding


def torch_timestep_embedding(timesteps, dim, flip=True, shift=0.0, max_period=10000):
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - shift)
    emb = torch.exp(exponent)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


def test_timestep_embedding():
    t = np.array([0, 1, 500, 999], np.float32)
    ours = get_timestep_embedding(jnp.asarray(t), 64, True, 0.0)
    theirs = torch_timestep_embedding(torch.from_numpy(t), 64)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 16).astype(np.float32)
    w = rng.randn(16).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    ours = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1e-5)
    theirs = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(w), torch.from_numpy(b), 1e-5)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_group_norm_matches_torch():
    rng = np.random.RandomState(1)
    # ours: [B, T, H, W, C]; torch: [B, C, T, H, W]
    x = rng.randn(2, 3, 4, 5, 8).astype(np.float32)
    w = rng.randn(8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    ours = group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), num_groups=4, eps=1e-6)
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    theirs = F.group_norm(xt, 4, torch.from_numpy(w), torch.from_numpy(b), 1e-6)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.permute(0, 2, 3, 4, 1).numpy(), atol=1e-4
    )


def test_rms_norm_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 5, 16).astype(np.float32)
    w = rng.randn(16).astype(np.float32)
    ours = rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-6)
    xt = torch.from_numpy(x)
    var = xt.pow(2).mean(-1, keepdim=True)
    theirs = xt * torch.rsqrt(var + 1e-6) * torch.from_numpy(w)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def torch_adaln_zero_3stream(x, t, r, temb, w, b, nw, nb, eps=1e-5):
    """Reference CogVideoXLayerNormZero.forward (normalization.py:452-484),
    effective inference semantics (single linear)."""
    mod = F.linear(F.silu(temb), w, b)
    shift, scale, gate, t_shift, t_scale, t_gate = mod.chunk(6, dim=1)
    ln = lambda v: F.layer_norm(v, (v.shape[-1],), nw, nb, eps)
    x_o = ln(x) * (1 + scale)[:, None] + shift[:, None]
    t_o = ln(t) * (1 + t_scale)[:, None] + t_shift[:, None]
    r_o = ln(r) * (1 + scale)[:, None] + shift[:, None]
    return x_o, t_o, r_o, gate[:, None], t_gate[:, None], gate[:, None]


def test_adaln_zero_3stream():
    rng = np.random.RandomState(3)
    B, D, Td = 2, 12, 8
    video = rng.randn(B, 7, D).astype(np.float32)
    text = rng.randn(B, 3, D).astype(np.float32)
    ref = rng.randn(B, 5, D).astype(np.float32)
    temb = rng.randn(B, Td).astype(np.float32)
    w = rng.randn(6 * D, Td).astype(np.float32) * 0.1
    b = rng.randn(6 * D).astype(np.float32) * 0.1
    nw = rng.randn(D).astype(np.float32)
    nb = rng.randn(D).astype(np.float32)

    params = {
        "linear": {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)},
        "norm": {"weight": jnp.asarray(nw), "bias": jnp.asarray(nb)},
    }
    v_o, t_o, r_o, g_v, g_t, g_r = ada_layer_norm_zero_3stream(
        params, jnp.asarray(video), jnp.asarray(text), jnp.asarray(ref), jnp.asarray(temb)
    )
    tv, tt, tr, tgv, tgt, tgr = torch_adaln_zero_3stream(
        *(torch.from_numpy(a) for a in (video, text, ref, temb, w, b, nw, nb))
    )
    np.testing.assert_allclose(np.asarray(v_o), tv.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_o), tt.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_o), tr.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_v), tgv.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_r), tgr.numpy(), atol=1e-6)


def test_adaln_out():
    rng = np.random.RandomState(4)
    B, D, Td = 2, 12, 8
    x = rng.randn(B, 7, D).astype(np.float32)
    temb = rng.randn(B, Td).astype(np.float32)
    w = rng.randn(2 * D, Td).astype(np.float32) * 0.1
    b = rng.randn(2 * D).astype(np.float32) * 0.1
    params = {
        "linear": {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)},
        "norm": {"weight": jnp.ones(D, jnp.float32), "bias": jnp.zeros(D, jnp.float32)},
    }
    ours = ada_layer_norm_out(params, jnp.asarray(x), jnp.asarray(temb))
    mod = F.linear(F.silu(torch.from_numpy(temb)), torch.from_numpy(w), torch.from_numpy(b))
    shift, scale = mod.chunk(2, dim=1)
    theirs = F.layer_norm(torch.from_numpy(x), (D,)) * (1 + scale[:, None]) + shift[:, None]
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_patchify_matches_conv2d():
    rng = np.random.RandomState(5)
    B, Fr, H, W, C, D, p = 1, 2, 6, 8, 3, 10, 2
    x = rng.randn(B, Fr, H, W, C).astype(np.float32)
    torch_kernel = rng.randn(D, C, p, p).astype(np.float32)
    bias = rng.randn(D).astype(np.float32)
    kernel_mat = conv2d_kernel_to_matrix(torch_kernel)
    ours = patchify_video(jnp.asarray(x), kernel_mat, jnp.asarray(bias), p)
    # torch: conv per frame, then flatten(3).transpose(2,3).flatten(1,2)
    xt = torch.from_numpy(x).permute(0, 1, 4, 2, 3).reshape(B * Fr, C, H, W)
    y = F.conv2d(xt, torch.from_numpy(torch_kernel), torch.from_numpy(bias), stride=p)
    y = y.reshape(B, Fr, D, H // p, W // p).flatten(3).transpose(2, 3).flatten(1, 2)
    np.testing.assert_allclose(np.asarray(ours), y.numpy(), atol=1e-4)


def test_unpatchify_roundtrip_order():
    """Verify unpatchify matches the reference permute chain
    (cogvideox_transformer_3d.py:549-551)."""
    rng = np.random.RandomState(6)
    B, Fr, H, W, C, p = 1, 2, 4, 6, 3, 2
    tokens = rng.randn(B, Fr * (H // p) * (W // p), p * p * C).astype(np.float32)
    ours = unpatchify_video(jnp.asarray(tokens), Fr, H, W, p, C)
    t = torch.from_numpy(tokens)
    theirs = t.reshape(B, Fr, H // p, W // p, -1, p, p)
    theirs = theirs.permute(0, 1, 4, 2, 5, 3, 6).flatten(5, 6).flatten(3, 4)  # [B,F,C,H,W]
    np.testing.assert_allclose(
        np.asarray(ours), theirs.permute(0, 1, 3, 4, 2).numpy(), atol=1e-6
    )


def test_chunked_backend_matches_xla():
    rng = np.random.RandomState(8)
    B, S, H, hd = 1, 300, 2, 16
    D = H * hd
    x = rng.randn(B, S, D).astype(np.float32)
    params = init_attention_params(jax.random.PRNGKey(1), D, H, jnp.float32)
    out_xla = joint_attention(params, jnp.asarray(x), H, backend="xla")
    out_chunked = joint_attention(params, jnp.asarray(x), H, backend="chunked")
    np.testing.assert_allclose(np.asarray(out_chunked), np.asarray(out_xla), atol=2e-5)


def test_joint_attention_matches_torch_sdpa():
    """Full processor parity: fused qkv + qk layernorm + sdpa + out proj
    vs torch SDPA math (attention_processor.py:2014-2097, no RoPE)."""
    rng = np.random.RandomState(7)
    B, S, H, hd = 2, 12, 2, 8
    D = H * hd
    x = rng.randn(B, S, D).astype(np.float32)
    params = init_attention_params(jax.random.PRNGKey(0), D, H, jnp.float32)
    out = joint_attention(params, jnp.asarray(x), H)

    qkv_w = np.asarray(params["qkv"]["kernel"])
    q, k, v = np.split(np.asarray(x) @ qkv_w + np.asarray(params["qkv"]["bias"]), 3, axis=-1)

    def heads(a):
        return torch.from_numpy(a.reshape(B, S, H, hd)).permute(0, 2, 1, 3)

    qt = F.layer_norm(heads(q), (hd,), torch.from_numpy(np.asarray(params["norm_q"]["weight"])),
                      torch.from_numpy(np.asarray(params["norm_q"]["bias"])), 1e-6)
    kt = F.layer_norm(heads(k), (hd,), torch.from_numpy(np.asarray(params["norm_k"]["weight"])),
                      torch.from_numpy(np.asarray(params["norm_k"]["bias"])), 1e-6)
    attn = F.scaled_dot_product_attention(qt, kt, heads(v))
    attn = attn.permute(0, 2, 1, 3).reshape(B, S, D).numpy()
    expected = attn @ np.asarray(params["to_out"]["kernel"]) + np.asarray(params["to_out"]["bias"])
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5)


def test_adaln_disentangled_switch():
    """base_linear: video/text streams follow the base modulation, the ref
    stream follows the merged one (intended enable_lora semantics)."""
    rng = np.random.RandomState(5)
    B, D, Td = 2, 12, 8
    video = jnp.asarray(rng.randn(B, 7, D).astype(np.float32))
    text = jnp.asarray(rng.randn(B, 3, D).astype(np.float32))
    ref = jnp.asarray(rng.randn(B, 5, D).astype(np.float32))
    temb = jnp.asarray(rng.randn(B, Td).astype(np.float32))
    norm = {"weight": jnp.asarray(rng.randn(D).astype(np.float32)),
            "bias": jnp.asarray(rng.randn(D).astype(np.float32))}
    base = {"kernel": jnp.asarray(rng.randn(Td, 6 * D).astype(np.float32) * 0.1),
            "bias": jnp.asarray(rng.randn(6 * D).astype(np.float32) * 0.1)}
    merged = {"kernel": base["kernel"] + 0.05, "bias": base["bias"] - 0.02}

    dv, dt_, dr, dgv, dgt, dgr = ada_layer_norm_zero_3stream(
        {"linear": merged, "norm": norm}, video, text, ref, temb, base_linear=base
    )
    bv, bt, br, bgv, bgt, bgr = ada_layer_norm_zero_3stream(
        {"linear": base, "norm": norm}, video, text, ref, temb
    )
    mv, mt, mr, mgv, mgt, mgr = ada_layer_norm_zero_3stream(
        {"linear": merged, "norm": norm}, video, text, ref, temb
    )
    np.testing.assert_allclose(np.asarray(dv), np.asarray(bv), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dt_), np.asarray(bt), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dgv), np.asarray(bgv), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dgt), np.asarray(bgt), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dr), np.asarray(mr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dgr), np.asarray(mgr), atol=1e-6)
    # the switch is not a no-op when base != merged
    assert float(jnp.abs(dr - br).max()) > 1e-3
