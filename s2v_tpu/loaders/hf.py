"""HF-layout (torch) state dicts -> s2v_tpu param pytrees.

Covers the three checkpoints the reference stack consumes
(src/inference.py:179-247): the CogVideoX transformer, the 3D causal VAE and
the T5 encoder.  All conversions are pure layout transforms (transposes /
reshapes / stacking) documented per-family; LoRA is merged into the torch
state dict *before* conversion (s2v_tpu.loaders.lora).
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from s2v_tpu.config import T5Config, TransformerConfig, VAEConfig


def _j(x, dtype):
    # host-side cast (bf16 via ml_dtypes-backed numpy): conversion stays a
    # pure numpy transform; _to_device does ONE bulk transfer at the end.
    # Eager per-leaf jnp ops each cost a relay round-trip (a degraded relay
    # measured ~1 s/dispatch -> minutes of load time for the VAE's 436
    # leaves)
    return np.asarray(x).astype(np.dtype(dtype))


def _to_device(tree):
    """One bulk device_put of a converted numpy pytree (no per-leaf python
    round-trips; respects jax.default_device, e.g. the T5 host path)."""
    return jax.device_put(tree)


def _linear(sd, prefix, dtype, bias=True):
    p = {"kernel": _j(np.asarray(sd[prefix + ".weight"]).T, dtype)}
    if bias:
        p["bias"] = _j(sd[prefix + ".bias"], dtype)
    return p


def _affine(sd, prefix, dtype):
    return {"weight": _j(sd[prefix + ".weight"], dtype), "bias": _j(sd[prefix + ".bias"], dtype)}


# ---------------------------------------------------------------------------
# transformer
# ---------------------------------------------------------------------------


def _quantize_host(kernel_np: np.ndarray, bias, dtype):
    """Host-side per-output-channel int8 quantization (no device temps)."""
    k = np.asarray(kernel_np, np.float32)
    scale = np.max(np.abs(k), axis=-2, keepdims=True) / 127.0
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return {"q": q, "scale": scale.astype(np.float32), "bias": _j(bias, dtype)}


def convert_transformer_state_dict(
    sd: Dict[str, np.ndarray], cfg: TransformerConfig, quantize_int8: bool = False,
    device: bool = True,
):
    """HF ``CogVideoXTransformer3DModel`` state dict -> our pytree.

    QKV projections are fused into one ``[D, 3D]`` kernel; per-layer params
    are stacked on a leading axis for ``lax.scan``.  ``quantize_int8``
    converts the qkv/to_out/ff kernels to the int8 serving format
    (s2v_tpu.ops.quant) during conversion, host-side.  ``device=False``
    returns the host (numpy) tree — callers that must free an old device
    tree before uploading (LoRA hot-swap: two 11-GB trees don't fit a
    16 GB chip) or that place shards themselves (mesh) use this.
    """
    dt = cfg.param_dtype
    p = cfg.patch_size

    # patch embed: conv [D, C, p, p] -> [p*p*C, D] matmul (ph, pw, c ordering)
    conv_w = np.asarray(sd["patch_embed.proj.weight"], dtype=np.float32)
    d, c, ph, pw = conv_w.shape
    proj_kernel = conv_w.transpose(2, 3, 1, 0).reshape(ph * pw * c, d)

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        q = np.asarray(sd[f"{pre}.attn1.to_q.weight"], dtype=np.float32).T
        k = np.asarray(sd[f"{pre}.attn1.to_k.weight"], dtype=np.float32).T
        v = np.asarray(sd[f"{pre}.attn1.to_v.weight"], dtype=np.float32).T
        qb = np.asarray(sd[f"{pre}.attn1.to_q.bias"], dtype=np.float32)
        kb = np.asarray(sd[f"{pre}.attn1.to_k.bias"], dtype=np.float32)
        vb = np.asarray(sd[f"{pre}.attn1.to_v.bias"], dtype=np.float32)
        if quantize_int8:
            attn_tree = {
                "qkv": _quantize_host(
                    np.concatenate([q, k, v], axis=1), np.concatenate([qb, kb, vb]), dt
                ),
                "norm_q": _affine(sd, f"{pre}.attn1.norm_q", dt),
                "norm_k": _affine(sd, f"{pre}.attn1.norm_k", dt),
                "to_out": _quantize_host(
                    np.asarray(sd[f"{pre}.attn1.to_out.0.weight"], np.float32).T,
                    sd[f"{pre}.attn1.to_out.0.bias"], dt,
                ),
            }
            ff_tree = {
                "net_0": _quantize_host(
                    np.asarray(sd[f"{pre}.ff.net.0.proj.weight"], np.float32).T,
                    sd[f"{pre}.ff.net.0.proj.bias"], dt,
                ),
                "net_2": _quantize_host(
                    np.asarray(sd[f"{pre}.ff.net.2.weight"], np.float32).T,
                    sd[f"{pre}.ff.net.2.bias"], dt,
                ),
            }
        else:
            attn_tree = {
                "qkv": {
                    "kernel": _j(np.concatenate([q, k, v], axis=1), dt),
                    "bias": _j(np.concatenate([qb, kb, vb]), dt),
                },
                "norm_q": _affine(sd, f"{pre}.attn1.norm_q", dt),
                "norm_k": _affine(sd, f"{pre}.attn1.norm_k", dt),
                "to_out": _linear(sd, f"{pre}.attn1.to_out.0", dt),
            }
            ff_tree = {
                "net_0": _linear(sd, f"{pre}.ff.net.0.proj", dt),
                "net_2": _linear(sd, f"{pre}.ff.net.2", dt),
            }
        norm1_tree = {
            "linear": _linear(sd, f"{pre}.norm1.linear", dt),
            "norm": _affine(sd, f"{pre}.norm1.norm", dt),
        }
        norm2_tree = {
            "linear": _linear(sd, f"{pre}.norm2.linear", dt),
            "norm": _affine(sd, f"{pre}.norm2.norm", dt),
        }
        # pre-merge modulation weights for the disentangled-adaLN switch
        # (stashed by S2VPipeline.from_pretrained before the LoRA merge)
        if f"{pre}.norm1.base_linear.weight" in sd:
            norm1_tree["base_linear"] = _linear(sd, f"{pre}.norm1.base_linear", dt)
            norm2_tree["base_linear"] = _linear(sd, f"{pre}.norm2.base_linear", dt)
        blocks.append(
            {"norm1": norm1_tree, "attn": attn_tree, "norm2": norm2_tree, "ff": ff_tree}
        )
    blocks = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *blocks)

    host_tree = {
        "patch_embed": {
            "proj": {"kernel": _j(proj_kernel, dt), "bias": _j(sd["patch_embed.proj.bias"], dt)},
            "text_proj": _linear(sd, "patch_embed.text_proj", dt),
        },
        "time_embedding": {
            "linear_1": _linear(sd, "time_embedding.linear_1", dt),
            "linear_2": _linear(sd, "time_embedding.linear_2", dt),
        },
        "blocks": blocks,
        "norm_final": _affine(sd, "norm_final", dt),
        "norm_out": {
            "linear": _linear(sd, "norm_out.linear", dt),
            "norm": _affine(sd, "norm_out.norm", dt),
        },
        "proj_out": _linear(sd, "proj_out", dt),
    }
    return _to_device(host_tree) if device else host_tree


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def _conv3d(sd, prefix, dtype):
    """torch Conv3d [Co, Ci, kt, kh, kw] -> DHWIO [kt, kh, kw, Ci, Co]."""
    w = np.asarray(sd[prefix + ".weight"], dtype=np.float32)
    return {"kernel": _j(w.transpose(2, 3, 4, 1, 0), dtype), "bias": _j(sd[prefix + ".bias"], dtype)}


def _conv2d(sd, prefix, dtype):
    """torch Conv2d [Co, Ci, kh, kw] -> HWIO."""
    w = np.asarray(sd[prefix + ".weight"], dtype=np.float32)
    return {"kernel": _j(w.transpose(2, 3, 1, 0), dtype), "bias": _j(sd[prefix + ".bias"], dtype)}


def _spatial_norm(sd, prefix, dtype):
    return {
        "norm": _affine(sd, prefix + ".norm_layer", dtype),
        "conv_y": _conv3d(sd, prefix + ".conv_y.conv", dtype),
        "conv_b": _conv3d(sd, prefix + ".conv_b.conv", dtype),
    }


def _resnet(sd, prefix, dtype, spatial: bool):
    p = {
        "conv1": _conv3d(sd, prefix + ".conv1.conv", dtype),
        "conv2": _conv3d(sd, prefix + ".conv2.conv", dtype),
    }
    if spatial:
        p["norm1"] = _spatial_norm(sd, prefix + ".norm1", dtype)
        p["norm2"] = _spatial_norm(sd, prefix + ".norm2", dtype)
    else:
        p["norm1"] = _affine(sd, prefix + ".norm1", dtype)
        p["norm2"] = _affine(sd, prefix + ".norm2", dtype)
    if prefix + ".conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv3d(sd, prefix + ".conv_shortcut", dtype)
    return p


def convert_vae_state_dict(sd: Dict[str, np.ndarray], cfg: VAEConfig):
    dt = cfg.param_dtype
    n_blocks = len(cfg.block_out_channels)

    enc = {
        "conv_in": _conv3d(sd, "encoder.conv_in.conv", dt),
        "down_blocks": [],
        "mid_block": {
            "resnets": [
                _resnet(sd, f"encoder.mid_block.resnets.{j}", dt, spatial=False) for j in range(2)
            ]
        },
        "norm_out": _affine(sd, "encoder.norm_out", dt),
        "conv_out": _conv3d(sd, "encoder.conv_out.conv", dt),
    }
    for i in range(n_blocks):
        block = {
            "resnets": [
                _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", dt, spatial=False)
                for j in range(cfg.layers_per_block)
            ]
        }
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            block["downsampler"] = {"conv": _conv2d(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", dt)}
        enc["down_blocks"].append(block)

    dec = {
        "conv_in": _conv3d(sd, "decoder.conv_in.conv", dt),
        "mid_block": {
            "resnets": [
                _resnet(sd, f"decoder.mid_block.resnets.{j}", dt, spatial=True) for j in range(2)
            ]
        },
        "up_blocks": [],
        "norm_out": _spatial_norm(sd, "decoder.norm_out", dt),
        "conv_out": _conv3d(sd, "decoder.conv_out.conv", dt),
    }
    for i in range(n_blocks):
        block = {
            "resnets": [
                _resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", dt, spatial=True)
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            block["upsampler"] = {"conv": _conv2d(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", dt)}
        dec["up_blocks"].append(block)

    return _to_device({"encoder": enc, "decoder": dec})


# ---------------------------------------------------------------------------
# T5
# ---------------------------------------------------------------------------


def convert_t5_state_dict(sd: Dict[str, np.ndarray], cfg: T5Config):
    dt = cfg.param_dtype
    blocks = []
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}"
        blocks.append(
            {
                "ln1": {"weight": _j(sd[f"{pre}.layer.0.layer_norm.weight"], dt)},
                "attn": {
                    "q": _linear(sd, f"{pre}.layer.0.SelfAttention.q", dt, bias=False),
                    "k": _linear(sd, f"{pre}.layer.0.SelfAttention.k", dt, bias=False),
                    "v": _linear(sd, f"{pre}.layer.0.SelfAttention.v", dt, bias=False),
                    "o": _linear(sd, f"{pre}.layer.0.SelfAttention.o", dt, bias=False),
                },
                "ln2": {"weight": _j(sd[f"{pre}.layer.1.layer_norm.weight"], dt)},
                "mlp": {
                    "wi_0": _linear(sd, f"{pre}.layer.1.DenseReluDense.wi_0", dt, bias=False),
                    "wi_1": _linear(sd, f"{pre}.layer.1.DenseReluDense.wi_1", dt, bias=False),
                    "wo": _linear(sd, f"{pre}.layer.1.DenseReluDense.wo", dt, bias=False),
                },
            }
        )
    blocks = jax.tree.map(lambda *xs: np.stack(xs), *blocks)
    emb_key = "shared.weight" if "shared.weight" in sd else "encoder.embed_tokens.weight"
    return _to_device({
        "embedding": _j(sd[emb_key], dt),
        "relative_attention_bias": _j(
            sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"], dt
        ),
        "blocks": blocks,
        "final_ln": {"weight": _j(sd["encoder.final_layer_norm.weight"], dt)},
    })
