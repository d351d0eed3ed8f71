"""T5 v1.1 encoder in JAX (the CogVideoX text encoder).

The reference reaches T5-XXL through HuggingFace ``transformers``
(src/inference.py:185-189, pipeline_cogvideox.py:197-237); here it is a
first-class JAX model: embedding -> N pre-RMSNorm blocks (self-attention
with shared relative-position bias from layer 0, gated-GELU MLP) -> final
RMSNorm.  No dropout (inference), bf16 weights with fp32 norm statistics.

Vocab-resize semantics (reference src/inference.py:182-189): the ``<cls>``
special token gets id 32100, which is *within* the checkpoint's padded
32128-row embedding, so ``resize_token_embeddings`` keeps the pretrained row
— our loader simply keeps the full 32128-row table and the new token indexes
into it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from s2v_tpu.config import T5Config
from s2v_tpu.ops.norms import rms_norm


def relative_position_bucket(
    relative_position: np.ndarray, num_buckets: int = 32, max_distance: int = 128
) -> np.ndarray:
    """Bidirectional T5 bucket mapping (standard T5 formula)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_if_large)


def build_position_bias_index(seq_len: int, cfg: T5Config) -> np.ndarray:
    """[S, S] bucket ids, host-precomputed (static per sequence length)."""
    ctx = np.arange(seq_len)[:, None]
    mem = np.arange(seq_len)[None, :]
    rel = mem - ctx
    return relative_position_bucket(
        rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
    )


def t5_self_attention(params, x, bias, num_heads: int):
    """T5 attention: no scaling (folded into weights), additive position bias.

    ``bias``: [H, S, S] fp32.
    """
    b, s, d = x.shape
    inner = params["q"]["kernel"].shape[-1]
    head_dim = inner // num_heads
    q = (x @ params["q"]["kernel"]).reshape(b, s, num_heads, head_dim)
    k = (x @ params["k"]["kernel"]).reshape(b, s, num_heads, head_dim)
    v = (x @ params["v"]["kernel"]).reshape(b, s, num_heads, head_dim)
    # T5 uses unscaled dot product
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    logits = logits + bias[None]
    weights = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, s, inner)
    return out @ params["o"]["kernel"]


def t5_mlp(params, x):
    """Gated-GELU MLP (T5 v1.1): gelu(x@wi_0) * (x@wi_1) @ wo."""
    h = jax.nn.gelu(x @ params["wi_0"]["kernel"], approximate=True) * (x @ params["wi_1"]["kernel"])
    return h @ params["wo"]["kernel"]


def t5_encode(params, cfg: T5Config, input_ids: jnp.ndarray, bias_index: Optional[np.ndarray] = None):
    """``[B, S] int32 -> [B, S, d_model]`` final hidden states.

    ``bias_index``: static [S, S] bucket table (host-precomputed via
    :func:`build_position_bias_index`; computed on the fly if omitted).
    """
    s = input_ids.shape[1]
    if bias_index is None:
        bias_index = build_position_bias_index(s, cfg)
    # shared relative-attention bias lives on block 0: [num_buckets, H]
    rel_bias_table = params["relative_attention_bias"]
    bias = rel_bias_table[jnp.asarray(bias_index)]  # [S, S, H]
    bias = jnp.transpose(bias, (2, 0, 1)).astype(jnp.float32)  # [H, S, S]

    x = params["embedding"][input_ids].astype(cfg.dtype)

    def block(x, layer):
        h = rms_norm(x, layer["ln1"]["weight"], cfg.layer_norm_epsilon)
        x = x + t5_self_attention(layer["attn"], h, bias, cfg.num_heads)
        h = rms_norm(x, layer["ln2"]["weight"], cfg.layer_norm_epsilon)
        x = x + t5_mlp(layer["mlp"], h)
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    return rms_norm(x, params["final_ln"]["weight"], cfg.layer_norm_epsilon)


def init_t5_params(key, cfg: T5Config):
    dtype = cfg.param_dtype
    keys = iter(jax.random.split(key, 8 + cfg.num_layers * 8))

    def lin(in_d, out_d, scale=None):
        s = scale or (1.0 / np.sqrt(in_d))
        return {"kernel": jax.random.normal(next(keys), (in_d, out_d), dtype) * s}

    inner = cfg.num_heads * cfg.d_kv
    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append(
            {
                "ln1": {"weight": jnp.ones((cfg.d_model,), dtype)},
                "attn": {
                    "q": lin(cfg.d_model, inner),
                    "k": lin(cfg.d_model, inner),
                    "v": lin(cfg.d_model, inner),
                    "o": lin(inner, cfg.d_model),
                },
                "ln2": {"weight": jnp.ones((cfg.d_model,), dtype)},
                "mlp": {
                    "wi_0": lin(cfg.d_model, cfg.d_ff),
                    "wi_1": lin(cfg.d_model, cfg.d_ff),
                    "wo": lin(cfg.d_ff, cfg.d_model),
                },
            }
        )
    blocks = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "embedding": jax.random.normal(next(keys), (cfg.vocab_size, cfg.d_model), dtype),
        "relative_attention_bias": jax.random.normal(
            next(keys), (cfg.relative_attention_num_buckets, cfg.num_heads), dtype
        )
        * 0.1,
        "blocks": blocks,
        "final_ln": {"weight": jnp.ones((cfg.d_model,), dtype)},
    }
