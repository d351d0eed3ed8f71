"""Sinusoidal timestep embeddings + conditioning MLP.

Parity targets: reference embeddings.py:27-79 (``get_timestep_embedding``
with flip_sin_to_cos=True, downscale_freq_shift=0) and embeddings.py:831-876
(``TimestepEmbedding`` linear-silu-linear).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """``[N] -> [N, embedding_dim]`` fp32 sinusoid (cos|sin when flipped)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def init_timestep_mlp(key, in_dim: int, time_embed_dim: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    s1 = 1.0 / jnp.sqrt(in_dim)
    s2 = 1.0 / jnp.sqrt(time_embed_dim)
    return {
        "linear_1": {
            "kernel": jax.random.uniform(k1, (in_dim, time_embed_dim), dtype, -s1, s1),
            "bias": jnp.zeros((time_embed_dim,), dtype),
        },
        "linear_2": {
            "kernel": jax.random.uniform(k2, (time_embed_dim, time_embed_dim), dtype, -s2, s2),
            "bias": jnp.zeros((time_embed_dim,), dtype),
        },
    }


def timestep_embedding_mlp(params, sample: jnp.ndarray) -> jnp.ndarray:
    """linear -> silu -> linear (reference TimestepEmbedding.forward)."""
    x = sample @ params["linear_1"]["kernel"] + params["linear_1"]["bias"]
    x = jax.nn.silu(x)
    x = x @ params["linear_2"]["kernel"] + params["linear_2"]["bias"]
    return x
