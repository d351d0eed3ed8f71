"""Normalization primitives — all statistics in fp32 regardless of input dtype.

bf16 LayerNorm statistics are the classic parity-killer across 42 blocks x 50
steps (SURVEY.md §7 hard-part 1), so every norm computes mean/var in fp32.
The elementwise APPLY, however, runs in the input dtype: an fp32 apply chain
keeps stream-sized fp32 tensors live during the rematted train backward —
measured f32[1,19126,3072] x 9 (~2 GB) per layer-transpose in the flagship
QLoRA compile report — for at most ~2 extra bf16 roundings per output
element (the statistics, where bf16 is catastrophic, stay fp32; for fp32
inputs the casts are no-ops and the math is unchanged).
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x, weight=None, bias=None, eps: float = 1e-5):
    """LayerNorm over the last axis; fp32 stats, input-dtype apply."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    # the centered fp32 stream (xf - mean) has a single consumer here (the
    # reduce), so it fuses into the variance pass without materializing
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jnp.reciprocal(jnp.sqrt(var + eps))
    out = (x - mean.astype(dt)) * rstd.astype(dt)
    if weight is not None:
        out = out * weight.astype(dt)
    if bias is not None:
        out = out + bias.astype(dt)
    return out


def rms_norm(x, weight, eps: float = 1e-6):
    """T5-style RMSNorm (no mean subtraction); fp32 stats."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    out = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (out * weight.astype(jnp.float32)).astype(orig_dtype)


def group_norm(x, weight, bias, num_groups: int, eps: float = 1e-6):
    """GroupNorm for channels-last video tensors ``[B, T, H, W, C]``.

    Statistics are computed per (batch, group) over (T, H, W, C/g) —
    matching torch ``nn.GroupNorm`` on ``[B, C, T, H, W]`` (reference VAE
    norms; temporal extent is whatever chunk is being streamed, identical to
    the reference's chunked semantics).
    """
    orig_dtype = x.dtype
    b, *spatial, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(b, -1, g, c // g)  # [B, THW, G, C/g]
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    out = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    out = out.reshape(b, *spatial, c)
    out = out * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
