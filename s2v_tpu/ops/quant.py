"""Weight + dynamic-activation int8 quantization for the DiT linears.

Opt-in production fast path (no reference equivalent — the reference runs
bf16/fp16 end to end): the v5e MXU executes int8 x int8 at ~2x the bf16
rate, so the transformer's large projections (qkv, attention out, both FF
linears — ~96% of linear FLOPs) can run int8 with per-output-channel weight
scales and per-token dynamic activation scales.  AdaLN modulation, patch
embed, and output head stay bf16 (negligible FLOPs, disproportionate
quality impact).

Enable via ``quantize_transformer_params(params)`` +
``transformer_forward(..)`` — the dense helper dispatches on the param
format, so quantized and bf16 trees flow through the same model code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight_int8(kernel: jnp.ndarray):
    """[..., in, out] -> {"q": int8, "scale": f32[..., 1, out]} symmetric
    per-output-channel."""
    k32 = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(k32), axis=-2, keepdims=True) / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(k32 / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


@jax.custom_vjp
def _int8_mm(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray):
    """``x @ dequant(q, scale)`` via the int8 MXU path (dynamic per-token
    activation quantization, int32 accumulation); input and output stay in
    ``x.dtype``.

    custom_vjp because ``round`` has a zero gradient: as written the chain
    rule would silently kill every gradient flowing THROUGH an int8 layer
    (QLoRA training adapts layers both above and below frozen int8
    linears).  The backward treats the op as the linear map it approximates
    — ``dx = g @ (q * scale)^T`` — the exact gradient of the dequantized
    linear (straight-through on the activation quantizer).  q/scale are
    frozen buffers; their zero cotangents are DCE'd by XLA.

    The custom_vjp boundary deliberately carries ``x.dtype`` (bf16 on the
    product path) in BOTH directions: an fp32 signature here materializes
    stream-sized fp32 temps per int8 dense in the rematted backward —
    measured +~2 GB at the flagship train geometry (f32[1,19126,3072] x 9
    in the L=42 QLoRA compile report) — while interior fp32 math fuses
    into the surrounding passes."""
    return _int8_mm_impl(x, q, scale)


def _int8_mm_impl(x, q, scale):
    # the row max is computed on x directly (bf16 comparisons are exact),
    # and the f32 upcast of x has exactly ONE consumer (the quantize
    # chain) — a shared f32 view of the stream materializes 224 MB temps
    # per int8 dense in the rematted train backward (L=42 QLoRA report)
    x_scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    x_scale = jnp.where(x_scale == 0, 1.0, x_scale)
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / x_scale), -127, 127
    ).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, q,
        (((xq.ndim - 1,), (q.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * x_scale * scale.reshape((1,) * (y.ndim - 1) + (-1,))
    return y.astype(x.dtype)


def _int8_mm_fwd(x, q, scale):
    # the zero-size proto array carries x.dtype to the backward
    return _int8_mm_impl(x, q, scale), (q, scale, jnp.zeros((0,), x.dtype))


def _int8_mm_bwd(res, g):
    q, scale, proto = res
    # dx = (g * w_scale) @ q^T — int8 weights are exact in bf16 (|q| <= 127).
    # The g*scale product runs in g's dtype (bf16 on the product path; the
    # scale rounds to bf16, a ~0.4% relative grad perturbation): an f32
    # intermediate here materializes stream-sized temps in the rematted
    # backward (measured f32[1,19126,3072] copies in the L=42 report).
    gs = g * scale.reshape((1,) * (g.ndim - 1) + (-1,)).astype(g.dtype)
    dx = jax.lax.dot_general(
        gs.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
        (((g.ndim - 1,), (q.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dx.astype(proto.dtype), jnp.zeros_like(q), jnp.zeros_like(scale)


_int8_mm.defvjp(_int8_mm_fwd, _int8_mm_bwd)


def int8_dense(x: jnp.ndarray, wq: dict, bias=None):
    """Dynamic per-token int8 matmul: quantize x rows, int8 MXU contraction
    with int32 accumulation, rescale by (x_scale * w_scale).
    Differentiable w.r.t. ``x`` (see :func:`_int8_mm`)."""
    y = _int8_mm(x, wq["q"], wq["scale"])
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def dense(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Format-dispatching dense layer: bf16 {"kernel","bias"} or int8
    {"q","scale","bias"}.

    An optional ``"lora"`` entry — a tuple of fp32 ``(a [in,r], b [r,out])``
    factor pairs, the alpha/r scale pre-folded into ``a`` — is applied
    output-additively: ``y += (x @ a) @ b``.  int8 kernels cannot absorb a
    LoRA delta by merging (the sum isn't int8); bf16 kernels take the same
    path because a per-layer ``W + a@b`` merge makes the stacked kernel a
    second consumer with a different preferred layout — XLA then inserts a
    full relayout copy of the [42, 3072, 9216] qkv stack (2.21 GB of HBM
    temp, the round-5 flagship-serving OOM).  Output-additive touches the
    kernel exactly as the base program does (zero extra kernel traffic) at
    ~0.2 % extra FLOPs/step for rank 64.  Matmuls run in the input dtype."""
    if "q" in params:
        y = int8_dense(x, params, params.get("bias"))
    else:
        y = x @ params["kernel"]
        if "bias" in params:
            y = y + params["bias"]
    for a, b in params.get("lora", ()):
        h = x @ a.astype(x.dtype)
        y = y + (h @ b.astype(x.dtype)).astype(y.dtype)
    return y


def quantize_transformer_params(params: dict) -> dict:
    """Quantize the per-layer qkv / to_out / ff kernels of a transformer
    param tree (stacked [L, in, out] kernels supported); everything else is
    shared by reference."""
    out = dict(params)
    blocks = dict(params["blocks"])

    def q_leaf(leaf):
        qd = quantize_weight_int8(leaf["kernel"])
        qd["bias"] = leaf["bias"]
        return qd

    attn = dict(blocks["attn"])
    attn["qkv"] = q_leaf(blocks["attn"]["qkv"])
    attn["to_out"] = q_leaf(blocks["attn"]["to_out"])
    blocks["attn"] = attn
    ff = {"net_0": q_leaf(blocks["ff"]["net_0"]), "net_2": q_leaf(blocks["ff"]["net_2"])}
    blocks["ff"] = ff
    out["blocks"] = blocks
    return out
