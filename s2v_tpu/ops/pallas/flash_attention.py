"""Fused flash attention for TPU (Pallas/Mosaic).

The reference's hottest op is one ``F.scaled_dot_product_attention`` over
the full 19,126-token ``[text | ref | video]`` sequence, 2x48 heads x 42
layers x 50 steps (attention_processor.py:2083).  A naive XLA dot-product
attention materialises the ``[B, H, S, S]`` logits (~70 GB bf16 at full
resolution) — impossible on one chip; this kernel streams K/V blocks
through VMEM with the online-softmax recurrence so memory is O(S * d) and
the MXU stays busy on the two block matmuls.

Performance design (all measured on v5e at S=19126, d=64; timed by
chaining async dispatches with ONE host fetch at the end — a per-call
scalar fetch through the axon relay adds ~27 ms and understated earlier
numbers):
  * grid ``(batch*heads, q_blocks, k_blocks)`` with the k axis innermost;
    the (bh, qi) output block is revisited across k steps and the softmax
    state lives in VMEM scratch; block sizes swept -> (1024, 2048):
    62.1/121.5 ms at B=1/2 incl. host-side relayout = 73.7/75.3 TF/s
    effective (the d=64 contraction caps the MXU at ~98 TF/s);
  * K is fed **pre-transposed** ``[d, S]`` — the plain (1,0)-contraction
    matmul hits a better MXU path than contracting two row-major operands
    (+9%);
  * the kernel is VPU-bound at the margin (exp overlaps the MXU; masks and
    reductions do not), so per-step elementwise work is folded into the
    matmuls, which are free in the d<128 padding head-room:
      - the softmax scale is folded into q on the host side;
      - the ragged-tail key mask is an extra *feature row*: q gains a
        constant -1e30 column and K^T a pad-indicator row, so padded keys
        get their -1e30 logits from the MXU, not a per-step iota/where;
      - the l-sum is an extra *ones column* of V: ``p @ v_aug`` accumulates
        sum(p) in the last accumulator column, removing the row-sum
        reduction (and the separate l scratch).
  * fp32 softmax state and accumulation (fp32-tolerance bar, SURVEY.md §7);
  * padded V rows are zeroed on the host, padded *query* rows produce
    garbage that Pallas clips on the output write;
  * RoPE is applied by the caller (cheap fused elementwise; keeps the same
    kernel serving RoPE-free models).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANES = 128


def _flash_kernel(q_ref, kt_ref, v_ref, o_ref, *rest):
    # pallas passes refs as (inputs..., outputs..., scratch...): with the
    # training variant the lse output ref precedes the scratch refs
    if len(rest) == 3:
        lse_ref, m_scratch, acc_scratch = rest
    else:
        lse_ref = None
        m_scratch, acc_scratch = rest
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # [bq, d+1]: pre-scaled q | constant -1e30 mask column
    kt = kt_ref[0]  # [d+1, bk]: K^T | pad-indicator row
    v = v_ref[0]  # [bk, d+1]: V (padded rows zeroed) | ones column

    # masked logits straight from the MXU: s = q·k - 1e30 * is_pad(key)
    s = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk] fp32

    m_prev = m_scratch[:, :1]  # [bq, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)

    alpha = jnp.exp(m_prev - m_next)  # [bq, 1]
    p = jnp.exp(s - m_next)  # [bq, bk]

    # acc's last column accumulates l = sum(p) via v's ones column
    acc = acc_scratch[:] * alpha
    acc = acc + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_scratch[:] = acc
    m_scratch[:] = jnp.broadcast_to(m_next, m_scratch.shape)

    @pl.when(ki == n_k - 1)
    def _finalize():
        l = acc_scratch[:, -1:]
        l = jnp.where(l == 0.0, 1.0, l)  # fully-masked (padded-query) rows
        o_ref[0] = (acc_scratch[:, :-1] / l).astype(o_ref.dtype)
        if lse_ref is not None:
            # log-sum-exp per row (training residual for the backward pass)
            lse_ref[0] = m_scratch[:, :1] + jnp.log(l)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "scale", "interpret", "return_lse")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 1024,  # swept on v5e at S=19126, d=64 (73.7 TF/s eff
    block_k: int = 2048,  # incl. relayout; larger combos exceed VMEM)
    scale: Optional[float] = None,
    interpret: bool = False,
    return_lse: bool = False,
    key_pad_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full (non-causal) self attention.

    q: ``[B, Sq, H, d]``; k/v: ``[B, Skv, H, d]`` (Skv may differ — e.g.
    the windowed path's text/ref queries over the full sequence); returns
    ``[B, Sq, H, d]``.  Matches ``jax.nn.dot_product_attention`` / torch
    SDPA semantics with the default ``1/sqrt(d)`` scale.

    ``key_pad_mask``: optional ``[Skv]`` bool/0-1 vector, True on keys to
    exclude (e.g. ring-padding on a sequence-parallel shard).  It rides the
    existing pad-indicator feature row, so masking costs zero extra VPU
    work — the MXU emits the -1e30 logits.  Masked keys' V rows are also
    zeroed (the l-sum ones column must not count them).

    Internal layout is ``[B*H, S, d]`` (TPU block tiling requires the last
    two block dims be (8k, 128k)-aligned or full, which rules out blocking a
    unit head axis); the relayout transposes are ~1 ms of HBM traffic per
    layer vs ~140 ms of attention compute at full geometry.
    """
    b, s, h, d = q.shape
    s_kv = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    s_pad = int(pl.cdiv(s_kv, block_k)) * block_k
    n_q = pl.cdiv(s, block_q)
    n_k = s_pad // block_k

    # q_aug: scaled q | -1e30 column (pairs with kt's pad-indicator row)
    qb = q.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    qb = qb * jnp.asarray(scale, q.dtype)
    q_aug = jnp.concatenate(
        [qb, jnp.full((b * h, s, 1), NEG_INF, q.dtype)], axis=-1
    )  # [BH, S, d+1]

    # kt_aug: K^T zero-padded to s_pad | indicator row (1 on padded keys)
    ktb = k.transpose(0, 2, 3, 1).reshape(b * h, d, s_kv)
    ktb = jnp.pad(ktb, ((0, 0), (0, 0), (0, s_pad - s_kv)))
    indicator = jnp.zeros((1, 1, s_pad), k.dtype).at[:, :, s_kv:].set(1.0)
    valid = None
    if key_pad_mask is not None:
        valid = 1.0 - key_pad_mask.astype(jnp.float32)  # [s_kv], 1 on real keys
        indicator = indicator.at[:, :, :s_kv].set(
            key_pad_mask.astype(k.dtype)[None, None, :]
        )
    kt_aug = jnp.concatenate(
        [ktb, jnp.broadcast_to(indicator, (b * h, 1, s_pad))], axis=1
    )  # [BH, d+1, s_pad]

    # v_aug: V zero-padded | ones column (accumulates l)
    vb = v.transpose(0, 2, 1, 3).reshape(b * h, s_kv, d)
    if valid is not None:
        vb = vb * valid[None, :, None].astype(v.dtype)
    vb = jnp.pad(vb, ((0, 0), (0, s_pad - s_kv), (0, 0)))
    ones_col = jnp.zeros((s_pad,), v.dtype).at[:s_kv].set(1.0)
    if valid is not None:
        ones_col = ones_col.at[:s_kv].set(valid.astype(v.dtype))
    ones = jnp.broadcast_to(ones_col[None, :, None], (b * h, s_pad, 1))
    v_aug = jnp.concatenate([vb, ones], axis=-1)  # [BH, s_pad, d+1]

    out_specs = pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0))
    out_shape = jax.ShapeDtypeStruct((b * h, s, d), q.dtype)
    if return_lse:
        out_specs = [
            out_specs,
            pl.BlockSpec((1, block_q, 1), lambda bh, qi, ki: (bh, qi, 0)),
        ]
        out_shape = [out_shape, jax.ShapeDtypeStruct((b * h, s, 1), jnp.float32)]

    out = pl.pallas_call(
        _flash_kernel,
        grid=(b * h, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d + 1), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, d + 1, block_k), lambda bh, qi, ki: (bh, 0, ki)),
            pl.BlockSpec((1, block_k, d + 1), lambda bh, qi, ki: (bh, ki, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # m
            pltpu.VMEM((block_q, d + 1), jnp.float32),  # acc | l
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_aug, kt_aug, v_aug)
    if return_lse:
        o, lse = out
        return (
            o.reshape(b, h, s, d).transpose(0, 2, 1, 3),
            lse[..., 0].reshape(b, h, s),  # [B, H, S]
        )
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)
