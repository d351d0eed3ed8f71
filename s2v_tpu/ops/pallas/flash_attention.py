"""Fused flash attention for TPU (Pallas/Mosaic).

The reference's hottest op is one ``F.scaled_dot_product_attention`` over
the full 19,126-token ``[text | ref | video]`` sequence, 2x48 heads x 42
layers x 50 steps (attention_processor.py:2083).  A naive XLA dot-product
attention materialises the ``[B, H, S, S]`` logits (~70 GB bf16 at full
resolution) — impossible on one chip; this kernel streams K/V blocks
through VMEM with the online-softmax recurrence so memory is O(S * d) and
the MXU stays busy on the two block matmuls.

Design notes (pallas_guide.md):
  * grid ``(batch*heads, q_blocks, k_blocks)`` with the k axis innermost;
    the output block for (bh, qi) is revisited across k steps and the
    softmax state (m, l, acc) lives in VMEM scratch;
  * fp32 softmax state and accumulation (fp32-tolerance bar, SURVEY.md §7);
  * sequences are padded to the block size; padded *keys* are masked with a
    large negative logit, padded *query* rows are sliced off on the host
    side — no NaNs because the mask value is finite;
  * RoPE is applied by the caller (it is a cheap fused elementwise op and
    keeping it outside lets the same kernel serve RoPE-free models).
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


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scratch, l_scratch, acc_scratch,
    *, block_k: int, seq_len: int, scale: float,
):
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    v = v_ref[0]  # [bk, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale  # [bq, bk] fp32

    # mask out-of-range key positions (finite mask value: no NaN rows).
    # The final k block may read past seq_len: those s entries are replaced
    # wholesale here, and the matching v rows are zeroed below so garbage
    # (potentially NaN bit patterns) cannot leak through 0 * v.
    k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(k_pos < seq_len, s, NEG_INF)
    v_row = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (v.shape[0], 1), 0)
    v = jnp.where(v_row < seq_len, v, jnp.zeros_like(v))

    m_prev = m_scratch[:, :1]  # [bq, 1]
    l_prev = l_scratch[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
    m_next = jnp.maximum(m_prev, m_cur)

    alpha = jnp.exp(m_prev - m_next)  # [bq, 1]
    p = jnp.exp(s - m_next)  # [bq, bk]
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    acc = acc_scratch[:] * alpha
    acc = acc + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_scratch[:] = acc
    m_scratch[:] = jnp.broadcast_to(m_next, m_scratch.shape)
    l_scratch[:] = jnp.broadcast_to(l_next, l_scratch.shape)

    @pl.when(ki == n_k - 1)
    def _finalize():
        l = l_scratch[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)  # fully-masked (padded-query) rows
        o_ref[0] = (acc_scratch[:] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "scale", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 1024,  # swept on v5e at S=19126, d=64: (1024, 1024) best
    block_k: int = 1024,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full (non-causal) self attention.

    q/k/v: ``[B, S, H, d]`` (the layout the transformer produces);
    returns ``[B, S, H, d]``.  Matches ``jax.nn.dot_product_attention`` /
    torch SDPA semantics with the default ``1/sqrt(d)`` scale.

    Internal layout is ``[B*H, S, d]`` (TPU block tiling requires the last
    two block dims be (8k, 128k)-aligned or full, which rules out blocking a
    unit head axis); the relayout transposes are ~1 ms of HBM traffic per
    layer vs ~170 ms of attention compute at full geometry.  The
    non-divisible sequence tail needs no padding copies: Pallas clips
    out-of-range query-block writes and the kernel masks out-of-range keys
    (finite logit) and zeroes their v rows.
    """
    b, s, h, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    n_q = pl.cdiv(s, block_q)
    n_k = pl.cdiv(s, block_k)

    kernel = functools.partial(_flash_kernel, block_k=block_k, seq_len=s, scale=scale)
    grid = (b * h, n_q, n_k)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # m
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # l
            pltpu.VMEM((block_q, d), jnp.float32),  # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qb, kb, vb)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)
