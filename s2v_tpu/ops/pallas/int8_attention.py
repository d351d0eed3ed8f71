"""Flash attention with int8 QK^T — the int8-serving counterpart of
ops/pallas/flash_attention.py.

The exact kernel's QK^T matmul contracts over d=64, which pads to 128 on
the MXU and caps bf16 attention at ~98 TF/s; the v5e MXU runs int8 at
twice the bf16 rate, so quantizing ONLY the logits matmul roughly halves
the QK cost: measured 58.8 ms vs 62.1 ms per layer at the 5b geometry.  P·V stays bf16 (quantizing the probabilities is
where int8 attention schemes lose accuracy).

Quantization: per-tensor symmetric int8.  q and k pass through the
qk-LayerNorm (and norm-preserving RoPE) immediately before attention, so
their per-token ranges are uniform and a single scale per tensor loses
almost nothing vs per-token scales — and it keeps the kernel's dequant to
ONE fused convert-multiply:

    s_ij = (q_i8 · k_i8) * (qs * ks)          (int32 MXU accum, scalar dequant)

(a per-token rank-1 dequant was measured to cost ~11 ms/layer of VPU work
— exactly the MXU saving — so the scalar form is what makes int8 pay.)
Padded keys are masked by an additive -1e30 row routed through the
index_map: interior k steps read an all-zero row, only the ragged last
block reads the real tail mask, and the add fuses into the dequant pass
(~1.5 ms/layer).  A fully maskless variant (zero K columns -> logit 0,
cancelled by the shift-invariant online softmax) measured 57.3 ms but was
rejected: when every REAL logit in a row is <= ~-40 the pad logit pins
the running max at 0 and the real probabilities underflow fp32 —
mathematically cancelled, numerically wrong (confirmed by repro).

Opt-in (`attention_backend="pallas_int8"`), intended to pair with the int8
linears of ops/quant for full int8 serving.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from s2v_tpu.ops.pallas.flash_attention import NEG_INF, _LANES


def _int8_kernel(dq_ref, q_ref, kt_ref, mask_ref, v_ref, o_ref,
                 m_scratch, acc_scratch):
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # int8 [bq, d]
    kt = kt_ref[0]  # int8 [d, bk]
    s_i32 = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    # scalar dequant (qs * ks, SMEM) + the mask row the index_map routed
    # here (all-zero on interior steps, -1e30 tail on padded keys) — one
    # fused VPU pass
    s = s_i32.astype(jnp.float32) * dq_ref[0, 0] + mask_ref[0]

    m_prev = m_scratch[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)

    v = v_ref[0]  # bf16 [bk, d+1] (ones column accumulates l)
    acc = acc_scratch[:] * alpha
    acc = acc + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_scratch[:] = acc
    m_scratch[:] = jnp.broadcast_to(m_next, m_scratch.shape)

    @pl.when(ki == n_k - 1)
    def _finalize():
        l = acc_scratch[:, -1:]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:, :-1] / l).astype(o_ref.dtype)


def _quantize_tensor(x: jnp.ndarray):
    """-> (int8 values, fp32 scalar scale)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "scale", "interpret")
)
def flash_attention_qk_int8(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 1024,
    block_k: int = 2048,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full (non-causal) attention with int8 QK^T; same contract as
    :func:`s2v_tpu.ops.pallas.flash_attention.flash_attention`."""
    b, s, h, d = q.shape
    s_kv = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    s_pad = int(pl.cdiv(s_kv, block_k)) * block_k
    n_q = pl.cdiv(s, block_q)
    n_k = s_pad // block_k
    bh = b * h

    def fold(x, s_x):
        return x.transpose(0, 2, 1, 3).reshape(bh, s_x, d)

    q_i8, qs = _quantize_tensor(fold(q, s) * jnp.asarray(scale, jnp.float32))
    k_i8, ks = _quantize_tensor(fold(k, s_kv))
    dequant = (qs * ks).reshape(1, 1)  # scalar, SMEM-resident
    kt_i8 = jnp.pad(k_i8.transpose(0, 2, 1), ((0, 0), (0, 0), (0, s_pad - s_kv)))
    # mask rows: row 0 all-zero (interior k steps), row 1 the ragged tail
    mask_rows = jnp.zeros((2, 1, block_k), jnp.float32).at[
        1, :, max(0, s_kv - (n_k - 1) * block_k):].set(NEG_INF)

    vb = jnp.pad(fold(v, s_kv), ((0, 0), (0, s_pad - s_kv), (0, 0)))
    ones = jnp.zeros((bh, s_pad, 1), v.dtype).at[:, :s_kv].set(1.0)
    v_aug = jnp.concatenate([vb, ones], axis=-1)

    out = pl.pallas_call(
        _int8_kernel,
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bh, qi, ki: (0, 0), memory_space=pltpu.SMEM),  # dequant
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),  # q_i8
            pl.BlockSpec((1, d, block_k), lambda bh, qi, ki: (bh, 0, ki)),  # kt_i8
            pl.BlockSpec(
                (1, 1, block_k),
                lambda bh, qi, ki: (jnp.where(ki == pl.num_programs(2) - 1, 1, 0), 0, 0),
            ),  # mask row (zeros | ragged tail)
            pl.BlockSpec((1, block_k, d + 1), lambda bh, qi, ki: (bh, ki, 0)),  # v_aug
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # m
            pltpu.VMEM((block_q, d + 1), jnp.float32),  # acc | l
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(dequant, q_i8, kt_i8, mask_rows, v_aug)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)
