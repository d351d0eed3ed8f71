"""Flash-attention backward pass for TPU (Pallas/Mosaic).

Training-path counterpart of flash_attention.py: the reference trains its
subject LoRA through torch SDPA's fused flash backward; the XLA fallback
here (chunked_attention's VJP) runs at ~14 TF/s on v5e because the
rematerialized fp32 probability blocks serialize against the matmuls.
These kernels recompute P blockwise from the saved log-sum-exp (no O(S^2)
residuals) and keep the MXU on the five block matmuls of the standard
flash backward:

  D  = rowsum(dO * O)                      (host-side XLA, fused)
  P  = exp(q_s K^T - LSE)                  (recomputed per block)
  dV = P^T dO
  dP = dO V^T
  dS = P * (dP - D)
  dQ = scale * (dS K);   dK = dS^T q_s     (q_s = scale * q)

Two kernels: dQ iterates key blocks per query block (grid k-innermost,
accumulator in VMEM), dK/dV iterates query blocks per key block.  The
ragged sequence tail is handled with explicit zero padding of q/dO/K/V and
+inf padding of LSE, so padded queries contribute P = 0 and padded keys
get the forward's -1e30 feature-row mask — no in-kernel masking at all.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
POS_INF = 1e30


def _dq_kernel(q_ref, kt_ref, vt_ref, k_ref, do_ref, lse_ref, d_ref, dq_ref, acc,
               *, stat_row=True):
    # stat_row: True -> lse/D blocks (1, 1, bq) from row-major [BH, 1, S]
    # arrays (8x sublane pad); False -> legacy column blocks (1, bq, 1),
    # kept for the banded grids whose per-frame width is not 128-aligned.
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    q = q_ref[0]  # [bq, d+1] scaled q | -1e30 column
    kt = kt_ref[0]  # [d+1, bk] K^T | pad-indicator row
    z = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]; padded keys at -1e30
    # in the row layout ([BH, 1, S]: a [.., S, 1] column operand would be
    # (8,128)-tile padded 128x in HBM — see flash_attention.py's lse note)
    # one [1,bq]->[bq,1] relayout per (qi, ki) step, then broadcast
    lse_b = lse_ref[0].T if stat_row else lse_ref[0]  # [bq, 1]
    d_b = d_ref[0].T if stat_row else d_ref[0]  # [bq, 1]
    p = jnp.exp(z - lse_b)

    do = do_ref[0]  # [bq, d]
    vt = vt_ref[0]  # [d, bk]
    dp = jax.lax.dot_general(
        do, vt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    ds = p * (dp - d_b)

    k = k_ref[0]  # [bk, d]
    acc[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == n_k - 1)
    def _finalize():
        dq_ref[0] = acc[:].astype(dq_ref.dtype)  # scale applied by caller


def _dkv_kernel(
    k_ref, v_ref, qt_ref, q_ref, dot_ref, do_ref, lse_ref, d_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
):
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k = k_ref[0]  # [bk, d]
    qt = qt_ref[0]  # [d, bq] scaled q^T
    zt = jax.lax.dot_general(
        k, qt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bk, bq]
    pt = jnp.exp(zt - lse_ref[0])  # lse row block [1, bq] broadcasts;
    # padded queries have lse=+inf -> pt=0, padded keys produce garbage
    # rows that the caller slices away

    do = do_ref[0]  # [bq, d]
    dv_acc[:] += jax.lax.dot_general(
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    v = v_ref[0]  # [bk, d]
    dot = dot_ref[0]  # [d, bq] dO^T
    dpt = jax.lax.dot_general(
        v, dot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bk, bq]
    dst = pt * (dpt - d_ref[0])  # D row block [1, bq] broadcasts

    q = q_ref[0]  # [bq, d] scaled q
    dk_acc[:] += jax.lax.dot_general(
        dst.astype(q.dtype), q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == n_q - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "scale", "interpret")
)
def flash_attention_bwd(
    q: jnp.ndarray,  # [B, S, H, d]
    k: jnp.ndarray,
    v: jnp.ndarray,
    o: jnp.ndarray,  # forward output [B, S, H, d]
    lse: jnp.ndarray,  # forward log-sum-exp [B, H, S]
    g: jnp.ndarray,  # dL/dO [B, S, H, d]
    block_q: int = 1024,
    block_k: int = 1024,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (dq, dk, dv) — dq ``[B, Sq, H, d]``, dk/dv ``[B, Skv, H, d]``
    (Skv may differ from Sq, e.g. the banded path's global-query rows
    against the full key sequence)."""
    b, s, h, d = q.shape
    s_kv = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    bh = b * h

    sq = int(pl.cdiv(s, block_q)) * block_q
    sk = int(pl.cdiv(s_kv, block_k)) * block_k
    n_q, n_k = sq // block_q, sk // block_k

    def bhsd(x, s_x, pad_to):  # [B, S, H, d] -> [BH, pad, d], zero-padded
        xb = x.transpose(0, 2, 1, 3).reshape(bh, s_x, d)
        return jnp.pad(xb, ((0, 0), (0, pad_to - s_x), (0, 0)))

    q_s = bhsd(q, s, sq) * jnp.asarray(scale, q.dtype)
    do = bhsd(g, s, sq)
    k_p = bhsd(k, s_kv, sk)
    v_p = bhsd(v, s_kv, sk)

    # augmented q / K^T exactly as the forward: padded keys -> -1e30 logits
    q_aug = jnp.concatenate([q_s, jnp.zeros((bh, sq, 1), q.dtype)], axis=-1)
    q_aug = q_aug.at[:, :s, -1].set(jnp.asarray(NEG_INF, q.dtype))
    kt_aug = jnp.swapaxes(k_p, 1, 2)  # [BH, d, sk]
    indicator = jnp.zeros((1, 1, sk), k.dtype).at[:, :, s_kv:].set(1.0)
    kt_aug = jnp.concatenate(
        [kt_aug, jnp.broadcast_to(indicator, (bh, 1, sk))], axis=1
    )  # [BH, d+1, sk]
    vt = jnp.swapaxes(v_p, 1, 2)  # [BH, d, sk]
    qt = jnp.swapaxes(q_s, 1, 2)  # [BH, d, sq]
    dot = jnp.swapaxes(do, 1, 2)  # [BH, d, sq]

    # per-row residuals; padded queries: lse=+inf (P=0), D=0
    lse_b = lse.reshape(bh, s).astype(jnp.float32)
    lse_b = jnp.pad(lse_b, ((0, 0), (0, sq - s)), constant_values=POS_INF)
    d_row = jnp.sum(
        (g.astype(jnp.float32) * o.astype(jnp.float32)).transpose(0, 2, 1, 3).reshape(bh, s, d),
        axis=-1,
    )
    d_row = jnp.pad(d_row, ((0, 0), (0, sq - s)))
    # both kernels take the ROW layout [BH, 1, sq] (8x sublane pad, ~21 MB
    # at flagship) — the column layout [BH, sq, 1] would tile-pad 128x
    # (~322 MB per operand buffer; the round-4 train-step OOM's #4/#5)
    lse_row, d_rrow = lse_b[:, None, :], d_row[:, None, :]  # [BH, 1, sq]

    dq = pl.pallas_call(
        _dq_kernel,
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d + 1), lambda bh, qi, ki: (bh, qi, 0)),  # q_aug
            pl.BlockSpec((1, d + 1, block_k), lambda bh, qi, ki: (bh, 0, ki)),  # kt_aug
            pl.BlockSpec((1, d, block_k), lambda bh, qi, ki: (bh, 0, ki)),  # vt
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),  # k
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),  # do
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, ki: (bh, 0, qi)),  # lse row
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, ki: (bh, 0, qi)),  # D row
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_aug, kt_aug, vt, k_p, do, lse_row, d_rrow)
    dq = dq[:, :s] * jnp.asarray(scale, q.dtype)

    dk, dv = pl.pallas_call(
        _dkv_kernel,
        grid=(bh, n_k, n_q),
        in_specs=[
            pl.BlockSpec((1, block_k, d), lambda bh, ki, qi: (bh, ki, 0)),  # k
            pl.BlockSpec((1, block_k, d), lambda bh, ki, qi: (bh, ki, 0)),  # v
            pl.BlockSpec((1, d, block_q), lambda bh, ki, qi: (bh, 0, qi)),  # qt
            pl.BlockSpec((1, block_q, d), lambda bh, ki, qi: (bh, qi, 0)),  # q
            pl.BlockSpec((1, d, block_q), lambda bh, ki, qi: (bh, 0, qi)),  # dO^T
            pl.BlockSpec((1, block_q, d), lambda bh, ki, qi: (bh, qi, 0)),  # dO
            pl.BlockSpec((1, 1, block_q), lambda bh, ki, qi: (bh, 0, qi)),  # lse row
            pl.BlockSpec((1, 1, block_q), lambda bh, ki, qi: (bh, 0, qi)),  # D row
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bh, ki, qi: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, ki, qi: (bh, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(k_p, v_p, qt, q_s, dot, do, lse_row, d_rrow)
    dk, dv = dk[:, :s_kv], dv[:, :s_kv]

    def back(x, s_x):  # [BH, S, d] -> [B, S, H, d]
        return x.reshape(b, h, s_x, d).transpose(0, 2, 1, 3)

    return back(dq, s), back(dk, s_kv), back(dv, s_kv)
