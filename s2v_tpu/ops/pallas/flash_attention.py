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
    state lives in VMEM scratch; block sizes swept
    (bench_runs/flash_sweep.json) -> bounded (1024, 1024): 61.0/117.0 ms
    at B=1/2 incl. host-side relayout = 73.7/76.8 TF/s effective;
    online (1024, 2048): 63.5/122.6 ms (the d=64 contraction caps the MXU
    slot rate at ~98 TF/s — head-packing canNOT lift it: packing two
    64-d heads block-diagonally feeds the MXU the same zero slots as
    padding, and a dense 128-deep q.k contraction across two heads would
    sum their logits.  The bounded-softmax mode attacks the other term —
    the per-step VPU serial chain — instead);
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
  * RoPE is applied by the caller — MEASURED anti-win in-kernel (SURVEY
    §2.4 row 2 considered it): as an XLA op it fuses with qk-LayerNorm and
    the scale fold into ONE ~1 ms pass over q/k per layer, while in-kernel
    the cos/sin tables must stream per (qi, ki) grid step — [64, block_k]
    fp32 x2 is 3x the kt block's bytes, ~17 ms/layer of extra HBM traffic
    at flagship geometry (vs 121 ms of compute), or be recomputed on the
    VPU each revisit, which adds transcendental load exactly where the
    kernel is VPU-margin-bound.  The TPU-correct fusion point is XLA's.
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


def _flash_kernel(q_ref, kt_ref, v_ref, o_ref, *rest, lse_row=True):
    # pallas passes refs as (inputs..., outputs..., scratch...): with the
    # training variant the lse output ref precedes the scratch refs.
    # lse_row: True -> lse block (1, 1, bq) (row-major [BH, 1, S] array,
    # 8x sublane pad); False -> legacy column block (1, bq, 1) — kept for
    # the banded grids, whose per-frame block width is not 128-aligned so
    # a lane-major lse block is illegal there.
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
            # log-sum-exp per row (training residual for the backward pass).
            # Stored ROW-major ([BH, 1, S] block (1, 1, bq)): a [.., S, 1]
            # column output gets (8,128)-tile padded 128x by XLA — 322 MB of
            # HLO temp at flagship f=9 vs 21 MB this way (the in-kernel
            # [bq,1]->[1,bq] relayout is a once-per-q-block transpose).
            lse = m_scratch[:, :1] + jnp.log(l)
            lse_ref[0] = lse.T if lse_row else lse


def _flash_kernel_bounded(q_ref, kt_ref, v_ref, o_ref, lse_ref, acc_scratch,
                          *, use_exp2=False):
    """Bounded-softmax flash step: no online-max recurrence.

    The caller folds a sound per-call upper bound M0 on every logit
    (Cauchy-Schwarz over the qk-LayerNormed projections: M0 >= max q.k)
    into the same MXU feature-row trick that carries the pad mask, so the
    kernel sees pre-offset logits s = q.k - M0 - 1e30*is_pad(key) <= 0 and
    softmax needs NO running max: exp never overflows, p <= 1, l <= S.
    Per step the VPU does only exp (+ the bf16 cast for the PV matmul) —
    the max reduction, the alpha rescale of acc, and the m scratch of the
    online kernel (and their serial dependency chain) all disappear.
    exp(s - M0) / sum exp(s - M0) is softmax(s) EXACTLY for any offset;
    the only risk is underflow when M0 is far above the true row max, so
    the kernel emits log(l) and the caller falls back to the online kernel
    when min log(l) crosses the fp32-headroom threshold (never on
    qk-LayerNormed activations — see flash_attention's docstring).
    """
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # [bq, d+1]: pre-scaled q | constant 1.0 column
    kt = kt_ref[0]  # [d+1, bk]: K^T | (-M0 - 1e30*is_pad) row
    v = v_ref[0]  # [bk, d+1]: V (padded rows zeroed) | ones column

    s = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk] fp32, already offset by -M0 and pad-masked
    # exp2 variant: the caller folded log2(e) into q's scale (and M0 is in
    # log2 units), so exp2(s) == exp(s_nat - M0_nat) — same p, one native
    # VPU exp2 instead of exp's extra multiply
    p = jnp.exp2(s) if use_exp2 else jnp.exp(s)
    acc_scratch[:] += jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == n_k - 1)
    def _finalize():
        l = acc_scratch[:, -1:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:, :-1] / l_safe).astype(o_ref.dtype)
        # log(l); the caller adds M0 back for the true log-sum-exp.  l == 0
        # means every p in the row underflowed — surface it as NEG_INF so
        # the caller's min-check trips the online fallback.  Row-major
        # store ([BH, 1, S]) — see _flash_kernel's lse note.
        lse_ref[0] = jnp.where(l == 0.0, NEG_INF, jnp.log(l_safe)).T


def _bounded_call(q_aug, kt_aug, v_aug, out_dtype, block_q, block_k, interpret,
                  use_exp2=False):
    bh, s, d1 = q_aug.shape
    d = d1 - 1
    s_pad = kt_aug.shape[-1]
    return pl.pallas_call(
        functools.partial(_flash_kernel_bounded, use_exp2=use_exp2),
        grid=(bh, pl.cdiv(s, block_q), s_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d + 1), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, d + 1, block_k), lambda b, qi, ki: (b, 0, ki)),
            pl.BlockSpec((1, block_k, d + 1), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d), out_dtype),
            jax.ShapeDtypeStruct((bh, 1, s), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_q, d + 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_aug, kt_aug, v_aug)


# below this headroom of fp32 (underflow at ~-87, minus 16 e-folds of
# entries that still matter relatively at 1e-7) the bounded result could
# have lost softmax mass — fall back to the online kernel.  With
# qk-LayerNorm the Cauchy-Schwarz slack M0 - max(s) is ~O(10) nats, two
# orders inside this bound.
_BOUNDED_MIN_LOG_L = -55.0


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_q", "block_k", "scale", "interpret", "return_lse", "softmax_mode"
    ),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: Optional[int] = None,  # default per softmax_mode — swept on v5e
    block_k: Optional[int] = None,  # (bench_runs/flash_sweep.json)
    scale: Optional[float] = None,
    interpret: bool = False,
    return_lse: bool = False,
    key_pad_mask: Optional[jnp.ndarray] = None,
    softmax_mode: str = "online",
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

    ``softmax_mode``:
      * ``"online"`` — the classic online-softmax recurrence (running max +
        rescale), correct for arbitrary inputs.
      * ``"bounded"`` — drops the recurrence entirely: a sound per-call
        logit bound ``M0 = max_i ||scale*q_i|| * max_j ||k_j||``
        (Cauchy-Schwarz; O(S*d) elementwise to compute) is folded into the
        K^T feature row that already carries the pad mask, so the MXU
        emits pre-offset logits ``s - M0 <= 0`` and the kernel's per-step
        VPU work collapses to one exp (+ the PV cast).  softmax is
        offset-invariant, so the result is EXACT; the one failure mode is
        fp32 underflow when M0 sits far above the true max (near-orthogonal
        q/k with huge norms — impossible after qk-LayerNorm, where norms
        are ~sqrt(d)*|gamma| and the slack is O(10) nats).  The kernel
        emits per-row log(l); if any row's crosses the fp32 headroom
        threshold the call transparently re-runs with the online kernel
        (jax.lax.cond — the fallback branch costs nothing unless taken),
        so "bounded" is exact-safe for ARBITRARY inputs too.
    """
    b, s, h, d = q.shape
    s_kv = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if block_q is None:
        block_q = 1024
    if block_k is None:
        # v5e sweep at S=19126, d=64 (bench_runs/flash_sweep.json): the
        # bounded kernel peaks at (1024, 1024) — 117.0/61.0 ms at B=2/1,
        # 76.8 TF/s effective incl. relayout; the online kernel at
        # (1024, 2048) — 122.6/63.5 ms.  Larger blocks crash the Mosaic
        # compile helper (VMEM).
        block_k = 1024 if softmax_mode in ("bounded", "bounded_exp2") else 2048

    s_pad = int(pl.cdiv(s_kv, block_k)) * block_k
    n_q = pl.cdiv(s, block_q)
    n_k = s_pad // block_k

    # shared bases: scaled q rows, pre-transposed zero-padded K^T, V rows.
    # bounded_exp2 folds log2(e) into the one q multiply so the kernel's
    # transcendental is the VPU-native exp2; the online fallback divides it
    # back out (only materialized inside the rarely-taken cond branch).
    use_exp2 = softmax_mode == "bounded_exp2"
    _mult = 1.4426950408889634 if use_exp2 else 1.0
    qb = q.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    qb = qb * jnp.asarray(scale * _mult, q.dtype)

    ktb = k.transpose(0, 2, 3, 1).reshape(b * h, d, s_kv)
    ktb = jnp.pad(ktb, ((0, 0), (0, 0), (0, s_pad - s_kv)))
    indicator = jnp.zeros((1, 1, s_pad), k.dtype).at[:, :, s_kv:].set(1.0)
    valid = None
    if key_pad_mask is not None:
        valid = 1.0 - key_pad_mask.astype(jnp.float32)  # [s_kv], 1 on real keys
        indicator = indicator.at[:, :, :s_kv].set(
            key_pad_mask.astype(k.dtype)[None, None, :]
        )

    # v_aug: V zero-padded | ones column (accumulates l) — both modes
    vb = v.transpose(0, 2, 1, 3).reshape(b * h, s_kv, d)
    if valid is not None:
        vb = vb * valid[None, :, None].astype(v.dtype)
    vb = jnp.pad(vb, ((0, 0), (0, s_pad - s_kv), (0, 0)))
    ones_col = jnp.zeros((s_pad,), v.dtype).at[:s_kv].set(1.0)
    if valid is not None:
        ones_col = ones_col.at[:s_kv].set(valid.astype(v.dtype))
    ones = jnp.broadcast_to(ones_col[None, :, None], (b * h, s_pad, 1))
    v_aug = jnp.concatenate([vb, ones], axis=-1)  # [BH, s_pad, d+1]

    def _online_call(want_lse):
        # q gains a constant -1e30 column; K^T a 0/1 pad-indicator row
        qb_nat = qb * jnp.asarray(1.0 / _mult, q.dtype) if use_exp2 else qb
        q_aug = jnp.concatenate(
            [qb_nat, jnp.full((b * h, s, 1), NEG_INF, q.dtype)], axis=-1
        )  # [BH, S, d+1]
        kt_aug = jnp.concatenate(
            [ktb, jnp.broadcast_to(indicator, (b * h, 1, s_pad))], axis=1
        )  # [BH, d+1, s_pad]
        out_specs = pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0))
        out_shape = jax.ShapeDtypeStruct((b * h, s, d), q.dtype)
        if want_lse:
            out_specs = [
                out_specs,
                pl.BlockSpec((1, 1, block_q), lambda bh, qi, ki: (bh, 0, qi)),
            ]
            out_shape = [out_shape, jax.ShapeDtypeStruct((b * h, 1, s), jnp.float32)]
        return pl.pallas_call(
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

    if softmax_mode in ("bounded", "bounded_exp2"):
        # sound logit bound (>= every q.k by Cauchy-Schwarz); padded K^T
        # columns are zero so they cannot raise the max
        qmax = jnp.sqrt(
            jnp.max(jnp.sum(jnp.square(qb.astype(jnp.float32)), axis=-1))
        )
        kmax = jnp.sqrt(
            jnp.max(jnp.sum(jnp.square(ktb.astype(jnp.float32)), axis=1))
        )
        # round the bound to k's storage dtype FIRST: the kernel applies the
        # bf16-stored row, so lse's add-back below must be the exact value
        # the MXU saw (bf16 rounds toward a slightly different scalar)
        m0 = jnp.asarray(qmax * kmax, k.dtype).astype(jnp.float32)
        # one K^T feature row carries BOTH the -M0 offset and the pad mask;
        # q's paired column is a constant 1
        q_aug = jnp.concatenate(
            [qb, jnp.ones((b * h, s, 1), q.dtype)], axis=-1
        )
        row = indicator.astype(jnp.float32) * NEG_INF - m0  # [1, 1, s_pad]
        kt_aug = jnp.concatenate(
            [ktb, jnp.broadcast_to(row.astype(k.dtype), (b * h, 1, s_pad))],
            axis=1,
        )
        o_b, logl = _bounded_call(
            q_aug, kt_aug, v_aug, q.dtype, block_q, block_k, interpret,
            use_exp2=use_exp2,
        )
        # underflow guard: exact unless some row's softmax mass fell below
        # fp32 headroom — then transparently re-run with the online kernel
        bad = jnp.min(logl) < _BOUNDED_MIN_LOG_L
        # the applied offset in nats (m0 is in log2 units under exp2)
        m0_nat = m0 * 0.6931471805599453 if use_exp2 else m0

        def _fallback(_):
            return tuple(_online_call(True))

        def _keep(_):
            return o_b, logl + m0_nat  # log l + M0 == log-sum-exp

        o, lse = jax.lax.cond(bad, _fallback, _keep, None)
        if return_lse:
            return (
                o.reshape(b, h, s, d).transpose(0, 2, 1, 3),
                lse[:, 0, :].reshape(b, h, s),  # [B, H, S]
            )
        return o.reshape(b, h, s, d).transpose(0, 2, 1, 3)
    if softmax_mode != "online":
        raise ValueError(f"unknown softmax_mode {softmax_mode!r}")

    out = _online_call(return_lse)
    if return_lse:
        o, lse = out
        return (
            o.reshape(b, h, s, d).transpose(0, 2, 1, 3),
            lse[:, 0, :].reshape(b, h, s),  # [B, H, S]
        )
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)
