"""Banded (sliding temporal window) flash attention — in-kernel band.

Realizes the windowed-attention FLOP savings (ops/windowed_attention.py,
arXiv:2502.04507-style) without materializing per-frame KV windows: the
k-axis ``index_map`` of the flash kernel walks, for each query frame f,

    [ global blocks (text|ref, padded) | frames clamp(f-w .. f+w) ]

directly out of ONE shared frame-padded K/V layout.  The gather-based path
duplicated the KV window 5x (w=2) and measured break-even at 13 frames;
here the only host-side work is a single padded relayout of Q/K/V, so the
~50% FLOP reduction shows up as wall-clock.

Layout: every video frame's ``tokens_per_frame`` keys are padded to ``Fp``
(next multiple of 128, the lane tile) and the global segment to
``Gp = ceil(G / Fp) * Fp``, so all k-steps share one BlockSpec of width
``Fp``.  Padded keys are masked by the same MXU trick as the main kernel
(flash_attention.py): q carries a constant -1e30 column that multiplies a
pad-indicator row appended to K^T, so masking costs zero VPU work.  Padded
*query* rows compute a harmless uniform softmax and are dropped on unpad.

Only video queries go through the banded grid; text+ref queries (exact,
full attention — 1,576 of 19,126 tokens) use the plain flash kernel, as in
the gather path.

Semantics match ``ops/windowed_attention.windowed_attention_reference``:
clamped window (every frame sees exactly ``min(2w+1, F)`` frames, shifted
inward at the clip edges).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from s2v_tpu.ops.pallas.flash_attention import NEG_INF, _LANES, _flash_kernel, flash_attention


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "global_len",
        "tokens_per_frame",
        "window_frames",
        "scale",
        "interpret",
        "return_lse",
    ),
)
def banded_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    global_len: int,
    tokens_per_frame: int,
    window_frames: int,
    scale: Optional[float] = None,
    interpret: bool = False,
    return_lse: bool = False,
) -> jnp.ndarray:
    """Sliding-temporal-window attention, band walked in-kernel.

    q/k/v: ``[B, S, H, d]`` in ``[text | ref | video]`` token order with
    ``S = global_len + F * tokens_per_frame``.  Video query frame f attends
    ``[global | frames clamp(f-w .. f+w)]``; text/ref queries attend the
    full sequence exactly.  Returns ``[B, S, H, d]`` (with
    ``return_lse=True``: also the per-row log-sum-exp ``[B, H, S]``, the
    training residual for the banded backward).
    """
    b, s, h, d = q.shape
    g = global_len
    tpf = tokens_per_frame
    n_frames = (s - g) // tpf
    assert g + n_frames * tpf == s, "ragged video segment"
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    span = min(2 * window_frames + 1, n_frames)
    fp = _round_up(tpf, _LANES)  # frame block width (lane-aligned)
    gp = _round_up(g, fp)
    n_glob = gp // fp
    n_k = n_glob + span
    k_tot = gp + n_frames * fp

    # ---- exact full attention for the (small) global query segment
    # (block_q capped at 1024: with the default block_k=2048 the fp32
    # probability block is block_q*block_k*4 B and must stay within the
    # ~16 MB scoped-VMEM budget alongside the operand buffers)
    glob = flash_attention(
        q[:, :g], k, v, block_q=min(1024, _round_up(g, 8)), scale=scale,
        interpret=interpret, return_lse=return_lse,
    )
    o_glob, lse_glob = glob if return_lse else (glob, None)

    # ---- shared frame-padded K/V layout: [global gp | frame0 fp | ... ]
    def fold(x):  # [B, S, H, d] -> [BH, S, d]
        return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)

    qb, kb, vb = fold(q), fold(k), fold(v)

    def pad_layout(x, fill=0.0):  # [BH, S, d] -> [BH, k_tot, d]
        glob = jnp.pad(x[:, :g], ((0, 0), (0, gp - g), (0, 0)))
        vid = x[:, g:].reshape(b * h, n_frames, tpf, d)
        vid = jnp.pad(vid, ((0, 0), (0, 0), (0, fp - tpf), (0, 0)))
        return jnp.concatenate([glob, vid.reshape(b * h, n_frames * fp, d)], axis=1)

    # valid-key indicator over the padded layout (same for every bh)
    valid = jnp.zeros((k_tot,), jnp.bool_)
    valid = valid.at[:g].set(True)
    vid_valid = jnp.arange(fp) < tpf
    valid = valid.at[gp:].set(jnp.tile(vid_valid, n_frames))

    # q_aug: video queries, frame-padded, pre-scaled | -1e30 mask column
    q_pad = pad_layout(qb * jnp.asarray(scale, q.dtype))[:, gp:]  # [BH, F*fp, d]
    q_aug = jnp.concatenate(
        [q_pad, jnp.full((b * h, n_frames * fp, 1), NEG_INF, q.dtype)], axis=-1
    )

    # kt_aug: padded K^T | pad-indicator row (1 -> -1e30 logits via the MXU)
    k_pad = pad_layout(kb)
    kt = k_pad.transpose(0, 2, 1)  # [BH, d, k_tot]
    indicator = (~valid).astype(k.dtype)[None, None, :]
    kt_aug = jnp.concatenate(
        [kt, jnp.broadcast_to(indicator, (b * h, 1, k_tot))], axis=1
    )

    # v_aug: padded V (pad rows zero) | ones column on valid keys (l-sum)
    v_pad = pad_layout(vb)
    ones = jnp.broadcast_to(
        valid.astype(v.dtype)[None, :, None], (b * h, k_tot, 1)
    )
    v_aug = jnp.concatenate([v_pad, ones], axis=-1)  # [BH, k_tot, d+1]

    # ---- banded grid: (bh, frame, k_step); k_step walks global then window
    def k_block(bh, f, j):
        ws = jnp.clip(f - window_frames, 0, n_frames - span)
        return jnp.where(j < n_glob, j, n_glob + ws + (j - n_glob))

    out_specs = pl.BlockSpec((1, fp, d), lambda bh, f, j: (bh, f, 0))
    out_shape = jax.ShapeDtypeStruct((b * h, n_frames * fp, d), q.dtype)
    if return_lse:
        out_specs = [out_specs, pl.BlockSpec((1, fp, 1), lambda bh, f, j: (bh, f, 0))]
        out_shape = [out_shape, jax.ShapeDtypeStruct((b * h, n_frames * fp, 1), jnp.float32)]

    out = pl.pallas_call(
        _flash_kernel,
        grid=(b * h, n_frames, n_k),
        in_specs=[
            pl.BlockSpec((1, fp, d + 1), lambda bh, f, j: (bh, f, 0)),
            pl.BlockSpec((1, d + 1, fp), lambda bh, f, j: (bh, 0, k_block(bh, f, j))),
            pl.BlockSpec((1, fp, d + 1), lambda bh, f, j: (bh, k_block(bh, f, j), 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((fp, _LANES), jnp.float32),  # m
            pltpu.VMEM((fp, d + 1), jnp.float32),  # acc | l
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_aug, kt_aug, v_aug)
    if return_lse:
        out, lse_vid_pad = out

    # unpad frames, restore [B, S, H, d]
    o_vid = out.reshape(b * h, n_frames, fp, d)[:, :, :tpf]
    o_vid = o_vid.reshape(b, h, n_frames * tpf, d).transpose(0, 2, 1, 3)
    o = jnp.concatenate([o_glob, o_vid], axis=1)
    if not return_lse:
        return o
    lse_vid = lse_vid_pad.reshape(b * h, n_frames, fp)[:, :, :tpf]
    lse_vid = lse_vid.reshape(b, h, n_frames * tpf)
    return o, jnp.concatenate([lse_glob, lse_vid], axis=-1)  # [B, H, S]
