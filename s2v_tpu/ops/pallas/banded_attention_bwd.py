"""Backward pass for the banded (sliding temporal window) flash attention.

Gradient structure of the band (ops/pallas/banded_attention.py semantics —
video query frame f attends [global | frames ws(f) .. ws(f)+span), global
queries attend everything):

  dQ_video : same band as the forward — grid (bh, f, k_step) with the
             forward's k-axis index_map, kernel body identical to the full
             backward's dq kernel (flash_attention_bwd._dq_kernel).
  dK/dV    : four contribution groups
             (1) all keys <- global queries: one call to the existing FULL
                 flash_attention_bwd over the 1,576 global query rows (it
                 also yields dQ_global);
             (2) video keys <- video queries: the INVERSE band — key frame
                 fk receives from query frames [f_lo(fk), f_hi(fk)], a
                 contiguous interval of length <= span + w (window clamping
                 widens it at the clip edges); grid (bh, fk, jq) with a
                 per-step whole-block validity predicate (pl.when) — band
                 blocks are whole frames, so no per-element masks;
             (3) global keys <- video queries: a full sweep over the F
                 query frames, standard dkv kernel on the padded layout.

  with ws(f) = clamp(f - w, 0, F - span),
       f_lo(fk) = 0 if fk < span else fk + w - span + 1,
       f_hi(fk) = F-1 if fk >= F - span else min(F-1, fk + w)
  (for small clips where span-1 >= F-span, edge key frames receive from
  all F query frames — the step count is computed exactly on host).

All video-side work runs on the same frame-padded layout as the forward
([global gp | F x fp]); padded query rows carry lse = +inf (P = 0) and
padded keys are masked by the -1e30 feature column x pad-indicator row, so
the kernels contain no per-element masking at all.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from s2v_tpu.ops.pallas.flash_attention import NEG_INF
from s2v_tpu.ops.pallas.banded_attention import (
    _round_up,
    band_k_block,
    band_row_split,
    band_layout,
    fold_heads,
    key_valid_mask,
    pad_full_layout,
    pad_video_rows,
    padded_kt_aug,
    unfold_heads,
    unpad_video_rows,
)
from s2v_tpu.ops.pallas.flash_attention_bwd import (
    POS_INF,
    _dq_kernel,
    _dkv_kernel,
    flash_attention_bwd,
)


def _dkv_accumulate(k_ref, v_ref, qt_ref, q_ref, dot_ref, do_ref, lse_ref,
                    d_ref, dk_acc, dv_acc):
    """One (key-block, query-frame) accumulation step shared by the banded
    dk/dv kernels (single-chip and sequence-parallel): recompute P^T from
    the forward's lse, then dV += P^T dO and dK += dS^T Q."""
    k = k_ref[0]
    qt = qt_ref[0]
    zt = jax.lax.dot_general(
        k, qt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    pt = jnp.exp(zt - lse_ref[0])
    do = do_ref[0]
    dv_acc[:] += jax.lax.dot_general(
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    v = v_ref[0]
    dot = dot_ref[0]
    dpt = jax.lax.dot_general(
        v, dot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dst = pt * (dpt - d_ref[0])
    q = q_ref[0]
    dk_acc[:] += jax.lax.dot_general(
        dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dkv_banded_kernel(
    n_frames, window, span, row_split,
    k_ref, v_ref, qt_ref, q_ref, dot_ref, do_ref, lse_ref, d_ref,
    dk_ref, dv_ref, dk_acc, dv_acc,
):
    """_dkv_kernel body gated by the inverse-band validity of this
    (key-frame, query-step) pair.  Key frames may be split into row_split
    sub-blocks (VMEM budget); validity is a scalar predicate per step —
    invalid steps skip all compute."""
    fk = pl.program_id(1) // row_split
    jq = pl.program_id(2)
    n_j = pl.num_programs(2)

    @pl.when(jq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    f_lo = jnp.where(fk < span, 0, fk + window - span + 1)
    f_hi = jnp.where(fk >= n_frames - span, n_frames - 1,
                     jnp.minimum(n_frames - 1, fk + window))
    f = f_lo + jq

    @pl.when(f <= f_hi)
    def _accumulate():
        _dkv_accumulate(k_ref, v_ref, qt_ref, q_ref, dot_ref, do_ref,
                        lse_ref, d_ref, dk_acc, dv_acc)

    @pl.when(jq == n_j - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _dkv_banded_kernel_sp(
    n_frames, window, span, row_split,
    off_ref, k_ref, v_ref, qt_ref, q_ref, dot_ref, do_ref, lse_ref, d_ref,
    dk_ref, dv_ref, dk_acc, dv_acc,
):
    """Sequence-parallel inverse-band dk/dv: the query-step axis walks this
    shard's LOCAL frames (jl), gated by membership of the global frame
    ``off + jl`` in key frame fk's inverse band.  ``off_ref`` is the
    shard's frame offset (scalar prefetch — one compiled kernel serves all
    devices of the shard_map)."""
    fk = pl.program_id(1) // row_split
    jl = pl.program_id(2)
    n_j = pl.num_programs(2)

    @pl.when(jl == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    f_lo = jnp.where(fk < span, 0, fk + window - span + 1)
    f_hi = jnp.where(fk >= n_frames - span, n_frames - 1,
                     jnp.minimum(n_frames - 1, fk + window))
    f = off_ref[0] + jl  # global query frame of local step jl

    @pl.when((f >= f_lo) & (f <= f_hi))
    def _accumulate():
        _dkv_accumulate(k_ref, v_ref, qt_ref, q_ref, dot_ref, do_ref,
                        lse_ref, d_ref, dk_acc, dv_acc)

    @pl.when(jl == n_j - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _dq_kernel_sp(off_ref, *refs):
    """The full-backward dq kernel behind a scalar-prefetch ref (the
    shard's frame offset — consumed by the index_maps, not the body)."""
    del off_ref
    return _dq_kernel(*refs, stat_row=False)


@functools.partial(
    jax.jit,
    static_argnames=("global_len", "tokens_per_frame", "window_frames",
                     "scale", "interpret"),
)
def banded_flash_attention_bwd(
    q: jnp.ndarray,  # [B, S, H, d]
    k: jnp.ndarray,
    v: jnp.ndarray,
    o: jnp.ndarray,  # banded forward output
    lse: jnp.ndarray,  # banded forward log-sum-exp [B, H, S]
    g: jnp.ndarray,  # dL/dO
    global_len: int,
    tokens_per_frame: int,
    window_frames: int,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (dq, dk, dv), each [B, S, H, d]."""
    b, s, h, d = q.shape
    gl = global_len
    tpf = tokens_per_frame
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    bh = b * h
    lay = band_layout(s, gl, tpf, window_frames)
    n_frames, span, fp, gp = lay.n_frames, lay.span, lay.fp, lay.gp
    n_glob, sv = lay.n_glob, lay.sv
    n_k = n_glob + span
    # exact max inverse-band width over key frames (static at trace time)
    import numpy as _np

    _fk = _np.arange(n_frames)
    _f_lo = _np.where(_fk < span, 0, _fk + window_frames - span + 1)
    _f_hi = _np.where(_fk >= n_frames - span, n_frames - 1,
                      _np.minimum(n_frames - 1, _fk + window_frames))
    n_inv = int((_f_hi - _f_lo + 1).max())
    # The dq / dkv kernels hold TWO [rows, fp] fp32 temporaries (p and dp)
    # concurrently; split the kernel's *output-side* rows (query rows for
    # dq, key rows for dkv) into sub-blocks until the pair fits scoped VMEM
    # (band_row_split — the forward uses the same helper with 1 live block)
    rs = band_row_split(fp, 2)
    fq = fp // rs

    # ---- (1) global queries: full backward (also yields their dq)
    dq_glob, dk_fromG, dv_fromG = flash_attention_bwd(
        q[:, :gl], k, v, o[:, :gl], lse[..., :gl], g[:, :gl],
        block_q=min(1024, _round_up(gl, 8)), scale=scale, interpret=interpret,
    )

    # ---- frame-padded layouts (the forward's helpers — one contract)
    qb, kb, vb, gb = fold_heads(q), fold_heads(k), fold_heads(v), fold_heads(g)
    valid = key_valid_mask(gl, tpf, lay)

    k_pad = pad_full_layout(kb, gl, tpf, lay)
    v_pad = pad_full_layout(vb, gl, tpf, lay)
    kt_aug = padded_kt_aug(k_pad, valid)  # [BH, d+1, k_tot]
    vt = v_pad.transpose(0, 2, 1)  # [BH, d, k_tot]

    q_s_vid = pad_video_rows(qb[:, gl:] * jnp.asarray(scale, q.dtype), tpf, lay)
    vrow_valid = jnp.tile(jnp.arange(fp) < tpf, n_frames)  # [sv]
    mask_col = jnp.where(vrow_valid, jnp.asarray(NEG_INF, jnp.float32), 0.0)
    q_aug_vid = jnp.concatenate(
        [q_s_vid, jnp.broadcast_to(mask_col.astype(q.dtype)[None, :, None], (bh, sv, 1))],
        axis=-1,
    )
    do_vid = pad_video_rows(gb[:, gl:], tpf, lay)
    qt_vid = q_s_vid.transpose(0, 2, 1)  # [BH, d, sv]
    dot_vid = do_vid.transpose(0, 2, 1)

    # per-row residuals for video queries (padded rows: lse=+inf, D=0)
    lse_vid = lse[..., gl:].reshape(bh, n_frames, tpf).astype(jnp.float32)
    lse_vid = jnp.pad(lse_vid, ((0, 0), (0, 0), (0, fp - tpf)),
                      constant_values=POS_INF).reshape(bh, sv)
    d_row = jnp.sum(
        (g[:, gl:].astype(jnp.float32) * o[:, gl:].astype(jnp.float32)),
        axis=-1,
    ).transpose(0, 2, 1).reshape(bh, n_frames, tpf)
    d_row = jnp.pad(d_row, ((0, 0), (0, 0), (0, fp - tpf))).reshape(bh, sv)
    lse_col, d_col = lse_vid[..., None], d_row[..., None]
    lse_row, d_rrow = lse_vid[:, None, :], d_row[:, None, :]

    def k_block(bh_, f, j):
        return band_k_block(f, j, window_frames, lay)

    # ---- (2) dq for video queries: banded grid, stock dq kernel
    # (column-layout lse/D: fq is not 128-aligned — see flash_attention.py)
    dq_vid = pl.pallas_call(
        functools.partial(_dq_kernel, stat_row=False),
        grid=(bh, n_frames * rs, n_k),
        in_specs=[
            pl.BlockSpec((1, fq, d + 1), lambda bh, qi, j: (bh, qi, 0)),  # q_aug
            pl.BlockSpec((1, d + 1, fp), lambda bh, qi, j: (bh, 0, k_block(bh, qi // rs, j))),
            pl.BlockSpec((1, d, fp), lambda bh, qi, j: (bh, 0, k_block(bh, qi // rs, j))),  # vt
            pl.BlockSpec((1, fp, d), lambda bh, qi, j: (bh, k_block(bh, qi // rs, j), 0)),  # k
            pl.BlockSpec((1, fq, d), lambda bh, qi, j: (bh, qi, 0)),  # do
            pl.BlockSpec((1, fq, 1), lambda bh, qi, j: (bh, qi, 0)),  # lse
            pl.BlockSpec((1, fq, 1), lambda bh, qi, j: (bh, qi, 0)),  # D
        ],
        out_specs=pl.BlockSpec((1, fq, d), lambda bh, qi, j: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sv, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((fq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_aug_vid, kt_aug, vt, k_pad, do_vid, lse_col, d_col)
    dq_vid = dq_vid * jnp.asarray(scale, q.dtype)

    # ---- (3) video keys <- video queries: inverse band, validity-gated
    def q_frame(fk, jq):
        f_lo = jnp.where(fk < span, 0, fk + window_frames - span + 1)
        return jnp.clip(f_lo + jq, 0, n_frames - 1)

    dkv_vv = pl.pallas_call(
        functools.partial(_dkv_banded_kernel, n_frames, window_frames, span, rs),
        grid=(bh, n_frames * rs, n_inv),
        in_specs=[
            # k/v arrive pre-sliced to the video region, so ki indexes
            # directly (no global-block offset); key sub-block ki covers
            # frame ki // rs
            pl.BlockSpec((1, fq, d), lambda bh, ki, jq: (bh, ki, 0)),  # k
            pl.BlockSpec((1, fq, d), lambda bh, ki, jq: (bh, ki, 0)),  # v
            pl.BlockSpec((1, d, fp), lambda bh, ki, jq: (bh, 0, q_frame(ki // rs, jq))),  # qt
            pl.BlockSpec((1, fp, d), lambda bh, ki, jq: (bh, q_frame(ki // rs, jq), 0)),  # q
            pl.BlockSpec((1, d, fp), lambda bh, ki, jq: (bh, 0, q_frame(ki // rs, jq))),  # dO^T
            pl.BlockSpec((1, fp, d), lambda bh, ki, jq: (bh, q_frame(ki // rs, jq), 0)),  # dO
            pl.BlockSpec((1, 1, fp), lambda bh, ki, jq: (bh, 0, q_frame(ki // rs, jq))),  # lse
            pl.BlockSpec((1, 1, fp), lambda bh, ki, jq: (bh, 0, q_frame(ki // rs, jq))),  # D
        ],
        out_specs=[
            pl.BlockSpec((1, fq, d), lambda bh, ki, jq: (bh, ki, 0)),
            pl.BlockSpec((1, fq, d), lambda bh, ki, jq: (bh, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sv, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sv, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((fq, d), jnp.float32),
            pltpu.VMEM((fq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(k_pad[:, gp:], v_pad[:, gp:], qt_vid, q_s_vid, dot_vid, do_vid,
      lse_row, d_rrow)
    dk_vv, dv_vv = dkv_vv

    # ---- (4) global keys <- video queries: full F-frame sweep
    dkv_gv = pl.pallas_call(
        _dkv_kernel,
        grid=(bh, n_glob * rs, n_frames),
        in_specs=[
            pl.BlockSpec((1, fq, d), lambda bh, kb, jq: (bh, kb, 0)),  # k (global)
            pl.BlockSpec((1, fq, d), lambda bh, kb, jq: (bh, kb, 0)),  # v
            pl.BlockSpec((1, d, fp), lambda bh, kb, jq: (bh, 0, jq)),  # qt
            pl.BlockSpec((1, fp, d), lambda bh, kb, jq: (bh, jq, 0)),  # q
            pl.BlockSpec((1, d, fp), lambda bh, kb, jq: (bh, 0, jq)),  # dO^T
            pl.BlockSpec((1, fp, d), lambda bh, kb, jq: (bh, jq, 0)),  # dO
            pl.BlockSpec((1, 1, fp), lambda bh, kb, jq: (bh, 0, jq)),  # lse
            pl.BlockSpec((1, 1, fp), lambda bh, kb, jq: (bh, 0, jq)),  # D
        ],
        out_specs=[
            pl.BlockSpec((1, fq, d), lambda bh, kb, jq: (bh, kb, 0)),
            pl.BlockSpec((1, fq, d), lambda bh, kb, jq: (bh, kb, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, gp, d), k.dtype),
            jax.ShapeDtypeStruct((bh, gp, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((fq, d), jnp.float32),
            pltpu.VMEM((fq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(k_pad[:, :gp], v_pad[:, :gp], qt_vid, q_s_vid, dot_vid, do_vid,
      lse_row, d_rrow)
    dk_gv, dv_gv = dkv_gv

    # ---- unpad + merge
    def unpad_vid(x):  # [BH, sv, d] -> [B, S_vid, H, d]
        return unfold_heads(unpad_video_rows(x, tpf, lay), b)

    def unpad_glob(x):  # [BH, gp, d] -> [B, gl, H, d]
        return unfold_heads(x[:, :gl], b)

    dq = jnp.concatenate([dq_glob, unpad_vid(dq_vid)], axis=1)
    dk = dk_fromG + jnp.concatenate([unpad_glob(dk_gv), unpad_vid(dk_vv)], axis=1)
    dv = dv_fromG + jnp.concatenate([unpad_glob(dv_gv), unpad_vid(dv_vv)], axis=1)
    return dq, dk, dv


@functools.partial(
    jax.jit,
    static_argnames=("global_len", "tokens_per_frame", "window_frames",
                     "n_frames_total", "scale", "interpret"),
)
def banded_flash_attention_local_bwd(
    q_vid: jnp.ndarray,  # [B, F_loc * tpf, H, d] — this shard's video rows
    k_full: jnp.ndarray,  # [B, S, H, d] — FULL key sequence (all-gathered)
    v_full: jnp.ndarray,
    o_vid: jnp.ndarray,  # local banded forward output
    lse_vid: jnp.ndarray,  # local forward log-sum-exp [B, H, F_loc * tpf]
    g_vid: jnp.ndarray,  # dL/dO for the local rows
    global_len: int,
    tokens_per_frame: int,
    window_frames: int,
    frame_offset: jnp.ndarray,  # [1] int32 — this shard's first video frame
    n_frames_total: int,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Backward of :func:`banded_flash_attention_local` (the SP shard
    kernel): returns

      * ``dq_vid`` — ``[B, F_loc * tpf, H, d]``, this shard's query grads
        (stays sharded);
      * ``dk_full`` / ``dv_full`` — ``[B, S, H, d]`` partial key/value
        grads over the FULL sequence from this shard's queries only (the
        caller psum-scatters them over the seq axis — the transpose of the
        forward's all-gather).

    Grid shapes mirror the single-chip backward but with the query axis
    local: dq walks the band at the shard's global offset (scalar
    prefetch, same ``band_k_block`` contract as the SP forward); dk/dv
    over video keys walk ALL local query frames gated by inverse-band
    membership of ``off + jl`` (f_loc is small — at most
    ceil(F/ring) — so the gated sweep costs fewer grid steps than the
    single-chip inverse-band interval); dk/dv over global keys sweep the
    local frames ungated (every video query attends the global segment).
    Ring-padding dummy frames contribute exactly zero (their dO rows are
    zero and their lse is finite), so no extra masking is needed.

    The contributions of the GLOBAL (text|ref) queries to dk/dv are NOT
    included here — the SP wrapper computes them replicated with the full
    flash backward and divides by the ring size before the psum.
    """
    b, sq, h, d = q_vid.shape
    gl = global_len
    tpf = tokens_per_frame
    f_loc = sq // tpf
    assert f_loc * tpf == sq, "ragged local video segment"
    s_full = k_full.shape[1]
    assert s_full == gl + n_frames_total * tpf, "k/v must be the full sequence"
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    bh = b * h
    lay = band_layout(s_full, gl, tpf, window_frames)
    span, fp, gp, n_glob = lay.span, lay.fp, lay.gp, lay.n_glob
    loc_lay = lay._replace(n_frames=f_loc, sv=f_loc * fp)
    n_k = n_glob + span
    rs = band_row_split(fp, 2)
    fq = fp // rs
    off = jnp.asarray(frame_offset, jnp.int32).reshape(1)

    # ---- layouts: full-extent padded K/V, local padded Q/dO/residuals
    qb, gb = fold_heads(q_vid), fold_heads(g_vid)
    kb, vb = fold_heads(k_full), fold_heads(v_full)
    valid = key_valid_mask(gl, tpf, lay)
    k_pad = pad_full_layout(kb, gl, tpf, lay)
    v_pad = pad_full_layout(vb, gl, tpf, lay)
    kt_aug = padded_kt_aug(k_pad, valid)  # [BH, d+1, k_tot]
    vt = v_pad.transpose(0, 2, 1)  # [BH, d, k_tot]

    q_s_vid = pad_video_rows(qb * jnp.asarray(scale, q_vid.dtype), tpf, loc_lay)
    vrow_valid = jnp.tile(jnp.arange(fp) < tpf, f_loc)  # [sv_loc]
    mask_col = jnp.where(vrow_valid, jnp.asarray(NEG_INF, jnp.float32), 0.0)
    q_aug_vid = jnp.concatenate(
        [q_s_vid, jnp.broadcast_to(mask_col.astype(q_vid.dtype)[None, :, None],
                                   (bh, loc_lay.sv, 1))],
        axis=-1,
    )
    do_vid = pad_video_rows(gb, tpf, loc_lay)
    qt_vid = q_s_vid.transpose(0, 2, 1)  # [BH, d, sv_loc]
    dot_vid = do_vid.transpose(0, 2, 1)

    # per-row residuals (padded rows: lse=+inf, D=0 — and dummy ring-pad
    # frames carry zero dO, so every padded contribution vanishes)
    lse_loc = lse_vid.reshape(bh, f_loc, tpf).astype(jnp.float32)
    lse_loc = jnp.pad(lse_loc, ((0, 0), (0, 0), (0, fp - tpf)),
                      constant_values=POS_INF).reshape(bh, loc_lay.sv)
    d_row = jnp.sum(
        g_vid.astype(jnp.float32) * o_vid.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1).reshape(bh, f_loc, tpf)
    d_row = jnp.pad(d_row, ((0, 0), (0, 0), (0, fp - tpf))).reshape(bh, loc_lay.sv)
    lse_col, d_col = lse_loc[..., None], d_row[..., None]
    lse_row, d_rrow = lse_loc[:, None, :], d_row[:, None, :]

    def k_block_sp(bh_, qi, j, off_):
        # same band walk as the SP forward, at the shard's global offset
        return band_k_block(qi // rs + off_[0], j, window_frames, lay)

    # ---- (1) dq for the local video queries: banded grid at the offset
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, f_loc * rs, n_k),
        in_specs=[
            pl.BlockSpec((1, fq, d + 1), lambda bh, qi, j, off_: (bh, qi, 0)),
            pl.BlockSpec((1, d + 1, fp), lambda bh, qi, j, off_: (bh, 0, k_block_sp(bh, qi, j, off_))),
            pl.BlockSpec((1, d, fp), lambda bh, qi, j, off_: (bh, 0, k_block_sp(bh, qi, j, off_))),  # vt
            pl.BlockSpec((1, fp, d), lambda bh, qi, j, off_: (bh, k_block_sp(bh, qi, j, off_), 0)),  # k
            pl.BlockSpec((1, fq, d), lambda bh, qi, j, off_: (bh, qi, 0)),  # do
            pl.BlockSpec((1, fq, 1), lambda bh, qi, j, off_: (bh, qi, 0)),  # lse
            pl.BlockSpec((1, fq, 1), lambda bh, qi, j, off_: (bh, qi, 0)),  # D
        ],
        out_specs=pl.BlockSpec((1, fq, d), lambda bh, qi, j, off_: (bh, qi, 0)),
        scratch_shapes=[pltpu.VMEM((fq, d), jnp.float32)],
    )
    dq_vid = pl.pallas_call(
        _dq_kernel_sp,
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((bh, loc_lay.sv, d), q_vid.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(off, q_aug_vid, kt_aug, vt, k_pad, do_vid, lse_col, d_col)
    dq_vid = dq_vid * jnp.asarray(scale, q_vid.dtype)

    # ---- (2) video keys <- local video queries: inverse band, off-gated
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, n_frames_total * rs, f_loc),
        in_specs=[
            pl.BlockSpec((1, fq, d), lambda bh, ki, jl, off_: (bh, ki, 0)),  # k
            pl.BlockSpec((1, fq, d), lambda bh, ki, jl, off_: (bh, ki, 0)),  # v
            pl.BlockSpec((1, d, fp), lambda bh, ki, jl, off_: (bh, 0, jl)),  # qt
            pl.BlockSpec((1, fp, d), lambda bh, ki, jl, off_: (bh, jl, 0)),  # q
            pl.BlockSpec((1, d, fp), lambda bh, ki, jl, off_: (bh, 0, jl)),  # dO^T
            pl.BlockSpec((1, fp, d), lambda bh, ki, jl, off_: (bh, jl, 0)),  # dO
            pl.BlockSpec((1, 1, fp), lambda bh, ki, jl, off_: (bh, 0, jl)),  # lse
            pl.BlockSpec((1, 1, fp), lambda bh, ki, jl, off_: (bh, 0, jl)),  # D
        ],
        out_specs=[
            pl.BlockSpec((1, fq, d), lambda bh, ki, jl, off_: (bh, ki, 0)),
            pl.BlockSpec((1, fq, d), lambda bh, ki, jl, off_: (bh, ki, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((fq, d), jnp.float32),
            pltpu.VMEM((fq, d), jnp.float32),
        ],
    )
    dk_vv, dv_vv = pl.pallas_call(
        functools.partial(_dkv_banded_kernel_sp, n_frames_total,
                          window_frames, span, rs),
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, lay.sv, d), k_full.dtype),
            jax.ShapeDtypeStruct((bh, lay.sv, d), v_full.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(off, k_pad[:, gp:], v_pad[:, gp:], qt_vid, q_s_vid, dot_vid, do_vid,
      lse_row, d_rrow)

    # ---- (3) global keys <- local video queries: ungated local sweep
    dk_gv, dv_gv = pl.pallas_call(
        _dkv_kernel,
        grid=(bh, n_glob * rs, f_loc),
        in_specs=[
            pl.BlockSpec((1, fq, d), lambda bh, kb_, jq: (bh, kb_, 0)),  # k (global)
            pl.BlockSpec((1, fq, d), lambda bh, kb_, jq: (bh, kb_, 0)),  # v
            pl.BlockSpec((1, d, fp), lambda bh, kb_, jq: (bh, 0, jq)),  # qt
            pl.BlockSpec((1, fp, d), lambda bh, kb_, jq: (bh, jq, 0)),  # q
            pl.BlockSpec((1, d, fp), lambda bh, kb_, jq: (bh, 0, jq)),  # dO^T
            pl.BlockSpec((1, fp, d), lambda bh, kb_, jq: (bh, jq, 0)),  # dO
            pl.BlockSpec((1, 1, fp), lambda bh, kb_, jq: (bh, 0, jq)),  # lse
            pl.BlockSpec((1, 1, fp), lambda bh, kb_, jq: (bh, 0, jq)),  # D
        ],
        out_specs=[
            pl.BlockSpec((1, fq, d), lambda bh, kb_, jq: (bh, kb_, 0)),
            pl.BlockSpec((1, fq, d), lambda bh, kb_, jq: (bh, kb_, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, gp, d), k_full.dtype),
            jax.ShapeDtypeStruct((bh, gp, d), v_full.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((fq, d), jnp.float32),
            pltpu.VMEM((fq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(k_pad[:, :gp], v_pad[:, :gp], qt_vid, q_s_vid, dot_vid, do_vid,
      lse_row, d_rrow)

    # ---- unpad + assemble the full-extent partial dk/dv
    dq = unfold_heads(unpad_video_rows(dq_vid, tpf, loc_lay), b)
    dk_full = jnp.concatenate(
        [unfold_heads(dk_gv[:, :gl], b),
         unfold_heads(unpad_video_rows(dk_vv, tpf, lay), b)], axis=1)
    dv_full = jnp.concatenate(
        [unfold_heads(dv_gv[:, :gl], b),
         unfold_heads(unpad_video_rows(dv_vv, tpf, lay), b)], axis=1)
    return dq, dk_full, dv_full
