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
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from s2v_tpu.ops.pallas.flash_attention import NEG_INF, _LANES, _flash_kernel, flash_attention


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class BandLayout(NamedTuple):
    """Static geometry of the frame-padded layout ``[global gp | F x fp]``
    shared by the banded forward and backward kernels (the two must stay in
    lockstep: the backward recomputes P from the forward's lse against the
    same padding/masking contract)."""

    n_frames: int
    span: int  # min(2w+1, F) — frames each video query attends
    fp: int  # padded frame width (lane-aligned)
    gp: int  # padded global-segment width (multiple of fp)
    n_glob: int  # gp // fp
    k_tot: int  # gp + F * fp
    sv: int  # F * fp (padded video rows)


def band_layout(s: int, global_len: int, tokens_per_frame: int, window_frames: int) -> BandLayout:
    n_frames = (s - global_len) // tokens_per_frame
    assert global_len + n_frames * tokens_per_frame == s, "ragged video segment"
    span = min(2 * window_frames + 1, n_frames)
    fp = _round_up(tokens_per_frame, _LANES)
    gp = _round_up(global_len, fp)
    return BandLayout(n_frames, span, fp, gp, gp // fp,
                      gp + n_frames * fp, n_frames * fp)


def fold_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, S, H, d] -> [B*H, S, d] (the kernels' batch layout)."""
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def unfold_heads(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """[B*H, S, d] -> [B, S, H, d]."""
    bh, s, d = x.shape
    return x.reshape(b, bh // b, s, d).transpose(0, 2, 1, 3)


def pad_full_layout(x: jnp.ndarray, global_len: int, tpf: int, lay: BandLayout) -> jnp.ndarray:
    """[BH, S, d] -> [BH, k_tot, d]: zero-pad the global segment to gp and
    every frame to fp."""
    bh, _, d = x.shape
    glob = jnp.pad(x[:, :global_len], ((0, 0), (0, lay.gp - global_len), (0, 0)))
    vid = x[:, global_len:].reshape(bh, lay.n_frames, tpf, d)
    vid = jnp.pad(vid, ((0, 0), (0, 0), (0, lay.fp - tpf), (0, 0)))
    return jnp.concatenate([glob, vid.reshape(bh, lay.sv, d)], axis=1)


def pad_video_rows(x: jnp.ndarray, tpf: int, lay: BandLayout) -> jnp.ndarray:
    """[BH, F*tpf, d] -> [BH, sv, d]: per-frame zero padding only."""
    bh, _, d = x.shape
    xv = x.reshape(bh, lay.n_frames, tpf, d)
    return jnp.pad(xv, ((0, 0), (0, 0), (0, lay.fp - tpf), (0, 0))).reshape(bh, lay.sv, d)


def unpad_video_rows(x: jnp.ndarray, tpf: int, lay: BandLayout) -> jnp.ndarray:
    """[BH, sv, d] -> [BH, F*tpf, d]."""
    bh, _, d = x.shape
    return x.reshape(bh, lay.n_frames, lay.fp, d)[:, :, :tpf].reshape(
        bh, lay.n_frames * tpf, d)


def key_valid_mask(global_len: int, tpf: int, lay: BandLayout) -> jnp.ndarray:
    """[k_tot] bool: True on real keys, False on padding."""
    valid = jnp.zeros((lay.k_tot,), jnp.bool_).at[:global_len].set(True)
    return valid.at[lay.gp:].set(jnp.tile(jnp.arange(lay.fp) < tpf, lay.n_frames))


def padded_kt_aug(k_pad: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """K^T over the padded layout | pad-indicator row (1 on padded keys —
    pairs with q's constant -1e30 column so masking comes from the MXU)."""
    bh = k_pad.shape[0]
    kt = k_pad.transpose(0, 2, 1)  # [BH, d, k_tot]
    indicator = (~valid).astype(k_pad.dtype)[None, None, :]
    return jnp.concatenate([kt, jnp.broadcast_to(indicator, (bh, 1, kt.shape[2]))], axis=1)


def band_row_split(fp: int, live_blocks: int) -> int:
    """Sub-block factor for kernel output rows: the banded kernels hold
    ``live_blocks`` concurrent fp32 ``[rows, fp]`` temporaries (1 in the
    forward's online softmax, 2 in the backward's p/dp pair) which must fit
    the ~16 MB scoped-VMEM budget; rows stay a sublane multiple (8)."""
    rs = 1
    while live_blocks * (fp // rs) * fp * 4 > 12 * 1024 * 1024 or (fp // rs) % 8:
        rs *= 2
        assert rs <= fp, "cannot split frame rows to fit VMEM"
    return rs


def band_k_block(f, j, window_frames: int, lay: BandLayout):
    """k-axis index_map: step j of query frame f -> block index in the
    padded layout ([global blocks | clamped window frames])."""
    ws = jnp.clip(f - window_frames, 0, lay.n_frames - lay.span)
    return jnp.where(j < lay.n_glob, j, lay.n_glob + ws + (j - lay.n_glob))


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
    if g <= 0:
        # the exact-global pass below runs flash_attention with
        # block_q=round_up(g, 8), which would be 0 and fail deep inside
        # pallas_call with an opaque Mosaic error
        raise ValueError(
            f"banded_flash_attention needs global_len > 0 (got {g}); the "
            f"[text | ref] prefix is the exact-attention segment"
        )
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    lay = band_layout(s, g, tpf, window_frames)
    n_frames, fp = lay.n_frames, lay.fp
    n_k = lay.n_glob + lay.span
    rs = band_row_split(fp, 1)  # forward: one live fp32 [rows, fp] block
    fq = fp // rs

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
    qb, kb, vb = fold_heads(q), fold_heads(k), fold_heads(v)
    valid = key_valid_mask(g, tpf, lay)

    # q_aug: video queries, frame-padded, pre-scaled | -1e30 mask column
    # (video rows only — the global q segment is handled by o_glob above)
    q_pad = pad_video_rows(qb[:, g:] * jnp.asarray(scale, q.dtype), tpf, lay)
    q_aug = jnp.concatenate(
        [q_pad, jnp.full((b * h, lay.sv, 1), NEG_INF, q.dtype)], axis=-1
    )

    # kt_aug: padded K^T | pad-indicator row (1 -> -1e30 logits via the MXU)
    kt_aug = padded_kt_aug(pad_full_layout(kb, g, tpf, lay), valid)

    # v_aug: padded V (pad rows zero) | ones column on valid keys (l-sum)
    v_pad = pad_full_layout(vb, g, tpf, lay)
    ones = jnp.broadcast_to(
        valid.astype(v.dtype)[None, :, None], (b * h, lay.k_tot, 1)
    )
    v_aug = jnp.concatenate([v_pad, ones], axis=-1)  # [BH, k_tot, d+1]

    # ---- banded grid: (bh, frame, k_step); k_step walks global then window
    def k_block(bh, f, j):
        return band_k_block(f, j, window_frames, lay)

    out_specs = pl.BlockSpec((1, fq, d), lambda bh, qi, j: (bh, qi, 0))
    out_shape = jax.ShapeDtypeStruct((b * h, n_frames * fp, d), q.dtype)
    if return_lse:
        out_specs = [out_specs, pl.BlockSpec((1, fq, 1), lambda bh, qi, j: (bh, qi, 0))]
        out_shape = [out_shape, jax.ShapeDtypeStruct((b * h, n_frames * fp, 1), jnp.float32)]

    out = pl.pallas_call(
        # column-layout lse: fq (per-frame row split) is not 128-aligned,
        # so the row-major lse block of the core flash path is illegal here
        functools.partial(_flash_kernel, lse_row=False),
        grid=(b * h, n_frames * rs, n_k),
        in_specs=[
            pl.BlockSpec((1, fq, d + 1), lambda bh, qi, j: (bh, qi, 0)),
            pl.BlockSpec((1, d + 1, fp), lambda bh, qi, j: (bh, 0, k_block(bh, qi // rs, j))),
            pl.BlockSpec((1, fp, d + 1), lambda bh, qi, j: (bh, k_block(bh, qi // rs, j), 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((fq, _LANES), jnp.float32),  # m
            pltpu.VMEM((fq, d + 1), jnp.float32),  # acc | l
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_aug, kt_aug, v_aug)
    if return_lse:
        out, lse_vid_pad = out

    # unpad frames, restore [B, S, H, d]
    o_vid = unfold_heads(unpad_video_rows(out, tpf, lay), b)
    o = jnp.concatenate([o_glob, o_vid], axis=1)
    if not return_lse:
        return o
    lse_vid = lse_vid_pad.reshape(b * h, n_frames, fp)[:, :, :tpf]
    lse_vid = lse_vid.reshape(b, h, n_frames * tpf)
    return o, jnp.concatenate([lse_glob, lse_vid], axis=-1)  # [B, H, S]


# ---------------------------------------------------------------------------
# shard-local variant (sequence-parallel banded attention)
# ---------------------------------------------------------------------------


def _flash_kernel_sp(off_ref, q_ref, kt_ref, v_ref, o_ref, *rest):
    """The plain flash kernel with a leading scalar-prefetch ref (the
    shard's global frame offset — consumed by the index_maps, not here)."""
    del off_ref
    return _flash_kernel(q_ref, kt_ref, v_ref, o_ref, *rest, lse_row=False)


def banded_flash_attention_local(
    q_vid: jnp.ndarray,
    k_full: jnp.ndarray,
    v_full: jnp.ndarray,
    global_len: int,
    tokens_per_frame: int,
    window_frames: int,
    frame_offset: jnp.ndarray,  # [1] int32 — this shard's first video frame
    n_frames_total: int,
    scale: Optional[float] = None,
    interpret: bool = False,
    return_lse: bool = False,
) -> jnp.ndarray:
    """Banded attention for a shard of video-frame queries against the FULL
    key sequence (sequence-parallel building block).

    ``q_vid``: ``[B, F_loc * tpf, H, d]`` — video rows only, this shard's
    frames.  ``k_full/v_full``: ``[B, S, H, d]`` with
    ``S = global_len + n_frames_total * tpf`` (e.g. from an all-gather).
    ``frame_offset`` is a *traced* scalar array routed to the kernel's
    index_maps via scalar prefetch, so one compiled kernel serves every
    device of a shard_map.  Window clamping uses the GLOBAL frame range —
    shard-edge frames attend across the shard boundary exactly like the
    single-chip kernel.  Padded-q frames (ring padding) produce garbage
    rows the caller drops.

    ``return_lse=True`` also returns the per-row log-sum-exp
    ``[B, H, F_loc * tpf]`` — the residual for the sequence-parallel
    banded backward (banded_attention_bwd.banded_flash_attention_local_bwd).
    """
    b, sq, h, d = q_vid.shape
    tpf = tokens_per_frame
    f_loc = sq // tpf
    assert f_loc * tpf == sq, "ragged local video segment"
    g = global_len
    if g <= 0:
        raise ValueError("banded_flash_attention_local needs global_len > 0")
    s_full = k_full.shape[1]
    assert s_full == g + n_frames_total * tpf, "k/v must be the full sequence"
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    lay = band_layout(s_full, g, tpf, window_frames)
    n_k = lay.n_glob + lay.span
    rs = band_row_split(lay.fp, 1)
    fq = lay.fp // rs

    qb = fold_heads(q_vid)
    kb, vb = fold_heads(k_full), fold_heads(v_full)
    valid = key_valid_mask(g, tpf, lay)

    loc_lay = lay._replace(n_frames=f_loc, sv=f_loc * lay.fp)
    q_pad = pad_video_rows(qb * jnp.asarray(scale, q_vid.dtype), tpf, loc_lay)
    q_aug = jnp.concatenate(
        [q_pad, jnp.full((b * h, loc_lay.sv, 1), NEG_INF, q_vid.dtype)], axis=-1
    )
    kt_aug = padded_kt_aug(pad_full_layout(kb, g, tpf, lay), valid)
    v_pad = pad_full_layout(vb, g, tpf, lay)
    ones = jnp.broadcast_to(
        valid.astype(v_full.dtype)[None, :, None], (b * h, lay.k_tot, 1)
    )
    v_aug = jnp.concatenate([v_pad, ones], axis=-1)

    w = window_frames

    def k_block(bh, qi, j, off):
        # index_maps receive (grid indices..., scalar-prefetch refs...);
        # reuse band_k_block so the fwd/bwd/SP kernels stay in lockstep
        return band_k_block(qi // rs + off[0], j, w, lay)

    out_specs = pl.BlockSpec((1, fq, d), lambda bh, qi, j, off: (bh, qi, 0))
    out_shape = jax.ShapeDtypeStruct((b * h, f_loc * lay.fp, d), q_vid.dtype)
    if return_lse:
        out_specs = [out_specs, pl.BlockSpec((1, fq, 1), lambda bh, qi, j, off: (bh, qi, 0))]
        out_shape = [out_shape, jax.ShapeDtypeStruct((b * h, f_loc * lay.fp, 1), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, f_loc * rs, n_k),
        in_specs=[
            pl.BlockSpec((1, fq, d + 1), lambda bh, qi, j, off: (bh, qi, 0)),
            pl.BlockSpec((1, d + 1, lay.fp), lambda bh, qi, j, off: (bh, 0, k_block(bh, qi, j, off))),
            pl.BlockSpec((1, lay.fp, d + 1), lambda bh, qi, j, off: (bh, k_block(bh, qi, j, off), 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((fq, _LANES), jnp.float32),  # m
            pltpu.VMEM((fq, d + 1), jnp.float32),  # acc | l
        ],
    )
    out = pl.pallas_call(
        _flash_kernel_sp,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(frame_offset, jnp.int32).reshape(1), q_aug, kt_aug, v_aug)
    if return_lse:
        out, lse_pad = out

    o = unfold_heads(unpad_video_rows(out, tpf, loc_lay), b)
    if not return_lse:
        return o
    lse = lse_pad.reshape(b * h, f_loc, lay.fp)[:, :, :tpf]
    return o, lse.reshape(b, h, f_loc * tpf)
