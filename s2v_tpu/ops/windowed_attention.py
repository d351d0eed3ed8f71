"""Windowed (sliding temporal window) attention — opt-in approximate fast
path (NOT the reference algorithm; the exact path is full joint attention,
ops/attention.py).

Inspired by sliding-tile attention for video DiTs (arXiv:2502.04507,
PAPERS.md): most of the attention mass in video diffusion concentrates on
temporally-local tokens, so video queries attend only

  [ text | ref | frames clamp(f - w .. f + w) ]

while text and ref queries keep full attention (they are 1,576 of 19,126
tokens — cheap).  The window is *clamped* at the clip edges (every frame
sees exactly ``2w + 1`` frames, shifted inward at the boundaries), which
keeps all shapes uniform: the per-frame computation maps onto the existing
flash kernel with frames folded into the batch/head grid axis — no masks,
no new kernel.

FLOP count at the 5b geometry (13 frames x 1,350 tokens, 226 text):
window 2 -> 48% of full attention, window 1 -> 35%.

NOTE: this gather-based path (materialized per-frame KV windows) is the
kernel-free fallback; the primary TPU implementation is the in-kernel
banded variant (ops/pallas/banded_attention.py), which walks the window
via the k-axis index_map with no KV duplication.  Measured on v5e, B=2,
per layer (gather vs banded vs 123 ms exact Pallas): w=1 110 vs 92 ms,
w=2 149 vs 108 ms at 13 frames; at 39 frames banded is 3.4x (w=1) /
2.8x (w=2) faster than exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def windowed_attention(
    q: jnp.ndarray,  # [B, S, H, d] — [text | ref | video] token order
    k: jnp.ndarray,
    v: jnp.ndarray,
    global_len: int,  # text + ref token count (full-attention segment)
    tokens_per_frame: int,
    window_frames: int,  # w: video queries see 2w+1 frames
    attention_fn=None,  # (q, k, v) -> o; defaults to the Pallas flash kernel
) -> jnp.ndarray:
    b, s, h, d = q.shape
    n_frames = (s - global_len) // tokens_per_frame
    assert global_len + n_frames * tokens_per_frame == s, "ragged video segment"
    if attention_fn is None:
        from s2v_tpu.ops.pallas.flash_attention import flash_attention

        def attention_fn(q_, k_, v_):
            # one q block per (short) query segment where it fits; capped at
            # 1024 so the fp32 probability block (block_q * block_k * 4 B)
            # stays within the scoped-VMEM budget at block_k=2048
            bq = min(1024, ((q_.shape[1] + 7) // 8) * 8)
            return flash_attention(q_, k_, v_, block_q=bq)

    w_span = min(2 * window_frames + 1, n_frames)

    # text+ref queries: exact full attention (tiny fraction of the FLOPs)
    o_glob = attention_fn(q[:, :global_len], k, v)

    # video queries: frames folded into batch, keys sliced per window
    qf = q[:, global_len:].reshape(b * n_frames, tokens_per_frame, h, d)
    kv_vid_shape = (b, n_frames, tokens_per_frame, h, d)
    k_vid = k[:, global_len:].reshape(kv_vid_shape)
    v_vid = v[:, global_len:].reshape(kv_vid_shape)

    # window starts are static (trace-time) ints -> plain XLA slices, which
    # copy whole frames at HBM bandwidth (a fancy-index gather here measured
    # 47 ms vs <1 ms at the 5b geometry)
    starts = np.clip(np.arange(n_frames) - window_frames, 0, n_frames - w_span)

    def windows(x):
        sl = [x[:, int(s0) : int(s0) + w_span] for s0 in starts]
        return jnp.stack(sl, axis=1).reshape(b * n_frames, w_span * tokens_per_frame, h, d)

    k_win, v_win = windows(k_vid), windows(v_vid)

    # prepend the global (text+ref) keys to every frame's window
    k_glob = jnp.broadcast_to(
        k[:, None, :global_len], (b, n_frames, global_len, h, d)
    ).reshape(b * n_frames, global_len, h, d)
    v_glob = jnp.broadcast_to(
        v[:, None, :global_len], (b, n_frames, global_len, h, d)
    ).reshape(b * n_frames, global_len, h, d)
    k_full = jnp.concatenate([k_glob, k_win], axis=1)
    v_full = jnp.concatenate([v_glob, v_win], axis=1)

    o_vid = attention_fn(qf, k_full, v_full)
    o_vid = o_vid.reshape(b, n_frames * tokens_per_frame, h, d)
    return jnp.concatenate([o_glob, o_vid], axis=1)


def windowed_attention_reference(q, k, v, global_len, tokens_per_frame, window_frames):
    """O(S^2) masked-softmax reference for tests."""
    b, s, h, d = q.shape
    n_frames = (s - global_len) // tokens_per_frame
    w_span = min(2 * window_frames + 1, n_frames)
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale

    tok_frame = (jnp.arange(s) - global_len) // tokens_per_frame  # <0 for text/ref
    q_frame, k_frame = tok_frame[:, None], tok_frame[None, :]
    start = jnp.clip(q_frame - window_frames, 0, n_frames - w_span)
    in_window = (k_frame >= start) & (k_frame < start + w_span)
    mask = (q_frame < 0) | (k_frame < 0) | in_window  # global rows/cols exact
    logits = jnp.where(mask[None, None], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)
