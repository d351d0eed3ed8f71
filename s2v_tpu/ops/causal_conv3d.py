"""Causal 3D convolution with streaming conv-cache, channels-last.

Parity target: reference ``CogVideoXCausalConv3d``
(autoencoder_kl_cogvideox.py:69-137): temporal padding is either the cached
last ``k_t - 1`` frames of the previous chunk or a replication of the first
frame (``fake_context_parallel_forward``); spatial padding is zeros.

TPU-first notes:
  * channels-last ``[B, T, H, W, C]`` with ``lax.conv_general_dilated`` over
    ``('NDHWC', 'DHWIO', 'NDHWC')`` — the layout XLA:TPU tiles best;
  * the cache is an explicit value (not module state) so chunk streaming is
    a ``lax.scan`` carry, and a temporal-sharded multi-chip VAE can exchange
    it with ``ppermute`` (SURVEY.md §2.5);
  * the reference's 2GB-chunked ``SafeConv3d`` memory workaround is
    unnecessary on TPU (XLA handles scheduling) and intentionally dropped.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax

# Temporal-halo mode: inside a shard_map over frame chunks, causal convs get
# their (kt-1)-frame cache from the ring neighbour via ppermute instead of a
# host-carried value — the true context-parallel version of the reference's
# single-device ``fake_context_parallel_forward`` cache threading
# (SURVEY.md §2.5).  All devices advance layers in lockstep, so each halo
# exchange is one neighbour hop that overlaps with compute.
_HALO = {"axis": None}


@contextlib.contextmanager
def temporal_halo(axis_name: str):
    prev = _HALO["axis"]
    _HALO["axis"] = axis_name
    try:
        yield
    finally:
        _HALO["axis"] = prev


def _halo_cache(x: jnp.ndarray, kt: int, axis_name: str, init=None) -> jnp.ndarray:
    """Receive the previous chunk's input tail from the ring neighbour.

    The first device uses ``init`` — the cache carried out of an earlier
    (host-streamed) chunk — when given, so a sharded run can continue an
    existing stream mid-trajectory; otherwise it replicate-pads its own
    first frame (reference fake_context_parallel_forward stream-start
    semantics)."""
    ring = lax.psum(1, axis_name)
    tail = x[:, -(kt - 1):]
    recv = lax.ppermute(tail, axis_name, [(i, i + 1) for i in range(ring - 1)])
    if init is not None:
        first = init.astype(x.dtype)
    else:
        first = jnp.repeat(x[:, :1], kt - 1, axis=1)
    idx = lax.axis_index(axis_name)
    return jnp.where(idx == 0, first, recv)


def causal_conv3d(
    params,
    x: jnp.ndarray,
    cache: Optional[jnp.ndarray] = None,
    time_stride: int = 1,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Apply a causal 3D conv; returns (output, new_cache).

    ``params``: {"kernel": [kt, kh, kw, Cin, Cout], "bias": [Cout]}.
    ``x``: [B, T, H, W, Cin].  ``cache``: [B, kt-1, H, W, Cin] from the
    previous temporal chunk, or None (first chunk: replicate-pad frame 0).
    """
    kernel = params["kernel"]
    kt, kh, kw = kernel.shape[0], kernel.shape[1], kernel.shape[2]

    if kt > 1:
        if _HALO["axis"] is not None:
            # in halo mode a provided cache is the stream state device 0
            # continues from (canonical-schedule CP decode)
            pad = _halo_cache(x, kt, _HALO["axis"], init=cache).astype(x.dtype)
        elif cache is None:
            pad = jnp.repeat(x[:, :1], kt - 1, axis=1)
        else:
            pad = cache.astype(x.dtype)
        x = jnp.concatenate([pad, x], axis=1)
        new_cache = x[:, -(kt - 1):]
    else:
        new_cache = None

    out = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(time_stride, 1, 1),
        padding=((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return out + params["bias"].astype(out.dtype), new_cache


def conv1x1x1(params, x: jnp.ndarray) -> jnp.ndarray:
    """Plain (non-causal) pointwise 3D conv == matmul over channels.

    Used for the resnet shortcut (reference ``CogVideoXSafeConv3d`` with
    kernel 1, :275-277) — a pure MXU matmul here.
    """
    kernel = params["kernel"]
    if kernel.ndim == 5:  # [1,1,1,Cin,Cout]
        kernel = kernel.reshape(kernel.shape[-2], kernel.shape[-1])
    return x @ kernel.astype(x.dtype) + params["bias"].astype(x.dtype)


def conv2d_per_frame(params, x: jnp.ndarray, stride: int = 1, padding="SAME") -> jnp.ndarray:
    """2D conv applied frame-wise to [B, T, H, W, C] (resampler convs)."""
    b, t, h, w, c = x.shape
    kernel = params["kernel"].astype(x.dtype)  # [kh, kw, Cin, Cout]
    y = lax.conv_general_dilated(
        x.reshape(b * t, h, w, c),
        kernel,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + params["bias"].astype(y.dtype)
    return y.reshape(b, t, *y.shape[1:])


def nearest_resize_video(x: jnp.ndarray, size_thw: Tuple[int, int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize of [B, T, H, W, C] to (T', H', W') —
    torch ``F.interpolate(mode='nearest', size=...)`` index semantics
    (floor(i * in/out))."""
    b, t, h, w, c = x.shape
    tt, th, tw = size_thw
    idx_t = (jnp.arange(tt) * t // tt).astype(jnp.int32)
    idx_h = (jnp.arange(th) * h // th).astype(jnp.int32)
    idx_w = (jnp.arange(tw) * w // tw).astype(jnp.int32)
    return x[:, idx_t][:, :, idx_h][:, :, :, idx_w]
