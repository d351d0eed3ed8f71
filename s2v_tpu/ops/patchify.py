"""Video/reference-image patch embedding as pure MXU matmuls.

The reference patchifies with a k=2, s=2 Conv2d per frame
(embeddings.py:370-372, cogvideox_transformer_3d.py:496-501).  A
stride-equals-kernel conv is exactly a space-to-depth reshape followed by a
dense matmul — the reshape is free on TPU and the matmul tiles perfectly
onto the MXU, so that is how we implement it.

Layout convention: video latents are channels-last ``[B, F, H, W, C]``.
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify_video(x: jnp.ndarray, proj_kernel: jnp.ndarray, proj_bias: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """``[B, F, H, W, C] -> [B, F*(H/p)*(W/p), D]`` token embedding.

    ``proj_kernel``: ``[p*p*C, D]`` — the conv kernel flattened in
    (ph, pw, c) order; ``proj_bias``: ``[D]``.
    """
    b, f, h, w, c = x.shape
    p = patch_size
    x = x.reshape(b, f, h // p, p, w // p, p, c)
    # -> [B, F, H/p, W/p, p(h), p(w), C]; flatten patch dims in (ph, pw, c) order
    x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, f * (h // p) * (w // p), p * p * c)
    return x @ proj_kernel + proj_bias


def unpatchify_video(
    tokens: jnp.ndarray, num_frames: int, height: int, width: int, patch_size: int, out_channels: int
) -> jnp.ndarray:
    """``[B, S, p*p*Cout] -> [B, F, H, W, Cout]``.

    Inverse of the reference's unpatchify (cogvideox_transformer_3d.py:549-551)
    in channels-last layout; the per-token feature axis is ordered
    ``(c, ph, pw)`` to match ``proj_out`` weights (reshape of the torch
    ``[p*p*C, D]`` output linear whose rows are (c, ph, pw)-ordered).
    """
    b, s, _ = tokens.shape
    p = patch_size
    hp, wp = height // p, width // p
    x = tokens.reshape(b, num_frames, hp, wp, out_channels, p, p)
    # -> [B, F, H/p, p, W/p, p, C]
    x = x.transpose(0, 1, 2, 5, 3, 6, 4)
    return x.reshape(b, num_frames, height, width, out_channels)


def conv2d_kernel_to_matrix(torch_kernel) -> jnp.ndarray:
    """Convert a torch-layout conv kernel ``[D, C, ph, pw]`` (numpy array)
    to the ``[ph*pw*C, D]`` matmul form used by :func:`patchify_video`."""
    d, c, ph, pw = torch_kernel.shape
    k = jnp.asarray(torch_kernel).transpose(2, 3, 1, 0)  # [ph, pw, C, D]
    return k.reshape(ph * pw * c, d)


def proj_out_weight_to_matrix(torch_weight) -> jnp.ndarray:
    """torch ``proj_out.weight [p*p*Cout, D]`` -> matmul kernel ``[D, p*p*Cout]``.

    The torch output rows are (c, ph, pw)-ordered flattening of
    ``[Cout, p, p]`` — :func:`unpatchify_video` consumes exactly that order.
    """
    return jnp.asarray(torch_weight).T
