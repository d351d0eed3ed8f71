"""AdaLN-Zero modulation for the 3-stream CogVideoX block.

Parity targets:
  - ``CogVideoXLayerNormZero`` (reference normalization.py:452-484): one
    ``Linear(time_embed_dim -> 6*dim)`` chunked into (shift, scale, gate) x2
    for the video and text streams; the reference-image stream reuses the
    *first* chunk (shift, scale, gate) — at inference the reference's
    ``enable_lora`` trick is inert (SURVEY.md §0), so one linear pass serves
    all three streams.
  - output ``AdaLayerNorm`` with chunk_dim=1 "shift, scale" order
    (reference normalization.py:28-82, used at cogvideox_transformer_3d.py:542).

The optional *disentangled* semantics (ref stream modulated by
base+LoRA weights while video/text use base-only) is supported by passing
``base_linear`` params — this is the intended-but-inert behaviour the LoRA
targets ``norm1.linear``/``norm2.linear`` exist for.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from s2v_tpu.ops.norms import layer_norm


def _modulation(linear_params, temb: jnp.ndarray) -> jnp.ndarray:
    """silu(temb) @ W + b, computed in fp32 for stability."""
    act = jax.nn.silu(temb.astype(jnp.float32))
    w = linear_params["kernel"].astype(jnp.float32)
    b = linear_params["bias"].astype(jnp.float32)
    return act @ w + b


def ada_layer_norm_zero_3stream(
    params,
    video: jnp.ndarray,
    text: jnp.ndarray,
    ref: jnp.ndarray,
    temb: jnp.ndarray,
    eps: float = 1e-5,
    base_linear: Optional[dict] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (video_n, text_n, ref_n, video_gate, text_gate, ref_gate).

    params: {"linear": {kernel [Td, 6D], bias [6D]}, "norm": {weight, bias}}.
    """
    dim = video.shape[-1]
    mod = _modulation(params["linear"], temb)  # [B, 6D] fp32
    shift, scale, gate, t_shift, t_scale, t_gate = jnp.split(mod, 6, axis=-1)

    if base_linear is not None:
        # Disentangled semantics: video/text modulated by the base weights,
        # ref by base+LoRA (the `params["linear"]` merged weights).
        base_mod = _modulation(base_linear, temb)
        shift, scale, gate, t_shift, t_scale, t_gate = jnp.split(base_mod, 6, axis=-1)
        r_shift, r_scale, r_gate, _, _, _ = jnp.split(mod, 6, axis=-1)
    else:
        r_shift, r_scale, r_gate = shift, scale, gate

    norm_w = params["norm"]["weight"]
    norm_b = params["norm"]["bias"]

    def mod_stream(x, sh, sc):
        # modulation applied in the stream dtype (fp32 for fp32 models): the
        # per-channel (1+scale)/shift vectors round to bf16 once; an fp32
        # apply keeps stream-sized fp32 tensors live in the rematted train
        # backward (see ops/norms.py)
        xn = layer_norm(x, norm_w, norm_b, eps)
        dt = x.dtype
        return xn * (1.0 + sc[:, None, :]).astype(dt) + sh[:, None, :].astype(dt)

    video_n = mod_stream(video, shift, scale)
    text_n = mod_stream(text, t_shift, t_scale)
    ref_n = mod_stream(ref, r_shift, r_scale)

    dt = video.dtype
    return (
        video_n,
        text_n,
        ref_n,
        gate[:, None, :].astype(dt),
        t_gate[:, None, :].astype(dt),
        r_gate[:, None, :].astype(dt),
    )


def ada_layer_norm_out(params, x: jnp.ndarray, temb: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Output AdaLayerNorm: silu(temb) @ W -> (shift | scale), LN(x)*(1+scale)+shift.

    Note the CogVideoX-specific "shift, scale" chunk order
    (reference normalization.py:68-75).
    """
    mod = _modulation(params["linear"], temb)  # [B, 2D]
    shift, scale = jnp.split(mod, 2, axis=-1)
    xn = layer_norm(x, params["norm"]["weight"], params["norm"]["bias"], eps)
    dt = x.dtype
    return xn * (1.0 + scale[:, None, :]).astype(dt) + shift[:, None, :].astype(dt)
