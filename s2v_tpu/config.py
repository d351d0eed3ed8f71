"""Typed configuration for every component of the framework.

The reference scatters configuration across argparse flags, HF `config.json`
files and hard-coded constants (see reference `src/inference.py:37-62`,
`src/custom_cogvideox_pipe.py:224,229`).  Here everything is a frozen
dataclass and all token/shape bookkeeping (the 14-frame RoPE table, the
1350-token ref span, ...) is *derived* from shapes instead of hard-coded.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp


def _filter_kwargs(cls, kwargs):
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in kwargs.items() if k in names}


@dataclass(frozen=True)
class TransformerConfig:
    """CogVideoX 3D transformer config.

    Defaults are the CogVideoX-5b values (the validated configuration of the
    reference; cf. reference cogvideox_transformer_3d.py:252-280 where class
    defaults are the 2b values and the hub config supplies 5b values).
    """

    num_attention_heads: int = 48
    attention_head_dim: int = 64
    in_channels: int = 16
    out_channels: int = 16
    time_embed_dim: int = 512
    text_embed_dim: int = 4096
    num_layers: int = 42
    attention_bias: bool = True
    sample_width: int = 90
    sample_height: int = 60
    sample_frames: int = 49
    patch_size: int = 2
    temporal_compression_ratio: int = 4
    max_text_seq_length: int = 226
    norm_eps: float = 1e-5
    qk_norm_eps: float = 1e-6
    spatial_interpolation_scale: float = 1.875
    temporal_interpolation_scale: float = 1.0
    use_rotary_positional_embeddings: bool = True
    use_learned_positional_embeddings: bool = False
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    ff_mult: int = 4
    # Intended-but-inert reference semantics (reference normalization.py:434-450
    # `enable_lora`): compute base-stream modulation with LoRA disabled and
    # ref-stream modulation with LoRA enabled.  Stock PEFT makes this a no-op,
    # so the effective (and default) behaviour is merged modulation for all
    # three streams.  Set True only with unmerged LoRA params present.
    disentangled_modulation: bool = False
    # sliding-window half-width in latent frames for the opt-in
    # ``attention_backend="windowed"`` approximate path (2w+1-frame window)
    attention_window_frames: int = 2
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def ff_inner_dim(self) -> int:
        return self.inner_dim * self.ff_mult

    @classmethod
    def cogvideox_5b(cls, **overrides) -> "TransformerConfig":
        return cls(**overrides)

    @classmethod
    def cogvideox_2b(cls, **overrides) -> "TransformerConfig":
        base = dict(
            num_attention_heads=30,
            num_layers=30,
            attention_bias=True,
            use_rotary_positional_embeddings=False,
            dtype=jnp.float16,
            param_dtype=jnp.float16,
        )
        base.update(overrides)
        return cls(**base)

    @classmethod
    def tiny(cls, **overrides) -> "TransformerConfig":
        """Tiny config for CPU tests (upstream-diffusers-style fixture)."""
        base = dict(
            num_attention_heads=4,
            attention_head_dim=16,  # /8*3 RoPE axis split needs dim % 16 == 0
            in_channels=4,
            out_channels=4,
            time_embed_dim=16,
            text_embed_dim=32,
            num_layers=2,
            sample_width=8,
            sample_height=8,
            sample_frames=9,
            max_text_seq_length=16,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )
        base.update(overrides)
        return cls(**base)

    @classmethod
    def from_hf_config(cls, path: str, **overrides) -> "TransformerConfig":
        """Build from a HF `transformer/config.json` (reference L1 equivalent)."""
        with open(path) as f:
            raw = json.load(f)
        raw.update(overrides)
        return cls(**_filter_kwargs(cls, raw))


@dataclass(frozen=True)
class VAEConfig:
    """3D causal VAE config (reference autoencoder_kl_cogvideox.py:1018-1100)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    norm_eps: float = 1e-6
    norm_num_groups: int = 32
    temporal_compression_ratio: int = 4
    sample_height: int = 480
    sample_width: int = 720
    scaling_factor: float = 1.15258426
    invert_scale_latents: bool = False
    # streaming chunk sizes (reference :1099-1100)
    num_latent_frames_batch_size: int = 2
    num_sample_frames_batch_size: int = 8
    # tiling (reference :1102-1114)
    tile_overlap_factor_height: float = 1.0 / 6.0
    tile_overlap_factor_width: float = 1.0 / 5.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @property
    def spatial_compression_ratio(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @property
    def tile_sample_min_height(self) -> int:
        return self.sample_height // 2

    @property
    def tile_sample_min_width(self) -> int:
        return self.sample_width // 2

    @property
    def tile_latent_min_height(self) -> int:
        return int(self.tile_sample_min_height / self.spatial_compression_ratio)

    @property
    def tile_latent_min_width(self) -> int:
        return int(self.tile_sample_min_width / self.spatial_compression_ratio)

    @classmethod
    def tiny(cls, **overrides) -> "VAEConfig":
        base = dict(
            block_out_channels=(8, 8, 8, 8),
            latent_channels=4,
            layers_per_block=1,
            norm_num_groups=4,
            sample_height=32,
            sample_width=32,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )
        base.update(overrides)
        return cls(**base)

    @classmethod
    def from_hf_config(cls, path: str, **overrides) -> "VAEConfig":
        with open(path) as f:
            raw = json.load(f)
        if "block_out_channels" in raw:
            raw["block_out_channels"] = tuple(raw["block_out_channels"])
        raw.update(overrides)
        return cls(**_filter_kwargs(cls, raw))


@dataclass(frozen=True)
class SchedulerConfig:
    """CogVideoX DDIM/DPM scheduler config.

    Defaults match the hub scheduler shipped with THUDM/CogVideoX-5b
    (v-prediction, zero-terminal-SNR, trailing spacing, snr_shift 1.0);
    class defaults of the reference scheduler
    (scheduling_ddim_cogvideox.py:181-199) are available via ``reference_defaults``.
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.0120
    beta_schedule: str = "scaled_linear"
    set_alpha_to_one: bool = True
    steps_offset: int = 0
    prediction_type: str = "v_prediction"
    timestep_spacing: str = "trailing"
    rescale_betas_zero_snr: bool = True
    snr_shift_scale: float = 1.0

    @classmethod
    def reference_defaults(cls, **overrides) -> "SchedulerConfig":
        base = dict(
            prediction_type="epsilon",
            timestep_spacing="leading",
            rescale_betas_zero_snr=False,
            snr_shift_scale=3.0,
        )
        base.update(overrides)
        return cls(**base)

    @classmethod
    def from_hf_config(cls, path: str, **overrides) -> "SchedulerConfig":
        with open(path) as f:
            raw = json.load(f)
        raw.update(overrides)
        return cls(**_filter_kwargs(cls, raw))


@dataclass(frozen=True)
class T5Config:
    """T5 v1.1 encoder config (defaults: t5-v1_1-xxl used by CogVideoX)."""

    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "gated-gelu"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def tiny(cls, **overrides) -> "T5Config":
        base = dict(
            vocab_size=128,
            d_model=32,
            d_kv=8,
            d_ff=64,
            num_layers=2,
            num_heads=4,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )
        base.update(overrides)
        return cls(**base)

    @classmethod
    def from_hf_config(cls, path: str, **overrides) -> "T5Config":
        with open(path) as f:
            raw = json.load(f)
        raw.update(overrides)
        return cls(**_filter_kwargs(cls, raw))


@dataclass(frozen=True)
class PipelineConfig:
    """End-to-end generation config (reference CLI defaults,
    src/inference.py:37-62 + custom_cogvideox_pipe.py:125-155)."""

    height: int = 480
    width: int = 720
    num_frames: int = 49
    num_inference_steps: int = 50
    guidance_scale: float = 6.0
    use_dynamic_cfg: bool = False
    max_sequence_length: int = 226
    fps: int = 8
    seed: int = 420

    def latent_frames(self, temporal_compression: int = 4) -> int:
        return (self.num_frames - 1) // temporal_compression + 1

    def latent_hw(self, spatial_compression: int = 8) -> Tuple[int, int]:
        return self.height // spatial_compression, self.width // spatial_compression
