"""Shared tiny-config fixtures for tests, examples, and the driver dryrun.

One home for the random-weight tiny pipeline + generate kwargs so the
tiny-config generate contract lives in a single place (previously
triplicated across tests/test_parallel.py, examples/multichip_inference.py
and __graft_entry__).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tiny_pipeline(attention_backend: str = "xla", **cfg_overrides):
    """S2VPipeline over random tiny-config weights (no T5/tokenizer).

    ``cfg_overrides`` land on ``TransformerConfig.tiny`` — e.g.
    ``num_attention_heads=8`` for meshes whose seq ring needs more head
    divisibility than the 4-head default (dryrun n=16 phase)."""
    from s2v_tpu.config import TransformerConfig, VAEConfig
    from s2v_tpu.models.transformer import init_transformer_params
    from s2v_tpu.models.vae import init_vae_params
    from s2v_tpu.pipelines.s2v import S2VPipeline

    cfg = TransformerConfig.tiny(**cfg_overrides)
    vcfg = VAEConfig.tiny(latent_channels=cfg.in_channels)
    return S2VPipeline(
        transformer_params=init_transformer_params(jax.random.PRNGKey(0), cfg),
        transformer_cfg=cfg,
        vae_params=init_vae_params(jax.random.PRNGKey(1), vcfg),
        vae_cfg=vcfg,
        attention_backend=attention_backend,
    )


def tiny_generate_kwargs(pipe, num_frames=None, seed: int = 7, **overrides):
    """Minimal valid generate() kwargs for a tiny pipeline: random CFG
    prompt embeds + ref latents at the smallest divisible geometry."""
    cfg = pipe.transformer_cfg
    sc = pipe.vae_cfg.spatial_compression_ratio
    H = W = 2 * sc * cfg.patch_size
    if num_frames is None:
        num_frames = pipe.vae_cfg.temporal_compression_ratio + 1
    kw = dict(
        prompt_embeds=jax.random.normal(
            jax.random.PRNGKey(5),
            (2, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32,
        ),
        ref_latents=jax.random.normal(
            jax.random.PRNGKey(6), (1, 1, H // sc, W // sc, cfg.in_channels), jnp.float32
        ),
        height=H, width=W, num_frames=num_frames,
        num_inference_steps=2, guidance_scale=6.0, seed=seed, output_type="np",
    )
    kw.update(overrides)
    return kw
