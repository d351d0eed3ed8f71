"""Multi-chip inference recipe (v5e pod slice).

Demonstrates the three composition levels; runs end-to-end on a virtual
CPU mesh too (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8):

  1. TP: megatron-shard the transformer over a 'model' axis.
  2. SP: ring attention over a 'seq' axis for single-clip latency
     (BASELINE.json configs[4]).
  3. Context-parallel VAE decode over the 'seq' axis.
"""

import jax
import jax.numpy as jnp

from s2v_tpu.config import SchedulerConfig, TransformerConfig, VAEConfig
from s2v_tpu.models.transformer import init_transformer_params_stacked
from s2v_tpu.models.vae import init_vae_params
from s2v_tpu.parallel import (
    default_logical_map,
    make_mesh,
    mesh_context,
    shard_params,
    transformer_param_specs,
)
from s2v_tpu.parallel.vae_temporal import sharded_vae_decode
from s2v_tpu.pipelines.denoise import DenoiseSchedule, denoise
from s2v_tpu.ops.rope import build_segmented_rope, get_3d_rotary_pos_embed


def main():
    n = len(jax.devices())
    print(f"{n} devices: {jax.devices()[0].device_kind}")
    cfg = TransformerConfig.tiny()  # swap for cogvideox_5b() on a pod slice
    vcfg = VAEConfig.tiny(latent_channels=cfg.in_channels)

    params = init_transformer_params_stacked(jax.random.PRNGKey(0), cfg)
    B, F, H, W = 1, 2, 8, 8
    key = jax.random.PRNGKey(1)
    lat = jax.random.normal(key, (B, F, H, W, cfg.in_channels), cfg.dtype)
    ref = jax.random.normal(key, (B, 1, H, W, cfg.in_channels), cfg.dtype)
    emb = jax.random.normal(key, (2 * B, cfg.max_text_seq_length, cfg.text_embed_dim), cfg.dtype)
    gh, gw = H // 2, W // 2
    cos, sin = get_3d_rotary_pos_embed(cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), F + 1)
    tok = gh * gw
    cs, sn = build_segmented_rope(
        cfg.max_text_seq_length, cos[:tok], sin[:tok], cos[tok : tok * (F + 1)], sin[tok : tok * (F + 1)]
    )
    sched = DenoiseSchedule.create(SchedulerConfig(), 2, 6.0)

    # --- 1. tensor parallel ------------------------------------------------
    mesh = make_mesh({"data": 2, "model": n // 2})
    tp_params = shard_params(params, mesh, transformer_param_specs(cfg, "model"))
    with mesh_context(mesh, default_logical_map(mesh)):
        out = jax.jit(lambda p, l, r, e: denoise(p, cfg, sched, l, r, e, cs, sn))(
            tp_params, lat, ref, emb
        )
    print("TP denoise:", out.shape)

    # --- 2. sequence parallel (ring attention) -----------------------------
    seq_mesh = make_mesh({"seq": n})
    with mesh_context(seq_mesh, default_logical_map(seq_mesh)):
        out = jax.jit(
            lambda p, l, r, e: denoise(p, cfg, sched, l, r, e, cs, sn, attention_backend="ring")
        )(params, lat, ref, emb)
    print("SP (ring) denoise:", out.shape)

    # --- 3. context-parallel VAE decode ------------------------------------
    vae_params = init_vae_params(jax.random.PRNGKey(2), vcfg)
    z = jax.random.normal(key, (1, 2 * (n // 2), 4, 4, vcfg.latent_channels), jnp.float32)
    frames = sharded_vae_decode(vae_params, vcfg, z, make_mesh({"seq": n // 2}))
    print("CP VAE decode:", frames.shape)


if __name__ == "__main__":
    main()
