"""Training-step benchmark at the flagship geometry (single chip).

Measures the jitted LoRA train step (forward + hand-written Pallas
backward kernels + optax update) on the CogVideoX-5b architecture with
random weights — identical FLOP/memory profile to pretrained — at the
real 49-frame 480x720 latent geometry (B=1, 13x60x90x16 latents,
19,126-token attention).  The reference releases no trainer, so there is
no baseline number to compare against; this pins OUR throughput and the
remat memory claim on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "detail"}.

On CPU (no chip) it runs the tiny config as a smoke test.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench  # repo-root bench.py: shared backend-init watchdog

    bench._init_backend_with_watchdog()
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from s2v_tpu.config import SchedulerConfig, TransformerConfig
    from s2v_tpu.models.transformer import init_transformer_params_stacked
    from s2v_tpu.ops.rope import build_segmented_rope, prepare_video_and_ref_rope, get_3d_rotary_pos_embed
    from s2v_tpu.training.lora import LoRASpec, init_lora_params, make_lora_train_step

    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        cfg = TransformerConfig.cogvideox_5b()
        B, F, H, W = 1, 13, 60, 90
        backend = "pallas"
        rank = 128
        vc, vs, rc, rs = prepare_video_and_ref_rope(480, 720, F, cfg.attention_head_dim)
        cs, sn = build_segmented_rope(cfg.max_text_seq_length, rc, rs, vc, vs)
        iters, warmup = 3, 1
    else:
        cfg = TransformerConfig.tiny()
        B, F, H, W = 1, 2, 8, 8
        backend = "xla"
        rank = 2
        gh, gw = H // 2, W // 2
        cos, sin = get_3d_rotary_pos_embed(
            cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), F + 1
        )
        tok = gh * gw
        cs, sn = build_segmented_rope(
            cfg.max_text_seq_length, cos[:tok], sin[:tok],
            cos[tok : tok * (F + 1)], sin[tok : tok * (F + 1)],
        )
        iters, warmup = 2, 1

    params = init_transformer_params_stacked(jax.random.PRNGKey(0), cfg)
    spec = LoRASpec(rank=rank, alpha=2.0 * rank)
    lora = init_lora_params(jax.random.PRNGKey(1), params, spec)
    init_opt, train_step = make_lora_train_step(
        params, cfg, spec, SchedulerConfig(), learning_rate=1e-4,
        attention_backend=backend,
    )
    opt_state = init_opt(lora)
    key = jax.random.PRNGKey(2)
    batch = {
        "video_latents": jax.random.normal(
            key, (B, F, H, W, cfg.in_channels), jnp.float32).astype(cfg.dtype),
        "ref_latents": jax.random.normal(
            key, (B, 1, H, W, cfg.in_channels), jnp.float32).astype(cfg.dtype),
        "text_embeds": jax.random.normal(
            key, (B, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32
        ).astype(cfg.dtype),
        "rope_cos": cs,
        "rope_sin": sn,
    }

    def run():
        nonlocal lora, opt_state
        lora, opt_state, loss = train_step(
            lora, opt_state, batch, jax.random.PRNGKey(3)
        )
        # host fetch = reliable sync through the axon relay (see bench.py)
        return float(loss)

    t0 = time.perf_counter()
    loss = run()
    compile_s = time.perf_counter() - t0
    for _ in range(warmup - 1):
        run()
    t0 = time.perf_counter()
    for _ in range(iters):
        loss = run()
    s_per_step = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "metric": "LoRA train step, 49f 480p B=1 (fwd+bwd+update)" if on_tpu
                  else "LoRA train step (tiny smoke)",
        "value": round(s_per_step, 3),
        "unit": "s/step",
        "detail": f"backend={backend} rank={rank} compile={compile_s:.1f}s "
                  f"loss={loss:.4f} steps/hour={3600.0 / s_per_step:.1f}",
    }))


if __name__ == "__main__":
    main()
