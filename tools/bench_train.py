"""Training-step benchmark at the flagship geometry (single chip).

Measures the jitted LoRA train step (forward + hand-written Pallas
backward kernels + optax update) on the CogVideoX-5b architecture with
random weights — identical FLOP/memory profile to pretrained — at the
real 49-frame 480x720 latent geometry (B=1, 13x60x90x16 latents,
19,126-token attention).  The reference releases no trainer, so there is
no baseline number to compare against; this pins OUR throughput and the
remat memory claim on real hardware.

Memory ladder: per-layer remat saves all 42 scan carries (~4.9 GB of
stream state) on top of the 11.1 GB bf16 base — over a 16 GB chip's HBM
(measured OOM).  The bench therefore tries remat="seg" (segmented/nested
checkpointing, sqrt(L) carries) at flagship first, then falls back to
fewer latent frames, and reports exactly which configuration ran.

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

    if bench._init_backend_with_watchdog() is None:
        print(json.dumps({
            "metric": "LoRA train step", "value": None, "unit": "s/step",
            "detail": "jax backend init failed/hung — no measurement possible",
        }))
        sys.exit(2)
    import jax
    import jax.numpy as jnp

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
        B, H, W = 1, 60, 90
        backend = "pallas"
        # (remat, latent frames, quantize_base, rank): QLoRA flagship first —
        # the bf16 base is a PROVEN compile-time OOM at 42 layers (L=42 f=9
        # AOT dump: arguments 14.71 GB + temps 7.43 GB on a 15.75 GB chip,
        # bench_runs/r04_probe_L42_f9.log).  The rungs attack every term:
        # int8 base (-5.5 GB args), seg14 (weight-slice temps 504->216 MB
        # per target), bf16 adam mu (-0.6 GB at r=128), rank 64 (-1.8 GB),
        # row-major lse/D kernel stats (-1.3 GB of 128x-padded temps).
        # r=128 at f=13 measured 17.15 G of 15.75 (bench_runs/
        # r04_probe_qlora_f13.log: args 9.56 + temps 7.59, 45.9% frag) —
        # 1.4 GB over, so r=64 is the flagship rank here (no r=128 rung:
        # rank 128 strictly dominates rank 64's memory, so it can never
        # succeed after an identical r=64 rung fails)
        ladder = [("seg14", 13, True, 64),
                  ("seg14", 9, True, 64), ("seg14", 9, False, 64),
                  ("seg14", 7, False, 64), ("seg14", 5, False, 64)]
        iters, warmup = 3, 1
    else:
        cfg = TransformerConfig.tiny()
        B, H, W = 1, 8, 8
        backend = "xla"
        ladder = [(True, 2, False, 2)]
        iters, warmup = 2, 1

    def make_rope(F):
        if on_tpu:
            vc, vs, rc, rs = prepare_video_and_ref_rope(480, 720, F, cfg.attention_head_dim)
            return build_segmented_rope(cfg.max_text_seq_length, rc, rs, vc, vs)
        gh, gw = H // 2, W // 2
        cos, sin = get_3d_rotary_pos_embed(
            cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), F + 1
        )
        tok = gh * gw
        return build_segmented_rope(
            cfg.max_text_seq_length, cos[:tok], sin[:tok],
            cos[tok : tok * (F + 1)], sin[tok : tok * (F + 1)],
        )

    # base tree state, rebuilt when a rung flips quantize_base (bf16 and
    # int8 trees must never be alive together: 11.1 + 6.4 GB > 16 GB HBM)
    tree_state = {"quant": None, "rank": None, "params": None, "lora0": None}

    def get_params(quant, rank):
        if tree_state["quant"] != quant or tree_state["rank"] != rank:
            tree_state["params"] = tree_state["lora0"] = None
            jax.clear_caches()
            # one jitted init: per-leaf eager init is hundreds of relay
            # round-trips through the axon relay
            tree_state["params"] = jax.jit(
                lambda k: init_transformer_params_stacked(k, cfg, quantized=quant)
            )(jax.random.PRNGKey(0))
            jax.block_until_ready(jax.tree.leaves(tree_state["params"])[0])
            tree_state["lora0"] = init_lora_params(
                jax.random.PRNGKey(1), tree_state["params"],
                LoRASpec(rank=rank, alpha=2.0 * rank))
            tree_state["quant"], tree_state["rank"] = quant, rank
        return tree_state["params"], tree_state["lora0"]

    def attempt(remat, F, quant, rank):
        spec = LoRASpec(rank=rank, alpha=2.0 * rank)
        params, lora0 = get_params(quant, rank)
        cs, sn = make_rope(F)
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
        from s2v_tpu.training.optim import OptimizerSpec

        init_opt, train_step = make_lora_train_step(
            params, cfg, spec, SchedulerConfig(), learning_rate=1e-4,
            attention_backend=backend, remat=remat, donate=True,
            # bf16 adam mu: the production memory configuration on a
            # 16 GB chip (see ladder comment); nu stays fp32
            optimizer_spec=OptimizerSpec(moment_dtype="bfloat16"),
        )
        # donation deletes the step's inputs — keep lora0 alive across rungs
        lora = jax.tree.map(jnp.copy, lora0)
        opt_state = init_opt(lora)

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
        return (time.perf_counter() - t0) / iters, compile_s, loss

    last_err = None
    for remat, F, quant, rank in ladder:
        label = (f"remat={'full' if remat is True else remat} frames={F}"
                 + (" base=int8(qlora)" if quant else " base=bf16")
                 + f" rank={rank}")
        try:
            print(f"# attempt: {label} ...", flush=True)
            s_per_step, compile_s, loss = attempt(remat, F, quant, rank)
        except Exception as e:  # RESOURCE_EXHAUSTED etc: step down the ladder
            msg = str(e).splitlines()[0][:200]
            print(f"# attempt: {label} FAILED: {msg}", flush=True)
            last_err = msg
            jax.clear_caches()
            continue
        flagship = on_tpu and F == 13
        print(json.dumps({
            "metric": ("LoRA train step, 49f 480p B=1 (fwd+bwd+update)"
                       if flagship else
                       f"LoRA train step, {4 * F - 3}f 480p B=1 (fwd+bwd+update)")
                      if on_tpu else "LoRA train step (tiny smoke)",
            "value": round(s_per_step, 3),
            "unit": "s/step",
            # optimizer surface: OptimizerSpec defaults (adamw b2=0.95,
            # wd=1e-4) since r4 — loss not comparable with the r<=3 numbers
            # that used optax.adamw(1e-4, b2=0.999)
            "detail": f"{label} backend={backend} "
                      f"opt=adamw(b2=0.95,wd=1e-4,mu=bf16) "
                      f"compile={compile_s:.1f}s loss={loss:.4f} "
                      f"steps/hour={3600.0 / s_per_step:.1f}",
        }))
        return
    print(json.dumps({
        "metric": "LoRA train step", "value": None, "unit": "s/step",
        "detail": f"all ladder configs failed; last error: {last_err}",
    }))
    sys.exit(1)


if __name__ == "__main__":
    main()
