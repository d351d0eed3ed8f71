"""Depth-ladder probe for the flagship LoRA train step's compile failure.

Round-4 context: `tools/bench_train.py` (42-layer 5b, remat=seg, Pallas
fwd+bwd) fails on this relay with `remote_compile: HTTP 500:
tpu_compile_helper subprocess exit code 1` at every ladder rung, while
L=1 and L=8 probes compile and run.  This tool walks the depth ladder
(L in --layers) at a fixed geometry, separates COMPILE from EXECUTE via
jit(...).lower().compile(), and prints the full error text so we can
see whether the helper dies from program size, compile-time memory, or
an HLO pathology that appears at some depth.

Usage (one TPU process at a time — see MEMORY axon notes):
    python tools/train_probe.py --layers 16,28,42 --frames 13 --remat seg
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", default="16,28,42")
    p.add_argument("--frames", type=int, default=13)
    p.add_argument("--remat", default="seg")
    p.add_argument("--rank", type=int, default=128)
    p.add_argument("--quantize_base", action="store_true", default=False,
                   help="QLoRA rung: int8 frozen base (random int8 init)")
    p.add_argument("--execute", action="store_true",
                   help="also run one step after a successful compile")
    args = p.parse_args()

    import bench

    if bench._init_backend_with_watchdog() is None:
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
    from s2v_tpu.ops.rope import build_segmented_rope, prepare_video_and_ref_rope
    from s2v_tpu.training.lora import LoRASpec, init_lora_params, make_lora_train_step

    print(f"# devices: {jax.devices()}", flush=True)
    remat = True if args.remat == "full" else args.remat
    B, H, W, F = 1, 60, 90, args.frames

    for L in [int(x) for x in args.layers.split(",")]:
        cfg = TransformerConfig.cogvideox_5b(num_layers=L)
        t0 = time.perf_counter()
        # the previous rung's trees must be freed BEFORE this rung's init
        # allocates (python rebinds names only after the RHS completes — at
        # L=42 the live L=28 tree + the new 11.1 GB tree OOM'd the chip)
        params = lora = opt_state = batch = compiled = lowered = None
        import gc

        gc.collect()
        try:
            params = jax.jit(
                lambda k, c=cfg: init_transformer_params_stacked(
                    k, c, quantized=args.quantize_base
                )
            )(jax.random.PRNGKey(0))
            jax.block_until_ready(jax.tree.leaves(params)[0])
            spec = LoRASpec(rank=args.rank, alpha=2.0 * args.rank)
            lora = init_lora_params(jax.random.PRNGKey(1), params, spec)
            vc, vs, rc, rs = prepare_video_and_ref_rope(480, 720, F, cfg.attention_head_dim)
            cs, sn = build_segmented_rope(cfg.max_text_seq_length, rc, rs, vc, vs)
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
                attention_backend="pallas", remat=remat, donate=True,
                # match tools/bench_train.py's production memory config
                optimizer_spec=OptimizerSpec(moment_dtype="bfloat16"),
            )
            opt_state = init_opt(lora)
            t1 = time.perf_counter()
            lowered = train_step.jitted.lower(
                lora, opt_state, batch, jax.random.PRNGKey(3), params
            )
            t2 = time.perf_counter()
            compiled = lowered.compile()
            t3 = time.perf_counter()
            mem = {}
            try:
                ma = compiled.memory_analysis()
                mem = {
                    "temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
                    "arg_gb": round(ma.argument_size_in_bytes / 2**30, 2),
                    "out_gb": round(ma.output_size_in_bytes / 2**30, 2),
                }
            except Exception:
                pass
            row = {
                "layers": L, "ok": True,
                "init_s": round(t1 - t0, 1),
                "lower_s": round(t2 - t1, 1),
                "compile_s": round(t3 - t2, 1),
                **mem,
            }
            if args.execute:
                t4 = time.perf_counter()
                lora2, opt2, loss = compiled(
                    lora, opt_state, batch, jax.random.PRNGKey(3), params
                )
                row["step1_s"] = round(time.perf_counter() - t4, 1)
                row["loss"] = round(float(loss), 4)
                t5 = time.perf_counter()
                lora2, opt2, loss = compiled(
                    lora2, opt2, batch, jax.random.PRNGKey(4), params
                )
                float(loss)
                row["step2_s"] = round(time.perf_counter() - t5, 2)
                del lora2, opt2
            print(json.dumps(row), flush=True)
        except Exception:
            print(json.dumps({"layers": L, "ok": False}), flush=True)
            print(f"# FULL ERROR at L={L}:", flush=True)
            traceback.print_exc()
            sys.stdout.flush()
        finally:
            jax.clear_caches()


if __name__ == "__main__":
    main()
