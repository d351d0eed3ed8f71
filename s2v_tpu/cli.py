"""Inference CLI — argparse-compatible with the reference driver
(src/inference.py:37-62 flags; s2v_inference_demo.sh usage):

    python -m s2v_tpu.cli \
        --pretrained_model_name_or_path /path/to/CogVideoX-5b-snapshot \
        --checkpoint_path /path/to/s2v_lora_ckpt \
        --ref_img_path ./samples/pig.png \
        --prompt "<cls> A pig walking on a beach" \
        --output_dir ./out

Differences from the reference CLI are deliberate TPU-isms only: LoRA is
merged at init and the denoise loop runs as one jitted XLA program.
Weights load from a local HF snapshot dir or a hub repo id (downloaded via
huggingface_hub when the network is allowed — s2v_tpu/loaders/resolve.py).
"""

from __future__ import annotations

import argparse
import os
import time


from s2v_tpu.cli_utils import (
    ATTENTION_BACKEND_CHOICES,
    add_compilation_cache_flag,
    enable_compilation_cache,
    ensure_backend,
    str2bool as _str2bool,
    tiling_policy as _tiling_policy,
)


def get_args(argv=None):
    p = argparse.ArgumentParser(description="TPU-native disentangled subject-to-video inference")
    p.add_argument("--pretrained_model_name_or_path", type=str, default="THUDM/CogVideoX-5b",
                   help="Local HF snapshot dir with transformer/ vae/ text_encoder/ tokenizer/ scheduler/")
    # default None: huggingface_hub then uses its standard cache
    # (~/.cache/huggingface/hub) — pointing it elsewhere would re-download
    # snapshots a user already has
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--dataset_name", type=str, default="customization")
    p.add_argument("--dataloader_num_workers", type=int, default=16)
    p.add_argument("--ref_img_path", type=str, default=None,
                   help="subject reference image (required unless --pipeline t2v)")
    p.add_argument("--pipeline", type=str, default="s2v", choices=("s2v", "t2v"),
                   help="s2v = subject-conditioned (reference default); t2v = "
                        "plain text-to-video with NO ref stream (stock "
                        "CogVideoX semantics for unmodified checkpoints)")
    p.add_argument("--guidance_scale", type=float, default=6.0)
    p.add_argument("--use_dynamic_cfg", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=420)
    p.add_argument("--rank", type=int, default=128)
    p.add_argument("--lora_alpha", type=float, default=64)
    p.add_argument("--output_dir", type=str, default="cogvideox-lora")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=720)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--max_num_frames", type=int, default=49)
    p.add_argument("--skip_frames_start", type=int, default=0)
    p.add_argument("--skip_frames_end", type=int, default=0)
    p.add_argument("--enable_slicing", type=_str2bool, default=True)
    p.add_argument("--enable_tiling", type=_tiling_policy, default="auto",
                   help="true | false | auto (default: tile only above the VAE native size; at 480p auto = untiled exact decode, 3.98 vs 5.27 s measured)")
    p.add_argument("--hub_model_id", type=str, default=None)
    p.add_argument("--local_reference_scale", type=float, default=1.0)  # inert in reference too
    p.add_argument("--checkpoint_path", type=str, default=None, help="S2V LoRA checkpoint dir")
    p.add_argument("--prompt", type=str, default="")
    # TPU-specific extras
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--use_dpm", action="store_true", default=False)
    p.add_argument("--attention_backend", type=str, default="auto",
                   choices=ATTENTION_BACKEND_CHOICES,
                   help="auto = Pallas flash kernel on TPU, xla on CPU")
    p.add_argument("--attention_window", type=int, default=2,
                   help="half-width (latent frames) for --attention_backend windowed")
    p.add_argument("--quantize_int8", action="store_true", default=False,
                   help="int8 weight+dynamic-activation serving fast path (~8%% faster, tiny quality cost)")
    p.add_argument("--text_encoder_device", type=str, default="auto",
                   choices=["auto", "device", "host", "mesh"],
                   help="host keeps T5 in host RAM (cpu-offload equivalent)")
    p.add_argument("--disentangled_modulation", action="store_true", default=False,
                   help="intended (non-inert) enable_lora adaLN semantics: "
                        "video/text modulated by base weights, ref by LoRA-merged")
    # reference src/inference.py:191,210 loads fp16 for non-"5b"
    # checkpoints; on TPU fp16 has no native MXU support and a narrower
    # exponent range than bf16, so both model families deliberately
    # default to bf16 here — pass --dtype float16 for the reference's
    # non-5b storage dtype when byte-level parity matters
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float16", "float32"])
    p.add_argument("--adaptive_threshold", type=float, default=0.0,
                   help="opt-in step-skipping fast path (bounded-difference "
                        "criterion, arXiv:2410.09873-style); 0 = exact loop. "
                        "Try 0.01-0.02")
    p.add_argument("--cfg_skip_threshold", type=float, default=0.0,
                   help="opt-in CFG-skip fast path: skip the uncond forward "
                        "once the dynamic guidance scale has decayed to "
                        "g - 1 < threshold (error bounded by (g-1)*|cond-uncond|); "
                        "0 = exact. Only useful with --use_dynamic_cfg")
    p.add_argument("--segment_steps", type=int, default=0,
                   help=">0: run the denoise loop in host-stepped segments of N "
                        "steps (enables interrupt/callbacks; required on relays "
                        "that cap single-execution wall time)")
    p.add_argument("--mesh", type=str, default=None,
                   help="multi-chip device mesh, e.g. 'dp2,tp4' or 'sp8' "
                        "(dp/data, tp/model, sp/seq axes; sizes must "
                        "multiply to <= device count). Shards the "
                        "transformer (tp), tokens (sp), and batch (dp); a "
                        "seq axis also enables context-parallel VAE decode")
    p.add_argument("--progress", action="store_true", default=False,
                   help="per-step progress from inside the fused denoise loop "
                        "(host callback; on relayed devices prefer --segment_steps)")
    p.add_argument("--profile_dir", type=str, default=None, help="jax.profiler trace output dir")
    p.add_argument("--save_merged_dir", type=str, default=None,
                   help="also export the loaded (LoRA-merged) weights as an "
                        "HF-layout snapshot to this dir (save_pretrained)")
    add_compilation_cache_flag(p)
    return p.parse_args(argv)


def main(args=None):
    args = args or get_args()
    # frame-count validation happens in generate(): rotary (5b) models
    # accept clips beyond the reference's 49-frame cap, sincos (2b) models
    # keep it (static positional table)
    if args.pipeline != "t2v" and not args.ref_img_path:
        raise SystemExit("--ref_img_path is required (or use --pipeline t2v)")
    os.makedirs(args.output_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from s2v_tpu.pipelines.s2v import S2VPipeline
    from s2v_tpu.utils.video import export_to_video, to_uint8_frames

    enable_compilation_cache(args.compilation_cache_dir)
    ensure_backend()
    t0 = time.perf_counter()
    pipe = S2VPipeline.from_pretrained(
        os.path.expanduser(args.pretrained_model_name_or_path),
        lora_checkpoint=args.checkpoint_path,
        lora_alpha=args.lora_alpha,
        attention_backend=args.attention_backend,
        quantize_int8=args.quantize_int8,
        text_encoder_device=args.text_encoder_device,
        disentangled_modulation=args.disentangled_modulation,
        dtype={"bfloat16": jnp.bfloat16, "float16": jnp.float16,
               "float32": jnp.float32}[args.dtype],
        mesh=args.mesh,
        cache_dir=os.path.expanduser(args.cache_dir) if args.cache_dir else None,
    )
    pipe.vae_tiling = args.enable_tiling  # True | False | "auto"
    pipe.vae_slicing = bool(args.enable_slicing)
    pipe.set_attention(args.attention_backend, args.attention_window)
    print(f"[s2v_tpu] models loaded in {time.perf_counter() - t0:.1f}s on {jax.devices()}")

    if args.save_merged_dir:
        pipe.save_pretrained(os.path.expanduser(args.save_merged_dir))
        print(f"[s2v_tpu] merged snapshot written to {args.save_merged_dir}")

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    t1 = time.perf_counter()
    progress = None
    if args.segment_steps > 0:
        # per-segment progress (the reference shows a tqdm bar per denoise
        # step, pipeline_utils.py:1555; the fused XLA loop has no host
        # round-trips to hook, but the segmented loop does).  Times are
        # per-segment; the first segment also carries the XLA compile.
        _last = [time.perf_counter()]

        def progress(i, _lat):
            now = time.perf_counter()
            note = " incl. compile" if i <= args.segment_steps else ""
            print(f"[s2v_tpu] denoise {i}/{args.num_inference_steps} steps "
                  f"(+{now - _last[0]:.0f}s{note})", flush=True)
            _last[0] = now

    if args.pipeline == "t2v":
        from s2v_tpu.pipelines.variants import generate_t2v

        video = generate_t2v(
            pipe,
            prompt=args.prompt,
            height=args.height,
            width=args.width,
            num_frames=args.max_num_frames,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
            use_dynamic_cfg=args.use_dynamic_cfg,
            seed=args.seed,
        )
    else:
        video = pipe.generate(
            prompt=args.prompt,
            ref_image=args.ref_img_path,
            height=args.height,
            width=args.width,
            num_frames=args.max_num_frames,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
            use_dynamic_cfg=args.use_dynamic_cfg,
            use_dpm=args.use_dpm,
            seed=args.seed,
            adaptive_threshold=args.adaptive_threshold,
            cfg_skip_threshold=args.cfg_skip_threshold,
            segment_steps=args.segment_steps,
            callback_on_segment_end=progress,
            progress=args.progress,
        )
    if args.profile_dir:
        jax.profiler.stop_trace()
    dt = time.perf_counter() - t1
    print(f"[s2v_tpu] generated {video.shape} in {dt:.1f}s "
          f"({args.num_inference_steps / dt:.2f} steps/s incl. VAE)")

    out_path = os.path.join(args.output_dir, "output.mp4")
    written = export_to_video(to_uint8_frames(video[0]), out_path, fps=args.fps)
    print(f"[s2v_tpu] wrote {written}")
    print("Inference completed")


if __name__ == "__main__":
    main()
