"""``python -m s2v_tpu.serve`` — serving daemon entry point.

Loads the pipeline once (same model-assembly flags as the inference CLI,
reference src/inference.py:37-62) and serves generation requests over a
unix socket until shutdown.  See s2v_tpu/serving/daemon.py for the
protocol.

Client one-liner:

    python -m s2v_tpu.serve --socket /tmp/s2v.sock \\
        --request '{"op": "generate", "prompt": "...", "ref_img_path": "...",
                    "output_path": "out.mp4"}'
"""

from __future__ import annotations

import argparse
import json
import os
import sys


from s2v_tpu.cli_utils import (
    ATTENTION_BACKEND_CHOICES,
    add_compilation_cache_flag,
    enable_compilation_cache,
    ensure_backend,
    str2bool as _str2bool,
    tiling_policy as _tiling_policy,
)


def get_args(argv=None):
    p = argparse.ArgumentParser(description="s2v_tpu serving daemon")
    p.add_argument("--socket", type=str, default="/tmp/s2v_tpu.sock")
    p.add_argument("--request", type=str, default=None,
                   help="client mode: send this JSON request and print the response")
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None)
    p.add_argument("--checkpoint_path", type=str, default=None, help="S2V LoRA checkpoint dir")
    p.add_argument("--lora_alpha", type=float, default=64)
    p.add_argument("--lora_mode", type=str, default="merge",
                   choices=["merge", "runtime"],
                   help="merge = fold adapters into the weights (exact, zero "
                        "overhead); runtime = keep low-rank factors separate "
                        "for ~0 s multi-tenant subject swaps (<0.5% step cost)")
    p.add_argument("--attention_backend", type=str, default="auto",
                   choices=ATTENTION_BACKEND_CHOICES,
                   help="auto = Pallas flash kernel on TPU, xla on CPU")
    p.add_argument("--attention_window", type=int, default=2,
                   help="half-width (latent frames) for --attention_backend windowed")
    p.add_argument("--quantize_int8", action="store_true", default=False)
    p.add_argument("--text_encoder_device", type=str, default="auto",
                   choices=["auto", "device", "host", "mesh"],
                   help="host keeps T5 in host RAM (cpu-offload equivalent)")
    p.add_argument("--mesh", type=str, default=None,
                   help="multi-chip device mesh, e.g. 'dp2,tp4' or 'sp8'")
    p.add_argument("--enable_tiling", type=_tiling_policy, default="auto")
    p.add_argument("--enable_slicing", type=_str2bool, default=True)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--ready_file", type=str, default=None,
                   help="touched once the socket is listening (for supervisors)")
    p.add_argument("--warmup", type=str, default=None,
                   help="JSON generate-kwargs to precompile at startup, e.g. "
                        '\'{"height": 480, "width": 720, "num_frames": 49}\'')
    add_compilation_cache_flag(p)
    return p.parse_args(argv)


def main(args=None):
    args = args or get_args()

    if args.request is not None:
        from s2v_tpu.serving.client import request

        resp = request(args.socket, json.loads(args.request))
        print(json.dumps(resp, indent=2))
        return 0 if resp.get("status") == "ok" else 1

    if not args.pretrained_model_name_or_path:
        print("daemon mode requires --pretrained_model_name_or_path", file=sys.stderr)
        return 2

    from s2v_tpu.pipelines.s2v import S2VPipeline
    from s2v_tpu.serving.daemon import ServingDaemon
    from s2v_tpu.utils.logging import get_logger

    log = get_logger("s2v_tpu.serve")
    cache_dir = enable_compilation_cache(args.compilation_cache_dir)
    ensure_backend()
    if cache_dir:
        log.info("persistent compilation cache: %s", cache_dir)
    runtime_lora = args.lora_mode == "runtime"
    pipe = S2VPipeline.from_pretrained(
        os.path.expanduser(args.pretrained_model_name_or_path),
        lora_checkpoint=None if runtime_lora else args.checkpoint_path,
        lora_alpha=args.lora_alpha,
        attention_backend=args.attention_backend,
        quantize_int8=args.quantize_int8,
        text_encoder_device=args.text_encoder_device,
        mesh=args.mesh,
    )
    if runtime_lora and args.checkpoint_path:
        pipe.load_lora(args.checkpoint_path, lora_alpha=args.lora_alpha,
                       mode="runtime")
    pipe.vae_tiling = args.enable_tiling  # True | False | "auto"
    pipe.vae_slicing = bool(args.enable_slicing)
    pipe.set_attention(args.attention_backend, args.attention_window)
    daemon = ServingDaemon(pipe, args.socket, fps=args.fps,
                           lora_checkpoint=args.checkpoint_path,
                           lora_mode=args.lora_mode,
                           lora_alpha=args.lora_alpha)

    if args.warmup:
        wu = {"op": "warmup", **json.loads(args.warmup)}
        log.info("warmup: %s", wu)
        log.info("warmup done: %s", daemon.handle(wu))

    log.info("serving on %s", args.socket)
    daemon.serve_forever(ready_file=args.ready_file)
    log.info("daemon stopped")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
