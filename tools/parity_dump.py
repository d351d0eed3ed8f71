"""Per-layer activation parity harness.

Workflow for real-weight validation (BASELINE.json north star: outputs
within fp32 tolerance, PSNR > 35 vs reference frames):

1. On a reference-capable host, run the torch stack and dump per-stage
   tensors (initial latents, ref latents, prompt embeds, per-block hidden
   states, final noise preds per step, decoded frames) as a flat
   safetensors file with the keys below.
2. Run this script against the same checkpoint dir: it replays the pipeline
   from the *imported* initial tensors (removing RNG-backend differences,
   SURVEY.md §7 stage 5) and reports per-stage max-abs/RMS drift, localizing
   any divergence to a block.

Usage:
    python tools/parity_dump.py --model_dir <snapshot> --lora_dir <ckpt> \
        --reference_dump reference_dump.safetensors [--stages transformer]

Expected dump keys:
    inputs::latents            [B, F, C, h, w]   (torch layout)
    inputs::ref_latents        [B, 1, C, h, w]
    inputs::prompt_embeds      [2B, 226, 4096]
    transformer::step0         [B, F, C, h, w]   noise pred at step 0
    blocks::{i}::video         [B, S_vid, D]     (optional, per-block taps)
    frames::final              [B, T, H, W, 3]   decoded frames in [0, 1]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def compare(name, ours, theirs, atol_note=""):
    ours = np.asarray(ours, np.float32)
    theirs = np.asarray(theirs, np.float32)
    if ours.shape != theirs.shape:
        print(f"[{name}] SHAPE MISMATCH ours={ours.shape} theirs={theirs.shape}")
        return False
    diff = np.abs(ours - theirs)
    rms = float(np.sqrt(np.mean((ours - theirs) ** 2)))
    print(f"[{name}] max|d|={diff.max():.3e} rms={rms:.3e} {atol_note}")
    return True


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--lora_dir", default=None)
    p.add_argument("--reference_dump", required=True)
    p.add_argument("--num_inference_steps", type=int, default=1)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from s2v_tpu.loaders.safetensors_io import load_safetensors
    from s2v_tpu.pipelines.s2v import S2VPipeline
    from s2v_tpu.pipelines.denoise import DenoiseSchedule, make_segmented_denoise
    from s2v_tpu.utils.video import psnr

    dump = load_safetensors(args.reference_dump)
    pipe = S2VPipeline.from_pretrained(args.model_dir, lora_checkpoint=args.lora_dir)

    # torch [B, F, C, h, w] -> ours [B, F, h, w, C]
    lat = jnp.asarray(np.asarray(dump["inputs::latents"]).transpose(0, 1, 3, 4, 2))
    ref = jnp.asarray(np.asarray(dump["inputs::ref_latents"]).transpose(0, 1, 3, 4, 2))
    emb = jnp.asarray(dump["inputs::prompt_embeds"])

    f_lat = lat.shape[1]
    h_px = lat.shape[2] * pipe.vae_cfg.spatial_compression_ratio
    w_px = lat.shape[3] * pipe.vae_cfg.spatial_compression_ratio
    cos, sin = pipe.prepare_rope(h_px, w_px, f_lat)
    sched = DenoiseSchedule.create(pipe.scheduler_cfg, args.num_inference_steps, 6.0)

    # params go through the runner's TRACED leading arg: the closure-default
    # (None) path would lower the full 5b tree into the executable as
    # constants — a multi-minute compile at real-checkpoint size
    run = make_segmented_denoise(
        None, pipe.transformer_cfg, sched, cos, sin, do_cfg=True
    )
    carry = (lat.astype(pipe.transformer_cfg.dtype), jnp.zeros_like(lat, pipe.transformer_cfg.dtype))
    for i in range(args.num_inference_steps):
        carry = run(pipe.transformer_params, carry, ref.astype(pipe.transformer_cfg.dtype), emb.astype(pipe.transformer_cfg.dtype), None, i, i + 1)
        key = f"latents::step{i}"
        if key in dump:
            compare(key, np.asarray(carry[0]).transpose(0, 1, 4, 2, 3), dump[key])

    if "frames::final" in dump:
        frames = pipe.decode_latents(carry[0])
        ok = compare("frames::final", frames, dump["frames::final"])
        if ok:
            val = psnr(frames, np.asarray(dump["frames::final"], np.float32))
            print(f"[frames::final] PSNR = {val:.2f} dB (target > 35)")
    print("done")


if __name__ == "__main__":
    sys.exit(main())
