#!/usr/bin/env bash
# Demo launch mirroring the reference s2v_inference_demo.sh:1-10
# (single-accelerator run, <cls>-prefixed prompt, 480x720x49f defaults).
set -e

MODEL_DIR=${MODEL_DIR:-"$HOME/checkpoints/CogVideoX-5b"}
LORA_DIR=${LORA_DIR:-"$HOME/checkpoints/s2v_lora_ckpt"}

python -m s2v_tpu.cli \
    --pretrained_model_name_or_path "$MODEL_DIR" \
    --checkpoint_path "$LORA_DIR" \
    --ref_img_path ./samples/pig.png \
    --prompt "<cls> A pig walking on a beach at sunset" \
    --guidance_scale 6.0 \
    --seed 420 \
    --output_dir ./out
