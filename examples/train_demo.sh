#!/usr/bin/env bash
# LoRA fine-tuning demo: train subject adapters on a folder of clips, then
# run inference with the freshly-trained checkpoint.  The reference never
# released its trainer (README: "fine-tuning code ... not released"); this
# framework's trainer targets the same 9 module families and exports
# checkpoints in the reference's safetensors key format.
set -euo pipefail

MODEL=${MODEL:-/path/to/CogVideoX-5b-snapshot}
DATA=${DATA:-/path/to/clips}   # *.mp4 + prompts.txt (one prompt per clip)
OUT=${OUT:-./lora_out}

python -m s2v_tpu.train \
    --pretrained_model_name_or_path "$MODEL" \
    --dataset_dir "$DATA" \
    --output_dir "$OUT" \
    --rank 128 --lora_alpha 64 \
    --learning_rate 1e-4 \
    --lr_scheduler cosine --lr_warmup_steps 200 \
    --gradient_accumulation_steps 4 --max_grad_norm 1.0 \
    --max_train_steps 2000 \
    --checkpointing_steps 500 \
    --validation_prompt "<cls> a pig walking on grass" --validation_steps 500 \
    --attention_backend pallas \
    --disentangled_modulation   # intended enable_lora semantics (optional)

# resume example (picks up adapters + optimizer + step):
#   python -m s2v_tpu.train ... --resume_from_checkpoint "$OUT/train_state_1000"

# FULL fine-tuning (every transformer param; FSDP-sharded state over a
# v5e-8 'data' axis — fp32 masters + adam moments are 1/8 per chip;
# exports an HF-layout snapshot at $OUT/snapshot on the final step):
#   python -m s2v_tpu.train ... --train_mode full --mesh dp8 \
#       --train_batch_size 8 --learning_rate 1e-5

python -m s2v_tpu.cli \
    --pretrained_model_name_or_path "$MODEL" \
    --checkpoint_path "$OUT" \
    --ref_img_path ./samples/pig.png \
    --prompt "<cls> A pig walking on a beach" \
    --output_dir ./out
