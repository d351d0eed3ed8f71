#!/usr/bin/env bash
# Serving-daemon demo: start a resident pipeline process, warm the 480p
# executable, then serve clips over the unix socket (each request skips
# model load AND compile).  Mirrors the one-shot demo in
# s2v_inference_demo.sh but for production-style serving.
set -euo pipefail

MODEL=${MODEL:-/path/to/CogVideoX-5b-snapshot}
LORA=${LORA:-/path/to/s2v_lora_checkpoint}
SOCK=${SOCK:-/tmp/s2v_tpu.sock}

rm -f /tmp/s2v_ready  # a stale ready file would defeat the wait loop

# 1. daemon (stays up; --warmup compiles the 49x480x720 @50-step program
#    before the first request arrives)
python -m s2v_tpu.serve \
    --pretrained_model_name_or_path "$MODEL" \
    --checkpoint_path "$LORA" \
    --attention_backend pallas \
    --socket "$SOCK" \
    --ready_file /tmp/s2v_ready \
    --warmup '{"height": 480, "width": 720, "num_frames": 49, "num_inference_steps": 50}' &

while [ ! -f /tmp/s2v_ready ]; do sleep 1; done

# 2. requests (fast path: compiled executable + HBM-resident weights)
python -m s2v_tpu.serve --socket "$SOCK" --request '{
  "op": "generate",
  "prompt": "<cls> A pig walking on a beach",
  "ref_img_path": "./samples/pig.png",
  "output_path": "./out/pig_beach.mp4",
  "seed": 420
}'

python -m s2v_tpu.serve --socket "$SOCK" --request '{
  "op": "generate",
  "prompt": "<cls> A pig surfing a wave at sunset",
  "ref_img_path": "./samples/pig.png",
  "output_path": "./out/pig_surf.mp4",
  "seed": 7
}'

# 3. multi-subject: switch the LoRA adapter without restarting the daemon
#    (compiled executables survive; or put "lora_checkpoint" directly in a
#    generate request and the daemon swaps only when it differs)
python -m s2v_tpu.serve --socket "$SOCK" --request '{
  "op": "load_lora", "checkpoint_path": "/ckpts/subjectB"
}'
python -m s2v_tpu.serve --socket "$SOCK" --request '{
  "op": "generate",
  "prompt": "<cls> A corgi chasing a ball in the park",
  "ref_img_path": "./samples/corgi.png",
  "output_path": "./out/corgi_park.mp4",
  "lora_checkpoint": "/ckpts/subjectB",
  "seed": 11
}'

# 3b. multiplexing MANY subjects on one chip: runtime mode keeps adapters
#     as unmerged low-rank factors (per-swap cost ~0.4 GB upload, ~0 s for
#     the device-cached last 4, <0.5% per-step overhead).  Start the
#     daemon with --lora_mode runtime to make this the default instead.
python -m s2v_tpu.serve --socket "$SOCK" --request '{
  "op": "generate",
  "prompt": "<cls> A cat napping on a windowsill",
  "ref_img_path": "./samples/cat.png",
  "output_path": "./out/cat_window.mp4",
  "lora_checkpoint": "/ckpts/subjectC",
  "lora_mode": "runtime",
  "seed": 3
}'

python -m s2v_tpu.serve --socket "$SOCK" --request '{"op": "stats"}'
python -m s2v_tpu.serve --socket "$SOCK" --request '{"op": "shutdown"}'
