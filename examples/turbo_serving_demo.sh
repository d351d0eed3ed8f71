#!/usr/bin/env bash
# "Turbo" serving: every opt-in fast path stacked on the resident daemon.
# Measured on one v5e chip at the flagship 49x480x720 @50-step geometry:
# 252.9 s/clip vs 404.4 s exact (1.60x) for int8 linears + banded window
# + CFG-skip (tools/bench_turbo.py).  All three approximations have bounded / tested
# error characteristics (see STATUS.md); drop any flag to back it out.
set -euo pipefail

MODEL=${MODEL:-/path/to/CogVideoX-5b-snapshot}
LORA=${LORA:-/path/to/s2v_lora_checkpoint}
SOCK=${SOCK:-/tmp/s2v_tpu.sock}
READY="${SOCK}.ready"  # per-socket, so concurrent demos don't race

rm -f "$READY"

python -m s2v_tpu.serve \
    --pretrained_model_name_or_path "$MODEL" \
    --checkpoint_path "$LORA" \
    --quantize_int8 \
    --attention_backend windowed --attention_window 2 \
    --socket "$SOCK" \
    --ready_file "$READY" \
    --warmup '{"height": 480, "width": 720, "num_frames": 49,
               "num_inference_steps": 50, "use_dynamic_cfg": true,
               "cfg_skip_threshold": 0.01}' &
DAEMON_PID=$!

# wait for the ready file, but bail out if the daemon died (bad MODEL path
# etc. — a plain wait loop would spin forever)
while [ ! -f "$READY" ]; do
    kill -0 "$DAEMON_PID" 2>/dev/null || { echo "daemon exited before ready" >&2; exit 1; }
    sleep 1
done

# per-request knobs: dynamic CFG enables the CFG-skip path; add
# "adaptive_threshold": 0.01 to stack bounded-difference step skipping too
python -m s2v_tpu.serve --socket "$SOCK" --request '{
  "op": "generate",
  "prompt": "<cls> A pig walking on a beach",
  "ref_img_path": "./samples/pig.png",
  "output_path": "./out/pig_beach_turbo.mp4",
  "use_dynamic_cfg": true,
  "cfg_skip_threshold": 0.01,
  "seed": 420
}'

python -m s2v_tpu.serve --socket "$SOCK" --request '{"op": "shutdown"}'
