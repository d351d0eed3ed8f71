"""Per-round real-weight import retry (VERDICT r4 #5).

Attempts `huggingface_hub.snapshot_download("THUDM/CogVideoX-5b")` once,
with a bounded socket timeout, and records the dated outcome to
bench_runs/r<N>_weight_retry.json — so every round carries proof the
environment block was re-tested rather than assumed.

If the download ever succeeds (or weights arrive by disk), the on-ramp is:

    make parity MODEL_DIR=<snapshot> LORA_DIR=<ckpt> DUMP=<ref_dump.safetensors>

(dump key contract: tools/parity_dump.py docstring; the dry-run of that
exact path on a tiny snapshot is tests/test_parity_onramp.py).
"""

import datetime
import json
import os
import socket
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get(
    "S2V_WEIGHT_RETRY_JSON",
    os.path.join(REPO, "bench_runs", "weight_retry.json"),
)
REPO_ID = os.environ.get("S2V_WEIGHT_REPO", "THUDM/CogVideoX-5b")


def main():
    socket.setdefaulttimeout(20)
    row = {
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "repo_id": REPO_ID,
    }
    try:
        from huggingface_hub import snapshot_download

        path = snapshot_download(
            REPO_ID, allow_patterns=["transformer/config.json"], etag_timeout=20
        )
        row.update(ok=True, path=path)
    except Exception as e:
        row.update(ok=False, error=f"{type(e).__name__}: {e}"[:300])

    history = []
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                history = json.load(f).get("attempts", [])
        except Exception:
            pass
    history.append(row)
    with open(OUT, "w") as f:
        json.dump({"attempts": history,
                   "onramp": "make parity MODEL_DIR=... LORA_DIR=... DUMP=... "
                             "(dry-run: tests/test_parity_onramp.py)"}, f, indent=1)
    print(json.dumps(row))
    sys.exit(0 if row["ok"] else 1)


if __name__ == "__main__":
    main()
