"""tools/bench_serving_flagship.py (the VERDICT r4 #3 artifact) must keep
working end-to-end: daemon boot, adapter attach, cold request -> mp4,
same-rank runtime hot-swap with executable survival (compiled=false on the
post-swap request), artifact JSON written — all at tiny geometry on CPU.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # subprocess daemon + 2 generates


def test_serving_flagship_smoke(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = tmp_path / "serving.json"
    env = dict(
        os.environ,
        S2V_SERVING_SMOKE="1",
        S2V_SERVING_JSON=str(art),
        S2V_SERVING_WORKDIR=str(tmp_path / "work"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "bench_serving_flagship.py")],
        capture_output=True, text=True, timeout=540, cwd=repo, env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    rec = json.loads(art.read_text())
    d = rec["daemon_flagship"]
    assert rec["smoke"] is True
    assert d["cold_request"]["mp4_bytes"] > 0
    assert d["lora_hot_swap"]["compiled_configs_kept"] >= 1
    # the hot-swap must keep the executable: warm request is a cache hit
    assert d["warm_request"]["compiled"] is False
    assert d["warm_request"]["seconds"] < d["cold_request"]["seconds"]
    assert d["clips_per_hour_warm"] > 0
