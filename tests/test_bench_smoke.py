"""bench.py must keep working (the driver runs it every round): CPU smoke
mode with a 2-step loop prints the one JSON result line.

n.b. the subprocess must force the CPU platform *in Python*: this
environment pre-registers a TPU backend via sitecustomize, so the
JAX_PLATFORMS env var alone is read too late.
"""

import json
import os
import subprocess
import sys



# jit-heavy full-coverage module (see pyproject markers); the fast tier
# (pytest -m 'not slow') keeps kernels/ops/loaders/scheduler coverage
pytestmark = __import__('pytest').mark.slow

def test_bench_cpu_smoke():
    env = dict(os.environ, S2V_BENCH_STEPS="2")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import bench; bench.main()"],
        capture_output=True, text=True, timeout=540, cwd=repo, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["serving_clips_per_hour"] > 0
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
