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
    assert "turbo" not in rec  # no quality artifact injected in smoke mode


def test_bench_turbo_block(tmp_path):
    """With a quality-sweep artifact present (S2V_BENCH_TURBO_JSON), the
    bench JSON line carries the quality-gated turbo block: sec/clip with
    the decode added, vs_baseline, PSNR, and the 35 dB gate verdict."""
    art = tmp_path / "tq.json"
    art.write_text(json.dumps({
        "geometry": "B=1 F=13 60x90 steps=50", "smoke": False,
        "runs": [
            {"name": "exact", "denoise_s": 404.4},
            {"name": "turbo", "denoise_s": 252.9,
             "frame_psnr_vs_exact_db": 38.5, "speedup_vs_exact": 1.6},
        ],
    }))
    env = dict(os.environ, S2V_BENCH_STEPS="2", S2V_BENCH_TURBO_JSON=str(art))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import bench; bench.main()"],
        capture_output=True, text=True, timeout=540, cwd=repo, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][0])
    t = rec["turbo"]
    assert t["quality_gate_35db"] == "pass"
    assert t["frame_psnr_vs_exact_db"] == 38.5
    # sec_per_clip = turbo denoise + this run's decode time (> denoise alone)
    assert t["sec_per_clip"] > 252.9
    assert 0 < t["vs_baseline"] < 1  # 96.89 / ~258 s


def test_bench_turbo_two_regime_gate(tmp_path):
    """VERDICT r3 #2b: when a trained-proxy sweep artifact is also present,
    a knob must clear the 35 dB gate in BOTH weight regimes to be quoted —
    a faster composite that passes on random weights but fails on the
    structured trajectory is rejected, and the quoted block carries the
    trained-regime PSNR + the combined regime label."""
    art = tmp_path / "tq.json"
    art.write_text(json.dumps({
        "geometry": "B=1 F=13 60x90 steps=50", "smoke": False,
        "runs": [
            {"name": "exact", "denoise_s": 404.4},
            {"name": "turbo_w1", "denoise_s": 230.0,
             "frame_psnr_vs_exact_db": 41.0, "speedup_vs_exact": 1.76},
            {"name": "turbo", "denoise_s": 252.9,
             "frame_psnr_vs_exact_db": 38.5, "speedup_vs_exact": 1.6},
        ],
    }))
    trained = tmp_path / "tq_trained.json"
    trained.write_text(json.dumps({
        "geometry": "B=1 F=13 60x90 steps=50", "smoke": False,
        "weights": "trained-proxy", "layers": 4,
        "runs": [
            {"name": "exact", "denoise_s": 37.8},
            # the faster composite FAILS the gate on structured weights
            {"name": "turbo_w1", "denoise_s": 21.0,
             "frame_psnr_vs_exact_db": 31.2, "speedup_vs_exact": 1.8},
            {"name": "turbo", "denoise_s": 24.0,
             "frame_psnr_vs_exact_db": 37.1, "speedup_vs_exact": 1.58},
        ],
    }))
    env = dict(os.environ, S2V_BENCH_STEPS="2",
               S2V_BENCH_TURBO_JSON=str(art),
               S2V_BENCH_TURBO_TRAINED_JSON=str(trained))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import bench; bench.main()"],
        capture_output=True, text=True, timeout=540, cwd=repo, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][0])
    t = rec["turbo"]
    # turbo_w1 is faster but fails the trained gate; turbo passes both
    assert t["knobs"].startswith("int8 linears + banded w=2")
    assert t["quality_gate_35db"] == "pass"
    assert t["frame_psnr_vs_exact_db"] == 38.5
    assert t["frame_psnr_vs_exact_db_trained"] == 37.1
    assert t["weights"] == "random+trained-proxy"


def test_turbo_quality_cpu_smoke(tmp_path):
    """tools/bench_turbo_quality.py (the VERDICT r2 #5 quality artifact) must
    keep working end-to-end: tiny-config CPU sweep over a knob subset
    (S2V_TURBO_ONLY; "exact" is always the PSNR reference), JSON + markdown
    artifacts written, every row carrying psnr/speedup/latent-err fields."""
    env = dict(
        os.environ,
        S2V_TURBO_SMOKE="1",
        S2V_TURBO_ONLY="banded_w1,cfg_skip_0.01,adaptive_0.1,int8_linears",
        S2V_TURBO_JSON=str(tmp_path / "tq.json"),
        S2V_TURBO_MD=str(tmp_path / "tq.md"),
        JAX_PLATFORMS="cpu",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "tools/bench_turbo_quality.py"],
        capture_output=True, text=True, timeout=540, cwd=repo, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads((tmp_path / "tq.json").read_text())
    names = [r["name"] for r in rec["runs"]]
    assert names == ["exact", "banded_w1", "cfg_skip_0.01", "adaptive_0.1",
                     "int8_linears"]
    for r in rec["runs"]:
        assert r["denoise_s"] > 0
        assert "frame_psnr_vs_exact_db" in r and "latent_max_abs_err" in r
        assert r["speedup_vs_exact"] > 0
    # adaptive rows record how many forwards the criterion actually skipped
    adaptive = next(r for r in rec["runs"] if r["name"] == "adaptive_0.1")
    assert isinstance(adaptive["n_skipped"], int) and adaptive["n_skipped"] >= 0
    assert (tmp_path / "tq.md").read_text().count("|") > 20


def test_train_proxy_and_trained_sweep_smoke(tmp_path):
    """tools/train_proxy.py (structured-weight proxy, VERDICT r3 #2b) +
    the turbo sweep consuming its npz: weights overlay, prompt-bank
    conditioning, 'trained-proxy' regime label."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    npz = tmp_path / "proxy.npz"
    env = dict(os.environ, S2V_PROXY_SMOKE="1", S2V_PROXY_OUT=str(npz))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "train_proxy.py")],
        capture_output=True, text=True, timeout=540, cwd=repo, env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert npz.exists()

    tq = tmp_path / "tq.json"
    env = dict(
        os.environ, S2V_TURBO_SMOKE="1", S2V_TURBO_WEIGHTS=str(npz),
        S2V_TURBO_JSON=str(tq), S2V_TURBO_MD=str(tmp_path / "tq.md"),
        S2V_TURBO_ONLY="cfg_skip_0.01", S2V_TURBO_LATENTS=str(tmp_path / "lat"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "bench_turbo_quality.py")],
        capture_output=True, text=True, timeout=540, cwd=repo, env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    rec = json.loads(tq.read_text(), parse_constant=lambda x: (_ for _ in ()).throw(ValueError(x)))
    assert rec["weights"] == "trained-proxy"
    rows = {r["name"]: r for r in rec["runs"]}
    assert rows["exact"]["frame_psnr_vs_exact_db"] is None
    skip = rows["cfg_skip_0.01"]["frame_psnr_vs_exact_db"]
    assert skip is not None and skip <= 999.0


def test_pod_day_smoke(tmp_path):
    """tools/pod_day.py (executable pod-day checklist, VERDICT r3 #4): a
    representative stage subset runs on the virtual CPU mesh (the full
    six-stage smoke takes ~5 min standalone and was timing out under CI
    contention; bench_runs/pod_day_smoke.json holds a full-run artifact)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = tmp_path / "pod_day.json"
    env = dict(os.environ, S2V_POD_DAY_SMOKE="1", S2V_POD_DAY_JSON=str(art),
               S2V_POD_DAY_STAGES="topology,ag_overlap,dit_step")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "pod_day.py")],
        capture_output=True, text=True, timeout=540, cwd=repo, env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    rec = json.loads(art.read_text())
    assert set(rec["stages"]) == {"topology", "ag_overlap", "dit_step"}
    for name, stage in rec["stages"].items():
        assert "skipped" not in stage, f"{name}: {stage}"


def test_block_ablation_smoke():
    """tools/bench_block_ablation.py: in-context per-piece block ablation
    (kernel / qk-norm+rope / adaLN monkeypatched to identities) must run the
    full flow on a tiny CPU config and emit the deltas JSON."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, S2V_ABLATE_SMOKE="1")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "bench_block_ablation.py")],
        capture_output=True, text=True, timeout=540, cwd=repo, env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    rec = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    assert set(rec["deltas_ms"]) == {"attention_incl_relayout", "qknorm_rope",
                                     "adaln_x2", "linears_plus_rest"}
    assert rec["ms_per_layer"]["full"] > 0


def test_t5_host_bench_smoke(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = tmp_path / "t5.json"
    env = dict(os.environ, S2V_T5_BENCH_TINY="1", S2V_T5_BENCH_JSON=str(art))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "bench_t5_host.py")],
        capture_output=True, text=True, timeout=540, cwd=repo, env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    rec = json.loads(art.read_text())
    assert {r["dtype"] for r in rec["runs"]} == {"bfloat16", "float32"}


def _run_bench(env_extra, timeout=540):
    env = dict(os.environ, **env_extra)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import bench; bench.main()"],
        capture_output=True, text=True, timeout=timeout, cwd=repo, env=env,
    )


def test_bench_survives_midrun_hang():
    """VERDICT r4 #1: a phase hang after the forward measurement must still
    produce a parsed non-null JSON line — the watchdog emits the best
    partial result (labeled) and exits 0 instead of dying on the driver's
    timeout."""
    out = _run_bench({
        "S2V_BENCH_STEPS": "2",
        "S2V_BENCH_BUDGET_S": "45",
        "S2V_BENCH_TEST_HANG_PHASE": "post_fwd",
        "S2V_BENCH_TEST_HANG_S": "3600",
    }, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert rec["value"] is not None and rec["value"] > 0
    assert rec["vs_baseline"] > 0
    assert rec["measurement"]["partial"] is True
    assert "extrapolated" in rec["measurement"]["denoise"]
    assert "watchdog" in out.stderr


def test_bench_survives_pre_measurement_hang():
    """A hang before ANY measurement exists must emit the last committed
    on-chip number explicitly labeled stale — provenance over null."""
    out = _run_bench({
        "S2V_BENCH_STEPS": "2",
        "S2V_BENCH_BUDGET_S": "20",
        "S2V_BENCH_TEST_HANG_PHASE": "pre_fwd",
        "S2V_BENCH_TEST_HANG_S": "3600",
    }, timeout=90)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][0])
    assert rec["stale"] is True
    assert rec["value"] == 396.907  # bench.LAST_GOOD
    assert "STALE" in rec["measurement"]["denoise"]


def test_bench_budget_truncates_denoise_loop():
    """When the budget can't fit the full measured loop, the result is an
    extrapolation from the measured prefix with an explicit measured_steps
    label (never silently quoted as a full measurement)."""
    # 8 steps, seg_len = 2; hang nothing, but shrink the budget so the VAE
    # reserve forces an early stop. On CPU each tiny segment is fast, so
    # use a generous-but-finite budget and assert the labeling contract on
    # whatever was measured.
    out = _run_bench({"S2V_BENCH_STEPS": "8"}, timeout=540)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][0])
    m = rec["measurement"]
    assert m["measured_steps"] >= 1
    if m["measured_steps"] >= 8:
        assert m["denoise"] == "measured"
    else:
        assert f"extrapolated from {m['measured_steps']}" in m["denoise"]
    assert m["decode"] == "measured"
