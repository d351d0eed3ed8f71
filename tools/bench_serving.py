"""Serving throughput artifact (VERDICT r3 #6) — bench_runs/r04_serving.json.

Three sections, each measured where it is honest to measure it:

  1. step_times / clips_per_hour (REAL CHIP): the flagship 42-layer DiT
     forward at serving batch sizes — batched-CFG single clip (one 2B
     forward/step) vs sequential-CFG multi-clip batches (two B-clip
     forwards/step share weights traffic and pack the MXU with more rows).
     clips/hour = 3600 / (steps * step_s / clips + decode_s), decode from
     the bench's measured 3.98 s untiled figure per clip.
  2. lora_swap (REAL CHIP): tools/bench_lora_swap.py timings parsed into
     rows — merge swaps vs runtime-factor swaps.  This is the
     beating-the-reference story: the reference reloads the process to
     swap subjects (src/inference.py:172-247).
  3. daemon (CPU tiny geometry): concurrent-request behavior of serve.py —
     requests queue FIFO on the single compiled executable, repeat
     geometry reports compiled=false (cache hit).  Geometry is tiny so
     the numbers characterize QUEUEING, not model speed.

Chip discipline: forward batches are sized against a 14.5 GB HBM budget
before dispatch (an on-chip OOM wedges the axon relay — memory/).
S2V_SERVING_SMOKE=1 runs sections 1+3 tiny on CPU.
"""

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE = bool(os.environ.get("S2V_SERVING_SMOKE"))
JSON_OUT = os.environ.get(
    "S2V_SERVING_JSON", os.path.join(REPO, "bench_runs", "r04_serving.json")
)
DECODE_S = 3.98  # measured untiled flagship decode (bench_runs, round 3)
STEPS = 50


def main():
    if not SMOKE:
        from s2v_tpu.cli_utils import probe_backend

        result = probe_backend(int(os.environ.get("S2V_BENCH_INIT_TIMEOUT", "120")))
        if "devices" not in result:
            print(f"# FATAL: backend init failed/timed out: {result}", flush=True)
            os._exit(2)

    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from s2v_tpu.config import TransformerConfig
    from s2v_tpu.models.transformer import (
        init_transformer_params_stacked,
        transformer_forward,
    )
    from s2v_tpu.ops.rope import build_segmented_rope, prepare_video_and_ref_rope

    out = {"sections": {}}

    def flush():
        os.makedirs(os.path.dirname(JSON_OUT), exist_ok=True)
        with open(JSON_OUT, "w") as f:
            json.dump(out, f, indent=1)

    # ---- section 1: flagship step times at serving batch sizes
    if SMOKE:
        cfg = TransformerConfig.tiny()
        F, H, W = 2, 8, 8
        backend = "xla"
        batches = (2, 4)
        iters = 1
        from s2v_tpu.ops.rope import get_3d_rotary_pos_embed

        gh, gw = H // 2, W // 2
        cos, sin = get_3d_rotary_pos_embed(
            cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), F + 1
        )
        tok = gh * gw
        rope_cos, rope_sin = build_segmented_rope(
            cfg.max_text_seq_length, cos[:tok], sin[:tok],
            cos[tok : tok * (F + 1)], sin[tok : tok * (F + 1)],
        )
    else:
        cfg = TransformerConfig.cogvideox_5b()
        F, H, W = 13, 60, 90
        backend = "pallas"
        batches = (2, 4)  # forward batch: 2 = CFG pair / 2-clip seq-CFG half
        iters = 2
        vc, vs, rc, rs = prepare_video_and_ref_rope(480, 720, F, cfg.attention_head_dim)
        rope_cos, rope_sin = build_segmented_rope(cfg.max_text_seq_length, rc, rs, vc, vs)

    key = jax.random.PRNGKey(0)
    params = init_transformer_params_stacked(key, cfg)
    jax.block_until_ready(jax.tree.leaves(params)[0])

    step_rows = []
    for B in batches:
        # HBM guard: weights 11.1 GB + ~1.2 GB/batch-row of activation
        # high-water at flagship geometry; stay under 14.5 GB
        if not SMOKE and 11.1e9 + B * 1.0e9 > 14.5e9:
            step_rows.append({"fwd_batch": B, "skipped": "HBM budget"})
            continue
        video = jax.random.normal(key, (B, F, H, W, cfg.in_channels), cfg.dtype)
        ref = jax.random.normal(key, (B, 1, H, W, cfg.in_channels), cfg.dtype)
        text = jax.random.normal(
            key, (B, cfg.max_text_seq_length, cfg.text_embed_dim), cfg.dtype
        )
        t = jnp.full((B,), 500, jnp.int32)
        fwd = jax.jit(lambda p, v, r, te, ts: transformer_forward(
            p, cfg, v, r, te, ts, rope_cos, rope_sin, attention_backend=backend
        ).astype(jnp.float32).sum())
        o = fwd(params, video, ref, text, t)
        float(o)  # real fetch (relay: block_until_ready returns early)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fwd(params, video, ref, text, t)
        float(o)
        dt = (time.perf_counter() - t0) / iters
        step_rows.append({"fwd_batch": B, "fwd_s": round(dt, 3)})
        print(f"# fwd B={B}: {dt:.3f} s", flush=True)
        del video, ref, text
    out["sections"]["step_times"] = step_rows

    def _fwd(b):
        return next((r["fwd_s"] for r in step_rows if r.get("fwd_batch") == b
                     and "fwd_s" in r), None)

    cph = []
    if _fwd(2):
        sec = STEPS * _fwd(2) + DECODE_S
        cph.append({"mode": "batched-CFG, 1 clip", "sec_per_clip": round(sec, 1),
                    "clips_per_hour": round(3600 / sec, 2)})
        sec2 = (STEPS * 2 * _fwd(2) + 2 * DECODE_S) / 2
        cph.append({"mode": "sequential-CFG, 2-clip batch",
                    "sec_per_clip": round(sec2, 1),
                    "clips_per_hour": round(3600 / sec2, 2)})
    if _fwd(4):
        sec4 = (STEPS * 2 * _fwd(4) + 4 * DECODE_S) / 4
        cph.append({"mode": "sequential-CFG, 4-clip batch",
                    "sec_per_clip": round(sec4, 1),
                    "clips_per_hour": round(3600 / sec4, 2)})
    out["sections"]["clips_per_hour"] = cph
    flush()
    del params
    jax.clear_caches()
    import gc

    gc.collect()

    # ---- section 2: LoRA swap latencies (chip only; fabricates ~14 GB)
    if not SMOKE and os.environ.get("S2V_SERVING_SKIP_SWAP") != "1":
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "bench_lora_swap.py")],
                capture_output=True, text=True, timeout=3600,
            )
            rows = []
            for line in (p.stdout or "").splitlines():
                m = re.match(r"(.+?):\s+([0-9.]+) s(?:\s+\((.*)\))?$", line.strip())
                if m:
                    rows.append({"op": m.group(1).strip(), "s": float(m.group(2)),
                                 **({"note": m.group(3)} if m.group(3) else {})})
            out["sections"]["lora_swap"] = {"rc": p.returncode, "rows": rows}
            print(f"# lora_swap: {len(rows)} rows rc={p.returncode}", flush=True)
        except Exception as e:
            out["sections"]["lora_swap"] = {"error": f"{type(e).__name__}: {e}"[:200]}
        flush()

    # ---- section 3: daemon queueing (tiny geometry, CPU)
    try:
        out["sections"]["daemon"] = _daemon_queueing()
    except Exception as e:
        out["sections"]["daemon"] = {"error": f"{type(e).__name__}: {e}"[:300]}
    flush()
    print(json.dumps({"out": JSON_OUT, "sections": list(out["sections"])}))


def _daemon_queueing():
    """Tiny-geometry daemon: 3 concurrent generate requests over one
    socket-served pipeline — FIFO queueing on the compiled executable,
    repeats report compiled=false."""
    import numpy as np
    import tempfile
    import threading

    work = tempfile.mkdtemp(prefix="s2v_serving_")
    snap = os.path.join(work, "snap")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_tiny_snapshot.py"), snap],
        check=True, capture_output=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    try:
        import cv2  # noqa: F401
        ref = os.path.join(work, "ref.png")
        cv2.imwrite(ref, np.zeros((32, 32, 3), np.uint8))
    except Exception:
        from PIL import Image

        ref = os.path.join(work, "ref.png")
        Image.new("RGB", (32, 32)).save(ref)

    sock = os.path.join(work, "s2v.sock")
    ready = os.path.join(work, "ready")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    daemon = subprocess.Popen(
        [sys.executable, "-m", "s2v_tpu.serve",
         "--pretrained_model_name_or_path", snap,
         "--socket", sock, "--ready_file", ready],
        env=env, cwd=work, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        t0 = time.perf_counter()
        while not os.path.exists(ready):
            if daemon.poll() is not None:
                raise RuntimeError("daemon died: " + (daemon.stdout.read() or "")[-500:])
            if time.perf_counter() - t0 > 300:
                raise TimeoutError("daemon ready_file timeout")
            time.sleep(0.5)
        startup_s = time.perf_counter() - t0

        results = [None] * 3

        def request(i):
            req = {"op": "generate", "prompt": f"a pig {i}", "ref_img_path": ref,
                   "output_path": os.path.join(work, f"out{i}.mp4"),
                   "height": 32, "width": 32, "num_frames": 5,
                   "num_inference_steps": 2, "seed": i}
            t0 = time.perf_counter()
            p = subprocess.run(
                [sys.executable, "-m", "s2v_tpu.serve", "--socket", sock,
                 "--request", json.dumps(req)],
                capture_output=True, text=True, timeout=600, env=env, cwd=work,
            )
            body = {}
            txt = p.stdout or ""
            if "{" in txt:
                try:
                    body = json.loads(txt[txt.index("{"):])  # indent=2 output
                except Exception:
                    body = {"parse_error": txt[-200:]}
            results[i] = {"wall_s": round(time.perf_counter() - t0, 2),
                          "compiled": body.get("compiled"),
                          "ok": body.get("ok", p.returncode == 0)}

        threads = [threading.Thread(target=request, args=(i,)) for i in range(3)]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        total = time.perf_counter() - t0
        subprocess.run(
            [sys.executable, "-m", "s2v_tpu.serve", "--socket", sock,
             "--request", json.dumps({"op": "shutdown"})],
            capture_output=True, text=True, timeout=60, env=env, cwd=work,
        )
        compiled_counts = sorted(str(r["compiled"]) for r in results if r)
        return {
            "geometry": "tiny 32x32x5 (queueing characterization, not model speed)",
            "startup_s": round(startup_s, 1),
            "concurrent_requests": results,
            "wall_total_s": round(total, 2),
            "note": "FIFO on one executable; exactly one request compiles "
                    f"(compiled flags: {compiled_counts})",
        }
    finally:
        if daemon.poll() is None:
            daemon.terminate()
            try:
                daemon.wait(timeout=30)
            except Exception:
                daemon.kill()
        import shutil

        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
