"""Flagship daemon-serving artifact (VERDICT r4 #3) — drives ONE real
request through the unix-socket serving daemon at the full 49x480x720
geometry on the chip, then a LoRA hot-swap and a warm post-swap request at
the same geometry: bench_runs/r05_serving.json.

What this measures that tools/bench_serving.py's round-4 artifact did not:
the daemon's END-TO-END path (socket -> tokenize -> T5 encode -> ref-image
VAE encode -> 50-step segmented denoise -> VAE decode -> native mp4 mux ->
bytes on disk) at the flagship geometry, not a tiny queueing
characterization.  Reference analog: the complete path of
src/inference.py:266-270 + video_generate.py:60-66, which the reference
pays model-load + no compile-cache for on EVERY clip.

Weights: random 5b transformer + flagship VAE (identical FLOP/memory
profile to pretrained — real checkpoint bytes cannot enter this
environment, STATUS.md) and a TINY-PROXY T5 (d_model matches the DiT's
4096-dim text stream; XXL host encode is measured separately in
bench_runs/t5_host.json and is amortized by the daemon's prompt-embed
cache).  Labels ride the artifact.

Protocol driven (all through the socket, one connection per request —
the daemon drops idle connections after 30 s by design):
  1. ping (startup latency)
  2. load_lora — attach subject adapter #1 (runtime mode, rank 64).  The
     multi-tenant serving contract is adapter->adapter swaps: attaching
     factors where none existed changes the program structure (base-only
     vs base+factors executables), so the resident daemon holds a factor
     tree from the first subject on
  3. generate  — COLD: compiles the segmented denoise + decode, then runs
     50 steps; returns mp4 path; artifact records seconds + mp4 bytes
  4. load_lora — hot-swap to subject adapter #2 (same rank: pure factor
     upload; executable cache must survive, compiled_configs_kept >= 1)
  5. generate  — WARM post-swap at the SAME geometry: compiled=false
     proves the swap kept the executable; seconds is the serving latency
  6. stats, shutdown

S2V_SERVING_SMOKE=1 runs the identical flow at tiny geometry on CPU
(tests/test_serving_flagship_smoke.py).
"""

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SMOKE = bool(os.environ.get("S2V_SERVING_SMOKE"))
# "runtime" (default): multi-tenant factor-tree swaps.  "merge": the
# single-tenant configuration — no factors resident (more decode headroom),
# subject swaps re-merge the cached host base (the flagship merge-swap
# cost is exactly what this mode measures).
MODE = os.environ.get("S2V_SERVING_MODE", "runtime")
JSON_OUT = os.environ.get(
    "S2V_SERVING_JSON", os.path.join(REPO, "bench_runs", "r05_serving.json")
)
WORK = os.environ.get("S2V_SERVING_WORKDIR", "/tmp/s2v_flagship_serving")
SOCKET_PATH = os.path.join(WORK, "daemon.sock")
READY_FILE = os.path.join(WORK, "ready")

# request/response timeout: the cold flagship request is ~300 s compile +
# ~400 s denoise + decode + mux
REQ_TIMEOUT_S = 60 if SMOKE else 1800


DAEMON_CODE = r"""
import os, sys
sys.path.insert(0, {repo!r})
SMOKE = bool(os.environ.get("S2V_SERVING_SMOKE"))
import jax
if SMOKE:
    jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import jax.numpy as jnp
from s2v_tpu.config import T5Config, TransformerConfig, VAEConfig
from s2v_tpu.models.t5 import init_t5_params
from s2v_tpu.models.transformer import init_transformer_params_stacked
from s2v_tpu.models.vae import init_vae_params
from s2v_tpu.pipelines.s2v import S2VPipeline
from s2v_tpu.serving.daemon import ServingDaemon
from s2v_tpu.utils.tokenizer import T5CLSTokenizer

if SMOKE:
    tcfg = TransformerConfig.tiny()
    vcfg = VAEConfig.tiny(latent_channels=tcfg.in_channels)
else:
    tcfg = TransformerConfig.cogvideox_5b()
    vcfg = VAEConfig()
tok = T5CLSTokenizer({tokenizer_json!r})
# tiny-proxy T5: d_model matches the DiT text stream; vocab covers the
# generated tokenizer + <cls>
t5cfg = T5Config.tiny(d_model=tcfg.text_embed_dim, vocab_size=max(160, len(tok) + 1))
print("daemon: initializing params ...", flush=True)
tparams = jax.jit(lambda k: init_transformer_params_stacked(k, tcfg))(
    jax.random.PRNGKey(0))
jax.block_until_ready(jax.tree.leaves(tparams)[0])
pipe = S2VPipeline(
    transformer_params=tparams,
    transformer_cfg=tcfg,
    vae_params=init_vae_params(jax.random.PRNGKey(1), vcfg),
    vae_cfg=vcfg,
    t5_params=init_t5_params(jax.random.PRNGKey(2), t5cfg),
    t5_cfg=t5cfg,
    tokenizer=tok,
)
# the pipeline owns the device tree now; a lingering module-level reference
# would pin the OLD 11 GB tree across a merge swap (load_lora frees
# pipe.transformer_params before uploading the merged tree — that only
# works if nothing else references it)
del tparams
if {mode!r} == "merge":
    # merge-mode swaps need the pristine host base (normally cached by
    # from_pretrained's snapshot dir; this pipeline is built in-process,
    # so export it once at startup).  Bulk device_get FIRST: the per-layer
    # export would otherwise make ~800 small relay round-trips (observed
    # >600 s); one 11 GB fetch + numpy slicing takes a couple of minutes.
    print("daemon: exporting host base for merge swaps ...", flush=True)
    from s2v_tpu.loaders.export_hf import transformer_state_dict

    host_tree = jax.device_get(pipe.transformer_params)
    pipe._base_transformer_sd = transformer_state_dict(host_tree, tcfg)
    del host_tree
print("daemon: serving", flush=True)
ServingDaemon(pipe, {socket_path!r}).serve_forever(ready_file={ready_file!r})
"""


def _request(req: dict, timeout: float = REQ_TIMEOUT_S) -> dict:
    """One request per connection (the daemon drops idle readers)."""
    s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    s.settimeout(timeout)
    s.connect(SOCKET_PATH)
    with s, s.makefile("rwb") as stream:
        stream.write((json.dumps(req) + "\n").encode())
        stream.flush()
        line = stream.readline()
    return json.loads(line)


def _write_ref_image(path: str, w: int, h: int) -> None:
    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(0)
    img = (rng.rand(h, w, 3) * 255).astype("uint8")
    Image.fromarray(img).save(path)


def _write_lora_ckpt(out_dir: str, rank: int, seed: int) -> str:
    """Random diffusers-format rank-``rank`` checkpoint at the daemon's
    transformer geometry — generated in a subprocess because
    make_tiny_snapshot pins the CPU platform at import."""
    code = (
        f"import sys; sys.path.insert(0, {REPO!r}); "
        f"sys.path.insert(0, {os.path.join(REPO, 'tools')!r})\n"
        "import os\n"
        "from make_tiny_snapshot import lora_checkpoint\n"
        "from s2v_tpu.config import TransformerConfig\n"
        "from s2v_tpu.loaders.safetensors_io import save_safetensors\n"
        f"cfg = (TransformerConfig.tiny() if {SMOKE!r} "
        f"else TransformerConfig.cogvideox_5b())\n"
        f"os.makedirs({out_dir!r}, exist_ok=True)\n"
        f"save_safetensors(lora_checkpoint(cfg, rank={rank}, seed={seed}), "
        f"os.path.join({out_dir!r}, "
        f"'pytorch_lora_weights_transformer.safetensors'))\n"
        "print('lora ckpt written')\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True,
                   capture_output=True, text=True)
    return os.path.join(out_dir, "pytorch_lora_weights_transformer.safetensors")


def main():
    os.makedirs(WORK, exist_ok=True)
    os.makedirs(os.path.dirname(JSON_OUT), exist_ok=True)
    for p in (SOCKET_PATH, READY_FILE):
        if os.path.exists(p):
            os.unlink(p)

    if SMOKE:
        geom = dict(height=32, width=32, num_frames=5, num_inference_steps=2,
                    segment_steps=0)
        rank = 2
    else:
        geom = dict(height=480, width=720, num_frames=49,
                    num_inference_steps=50,
                    # the axon relay kills single executions past ~60 s;
                    # segments share one executable (traced bounds)
                    segment_steps=6)
        rank = 64

    # assets
    tokenizer_json = os.path.join(WORK, "tokenizer.json")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    code = (
        f"import sys; sys.path.insert(0, {REPO!r}); "
        f"sys.path.insert(0, {os.path.join(REPO, 'tools')!r})\n"
        "from make_tiny_snapshot import write_tokenizer\n"
        f"write_tokenizer({tokenizer_json!r}, 128)\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True,
                   capture_output=True, text=True)
    ref_path = os.path.join(WORK, "ref.png")
    _write_ref_image(ref_path, geom["width"], geom["height"])
    lora1 = _write_lora_ckpt(os.path.join(WORK, "lora_ckpt1"), rank, seed=7)
    lora2 = _write_lora_ckpt(os.path.join(WORK, "lora_ckpt2"), rank, seed=9)
    print("# assets ready", flush=True)

    # daemon — its own session/process group so that a SIGTERM to this
    # orchestrator (driver timeout, TaskStop) can never orphan a daemon
    # holding the chip lease mid-init (observed: a stale lease wedges the
    # relay for ~15 min)
    import signal

    daemon_log = open(os.path.join(WORK, "daemon.log"), "w")
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", DAEMON_CODE.format(
            repo=REPO, tokenizer_json=tokenizer_json, mode=MODE,
            socket_path=SOCKET_PATH, ready_file=READY_FILE)],
        stdout=daemon_log, stderr=subprocess.STDOUT, cwd=REPO,
        start_new_session=True,
    )

    def _kill_daemon_group(signum=None, frame=None):
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except Exception:
            pass
        if signum is not None:
            sys.exit(1)

    signal.signal(signal.SIGTERM, _kill_daemon_group)
    try:
        # merge mode's startup additionally exports the 11 GB host base
        deadline = time.time() + (120 if SMOKE else (1200 if MODE == "merge" else 600))
        while not os.path.exists(READY_FILE):
            if proc.poll() is not None or time.time() > deadline:
                raise RuntimeError(
                    f"daemon failed to start (rc={proc.poll()}); see "
                    f"{WORK}/daemon.log")
            time.sleep(0.5)
        startup_s = time.time() - t0
        assert _request({"op": "ping"})["pong"]
        print(f"# daemon up in {startup_s:.1f}s", flush=True)

        # attach subject #1 BEFORE the cold compile: the serving contract is
        # adapter->adapter swaps over one executable (in merge mode this is
        # the first host merge + full-tree upload)
        r_attach = _request({"op": "load_lora", "checkpoint_path": lora1,
                             "lora_alpha": 2.0 * rank, "lora_mode": MODE})
        assert r_attach["status"] == "ok", r_attach

        # COLD request: compile + full run through to mp4 bytes
        out_mp4 = os.path.join(WORK, "clip_cold.mp4")
        t0 = time.time()
        r_cold = _request({
            "op": "generate", "prompt": "<cls> a pig walking on grass",
            "ref_img_path": ref_path, "output_path": out_mp4,
            "seed": 42, **geom,
        })
        cold_s = time.time() - t0
        assert r_cold["status"] == "ok", r_cold
        mp4_bytes = os.path.getsize(r_cold["outputs"][0])
        print(f"# cold request {cold_s:.1f}s compiled={r_cold['compiled']} "
              f"mp4={mp4_bytes}B", flush=True)

        # hot-swap to subject #2 (runtime: factor upload; merge: host
        # re-merge of the cached base + full-tree upload)
        t0 = time.time()
        r_swap = _request({
            "op": "load_lora", "checkpoint_path": lora2,
            "lora_alpha": 2.0 * rank, "lora_mode": MODE,
        })
        swap_s = time.time() - t0
        assert r_swap["status"] == "ok", r_swap
        assert r_swap["compiled_configs_kept"] >= 1, r_swap
        print(f"# lora hot-swap {swap_s:.1f}s "
              f"(kept {r_swap['compiled_configs_kept']} executables)", flush=True)

        # WARM post-swap request, SAME geometry: the serving latency
        out_mp4b = os.path.join(WORK, "clip_warm.mp4")
        t0 = time.time()
        r_warm = _request({
            "op": "generate", "prompt": "<cls> a pig walking on grass",
            "ref_img_path": ref_path, "output_path": out_mp4b,
            "seed": 43, **geom,
        })
        warm_s = time.time() - t0
        assert r_warm["status"] == "ok", r_warm
        assert r_warm["compiled"] is False, (
            "post-swap request must reuse the pre-swap executable", r_warm)
        print(f"# warm post-swap request {warm_s:.1f}s "
              f"compiled={r_warm['compiled']}", flush=True)

        stats = _request({"op": "stats"})
        _request({"op": "shutdown"})
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            _kill_daemon_group()
        daemon_log.close()

    # decode-validate the warm mp4 (frames + fps)
    frames = fps = None
    try:
        import cv2

        cap = cv2.VideoCapture(out_mp4b)
        frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        fps = round(cap.get(cv2.CAP_PROP_FPS), 2)
        cap.release()
    except Exception as e:
        print(f"# cv2 validation skipped: {e}", file=sys.stderr)

    section_key = "daemon_flagship" if MODE == "runtime" else f"daemon_flagship_{MODE}"
    section = {
            "geometry": (
                f"{geom['num_frames']}x{geom['height']}x{geom['width']} "
                f"@{geom['num_inference_steps']} steps"
                + (f" (segment_steps={geom['segment_steps']})"
                   if geom["segment_steps"] else "")
            ),
            "weights": ("tiny smoke" if SMOKE else
                        "random 5b DiT+VAE (pretrained FLOP/memory profile), "
                        "tiny-proxy T5 (XXL host encode measured separately, "
                        "bench_runs/t5_host.json)"),
            "startup_s": round(startup_s, 1),
            "cold_request": {
                "seconds": round(cold_s, 1),
                "includes_compile": bool(r_cold["compiled"]),
                "mp4_bytes": mp4_bytes,
            },
            "lora_hot_swap": {
                "mode": MODE, "rank": rank,
                "seconds": round(swap_s, 2),
                "compiled_configs_kept": r_swap["compiled_configs_kept"],
            },
            "warm_request": {
                "seconds": round(warm_s, 1),
                "compiled": r_warm["compiled"],
                "mp4_frames": frames, "mp4_fps": fps,
                "mp4_bytes": os.path.getsize(out_mp4b),
            },
            "clips_per_hour_warm": round(3600.0 / warm_s, 2),
            "daemon_stats": stats,
            "note": (
                "end-to-end through the unix socket: tokenize -> T5 encode "
                "-> ref VAE encode -> segmented 50-step denoise -> VAE "
                "decode -> native mp4 mux.  Reference pays model load + "
                "full compile per clip (src/inference.py main())."),
    }
    artifact = {}
    if os.path.exists(JSON_OUT):
        try:
            with open(JSON_OUT) as f:
                prior = json.load(f)
            if prior.get("smoke") == SMOKE:  # never mix chip + smoke rows
                artifact = prior
        except Exception:
            pass
    artifact[section_key] = section
    artifact["carryover_r04"] = ("step_times/clips_per_hour/lora "
                                 "merge-vs-runtime swap sections: "
                                 "bench_runs/r04_serving.json")
    artifact["smoke"] = SMOKE
    with open(JSON_OUT, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"metric": f"flagship daemon warm request ({MODE})",
                      "value": round(warm_s, 1), "unit": "s",
                      "artifact": JSON_OUT}))


if __name__ == "__main__":
    main()
