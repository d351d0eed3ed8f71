"""Serving daemon tests (tiny config, CPU): protocol handling, executable
cache reuse across seeds, and a real unix-socket round trip."""

import os
import threading

import numpy as np
import jax
import pytest

from s2v_tpu.config import SchedulerConfig, T5Config, TransformerConfig, VAEConfig
from s2v_tpu.models.t5 import init_t5_params
from s2v_tpu.models.transformer import init_transformer_params
from s2v_tpu.models.vae import init_vae_params
from s2v_tpu.pipelines.s2v import S2VPipeline
from s2v_tpu.serving import ServingDaemon, request



# jit-heavy full-coverage module (see pyproject markers); the fast tier
# (pytest -m 'not slow') keeps kernels/ops/loaders/scheduler coverage
pytestmark = __import__('pytest').mark.slow

class _FakeTokenizer:
    def encode(self, prompts, max_length=226):
        out = np.zeros((len(prompts), max_length), np.int32)
        for i, p in enumerate(prompts):
            ids = [(hash(w) % 100) + 2 for w in p.split()][: max_length - 1] + [1]
            out[i, : len(ids)] = ids
        return out


@pytest.fixture(scope="module")
def daemon(tmp_path_factory):
    tcfg = TransformerConfig.tiny()
    vcfg = VAEConfig.tiny(latent_channels=tcfg.in_channels, sample_height=64, sample_width=64)
    t5cfg = T5Config.tiny(d_model=tcfg.text_embed_dim)
    key = jax.random.PRNGKey(0)
    pipe = S2VPipeline(
        transformer_params=init_transformer_params(key, tcfg),
        transformer_cfg=tcfg,
        vae_params=init_vae_params(key, vcfg),
        vae_cfg=vcfg,
        t5_params=init_t5_params(key, t5cfg),
        t5_cfg=t5cfg,
        scheduler_cfg=SchedulerConfig(),
        tokenizer=_FakeTokenizer(),
    )
    return ServingDaemon(pipe, str(tmp_path_factory.mktemp("sock") / "s2v.sock"))


def _ref_png(tmp_path):
    from PIL import Image

    p = str(tmp_path / "ref.png")
    Image.fromarray((np.random.RandomState(0).rand(32, 32, 3) * 255).astype("uint8")).save(p)
    return p


_GEO = dict(height=32, width=32, num_frames=5, num_inference_steps=2)


def test_ping_stats_unknown(daemon):
    assert daemon.handle({"op": "ping"})["pong"] is True
    assert daemon.handle({"op": "stats"})["status"] == "ok"
    assert daemon.handle({"op": "bogus"})["status"] == "error"


def test_warmup_then_generate_reuses_executable(daemon, tmp_path):
    wu = daemon.handle({"op": "warmup", **_GEO})
    assert wu["status"] == "ok", wu
    assert wu["compiled"] is True

    ref = _ref_png(tmp_path)
    out = str(tmp_path / "clip.mp4")
    g1 = daemon.handle(
        {"op": "generate", "prompt": "a pig", "ref_img_path": ref, "output_path": out,
         "seed": 1, **_GEO}
    )
    assert g1["status"] == "ok", g1
    assert g1["compiled"] is False  # warmup already compiled this geometry
    assert os.path.exists(g1["outputs"][0])

    # a different seed must NOT recompile (rng is a traced argument)
    g2 = daemon.handle(
        {"op": "generate", "prompt": "a pig", "ref_img_path": ref,
         "output_path": str(tmp_path / "clip2.mp4"), "seed": 2, **_GEO}
    )
    assert g2["compiled"] is False
    # and must produce a different clip
    import cv2

    c1, c2 = cv2.VideoCapture(g1["outputs"][0]), cv2.VideoCapture(g2["outputs"][0])
    ok1, f1 = c1.read()
    ok2, f2 = c2.read()
    assert ok1 and ok2
    assert float(np.abs(f1.astype(np.float64) - f2.astype(np.float64)).mean()) > 0.5


def test_generate_missing_args(daemon):
    assert daemon.handle({"op": "generate"})["status"] == "error"
    r = daemon.handle({"op": "generate", "prompt": "x", "ref_img_path": "/nope.png"})
    assert r["status"] == "error" and "not found" in r["error"]


def test_socket_roundtrip(daemon, tmp_path):
    t = threading.Thread(target=daemon.serve_forever, daemon=True)
    t.start()
    import time

    for _ in range(100):
        if os.path.exists(daemon.socket_path):
            break
        time.sleep(0.05)
    assert request(daemon.socket_path, {"op": "ping"})["pong"] is True
    stats = request(daemon.socket_path, {"op": "stats"})
    assert stats["requests_served"] >= 1
    assert request(daemon.socket_path, {"op": "shutdown"})["shutdown"] is True
    t.join(timeout=10)
    assert not t.is_alive()


def test_multi_prompt_batch_and_stats(daemon, tmp_path):
    ref = _ref_png(tmp_path)
    r = daemon.handle(
        {"op": "generate", "prompt": ["a pig", "a dog"], "ref_img_path": ref,
         "output_path": str(tmp_path / "multi.mp4"), "seed": 5, **_GEO}
    )
    assert r["status"] == "ok", r
    assert len(r["outputs"]) == 2
    assert all(os.path.exists(p) for p in r["outputs"])
    stats = daemon.handle({"op": "stats"})
    assert "generate_latency_s" in stats


def test_serve_client_mode_exit_codes(daemon, tmp_path):
    """python -m s2v_tpu.serve --request: 0 on ok, 1 on error response."""
    import threading

    d2 = type(daemon)(daemon.pipe, str(tmp_path / "cli.sock"))
    t = threading.Thread(target=d2.serve_forever, daemon=True)
    t.start()
    import time as _time

    for _ in range(100):
        if os.path.exists(d2.socket_path):
            break
        _time.sleep(0.05)
    from s2v_tpu.serve import main as serve_main
    from s2v_tpu.serve import get_args as serve_args

    rc_ok = serve_main(serve_args(["--socket", d2.socket_path, "--request", '{"op":"ping"}']))
    rc_err = serve_main(serve_args(["--socket", d2.socket_path, "--request", '{"op":"bogus"}']))
    serve_main(serve_args(["--socket", d2.socket_path, "--request", '{"op":"shutdown"}']))
    assert rc_ok == 0 and rc_err == 1
    t.join(timeout=10)
