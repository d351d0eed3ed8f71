"""LoRA hot-swap: S2VPipeline.load_lora re-merges a different adapter in
place (serving: per-subject adapters without reloading or re-jitting) and
the daemon's load_lora op drives it.

Reference behavior anchor: the reference binds ONE adapter per process
(src/inference.py:218-229, PEFT injection at load); swapping subjects
there means a fresh process + full reload.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

# jit-heavy full-coverage module (see pyproject markers)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def snap_and_lora(tmp_path_factory):
    from make_tiny_snapshot import make_snapshot

    root = tmp_path_factory.mktemp("hotswap")
    snap = str(root / "snapshot")
    lora = str(root / "lora")
    make_snapshot(snap, lora)
    return snap, lora


def _gen(pipe, steps=2):
    from s2v_tpu.testing import tiny_generate_kwargs

    kw = tiny_generate_kwargs(pipe, num_inference_steps=steps, output_type="latent")
    return np.asarray(pipe.generate(**kw))


def test_load_lora_matches_fresh_merge(snap_and_lora):
    from s2v_tpu.pipelines.s2v import S2VPipeline

    snap, lora = snap_and_lora
    pipe = S2VPipeline.from_pretrained(snap, dtype=jnp.float32)
    base_out = _gen(pipe)
    compiled_before = len(pipe._compiled_denoise)
    assert compiled_before > 0

    ref = S2VPipeline.from_pretrained(
        snap, lora_checkpoint=lora, dtype=jnp.float32
    )
    want = _gen(ref)
    # the adapter actually changes the output
    assert np.abs(want - base_out).max() > 1e-5

    pipe.load_lora(lora)
    got = _gen(pipe)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # hot-swap kept the compiled executables (params are traced args)
    assert len(pipe._compiled_denoise) == compiled_before

    # None resets to base weights, same executables again
    pipe.load_lora(None)
    np.testing.assert_allclose(_gen(pipe), base_out, atol=1e-5, rtol=1e-5)
    assert len(pipe._compiled_denoise) == compiled_before


def test_load_lora_requires_model_dir():
    from s2v_tpu.testing import tiny_pipeline

    pipe = tiny_pipeline()  # built from raw params, no snapshot dir
    with pytest.raises(ValueError, match="load_lora"):
        pipe.load_lora("/nonexistent")


def test_daemon_load_lora_op(snap_and_lora, tmp_path):
    from s2v_tpu.pipelines.s2v import S2VPipeline
    from s2v_tpu.serving import ServingDaemon

    snap, lora = snap_and_lora
    pipe = S2VPipeline.from_pretrained(snap, dtype=jnp.float32)
    d = ServingDaemon(pipe, str(tmp_path / "s2v.sock"))

    resp = d.handle({"op": "load_lora", "checkpoint_path": lora})
    assert resp["status"] == "ok" and resp["lora_checkpoint"] == lora
    assert d.handle({"op": "stats"})["lora_checkpoint"] == lora

    missing = d.handle({"op": "load_lora", "checkpoint_path": "/no/such/dir"})
    assert missing["status"] == "error"

    reset = d.handle({"op": "load_lora", "checkpoint_path": None})
    assert reset["status"] == "ok" and reset["lora_checkpoint"] is None


def test_load_lora_preserves_int8_quantization(snap_and_lora):
    """An int8-quantized pipeline re-quantizes the swapped weights."""
    import jax

    from s2v_tpu.pipelines.s2v import S2VPipeline

    snap, lora = snap_and_lora
    pipe = S2VPipeline.from_pretrained(snap, dtype=jnp.float32, quantize_int8=True)

    def n_int8(tree):
        return sum(
            1 for x in jax.tree.leaves(tree)
            if getattr(x, "dtype", None) == jnp.int8
        )

    before = n_int8(pipe.transformer_params)
    assert before > 0
    pipe.load_lora(lora)
    assert n_int8(pipe.transformer_params) == before

    ref = S2VPipeline.from_pretrained(
        snap, lora_checkpoint=lora, dtype=jnp.float32, quantize_int8=True
    )
    np.testing.assert_allclose(_gen(pipe), _gen(ref), atol=1e-5, rtol=1e-5)


def test_load_lora_under_tp_mesh(snap_and_lora):
    """Hot-swap on a sharded pipeline re-shards the new tree: matches a
    pipeline freshly loaded with the adapter under the same mesh."""
    from s2v_tpu.pipelines.s2v import S2VPipeline

    snap, lora = snap_and_lora
    pipe = S2VPipeline.from_pretrained(snap, dtype=jnp.float32, mesh="dp2,tp4")
    assert pipe.mesh is not None and pipe.mesh.size == 8
    pipe.load_lora(lora)
    got = _gen(pipe)

    ref = S2VPipeline.from_pretrained(
        snap, lora_checkpoint=lora, dtype=jnp.float32, mesh="dp2,tp4"
    )
    np.testing.assert_allclose(got, _gen(ref), atol=2e-4, rtol=1e-4)
    # swapped tree kept the megatron TP placement
    import jax

    shardings = {
        str(x.sharding.spec) for x in jax.tree.leaves(pipe.transformer_params)
        if hasattr(x, "sharding") and hasattr(x.sharding, "spec")
    }
    assert any("model" in s for s in shardings), shardings


def test_daemon_seeds_startup_lora_in_stats(snap_and_lora, tmp_path):
    from s2v_tpu.pipelines.s2v import S2VPipeline
    from s2v_tpu.serving import ServingDaemon

    snap, lora = snap_and_lora
    pipe = S2VPipeline.from_pretrained(snap, lora_checkpoint=lora, dtype=jnp.float32)
    d = ServingDaemon(pipe, str(tmp_path / "s.sock"), lora_checkpoint=lora)
    assert d.handle({"op": "stats"})["lora_checkpoint"] == lora


def test_daemon_inline_lora_checkpoint_on_generate(snap_and_lora, tmp_path):
    """generate accepts "lora_checkpoint": the daemon swaps only when it
    differs from the active adapter."""
    from PIL import Image

    from s2v_tpu.pipelines.s2v import S2VPipeline
    from s2v_tpu.serving import ServingDaemon

    snap, lora = snap_and_lora
    pipe = S2VPipeline.from_pretrained(snap, dtype=jnp.float32)
    d = ServingDaemon(pipe, str(tmp_path / "s.sock"))

    calls = []
    real = pipe.load_lora
    pipe.load_lora = lambda *a, **k: (calls.append(a), real(*a, **k))[1]

    ref = str(tmp_path / "ref.png")
    Image.fromarray(
        (np.random.RandomState(0).rand(32, 32, 3) * 255).astype("uint8")
    ).save(ref)
    base = dict(op="generate", prompt="a pig", ref_img_path=ref,
                output_path=str(tmp_path / "o.mp4"),
                height=32, width=32, num_frames=5, num_inference_steps=1)

    r1 = d.handle({**base, "lora_checkpoint": lora})
    assert r1["status"] == "ok" and r1["lora_checkpoint"] == lora
    assert len(calls) == 1

    r2 = d.handle({**base, "lora_checkpoint": lora})  # same adapter: no swap
    assert r2["status"] == "ok" and "lora_checkpoint" not in r2
    assert len(calls) == 1

    r3 = d.handle({**base, "lora_checkpoint": None})  # back to base
    assert r3["status"] == "ok" and r3["lora_checkpoint"] is None
    assert len(calls) == 2

    bad = d.handle({**base, "lora_checkpoint": "/no/such"})
    assert bad["status"] == "error"


def test_load_lora_base_cache_skips_disk(snap_and_lora, monkeypatch):
    """Repeat swaps reuse the cached host base tree (no snapshot re-read)
    and the cached base stays pristine across merges."""
    import s2v_tpu.loaders as loaders
    from s2v_tpu.pipelines.s2v import S2VPipeline

    snap, lora = snap_and_lora
    pipe = S2VPipeline.from_pretrained(snap, dtype=jnp.float32)
    base_out = _gen(pipe)

    import s2v_tpu.pipelines.s2v as s2v_mod

    reads = []
    real = loaders.load_sharded_safetensors

    def counting(path):
        reads.append(path)
        return real(path)

    monkeypatch.setattr("s2v_tpu.loaders.load_sharded_safetensors", counting)

    pipe.load_lora(lora)
    assert len(reads) == 1 and pipe._base_transformer_sd is not None
    lora_out = _gen(pipe)
    pipe.load_lora(None)  # second swap: served from the cache
    assert len(reads) == 1
    np.testing.assert_allclose(_gen(pipe), base_out, atol=1e-5, rtol=1e-5)
    pipe.load_lora(lora)
    assert len(reads) == 1
    np.testing.assert_allclose(_gen(pipe), lora_out, atol=1e-5, rtol=1e-5)

    # opt-out keeps nothing
    pipe2 = S2VPipeline.from_pretrained(snap, dtype=jnp.float32)
    pipe2.load_lora(lora, cache_base=False)
    assert pipe2._base_transformer_sd is None


def test_from_pretrained_float16(snap_and_lora):
    """Reference dtype parity option: non-"5b" checkpoints load fp16 in the
    reference (src/inference.py:191,210).  bf16 stays our TPU default, but
    dtype=float16 must load and generate finite output end to end."""
    from s2v_tpu.pipelines.s2v import S2VPipeline

    snap, lora = snap_and_lora
    pipe = S2VPipeline.from_pretrained(snap, lora_checkpoint=lora, dtype=jnp.float16)
    assert pipe.transformer_cfg.dtype == jnp.float16
    leaf = jax.tree.leaves(pipe.transformer_params)[0]
    assert leaf.dtype == jnp.float16
    out = _gen(pipe)
    assert np.isfinite(out).all()
