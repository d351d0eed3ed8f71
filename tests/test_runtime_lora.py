"""Runtime (unmerged) LoRA: factors applied inside the block scan match the
merge-at-load path exactly, swaps/detaches are instant and executable-safe,
and the daemon drives per-request runtime adapters.

The runtime mode is the TPU shape of the reference's own PEFT runtime
adapters (src/inference.py:218-229) — the merge path remains the default
(zero per-step overhead), runtime is the multi-tenant serving fast path.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def snap_and_lora(tmp_path_factory):
    from make_tiny_snapshot import make_snapshot

    root = tmp_path_factory.mktemp("rt_lora")
    snap = str(root / "snapshot")
    lora = str(root / "lora")
    make_snapshot(snap, lora)
    return snap, lora


def _gen(pipe, steps=2):
    from s2v_tpu.testing import tiny_generate_kwargs

    kw = tiny_generate_kwargs(pipe, num_inference_steps=steps, output_type="latent")
    return np.asarray(pipe.generate(**kw))


# ---------------------------------------------------------------------------
# forward-level parity: runtime factors == host merge (all 9 families)
# ---------------------------------------------------------------------------


def test_runtime_tree_forward_matches_merge(snap_and_lora):
    """transformer_forward with a runtime factor tree == forward over the
    host-merged weights, covering the separate q/k/v pairs, to_out.0, both
    adaLN linears, ff.net.2, the k=2 conv patch embed, and text_proj."""
    from make_tiny_snapshot import lora_checkpoint
    from s2v_tpu.config import TransformerConfig
    from s2v_tpu.loaders.hf import convert_transformer_state_dict
    from s2v_tpu.loaders.lora import merge_lora_into_state_dict, runtime_lora_tree
    from s2v_tpu.loaders.export_hf import transformer_state_dict
    from s2v_tpu.models.transformer import (
        RUNTIME_LORA_KEY,
        init_transformer_params,
        transformer_forward,
    )

    cfg = TransformerConfig.tiny()
    base_params = init_transformer_params(jax.random.PRNGKey(0), cfg)
    base_sd = transformer_state_dict(base_params, cfg)
    lora_sd = lora_checkpoint(cfg, rank=2)

    merged_sd, touched = merge_lora_into_state_dict(base_sd, lora_sd, alpha=4.0)
    assert len(touched) == 2 + 7 * cfg.num_layers  # 9 families
    merged_params = convert_transformer_state_dict(merged_sd, cfg)

    rt = runtime_lora_tree(lora_sd, cfg.num_layers, alpha=4.0)
    assert set(rt["blocks"]) == {
        "to_q", "to_k", "to_v", "to_out", "norm1.linear", "norm2.linear",
        "ff.net.2",
    }
    assert set(rt["top"]) == {"patch_proj", "text_proj"}
    base_params = convert_transformer_state_dict(base_sd, cfg)
    rt_params = {**base_params, RUNTIME_LORA_KEY: jax.tree.map(jnp.asarray, rt)}

    k = jax.random.split(jax.random.PRNGKey(3), 4)
    video = jax.random.normal(k[0], (1, 2, 4, 4, cfg.in_channels), jnp.float32)
    ref = jax.random.normal(k[1], (1, 1, 4, 4, cfg.in_channels), jnp.float32)
    text = jax.random.normal(
        k[2], (1, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32
    )
    t = jnp.array([500])
    from s2v_tpu.ops.rope import build_segmented_rope, prepare_video_and_ref_rope

    vc, vs, rc, rs = prepare_video_and_ref_rope(
        4 * 8, 4 * 8, 2, cfg.attention_head_dim, cfg.patch_size, 8
    )
    cos, sin = build_segmented_rope(cfg.max_text_seq_length, rc, rs, vc, vs)

    want = transformer_forward(merged_params, cfg, video, ref, text, t, cos, sin)
    got = transformer_forward(rt_params, cfg, video, ref, text, t, cos, sin)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    # the adapter is actually doing something
    base_out = transformer_forward(base_params, cfg, video, ref, text, t, cos, sin)
    assert np.abs(np.asarray(want) - np.asarray(base_out)).max() > 1e-4


def test_runtime_tree_rejects_unknown_target():
    from s2v_tpu.loaders.lora import runtime_lora_tree

    bad = {
        "transformer.proj_out.lora.down.weight": np.zeros((2, 8), np.float32),
        "transformer.proj_out.lora.up.weight": np.zeros((4, 2), np.float32),
    }
    with pytest.raises(KeyError, match="proj_out"):
        runtime_lora_tree(bad, num_layers=2)


# ---------------------------------------------------------------------------
# pipeline-level: load_lora(mode="runtime")
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_load_lora_runtime_matches_merge(snap_and_lora):
    from s2v_tpu.models.transformer import RUNTIME_LORA_KEY
    from s2v_tpu.pipelines.s2v import S2VPipeline

    snap, lora = snap_and_lora
    pipe = S2VPipeline.from_pretrained(snap, dtype=jnp.float32)
    base_out = _gen(pipe)

    want = _gen(S2VPipeline.from_pretrained(snap, lora_checkpoint=lora, dtype=jnp.float32))
    assert np.abs(want - base_out).max() > 1e-5

    pipe.load_lora(lora, mode="runtime")
    assert RUNTIME_LORA_KEY in pipe.transformer_params
    np.testing.assert_allclose(_gen(pipe), want, atol=2e-5, rtol=2e-5)

    # detach = instant base restore (base kernels were never touched)
    pipe.load_lora(None, mode="runtime")
    assert RUNTIME_LORA_KEY not in pipe.transformer_params
    np.testing.assert_allclose(_gen(pipe), base_out, atol=1e-6, rtol=1e-6)

    # re-attach hits the device cache: rename the checkpoint dir away so a
    # regression to re-reading from disk fails loudly
    key = (os.path.realpath(lora), 64.0)
    assert key in pipe._runtime_lora_cache
    poisoned = lora + "_poisoned"
    os.rename(lora, poisoned)
    try:
        pipe.load_lora(lora, mode="runtime")
    finally:
        os.rename(poisoned, lora)
    np.testing.assert_allclose(_gen(pipe), want, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_runtime_after_merge_resets_base_first(snap_and_lora):
    """Attaching a runtime adapter while a merged one is folded in must not
    stack the two."""
    from s2v_tpu.pipelines.s2v import S2VPipeline

    snap, lora = snap_and_lora
    want = _gen(S2VPipeline.from_pretrained(snap, lora_checkpoint=lora, dtype=jnp.float32))

    pipe = S2VPipeline.from_pretrained(snap, lora_checkpoint=lora, dtype=jnp.float32)
    assert pipe._merged_lora is not None
    pipe.load_lora(lora, mode="runtime")  # merged state must be unwound
    assert pipe._merged_lora is None
    np.testing.assert_allclose(_gen(pipe), want, atol=2e-5, rtol=2e-5)

    # and merge mode detaches any runtime factors
    pipe.load_lora(lora, mode="merge")
    from s2v_tpu.models.transformer import RUNTIME_LORA_KEY

    assert RUNTIME_LORA_KEY not in pipe.transformer_params
    np.testing.assert_allclose(_gen(pipe), want, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_failed_runtime_load_leaves_merged_adapter_intact(snap_and_lora, tmp_path):
    """fail-before-mutate: a bad runtime checkpoint must not unwind the
    active merged adapter (a daemon retries against unchanged state)."""
    from s2v_tpu.pipelines.s2v import S2VPipeline

    snap, lora = snap_and_lora
    pipe = S2VPipeline.from_pretrained(snap, lora_checkpoint=lora, dtype=jnp.float32)
    want = _gen(pipe)

    bad = tmp_path / "bad_ckpt"
    bad.mkdir()
    from s2v_tpu.loaders.safetensors_io import save_safetensors

    save_safetensors(
        {
            "transformer.proj_out.lora.down.weight": np.zeros((2, 8), np.float32),
            "transformer.proj_out.lora.up.weight": np.zeros((4, 2), np.float32),
        },
        str(bad / "pytorch_lora_weights_transformer.safetensors"),
    )
    with pytest.raises(KeyError, match="proj_out"):
        pipe.load_lora(str(bad), mode="runtime")
    assert pipe._merged_lora is not None  # merge still active
    np.testing.assert_allclose(_gen(pipe), want, atol=1e-6, rtol=1e-6)


def test_set_runtime_lora_rejects_stacking_on_merged(snap_and_lora):
    from s2v_tpu.loaders.lora import load_runtime_lora
    from s2v_tpu.pipelines.s2v import S2VPipeline

    snap, lora = snap_and_lora
    pipe = S2VPipeline.from_pretrained(snap, lora_checkpoint=lora, dtype=jnp.float32)
    tree = load_runtime_lora(lora, pipe.transformer_cfg.num_layers)
    with pytest.raises(ValueError, match="stack"):
        pipe.set_runtime_lora(tree)


def test_merge_none_on_pristine_base_skips_reload(snap_and_lora):
    """load_lora(None) when nothing is merged must not re-read/re-upload
    the base tree (an instant no-op in a serving loop)."""
    from s2v_tpu.pipelines.s2v import S2VPipeline

    snap, lora = snap_and_lora
    pipe = S2VPipeline.from_pretrained(snap, dtype=jnp.float32)
    before = pipe.transformer_params
    pipe.load_lora(None)
    assert pipe.transformer_params is before  # same device tree, no upload
    assert pipe._base_transformer_sd is None  # and no snapshot disk read

    # runtime detach + merge-mode None: still no re-upload
    pipe.load_lora(lora, mode="runtime")
    pipe.load_lora(None, mode="merge")
    assert pipe._base_transformer_sd is None


def test_runtime_lora_over_int8_base(snap_and_lora):
    """QLoRA serving composition: runtime factors over an int8 base apply
    output-additively (ops/quant.py dense) — generate must track the bf16
    merged pipeline within int8 quantization tolerance, and detach must
    restore the int8 base output exactly."""
    from s2v_tpu.pipelines.s2v import S2VPipeline

    snap, lora = snap_and_lora
    ref = S2VPipeline.from_pretrained(snap, dtype=jnp.float32, lora_checkpoint=lora)
    want = _gen(ref)

    pipe = S2VPipeline.from_pretrained(snap, dtype=jnp.float32, quantize_int8=True)
    base_out = _gen(pipe)
    pipe.load_lora(lora, mode="runtime")
    got = _gen(pipe)
    # the adapter must move the int8 output toward the merged bf16 output
    assert np.abs(got - want).max() < np.abs(base_out - want).max()
    denom = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / denom < 0.15

    pipe.load_lora(None, mode="runtime")
    np.testing.assert_array_equal(_gen(pipe), base_out)


def test_save_pretrained_rejects_attached_runtime_lora(snap_and_lora, tmp_path):
    from s2v_tpu.pipelines.s2v import S2VPipeline

    snap, lora = snap_and_lora
    pipe = S2VPipeline.from_pretrained(snap, dtype=jnp.float32)
    pipe.load_lora(lora, mode="runtime")
    with pytest.raises(ValueError, match="runtime LoRA"):
        pipe.save_pretrained(str(tmp_path / "out"))


@pytest.mark.slow
def test_runtime_lora_under_tp_mesh(snap_and_lora):
    """Runtime factors replicate across a dp2 x tp4 mesh; the sharded
    generate matches the single-device runtime output."""
    from s2v_tpu.pipelines.s2v import S2VPipeline

    snap, lora = snap_and_lora
    single = S2VPipeline.from_pretrained(snap, dtype=jnp.float32)
    single.load_lora(lora, mode="runtime")
    want = _gen(single)

    pipe = S2VPipeline.from_pretrained(snap, dtype=jnp.float32, mesh="dp2,tp4")
    pipe.load_lora(lora, mode="runtime")
    np.testing.assert_allclose(_gen(pipe), want, atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# trainer bridge: serve a just-trained adapter without export/re-read
# ---------------------------------------------------------------------------


def test_trainer_runtime_tree_matches_functional_merge():
    from s2v_tpu.config import TransformerConfig
    from s2v_tpu.models.transformer import (
        RUNTIME_LORA_KEY,
        init_transformer_params,
        transformer_forward,
    )
    from s2v_tpu.training.lora import (
        LoRASpec,
        init_lora_params,
        merge_lora_params,
        runtime_tree_from_training,
    )

    cfg = TransformerConfig.tiny()
    base = init_transformer_params(jax.random.PRNGKey(0), cfg)
    spec = LoRASpec(rank=2, alpha=4.0)
    lora = init_lora_params(jax.random.PRNGKey(1), base, spec)
    # init has b=0 (identity adapter); make it do something
    lora = jax.tree.map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(2), x.shape, x.dtype),
        lora,
    )

    merged = merge_lora_params(base, lora, spec)
    rt_params = {
        **base,
        RUNTIME_LORA_KEY: jax.tree.map(jnp.asarray, runtime_tree_from_training(lora, spec)),
    }

    k = jax.random.split(jax.random.PRNGKey(3), 3)
    video = jax.random.normal(k[0], (1, 2, 4, 4, cfg.in_channels), jnp.float32)
    ref = jax.random.normal(k[1], (1, 1, 4, 4, cfg.in_channels), jnp.float32)
    text = jax.random.normal(
        k[2], (1, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32
    )
    t = jnp.array([100])

    want = transformer_forward(merged, cfg, video, ref, text, t, None, None)
    got = transformer_forward(rt_params, cfg, video, ref, text, t, None, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# daemon: per-request runtime adapters
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_daemon_runtime_lora_op(snap_and_lora):
    from s2v_tpu.pipelines.s2v import S2VPipeline
    from s2v_tpu.serving.daemon import ServingDaemon

    snap, lora = snap_and_lora
    pipe = S2VPipeline.from_pretrained(snap, dtype=jnp.float32)
    daemon = ServingDaemon(pipe, "/tmp/unused.sock", lora_mode="runtime")

    resp = daemon.handle({"op": "load_lora", "checkpoint_path": lora})
    assert resp["status"] == "ok" and resp["lora_mode"] == "runtime"
    from s2v_tpu.models.transformer import RUNTIME_LORA_KEY

    assert RUNTIME_LORA_KEY in pipe.transformer_params

    resp = daemon.handle({"op": "load_lora", "checkpoint_path": None})
    assert resp["status"] == "ok"
    assert RUNTIME_LORA_KEY not in pipe.transformer_params

    stats = daemon.handle({"op": "stats"})
    assert stats["lora_mode"] == "runtime"


@pytest.mark.slow
def test_daemon_request_mode_does_not_mutate_default(snap_and_lora):
    """A per-request lora_mode applies to that swap only; later requests
    that omit the mode keep using the daemon's configured default."""
    from s2v_tpu.models.transformer import RUNTIME_LORA_KEY
    from s2v_tpu.pipelines.s2v import S2VPipeline
    from s2v_tpu.serving.daemon import ServingDaemon

    snap, lora = snap_and_lora
    pipe = S2VPipeline.from_pretrained(snap, dtype=jnp.float32)
    daemon = ServingDaemon(pipe, "/tmp/unused.sock")  # default merge

    resp = daemon.handle(
        {"op": "load_lora", "checkpoint_path": lora, "lora_mode": "runtime"}
    )
    assert resp["status"] == "ok" and daemon.lora_mode == "runtime"
    assert daemon.default_lora_mode == "merge"  # untouched

    # omitting lora_mode falls back to the daemon default (merge)
    resp = daemon.handle({"op": "load_lora", "checkpoint_path": lora})
    assert resp["status"] == "ok" and resp["lora_mode"] == "merge"
    assert RUNTIME_LORA_KEY not in pipe.transformer_params
    assert pipe._merged_lora is not None


@pytest.mark.slow
def test_daemon_inline_swap_alpha_sensitive(snap_and_lora):
    """Same checkpoint at a different lora_alpha must re-swap, and an
    omitted inline lora_mode must not force a mode change."""
    from s2v_tpu.pipelines.s2v import S2VPipeline
    from s2v_tpu.serving.daemon import ServingDaemon
    from s2v_tpu.testing import tiny_generate_kwargs

    snap, lora = snap_and_lora
    pipe = S2VPipeline.from_pretrained(snap, dtype=jnp.float32)
    daemon = ServingDaemon(pipe, "/tmp/unused.sock", lora_mode="runtime")
    kw = tiny_generate_kwargs(pipe, num_inference_steps=1)
    del kw["prompt_embeds"], kw["ref_latents"]

    base_req = {"op": "warmup", **{k: v for k, v in kw.items() if k != "output_type"}}
    r1 = daemon.handle({**base_req, "lora_checkpoint": lora})
    assert r1["status"] == "ok" and daemon.lora_alpha == 64.0

    # same path, new alpha -> swap
    r2 = daemon.handle({**base_req, "lora_checkpoint": lora, "lora_alpha": 32.0})
    assert r2["status"] == "ok"
    assert daemon.lora_alpha == 32.0
    assert (os.path.realpath(lora), 32.0) in pipe._runtime_lora_cache

    # same path + alpha, no mode named -> the active adapter is reused
    # without any swap at all
    def boom(*a, **k):
        raise AssertionError("unexpected load_lora swap")

    pipe.load_lora = boom
    r3 = daemon.handle({**base_req, "lora_checkpoint": lora, "lora_alpha": 32.0})
    assert r3["status"] == "ok" and "lora_checkpoint" not in r3
