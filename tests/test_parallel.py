"""Multi-chip sharding tests on the 8-device CPU mesh (conftest).

Checks the TPU-new capability (SURVEY.md §2.5): TP/SP-sharded denoise
compiles with real collectives and matches the single-device result.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2v_tpu.config import SchedulerConfig, TransformerConfig
from s2v_tpu.models.transformer import init_transformer_params, transformer_forward
from s2v_tpu.parallel import (
    default_logical_map,
    make_mesh,
    mesh_context,
    shard_params,
    transformer_param_specs,
)
from s2v_tpu.pipelines.denoise import DenoiseSchedule, denoise
from s2v_tpu.ops.rope import build_segmented_rope, get_3d_rotary_pos_embed



# jit-heavy full-coverage module (see pyproject markers); the fast tier
# (pytest -m 'not slow') keeps kernels/ops/loaders/scheduler coverage
pytestmark = __import__('pytest').mark.slow

def _setup(key=0):
    cfg = TransformerConfig.tiny()
    params = init_transformer_params(jax.random.PRNGKey(key), cfg)
    B, F, H, W = 1, 2, 8, 8
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, F, H, W, cfg.in_channels), jnp.float32)
    ref = jax.random.normal(jax.random.PRNGKey(2), (B, 1, H, W, cfg.in_channels), jnp.float32)
    emb = jax.random.normal(
        jax.random.PRNGKey(3), (2 * B, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32
    )
    gh, gw = H // 2, W // 2
    cos, sin = get_3d_rotary_pos_embed(cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), F + 1)
    tok = gh * gw
    cs, sn = build_segmented_rope(
        cfg.max_text_seq_length, cos[:tok], sin[:tok], cos[tok : tok * (F + 1)], sin[tok : tok * (F + 1)]
    )
    return cfg, params, lat, ref, emb, cs, sn


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_tp_sharded_denoise_matches_single_device():
    cfg, params, lat, ref, emb, cs, sn = _setup()
    sched = DenoiseSchedule.create(SchedulerConfig(), 2, 6.0)

    expected = denoise(params, cfg, sched, lat, ref, emb, cs, sn, do_cfg=True)

    mesh = make_mesh({"data": 2, "model": 4})
    specs = transformer_param_specs(cfg, "model")
    sharded = shard_params(params, mesh, specs)
    with mesh_context(mesh, default_logical_map(mesh)):
        fn = jax.jit(
            lambda p, l, r, e: denoise(p, cfg, sched, l, r, e, cs, sn, do_cfg=True)
        )
        got = fn(sharded, lat, ref, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=1e-4)


def test_sp_sharded_forward_matches():
    """Sequence-parallel sharding of the video token axis (BASELINE
    configs[4]) — GSPMD handles the non-divisible boundary tokens."""
    cfg, params, lat, ref, emb, cs, sn = _setup()
    t = jnp.array([500, 500], jnp.int32)
    lat2 = jnp.concatenate([lat, lat])
    ref2 = jnp.concatenate([ref, ref])

    expected = transformer_forward(params, cfg, lat2, ref2, emb, t, cs, sn)

    mesh = make_mesh({"seq": 8})
    with mesh_context(mesh, default_logical_map(mesh)):
        fn = jax.jit(lambda p, l, r, e: transformer_forward(p, cfg, l, r, e, t, cs, sn))
        got = fn(params, lat2, ref2, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=1e-4)


def test_ring_attention_matches_full():
    """shard_map ring attention over 8 devices == full attention, including
    ragged (non-divisible) sequence lengths."""
    from s2v_tpu.parallel.ring_attention import ring_attention

    mesh = make_mesh({"seq": 8})
    rng = np.random.RandomState(0)
    for s in (64, 77):  # divisible + ragged
        q = jnp.asarray(rng.randn(2, s, 3, 16).astype(np.float32))
        k = jnp.asarray(rng.randn(2, s, 3, 16).astype(np.float32))
        v = jnp.asarray(rng.randn(2, s, 3, 16).astype(np.float32))
        out = ring_attention(q, k, v, mesh)
        expected = jax.nn.dot_product_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4,
            err_msg=f"s={s}",
        )


def test_ring_attention_cross_shard_softmax():
    """Dominant keys on a remote shard: online rescaling must propagate
    the max across ring hops."""
    from s2v_tpu.parallel.ring_attention import ring_attention

    mesh = make_mesh({"seq": 4})
    rng = np.random.RandomState(1)
    s = 32
    q = jnp.asarray(rng.randn(1, s, 2, 16).astype(np.float32))
    k_np = rng.randn(1, s, 2, 16).astype(np.float32)
    k_np[:, 28:] += 8.0  # last shard dominates
    k = jnp.asarray(k_np)
    v = jnp.asarray(rng.randn(1, s, 2, 16).astype(np.float32))
    out = ring_attention(q, k, v, mesh)
    expected = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=3e-5, rtol=1e-4)


def test_ring_backend_in_transformer():
    """attention_backend='ring' (sequence-parallel DiT) matches the XLA
    backend on an 8-device seq mesh."""
    cfg, params, lat, ref, emb, cs, sn = _setup()
    t = jnp.array([500, 500], jnp.int32)
    lat2 = jnp.concatenate([lat, lat])
    ref2 = jnp.concatenate([ref, ref])
    expected = transformer_forward(params, cfg, lat2, ref2, emb, t, cs, sn)

    mesh = make_mesh({"seq": 8})
    with mesh_context(mesh, default_logical_map(mesh)):
        fn = jax.jit(
            lambda p, l, r, e: transformer_forward(
                p, cfg, l, r, e, t, cs, sn, attention_backend="ring"
            )
        )
        got = fn(params, lat2, ref2, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=1e-4)


def test_temporal_sharded_vae_decode_matches_streaming():
    """ppermute halo-exchanged context-parallel decode == single-device
    streaming with the same uniform chunking."""
    from s2v_tpu.config import VAEConfig
    from s2v_tpu.models.vae import init_vae_params, _decode_plain
    from s2v_tpu.parallel.vae_temporal import sharded_vae_decode

    cfg = VAEConfig.tiny()  # num_latent_frames_batch_size = 2
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 4, 4, cfg.latent_channels), jnp.float32)

    expected = _decode_plain(params, cfg, z)  # chunks of 2, no remainder

    mesh = make_mesh({"seq": 6}, jax.devices()[:6])
    got = sharded_vae_decode(params, cfg, z, mesh)
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_temporal_sharded_vae_encode_matches_streaming():
    from s2v_tpu.config import VAEConfig
    from s2v_tpu.models.vae import init_vae_params, _encode_plain
    from s2v_tpu.parallel.vae_temporal import sharded_vae_encode

    cfg = VAEConfig.tiny()  # num_sample_frames_batch_size = 8
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 32, 32, 3), jnp.float32)

    expected = _encode_plain(params, cfg, x)  # chunks of 8, no remainder
    mesh = make_mesh({"seq": 2}, jax.devices()[:2])
    got = sharded_vae_encode(params, cfg, x, mesh)
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_temporal_sharded_vae_rejects_ragged():
    from s2v_tpu.config import VAEConfig
    from s2v_tpu.models.vae import init_vae_params
    from s2v_tpu.parallel.vae_temporal import sharded_vae_decode

    cfg = VAEConfig.tiny()
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 13, 4, 4, cfg.latent_channels), jnp.float32)
    mesh = make_mesh({"seq": 6}, jax.devices()[:6])
    with pytest.raises(ValueError):
        sharded_vae_decode(params, cfg, z, mesh)


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh({"model": 16})


def test_hybrid_mesh_single_process_layout():
    """make_hybrid_mesh: named DCN (outer) + ICI (inner) axes; a dp-over-DCN
    x tp-over-ICI denoise matches single-device."""
    from s2v_tpu.parallel import make_hybrid_mesh

    mesh = make_hybrid_mesh({"data": 2}, {"model": 4})
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (2, 4)

    cfg, params, lat, ref, emb, cs, sn = _setup()
    sched = DenoiseSchedule.create(SchedulerConfig(), 2, 6.0)
    expected = denoise(params, cfg, sched, lat, ref, emb, cs, sn, do_cfg=True)
    specs = transformer_param_specs(cfg, "model")
    sharded = shard_params(params, mesh, specs)
    with mesh_context(mesh, default_logical_map(mesh)):
        got = jax.jit(
            lambda p, l, r, e: denoise(p, cfg, sched, l, r, e, cs, sn, do_cfg=True)
        )(sharded, lat, ref, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=1e-4)


def test_hybrid_mesh_validation_and_bootstrap_noop():
    from s2v_tpu.parallel import initialize_distributed, make_hybrid_mesh
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_hybrid_mesh({"data": 3}, {"model": 4})
    # single-process: a no-op that reports False
    assert initialize_distributed() is False


def test_ring_attention_grads_match_xla():
    """Sequence-parallel training path: jax.grad through the shard_map +
    ppermute ring must equal single-device attention gradients (incl. a
    ragged tail)."""
    from s2v_tpu.parallel.ring_attention import ring_attention

    mesh = make_mesh({"seq": 8})
    rng = np.random.RandomState(0)
    b, s, h, d = 1, 136, 2, 64
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))

    with mesh_context(mesh, {"sp": "seq"}):
        g = jax.grad(
            lambda q, k, v: jnp.sum(ring_attention(q, k, v, mesh=mesh, axis_name="seq") ** 2),
            argnums=(0, 1, 2),
        )(q, k, v)
    ref = jax.grad(
        lambda q, k, v: jnp.sum(jax.nn.dot_product_attention(q, k, v) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, r in zip(g, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=3e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# product surface: S2VPipeline.generate under a mesh (VERDICT r1 #3)
# ---------------------------------------------------------------------------


from s2v_tpu.testing import tiny_generate_kwargs, tiny_pipeline as _tiny_pipeline


def _gen_kwargs(pipe, seed=7):
    tc = pipe.vae_cfg.temporal_compression_ratio
    return tiny_generate_kwargs(pipe, num_frames=2 * tc + 1, seed=seed)


def test_generate_dp_tp_mesh_matches_single_device():
    pipe = _tiny_pipeline()
    kw = _gen_kwargs(pipe)
    expected = pipe.generate(**kw)

    sharded = _tiny_pipeline()
    sharded.set_mesh("dp2,tp4")
    assert sharded.mesh is not None and sharded.mesh.size == 8
    got = sharded.generate(**kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=1e-4)


def test_generate_seq_mesh_matches_single_device():
    pipe = _tiny_pipeline()
    kw = _gen_kwargs(pipe)
    expected = pipe.generate(**kw)

    sharded = _tiny_pipeline()
    sharded.set_mesh({"seq": 8})
    got = sharded.generate(**kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=1e-4)


def test_generate_seq_mesh_cp_vae_decode_runs():
    """With frames divisible by the ring the decode takes the
    context-parallel path (uniform-chunk semantics)."""
    pipe = _tiny_pipeline()
    pipe.set_mesh({"seq": 2})
    kw = _gen_kwargs(pipe)
    tc = pipe.vae_cfg.temporal_compression_ratio
    kw["num_frames"] = 3 * tc + 1  # 4 latent frames, ring 2 -> CP path
    out = pipe.generate(**kw)
    # uniform even chunks decode T latent -> T*tc px frames (the odd first
    # chunk's (t-1)*tc+1 semantics only arise on the canonical 13-frame
    # schedule, which stays on the streaming path)
    assert out.shape[1] == 4 * tc
    assert np.isfinite(out).all()


def test_generate_seq_mesh_ncp_gt_ring_matches_single_device():
    """When the canonical decode schedule needs more chunks than the ring
    (n_cp > ring), decode_latents must NOT silently switch to larger
    uniform chunks (a mesh-dependent numerics change) — it streams the
    canonical schedule on one device instead, so the output is exactly
    the single-device output (ADVICE r2 #3)."""
    from s2v_tpu.parallel.vae_temporal import canonical_cp_chunks

    pipe = _tiny_pipeline()
    tc = pipe.vae_cfg.temporal_compression_ratio
    fb = pipe.vae_cfg.num_latent_frames_batch_size
    ring = 2
    # pick t latent frames with t % ring == 0, t // ring != fb, n_cp > ring
    t = 4 * fb  # canonical chunks = 4 > ring = 2; divisible by the ring
    assert t % ring == 0 and t // ring != fb
    assert canonical_cp_chunks(pipe.vae_cfg, t) > ring
    kw = tiny_generate_kwargs(pipe, num_frames=(t - 1) * tc + 1, seed=7)
    expected = pipe.generate(**kw)

    sharded = _tiny_pipeline()
    sharded.set_mesh({"seq": ring})
    got = sharded.generate(**kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=1e-4)


def test_parse_mesh_spec():
    from s2v_tpu.parallel.sharding import parse_mesh_spec

    assert parse_mesh_spec("dp2,tp4") == {"data": 2, "model": 4}
    assert parse_mesh_spec("sp8") == {"seq": 8}
    assert parse_mesh_spec("data2,seq4") == {"data": 2, "seq": 4}
    with pytest.raises(ValueError):
        parse_mesh_spec("xx3")
    with pytest.raises(ValueError):
        parse_mesh_spec("dp")


# ---------------------------------------------------------------------------
# performance-grade SP: all-gather-KV + per-hop-kernel ring (VERDICT r1 #4)
# ---------------------------------------------------------------------------


def _qkv(key=0, b=1, s=19, h=2, d=8):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.float32)
    return q, k, v


def test_allgather_kv_attention_matches_dense():
    from s2v_tpu.parallel.sp_attention import allgather_kv_attention

    q, k, v = _qkv(s=19)  # deliberately not divisible by 8
    expected = jax.nn.dot_product_attention(q, k, v)
    mesh = make_mesh({"seq": 8})
    got = allgather_kv_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_ring_kernel_matches_dense_interpret():
    """Per-hop Pallas engine (interpret mode on the CPU mesh) == dense."""
    from s2v_tpu.parallel.ring_attention import ring_attention

    q, k, v = _qkv(s=19)
    expected = jax.nn.dot_product_attention(q, k, v)
    mesh = make_mesh({"seq": 4}, jax.devices()[:4])
    got = ring_attention(q, k, v, mesh, use_kernel=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_flash_key_pad_mask_interpret():
    """key_pad_mask excludes exactly the flagged keys (indicator-row path)."""
    from s2v_tpu.ops.pallas.flash_attention import flash_attention

    q, k, v = _qkv(s=16)
    mask = jnp.zeros((16,), bool).at[12:].set(True)
    expected = jax.nn.dot_product_attention(q, k[:, :12], v[:, :12])
    got = flash_attention(q, k, v, key_pad_mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_sp_allgather_backend_through_joint_attention():
    """The 'sp_allgather' backend end-to-end through transformer_forward."""
    cfg, params, lat, ref, emb, cs, sn = _setup()
    t = jnp.array([500, 500], jnp.int32)
    lat2 = jnp.concatenate([lat, lat])
    ref2 = jnp.concatenate([ref, ref])
    expected = transformer_forward(params, cfg, lat2, ref2, emb, t, cs, sn)
    mesh = make_mesh({"seq": 8})
    with mesh_context(mesh, default_logical_map(mesh)):
        fn = jax.jit(
            lambda p, l, r, e: transformer_forward(
                p, cfg, l, r, e, t, cs, sn, attention_backend="sp_allgather"
            )
        )
        got = fn(params, lat2, ref2, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=1e-4)


def test_int8_params_tp_sharded_forward_matches():
    """The path-matched TP specs cover the int8 {'q','scale'} serving tree:
    a dp2 x tp4-sharded int8 forward == the unsharded int8 forward."""
    from s2v_tpu.ops.quant import quantize_transformer_params
    from s2v_tpu.parallel.sharding import transformer_param_specs_like

    cfg, params, lat, ref, emb, cs, sn = _setup()
    qparams = quantize_transformer_params(params)
    t = jnp.array([500, 500], jnp.int32)
    lat2 = jnp.concatenate([lat, lat])
    ref2 = jnp.concatenate([ref, ref])

    expected = transformer_forward(qparams, cfg, lat2, ref2, emb, t, cs, sn)

    mesh = make_mesh({"data": 2, "model": 4})
    sharded = shard_params(qparams, mesh, transformer_param_specs_like(qparams, "model"))
    with mesh_context(mesh, default_logical_map(mesh)):
        fn = jax.jit(lambda p, l, r, e: transformer_forward(p, cfg, l, r, e, t, cs, sn))
        got = fn(sharded, lat2, ref2, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=1e-4)


def test_sp_allgather_gradients_flow():
    """sp_allgather is differentiable (the TPU path routes through the
    custom-VJP flash kernels; the CPU test path through xla attention) —
    sharded training can use the AG-KV backend."""
    from s2v_tpu.parallel.sp_attention import allgather_kv_attention

    q, k, v = _qkv(s=19)
    mesh = make_mesh({"seq": 8})

    def loss(q_, k_, v_):
        return jnp.sum(allgather_kv_attention(q_, k_, v_, mesh) ** 2)

    g_q, g_k, g_v = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q_, k_, v_):
        return jnp.sum(jax.nn.dot_product_attention(q_, k_, v_) ** 2)

    e_q, e_k, e_v = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, e in ((g_q, e_q), (g_k, e_k), (g_v, e_v)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), atol=5e-5, rtol=1e-4)


def test_sp_windowed_gradients_through_transformer():
    """attention_backend='sp_windowed' differentiates end-to-end through
    transformer_forward (the trainer reroutes 'windowed' here under a seq
    mesh); grads match the single-device windowed_xla backend."""
    import dataclasses

    cfg, params, lat, ref, emb, cs, sn = _setup()
    cfg = dataclasses.replace(cfg, attention_window_frames=1)
    t = jnp.array([500], jnp.int32)

    def loss(p, backend):
        out = transformer_forward(
            p, cfg, lat, ref, emb[:1], t, cs, sn, attention_backend=backend
        )
        return jnp.sum(out ** 2)

    expected = jax.grad(lambda p: loss(p, "windowed_xla"))(params)
    mesh = make_mesh({"seq": 8})
    with mesh_context(mesh, default_logical_map(mesh)):
        got = jax.jit(jax.grad(lambda p: loss(p, "sp_windowed")))(params)
    flat_e, _ = jax.tree_util.tree_flatten(expected)
    flat_g, _ = jax.tree_util.tree_flatten(got)
    for a, b in zip(flat_g, flat_e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=2e-3)


def test_generate_composed_dp_sp_mesh_matches_single_device():
    """Composed data x seq mesh through the product surface: the sp
    constraints and the dp batch sharding must coexist."""
    pipe = _tiny_pipeline()
    kw = _gen_kwargs(pipe)
    # 2 prompts (dp=2): CFG layout is [uncond rows | cond rows]
    u, c = kw["prompt_embeds"][:1], kw["prompt_embeds"][1:]
    kw["prompt_embeds"] = jnp.concatenate([u, u, c, c], axis=0)
    kw["cfg_mode"] = "batched"
    expected = pipe.generate(**kw)

    sharded = _tiny_pipeline()
    sharded.set_mesh({"data": 2, "seq": 4})
    got = sharded.generate(**kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=1e-4)


def test_sp_int8_backend_matches_dense_within_int8_tolerance():
    """sp_int8 = all-gather-KV + the int8-QK kernel per shard (interpret
    mode on the CPU mesh); logits quantization bounds the error."""
    from s2v_tpu.ops.attention import joint_attention
    from s2v_tpu.ops.attention import init_attention_params

    cfg = TransformerConfig.tiny()
    d, h = cfg.inner_dim, cfg.num_attention_heads
    params = init_attention_params(jax.random.PRNGKey(0), d, h)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 19, d), jnp.float32)

    expected = joint_attention(params, x, h, backend="xla")
    mesh = make_mesh({"seq": 8})
    with mesh_context(mesh, default_logical_map(mesh)):
        got = jax.jit(
            lambda p_, x_: joint_attention(p_, x_, h, backend="sp_int8")
        )(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=5e-3, rtol=5e-2)


def test_canonical_cp_vae_decode_matches_default_streaming():
    """The canonical-schedule CP decode (odd first chunk streamed, caches
    injected into device 0's halo, uniform rest in parallel) must EXACTLY
    match the default single-device streaming decode — including the
    flagship 13-frame schedule the plain uniform CP path cannot serve."""
    from s2v_tpu.config import VAEConfig
    from s2v_tpu.models.vae import init_vae_params, _decode_plain
    from s2v_tpu.parallel.vae_temporal import (
        canonical_cp_chunks,
        sharded_vae_decode_canonical,
    )

    cfg = VAEConfig.tiny()  # num_latent_frames_batch_size = 2
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh({"seq": 8})
    for t in (13, 7, 4):  # odd-remainder (flagship shape), odd, divisible
        z = jax.random.normal(jax.random.PRNGKey(t), (1, t, 4, 4, cfg.latent_channels), jnp.float32)
        expected = _decode_plain(params, cfg, z)  # the reference schedule
        n = canonical_cp_chunks(cfg, t)
        assert 1 <= n <= 8
        got = sharded_vae_decode_canonical(params, cfg, z, mesh)
        assert got.shape == expected.shape, (t, got.shape, expected.shape)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=2e-5, rtol=1e-4,
            err_msg=f"t={t}",
        )


def test_sp_windowed_matches_single_chip_banded():
    """Sequence-parallel banded attention (frames sharded, KV gathered,
    scalar-prefetch offsets) == the single-chip banded kernel, including
    window clamping across shard boundaries and non-divisible frame
    counts."""
    from s2v_tpu.ops.pallas.banded_attention import banded_flash_attention
    from s2v_tpu.parallel.sp_attention import banded_allgather_attention

    B, H, D = 1, 2, 8
    g, tpf, w = 5, 4, 1
    mesh = make_mesh({"seq": 4}, jax.devices()[:4])
    for F in (8, 6):  # divisible by the ring + padded case
        S = g + F * tpf
        ks = jax.random.split(jax.random.PRNGKey(F), 3)
        q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, S, H, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, S, H, D), jnp.float32)
        expected = banded_flash_attention(q, k, v, g, tpf, w, interpret=True)
        got = banded_allgather_attention(
            q, k, v, mesh, "seq", g, tpf, w, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=2e-5, rtol=1e-4,
            err_msg=f"F={F}",
        )


def test_ring_trainable_grads_match_dense():
    """jax.grad through ring_attention_trainable (second-ring-pass custom
    VJP) == grads of dense attention, on both per-hop engines and with a
    ring-padded sequence length."""
    from s2v_tpu.parallel.ring_attention import ring_attention_trainable

    mesh = make_mesh({"seq": 4}, jax.devices()[:4])
    for use_kernel, s in ((False, 19), (True, 16)):
        q, k, v = _qkv(key=11, s=s, h=2)
        ct = jax.random.normal(jax.random.PRNGKey(12), q.shape, jnp.float32)

        def loss(q_, k_, v_):
            o = ring_attention_trainable(
                q_, k_, v_, mesh, "seq", None, use_kernel, True
            )
            return jnp.sum(o * ct)

        def loss_ref(q_, k_, v_):
            return jnp.sum(jax.nn.dot_product_attention(q_, k_, v_) * ct)

        got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip(("dq", "dk", "dv"), got, ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4,
                err_msg=f"use_kernel={use_kernel} {name}",
            )


def test_ulysses_attention_matches_dense():
    """sp_ulysses (all-to-all head scatter / seq gather) == dense
    attention, including a sequence length not divisible by the ring."""
    from s2v_tpu.parallel.sp_attention import ulysses_attention

    q, k, v = _qkv(s=19, h=8)
    expected = jax.nn.dot_product_attention(q, k, v)
    mesh = make_mesh({"seq": 8})
    got = ulysses_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_ulysses_gradients_flow():
    """sp_ulysses differentiates for free (all_to_all is linear, the local
    kernel is the trainable flash path)."""
    from s2v_tpu.parallel.sp_attention import ulysses_attention

    q, k, v = _qkv(key=7, s=19, h=8)
    mesh = make_mesh({"seq": 8})

    def loss(q_, k_, v_):
        return jnp.sum(ulysses_attention(q_, k_, v_, mesh) ** 2)

    def loss_ref(q_, k_, v_):
        return jnp.sum(jax.nn.dot_product_attention(q_, k_, v_) ** 2)

    got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, e in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), atol=5e-5, rtol=1e-4)


def test_ulysses_rejects_indivisible_heads():
    from s2v_tpu.parallel.sp_attention import ulysses_attention

    q, k, v = _qkv(h=2)
    mesh = make_mesh({"seq": 8})
    with pytest.raises(ValueError, match="heads divisible"):
        ulysses_attention(q, k, v, mesh)


def test_sp_ulysses_backend_through_transformer():
    """The 'sp_ulysses' backend end-to-end through transformer_forward
    (4 tiny-config heads over a seq4 mesh) matches the xla backend."""
    cfg, params, lat, ref, emb, cs, sn = _setup()
    t = jnp.array([500], jnp.int32)
    expected = transformer_forward(
        params, cfg, lat, ref, emb[:1], t, cs, sn, attention_backend="xla"
    )
    mesh = make_mesh({"seq": 4}, jax.devices()[:4])
    with mesh_context(mesh, default_logical_map(mesh)):
        got = jax.jit(
            lambda p, l, r, e: transformer_forward(
                p, cfg, l, r, e, t, cs, sn, attention_backend="sp_ulysses"
            )
        )(params, lat, ref, emb[:1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=1e-4)


def test_sp_windowed_trainable_grads_match_reference():
    """jax.grad through banded_allgather_attention_trainable (frames
    sharded over a 4-device seq mesh, custom-VJP SP banded backward with
    psum_scatter) == grads of the O(S^2) masked reference — including a
    frame count not divisible by the ring (ring-pad dummy frames must
    contribute zero gradient) and window rows crossing shard boundaries."""
    from s2v_tpu.ops.windowed_attention import windowed_attention_reference
    from s2v_tpu.parallel.sp_attention import banded_allgather_attention_trainable

    B, H, D = 1, 2, 8
    g, tpf, w = 5, 4, 1
    mesh = make_mesh({"seq": 4}, jax.devices()[:4])
    for F in (8, 6):
        S = g + F * tpf
        ks = jax.random.split(jax.random.PRNGKey(100 + F), 4)
        q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, S, H, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, S, H, D), jnp.float32)
        ct = jax.random.normal(ks[3], (B, S, H, D), jnp.float32)

        def loss_sp(q_, k_, v_):
            o = banded_allgather_attention_trainable(
                q_, k_, v_, mesh, "seq", g, tpf, w, True
            )
            return jnp.sum(o * ct)

        def loss_ref(q_, k_, v_):
            return jnp.sum(windowed_attention_reference(q_, k_, v_, g, tpf, w) * ct)

        got = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
        ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b_ in zip(("dq", "dk", "dv"), got, ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-3,
                err_msg=f"F={F} {name}",
            )


def test_sp_windowed_backend_through_transformer():
    """attention_backend='windowed' under a seq mesh (product reroute to
    sp_windowed) matches the single-device windowed backend."""
    import dataclasses

    cfg, params, lat, ref, emb, cs, sn = _setup()
    cfg = dataclasses.replace(cfg, attention_window_frames=1)
    t = jnp.array([500, 500], jnp.int32)
    lat2 = jnp.concatenate([lat, lat])
    ref2 = jnp.concatenate([ref, ref])
    expected = transformer_forward(
        params, cfg, lat2, ref2, emb, t, cs, sn,
        attention_backend="windowed_xla",
    )
    mesh = make_mesh({"seq": 8})
    with mesh_context(mesh, default_logical_map(mesh)):
        got = jax.jit(
            lambda p, l, r, e: transformer_forward(
                p, cfg, l, r, e, t, cs, sn, attention_backend="sp_windowed"
            )
        )(params, lat2, ref2, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=1e-4)


def test_t5_tp_sharded_encode_matches_single_device():
    """text_encoder_device="mesh": the TP-sharded T5 encode (megatron
    q/k/v/wi column-parallel, o/wo row-parallel — parallel/sharding.py
    t5_param_specs) reproduces the single-device encode."""
    from s2v_tpu.config import T5Config
    from s2v_tpu.models.t5 import init_t5_params, t5_encode
    from s2v_tpu.parallel.sharding import t5_param_specs

    cfg = T5Config.tiny()
    params = init_t5_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(
        np.random.RandomState(0).randint(2, 30, size=(2, 16)), jnp.int32
    )
    ref_out = np.asarray(t5_encode(params, cfg, ids), np.float32)

    mesh = make_mesh({"model": 4, "data": 2})
    specs = t5_param_specs(params, "model")
    # every kernel leaf must have a non-trivial spec (guards the
    # path-matching against key renames)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    sharded_leaves = [s for _, s in flat if s != jax.sharding.PartitionSpec()]
    # stacked tree: 7 block kernels (q k v o wi_0 wi_1 wo) + the relative
    # attention bias table
    assert len(sharded_leaves) == 8
    p_sh = shard_params(params, mesh, specs)
    with mesh_context(mesh, default_logical_map(mesh)):
        out = jax.jit(lambda p, i: t5_encode(p, cfg, i))(p_sh, ids)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref_out, atol=2e-5, rtol=1e-4)


def test_pipeline_t5_on_mesh_encode(tmp_path):
    """S2VPipeline plumbing: t5_on_mesh shards T5 at set_mesh and
    encode_prompt runs the jitted TP program."""
    from s2v_tpu.config import T5Config, VAEConfig
    from s2v_tpu.models.t5 import init_t5_params
    from s2v_tpu.models.vae import init_vae_params
    from s2v_tpu.models.transformer import init_transformer_params
    from s2v_tpu.pipelines.s2v import S2VPipeline

    class _Tok:
        def encode(self, prompts, max_length=226):
            out = np.zeros((len(prompts), max_length), np.int32)
            for i, p in enumerate(prompts):
                ids = [(hash(w) % 20) + 2 for w in p.split()][: max_length - 1] + [1]
                out[i, : len(ids)] = ids
            return out

    tcfg = TransformerConfig.tiny()
    t5cfg = T5Config.tiny(d_model=tcfg.text_embed_dim)
    key = jax.random.PRNGKey(0)
    pipe = S2VPipeline(
        transformer_params=init_transformer_params(key, tcfg),
        transformer_cfg=tcfg,
        vae_params=init_vae_params(key, VAEConfig.tiny()),
        vae_cfg=VAEConfig.tiny(),
        t5_params=init_t5_params(key, t5cfg),
        t5_cfg=t5cfg,
        scheduler_cfg=SchedulerConfig(),
        tokenizer=_Tok(),
    )
    base = np.asarray(pipe.encode_prompt("a pig", do_cfg=False), np.float32)
    pipe.t5_on_mesh = True
    pipe.set_mesh("dp2,tp4")
    out = np.asarray(pipe.encode_prompt("a pig", do_cfg=False), np.float32)
    np.testing.assert_allclose(out, base, atol=2e-5, rtol=1e-4)


def test_spatial_cp_tiled_decode_matches_sequential():
    """Spatial-tile CP decode (parallel/vae_spatial.py): full tiles decoded
    in one sharded vmap + ragged edges sequential == the single-device
    tiled decode bit-for-bit at fp32 tolerance (VERDICT r3 #7)."""
    from s2v_tpu.config import VAEConfig
    from s2v_tpu.models.vae import _tiled, init_vae_params
    from s2v_tpu.parallel.vae_spatial import (
        spatial_cp_supported,
        spatial_tiled_decode_cp,
    )

    vcfg = VAEConfig.tiny()  # tile_latent 4x4, overlaps 1/6 & 1/5
    params = init_vae_params(jax.random.PRNGKey(0), vcfg)
    # latents above native size in both dims -> tiled regime with a mix of
    # full and ragged edge tiles (the reference grid always overshoots)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 10, 13, vcfg.latent_channels), jnp.float32)

    expected = _tiled(params, vcfg, z, encode=False)
    mesh = make_mesh({"seq": 4}, jax.devices()[:4])
    assert spatial_cp_supported(vcfg, z, mesh, "seq")
    got = spatial_tiled_decode_cp(params, vcfg, z, mesh, "seq")
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=3e-5, rtol=1e-4)


def test_spatial_cp_not_engaged_below_native():
    from s2v_tpu.config import VAEConfig
    from s2v_tpu.parallel.vae_spatial import spatial_cp_supported

    vcfg = VAEConfig.tiny()  # tile_latent_min = 2x2
    z = jnp.zeros((1, 2, vcfg.tile_latent_min_height, vcfg.tile_latent_min_width,
                   vcfg.latent_channels))
    mesh = make_mesh({"seq": 4}, jax.devices()[:4])
    assert not spatial_cp_supported(vcfg, z, mesh, "seq")


def test_qlora_train_step_under_mesh_matches_single_device():
    """QLoRA (int8 frozen base, output-additive adapters) under a dp2 x tp4
    mesh: the int8 tree TP-shards via transformer_param_specs_like, the
    batch dp-shards, and the donated train step's loss matches the
    single-device run to fp32 tolerance."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from s2v_tpu.ops.quant import quantize_transformer_params
    from s2v_tpu.parallel import mesh_context
    from s2v_tpu.parallel.sharding import (
        default_logical_map,
        shard_params,
        transformer_param_specs_like,
    )
    from s2v_tpu.training.lora import (
        LoRASpec,
        init_lora_params,
        make_lora_train_step,
    )

    cfg, params, lat, ref, emb, cs, sn = _setup()
    qparams = quantize_transformer_params(params)
    spec = LoRASpec(rank=2, alpha=4.0)
    lora0 = init_lora_params(jax.random.PRNGKey(9), qparams, spec)
    lora0 = jax.tree.map(lambda x: x + 0.02, lora0)
    B = 2
    batch = {
        "video_latents": jnp.concatenate([lat, lat * 0.5], axis=0),
        "ref_latents": jnp.concatenate([ref, ref], axis=0),
        "text_embeds": emb[:B],
        "rope_cos": cs,
        "rope_sin": sn,
    }

    def run(base, batch, mesh=None):
        init_opt, step = make_lora_train_step(
            base, cfg, spec, SchedulerConfig(), learning_rate=1e-3
        )
        lora, opt = jax.tree.map(jnp.copy, lora0), init_opt(lora0)
        losses = []
        for i in range(2):
            if mesh is not None:
                with mesh_context(mesh, default_logical_map(mesh)):
                    lora, opt, loss = step(lora, opt, batch, jax.random.PRNGKey(i))
            else:
                lora, opt, loss = step(lora, opt, batch, jax.random.PRNGKey(i))
            losses.append(float(loss))
        return losses

    want = run(qparams, batch)

    mesh = make_mesh({"data": 2, "model": 4})
    sharded = shard_params(
        qparams, mesh, transformer_param_specs_like(qparams, "model")
    )
    sbatch = dict(batch)
    for k in ("video_latents", "ref_latents", "text_embeds"):
        sbatch[k] = jax.device_put(sbatch[k], NamedSharding(mesh, P("data")))
    got = run(sharded, sbatch, mesh=mesh)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_route_seq_backend_quoted_slices():
    """docs/SCALING.md table legality at the FLAGSHIP head count (48):
    v5e-16 dp2xsp8 and v5e-32 dp2xsp16 keep Ulysses; v5e-64 dp2xsp16xtp2
    (24 heads/shard % 16 != 0) falls back to AG-KV with a stated reason."""
    from s2v_tpu.ops.attention import route_seq_backend

    assert route_seq_backend("sp_ulysses", 48, 8, 2) == ("sp_ulysses", None)
    assert route_seq_backend("sp_ulysses", 48, 16, 1) == ("sp_ulysses", None)
    b, reason = route_seq_backend("sp_ulysses", 48, 16, 2)
    assert b == "sp_allgather" and "not divisible" in reason
    # single-chip names route to their SP forms under any seq ring
    assert route_seq_backend("pallas", 48, 16, 1)[0] == "sp_allgather"
    assert route_seq_backend("pallas_int8", 48, 8, 1)[0] == "sp_int8"
    assert route_seq_backend("windowed", 48, 8, 1)[0] == "sp_windowed"
    # no seq axis: untouched
    assert route_seq_backend("pallas", 48, 1, 4) == ("pallas", None)
    import pytest

    with pytest.raises(ValueError, match="windowed_gather"):
        route_seq_backend("windowed_gather", 48, 8, 1)


_V5E64_LOWER_SCRIPT = r"""
import os, sys
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
from jax import lax
assert len(jax.devices()) >= 64, len(jax.devices())

from s2v_tpu.config import SchedulerConfig, TransformerConfig
from s2v_tpu.models.transformer import init_transformer_params_stacked
from s2v_tpu.ops.attention import route_seq_backend
from s2v_tpu.ops.rope import build_segmented_rope, prepare_video_and_ref_rope
from s2v_tpu.parallel import default_logical_map, make_mesh, mesh_context
from s2v_tpu.pipelines.denoise import DenoiseSchedule, _build_step_fn

# FLAGSHIP WIDTH (48 heads x 64 dim, 19,126-token sequence); depth 2 — the
# sharding legality the scaling table quotes depends on heads/seq/frames,
# not depth, and depth 42 only scales the scan length.
cfg = TransformerConfig.cogvideox_5b(num_layers=2)
B, F, H, W = 1, 13, 60, 90
params = init_transformer_params_stacked(jax.random.PRNGKey(0), cfg)
vc, vs, rc, rs = prepare_video_and_ref_rope(480, 720, F, cfg.attention_head_dim)
cs, sn = build_segmented_rope(cfg.max_text_seq_length, rc, rs, vc, vs)
video = jnp.zeros((B, F, H, W, cfg.in_channels), cfg.dtype)
ref = jnp.zeros((B, 1, H, W, cfg.in_channels), cfg.dtype)
emb2 = jnp.zeros((2 * B, cfg.max_text_seq_length, cfg.text_embed_dim), cfg.dtype)
sched = DenoiseSchedule.create(SchedulerConfig(), 50, 6.0, use_dynamic_cfg=True)

MESHES = [
    # (name, axes, requested backend, expected backend after routing)
    ("v5e-32 dp2 x sp16 (Ulysses)", {{"data": 2, "seq": 16}},
     "sp_ulysses", "sp_ulysses"),
    ("v5e-64 dp2 x sp16 x tp2 (AG-KV fallback)",
     {{"data": 2, "seq": 16, "model": 2}}, "sp_ulysses", "sp_allgather"),
]
for name, axes, requested, expected in MESHES:
    mesh = make_mesh(axes)
    tp = axes.get("model", 1)
    backend, reason = route_seq_backend(
        requested, cfg.num_attention_heads, axes["seq"], tp)
    assert backend == expected, (name, backend, expected, reason)
    step = _build_step_fn(
        params, cfg, sched, ref, emb2, cs, sn, True, jax.random.PRNGKey(7),
        backend, None, "batched", None)
    fn = jax.jit(lambda carry: lax.fori_loop(0, 2, step, carry))
    carry = (video, jnp.zeros_like(video))
    with mesh_context(mesh, default_logical_map(mesh)):
        lowered = fn.lower(carry)
    text = lowered.as_text()
    # the sharded attention must actually be in the program: shardy manual
    # computation regions + the expected collective
    assert "sdy.manual" in text, name
    want_coll = "all_to_all" if backend == "sp_ulysses" else "all_gather"
    assert want_coll in text, (name, want_coll)
    print(f"LOWER_OK {{name}}: backend={{backend}}", flush=True)
print("ALL_OK", flush=True)
"""


@pytest.mark.slow
def test_v5e_64_mesh_lowering_flagship_width():
    """VERDICT r4 #4: shape-only jit-lowering of the denoise step at the
    FLAGSHIP width (48 heads, S=19,126) under the scaling plan's v5e-32 and
    v5e-64 meshes on a 64-device virtual CPU mesh — asserting the documented
    Ulysses/AG-KV routing engages.  Lowering only (no compile/execute): the
    claim being certified is mesh legality, padding math, and shard_map
    tracing at the quoted head/seq/frame divisibilities."""
    import os
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_", "TPU_")):
            env.pop(k)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=64")
    env["XLA_FLAGS"] = " ".join(flags)
    out = subprocess.run(
        [_sys.executable, "-c", _V5E64_LOWER_SCRIPT.format(repo=repo)],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "ALL_OK" in out.stdout
    assert out.stdout.count("LOWER_OK") == 2
