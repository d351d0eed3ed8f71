"""Full fine-tuning (FSDP) subsystem tests (tiny config, 8-device CPU mesh).

The reference has no trainer (SURVEY.md §0: fine-tuning code not
released); full.py supplies full-parameter training with FSDP sharding —
these tests pin the sharded step to the single-device step bit-for-bit
(GSPMD determinism) / within fp tolerance, and check the state really is
sharded (1/N addressable shards).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2v_tpu.config import SchedulerConfig, TransformerConfig
from s2v_tpu.models.transformer import init_transformer_params
from s2v_tpu.training.full import fsdp_param_specs, make_full_train_step, vpred_loss
from s2v_tpu.training.optim import OptimizerSpec

pytestmark = pytest.mark.slow


def _setup(batch_size=2):
    cfg = TransformerConfig.tiny()
    params = init_transformer_params(jax.random.PRNGKey(0), cfg)
    B, F, H, W = batch_size, 2, 8, 8
    batch = {
        "video_latents": jax.random.normal(jax.random.PRNGKey(2), (B, F, H, W, cfg.in_channels)),
        "ref_latents": jax.random.normal(jax.random.PRNGKey(3), (B, 1, H, W, cfg.in_channels)),
        "text_embeds": jax.random.normal(
            jax.random.PRNGKey(4), (B, cfg.max_text_seq_length, cfg.text_embed_dim)
        ),
    }
    return cfg, params, batch


def test_full_train_step_reduces_loss():
    cfg, params, batch = _setup()
    prepare, init_opt, train_step = make_full_train_step(
        cfg, SchedulerConfig(), OptimizerSpec(learning_rate=1e-3)
    )
    params = prepare(params)
    opt_state = init_opt(params)
    rng = jax.random.PRNGKey(7)
    losses = []
    for i in range(8):
        params, opt_state, loss = train_step(params, opt_state, batch,
                                             jax.random.fold_in(rng, i % 2))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_fsdp_param_specs_shapes():
    cfg, params, _ = _setup()
    specs = fsdp_param_specs(params, axis_size=8, min_size=64)
    flat_p = jax.tree.leaves(params)
    flat_s = jax.tree.leaves(specs, is_leaf=lambda x: not isinstance(x, dict))
    assert len(flat_p) == len(flat_s)
    n_sharded = 0
    for p, s in zip(flat_p, flat_s):
        sharded_axes = [i for i, a in enumerate(s) if a is not None]
        if int(np.prod(p.shape)) < 64:
            assert not sharded_axes, (p.shape, s)
        for i in sharded_axes:
            assert p.shape[i] % 8 == 0, (p.shape, s)
            n_sharded += 1
    assert n_sharded > 0  # the big kernels must actually shard


def test_fsdp_step_matches_single_device():
    """FSDP-sharded training on the 8-device CPU mesh == unsharded
    training: same params after 3 steps (fp32 tolerance)."""
    from s2v_tpu.parallel.sharding import make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices (CPU mesh via conftest XLA_FLAGS)")
    cfg, params, batch = _setup(batch_size=8)
    ospec = OptimizerSpec(learning_rate=1e-3, max_grad_norm=1.0)
    rng = jax.random.PRNGKey(11)

    # single device reference
    prep0, init0, step0 = make_full_train_step(cfg, SchedulerConfig(), ospec)
    p0 = jax.tree.map(lambda x: x.copy(), params)
    o0 = init0(p0)
    for i in range(3):
        p0, o0, l0 = step0(p0, o0, batch, jax.random.fold_in(rng, i))

    # FSDP over data axis (batch sharded too)
    mesh = make_mesh({"data": 8})
    prep, init_opt, step = make_full_train_step(
        cfg, SchedulerConfig(), ospec, mesh=mesh, fsdp_min_size=64
    )
    p1 = prep(jax.tree.map(lambda x: x.copy(), params))
    o1 = init_opt(p1)
    from jax.sharding import NamedSharding, PartitionSpec as P

    b_sh = NamedSharding(mesh, P("data"))
    batch_sh = {k: jax.device_put(v, b_sh) for k, v in batch.items()}
    for i in range(3):
        p1, o1, l1 = step(p1, o1, batch_sh, jax.random.fold_in(rng, i))

    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_fsdp_state_is_actually_sharded():
    """Params AND optimizer moments hold 1/8-sized addressable shards."""
    from s2v_tpu.parallel.sharding import make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    cfg, params, batch = _setup()
    mesh = make_mesh({"data": 8})
    prepare, init_opt, step = make_full_train_step(
        cfg, SchedulerConfig(), OptimizerSpec(), mesh=mesh, fsdp_min_size=64
    )
    p = prepare(params)
    o = init_opt(p)
    kernel = p["blocks"]["attn"]["qkv"]["kernel"]
    shard = kernel.addressable_shards[0].data
    assert shard.size == kernel.size // 8
    # find the matching moment leaf in the optimizer state: same global
    # shape, must carry the same sharding
    moments = [x for x in jax.tree.leaves(o)
               if hasattr(x, "shape") and x.shape == kernel.shape]
    assert moments, "adam moments missing"
    for m in moments:
        assert m.addressable_shards[0].data.size == m.size // 8
    # one step keeps the constraint
    p, o, _ = step(p, o, batch, jax.random.PRNGKey(0))
    kernel = p["blocks"]["attn"]["qkv"]["kernel"]
    assert kernel.addressable_shards[0].data.size == kernel.size // 8


def test_compute_dtype_mixed_precision():
    """bf16 compute with fp32 master params: loss finite, grads land fp32,
    and the fp32 master tree moves."""
    cfg, params, batch = _setup()
    g = jax.grad(vpred_loss)(
        params, cfg, batch,
        jnp.ones((1000,)) * 0.5, jax.random.PRNGKey(0),
        "xla", True, jnp.bfloat16,
    )
    leaves = jax.tree.leaves(g)
    assert all(x.dtype == jnp.float32 for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


def test_lora_step_with_fsdp_sharded_base_matches_replicated():
    """LoRA training over an FSDP-sharded FROZEN base (train.py
    --fsdp_base) == the replicated-base step: grads only flow to the
    adapters, so sharding the constant tree must not change the math."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from s2v_tpu.parallel.sharding import make_mesh
    from s2v_tpu.training.lora import LoRASpec, init_lora_params, make_lora_train_step

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    cfg, params, batch = _setup(batch_size=8)
    spec = LoRASpec(rank=2, alpha=4.0)
    lora0 = init_lora_params(jax.random.PRNGKey(1), params, spec)
    rng = jax.random.PRNGKey(3)

    init_r, step_r = make_lora_train_step(params, cfg, spec, SchedulerConfig(),
                                          learning_rate=1e-2)
    lora_r, opt_r = lora0, init_r(lora0)
    for i in range(2):
        lora_r, opt_r, loss_r = step_r(lora_r, opt_r, batch, jax.random.fold_in(rng, i))

    mesh = make_mesh({"data": 8})
    specs = fsdp_param_specs(params, 8, min_size=64)
    base_sh = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
    kernel = base_sh["blocks"]["attn"]["qkv"]["kernel"]
    assert kernel.addressable_shards[0].data.size == kernel.size // 8
    b_sh = NamedSharding(mesh, P("data"))
    batch_sh = {k: jax.device_put(v, b_sh) for k, v in batch.items()}
    init_s, step_s = make_lora_train_step(base_sh, cfg, spec, SchedulerConfig(),
                                          learning_rate=1e-2)
    lora_s, opt_s = lora0, init_s(lora0)
    for i in range(2):
        lora_s, opt_s, loss_s = step_s(lora_s, opt_s, batch_sh, jax.random.fold_in(rng, i))

    np.testing.assert_allclose(float(loss_r), float(loss_s), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(lora_r), jax.tree.leaves(lora_s)):
        # sharded reductions reassociate the sums: fp32-noise tolerance
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6, rtol=2e-4)


def test_full_train_step_under_seq_mesh_sp_allgather():
    """Full-FT under a pure seq mesh with the SP attention backend: the
    logical-axis map must be active (train.py's mesh context), and the
    loss must match the single-device xla step."""
    from s2v_tpu.parallel import default_logical_map, make_mesh, mesh_context

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    cfg, params, batch = _setup(batch_size=1)
    ospec = OptimizerSpec(learning_rate=1e-3)
    rng = jax.random.PRNGKey(17)

    _, init0, step0 = make_full_train_step(cfg, SchedulerConfig(), ospec,
                                           attention_backend="xla")
    p0 = jax.tree.map(lambda x: x.copy(), params)
    _, _, l0 = step0(p0, init0(p0), batch, rng)

    mesh = make_mesh({"seq": 8})
    prep, init_opt, step = make_full_train_step(
        cfg, SchedulerConfig(), ospec, attention_backend="sp_allgather",
        mesh=mesh,
    )
    p1 = prep(jax.tree.map(lambda x: x.copy(), params))
    with mesh_context(mesh, default_logical_map(mesh)):
        p1, o1, l1 = step(p1, init_opt(p1), batch, rng)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)


def test_full_train_step_ema():
    """--ema_decay: ema after one step == d*p0 + (1-d)*p1, and the final
    sample tree rides inside opt_state so checkpoints carry it."""
    cfg, params, batch = _setup()
    prep, init_opt, step = make_full_train_step(
        cfg, SchedulerConfig(), OptimizerSpec(learning_rate=1e-2), ema_decay=0.5
    )
    p0 = jax.tree.map(lambda x: x.copy(), params)
    st = init_opt(params)
    p1, st1, _ = step(params, st, batch, jax.random.PRNGKey(0))
    _, ema = st1
    for e, a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(
            np.asarray(e), 0.5 * np.asarray(a) + 0.5 * np.asarray(b),
            atol=1e-6, rtol=1e-5,
        )


def test_full_train_step_ema_with_accumulation():
    """EMA advances only on optimizer-update boundaries under gradient
    accumulation (between boundaries params are frozen — the EMA must be
    too)."""
    cfg, params, batch = _setup()
    prep, init_opt, step = make_full_train_step(
        cfg, SchedulerConfig(),
        OptimizerSpec(learning_rate=1e-2, gradient_accumulation_steps=3),
        ema_decay=0.5,
    )
    p0 = jax.tree.map(lambda x: x.copy(), params)
    st = init_opt(params)
    p, s1, _ = step(params, st, batch, jax.random.PRNGKey(0))
    p, s2, _ = step(p, s1, batch, jax.random.PRNGKey(1))
    # two microsteps in: params AND ema both still equal p0
    for e, a in zip(jax.tree.leaves(s2[1]), jax.tree.leaves(p0)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(a))
    p3, s3, _ = step(p, s2, batch, jax.random.PRNGKey(2))
    # boundary: ema == 0.5*p0 + 0.5*p3
    for e, a, b in zip(jax.tree.leaves(s3[1]), jax.tree.leaves(p0), jax.tree.leaves(p3)):
        np.testing.assert_allclose(
            np.asarray(e), 0.5 * np.asarray(a) + 0.5 * np.asarray(b),
            atol=1e-6, rtol=1e-5,
        )


def test_full_train_step_fsdp_x_tp_matches_single_device():
    """Combined 2D sharding (--mesh dp2,tp4): TP megatron specs + FSDP on
    the remaining dims, optimizer moments included; step parity vs the
    single-device run."""
    from s2v_tpu.parallel import default_logical_map, make_mesh, mesh_context
    from s2v_tpu.training.full import combined_param_specs

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    cfg, params, batch = _setup(batch_size=2)
    ospec = OptimizerSpec(learning_rate=1e-3, max_grad_norm=1.0)
    rng = jax.random.PRNGKey(23)

    _, init0, step0 = make_full_train_step(cfg, SchedulerConfig(), ospec)
    p0 = jax.tree.map(lambda x: x.copy(), params)
    o0 = init0(p0)
    for i in range(2):
        p0, o0, l0 = step0(p0, o0, batch, jax.random.fold_in(rng, i))

    mesh = make_mesh({"data": 2, "model": 4})
    specs = combined_param_specs(params, 2, min_size=64)
    # the qkv kernel must be sharded on BOTH axes
    qkv_spec = specs["blocks"]["attn"]["qkv"]["kernel"]
    flat = [a for a in qkv_spec if a is not None]
    assert "model" in flat and "data" in flat, qkv_spec

    prep, init_opt, step = make_full_train_step(
        cfg, SchedulerConfig(), ospec, mesh=mesh, fsdp_min_size=64
    )
    p1 = prep(jax.tree.map(lambda x: x.copy(), params))
    o1 = init_opt(p1)
    kernel = p1["blocks"]["attn"]["qkv"]["kernel"]
    assert kernel.addressable_shards[0].data.size == kernel.size // 8
    moments = [x for x in jax.tree.leaves(o1)
               if hasattr(x, "shape") and x.shape == kernel.shape]
    assert moments and all(
        m.addressable_shards[0].data.size == m.size // 8 for m in moments
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sh = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
                for k, v in batch.items()}
    with mesh_context(mesh, default_logical_map(mesh)):
        for i in range(2):
            p1, o1, l1 = step(p1, o1, batch_sh, jax.random.fold_in(rng, i))

    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4)
