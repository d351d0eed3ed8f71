"""LoRA training subsystem tests (tiny config, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from s2v_tpu.config import SchedulerConfig, TransformerConfig
from s2v_tpu.models.transformer import init_transformer_params, transformer_forward
from s2v_tpu.training.lora import (
    LoRASpec,
    export_lora_to_reference_format,
    init_lora_params,
    lora_loss_fn,
    make_lora_train_step,
    merge_lora_params,
)
from s2v_tpu.loaders.lora import merge_lora_into_state_dict, normalize_lora_keys



# jit-heavy full-coverage module (see pyproject markers); the fast tier
# (pytest -m 'not slow') keeps kernels/ops/loaders/scheduler coverage
pytestmark = __import__('pytest').mark.slow

def _setup():
    cfg = TransformerConfig.tiny()
    base = init_transformer_params(jax.random.PRNGKey(0), cfg)
    spec = LoRASpec(rank=4, alpha=8.0)
    lora = init_lora_params(jax.random.PRNGKey(1), base, spec)
    B, F, H, W = 2, 2, 8, 8
    batch = {
        "video_latents": jax.random.normal(jax.random.PRNGKey(2), (B, F, H, W, cfg.in_channels)),
        "ref_latents": jax.random.normal(jax.random.PRNGKey(3), (B, 1, H, W, cfg.in_channels)),
        "text_embeds": jax.random.normal(jax.random.PRNGKey(4), (B, cfg.max_text_seq_length, cfg.text_embed_dim)),
    }
    return cfg, base, spec, lora, batch


def test_zero_init_is_identity():
    """B = 0 at init -> merged model == base model."""
    cfg, base, spec, lora, batch = _setup()
    merged = merge_lora_params(base, lora, spec)
    t = jnp.array([100, 500])
    out_base = transformer_forward(base, cfg, batch["video_latents"], batch["ref_latents"], batch["text_embeds"], t)
    out_merged = transformer_forward(merged, cfg, batch["video_latents"], batch["ref_latents"], batch["text_embeds"], t)
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_merged), atol=1e-6)


def test_merge_does_not_mutate_base():
    cfg, base, spec, lora, _ = _setup()
    lora = jax.tree.map(lambda x: x + 0.1, lora)
    before = np.asarray(base["blocks"]["attn"]["qkv"]["kernel"]).copy()
    merge_lora_params(base, lora, spec)
    np.testing.assert_array_equal(before, np.asarray(base["blocks"]["attn"]["qkv"]["kernel"]))


def test_train_step_reduces_loss_and_only_updates_lora():
    cfg, base, spec, lora, batch = _setup()
    init_opt, train_step = make_lora_train_step(base, cfg, spec, SchedulerConfig(), learning_rate=1e-2)
    opt_state = init_opt(lora)
    rng = jax.random.PRNGKey(7)
    losses = []
    for i in range(8):
        lora, opt_state, loss = train_step(lora, opt_state, batch, jax.random.fold_in(rng, i % 2))
        losses.append(float(loss))
    # same rng pair repeats -> the model should fit these two noise draws
    assert losses[-1] < losses[0], losses
    # lora actually moved
    assert float(jnp.abs(lora["qkv"]["b"]).max()) > 0


def test_export_roundtrip_to_merge_path():
    """Trained adapters exported in the diffusers key format must merge via
    the loader exactly like merge_lora_params does functionally."""
    cfg, base, spec, lora, batch = _setup()
    lora = jax.tree.map(lambda x: jax.random.normal(jax.random.PRNGKey(9), x.shape) * 0.05, lora)

    merged_fn = merge_lora_params(base, lora, spec)

    # export -> torch-layout state dict -> loader merge on a torch-layout base
    sd = export_lora_to_reference_format(lora, spec, cfg)
    # build a torch-layout base containing just the qkv targets to spot-check
    q_kernel = np.asarray(base["blocks"]["attn"]["qkv"]["kernel"])  # [L, D, 3D]
    d = cfg.inner_dim
    torch_base = {}
    for i in range(cfg.num_layers):
        torch_base[f"transformer_blocks.{i}.attn1.to_q.weight"] = q_kernel[i, :, :d].T.copy()
    merged_sd, _ = merge_lora_into_state_dict(
        torch_base,
        {k: v for k, v in sd.items() if "to_q" in k},
        alpha=spec.alpha,
    )
    for i in range(cfg.num_layers):
        expected = np.asarray(merged_fn["blocks"]["attn"]["qkv"]["kernel"][i, :, :d]).T
        np.testing.assert_allclose(
            merged_sd[f"transformer_blocks.{i}.attn1.to_q.weight"], expected, atol=1e-5
        )


def test_train_step_backend_plumbing():
    """attention_backend reaches the loss: a chunked-backend train step runs
    and matches the xla-backend loss on the first step (same math)."""
    cfg, base, spec, lora, batch = _setup()
    rng = jax.random.PRNGKey(11)
    init_opt, step_xla = make_lora_train_step(
        base, cfg, spec, SchedulerConfig(), learning_rate=1e-3, attention_backend="xla"
    )
    _, step_chk = make_lora_train_step(
        base, cfg, spec, SchedulerConfig(), learning_rate=1e-3, attention_backend="chunked"
    )
    opt_state = init_opt(lora)
    _, _, loss_xla = step_xla(lora, opt_state, batch, rng)
    _, _, loss_chk = step_chk(lora, opt_state, batch, rng)
    np.testing.assert_allclose(float(loss_xla), float(loss_chk), rtol=2e-5)


def test_disentangled_lora_training():
    """spec.disentangled: norm-linear adapters modulate the ref stream only.
    With ONLY norm-linear targets adapted, a disentangled merged model must
    equal the base model on the video/text modulation path when B=0, and the
    train step must run and move the adapters."""
    import dataclasses

    cfg, base, _, _, batch = _setup()
    spec = LoRASpec(rank=4, alpha=8.0, targets=("norm1.linear", "norm2.linear"),
                    disentangled=True)
    lora = init_lora_params(jax.random.PRNGKey(1), base, spec)
    # non-zero B so merged != base
    lora = jax.tree.map(lambda x: x + 0.05, lora)
    merged = merge_lora_params(base, lora, spec)
    assert "base_linear" in merged["blocks"]["norm1"]
    np.testing.assert_array_equal(
        np.asarray(merged["blocks"]["norm1"]["base_linear"]["kernel"]),
        np.asarray(base["blocks"]["norm1"]["linear"]["kernel"]),
    )

    cfg_d = dataclasses.replace(cfg, disentangled_modulation=True)
    t = jnp.array([100, 500])
    out_d = transformer_forward(merged, cfg_d, batch["video_latents"], batch["ref_latents"], batch["text_embeds"], t)
    out_base = transformer_forward(base, cfg, batch["video_latents"], batch["ref_latents"], batch["text_embeds"], t)
    out_merged_plain = transformer_forward(merged, cfg, batch["video_latents"], batch["ref_latents"], batch["text_embeds"], t)
    # ref modulation differs -> disentangled != base; video/text on base
    # path -> disentangled != fully-merged either
    assert float(jnp.abs(out_d - out_base).max()) > 1e-5
    assert float(jnp.abs(out_d - out_merged_plain).max()) > 1e-5

    init_opt, train_step = make_lora_train_step(base, cfg, spec, SchedulerConfig(), 1e-2)
    lora0 = init_lora_params(jax.random.PRNGKey(2), base, spec)
    opt_state = init_opt(lora0)
    lora1, _, loss = train_step(lora0, opt_state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    assert float(jnp.abs(lora1["norm1.linear"]["b"]).max()) > 0


def test_remat_grads_identical():
    """Checkpointing the block scan must not change gradients."""
    cfg, base, spec, lora, batch = _setup()
    rng = jax.random.PRNGKey(13)
    from s2v_tpu.training.lora import lora_loss_fn
    from s2v_tpu.schedulers.ddim import compute_alphas_cumprod

    alphas = jnp.asarray(compute_alphas_cumprod(SchedulerConfig()))
    g_plain = jax.grad(lora_loss_fn)(lora, base, cfg, spec, batch, alphas, rng, "xla", False)
    g_remat = jax.grad(lora_loss_fn)(lora, base, cfg, spec, batch, alphas, rng, "xla", True)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)


# --- optimizer surface (reference template: train_cogvideox_lora.py:284-374) ---


def test_lr_schedules():
    from s2v_tpu.training.optim import OptimizerSpec, make_lr_schedule

    s = make_lr_schedule(OptimizerSpec(learning_rate=1e-3, lr_scheduler="cosine",
                                       lr_warmup_steps=10, max_train_steps=100))
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-6)
    assert float(s(100)) < 1e-4

    s = make_lr_schedule(OptimizerSpec(learning_rate=1e-3, lr_scheduler="linear",
                                       lr_warmup_steps=10, max_train_steps=110))
    np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(110)), 0.0, atol=1e-9)

    s = make_lr_schedule(OptimizerSpec(learning_rate=1e-3, lr_scheduler="constant_with_warmup",
                                       lr_warmup_steps=5, max_train_steps=50))
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(5)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(49)), 1e-3, rtol=1e-6)

    s = make_lr_schedule(OptimizerSpec(learning_rate=1e-3, lr_scheduler="constant"))
    np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-6)


def test_optimizer_spec_validation():
    import pytest
    from s2v_tpu.training.optim import OptimizerSpec

    with pytest.raises(ValueError):
        OptimizerSpec(optimizer="sgd")
    with pytest.raises(ValueError):
        OptimizerSpec(lr_scheduler="cyclic")
    with pytest.raises(ValueError):
        OptimizerSpec(gradient_accumulation_steps=0)


def test_gradient_accumulation_matches_single_step():
    """k identical microbatches through MultiSteps == one plain optimizer
    step (mean of k identical grads is the grad)."""
    from s2v_tpu.training.optim import OptimizerSpec

    cfg, base, spec, lora, batch = _setup()
    common = dict(optimizer="adamw", learning_rate=1e-2, max_grad_norm=1.0)
    o_plain = OptimizerSpec(gradient_accumulation_steps=1, **common)
    o_accum = OptimizerSpec(gradient_accumulation_steps=4, **common)
    rng = jax.random.PRNGKey(21)

    _, step_plain = make_lora_train_step(base, cfg, spec, SchedulerConfig(),
                                         optimizer_spec=o_plain)
    init_accum, step_accum = make_lora_train_step(base, cfg, spec, SchedulerConfig(),
                                                  optimizer_spec=o_accum)
    init_plain, _ = make_lora_train_step(base, cfg, spec, SchedulerConfig(),
                                         optimizer_spec=o_plain)

    lora_p, _, _ = step_plain(lora, init_plain(lora), batch, rng)
    lora_a, opt_a = lora, init_accum(lora)
    for _ in range(4):
        lora_a, opt_a, _ = step_accum(lora_a, opt_a, batch, rng)
    for a, b in zip(jax.tree.leaves(lora_p), jax.tree.leaves(lora_a)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)


def test_gradient_accumulation_holds_params_between_boundaries():
    from s2v_tpu.training.optim import OptimizerSpec

    cfg, base, spec, lora, batch = _setup()
    o = OptimizerSpec(learning_rate=1e-2, gradient_accumulation_steps=3)
    init_opt, train_step = make_lora_train_step(base, cfg, spec, SchedulerConfig(),
                                                optimizer_spec=o)
    opt = init_opt(lora)
    l1, opt, _ = train_step(lora, opt, batch, jax.random.PRNGKey(0))
    l2, opt, _ = train_step(l1, opt, batch, jax.random.PRNGKey(1))
    for a, b in zip(jax.tree.leaves(lora), jax.tree.leaves(l2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    l3, opt, _ = train_step(l2, opt, batch, jax.random.PRNGKey(2))
    assert any(float(jnp.abs(a - b).max()) > 0
               for a, b in zip(jax.tree.leaves(lora), jax.tree.leaves(l3)))


def test_warmup_schedule_threads_into_train_step():
    """warmup from 0: the first optimizer update is a no-op (lr(0)=0)."""
    from s2v_tpu.training.optim import OptimizerSpec

    cfg, base, spec, lora, batch = _setup()
    o = OptimizerSpec(learning_rate=1e-2, lr_scheduler="cosine",
                      lr_warmup_steps=5, max_train_steps=50)
    init_opt, train_step = make_lora_train_step(base, cfg, spec, SchedulerConfig(),
                                                optimizer_spec=o)
    l1, opt, _ = train_step(lora, init_opt(lora), batch, jax.random.PRNGKey(0))
    for a, b in zip(jax.tree.leaves(lora), jax.tree.leaves(l1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    # second step: lr(1) > 0 -> params move
    l2, opt, _ = train_step(l1, opt, batch, jax.random.PRNGKey(1))
    assert any(float(jnp.abs(a - b).max()) > 0
               for a, b in zip(jax.tree.leaves(l1), jax.tree.leaves(l2)))


def test_prodigy_optimizer_runs():
    from s2v_tpu.training.optim import OptimizerSpec

    cfg, base, spec, lora, batch = _setup()
    o = OptimizerSpec(optimizer="prodigy", learning_rate=1.0)
    init_opt, train_step = make_lora_train_step(base, cfg, spec, SchedulerConfig(),
                                                optimizer_spec=o)
    opt = init_opt(lora)
    for i in range(3):
        lora, opt, loss = train_step(lora, opt, batch, jax.random.fold_in(jax.random.PRNGKey(5), i))
        assert np.isfinite(float(loss))


def test_remat_dots_policy_grads_identical():
    """remat='dots' (save-matmul-outputs policy) must not change grads."""
    cfg, base, spec, lora, batch = _setup()
    rng = jax.random.PRNGKey(29)
    from s2v_tpu.schedulers.ddim import compute_alphas_cumprod

    alphas = jnp.asarray(compute_alphas_cumprod(SchedulerConfig()))
    g_full = jax.grad(lora_loss_fn)(lora, base, cfg, spec, batch, alphas, rng, "xla", True)
    g_dots = jax.grad(lora_loss_fn)(lora, base, cfg, spec, batch, alphas, rng, "xla", "dots")
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_dots)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)


def test_remat_seg_grads_identical():
    """remat='seg' (segmented/nested checkpointing — the sqrt(L) memory
    point that fits flagship LoRA training on a 16 GB chip) must not
    change gradients vs per-layer remat."""
    cfg, base, spec, lora, batch = _setup()
    rng = jax.random.PRNGKey(31)
    from s2v_tpu.schedulers.ddim import compute_alphas_cumprod

    alphas = jnp.asarray(compute_alphas_cumprod(SchedulerConfig()))
    g_full = jax.grad(lora_loss_fn)(lora, base, cfg, spec, batch, alphas, rng, "xla", True)
    g_seg = jax.grad(lora_loss_fn)(lora, base, cfg, spec, batch, alphas, rng, "xla", "seg")
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_seg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)
    # "seg<N>" pins the segment count; grads stay identical, and a
    # non-divisor N is rejected
    g_seg2 = jax.grad(lora_loss_fn)(
        lora, base, cfg, spec, batch, alphas, rng, "xla", f"seg{cfg.num_layers}"
    )
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_seg2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)
    import pytest

    with pytest.raises(ValueError, match="divide"):
        lora_loss_fn(lora, base, cfg, spec, batch, alphas, rng, "xla",
                     f"seg{cfg.num_layers + 1}")


def test_inscan_lora_matches_functional_merge():
    """The round-4 loss applies adapters per layer INSIDE the block scan
    (runtime factor tree) so no second weight tree materializes; loss and
    grads must match the whole-tree functional merge exactly (fp32, and
    spec.scale folds into A as an exact power-of-two here)."""
    from s2v_tpu.schedulers.ddim import compute_alphas_cumprod
    from s2v_tpu.training.full import vpred_loss

    cfg, base, spec, lora, batch = _setup()
    # nonzero B so the adapters actually perturb the forward
    lora = jax.tree.map(lambda x: x + 0.03, lora)
    alphas = jnp.asarray(compute_alphas_cumprod(SchedulerConfig()))
    rng = jax.random.PRNGKey(37)

    def loss_merge(l):
        return vpred_loss(merge_lora_params(base, l, spec), cfg, batch, alphas, rng)

    l_scan, g_scan = jax.value_and_grad(lora_loss_fn)(
        lora, base, cfg, spec, batch, alphas, rng, "xla", False
    )
    l_merge, g_merge = jax.value_and_grad(loss_merge)(lora)
    np.testing.assert_allclose(float(l_scan), float(l_merge), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_scan), jax.tree.leaves(g_merge)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)


def test_donated_train_step_rebind_loop():
    """donate=True (the production call sites): the rebinding loop works,
    the old trees are deleted in place, and the losses match the
    non-donating step bit-for-bit."""
    cfg, base, spec, lora, batch = _setup()
    init_opt, step = make_lora_train_step(
        base, cfg, spec, SchedulerConfig(), learning_rate=1e-2, donate=True
    )
    _, step_plain = make_lora_train_step(
        base, cfg, spec, SchedulerConfig(), learning_rate=1e-2
    )
    lora_p, opt_p = jax.tree.map(jnp.copy, lora), init_opt(lora)
    losses_plain = []
    for i in range(2):
        lora_p, opt_p, loss = step_plain(lora_p, opt_p, batch, jax.random.PRNGKey(i))
        losses_plain.append(float(loss))

    lora_d, opt_d = jax.tree.map(jnp.copy, lora), init_opt(lora)
    old_leaf = jax.tree.leaves(lora_d)[0]
    for i in range(2):
        lora_d, opt_d, loss = step(lora_d, opt_d, batch, jax.random.PRNGKey(i))
        assert float(loss) == losses_plain[i]
    assert old_leaf.is_deleted()
    for a, b in zip(jax.tree.leaves(lora_p), jax.tree.leaves(lora_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# QLoRA: int8 frozen base + output-additive runtime adapters
# ---------------------------------------------------------------------------


def test_int8_mm_vjp_is_dequant_linear_grad():
    """_int8_mm's custom VJP must equal the gradient of the dequantized
    linear map x @ (q * scale) — NOT the zero gradient that round() would
    propagate without it."""
    from s2v_tpu.ops.quant import _int8_mm, quantize_weight_int8

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (3, 7, 16), jnp.float32)
    w = jax.random.normal(k2, (16, 24), jnp.float32) * 0.1
    wq = quantize_weight_int8(w)
    g = jax.random.normal(k3, (3, 7, 24), jnp.float32)

    dx = jax.vjp(lambda xx: _int8_mm(xx, wq["q"], wq["scale"]), x)[1](g)[0]
    w_deq = np.asarray(wq["q"], np.float32) * np.asarray(wq["scale"])
    dx_ref = np.asarray(g) @ w_deq.reshape(16, 24).T
    # backward runs the g*scale product in bf16 before the MXU dot
    np.testing.assert_allclose(np.asarray(dx), dx_ref, atol=2e-2, rtol=2e-2)
    assert float(jnp.abs(dx).max()) > 0.0


def _quantized_setup():
    from s2v_tpu.ops.quant import quantize_transformer_params

    cfg, base, spec, lora, batch = _setup()
    return cfg, base, quantize_transformer_params(base), spec, lora, batch


def test_qlora_gradients_flow_through_int8_layers():
    """The trap this guards: round() has zero grad, so without the custom
    VJP the first layer's adapters would receive exactly zero gradient
    (their path to the loss crosses every later int8 linear).  Checks the
    LAYER-0 qkv B-factor grad is nonzero (A-grads are zero at B=0 init by
    construction)."""
    from s2v_tpu.schedulers.ddim import compute_alphas_cumprod

    cfg, base, qbase, spec, lora, batch = _quantized_setup()
    alphas = jnp.asarray(compute_alphas_cumprod(SchedulerConfig()))
    grads = jax.grad(lora_loss_fn)(
        lora, qbase, cfg, spec, batch, alphas, jax.random.PRNGKey(5), "xla", False
    )
    g_b0 = np.asarray(grads["qkv"]["b"][0])
    assert np.abs(g_b0).max() > 0.0, "layer-0 grad is zero: int8 VJP broken"
    # bf16-target adapters (norm linears, patch/text proj) keep flowing too
    assert np.abs(np.asarray(grads["norm1.linear"]["b"][0])).max() > 0.0
    assert np.abs(np.asarray(grads["patch_proj"]["b"])).max() > 0.0


def test_qlora_loss_and_grads_close_to_bf16_base():
    """int8-base loss/grads track the bf16-base run within quantization
    tolerance (per-channel int8 error is small at tiny dims)."""
    from s2v_tpu.schedulers.ddim import compute_alphas_cumprod

    cfg, base, qbase, spec, lora, batch = _quantized_setup()
    lora = jax.tree.map(lambda x: x + 0.02, lora)
    alphas = jnp.asarray(compute_alphas_cumprod(SchedulerConfig()))
    rng = jax.random.PRNGKey(7)

    l_q, g_q = jax.value_and_grad(lora_loss_fn)(
        lora, qbase, cfg, spec, batch, alphas, rng, "xla", False
    )
    l_b, g_b = jax.value_and_grad(lora_loss_fn)(
        lora, base, cfg, spec, batch, alphas, rng, "xla", False
    )
    np.testing.assert_allclose(float(l_q), float(l_b), rtol=0.05)
    for a, b in zip(jax.tree.leaves(g_q), jax.tree.leaves(g_b)):
        denom = np.abs(np.asarray(b)).max() + 1e-6
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / denom < 0.25


def test_qlora_train_steps_reduce_loss():
    """End-to-end QLoRA: donated train steps on the int8 base run, losses
    stay finite, and a few steps reduce the loss."""
    cfg, base, qbase, spec, lora, batch = _quantized_setup()
    init_opt, step = make_lora_train_step(
        qbase, cfg, spec, SchedulerConfig(), learning_rate=1e-2, donate=True
    )
    opt_state = init_opt(lora)
    losses = []
    for i in range(4):
        lora, opt_state, loss = step(lora, opt_state, batch, jax.random.PRNGKey(0))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_qlora_rejects_disentangled_and_merge():
    import pytest

    from s2v_tpu.ops.quant import quantize_transformer_params

    cfg, base, spec, lora, batch = _setup()
    qbase = quantize_transformer_params(base)
    with pytest.raises(ValueError, match="bf16/fp32 base"):
        merge_lora_params(qbase, lora, spec)
    dspec = LoRASpec(rank=4, alpha=8.0, disentangled=True)
    with pytest.raises(ValueError, match="disentangled"):
        make_lora_train_step(qbase, cfg, dspec, SchedulerConfig())


def test_runtime_factors_over_int8_match_bf16_merge():
    """Forward with int8 base + attached runtime factors ~= bf16 base with
    the same adapters merged (within int8 quantization tolerance) — the
    serving-side composition QLoRA checkpoints rely on."""
    from s2v_tpu.models.transformer import RUNTIME_LORA_KEY
    from s2v_tpu.ops.quant import quantize_transformer_params

    cfg, base, spec, lora, batch = _setup()
    lora = jax.tree.map(lambda x: x + 0.05, lora)
    merged = merge_lora_params(base, lora, spec)
    qbase = quantize_transformer_params(base)

    blocks, top = {}, {}
    for name, ab in lora.items():
        pair = {"a": ab["a"] * spec.scale, "b": ab["b"]}
        (top if name in ("patch_proj", "text_proj") else blocks)[name] = pair
    qtree = dict(qbase)
    qtree[RUNTIME_LORA_KEY] = {"blocks": blocks, "top": top}

    t = jnp.array([100, 500])
    out_merged = transformer_forward(
        merged, cfg, batch["video_latents"], batch["ref_latents"], batch["text_embeds"], t
    )
    out_q = transformer_forward(
        qtree, cfg, batch["video_latents"], batch["ref_latents"], batch["text_embeds"], t
    )
    err = np.abs(np.asarray(out_q) - np.asarray(out_merged)).max()
    scale = np.abs(np.asarray(out_merged)).max()
    assert err / scale < 0.05, f"int8+runtime vs bf16+merge rel err {err/scale}"



def test_prodigy_rejects_low_precision_moments():
    """optax prodigy has no moment-dtype knob; asking for bf16 moments must
    fail loudly instead of silently keeping fp32 (ADVICE r4)."""
    import pytest

    from s2v_tpu.training.optim import OptimizerSpec

    with pytest.raises(ValueError, match="prodigy"):
        OptimizerSpec(optimizer="prodigy", moment_dtype="bfloat16")
    OptimizerSpec(optimizer="prodigy")  # fp32 moments fine
