"""int8 weight+activation quantization tests."""

import numpy as np
import jax
import jax.numpy as jnp

from s2v_tpu.config import TransformerConfig
from s2v_tpu.models.transformer import init_transformer_params, transformer_forward
from s2v_tpu.ops.quant import dense, int8_dense, quantize_transformer_params, quantize_weight_int8



# jit-heavy full-coverage module (see pyproject markers); the fast tier
# (pytest -m 'not slow') keeps kernels/ops/loaders/scheduler coverage
pytestmark = __import__('pytest').mark.slow

def test_int8_dense_accuracy():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    w = rng.randn(64, 32).astype(np.float32) * 0.1
    b = rng.randn(32).astype(np.float32) * 0.1
    wq = quantize_weight_int8(jnp.asarray(w))
    got = int8_dense(x, wq, jnp.asarray(b))
    expected = np.asarray(x) @ w + b
    rms = np.sqrt(np.mean((np.asarray(got) - expected) ** 2))
    assert rms / np.sqrt(np.mean(expected**2)) < 0.02  # <2% RMS dynamic-int8 error


def test_dense_dispatch_formats():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(8, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    bf16_out = dense({"kernel": w, "bias": b}, x)
    qd = quantize_weight_int8(w)
    qd["bias"] = b
    q_out = dense(qd, x)
    np.testing.assert_allclose(np.asarray(bf16_out), np.asarray(x @ w + b), atol=1e-5)
    assert np.abs(np.asarray(q_out) - np.asarray(bf16_out)).mean() < 0.2


def test_quantized_transformer_close_to_bf16():
    cfg = TransformerConfig.tiny()
    params = init_transformer_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_transformer_params(params)
    # stacked kernels got quantized with per-layer leading axis intact
    assert qparams["blocks"]["attn"]["qkv"]["q"].dtype == jnp.int8
    assert qparams["blocks"]["attn"]["qkv"]["q"].shape[0] == cfg.num_layers

    B, F, H, W = 1, 2, 8, 8
    video = jax.random.normal(jax.random.PRNGKey(1), (B, F, H, W, cfg.in_channels))
    ref = jax.random.normal(jax.random.PRNGKey(2), (B, 1, H, W, cfg.in_channels))
    text = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.max_text_seq_length, cfg.text_embed_dim))
    t = jnp.array([500])
    out_bf16 = transformer_forward(params, cfg, video, ref, text, t)
    out_q = transformer_forward(qparams, cfg, video, ref, text, t)
    # int8 path stays within a few percent RMS of the bf16 reference
    rms = float(jnp.sqrt(jnp.mean((out_bf16 - out_q) ** 2)))
    ref_rms = float(jnp.sqrt(jnp.mean(out_bf16**2)))
    assert rms / ref_rms < 0.10, (rms, ref_rms)


def test_int8_qk_attention_close_to_exact():
    """int8-QK flash attention (interpret mode) stays within int8 rounding
    error of exact attention, including ragged key padding."""
    import jax
    import jax.numpy as jnp
    from s2v_tpu.ops.pallas.int8_attention import flash_attention_qk_int8

    rng = np.random.RandomState(0)
    b, s, h, d = 1, 90, 2, 32
    mk = lambda: jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    got = flash_attention_qk_int8(q, k, v, block_q=32, block_k=64, interpret=True)
    ref = jax.nn.dot_product_attention(q, k, v)
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 0.05, err  # ~1/254 per-operand rounding through softmax
    # and it must actually be the quantized path, not exact
    assert err > 1e-6


def test_int8_qk_attention_negative_logit_rows_with_padding():
    """Regression (review repro): rows whose REAL logits are all strongly
    negative used to underflow when padded keys pinned the softmax max at
    0 in a maskless kernel; the routed -1e30 pad mask keeps them exact."""
    import jax
    import jax.numpy as jnp
    from s2v_tpu.ops.pallas.int8_attention import flash_attention_qk_int8

    rng = np.random.RandomState(1)
    b, s, h, d = 1, 90, 1, 32  # block_k=64 -> 38 padded keys
    # construct q, k so every real scaled logit is ~ -90
    q = jnp.asarray(np.ones((b, s, h, d), np.float32) * 4.0)
    k = jnp.asarray(-np.ones((b, s, h, d), np.float32) * 4.0
                    + rng.randn(b, s, h, d).astype(np.float32) * 0.01)
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    got = flash_attention_qk_int8(q, k, v, block_q=32, block_k=64, interpret=True)
    ref = jax.nn.dot_product_attention(q, k, v)
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 0.05, err
    assert float(jnp.max(jnp.abs(got))) > 0.01  # not the all-zero failure mode
