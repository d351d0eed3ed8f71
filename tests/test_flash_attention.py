"""Pallas flash attention vs XLA dot-product attention (interpret mode on
CPU; the same kernel compiles on real TPU — exercised by bench/graft)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2v_tpu.ops.pallas.flash_attention import flash_attention


def _ref_attention(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)


@pytest.mark.parametrize("s", [128, 300])  # exact multiple + padded case
def test_matches_xla_attention(s):
    rng = np.random.RandomState(0)
    b, h, d = 2, 3, 64
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    expected = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_cross_block_softmax():
    """Values concentrated in a late k-block: online rescaling must carry
    the max across blocks correctly."""
    rng = np.random.RandomState(1)
    b, s, h, d = 1, 256, 1, 64
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k_np = rng.randn(b, s, h, d).astype(np.float32)
    k_np[:, 200:] += 10.0  # dominant keys in the second block
    k = jnp.asarray(k_np)
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    expected = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=3e-5, rtol=1e-4)


def test_bf16_inputs():
    rng = np.random.RandomState(2)
    b, s, h, d = 1, 128, 2, 64
    q = jnp.asarray(rng.randn(b, s, h, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, s, h, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, s, h, d), jnp.bfloat16)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    expected = _ref_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=3e-2
    )


def test_cross_length_q_kv():
    """Sq != Skv (windowed path's global-query pass)."""
    import numpy as np
    rng = np.random.RandomState(5)
    b, sq, skv, h, d = 1, 70, 200, 2, 64
    q = jnp.asarray(rng.randn(b, sq, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, skv, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, skv, h, d).astype(np.float32))
    from s2v_tpu.ops.pallas.flash_attention import flash_attention
    got = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)

# ---------------------------------------------------------------------------
# bounded-softmax mode (no online-max recurrence; VERDICT r3 #1)


@pytest.mark.parametrize("s", [128, 300])
def test_bounded_matches_xla(s):
    rng = np.random.RandomState(3)
    b, h, d = 2, 3, 64
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    out = flash_attention(
        q, k, v, block_q=128, block_k=128, interpret=True, softmax_mode="bounded"
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref_attention(q, k, v)), atol=2e-5, rtol=1e-4
    )


def test_bounded_matches_online_bitwise_shape_and_lse():
    """o and lse from bounded mode agree with online mode at fp32 tolerance;
    lse must reflect the exact offset the kernel applied (bf16-rounded M0),
    because the backward kernels recompute P from it."""
    rng = np.random.RandomState(4)
    b, s, h, d = 1, 256, 2, 64
    q = jnp.asarray(rng.randn(b, s, h, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, s, h, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, s, h, d), jnp.bfloat16)
    o_on, lse_on = flash_attention(
        q, k, v, block_q=128, block_k=128, interpret=True, return_lse=True
    )
    o_bd, lse_bd = flash_attention(
        q, k, v, block_q=128, block_k=128, interpret=True, return_lse=True,
        softmax_mode="bounded",
    )
    np.testing.assert_allclose(
        np.asarray(o_bd, np.float32), np.asarray(o_on, np.float32), atol=3e-2
    )
    np.testing.assert_allclose(np.asarray(lse_bd), np.asarray(lse_on), atol=1e-3, rtol=1e-5)


def test_bounded_qk_layernorm_regime():
    """The production regime: qk-LayerNormed q/k (norm ~ sqrt(d)), where the
    Cauchy-Schwarz slack is small and the bounded path must NOT fall back."""
    rng = np.random.RandomState(6)
    b, s, h, d = 1, 256, 2, 64
    def _ln(x):
        x = x - x.mean(-1, keepdims=True)
        return x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6)
    q = jnp.asarray(_ln(rng.randn(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(_ln(rng.randn(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    out = flash_attention(
        q, k, v, block_q=128, block_k=128, interpret=True, softmax_mode="bounded"
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref_attention(q, k, v)), atol=2e-5, rtol=1e-4
    )


def test_bounded_underflow_fallback_is_exact():
    """Adversarial case: near-orthogonal q/k with huge norms makes the
    Cauchy-Schwarz bound sit ~e4 nats above the true max — every p
    underflows in fp32 and the in-graph lax.cond fallback must kick in and
    return the ONLINE kernel's exact result."""
    rng = np.random.RandomState(7)
    b, s, h, d = 1, 128, 1, 64
    # q in the first 32 dims, k in the last 32: all logits are exactly 0,
    # while ||q||*||k||*scale is ~100*100/8 = 1250 nats
    q_np = np.zeros((b, s, h, d), np.float32)
    k_np = np.zeros((b, s, h, d), np.float32)
    q_np[..., :32] = rng.randn(b, s, h, 32) * 100.0
    k_np[..., 32:] = rng.randn(b, s, h, 32) * 100.0
    q, k = jnp.asarray(q_np), jnp.asarray(k_np)
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    out = flash_attention(
        q, k, v, block_q=128, block_k=128, interpret=True, softmax_mode="bounded"
    )
    expected = _ref_attention(q, k, v)  # uniform attention (all logits 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_bounded_key_pad_mask():
    """key_pad_mask rides the same combined feature row as the -M0 offset."""
    rng = np.random.RandomState(8)
    b, s, h, d = 1, 128, 2, 64
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    mask = jnp.zeros((s,), bool).at[100:].set(True)  # exclude the tail keys
    out = flash_attention(
        q, k, v, block_q=128, block_k=128, interpret=True,
        key_pad_mask=mask, softmax_mode="bounded",
    )
    expected = _ref_attention(q[:, :], k[:, :100], v[:, :100])
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_bounded_grad_through_trainable(monkeypatch):
    """flash_attention_trainable with the bounded primal: the backward
    kernels consume the bounded lse and must reproduce the online-mode
    gradients."""
    import s2v_tpu.ops.attention as attention_mod

    rng = np.random.RandomState(9)
    b, s, h, d = 1, 128, 1, 64
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))

    def loss(fn):
        return lambda q_, k_, v_: (fn(q_, k_, v_) ** 2).sum()

    def ref(q_, k_, v_):
        return jax.nn.dot_product_attention(q_, k_, v_)

    g_ref = jax.grad(loss(ref), argnums=(0, 1, 2))(q, k, v)

    from s2v_tpu.ops.pallas import flash_attention as fa_mod
    from s2v_tpu.ops.pallas import flash_attention_bwd as fab_mod

    monkeypatch.setenv("S2V_FLASH_SOFTMAX", "bounded")
    orig_f = fa_mod.flash_attention
    monkeypatch.setattr(
        fa_mod, "flash_attention",
        lambda q_, k_, v_, **kw: orig_f(
            q_, k_, v_, block_q=64, block_k=64, interpret=True, **kw
        ),
    )
    orig_b = fab_mod.flash_attention_bwd
    monkeypatch.setattr(
        fab_mod, "flash_attention_bwd",
        lambda *a, **kw: orig_b(*a, block_q=64, block_k=64, interpret=True),
    )
    g_bd = jax.grad(loss(attention_mod.flash_attention_trainable), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_bd, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3)


def test_bounded_exp2_matches_xla():
    """exp2 variant (log2(e) folded into the q scale): identical math."""
    rng = np.random.RandomState(10)
    b, s, h, d = 1, 300, 2, 64
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    out, lse = flash_attention(
        q, k, v, block_q=128, block_k=128, interpret=True,
        softmax_mode="bounded_exp2", return_lse=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref_attention(q, k, v)), atol=2e-5, rtol=1e-4
    )
    _, lse_on = flash_attention(
        q, k, v, block_q=128, block_k=128, interpret=True, return_lse=True
    )
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_on), atol=1e-4, rtol=1e-5)
