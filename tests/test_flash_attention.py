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
