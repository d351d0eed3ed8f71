"""Differentiable Pallas-attention wrapper: gradients match the XLA
attention's (interpret-mode forward on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from s2v_tpu.ops.attention import chunked_attention, flash_attention_trainable


def test_grads_match_xla():
    rng = np.random.RandomState(0)
    b, s, h, d = 1, 96, 2, 64
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) ** 2)

    def loss_chunked(q, k, v):
        return jnp.sum(chunked_attention(q, k, v, block_q=32) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_chk = jax.grad(loss_chunked, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_chk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5, rtol=1e-4)


def test_trainable_wrapper_bwd_is_chunked_vjp():
    """The custom VJP routes backward through chunked_attention, so its
    gradients must equal grad(chunked_attention) exactly (forward runs the
    kernel in interpret mode on CPU)."""
    from s2v_tpu.ops.pallas import flash_attention as fa_mod

    rng = np.random.RandomState(1)
    b, s, h, d = 1, 64, 1, 64
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))

    orig = fa_mod.flash_attention
    try:
        # CPU: force interpret mode for the kernel forward
        fa_mod.flash_attention = lambda q, k, v, **kw: orig(
            q, k, v, block_q=64, block_k=64, interpret=True
        )
        def loss(q, k, v):
            return jnp.sum(flash_attention_trainable(q, k, v) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa_mod.flash_attention = orig

    def loss_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5, rtol=1e-4)
