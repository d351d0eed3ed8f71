"""Differentiable Pallas-attention wrapper: gradients match the XLA
attention's (interpret-mode forward on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from s2v_tpu.ops.attention import chunked_attention, flash_attention_trainable



# jit-heavy full-coverage module (see pyproject markers); the fast tier
# (pytest -m 'not slow') keeps kernels/ops/loaders/scheduler coverage
pytestmark = __import__('pytest').mark.slow

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


def test_trainable_wrapper_grads_match_xla():
    """The custom VJP (flash fwd + flash bwd kernels, interpret mode on
    CPU) must match XLA attention gradients — incl. a ragged tail."""
    from s2v_tpu.ops.pallas import flash_attention as fa_mod
    from s2v_tpu.ops.pallas import flash_attention_bwd as fab_mod

    rng = np.random.RandomState(1)
    b, s, h, d = 1, 200, 2, 64  # s % block != 0 -> pad/mask paths
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))

    orig_f = fa_mod.flash_attention
    orig_b = fab_mod.flash_attention_bwd
    try:
        # CPU: force interpret mode for both kernels
        fa_mod.flash_attention = lambda q, k, v, **kw: orig_f(
            q, k, v, block_q=64, block_k=64, interpret=True, **kw
        )
        fab_mod.flash_attention_bwd = lambda *a, **kw: orig_b(
            *a, block_q=64, block_k=64, interpret=True
        )

        def loss(q, k, v):
            return jnp.sum(flash_attention_trainable(q, k, v) ** 2)

        val, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa_mod.flash_attention = orig_f
        fab_mod.flash_attention_bwd = orig_b

    def loss_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) ** 2)

    val_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-5)
    for a, b_ in zip(g_ref, g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5, rtol=1e-4)


def test_bwd_kernels_match_xla_vjp_directly():
    """flash_attention_bwd (interpret) vs jax.vjp of XLA attention."""
    from s2v_tpu.ops.pallas.flash_attention import flash_attention
    from s2v_tpu.ops.pallas.flash_attention_bwd import flash_attention_bwd

    rng = np.random.RandomState(2)
    b, s, h, d = 2, 136, 3, 64
    q, k, v, g = (jnp.asarray(rng.randn(b, s, h, d).astype(np.float32)) for _ in range(4))

    o, lse = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True, return_lse=True)
    dq, dk, dv = flash_attention_bwd(q, k, v, o, lse, g, block_q=64, block_k=64, interpret=True)

    ref, vjp = jax.vjp(jax.nn.dot_product_attention, q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5, rtol=1e-5)
    for a, r in zip((dq, dk, dv), vjp(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=3e-5, rtol=1e-4)
