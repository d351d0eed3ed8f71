"""Sliding-temporal-window attention (opt-in approximate path)."""

import numpy as np
import jax
import jax.numpy as jnp

from s2v_tpu.ops.windowed_attention import (
    windowed_attention,
    windowed_attention_reference,
)



# jit-heavy full-coverage module (see pyproject markers); the fast tier
# (pytest -m 'not slow') keeps kernels/ops/loaders/scheduler coverage
pytestmark = __import__('pytest').mark.slow

def _data(b=1, g=10, tpf=16, f=5, h=2, d=64, seed=0):
    rng = np.random.RandomState(seed)
    s = g + f * tpf
    mk = lambda: jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    return mk(), mk(), mk(), g, tpf, f


def test_windowed_matches_masked_reference():
    q, k, v, g, tpf, f = _data()
    for w in [0, 1, 2]:
        got = windowed_attention(q, k, v, g, tpf, w, attention_fn=jax.nn.dot_product_attention)
        ref = windowed_attention_reference(q, k, v, g, tpf, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4,
                                   err_msg=f"w={w}")


def test_full_window_equals_exact_attention():
    q, k, v, g, tpf, f = _data(seed=1)
    got = windowed_attention(q, k, v, g, tpf, f, attention_fn=jax.nn.dot_product_attention)
    exact = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=3e-5, rtol=1e-4)


def test_windowed_backend_in_transformer():
    """backend='windowed_xla' runs through the full transformer and, with a
    window covering all frames, matches the exact xla backend."""
    from s2v_tpu.config import TransformerConfig
    from s2v_tpu.models.transformer import init_transformer_params, transformer_forward
    from s2v_tpu.ops.rope import build_segmented_rope, get_3d_rotary_pos_embed
    import dataclasses

    cfg = TransformerConfig.tiny()
    params = init_transformer_params(jax.random.PRNGKey(0), cfg)
    B, F, H, W = 1, 3, 8, 8
    key = jax.random.PRNGKey(1)
    video = jax.random.normal(key, (B, F, H, W, cfg.in_channels))
    ref = jax.random.normal(key, (B, 1, H, W, cfg.in_channels))
    text = jax.random.normal(key, (B, cfg.max_text_seq_length, cfg.text_embed_dim))
    t = jnp.array([500.0])
    gh, gw = H // 2, W // 2
    cos, sin = get_3d_rotary_pos_embed(cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), F + 1)
    tok = gh * gw
    cs, sn = build_segmented_rope(cfg.max_text_seq_length, cos[:tok], sin[:tok],
                                  cos[tok:tok*(F+1)], sin[tok:tok*(F+1)])

    exact = transformer_forward(params, cfg, video, ref, text, t, cs, sn, attention_backend="xla")
    cfg_full = dataclasses.replace(cfg, attention_window_frames=F)
    full_win = transformer_forward(params, cfg_full, video, ref, text, t, cs, sn,
                                   attention_backend="windowed_xla")
    np.testing.assert_allclose(np.asarray(full_win), np.asarray(exact), atol=1e-4, rtol=1e-4)

    # a narrow window is a different (approximate) program but stays finite
    cfg_w1 = dataclasses.replace(cfg, attention_window_frames=0)
    approx = transformer_forward(params, cfg_w1, video, ref, text, t, cs, sn,
                                 attention_backend="windowed_xla")
    assert bool(jnp.isfinite(approx).all())
    assert float(jnp.abs(approx - exact).max()) > 1e-6  # actually approximate


def test_banded_kernel_matches_masked_reference():
    """In-kernel banded variant (interpret mode on CPU) == masked reference."""
    from s2v_tpu.ops.pallas.banded_attention import banded_flash_attention

    q, k, v, g, tpf, f = _data(seed=2)
    for w in [0, 1, 2]:
        got = banded_flash_attention(q, k, v, g, tpf, w, interpret=True)
        ref = windowed_attention_reference(q, k, v, g, tpf, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4,
                                   err_msg=f"w={w}")


def test_banded_kernel_full_window_equals_exact():
    from s2v_tpu.ops.pallas.banded_attention import banded_flash_attention

    q, k, v, g, tpf, f = _data(seed=3)
    got = banded_flash_attention(q, k, v, g, tpf, f, interpret=True)
    exact = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=3e-5, rtol=1e-4)


def test_banded_backward_matches_reference_grads():
    """Banded backward kernels (dq band, inverse-band dk/dv, global sweeps)
    == jax.grad of the O(S^2) masked reference (interpret mode on CPU)."""
    from s2v_tpu.ops.pallas.banded_attention import banded_flash_attention
    from s2v_tpu.ops.pallas.banded_attention_bwd import banded_flash_attention_bwd

    q, k, v, g, tpf, f = _data(seed=4)
    ct = jnp.asarray(np.random.RandomState(9).randn(*q.shape).astype(np.float32))
    for w in [0, 1, 2]:
        def loss(q_, k_, v_, w=w):
            o = windowed_attention_reference(q_, k_, v_, g, tpf, w)
            return jnp.sum(o * ct)

        dq_ref, dk_ref, dv_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        o, lse = banded_flash_attention(q, k, v, g, tpf, w,
                                        interpret=True, return_lse=True)
        dq, dk, dv = banded_flash_attention_bwd(
            q, k, v, o, lse, ct, g, tpf, w, interpret=True
        )
        for name, got, ref in (("dq", dq, dq_ref), ("dk", dk, dk_ref), ("dv", dv, dv_ref)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-4, rtol=1e-3,
                                       err_msg=f"w={w} {name}")


def test_banded_trainable_custom_vjp():
    """jax.grad through banded_attention_trainable == grads of the masked
    reference (the full custom-VJP path, interpret mode)."""
    from s2v_tpu.ops.attention import banded_attention_trainable

    q, k, v, g, tpf, f = _data(seed=5)
    ct = jnp.asarray(np.random.RandomState(11).randn(*q.shape).astype(np.float32))
    w = 1

    def loss_band(q_, k_, v_):
        return jnp.sum(banded_attention_trainable(q_, k_, v_, g, tpf, w, True) * ct)

    def loss_ref(q_, k_, v_):
        return jnp.sum(windowed_attention_reference(q_, k_, v_, g, tpf, w) * ct)

    got = jax.grad(loss_band, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3, err_msg=name)


def test_banded_backward_production_frame_width_row_split():
    """At the production frame width (tpf=1350 -> fp=1408) the backward
    kernels split output rows (rs=2) to fit scoped VMEM; exercise the
    //rs index arithmetic in interpret mode against the masked reference
    (tiny head count/dim keeps the O(S^2) reference affordable)."""
    from s2v_tpu.ops.pallas.banded_attention import banded_flash_attention
    from s2v_tpu.ops.pallas.banded_attention_bwd import banded_flash_attention_bwd

    rng = np.random.RandomState(3)
    b, g, tpf, f, h, d = 1, 10, 1350, 2, 1, 8
    s = g + f * tpf
    mk = lambda: jnp.asarray(rng.randn(b, s, h, d).astype(np.float32) * 0.3)
    q, k, v = mk(), mk(), mk()
    ct = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    w = 1

    def loss(q_, k_, v_):
        return jnp.sum(windowed_attention_reference(q_, k_, v_, g, tpf, w) * ct)

    dq_ref, dk_ref, dv_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    o, lse = banded_flash_attention(q, k, v, g, tpf, w, interpret=True, return_lse=True)
    dq, dk, dv = banded_flash_attention_bwd(q, k, v, o, lse, ct, g, tpf, w, interpret=True)
    for name, got, ref in (("dq", dq, dq_ref), ("dk", dk, dk_ref), ("dv", dv, dv_ref)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


def test_banded_forward_row_split_wide_frames():
    """At frame widths >= 2048 the FORWARD also sub-blocks query rows
    (band_row_split, 1 live fp32 block); check the //rs index maps against
    the masked reference (tpf=2040 -> fp=2048 -> rs=2)."""
    from s2v_tpu.ops.pallas.banded_attention import band_row_split, banded_flash_attention

    assert band_row_split(2048, 1) == 2
    rng = np.random.RandomState(6)
    b, g, tpf, f, h, d = 1, 10, 2040, 2, 1, 8
    s = g + f * tpf
    mk = lambda: jnp.asarray(rng.randn(b, s, h, d).astype(np.float32) * 0.3)
    q, k, v = mk(), mk(), mk()
    got = banded_flash_attention(q, k, v, g, tpf, 1, interpret=True)
    ref = windowed_attention_reference(q, k, v, g, tpf, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_banded_random_geometries():
    """Randomized geometry sweep for the banded forward+backward: token
    counts that don't align to lanes, globals larger/smaller than a frame,
    windows from 0 to full-clip — all vs the masked reference."""
    from s2v_tpu.ops.pallas.banded_attention import banded_flash_attention
    from s2v_tpu.ops.pallas.banded_attention_bwd import banded_flash_attention_bwd

    rng = np.random.RandomState(42)
    cases = [
        # (g, tpf, F, w)
        (1, 8, 2, 0),       # minimal everything
        (300, 24, 4, 1),    # g spans multiple fp blocks (fp=128, gp=384)
        (7, 130, 3, 2),     # tpf just over one lane tile
        (129, 16, 7, 3),    # window clamp engages on both edges
        (50, 40, 5, 9),     # window wider than the clip (span == F)
    ]
    for g, tpf, f, w in cases:
        s = g + f * tpf
        h, d = 2, 16
        mk = lambda: jnp.asarray(rng.randn(1, s, h, d).astype(np.float32) * 0.5)
        q, k, v = mk(), mk(), mk()
        ct = jnp.asarray(rng.randn(1, s, h, d).astype(np.float32))

        got, lse = banded_flash_attention(q, k, v, g, tpf, w, interpret=True, return_lse=True)
        ref = windowed_attention_reference(q, k, v, g, tpf, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5,
                                   rtol=1e-4, err_msg=f"fwd g={g} tpf={tpf} F={f} w={w}")

        def loss(q_, k_, v_, w=w, g=g, tpf=tpf):
            return jnp.sum(windowed_attention_reference(q_, k_, v_, g, tpf, w) * ct)

        refs = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        grads = banded_flash_attention_bwd(q, k, v, got, lse, ct, g, tpf, w, interpret=True)
        for name, a, b in zip(("dq", "dk", "dv"), grads, refs):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                       rtol=2e-3, err_msg=f"{name} g={g} tpf={tpf} F={f} w={w}")
