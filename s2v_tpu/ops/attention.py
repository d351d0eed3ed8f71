"""Joint attention over the ``[text | ref | video]`` token sequence.

Parity target: reference ``CogVideoXAttnProcessor2_0``
(attention_processor.py:2014-2097): fused-sequence QKV, per-head LayerNorm on
q/k (eps 1e-6, affine), segment-wise RoPE, one scaled-dot-product attention
over the full sequence, output projection.

Two execution paths:
  * ``backend="xla"`` — ``jax.nn.dot_product_attention`` (XLA fuses this
    well on TPU and it is the reference-parity baseline).
  * ``backend="pallas"`` — the fused flash-attention kernel in
    ``s2v_tpu.ops.pallas.flash_attention`` (TPU only).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from s2v_tpu.ops.norms import layer_norm
from s2v_tpu.ops.rope import apply_rotary_emb
from s2v_tpu.parallel.context import constrain


# backend names that route through the sliding-temporal-window paths (the
# single source of truth for entry points configuring the window width)
WINDOWED_BACKENDS = ("windowed", "windowed_gather", "windowed_xla", "sp_windowed")

# every backend an entry point may select.  "auto" resolves per platform at
# pipeline-configuration time (resolve_attention_backend).
ATTENTION_BACKENDS = (
    "auto", "xla", "pallas", "pallas_int8", "chunked", "ring",
    "sp_allgather", "sp_int8", "sp_ulysses",
) + WINDOWED_BACKENDS  # incl. sp_windowed (sequence-parallel banded kernel)


def resolve_attention_backend(backend: str) -> str:
    """Resolve ``"auto"`` to the right exact backend for this platform:
    ``pallas`` (the fused flash kernel) on TPU, ``xla`` elsewhere.

    The xla backend (``jax.nn.dot_product_attention``) materializes the
    ``[B, H, S, S]`` logits tensor — tens of GB at the flagship 19,126-token
    geometry — so it must never be the silent default on a 16 GB chip; the
    reference's single entry point "just runs" at 480p
    (src/inference.py:172-264) and so must ours.
    """
    if backend != "auto":
        return backend
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


def route_seq_backend(
    backend: str, num_heads: int, seq_ring: int, tp_size: int = 1
):
    """Route a single-chip backend to its sequence-parallel form for a mesh
    with a ``seq`` axis of size ``seq_ring``, applying the documented
    legality fallbacks (docs/SCALING.md "Ulysses legality"):

      * ``pallas`` -> ``sp_allgather`` (a Pallas call under plain GSPMD does
        not partition; the explicit shard_map AG-KV wrapper is the
        sequence-parallel kernel path — measured 17.3 ms/device/layer vs the
        ring engine's 63.8 ms at the flagship geometry on v5e)
      * ``pallas_int8`` -> ``sp_int8`` (int8-QK kernel via the AG-KV wrapper)
      * ``windowed`` -> ``sp_windowed`` (banded kernel via frame sharding)
      * ``sp_ulysses`` -> ``sp_allgather`` when ``(num_heads / tp_size) %
        seq_ring != 0`` — e.g. the v5e-64 plan's dp2 x sp16 x tp2 mesh where
        48/2 = 24 heads are not divisible by ring 16, so AG-KV (no
        divisibility constraint) engages instead.

    Returns ``(backend, reason)`` — ``reason`` is a human-readable line when
    a fallback rerouted the request, else None.
    """
    if seq_ring <= 1:
        return backend, None
    if backend == "pallas":
        return "sp_allgather", None
    if backend == "pallas_int8":
        return "sp_int8", None
    if backend == "windowed":
        return "sp_windowed", None
    if backend == "windowed_gather":
        raise ValueError(
            "attention_backend='windowed_gather' has no sequence-parallel "
            "wrapper; under a seq mesh use 'windowed' (reroutes to the "
            "sp_windowed banded kernel) or 'windowed_xla'"
        )
    if backend == "sp_ulysses":
        heads_local = num_heads // max(tp_size, 1)
        if heads_local % seq_ring != 0:
            return "sp_allgather", (
                f"sp_ulysses illegal on this mesh ({heads_local} heads per "
                f"tp shard not divisible by seq ring {seq_ring}) — falling "
                f"back to sp_allgather (AG-KV has no divisibility "
                f"constraint; docs/SCALING.md)"
            )
    return backend, None


def attention_hbm_guard(
    backend: str,
    batch: int,
    num_heads: int,
    seq_len: int,
    platform: str | None = None,
    limit_bytes: int | None = None,
) -> None:
    """Refuse logits-materializing backends at geometries whose attention
    weights cannot fit accelerator HBM, with an actionable error instead of
    a runtime OOM minutes into the first compile.

    ``jax.nn.dot_product_attention`` holds the ``[B, H, S, S]`` logits plus
    a softmax temporary live; we budget 2 bf16 buffers and refuse above half
    the device memory limit.  ``platform``/``limit_bytes`` are injectable
    for tests.
    """
    if backend != "xla":
        return
    # Touch jax.devices() only when actually needed: a fully-injected call
    # (platform + limit_bytes, as in tests) must not initialize the backend
    # — on a wedged device relay that first touch can hang indefinitely.
    if platform is None:
        import jax

        platform = jax.devices()[0].platform
    if platform not in ("tpu",):
        return  # CPU hosts page; the xla path stays the parity backend there
    if limit_bytes is None:
        import jax

        try:
            limit_bytes = int(jax.devices()[0].memory_stats().get("bytes_limit", 16 * 2**30))
        except Exception:
            limit_bytes = 16 * 2**30
    logits_bytes = 2 * 2 * batch * num_heads * seq_len * seq_len  # 2 bf16 buffers
    if logits_bytes > limit_bytes // 2:
        raise ValueError(
            f"attention_backend='xla' would materialize ~{logits_bytes / 2**30:.1f} GiB "
            f"of attention logits (batch={batch}, heads={num_heads}, seq={seq_len}) "
            f"on a {limit_bytes / 2**30:.0f} GiB device. Use attention_backend='auto' "
            f"(resolves to the fused Pallas flash kernel on TPU), 'pallas', or "
            f"'chunked'."
        )


def qkv_projections(params, x: jnp.ndarray, num_heads: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project ``[B, S, D]`` to per-head q/k/v ``[B, S, H, d]``.

    ``params`` carries a fused kernel ``qkv.kernel [D, 3D]`` (built at load
    time from to_q/to_k/to_v for one big MXU matmul) or separate kernels.
    """
    from s2v_tpu.ops.quant import dense

    b, s, d = x.shape
    if "qkv" in params:
        qkv = dense(params["qkv"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = dense(params["to_q"], x)
        k = dense(params["to_k"], x)
        v = dense(params["to_v"], x)
    head_dim = d // num_heads
    shape = (b, s, num_heads, head_dim)
    return q.reshape(shape), k.reshape(shape), v.reshape(shape)


def joint_attention(
    params,
    x: jnp.ndarray,
    num_heads: int,
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
    qk_norm_eps: float = 1e-6,
    backend: str = "xla",
    window: Optional[Tuple[int, int, int]] = None,  # (global_len, tokens_per_frame, w)
) -> jnp.ndarray:
    """Full-sequence self attention with segment-aware RoPE.

    ``x``: ``[B, S, D]`` with S = text + ref + video tokens already
    concatenated.  ``rope_cos/sin``: ``[S, D_head/2]`` segmented tables from
    :func:`s2v_tpu.ops.rope.build_segmented_rope` (identity on the text span),
    or None to skip RoPE entirely (sincos/2b models).

    ``backend="windowed"`` (requires ``window``) is the opt-in approximate
    sliding-temporal-window path (ops/windowed_attention.py).
    """
    b, s, d = x.shape
    q, k, v = qkv_projections(params, x, num_heads)  # [B, S, H, hd]
    # multi-chip: heads on 'tp', query tokens on 'sp' (no-ops single-chip)
    q = constrain(q, "dp", "sp", "tp", None)
    k = constrain(k, "dp", "sp", "tp", None)
    v = constrain(v, "dp", "sp", "tp", None)

    # q/k LayerNorm over head_dim (reference Attention qk_norm="layer_norm",
    # eps=1e-6, elementwise affine).
    q = layer_norm(q, params["norm_q"]["weight"], params["norm_q"]["bias"], qk_norm_eps)
    k = layer_norm(k, params["norm_k"]["weight"], params["norm_k"]["bias"], qk_norm_eps)

    if rope_cos is not None:
        # tables broadcast over heads: [S, hd/2] -> [S, 1, hd/2]
        q = apply_rotary_emb(q, rope_cos[:, None, :], rope_sin[:, None, :])
        k = apply_rotary_emb(k, rope_cos[:, None, :], rope_sin[:, None, :])

    fp16_in = q.dtype == jnp.float16
    if fp16_in:
        # fp16 (the reference's non-"5b" storage dtype, src/inference.py:191):
        # no backend has a native fp16 path (no fp16 MXU mode; CPU rejects the
        # F16_F16_F32 dot precision), so upcast once before the dispatch and
        # cast back after — every backend below then sees fp32 q/k/v.
        q, k, v = (t.astype(jnp.float32) for t in (q, k, v))

    if backend == "pallas":
        out = flash_attention_trainable(q, k, v)  # [B, S, H, hd]
    elif backend == "pallas_int8":
        # int8 QK^T serving fast path (masked kernel, ~58.8 vs 62.1 ms/layer
        # on v5e at the 5b geometry); inference-only — the wrapper raises a
        # descriptive error if differentiated
        out = _int8_attention_inference_only(q, k, v)
    elif backend == "chunked":
        out = chunked_attention(q, k, v)
    elif backend in WINDOWED_BACKENDS:
        if window is None:
            raise ValueError("windowed attention needs window=(global_len, tpf, w)")
        g_len, tpf, w = window
        if backend == "windowed":
            # in-kernel band: no KV duplication; on v5e at the 5b geometry
            # 92/108 ms (w=1/2) vs 123 ms exact, and 3.4x/2.8x at 39 frames.
            # Differentiable: custom VJP with banded backward kernels.
            out = banded_attention_trainable(q, k, v, g_len, tpf, w)
        elif backend == "sp_windowed":
            # sequence-parallel banded kernel: frames sharded over the seq
            # axis, KV all-gathered, shard offsets via scalar prefetch.
            # Differentiable: custom VJP with the SP banded backward
            # (banded dq at the shard offset, offset-gated inverse-band
            # dk/dv, psum_scatter as the all-gather transpose).
            from s2v_tpu.parallel.context import active_axis, active_mesh
            from s2v_tpu.parallel.sp_attention import (
                banded_allgather_attention_trainable,
            )

            mesh = active_mesh()
            axis = active_axis("sp")
            if mesh is None or axis is None:
                raise ValueError("sp_windowed needs an active mesh with an 'sp' axis")
            out = banded_allgather_attention_trainable(
                q, k, v, mesh, axis, g_len, tpf, w, None,
                active_axis("dp"), active_axis("tp"),
            )
        else:
            # gather path: materialized per-frame KV windows (kernel-free
            # "windowed_xla" fallback; "windowed_gather" keeps the old
            # Pallas-on-windows variant for comparison)
            from s2v_tpu.ops.windowed_attention import windowed_attention

            attn_fn = (
                None if backend == "windowed_gather" else jax.nn.dot_product_attention
            )
            out = windowed_attention(q, k, v, g_len, tpf, w, attention_fn=attn_fn)
    elif backend in ("ring", "sp_allgather", "sp_int8", "sp_ulysses"):
        # sequence-parallel attention over the active mesh's seq axis:
        # ring = ppermute'd KV shards (memory-lean), sp_allgather = one
        # all-gather + the full-extent flash kernel (faster at the flagship
        # geometry — docs/SCALING.md), sp_ulysses = all-to-all head
        # scatter (r/2 x less ICI traffic than the all-gather; needs
        # heads % ring == 0), sp_int8 = the AG-KV shape with the int8-QK
        # serving kernel per shard (inference-only)
        from s2v_tpu.parallel.context import active_mesh, active_axis

        mesh = active_mesh()
        axis = active_axis("sp")
        if mesh is None or axis is None:
            raise ValueError(f"{backend} attention needs an active mesh with an 'sp' axis")
        if backend == "ring":
            # differentiable: custom VJP runs a second ring pass (fp32
            # per-hop math) — ring training is the memory-lean fallback
            from s2v_tpu.parallel.ring_attention import ring_attention_trainable

            out = ring_attention_trainable(q, k, v, mesh, axis)
        elif backend == "sp_ulysses":
            from s2v_tpu.parallel.sp_attention import ulysses_attention

            out = ulysses_attention(
                q, k, v, mesh, axis_name=axis,
                dp_axis=active_axis("dp"), tp_axis=active_axis("tp"),
            )
        else:
            from s2v_tpu.parallel.sp_attention import allgather_kv_attention

            attn_fn = None
            if backend == "sp_int8":
                interp = jax.default_backend() != "tpu"

                def attn_fn(q_, k_, v_, scale):
                    # inference-only wrapper: differentiating raises the
                    # descriptive error instead of a raw Pallas autodiff one
                    return _int8_attention_inference_only(q_, k_, v_, scale, interp)

            out = allgather_kv_attention(
                q, k, v, mesh, axis_name=axis, attn_fn=attn_fn,
                dp_axis=active_axis("dp"), tp_axis=active_axis("tp"),
            )
    else:
        out = jax.nn.dot_product_attention(q, k, v)  # [B, S, H, hd]

    if fp16_in:
        out = out.astype(jnp.float16)

    from s2v_tpu.ops.quant import dense

    out = out.reshape(b, s, d)
    out = dense(params["to_out"], out)
    return constrain(out, "dp", "sp", None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _int8_attention_inference_only(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: Optional[float] = None, interpret: bool = False,
) -> jnp.ndarray:
    from s2v_tpu.ops.pallas.int8_attention import flash_attention_qk_int8

    return flash_attention_qk_int8(q, k, v, scale=scale, interpret=interpret)


def _int8_fwd(q, k, v, scale, interpret):
    return _int8_attention_inference_only(q, k, v, scale, interpret), None


def _int8_bwd(_scale, _interpret, _res, _g):
    raise NotImplementedError(
        "the int8-QK attention backends ('pallas_int8'/'sp_int8') are "
        "inference-only (no backward kernels); train with 'pallas', "
        "'sp_allgather', 'windowed', or 'chunked'"
    )


_int8_attention_inference_only.defvjp(_int8_fwd, _int8_bwd)


@jax.custom_vjp
def flash_attention_trainable(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Differentiable flash attention: Pallas kernels both ways.

    Forward saves (q, k, v, o, lse); backward recomputes P blockwise in the
    dq / dk+dv kernels (flash_attention_bwd.py).  Measured on v5e at the
    full 5b geometry: bwd 224 ms (50 TF/s effective) vs 812 ms for the
    XLA rematerializing VJP of :func:`chunked_attention` — 3.6x.  The
    chunked backend remains the kernel-free fallback (its VJP is
    checkpointed, so it is memory-safe at full geometry too).

    Softmax mode defaults to "bounded" (no online-max recurrence; exact,
    with a transparent in-graph fallback to the online kernel on fp32
    underflow — see flash_attention's docstring); S2V_FLASH_SOFTMAX=online
    pins the classic recurrence for A/B runs."""
    from s2v_tpu.ops.pallas.flash_attention import flash_attention

    return flash_attention(q, k, v, softmax_mode=_flash_softmax_mode())


def _flash_softmax_mode() -> str:
    import os

    return os.environ.get("S2V_FLASH_SOFTMAX", "bounded")


def _fat_fwd(q, k, v):
    from s2v_tpu.ops.pallas.flash_attention import flash_attention

    o, lse = flash_attention(
        q, k, v, return_lse=True, softmax_mode=_flash_softmax_mode()
    )
    return o, (q, k, v, o, lse)


def _fat_bwd(residuals, g):
    from s2v_tpu.ops.pallas.flash_attention_bwd import flash_attention_bwd

    q, k, v, o, lse = residuals
    return flash_attention_bwd(q, k, v, o, lse, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def banded_attention_trainable(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    global_len: int,
    tokens_per_frame: int,
    window_frames: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable banded windowed attention: Pallas kernels both ways
    (forward ops/pallas/banded_attention.py, backward
    ops/pallas/banded_attention_bwd.py — banded dq, inverse-banded dk/dv).
    Enables windowed-attention LoRA training on long clips."""
    from s2v_tpu.ops.pallas.banded_attention import banded_flash_attention

    return banded_flash_attention(
        q, k, v, global_len, tokens_per_frame, window_frames, interpret=interpret
    )


def _bat_fwd(q, k, v, global_len, tokens_per_frame, window_frames, interpret=False):
    from s2v_tpu.ops.pallas.banded_attention import banded_flash_attention

    o, lse = banded_flash_attention(
        q, k, v, global_len, tokens_per_frame, window_frames,
        interpret=interpret, return_lse=True,
    )
    return o, (q, k, v, o, lse)


def _bat_bwd(global_len, tokens_per_frame, window_frames, interpret, residuals, g):
    from s2v_tpu.ops.pallas.banded_attention_bwd import banded_flash_attention_bwd

    q, k, v, o, lse = residuals
    return banded_flash_attention_bwd(
        q, k, v, o, lse, g, global_len, tokens_per_frame, window_frames,
        interpret=interpret,
    )


banded_attention_trainable.defvjp(_bat_fwd, _bat_bwd)


def chunked_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, block_q: int = 1024
) -> jnp.ndarray:
    """Memory-bounded attention without Pallas: ``lax.map`` over query
    blocks keeps logits at O(block_q * S) instead of O(S^2).

    Fallback for hosts where Mosaic kernels are unavailable; numerically
    identical to full softmax attention (fp32 logits/softmax).
    """
    b, s, h, hd = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    pad = (-s) % block_q
    q_pad = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    n_blocks = q_pad.shape[1] // block_q
    q_blocks = q_pad.reshape(b, n_blocks, block_q, h, hd).transpose(1, 0, 2, 3, 4)

    # checkpoint: under jax.grad the VJP would otherwise *stack* each
    # block's fp32 probabilities across the lax.map — the full O(S^2)
    # matrix (71 GB at 5b geometry).  Remat re-derives them blockwise in
    # the backward sweep, keeping training memory at O(block_q * S).
    @jax.checkpoint
    def one_block(q_blk):  # [B, bq, H, hd]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q_blk.astype(jnp.float32), k.astype(jnp.float32))
        w = jax.nn.softmax(logits * scale, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)

    out = jax.lax.map(one_block, q_blocks)  # [n, B, bq, H, hd]
    out = out.transpose(1, 0, 2, 3, 4).reshape(b, n_blocks * block_q, h, hd)
    return out[:, :s]


flash_attention_trainable.defvjp(_fat_fwd, _fat_bwd)


def init_attention_params(key, dim: int, num_heads: int, dtype=jnp.float32, fused: bool = True):
    head_dim = dim // num_heads
    ks = jax.random.split(key, 4)
    scale = 1.0 / jnp.sqrt(dim)

    def lin(k, shape):
        return jax.random.uniform(k, shape, dtype, -scale, scale)

    params = {
        "norm_q": {"weight": jnp.ones((head_dim,), dtype), "bias": jnp.zeros((head_dim,), dtype)},
        "norm_k": {"weight": jnp.ones((head_dim,), dtype), "bias": jnp.zeros((head_dim,), dtype)},
        "to_out": {"kernel": lin(ks[3], (dim, dim)), "bias": jnp.zeros((dim,), dtype)},
    }
    if fused:
        params["qkv"] = {"kernel": lin(ks[0], (dim, 3 * dim)), "bias": jnp.zeros((3 * dim,), dtype)}
    else:
        params["to_q"] = {"kernel": lin(ks[0], (dim, dim)), "bias": jnp.zeros((dim,), dtype)}
        params["to_k"] = {"kernel": lin(ks[1], (dim, dim)), "bias": jnp.zeros((dim,), dtype)}
        params["to_v"] = {"kernel": lin(ks[2], (dim, dim)), "bias": jnp.zeros((dim,), dtype)}
    return params
