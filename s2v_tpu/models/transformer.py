"""CogVideoX 3-stream DiT transformer, TPU-native.

Re-implements the *behaviour* of the reference's modified
``CogVideoXTransformer3DModel`` (cogvideox_transformer_3d.py:196-560) —
text, reference-image and video token streams threaded through every block —
with a TPU-first structure:

  * pure function over a param pytree; no module objects on the hot path;
  * all ``num_layers`` blocks **stacked on a leading axis** and executed with
    ``lax.scan`` — one block is traced/compiled once instead of 42 times;
  * patch embedding as space-to-depth + matmul (``s2v_tpu.ops.patchify``);
  * fused QKV projection; fp32 norms/RoPE/modulation, bf16 matmuls;
  * segment-aware RoPE applied as one elementwise op over the whole
    ``[text | ref | video]`` sequence (identity rotation on text).

Sequence layout inside a block matches the reference exactly:
``[text (226) | ref (1350) | video (17550)]`` for the 49-frame 480x720
config (all derived from shapes, never hard-coded).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from s2v_tpu.config import TransformerConfig
from s2v_tpu.ops.adaln import ada_layer_norm_out, ada_layer_norm_zero_3stream
from s2v_tpu.ops.attention import init_attention_params, joint_attention
from s2v_tpu.ops.norms import layer_norm
from s2v_tpu.ops.patchify import patchify_video, unpatchify_video
from s2v_tpu.parallel.context import constrain
from s2v_tpu.ops.timestep import (
    get_timestep_embedding,
    init_timestep_mlp,
    timestep_embedding_mlp,
)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _linear_init(key, in_dim, out_dim, dtype):
    scale = 1.0 / jnp.sqrt(in_dim)
    kkey, _ = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(kkey, (in_dim, out_dim), dtype, -scale, scale),
        "bias": jnp.zeros((out_dim,), dtype),
    }


def _norm_affine(dim, dtype):
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_block_params(key, cfg: TransformerConfig):
    d = cfg.inner_dim
    ks = jax.random.split(key, 6)
    return {
        "norm1": {
            "linear": _linear_init(ks[0], cfg.time_embed_dim, 6 * d, cfg.param_dtype),
            "norm": _norm_affine(d, cfg.param_dtype),
        },
        "attn": init_attention_params(ks[1], d, cfg.num_attention_heads, cfg.param_dtype),
        "norm2": {
            "linear": _linear_init(ks[2], cfg.time_embed_dim, 6 * d, cfg.param_dtype),
            "norm": _norm_affine(d, cfg.param_dtype),
        },
        "ff": {
            "net_0": _linear_init(ks[3], d, cfg.ff_inner_dim, cfg.param_dtype),
            "net_2": _linear_init(ks[4], cfg.ff_inner_dim, d, cfg.param_dtype),
        },
    }


def init_transformer_params(key, cfg: TransformerConfig):
    d = cfg.inner_dim
    p = cfg.patch_size
    ks = jax.random.split(key, 8)
    blocks = [init_block_params(k, cfg) for k in jax.random.split(ks[0], cfg.num_layers)]
    # stack per-layer params on a leading axis for lax.scan
    blocks = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)
    return {
        "patch_embed": {
            "proj": _linear_init(ks[1], p * p * cfg.in_channels, d, cfg.param_dtype),
            "text_proj": _linear_init(ks[2], cfg.text_embed_dim, d, cfg.param_dtype),
        },
        "time_embedding": init_timestep_mlp(ks[3], d, cfg.time_embed_dim, cfg.param_dtype),
        "blocks": blocks,
        "norm_final": _norm_affine(d, cfg.param_dtype),
        "norm_out": {
            "linear": _linear_init(ks[4], cfg.time_embed_dim, 2 * d, cfg.param_dtype),
            "norm": _norm_affine(d, cfg.param_dtype),
        },
        "proj_out": _linear_init(ks[5], d, p * p * cfg.out_channels, cfg.param_dtype),
    }


def init_transformer_params_stacked(
    key, cfg: TransformerConfig, scale: float = 0.02, quantized: bool = False
):
    """Memory-lean init for big configs: per-layer params are created
    directly in stacked ``[L, ...]`` form (one allocation each) instead of
    stacking L separate trees — halves peak memory, which matters when
    initialising the 5B model on a single chip for benchmarking.

    ``quantized=True`` emits the qkv/to_out/ff kernels directly in the int8
    format of ``s2v_tpu.ops.quant`` (random weights for benchmarking — real
    checkpoints are quantized host-side at load)."""
    d = cfg.inner_dim
    L = cfg.num_layers
    td = cfg.time_embed_dim
    p = cfg.patch_size
    dt = cfg.param_dtype
    keys = iter(jax.random.split(key, 40))

    def w(shape):
        # generate directly in the target dtype: an fp32 intermediate for the
        # biggest kernel would transiently cost 6+ GB on a 16 GB chip
        return jax.random.normal(next(keys), shape, dt) * jnp.asarray(scale, dt)

    def wq(shape):
        if not quantized:
            return {"kernel": w(shape), "bias": jnp.zeros(shape[:-2] + (shape[-1],), dt)}
        q = jax.random.randint(next(keys), shape, -127, 128, jnp.int8)
        s = jnp.full(shape[:-2] + (1, shape[-1]), scale / 127.0, jnp.float32)
        return {"q": q, "scale": s, "bias": jnp.zeros(shape[:-2] + (shape[-1],), dt)}

    def z(shape):
        return jnp.zeros(shape, dt)

    def ones(shape):
        return jnp.ones(shape, dt)

    blocks = {
        "norm1": {
            "linear": {"kernel": w((L, td, 6 * d)), "bias": z((L, 6 * d))},
            "norm": {"weight": ones((L, d)), "bias": z((L, d))},
        },
        "attn": {
            "qkv": wq((L, d, 3 * d)),
            "norm_q": {"weight": ones((L, cfg.attention_head_dim)), "bias": z((L, cfg.attention_head_dim))},
            "norm_k": {"weight": ones((L, cfg.attention_head_dim)), "bias": z((L, cfg.attention_head_dim))},
            "to_out": wq((L, d, d)),
        },
        "norm2": {
            "linear": {"kernel": w((L, td, 6 * d)), "bias": z((L, 6 * d))},
            "norm": {"weight": ones((L, d)), "bias": z((L, d))},
        },
        "ff": {
            "net_0": wq((L, d, cfg.ff_inner_dim)),
            "net_2": wq((L, cfg.ff_inner_dim, d)),
        },
    }
    return {
        "patch_embed": {
            "proj": {"kernel": w((p * p * cfg.in_channels, d)), "bias": z((d,))},
            "text_proj": {"kernel": w((cfg.text_embed_dim, d)), "bias": z((d,))},
        },
        "time_embedding": {
            "linear_1": {"kernel": w((d, td)), "bias": z((td,))},
            "linear_2": {"kernel": w((td, td)), "bias": z((td,))},
        },
        "blocks": blocks,
        "norm_final": {"weight": ones((d,)), "bias": z((d,))},
        "norm_out": {"linear": {"kernel": w((td, 2 * d)), "bias": z((2 * d,))}, "norm": {"weight": ones((d,)), "bias": z((d,))}},
        "proj_out": {"kernel": w((d, p * p * cfg.out_channels)), "bias": z((p * p * cfg.out_channels,))},
    }


# ---------------------------------------------------------------------------
# runtime LoRA (unmerged adapters applied inside the forward)
# ---------------------------------------------------------------------------

# params-pytree key under which S2VPipeline attaches a runtime factor tree
# (loaders/lora.py::runtime_lora_tree).  Riding inside the params pytree
# means every jitted loop (fused/segmented/adaptive, all variants) picks the
# adapter up as a traced argument — swapping subjects re-uses the compiled
# executable, and removing the key restores the base model instantly.
RUNTIME_LORA_KEY = "runtime_lora"

# runtime target name -> (block-params path, fused-qkv column slot).
# slot i means the delta lands in columns [i*d, (i+1)*d) of the fused
# [D, 3D] qkv kernel (q|k|v order, loaders/hf.py); None = full width.
_RT_BLOCK_TARGETS = {
    "to_q": (("attn", "qkv"), 0),
    "to_k": (("attn", "qkv"), 1),
    "to_v": (("attn", "qkv"), 2),
    "qkv": (("attn", "qkv"), None),  # trainer-form fused pair
    "to_out": (("attn", "to_out"), None),
    "norm1.linear": (("norm1", "linear"), None),
    "norm2.linear": (("norm2", "linear"), None),
    "ff.net.2": (("ff", "net_2"), None),
}

_RT_TOP_TARGETS = {
    "patch_proj": ("patch_embed", "proj"),
    "text_proj": ("patch_embed", "text_proj"),
}


def _lora_delta(ab) -> jnp.ndarray:
    """fp32 low-rank delta (the alpha/r scale is pre-folded into ``a``)."""
    return jnp.einsum(
        "...ir,...ro->...io", ab["a"], ab["b"], preferred_element_type=jnp.float32
    )


def _add_delta(leaf: dict, delta: jnp.ndarray) -> dict:
    kernel = leaf["kernel"]
    if delta.shape != kernel.shape:
        raise ValueError(
            f"runtime LoRA delta {delta.shape} does not match kernel {kernel.shape}"
        )
    new = (kernel.astype(jnp.float32) + delta).astype(kernel.dtype)
    return {**leaf, "kernel": new}


def _attach_factors(leaf: dict, pairs) -> dict:
    """Attach the factor pairs for ops.quant.dense to apply
    output-additively (``y += (x @ a) @ b``).  int8 leaves can't absorb a
    merge (W + AB isn't int8) — the QLoRA forward; bf16 dense leaves take
    the same path because a per-layer kernel merge forces XLA to relayout
    the whole stacked kernel (2.21 GB HLO temp at 5b — see ops.quant.dense).
    Slotted q/k/v factors pad ``b`` to the fused kernel's full output width
    (zero columns elsewhere), mirroring the merged path's full-width delta
    so TP shardings pass through unchanged."""
    out_width = (leaf["q"] if "q" in leaf else leaf["kernel"]).shape[-1]
    attached = []
    for ab, slot in pairs:
        a, b = ab["a"], ab["b"]
        if slot is not None:
            d = b.shape[-1]
            b_full = jnp.zeros(b.shape[:-1] + (out_width,), b.dtype)
            b_full = jax.lax.dynamic_update_slice_in_dim(
                b_full, b, slot * d, axis=b.ndim - 1
            )
            b = b_full
        attached.append((a, b))
    return {**leaf, "lora": tuple(attached)}


def apply_runtime_lora_block(p: dict, lora: dict) -> dict:
    """One block's params with its runtime deltas applied (copy-on-write;
    transients are per-layer, so the scan never materializes a second
    weight tree).

    The dense-routed targets (fused qkv, to_out, ff.net_2) get their
    factor pairs ATTACHED for output-additive application in
    ops.quant.dense — both int8 (a merge isn't int8) and bf16 (a per-layer
    kernel merge forces a 2.21 GB stacked-kernel relayout at 5b, see
    :func:`_attach_factors`).  The adaLN modulation linears (norm1/norm2,
    [512, 6D] — small, not dense-routed) keep the in-place merge
    (``W + a @ b``); their slotless full-width delta keeps GSPMD shardings
    untouched."""
    out = {k: dict(v) if isinstance(v, dict) else v for k, v in p.items()}
    grouped: dict = {}
    for name, ab in lora.items():
        path, slot = _RT_BLOCK_TARGETS[name]
        grouped.setdefault(path, []).append((ab, slot))
    for path, items in grouped.items():
        node = out
        for key in path[:-1]:
            node[key] = dict(node[key])
            node = node[key]
        leaf = node[path[-1]]
        if "q" in leaf or path[0] in ("attn", "ff"):
            node[path[-1]] = _attach_factors(leaf, items)
            continue
        for ab, _slot in items:  # norm linears: slotless by construction
            leaf = _add_delta(leaf, _lora_delta(ab))
        node[path[-1]] = leaf
    return out


def apply_runtime_lora_top(params: dict, top: dict) -> dict:
    """Non-block targets (patch/text projections) with deltas applied."""
    out = dict(params)
    for name, ab in top.items():
        group, leaf_name = _RT_TOP_TARGETS[name]
        group_tree = dict(out[group])
        group_tree[leaf_name] = _add_delta(group_tree[leaf_name], _lora_delta(ab))
        out[group] = group_tree
    return out


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _feed_forward(p, x: jnp.ndarray) -> jnp.ndarray:
    """gelu(tanh-approx) MLP (reference FeedForward, attention.py:1185-1243)."""
    from s2v_tpu.ops.quant import dense

    h = dense(p["net_0"], x)
    h = constrain(h, "dp", "sp", "tp")
    h = jax.nn.gelu(h, approximate=True)
    out = dense(p["net_2"], h)
    return constrain(out, "dp", "sp", None)


def block_forward(
    p,
    video: jnp.ndarray,
    text: jnp.ndarray,
    ref: jnp.ndarray,
    temb: jnp.ndarray,
    rope_cos: Optional[jnp.ndarray],
    rope_sin: Optional[jnp.ndarray],
    cfg: TransformerConfig,
    attention_backend: str = "xla",
    tokens_per_frame: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One CogVideoXBlock (reference cogvideox_transformer_3d.py:122-186).

    ``ref`` may be zero-width ``[B, 0, D]`` — the no-ref T2V mode (stock
    CogVideoX semantics, reference pipeline_cogvideox.py:140-746): every
    ref-stream op degenerates to a no-op and the attended sequence is
    ``[text | video]``.
    """
    t_len = text.shape[1]
    r_len = ref.shape[1]

    # Disentangled semantics (SURVEY.md §0 — the intended-but-inert
    # enable_lora trick): video/text modulated by the pre-merge base
    # weights, ref by the LoRA-merged ones.  The loader stashes
    # ``base_linear`` only when cfg.disentangled_modulation is set.
    disent = cfg.disentangled_modulation
    v_n, t_n, r_n, g_v, g_t, g_r = ada_layer_norm_zero_3stream(
        p["norm1"], video, text, ref, temb, cfg.norm_eps,
        base_linear=p["norm1"].get("base_linear") if disent else None,
    )
    x = jnp.concatenate([t_n, r_n, v_n], axis=1)
    window = None
    from s2v_tpu.ops.attention import WINDOWED_BACKENDS

    if attention_backend in WINDOWED_BACKENDS:
        # opt-in sliding-temporal-window path: text+ref are the global
        # segment.  tokens/frame comes from the ref stream when present
        # (the ref is one latent frame with the video's spatial dims); the
        # no-ref T2V mode receives it explicitly (transformer_forward
        # derives it from the video geometry).
        tpf = r_len if r_len > 0 else tokens_per_frame
        if tpf <= 0:
            raise ValueError(
                "windowed attention needs tokens-per-frame; call through "
                "transformer_forward so it is derived from the video shape"
            )
        window = (t_len + r_len, tpf, cfg.attention_window_frames)
    attn = joint_attention(
        p["attn"],
        x,
        cfg.num_attention_heads,
        rope_cos,
        rope_sin,
        cfg.qk_norm_eps,
        backend=attention_backend,
        window=window,
    )
    a_t = attn[:, :t_len]
    a_r = attn[:, t_len : t_len + r_len]
    a_v = attn[:, t_len + r_len :]
    video = video + g_v * a_v
    text = text + g_t * a_t
    ref = ref + g_r * a_r

    v_n, t_n, r_n, g_v, g_t, g_r = ada_layer_norm_zero_3stream(
        p["norm2"], video, text, ref, temb, cfg.norm_eps,
        base_linear=p["norm2"].get("base_linear") if disent else None,
    )
    y = jnp.concatenate([t_n, r_n, v_n], axis=1)
    ff = _feed_forward(p["ff"], y)
    video = video + g_v * ff[:, t_len + r_len :]
    text = text + g_t * ff[:, :t_len]
    ref = ref + g_r * ff[:, t_len : t_len + r_len]
    return video, text, ref


def transformer_forward(
    params,
    cfg: TransformerConfig,
    video_latents: jnp.ndarray,  # [B, F, H, W, C] channels-last
    ref_latents: Optional[jnp.ndarray],  # [B, Fr, Hr, Wr, C]; None = T2V (no ref stream)
    text_embeds: jnp.ndarray,  # [B, T, text_embed_dim]
    timestep: jnp.ndarray,  # [B]
    rope_cos: Optional[jnp.ndarray] = None,  # [S_total, head_dim/2] segmented
    rope_sin: Optional[jnp.ndarray] = None,
    pos_embedding: Optional[jnp.ndarray] = None,  # [S_text+S_video, D] sincos (2b)
    attention_backend: str = "xla",
    remat: bool = False,
) -> jnp.ndarray:
    """Predict the denoising target; returns ``[B, F, H, W, out_channels]``.

    Mirrors reference ``CogVideoXTransformer3DModel.forward``
    (cogvideox_transformer_3d.py:450-560).  CFG batching (uncond/cond and the
    duplicated ref tokens of the ``eval=True`` path, :503-504) is done by the
    pipeline — here every batch row already carries its ref stream.

    ``ref_latents=None`` selects the no-ref T2V mode (stock CogVideoX
    semantics): the ref stream is zero-width, the attended sequence is
    ``[text | video]``, and stock checkpoints run unmodified (the
    reference's own T2V pipeline is broken against its modified
    transformer — pipeline_cogvideox.py:685-686 FIXME; this one is not).
    """
    b, f, h, w, _ = video_latents.shape
    p = cfg.patch_size

    # runtime (unmerged) LoRA: a factor tree attached under RUNTIME_LORA_KEY
    # is applied as per-layer ``W + a @ b`` updates inside the block scan —
    # the TPU shape of the reference's PEFT runtime adapters
    # (src/inference.py:218-229).  Extra cost is one [in,r]x[r,out] matmul
    # pair per target per layer (~1 TFLOP over 42 layers, <0.5% of a step);
    # delta transients stay per-layer.
    runtime_lora = params.get(RUNTIME_LORA_KEY)
    if runtime_lora is not None and "top" in runtime_lora:
        params = apply_runtime_lora_top(params, runtime_lora["top"])
    lora_blocks = (runtime_lora or {}).get("blocks")

    # 1. time conditioning: fp32 sinusoid -> compute-dtype MLP -> [B, Td]
    t_emb = get_timestep_embedding(
        timestep, cfg.inner_dim, cfg.flip_sin_to_cos, float(cfg.freq_shift)
    )
    temb = timestep_embedding_mlp(params["time_embedding"], t_emb.astype(cfg.dtype))

    # 2. patch/text embedding
    pe = params["patch_embed"]
    text = text_embeds.astype(cfg.dtype) @ pe["text_proj"]["kernel"] + pe["text_proj"]["bias"]
    video = patchify_video(video_latents.astype(cfg.dtype), pe["proj"]["kernel"], pe["proj"]["bias"], p)
    video = constrain(video, "dp", "sp", None)
    if ref_latents is None:
        ref = video[:, :0]  # zero-width stream: T2V mode
    else:
        ref = patchify_video(ref_latents.astype(cfg.dtype), pe["proj"]["kernel"], pe["proj"]["bias"], p)

    if pos_embedding is not None and not cfg.use_rotary_positional_embeddings:
        # 2b/sincos path: learned-less 3D sincos added over [text | video]
        # (reference embeddings.py:426-446); the ref stream gets none.
        t_len = text.shape[1]
        joint = jnp.concatenate([text, video], axis=1)
        joint = joint + pos_embedding.astype(joint.dtype)[None]
        text, video = joint[:, :t_len], joint[:, t_len:]

    # 3. transformer blocks via scan over the stacked layer axis.
    # remat=True (training): only the per-layer stream carries are saved;
    # block internals (attention q/k/v/o, FF activations) are recomputed in
    # the backward sweep — O(1-layer) instead of O(42-layer) activations.
    def scan_body(carry, xs):
        layer_params = xs[0] if lora_blocks is not None else xs
        if lora_blocks is not None:
            layer_params = apply_runtime_lora_block(layer_params, xs[1])
        v, t, r = carry
        v, t, r = block_forward(
            layer_params, v, t, r, temb, rope_cos, rope_sin, cfg,
            attention_backend, tokens_per_frame=(h // p) * (w // p),
        )
        return (v, t, r), None

    xs = (
        (params["blocks"], lora_blocks) if lora_blocks is not None else params["blocks"]
    )
    if isinstance(remat, str) and remat.startswith("seg"):
        # segmented (nested) remat — the sqrt(L) memory/compute point:
        # per-layer remat still saves every scan carry (42 x ~118 MB of
        # stream state at flagship B=1 ~ 4.9 GB, which on top of the
        # 11.1 GB base tree overflows a 16 GB chip); scanning S segments
        # of L/S layers with BOTH levels checkpointed saves only the S
        # outer boundaries, plus L/S inner carries transiently while one
        # segment's backward runs — (S + L/S) carries instead of L, for
        # one extra forward recompute.  Identical math/order => identical
        # grads (tested against "full").
        #
        # "seg" picks S minimizing S + L/S; "seg<N>" pins S = N (N must
        # divide L) — more segments shrink the [L/S, in, out] weight-slice
        # temps the nested backward materializes per target, at the cost
        # of more saved stream boundaries.
        L = cfg.num_layers
        if remat != "seg":
            S = int(remat[3:])
            if L % S:
                raise ValueError(f"remat={remat!r}: {S} does not divide {L} layers")
        else:
            S = min(
                (d for d in range(1, L + 1) if L % d == 0),
                key=lambda d: d + L // d,
            )
        inner = jax.checkpoint(scan_body)

        def seg_body(carry, xs_seg):
            return jax.lax.scan(inner, carry, xs_seg)

        seg_body = jax.checkpoint(seg_body)
        xs_r = jax.tree.map(lambda a: a.reshape((S, L // S) + a.shape[1:]), xs)
        (video, text, ref), _ = jax.lax.scan(seg_body, (video, text, ref), xs_r)
    else:
        if remat:
            if remat == "dots":
                # save matmul outputs, recompute elementwise in the backward
                # sweep: faster bwd than full remat at ~2x the activation
                # memory (still O(1 layer) of saved dots)
                scan_body = jax.checkpoint(
                    scan_body,
                    policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                )
            else:
                scan_body = jax.checkpoint(scan_body)
        (video, text, ref), _ = jax.lax.scan(scan_body, (video, text, ref), xs)

    # 4. final norm over [text | video] (ref stream is discarded past here,
    #    reference :535-539)
    joint = jnp.concatenate([text, video], axis=1)
    joint = layer_norm(joint, params["norm_final"]["weight"], params["norm_final"]["bias"], cfg.norm_eps)
    video = joint[:, text.shape[1] :]

    # 5. output head
    video = ada_layer_norm_out(params["norm_out"], video, temb, cfg.norm_eps)
    video = video @ params["proj_out"]["kernel"] + params["proj_out"]["bias"]

    return unpatchify_video(video, f, h, w, p, cfg.out_channels)
