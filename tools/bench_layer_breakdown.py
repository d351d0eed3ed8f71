"""Split the per-layer forward time into attention / linears / elementwise.

Answers the round-3-plan question "is there anything left on the table in
the non-attention share of the 98 ms/layer?" with on-chip numbers:

  per-layer total   = slope between the 1-layer and 42-layer full forward
  attention         = scan-chained flash kernel (62 ms/layer known)
  linears           = scan-chained qkv+out+ff matmul chain at layer shapes
  elementwise (inferred) = total - attention - linears

All timings use the relay-robust scan-chain slope method
(tools/bench_sp_scan.py): iterations serialize inside ONE XLA program by
feeding each output back as the next input, so the per-call relay fetch
cost cancels in the slope between two chain lengths.  Chain-length deltas
must be >= ~700 iterations (~40 s of compute): shorter deltas read
physically impossible numbers on a degraded relay (observed: 49 ms
"attention" = 183 TF/s at d=64, above the 98 TF/s ceiling, from a
125-iteration delta).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, S, D = 1, 19126, 3072  # flagship B=1 forward (CFG step = B=2 batch)
H, HD = 48, 64
FF = 4 * D

# FLOPs per linears iteration (qkv + out + ff1 + ff2)
FLOPS_LIN = 2 * B * S * D * (3 * D + D + FF + FF)


def _sync(x):
    float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def slope_time(fn, args, n1, n2, reps=2):
    f1 = jax.jit(functools.partial(fn, n=n1))
    f2 = jax.jit(functools.partial(fn, n=n2))
    _sync(f1(*args))
    _sync(f2(*args))

    def run(f):
        t0 = time.perf_counter()
        _sync(f(*args))
        return time.perf_counter() - t0

    t1 = min(run(f1) for _ in range(reps))
    t2 = min(run(f2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1), t1, t2


def main():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (B * S, D), jnp.float32).astype(dt)
    w_qkv = jax.random.normal(ks[1], (D, 3 * D), jnp.float32).astype(dt) * 0.02
    w_out = jax.random.normal(ks[2], (D, D), jnp.float32).astype(dt) * 0.02
    w_ff1 = jax.random.normal(ks[3], (D, FF), jnp.float32).astype(dt) * 0.02
    w_ff2 = jax.random.normal(ks[4], (FF, D), jnp.float32).astype(dt) * 0.02

    def linears_chain(x0, n):
        def body(h, _):
            qkv = h @ w_qkv                       # [S, 3D]
            # keep all three qkv slices live — `qkv[:, :D]` alone lets XLA
            # dead-code-eliminate 2/3 of w_qkv (observed: impossible TF/s)
            mix = qkv[:, :D] + qkv[:, D:2 * D] + qkv[:, 2 * D:]
            o = mix @ w_out                       # attention-out stand-in
            f = jax.nn.gelu(o @ w_ff1, approximate=True) @ w_ff2
            return (h + f).astype(h.dtype), None  # feedback: serializes

        out, _ = jax.lax.scan(body, x0, None, length=n)
        return out

    t_lin, a, b = slope_time(linears_chain, (x,), 50, 750)
    print(f"linears/layer:   {t_lin * 1e3:7.2f} ms  "
          f"({FLOPS_LIN / t_lin / 1e12:.1f} TF/s, "
          f"{FLOPS_LIN / t_lin / 1e12 / 197 * 100:.0f}% of bf16 peak)  "
          f"[chains {a:.1f}/{b:.1f} s]")

    # attention at the same B (the known 62 ms figure, re-measured)
    from s2v_tpu.ops.pallas.flash_attention import flash_attention

    q = jax.random.normal(ks[5], (B, S, H, HD), jnp.float32).astype(dt)
    k = jax.random.normal(ks[6], (B, S, H, HD), jnp.float32).astype(dt)
    v = jax.random.normal(ks[7], (B, S, H, HD), jnp.float32).astype(dt)

    def attn_chain(q0, k0, v0, n):
        def body(vv, _):
            return flash_attention(q0, k0, vv).astype(vv.dtype), None

        out, _ = jax.lax.scan(body, v0, None, length=n)
        return out

    t_att, a, b = slope_time(attn_chain, (q, k, v), 50, 750)
    print(f"attention/layer: {t_att * 1e3:7.2f} ms  [chains {a:.1f}/{b:.1f} s]")

    # full model slope: 1-layer vs 42-layer forward, same construction as
    # bench.py (seconds-scale fused programs reproduce to 3 digits on this
    # relay, so plain min-of-3 timing is fine here)
    from s2v_tpu.config import TransformerConfig
    from s2v_tpu.models.transformer import (
        init_transformer_params_stacked,
        transformer_forward,
    )
    from s2v_tpu.ops.rope import build_segmented_rope, prepare_video_and_ref_rope

    def full_forward_time(n_layers):
        cfg = TransformerConfig.cogvideox_5b(num_layers=n_layers)
        params = init_transformer_params_stacked(key, cfg)
        jax.block_until_ready(params)
        F, Hpx, Wpx = 13, 60, 90
        video = jax.random.normal(key, (B, F, Hpx, Wpx, cfg.in_channels), cfg.dtype)
        ref = jax.random.normal(key, (B, 1, Hpx, Wpx, cfg.in_channels), cfg.dtype)
        text = jax.random.normal(
            key, (B, cfg.max_text_seq_length, cfg.text_embed_dim), cfg.dtype
        )
        ts = jnp.full((B,), 999, jnp.int32)
        vc, vs, rc, rs = prepare_video_and_ref_rope(480, 720, F, cfg.attention_head_dim)
        cos, sin = build_segmented_rope(cfg.max_text_seq_length, rc, rs, vc, vs)
        f = jax.jit(
            lambda p, v, r, te, t_, c_, s_: transformer_forward(
                p, cfg, v, r, te, t_, c_, s_, attention_backend="pallas"
            ).astype(jnp.float32).sum()
        )
        _sync(f(params, video, ref, text, ts, cos, sin))  # compile
        best = min(
            (lambda t0: (_sync(f(params, video, ref, text, ts, cos, sin)),
                         time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(3)
        )
        return best

    t1 = full_forward_time(1)
    t42 = full_forward_time(42)
    per_layer = (t42 - t1) / 41
    print(f"full fwd:        1-layer {t1 * 1e3:.0f} ms, 42-layer {t42 * 1e3:.0f} ms "
          f"-> {per_layer * 1e3:.2f} ms/layer")
    resid = per_layer - t_att - t_lin
    print(f"elementwise residue (total - attention - linears): {resid * 1e3:.2f} ms/layer "
          f"({resid / per_layer * 100:.0f}% of the layer)")


if __name__ == "__main__":
    main()
