"""In-context ablation of one transformer block's per-layer time.

bench_layer_breakdown.py times attention / linears in ISOLATION and infers
"elementwise" as the residue (~15 ms/layer at B=1) — but isolated chains
fuse differently than the real block, so the residue says nothing about
WHICH pass to attack.  This tool scan-chains the REAL ``block_forward`` at
flagship geometry and re-times it with individual pieces monkeypatched to
identities, so each delta is that piece's cost *in context* (including the
fusions XLA loses or gains around it):

  full            the real block (batched-CFG B=2 by default)
  -kernel         flash kernel replaced by a passthrough (keeps qkv/norm/
                  rope/out-proj): full - this = attention incl. relayout
  -qknorm_rope    additionally qk-LayerNorm + RoPE as identities
  -adaln          additionally both AdaLN-Zero calls as passthroughs
                  (streams returned unmodulated, gates = 1)

Timing: scan-chain slope between two chain lengths (the per-call axon
relay fetch cancels in the slope; each single execution stays under the
~60 s relay kill window).  Runs on the real chip; S2V_ABLATE_SMOKE=1 runs
a tiny CPU smoke.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = bool(os.environ.get("S2V_ABLATE_SMOKE"))
B = int(os.environ.get("S2V_ABLATE_B", "2"))


def main():
    if not SMOKE:
        from s2v_tpu.cli_utils import probe_backend

        r = probe_backend(int(os.environ.get("S2V_BENCH_INIT_TIMEOUT", "120")))
        if "devices" not in r:
            print(f"# FATAL: backend init failed/timed out: {r}", flush=True)
            os._exit(2)

    import jax
    import jax.numpy as jnp
    import numpy as np

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import s2v_tpu.models.transformer as tr
    import s2v_tpu.ops.attention as att
    from s2v_tpu.config import TransformerConfig
    from s2v_tpu.models.transformer import init_transformer_params_stacked
    from s2v_tpu.ops.rope import build_segmented_rope, prepare_video_and_ref_rope

    if SMOKE:
        cfg = TransformerConfig.tiny()
        F, Hpx, Wpx = 2, 8, 8
        backend = "xla"
        n1, n2, reps = 2, 6, 1
    else:
        cfg = TransformerConfig.cogvideox_5b(num_layers=1)
        F, Hpx, Wpx = 13, 60, 90
        backend = "pallas"
        n1, n2, reps = 30, 250, 2

    key = jax.random.PRNGKey(0)
    stacked = init_transformer_params_stacked(key, cfg)
    p1 = jax.tree.map(lambda x: x[0], stacked["blocks"])  # single block's params
    del stacked

    ph, pw = Hpx // cfg.patch_size, Wpx // cfg.patch_size
    d = cfg.num_attention_heads * cfg.attention_head_dim
    t_len = cfg.max_text_seq_length
    r_len = ph * pw
    v_len = F * ph * pw
    if SMOKE:
        cos, sin = None, None
    else:
        vc, vs, rc, rs = prepare_video_and_ref_rope(480, 720, F, cfg.attention_head_dim)
        cos, sin = build_segmented_rope(t_len, rc, rs, vc, vs)

    dt = cfg.dtype
    video = jax.random.normal(key, (B, v_len, d), jnp.float32).astype(dt)
    text = jax.random.normal(key, (B, t_len, d), jnp.float32).astype(dt)
    ref = jax.random.normal(key, (B, r_len, d), jnp.float32).astype(dt)
    temb = jax.random.normal(key, (B, cfg.time_embed_dim), jnp.float32).astype(dt)

    def _sync(x):
        float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])

    def chain(n):
        # params/temb/rope ride as TRACED args: closure capture would lower
        # the ~260 MB block tree as executable constants, which the axon
        # relay's remote-compile endpoint rejects (HTTP 413) — the same
        # gotcha as the round-3 LoRA train step
        def run(p, te, c, s, v0, t0, r0):
            def body(carry, _):
                v, t, r = carry
                v, t, r = tr.block_forward(
                    p, v, t, r, te, c, s, cfg, attention_backend=backend
                )
                return (v.astype(dt), t.astype(dt), r.astype(dt)), None

            (v, t, r), _ = jax.lax.scan(body, (v0, t0, r0), None, length=n)
            return v

        return jax.jit(run)

    def slope():
        f1, f2 = chain(n1), chain(n2)
        _sync(f1(p1, temb, cos, sin, video, text, ref))
        _sync(f2(p1, temb, cos, sin, video, text, ref))

        def run(f):
            t0 = time.perf_counter()
            _sync(f(p1, temb, cos, sin, video, text, ref))
            return time.perf_counter() - t0

        t1 = min(run(f1) for _ in range(reps))
        t2 = min(run(f2) for _ in range(reps))
        return (t2 - t1) / (n2 - n1)

    results = {}

    # --- full block ------------------------------------------------------
    results["full"] = slope()
    print(f"full block:        {results['full'] * 1e3:7.2f} ms/layer", flush=True)

    # --- kernel -> passthrough (removes kernel + relayout/augment) -------
    orig_flash = att.flash_attention_trainable
    att.flash_attention_trainable = lambda q, k, v: v
    results["no_kernel"] = slope()
    print(f"-kernel:           {results['no_kernel'] * 1e3:7.2f} ms/layer "
          f"(attention incl. relayout = "
          f"{(results['full'] - results['no_kernel']) * 1e3:.2f})", flush=True)

    # --- + qk-norm / rope -> identity ------------------------------------
    orig_ln = att.layer_norm
    orig_rope = att.apply_rotary_emb
    att.layer_norm = lambda x, w, b, eps=1e-5: x
    att.apply_rotary_emb = lambda x, c, s: x
    results["no_qknorm_rope"] = slope()
    print(f"-qknorm/rope:      {results['no_qknorm_rope'] * 1e3:7.2f} ms/layer "
          f"(qk-norm+rope = "
          f"{(results['no_kernel'] - results['no_qknorm_rope']) * 1e3:.2f})", flush=True)

    # --- + adaln -> passthrough ------------------------------------------
    orig_adaln = tr.ada_layer_norm_zero_3stream

    def _adaln_pass(params, v, t, r, temb_, eps, base_linear=None):
        one = jnp.ones((v.shape[0], 1, 1), v.dtype)
        return v, t, r, one, one, one

    tr.ada_layer_norm_zero_3stream = _adaln_pass
    results["no_adaln"] = slope()
    print(f"-adaln:            {results['no_adaln'] * 1e3:7.2f} ms/layer "
          f"(2x adaln = "
          f"{(results['no_qknorm_rope'] - results['no_adaln']) * 1e3:.2f})", flush=True)

    att.flash_attention_trainable = orig_flash
    att.layer_norm = orig_ln
    att.apply_rotary_emb = orig_rope
    tr.ada_layer_norm_zero_3stream = orig_adaln

    out = {
        "B": B,
        "geometry": f"S={t_len + r_len + v_len} D={d}",
        "ms_per_layer": {k: round(v * 1e3, 2) for k, v in results.items()},
        "deltas_ms": {
            "attention_incl_relayout": round((results["full"] - results["no_kernel"]) * 1e3, 2),
            "qknorm_rope": round((results["no_kernel"] - results["no_qknorm_rope"]) * 1e3, 2),
            "adaln_x2": round((results["no_qknorm_rope"] - results["no_adaln"]) * 1e3, 2),
            "linears_plus_rest": round(results["no_adaln"] * 1e3, 2),
        },
    }
    print(json.dumps(out))
    if not SMOKE:
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "bench_runs", "block_ablation.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
