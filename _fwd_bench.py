import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from s2v_tpu.config import TransformerConfig
from s2v_tpu.models.transformer import init_transformer_params_stacked, transformer_forward
from s2v_tpu.ops.rope import build_segmented_rope, prepare_video_and_ref_rope

key = jax.random.PRNGKey(0)
for n_layers in (1, 42):
    cfg = TransformerConfig.cogvideox_5b(num_layers=n_layers)
    params = init_transformer_params_stacked(key, cfg)
    jax.block_until_ready(params)
    B, F, H, W = 1, 13, 60, 90
    video = jax.random.normal(key, (B, F, H, W, cfg.in_channels), cfg.dtype)
    ref = jax.random.normal(key, (B, 1, H, W, cfg.in_channels), cfg.dtype)
    text = jax.random.normal(key, (B, cfg.max_text_seq_length, cfg.text_embed_dim), cfg.dtype)
    t = jnp.full((B,), 999, jnp.int32)
    vc, vs, rc, rs = prepare_video_and_ref_rope(480, 720, F, cfg.attention_head_dim)
    cos_s, sin_s = build_segmented_rope(cfg.max_text_seq_length, rc, rs, vc, vs)
    f = jax.jit(lambda p: transformer_forward(p, cfg, video, ref, text, t, cos_s, sin_s, attention_backend="pallas").astype(jnp.float32).sum())
    t0 = time.perf_counter()
    np.asarray(f(params)).ravel()
    print(f"layers={n_layers}: warmup(compile) {time.perf_counter()-t0:.0f} s", flush=True)
    n = 3
    t0 = time.perf_counter()
    outs = [f(params) for _ in range(n)]
    np.asarray(outs[-1]).ravel()
    print(f"layers={n_layers}: fwd {(time.perf_counter()-t0)/n*1000:.0f} ms", flush=True)
