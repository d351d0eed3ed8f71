"""Measure the composite opt-in fast-path config on the real chip:
int8 linears + banded windowed attention (w=2) + CFG-skip
(thr=0.01) + batched CFG, real 50-step loop in 6-step segments
(relay-safe), vs the exact baseline 404.4 s from bench.py."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses
from s2v_tpu.config import TransformerConfig, SchedulerConfig
from s2v_tpu.models.transformer import init_transformer_params_stacked
from s2v_tpu.ops.rope import build_segmented_rope, prepare_video_and_ref_rope
from s2v_tpu.pipelines.denoise import DenoiseSchedule, _build_step_fn

B, F, H, W = 1, 13, 60, 90
steps = 50
cfg = TransformerConfig.cogvideox_5b(num_layers=42)
cfg = dataclasses.replace(cfg, attention_window_frames=2)
params = init_transformer_params_stacked(jax.random.PRNGKey(0), cfg, quantized=True)
jax.block_until_ready(params)
key = jax.random.PRNGKey(0)
video = jax.random.normal(key, (B, F, H, W, cfg.in_channels), cfg.dtype)
ref = jax.random.normal(key, (B, 1, H, W, cfg.in_channels), cfg.dtype)
emb2 = jax.random.normal(key, (2 * B, cfg.max_text_seq_length, cfg.text_embed_dim), cfg.dtype)
vc, vs, rc, rs = prepare_video_and_ref_rope(480, 720, F, cfg.attention_head_dim)
rope_cos, rope_sin = build_segmented_rope(cfg.max_text_seq_length, rc, rs, vc, vs)
sched = DenoiseSchedule.create(SchedulerConfig(), steps, 6.0, use_dynamic_cfg=True)
print(f"# skip steps: {int(np.sum(sched.guidance - 1 < 0.01))}/{steps}", flush=True)

def _segment(p, carry, r, e, rng, i0, i1):
    step = _build_step_fn(
        p, cfg, sched, r, e, rope_cos, rope_sin, True, rng,
        "windowed", None, "batched", None, 0.01,
    )
    return jax.lax.fori_loop(i0, i1, step, carry)

run_seg = jax.jit(_segment)
rng = jax.random.PRNGKey(7)
carry0 = (video, jnp.zeros_like(video))
t0 = time.perf_counter()
c = run_seg(params, carry0, ref, emb2, rng, 0, 6)
jax.block_until_ready(c)
print(f"# compile+first-seg: {time.perf_counter()-t0:.0f} s", flush=True)
t0 = time.perf_counter()
carry = carry0
for i0 in range(0, steps, 6):
    carry = run_seg(params, carry, ref, emb2, rng, i0, min(i0 + 6, steps))
    jax.block_until_ready(carry)
dt = time.perf_counter() - t0
assert bool(jnp.isfinite(carry[0].astype(jnp.float32)).all())
print(f"turbo 50-step denoise: {dt:.1f} s  (exact baseline 404.4 s -> {404.4/dt:.2f}x)", flush=True)
