"""Tiny-config end-to-end pipeline tests: the denoise loop, guidance
schedules, CFG semantics, and the full generate() flow."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2v_tpu.config import SchedulerConfig, T5Config, TransformerConfig, VAEConfig
from s2v_tpu.models.t5 import init_t5_params
from s2v_tpu.models.transformer import init_transformer_params, transformer_forward
from s2v_tpu.models.vae import init_vae_params
from s2v_tpu.pipelines.denoise import DenoiseSchedule, denoise, guidance_schedule
from s2v_tpu.pipelines.s2v import S2VPipeline
from s2v_tpu.schedulers.ddim import ddim_step
from s2v_tpu.ops.rope import build_segmented_rope, get_3d_rotary_pos_embed



# jit-heavy full-coverage module (see pyproject markers); the fast tier
# (pytest -m 'not slow') keeps kernels/ops/loaders/scheduler coverage
pytestmark = __import__('pytest').mark.slow

class _FakeTokenizer:
    def encode(self, prompts, max_length=226):
        out = np.zeros((len(prompts), max_length), np.int32)
        for i, p in enumerate(prompts):
            ids = [(hash(w) % 100) + 2 for w in p.split()][: max_length - 1] + [1]
            out[i, : len(ids)] = ids
        return out


def _tiny_pipeline():
    tcfg = TransformerConfig.tiny()
    # sample 64x64 -> tile minimum 32x32, so 32x32 test inputs skip tiling
    # (tiling geometry only closes exactly for the canonical aspect ratios)
    vcfg = VAEConfig.tiny(latent_channels=tcfg.in_channels, sample_height=64, sample_width=64)
    t5cfg = T5Config.tiny(d_model=tcfg.text_embed_dim)
    key = jax.random.PRNGKey(0)
    return S2VPipeline(
        transformer_params=init_transformer_params(key, tcfg),
        transformer_cfg=tcfg,
        vae_params=init_vae_params(key, vcfg),
        vae_cfg=vcfg,
        t5_params=init_t5_params(key, t5cfg),
        t5_cfg=t5cfg,
        scheduler_cfg=SchedulerConfig(),
        tokenizer=_FakeTokenizer(),
    )


def test_guidance_schedule_dynamic_matches_reference_formula():
    g = guidance_schedule(6.0, 50, True)
    for i in [0, 10, 49]:
        expected = 1 + 6.0 * ((1 - math.cos(math.pi * ((50 - i) / 50) ** 5.0)) / 2)
        assert abs(g[i] - expected) < 1e-6
    g_static = guidance_schedule(6.0, 50, False)
    np.testing.assert_array_equal(g_static, np.full(50, 6.0, np.float32))


def test_denoise_loop_matches_manual_steps():
    """fori_loop denoise == hand-rolled python loop of transformer+ddim."""
    cfg = TransformerConfig.tiny()
    key = jax.random.PRNGKey(1)
    params = init_transformer_params(key, cfg)
    B, F, H, W = 1, 2, 8, 8
    lat0 = jax.random.normal(jax.random.PRNGKey(2), (B, F, H, W, cfg.in_channels), jnp.float32)
    ref = jax.random.normal(jax.random.PRNGKey(3), (B, 1, H, W, cfg.in_channels), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(4), (2 * B, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32)

    gh, gw = H // 2, W // 2
    cos, sin = get_3d_rotary_pos_embed(cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), F + 1)
    tok = gh * gw
    cs, sn = build_segmented_rope(cfg.max_text_seq_length, cos[:tok], sin[:tok], cos[tok:tok*(F+1)], sin[tok:tok*(F+1)])

    sched = DenoiseSchedule.create(SchedulerConfig(), 4, 6.0, use_dynamic_cfg=True)
    out = denoise(params, cfg, sched, lat0, ref, emb, cs, sn, do_cfg=True)

    lat = lat0
    ref2 = jnp.concatenate([ref, ref], axis=0)
    for i in range(4):
        lin = jnp.concatenate([lat, lat], axis=0)
        t = jnp.full((2 * B,), sched.timesteps[i], jnp.int32)
        pred = transformer_forward(params, cfg, lin, ref2, emb, t, cs, sn).astype(jnp.float32)
        uncond, cond = jnp.split(pred, 2, axis=0)
        pred = uncond + sched.guidance[i] * (cond - uncond)
        lat, _ = ddim_step(pred, lat, sched.alpha_t[i], sched.alpha_prev[i], sched.prediction_type)
    np.testing.assert_allclose(np.asarray(out), np.asarray(lat), atol=1e-4)


def test_sequential_cfg_matches_batched():
    """'sequential' CFG (two B-sized forwards) must equal 'batched' (one
    2B forward) bit-for-bit in fp32."""
    cfg = TransformerConfig.tiny()
    params = init_transformer_params(jax.random.PRNGKey(1), cfg)
    B, F, H, W = 1, 2, 8, 8
    lat0 = jax.random.normal(jax.random.PRNGKey(2), (B, F, H, W, cfg.in_channels), jnp.float32)
    ref = jax.random.normal(jax.random.PRNGKey(3), (B, 1, H, W, cfg.in_channels), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(4), (2 * B, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32)
    gh, gw = H // 2, W // 2
    from s2v_tpu.ops.rope import get_3d_rotary_pos_embed
    cos, sin = get_3d_rotary_pos_embed(cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), F + 1)
    tok = gh * gw
    cs, sn = build_segmented_rope(cfg.max_text_seq_length, cos[:tok], sin[:tok], cos[tok:tok*(F+1)], sin[tok:tok*(F+1)])
    sched = DenoiseSchedule.create(SchedulerConfig(), 3, 6.0)
    out_b = denoise(params, cfg, sched, lat0, ref, emb, cs, sn, do_cfg=True, cfg_mode="batched")
    out_s = denoise(params, cfg, sched, lat0, ref, emb, cs, sn, do_cfg=True, cfg_mode="sequential")
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_s), atol=2e-5)


def test_no_cfg_path():
    cfg = TransformerConfig.tiny()
    params = init_transformer_params(jax.random.PRNGKey(1), cfg)
    B, F, H, W = 1, 2, 8, 8
    lat0 = jax.random.normal(jax.random.PRNGKey(2), (B, F, H, W, cfg.in_channels), jnp.float32)
    ref = jax.random.normal(jax.random.PRNGKey(3), (B, 1, H, W, cfg.in_channels), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(4), (B, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32)
    sched = DenoiseSchedule.create(SchedulerConfig(), 2, 1.0)
    out = denoise(params, cfg, sched, lat0, ref, emb, None, None, do_cfg=False)
    assert out.shape == lat0.shape and bool(jnp.isfinite(out).all())


def test_dpm_denoise_runs():
    cfg = TransformerConfig.tiny()
    params = init_transformer_params(jax.random.PRNGKey(1), cfg)
    B, F, H, W = 1, 2, 8, 8
    lat0 = jax.random.normal(jax.random.PRNGKey(2), (B, F, H, W, cfg.in_channels), jnp.float32)
    ref = jax.random.normal(jax.random.PRNGKey(3), (B, 1, H, W, cfg.in_channels), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(4), (2 * B, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32)
    sched = DenoiseSchedule.create(SchedulerConfig(), 3, 6.0, use_dpm=True)
    out = denoise(params, cfg, sched, lat0, ref, emb, None, None, do_cfg=True)
    assert out.shape == lat0.shape and bool(jnp.isfinite(out).all())


def test_generate_end_to_end_tiny():
    """Full flow: prompt -> T5 -> ref image encode -> denoise -> VAE decode."""
    pipe = _tiny_pipeline()
    ref_img = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32) * 2 - 1
    video = pipe.generate(
        prompt="<cls> a pig walking",
        ref_image=ref_img,
        height=32,
        width=32,
        num_frames=9,
        num_inference_steps=2,
        guidance_scale=6.0,
        seed=42,
    )
    assert video.shape == (1, 9, 32, 32, 3)
    assert video.min() >= 0.0 and video.max() <= 1.0


def test_segmented_denoise_matches_full():
    """Host-steppable segmented loop (interrupt/callback support) must match
    the fused loop exactly."""
    from s2v_tpu.pipelines.denoise import make_segmented_denoise

    cfg = TransformerConfig.tiny()
    params = init_transformer_params(jax.random.PRNGKey(1), cfg)
    B, F, H, W = 1, 2, 8, 8
    lat0 = jax.random.normal(jax.random.PRNGKey(2), (B, F, H, W, cfg.in_channels), jnp.float32)
    ref = jax.random.normal(jax.random.PRNGKey(3), (B, 1, H, W, cfg.in_channels), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(4), (2 * B, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32)
    from s2v_tpu.ops.rope import get_3d_rotary_pos_embed
    gh, gw = H // 2, W // 2
    cos, sin = get_3d_rotary_pos_embed(cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), F + 1)
    tok = gh * gw
    cs, sn = build_segmented_rope(cfg.max_text_seq_length, cos[:tok], sin[:tok], cos[tok:tok*(F+1)], sin[tok:tok*(F+1)])
    sched = DenoiseSchedule.create(SchedulerConfig(), 4, 6.0)

    full = denoise(params, cfg, sched, lat0, ref, emb, cs, sn, do_cfg=True)

    run = make_segmented_denoise(params, cfg, sched, cs, sn, do_cfg=True)
    carry = (lat0, jnp.zeros_like(lat0))
    carry = run(None, carry, ref, emb, None, 0, 1)    # segment 1: step 0
    carry = run(None, carry, ref, emb, None, 1, 4)    # segment 2: steps 1-3
    np.testing.assert_allclose(np.asarray(full), np.asarray(carry[0]), atol=1e-5)


def test_generate_sincos_2b_path():
    """CogVideoX-2b-style model: no RoPE, joint sincos positional table."""
    tcfg = TransformerConfig.tiny(use_rotary_positional_embeddings=False)
    vcfg = VAEConfig.tiny(latent_channels=tcfg.in_channels, sample_height=64, sample_width=64)
    t5cfg = T5Config.tiny(d_model=tcfg.text_embed_dim)
    key = jax.random.PRNGKey(0)
    pipe = S2VPipeline(
        transformer_params=init_transformer_params(key, tcfg),
        transformer_cfg=tcfg,
        vae_params=init_vae_params(key, vcfg),
        vae_cfg=vcfg,
        t5_params=init_t5_params(key, t5cfg),
        t5_cfg=t5cfg,
        scheduler_cfg=SchedulerConfig(),
        tokenizer=_FakeTokenizer(),
    )
    ref_img = np.zeros((32, 32, 3), np.float32)
    out = pipe.generate(
        prompt="x", ref_image=ref_img, height=32, width=32, num_frames=5,
        num_inference_steps=1, guidance_scale=6.0, seed=7, output_type="latent",
    )
    assert out.shape == (1, 2, 4, 4, tcfg.in_channels)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_generate_input_validation():
    pipe = _tiny_pipeline()
    ref = np.zeros((32, 32, 3), np.float32)
    import dataclasses
    import pytest

    # the 49-frame cap is a static-positional-table constraint: it binds for
    # sincos (2b-family) models only
    sincos_pipe = _tiny_pipeline()
    sincos_pipe.transformer_cfg = dataclasses.replace(
        sincos_pipe.transformer_cfg, use_rotary_positional_embeddings=False
    )
    with pytest.raises(ValueError, match="num_frames"):
        sincos_pipe.generate(prompt="x", ref_image=ref, height=32, width=32,
                             num_frames=999, num_inference_steps=1)
    with pytest.raises(ValueError, match="divisible"):
        pipe.generate(prompt="x", ref_image=ref, height=30, width=32,
                      num_frames=5, num_inference_steps=1)
    with pytest.raises(ValueError, match="prompt"):
        pipe.generate(ref_image=ref, height=32, width=32, num_frames=5,
                      num_inference_steps=1)


def test_generate_multi_prompt_batch():
    """Batch-of-prompts serving: one CFG-batched denoise over B prompts."""
    pipe = _tiny_pipeline()
    ref_img = np.zeros((32, 32, 3), np.float32)
    out = pipe.generate(
        prompt=["a pig", "a cat on a mat"],
        ref_image=ref_img,
        ref_latents=None,
        height=32, width=32, num_frames=5, num_inference_steps=1,
        guidance_scale=6.0, seed=3, output_type="latent", cfg_mode="batched",
    )
    assert out.shape[0] == 2
    # the two prompts must produce different latents
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_num_videos_per_prompt():
    pipe = _tiny_pipeline()
    ref = np.zeros((32, 32, 3), np.float32)
    out = pipe.generate(
        prompt="a pig", ref_image=ref, height=32, width=32, num_frames=5,
        num_inference_steps=1, guidance_scale=6.0, num_videos_per_prompt=2,
        seed=5, output_type="latent",
    )
    assert out.shape[0] == 2
    # different noise per video -> different latents
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_generate_latent_output_deterministic():
    pipe = _tiny_pipeline()
    ref_img = np.zeros((32, 32, 3), np.float32)
    kwargs = dict(
        prompt="x", ref_image=ref_img, height=32, width=32, num_frames=5,
        num_inference_steps=2, guidance_scale=6.0, seed=7, output_type="latent",
    )
    a = pipe.generate(**kwargs)
    b = pipe.generate(**kwargs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_t5_host_offload_and_prompt_cache():
    """t5_on_host encode produces the same embeddings as on-device encode
    (cpu-offload equivalent); the prompt cache returns identical arrays and
    avoids re-encoding."""
    pipe = _tiny_pipeline()
    emb_dev = pipe.encode_prompt("a pig in a field", do_cfg=True)

    pipe2 = _tiny_pipeline()
    pipe2.t5_on_host = True
    emb_host = pipe2.encode_prompt("a pig in a field", do_cfg=True)
    np.testing.assert_allclose(
        np.asarray(emb_dev, np.float32), np.asarray(emb_host, np.float32), atol=1e-6
    )

    # cache: second call must not re-encode (poison the t5 params)
    assert len(pipe2._prompt_embed_cache) == 2  # prompt + ""
    pipe2.t5_params = None  # encode would now raise if attempted
    emb_cached = pipe2._encode_texts(["a pig in a field"], pipe2.transformer_cfg.max_text_seq_length)
    np.testing.assert_array_equal(
        np.asarray(emb_cached[0], np.float32), np.asarray(emb_host[1], np.float32)
    )


def test_prompt_cache_eviction_never_drops_needed_keys():
    """Regression: with a full cache, encoding [cached-oldest, new] must not
    evict the oldest (still-needed) entry mid-call, and >cap unique prompts
    in one call must not crash."""
    pipe = _tiny_pipeline()
    ml = pipe.transformer_cfg.max_text_seq_length
    # fill the cache to the 32-entry cap
    pipe._encode_texts([f"p{i}" for i in range(32)], ml)
    assert len(pipe._prompt_embed_cache) == 32
    # oldest entry (p0) is needed by this call alongside a new prompt
    out = pipe._encode_texts(["p0", "brand new"], ml)
    assert out.shape[0] == 2
    # duplicates are encoded once and stacked twice
    out2 = pipe._encode_texts(["dup", "dup"], ml)
    np.testing.assert_array_equal(np.asarray(out2[0]), np.asarray(out2[1]))
    # a single call larger than the cap survives (cap is soft within a call)
    out3 = pipe._encode_texts([f"big{i}" for i in range(35)], ml)
    assert out3.shape[0] == 35


def test_adaptive_denoise_threshold_zero_matches_exact():
    """threshold -> 0 never skips: result bit-matches the exact loop."""
    from s2v_tpu.pipelines.denoise import denoise_adaptive

    cfg = TransformerConfig.tiny()
    params = init_transformer_params(jax.random.PRNGKey(1), cfg)
    B, F, H, W = 1, 2, 8, 8
    lat0 = jax.random.normal(jax.random.PRNGKey(2), (B, F, H, W, cfg.in_channels), jnp.float32)
    ref = jax.random.normal(jax.random.PRNGKey(3), (B, 1, H, W, cfg.in_channels), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(4), (2 * B, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32)
    gh, gw = H // 2, W // 2
    cos, sin = get_3d_rotary_pos_embed(cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), F + 1)
    tok = gh * gw
    cs, sn = build_segmented_rope(cfg.max_text_seq_length, cos[:tok], sin[:tok], cos[tok:tok*(F+1)], sin[tok:tok*(F+1)])
    sched = DenoiseSchedule.create(SchedulerConfig(), 6, 6.0)

    exact = denoise(params, cfg, sched, lat0, ref, emb, cs, sn, do_cfg=True)
    got, skips = denoise_adaptive(params, cfg, sched, lat0, ref, emb, cs, sn, threshold=0.0, do_cfg=True)
    assert int(skips) == 0
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))

    # a huge threshold skips everything skippable (steps 2..n-2) and stays finite
    got2, skips2 = denoise_adaptive(params, cfg, sched, lat0, ref, emb, cs, sn, threshold=1e9, do_cfg=True)
    assert int(skips2) == 6 - 3  # steps 0,1 and the last always compute
    assert bool(jnp.isfinite(got2).all())
    # moderate threshold: output stays close to exact
    got3, skips3 = denoise_adaptive(params, cfg, sched, lat0, ref, emb, cs, sn, threshold=0.02, do_cfg=True)
    assert bool(jnp.isfinite(got3).all())


def test_generate_adaptive_threshold_flag():
    pipe = _tiny_pipeline()
    from PIL import Image
    import tempfile, os as _os

    img = (np.random.RandomState(0).rand(32, 32, 3) * 255).astype("uint8")
    with tempfile.TemporaryDirectory() as d:
        p = _os.path.join(d, "ref.png")
        Image.fromarray(img).save(p)
        v_exact = pipe.generate(prompt="a pig", ref_image=p, height=32, width=32,
                                num_frames=5, num_inference_steps=4, seed=1)
        v_adapt = pipe.generate(prompt="a pig", ref_image=p, height=32, width=32,
                                num_frames=5, num_inference_steps=4, seed=1,
                                adaptive_threshold=1e9)
    assert v_exact.shape == v_adapt.shape
    assert np.isfinite(v_adapt).all()


def test_generate_segment_steps_matches_fused():
    """Host-stepped segmented generate == fused-loop generate bitwise; the
    segment callback fires and can interrupt."""
    from PIL import Image
    import tempfile, os as _os

    pipe = _tiny_pipeline()
    img = (np.random.RandomState(0).rand(32, 32, 3) * 255).astype("uint8")
    with tempfile.TemporaryDirectory() as d:
        p = _os.path.join(d, "ref.png")
        Image.fromarray(img).save(p)
        kw = dict(prompt="a pig", ref_image=p, height=32, width=32,
                  num_frames=5, num_inference_steps=4, seed=1, output_type="latent")
        fused = pipe.generate(**kw)
        seen = []
        seg = pipe.generate(**kw, segment_steps=3,
                            callback_on_segment_end=lambda i, lat: seen.append(i))
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(seg))
        assert seen == [3, 4]
        # cooperative interrupt: stop after the first segment
        stopped = pipe.generate(**kw, segment_steps=2,
                                callback_on_segment_end=lambda i, lat: False)
        assert np.isfinite(np.asarray(stopped)).all()


def test_generate_segmented_adaptive_matches_fused_adaptive():
    """Adaptive state (prev eps, latent diffs, skip count) crosses segment
    boundaries: segmented adaptive generate == fused adaptive bitwise."""
    from PIL import Image
    import tempfile, os as _os

    pipe = _tiny_pipeline()
    img = (np.random.RandomState(0).rand(32, 32, 3) * 255).astype("uint8")
    with tempfile.TemporaryDirectory() as d:
        p = _os.path.join(d, "ref.png")
        Image.fromarray(img).save(p)
        kw = dict(prompt="a pig", ref_image=p, height=32, width=32,
                  num_frames=5, num_inference_steps=6, seed=1,
                  output_type="latent", adaptive_threshold=0.02)
        fused = pipe.generate(**kw)
        seg = pipe.generate(**kw, segment_steps=2)
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(seg))
        # huge threshold through the segmented path still skips and is finite
        big = pipe.generate(prompt="a pig", ref_image=p, height=32, width=32,
                            num_frames=5, num_inference_steps=6, seed=1,
                            output_type="latent", adaptive_threshold=1e9,
                            segment_steps=4)
        assert np.isfinite(np.asarray(big)).all()


def test_generate_long_clip_rotary():
    """Rotary (5b-family) models accept clips beyond the reference's
    49-frame cap (BASELINE 'longer 8s clip' config): RoPE tables derive
    from request shapes, not a static table.  tiny cfg: sample_frames=9,
    request 13."""
    pipe = _tiny_pipeline()
    assert pipe.transformer_cfg.use_rotary_positional_embeddings
    assert pipe.transformer_cfg.sample_frames == 9
    ref = np.zeros((32, 32, 3), np.float32)
    out = pipe.generate(prompt="a pig", ref_image=ref, height=32, width=32,
                        num_frames=13, num_inference_steps=1,
                        output_type="latent", seed=3)
    assert out.shape == (1, 4, 4, 4, pipe.transformer_cfg.in_channels)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_generate_output_types():
    """Reference VideoProcessor.postprocess_video output types: np / pil /
    pt / latent."""
    pipe = _tiny_pipeline()
    ref = np.zeros((32, 32, 3), np.float32)
    kw = dict(prompt="a pig", ref_image=ref, height=32, width=32,
              num_frames=5, num_inference_steps=1, seed=4)
    v_np = pipe.generate(**kw, output_type="np")
    assert isinstance(v_np, np.ndarray) and v_np.ndim == 5 and v_np.shape[-1] == 3

    v_pil = pipe.generate(**kw, output_type="pil")
    from PIL import Image
    assert isinstance(v_pil, list) and isinstance(v_pil[0][0], Image.Image)
    assert len(v_pil) == 1 and len(v_pil[0]) == v_np.shape[1]

    import torch
    v_pt = pipe.generate(**kw, output_type="pt")
    assert isinstance(v_pt, torch.Tensor)
    assert tuple(v_pt.shape) == (1, v_np.shape[1], 3, 32, 32)
    np.testing.assert_allclose(v_pt.permute(0, 1, 3, 4, 2).numpy(), v_np, atol=1e-6)

    with pytest.raises(ValueError, match="output_type"):
        pipe.generate(**kw, output_type="bogus")


def test_cfg_skip_matches_guidance_one():
    """CFG-skip (skip the uncond forward when g-1 < thr) is mathematically
    identical to running those steps with guidance == 1: eps = uncond +
    1*(cond - uncond) = cond.  Check both cfg modes against that reference."""
    import dataclasses as dc

    cfg = TransformerConfig.tiny()
    params = init_transformer_params(jax.random.PRNGKey(1), cfg)
    B, F, H, W = 1, 2, 8, 8
    lat0 = jax.random.normal(jax.random.PRNGKey(2), (B, F, H, W, cfg.in_channels), jnp.float32)
    ref = jax.random.normal(jax.random.PRNGKey(3), (B, 1, H, W, cfg.in_channels), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(4), (2 * B, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32)
    gh, gw = H // 2, W // 2
    cos, sin = get_3d_rotary_pos_embed(cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), F + 1)
    tok = gh * gw
    cs, sn = build_segmented_rope(cfg.max_text_seq_length, cos[:tok], sin[:tok], cos[tok:tok*(F+1)], sin[tok:tok*(F+1)])

    n, thr = 6, 0.05
    sched = DenoiseSchedule.create(SchedulerConfig(), n, 6.0, use_dynamic_cfg=True)
    skip_mask = sched.guidance - 1.0 < thr
    assert skip_mask.any() and not skip_mask.all()  # the test must exercise both branches
    g_ref = np.where(skip_mask, 1.0, sched.guidance).astype(np.float32)
    sched_ref = dc.replace(sched, guidance=g_ref)

    expected = denoise(params, cfg, sched_ref, lat0, ref, emb, cs, sn, do_cfg=True)
    for mode in ("batched", "sequential"):
        got = denoise(params, cfg, sched, lat0, ref, emb, cs, sn, do_cfg=True,
                      cfg_mode=mode, cfg_skip_threshold=thr)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5,
                                   err_msg=mode)

    # threshold 0 stays the exact program
    exact = denoise(params, cfg, sched, lat0, ref, emb, cs, sn, do_cfg=True)
    got0 = denoise(params, cfg, sched, lat0, ref, emb, cs, sn, do_cfg=True,
                   cfg_skip_threshold=0.0)
    np.testing.assert_array_equal(np.asarray(got0), np.asarray(exact))


def test_generate_cfg_skip_flag():
    pipe = _tiny_pipeline()
    ref = np.zeros((32, 32, 3), np.float32)
    kw = dict(prompt="a pig", ref_image=ref, height=32, width=32, num_frames=5,
              num_inference_steps=6, seed=1, use_dynamic_cfg=True,
              output_type="latent")
    out = pipe.generate(**kw, cfg_skip_threshold=0.05)
    assert np.isfinite(np.asarray(out)).all()
    # segmented path composes with cfg-skip
    seg = pipe.generate(**kw, cfg_skip_threshold=0.05, segment_steps=2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(seg))


def test_compiled_cache_respects_backend_and_cfg():
    """Reconfiguring a live pipeline (attention backend / window width) must
    compile a new executable, not silently reuse the stale one."""
    import dataclasses

    pipe = _tiny_pipeline()
    ref = np.zeros((32, 32, 3), np.float32)
    kw = dict(prompt="a pig", ref_image=ref, height=32, width=32, num_frames=9,
              num_inference_steps=2, seed=1, output_type="latent")
    exact = pipe.generate(**kw)
    assert len(pipe._compiled_denoise) == 1

    pipe.attention_backend = "windowed_xla"
    pipe.transformer_cfg = dataclasses.replace(
        pipe.transformer_cfg, attention_window_frames=0
    )
    windowed = pipe.generate(**kw)
    assert len(pipe._compiled_denoise) == 2  # new cache entry, not a stale hit
    assert float(jnp.abs(jnp.asarray(windowed) - jnp.asarray(exact)).max()) > 1e-6


def test_vae_tiling_auto_policy():
    """vae_tiling='auto' tiles only above the VAE's native sample size."""
    pipe = _tiny_pipeline()  # tiny VAE: sample 64x64
    pipe.vae_tiling = "auto"
    assert pipe._resolve_tiling(64, 64) is False   # at native size: exact decode
    assert pipe._resolve_tiling(128, 64) is True   # above: tile (memory regime)
    pipe.vae_tiling = True
    assert pipe._resolve_tiling(32, 32) is True
    pipe.vae_tiling = False
    assert pipe._resolve_tiling(999, 999) is False
    # end-to-end with auto (32x32 < native -> untiled, exact)
    pipe.vae_tiling = "auto"
    ref = np.zeros((32, 32, 3), np.float32)
    out = pipe.generate(prompt="a pig", ref_image=ref, height=32, width=32,
                        num_frames=5, num_inference_steps=1, seed=1)
    assert np.isfinite(out).all()


def test_decode_latents_degrades_to_tiled_on_hbm_exhaustion(monkeypatch):
    """A resident serving process (DiT + adapters + T5 in HBM) can exhaust
    HBM on the untiled 'auto' decode; the pipeline must retry with the
    reference-style tiled decode instead of failing the request (round-5
    flagship serving fix)."""
    from s2v_tpu.testing import tiny_pipeline

    pipe = tiny_pipeline()
    calls = []
    import s2v_tpu.pipelines.s2v as s2v_mod

    real = s2v_mod.vae_decode

    def fake(params, cfg, z, use_tiling=False, use_slicing=True):
        calls.append(use_tiling)
        if not use_tiling:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        return real(params, cfg, z, use_tiling=False, use_slicing=use_slicing)

    monkeypatch.setattr(s2v_mod, "vae_decode", fake)
    z = jax.random.normal(
        jax.random.PRNGKey(0), (1, 2, 4, 4, pipe.vae_cfg.latent_channels)
    )
    frames = pipe.decode_latents(z)
    assert calls == [False, True]  # untiled attempt, then the tiled retry
    assert np.isfinite(frames).all()

    # the degraded decision is sticky: the next request skips the doomed
    # untiled compile and goes straight to the lean tiled path
    calls.clear()
    frames = pipe.decode_latents(z)
    assert calls == [True]
    assert np.isfinite(frames).all()

    # a NON-memory failure must still raise (no silent retry loop)
    def fake_other(params, cfg, z, use_tiling=False, use_slicing=True):
        raise RuntimeError("some other backend error")

    monkeypatch.setattr(s2v_mod, "vae_decode", fake_other)
    with pytest.raises(RuntimeError, match="other backend"):
        pipe.decode_latents(z)


def test_decode_hbm_gate_routes_by_free_bytes(monkeypatch):
    """Resident-serving upfront gate: the decode mode is chosen from the
    estimated free HBM instead of failing first (a failed donated-buffer
    execution does not reliably release HBM on this backend)."""
    from s2v_tpu.testing import tiny_pipeline

    import s2v_tpu.pipelines.s2v as s2v_mod

    real = s2v_mod.vae_decode

    for free, want_first_tiling in ((3.9e9, True), (6.0e9, False)):
        pipe = tiny_pipeline()
        calls = []

        def fake(params, cfg, z, use_tiling=False, use_slicing=True):
            calls.append(use_tiling)
            return real(params, cfg, z, use_tiling=False, use_slicing=use_slicing)

        monkeypatch.setattr(s2v_mod, "vae_decode", fake)
        monkeypatch.setattr(
            type(pipe), "_device_free_bytes", lambda self, v=free: v)
        monkeypatch.setattr(
            type(pipe), "_resolve_tiling", lambda self, h, w: False)
        z = jax.random.normal(
            jax.random.PRNGKey(0), (1, 2, 4, 4, pipe.vae_cfg.latent_channels))
        pipe.decode_latents(z)
        assert calls == [want_first_tiling], (free, calls)

    # < 2.5 GB free: straight to the lean quarter-tile path, sticky
    pipe = tiny_pipeline()
    monkeypatch.setattr(type(pipe), "_device_free_bytes", lambda self: 2.0e9)
    monkeypatch.setattr(type(pipe), "_resolve_tiling", lambda self, h, w: False)
    lean_calls = []
    monkeypatch.setattr(
        type(pipe), "_decode_lean_tiles",
        lambda self, z: (lean_calls.append(1), real(self.vae_params, self.vae_cfg, z))[1])
    z = jax.random.normal(
        jax.random.PRNGKey(0), (1, 2, 4, 4, pipe.vae_cfg.latent_channels))
    pipe.decode_latents(z)
    assert lean_calls == [1] and pipe._decode_lean
