"""I2V / V2V pipeline variant tests (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp

from s2v_tpu.config import SchedulerConfig, T5Config, TransformerConfig, VAEConfig
from s2v_tpu.models.t5 import init_t5_params
from s2v_tpu.models.transformer import init_transformer_params
from s2v_tpu.models.vae import init_vae_params
from s2v_tpu.pipelines.s2v import S2VPipeline
from s2v_tpu.pipelines.denoise import DenoiseSchedule
from s2v_tpu.pipelines.variants import generate_i2v, generate_v2v, prepare_i2v_cond_latents



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


def _pipe(in_channels=4):
    tcfg = TransformerConfig.tiny(in_channels=in_channels)
    vcfg = VAEConfig.tiny(latent_channels=4, sample_height=64, sample_width=64)
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


def test_i2v_cond_latents_layout():
    pipe = _pipe()
    img = np.zeros((32, 32, 3), np.float32)
    cond = prepare_i2v_cond_latents(pipe, img, num_latent_frames=3)
    assert cond.shape == (1, 3, 4, 4, 4)
    # frames 1..n are zero padding
    np.testing.assert_array_equal(np.asarray(cond[:, 1:]), 0.0)


def test_i2v_generate():
    # i2v checkpoints take 2x channels: noise (4) | image cond (4)
    pipe = _pipe(in_channels=8)
    img = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32) * 2 - 1
    out = generate_i2v(
        pipe, "a pig", img, height=32, width=32, num_frames=5,
        num_inference_steps=1, guidance_scale=6.0, output_type="latent",
    )
    assert out.shape == (1, 2, 4, 4, 4)  # noise channels only
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_v2v_generate_and_strength():
    pipe = _pipe()
    vid = np.random.RandomState(1).rand(5, 32, 32, 3).astype(np.float32) * 2 - 1
    out = generate_v2v(
        pipe, "a pig", vid, strength=0.5, num_inference_steps=4,
        guidance_scale=6.0, output_type="latent",
    )
    assert out.shape == (1, 2, 4, 4, 4)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_fun_control_generate():
    from s2v_tpu.pipelines.variants import generate_fun_control

    pipe = _pipe(in_channels=8)  # noise 4 | control 4 channels
    ctl = np.random.RandomState(2).rand(5, 32, 32, 3).astype(np.float32) * 2 - 1
    out = generate_fun_control(
        pipe, "a pig", ctl, num_inference_steps=1, guidance_scale=6.0,
        output_type="latent",
    )
    assert out.shape == (1, 2, 4, 4, 4)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_schedule_truncate():
    sched = DenoiseSchedule.create(SchedulerConfig(), 50, 6.0)
    t = sched.truncate(0.8)
    assert len(t.timesteps) == 40
    np.testing.assert_array_equal(t.timesteps, sched.timesteps[10:])
    t_full = sched.truncate(1.0)
    assert len(t_full.timesteps) == 50


def test_t2v_generate():
    """No-ref T2V end to end (zero-width ref stream)."""
    from s2v_tpu.pipelines.variants import generate_t2v

    pipe = _pipe()
    out = generate_t2v(
        pipe, "a pig", height=32, width=32, num_frames=9,
        num_inference_steps=2, guidance_scale=6.0, seed=0,
    )
    assert out.shape[0] == 1 and out.shape[-1] == 3
    assert np.isfinite(out).all()


def test_t2v_differs_from_s2v_and_is_deterministic():
    from s2v_tpu.pipelines.variants import generate_t2v

    pipe = _pipe()
    a = generate_t2v(pipe, "a pig", height=32, width=32, num_frames=9,
                     num_inference_steps=2, seed=0, output_type="latent")
    b = generate_t2v(pipe, "a pig", height=32, width=32, num_frames=9,
                     num_inference_steps=2, seed=0, output_type="latent")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
