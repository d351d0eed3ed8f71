"""generate() input-validation surface (reference check_inputs,
pipeline_cogvideox.py:372-421) + the fused-loop progress callback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2v_tpu.testing import tiny_pipeline


@pytest.fixture(scope="module")
def pipe():
    return tiny_pipeline()


def _kw(pipe, **over):
    cfg = pipe.transformer_cfg
    sc = pipe.vae_cfg.spatial_compression_ratio
    H = W = 2 * sc * cfg.patch_size
    emb = jnp.zeros((2, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32)
    ref = jnp.zeros((1, 1, H // sc, W // sc, cfg.in_channels), jnp.float32)
    kw = dict(prompt_embeds=emb, ref_latents=ref, height=H, width=W,
              num_frames=pipe.vae_cfg.temporal_compression_ratio + 1,
              num_inference_steps=1, output_type="latent")
    kw.update(over)
    return kw


def test_prompt_and_embeds_exclusive(pipe):
    with pytest.raises(ValueError, match="only one of prompt"):
        pipe.generate(**_kw(pipe, prompt="hi"))


def test_neither_prompt_nor_embeds(pipe):
    with pytest.raises(ValueError, match="provide prompt or prompt_embeds"):
        pipe.generate(**_kw(pipe, prompt_embeds=None))


def test_prompt_type_checked(pipe):
    with pytest.raises(ValueError, match="prompt must be str or list"):
        pipe.generate(**_kw(pipe, prompt_embeds=None, prompt=42))
    with pytest.raises(ValueError, match="only strings"):
        pipe.generate(**_kw(pipe, prompt_embeds=None, prompt=["ok", 1]))


def test_negative_prompt_with_embeds_rejected(pipe):
    with pytest.raises(ValueError, match="negative_prompt is ignored"):
        pipe.generate(**_kw(pipe, negative_prompt="bad"))


def test_ref_image_and_latents_exclusive(pipe):
    with pytest.raises(ValueError, match="only one of ref_image / ref_latents"):
        pipe.generate(**_kw(pipe, ref_image=np.zeros((8, 8, 3), np.float32)))


def test_step_and_frame_counts(pipe):
    with pytest.raises(ValueError, match="num_inference_steps"):
        pipe.generate(**_kw(pipe, num_inference_steps=0))
    with pytest.raises(ValueError, match="num_frames"):
        pipe.generate(**_kw(pipe, num_frames=0))


def test_segment_callback_requires_segments(pipe):
    with pytest.raises(ValueError, match="segment_steps > 0"):
        pipe.generate(**_kw(pipe, callback_on_segment_end=lambda i, l: None))


def test_divisibility_guard(pipe):
    with pytest.raises(ValueError, match="divisible"):
        pipe.generate(**_kw(pipe, height=10))


def test_fused_loop_progress_callback(pipe, capfd):
    out = pipe.generate(**_kw(pipe, num_inference_steps=2), progress=True)
    jax.effects_barrier()
    assert np.isfinite(np.asarray(out, np.float32)).all()
    err = capfd.readouterr().err
    assert "denoise step 1/2" in err and "denoise step 2/2" in err


def test_progress_works_on_segmented_and_adaptive_paths(pipe, capfd):
    """progress=True must not be silently dropped on the other loop shapes."""
    out = pipe.generate(**_kw(pipe, num_inference_steps=3), progress=True,
                        segment_steps=2)
    jax.effects_barrier()
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert "denoise step 3/3" in capfd.readouterr().err

    out = pipe.generate(**_kw(pipe, num_inference_steps=3), progress=True,
                        adaptive_threshold=0.5)
    jax.effects_barrier()
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert "denoise step 3/3" in capfd.readouterr().err


def test_segment_callback_latents_override(pipe):
    """Reference callback_on_step_end parity: a returned array replaces the
    trajectory latents (custom_cogvideox_pipe.py:299-303)."""
    kw = _kw(pipe, num_inference_steps=4)
    plain = pipe.generate(**kw, segment_steps=2)

    frozen = {}

    def freeze(i, lat):
        frozen.setdefault("lat", np.asarray(lat))
        return frozen["lat"]  # pin latents to the first segment's output

    pinned = pipe.generate(**kw, segment_steps=2, callback_on_segment_end=freeze)
    assert not np.allclose(np.asarray(plain), np.asarray(pinned))
    assert np.isfinite(np.asarray(pinned, np.float32)).all()


def test_segment_callback_numpy_bool_interrupt(pipe):
    """numpy bools follow the same stop/continue contract as python bools
    (a health-check callback like `np.isfinite(lat).all()` must not be
    mistaken for a latents override)."""
    calls = []

    def cb(i, lat):
        calls.append(i)
        return np.bool_(False)  # stop after the first segment

    out = pipe.generate(**_kw(pipe, num_inference_steps=4), segment_steps=2,
                        callback_on_segment_end=cb)
    assert calls == [2]
    assert np.isfinite(np.asarray(out, np.float32)).all()
