"""Image-to-video and video-to-video pipeline variants.

TPU-native counterparts of the reference's vendored (present-but-unused)
``pipeline_cogvideox_image2video.py`` / ``pipeline_cogvideox_video2video.py``
(SURVEY.md §2.3): shared denoise core with

  * I2V: the conditioning image's VAE latents (frame 0, zero-padded across
    time) concatenated channel-wise to the noise latents each step
    (reference i2v :370-391, :744) — for checkpoints with in_channels=32;
  * V2V: init latents = noised input-video latents, schedule truncated by
    ``strength`` (reference v2v :385-415).

Both reuse the S2V pipeline's components; the ref-image token stream is
optional (zeros disable its contribution only if the checkpoint was trained
that way — for stock CogVideoX checkpoints pass ``ref_latents`` explicitly
or use the plain functions below with the 2-stream semantics approximated
by an all-zeros ref stream).
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from s2v_tpu.pipelines.denoise import DenoiseSchedule, denoise
from s2v_tpu.models.vae import gaussian_sample, vae_encode
from s2v_tpu.schedulers.ddim import add_noise, compute_alphas_cumprod


def prepare_i2v_cond_latents(pipe, image: Union[str, np.ndarray], num_latent_frames: int,
                             rng_key: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """image -> [1, F_lat, h, w, C] scaled latents: frame 0 real, rest zero
    (reference i2v prepare_latents :370-391)."""
    z = pipe.encode_ref_image(image, rng_key)  # [1, 1, h, w, C] scaled
    pad = jnp.zeros((z.shape[0], num_latent_frames - 1, *z.shape[2:]), z.dtype)
    return jnp.concatenate([z, pad], axis=1)


def prepare_v2v_latents(
    pipe,
    video: jnp.ndarray,  # [B, T, H, W, 3] in [-1, 1]
    schedule: DenoiseSchedule,
    rng_key: jnp.ndarray,
) -> jnp.ndarray:
    """Encode the input video and noise it to the (truncated) schedule's
    first timestep (reference v2v prepare_latents :385-398)."""
    moments = vae_encode(pipe.vae_params, pipe.vae_cfg, video.astype(pipe.vae_cfg.dtype))
    k_s, k_n = jax.random.split(rng_key)
    noise_post = jax.random.normal(
        k_s, moments.shape[:-1] + (moments.shape[-1] // 2,), jnp.float32
    ).astype(moments.dtype)
    init = gaussian_sample(moments, noise_post) * pipe.vae_cfg.scaling_factor
    noise = jax.random.normal(k_n, init.shape, jnp.float32).astype(init.dtype)
    alphas = jnp.asarray(compute_alphas_cumprod(pipe.scheduler_cfg))
    t0 = jnp.asarray(schedule.timesteps[0])[None]
    return add_noise(init, noise, alphas, t0)


def generate_t2v(
    pipe,
    prompt: str,
    height: int = 480,
    width: int = 720,
    num_frames: int = 49,
    num_inference_steps: int = 50,
    guidance_scale: float = 6.0,
    use_dynamic_cfg: bool = False,
    seed: int = 420,
    output_type: str = "np",
):
    """Plain text-to-video: NO reference-image stream (stock CogVideoX
    semantics, reference pipeline_cogvideox.py:140-746 — whose own T2V is
    broken against the repo's modified transformer, :685-686 FIXME).

    The transformer runs with a zero-width ref stream (the attended
    sequence is ``[text | video]`` and the RoPE tables carry no ref
    segment), so stock CogVideoX-5b/2b checkpoints loaded without a LoRA
    produce their published behavior.
    """
    cfg = pipe.transformer_cfg
    key = jax.random.PRNGKey(seed)
    do_cfg = guidance_scale > 1.0

    prompt_embeds = pipe.encode_prompt(prompt, do_cfg=do_cfg).astype(cfg.dtype)
    sc = pipe.vae_cfg.spatial_compression_ratio
    f_lat = (num_frames - 1) // pipe.vae_cfg.temporal_compression_ratio + 1
    h_lat, w_lat = height // sc, width // sc
    latents = jax.random.normal(
        key, (1, f_lat, h_lat, w_lat, cfg.in_channels), jnp.float32
    ).astype(cfg.dtype)

    rope_cos = rope_sin = pos_embedding = None
    if cfg.use_rotary_positional_embeddings:
        from s2v_tpu.ops.rope import build_segmented_rope, prepare_video_and_ref_rope

        vc, vs, rc, rs = prepare_video_and_ref_rope(
            height, width, f_lat, cfg.attention_head_dim, cfg.patch_size, sc
        )
        # zero-width ref segment: [text (identity) | video]
        rope_cos, rope_sin = build_segmented_rope(
            cfg.max_text_seq_length, rc[:0], rs[:0], vc, vs
        )
    else:
        from s2v_tpu.ops.sincos import joint_text_video_pos_embedding

        pos_embedding = jnp.asarray(
            joint_text_video_pos_embedding(
                cfg, height // sc // cfg.patch_size, width // sc // cfg.patch_size, f_lat
            )
        )

    schedule = DenoiseSchedule.create(
        pipe.scheduler_cfg, num_inference_steps, guidance_scale, use_dynamic_cfg
    )
    run = jax.jit(
        lambda p, lat, emb: denoise(
            p, cfg, schedule, lat, None, emb, rope_cos, rope_sin,
            do_cfg=do_cfg, attention_backend=pipe.attention_backend,
            pos_embedding=pos_embedding,
        )
    )
    final = run(pipe.transformer_params, latents, prompt_embeds)
    if output_type == "latent":
        return final
    return pipe.decode_latents(final)


def generate_i2v(
    pipe,
    prompt: str,
    image: Union[str, np.ndarray],
    ref_latents: Optional[jnp.ndarray] = None,
    height: int = 480,
    width: int = 720,
    num_frames: int = 49,
    num_inference_steps: int = 50,
    guidance_scale: float = 6.0,
    use_dynamic_cfg: bool = False,
    seed: int = 420,
    output_type: str = "np",
):
    """Image-conditioned generation (channel-concat conditioning)."""
    cfg = pipe.transformer_cfg
    key = jax.random.PRNGKey(seed)
    k_lat, k_img, k_ref = jax.random.split(key, 3)
    do_cfg = guidance_scale > 1.0

    prompt_embeds = pipe.encode_prompt(prompt, do_cfg=do_cfg).astype(cfg.dtype)
    sc = pipe.vae_cfg.spatial_compression_ratio
    f_lat = (num_frames - 1) // pipe.vae_cfg.temporal_compression_ratio + 1
    h_lat, w_lat = height // sc, width // sc

    cond = prepare_i2v_cond_latents(pipe, image, f_lat, k_img).astype(cfg.dtype)
    if ref_latents is None:
        # subject stream: reuse the conditioning image by default
        ref_latents = pipe.encode_ref_image(image, k_ref)
    ref_latents = ref_latents.astype(cfg.dtype)
    if ref_latents.shape[-1] < cfg.in_channels:
        # I2V checkpoints patch-embed 2x channels (noise | cond); the subject
        # stream goes through the same conv, so zero-pad its latent channels
        pad_c = cfg.in_channels - ref_latents.shape[-1]
        ref_latents = jnp.concatenate(
            [ref_latents, jnp.zeros((*ref_latents.shape[:-1], pad_c), ref_latents.dtype)], axis=-1
        )

    # noise channels = transformer in_channels minus the conditioning half
    noise_ch = cfg.in_channels - cond.shape[-1]
    latents = jax.random.normal(k_lat, (1, f_lat, h_lat, w_lat, noise_ch), jnp.float32).astype(cfg.dtype)

    rope_cos, rope_sin = pipe.prepare_rope(height, width, f_lat)
    schedule = DenoiseSchedule.create(
        pipe.scheduler_cfg, num_inference_steps, guidance_scale, use_dynamic_cfg
    )
    run = jax.jit(
        lambda p, lat, ref, emb, c: denoise(
            p, cfg, schedule, lat, ref, emb, rope_cos, rope_sin,
            do_cfg=do_cfg, attention_backend=pipe.attention_backend, cond_latents=c,
        )
    )
    final = run(pipe.transformer_params, latents, ref_latents, prompt_embeds, cond)
    if output_type == "latent":
        return final
    return pipe.decode_latents(final)


def generate_fun_control(
    pipe,
    prompt: str,
    control_video: Union[np.ndarray, jnp.ndarray],  # [T, H, W, 3] in [-1, 1]
    ref_image: Union[str, np.ndarray, None] = None,
    num_inference_steps: int = 50,
    guidance_scale: float = 6.0,
    use_dynamic_cfg: bool = False,
    seed: int = 420,
    output_type: str = "np",
):
    """Control-video conditioned generation (reference
    pipeline_cogvideox_fun_control.py, stock/unused in the release): the
    control video's VAE latents are channel-concatenated at *every* frame
    (unlike I2V's frame-0-only conditioning)."""
    cfg = pipe.transformer_cfg
    key = jax.random.PRNGKey(seed)
    k_lat, k_ctl, k_ref = jax.random.split(key, 3)
    do_cfg = guidance_scale > 1.0

    control_video = jnp.asarray(control_video)
    if control_video.ndim == 4:
        control_video = control_video[None]
    height, width = int(control_video.shape[2]), int(control_video.shape[3])
    num_frames = int(control_video.shape[1])

    prompt_embeds = pipe.encode_prompt(prompt, do_cfg=do_cfg).astype(cfg.dtype)
    moments = vae_encode(pipe.vae_params, pipe.vae_cfg, control_video.astype(pipe.vae_cfg.dtype))
    noise_post = jax.random.normal(
        k_ctl, moments.shape[:-1] + (moments.shape[-1] // 2,), jnp.float32
    ).astype(moments.dtype)
    cond = (gaussian_sample(moments, noise_post) * pipe.vae_cfg.scaling_factor).astype(cfg.dtype)

    if ref_image is None:
        ref_image = np.asarray(control_video[0, 0])
    ref_latents = pipe.encode_ref_image(ref_image, k_ref).astype(cfg.dtype)
    if ref_latents.shape[-1] < cfg.in_channels:
        pad_c = cfg.in_channels - ref_latents.shape[-1]
        ref_latents = jnp.concatenate(
            [ref_latents, jnp.zeros((*ref_latents.shape[:-1], pad_c), ref_latents.dtype)], axis=-1
        )

    f_lat = cond.shape[1]
    noise_ch = cfg.in_channels - cond.shape[-1]
    sc = pipe.vae_cfg.spatial_compression_ratio
    latents = jax.random.normal(
        k_lat, (1, f_lat, height // sc, width // sc, noise_ch), jnp.float32
    ).astype(cfg.dtype)

    rope_cos, rope_sin = pipe.prepare_rope(height, width, f_lat)
    schedule = DenoiseSchedule.create(
        pipe.scheduler_cfg, num_inference_steps, guidance_scale, use_dynamic_cfg
    )
    run = jax.jit(
        lambda p, lat, ref, emb, c: denoise(
            p, cfg, schedule, lat, ref, emb, rope_cos, rope_sin,
            do_cfg=do_cfg, attention_backend=pipe.attention_backend, cond_latents=c,
        )
    )
    final = run(pipe.transformer_params, latents, ref_latents, prompt_embeds, cond)
    if output_type == "latent":
        return final
    return pipe.decode_latents(final)


def generate_v2v(
    pipe,
    prompt: str,
    video: Union[np.ndarray, jnp.ndarray],  # [T, H, W, 3] or [B, T, H, W, 3], [-1, 1]
    ref_image: Union[str, np.ndarray, None] = None,
    ref_latents: Optional[jnp.ndarray] = None,
    strength: float = 0.8,
    num_inference_steps: int = 50,
    guidance_scale: float = 6.0,
    use_dynamic_cfg: bool = False,
    seed: int = 420,
    output_type: str = "np",
):
    """Video-to-video: partial re-noising controlled by ``strength``."""
    cfg = pipe.transformer_cfg
    key = jax.random.PRNGKey(seed)
    k_init, k_ref = jax.random.split(key)
    do_cfg = guidance_scale > 1.0

    video = jnp.asarray(video)
    if video.ndim == 4:
        video = video[None]
    height, width = int(video.shape[2]), int(video.shape[3])

    prompt_embeds = pipe.encode_prompt(prompt, do_cfg=do_cfg).astype(cfg.dtype)
    schedule = DenoiseSchedule.create(
        pipe.scheduler_cfg, num_inference_steps, guidance_scale, use_dynamic_cfg
    ).truncate(strength)

    latents = prepare_v2v_latents(pipe, video, schedule, k_init).astype(cfg.dtype)
    f_lat = latents.shape[1]

    if ref_latents is None:
        if ref_image is None:
            # subject stream defaults to the input video's first frame
            ref_image = np.asarray(video[0, 0])
        ref_latents = pipe.encode_ref_image(ref_image, k_ref)
    ref_latents = ref_latents.astype(cfg.dtype)

    rope_cos, rope_sin = pipe.prepare_rope(height, width, f_lat)
    run = jax.jit(
        lambda p, lat, ref, emb: denoise(
            p, cfg, schedule, lat, ref, emb, rope_cos, rope_sin,
            do_cfg=do_cfg, attention_backend=pipe.attention_backend,
        )
    )
    final = run(pipe.transformer_params, latents, ref_latents, prompt_embeds)
    if output_type == "latent":
        return final
    return pipe.decode_latents(final)
