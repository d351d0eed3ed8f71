"""The CFG-batched denoising loop as ONE jittable XLA program.

Parity target: the reference hot loop ``CustomCogVideoXPipeline.__call__``
(src/custom_cogvideox_pipe.py:237-311): per step — duplicate latents for
CFG, transformer forward with the ref stream duplicated into the uncond
branch (``eval=True``, cogvideox_transformer_3d.py:503-504), fp32 noise
prediction, static or dynamic-cosine guidance mix (loop-*index* based,
:269-274), DDIM or DPM update, bf16 re-cast of latents (:296).

TPU-first shape: the reference drives 50 Python iterations of kernel
launches; here the whole loop is a single ``lax.fori_loop`` inside one jit —
no host round-trips, schedule tables and guidance scales precomputed as
arrays indexed by the loop counter, DPM noise drawn with ``fold_in`` keys.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from s2v_tpu.config import SchedulerConfig, TransformerConfig
from s2v_tpu.models.transformer import transformer_forward
from s2v_tpu.schedulers.ddim import alpha_pair_for_step, compute_alphas_cumprod, ddim_step, get_timesteps
from s2v_tpu.schedulers.dpm import dpm_multipliers, dpm_step


def guidance_schedule(
    guidance_scale: float, num_steps: int, use_dynamic_cfg: bool
) -> np.ndarray:
    """Per-step guidance scales (reference :269-274; dynamic schedule uses
    the loop index, not the timestep value — n.b. this deliberately differs
    from the stock pipeline's ``t.item()`` variant)."""
    if not use_dynamic_cfg:
        return np.full(num_steps, guidance_scale, np.float32)
    i = np.arange(num_steps, dtype=np.float64)
    g = 1.0 + guidance_scale * (
        (1.0 - np.cos(math.pi * ((num_steps - i) / num_steps) ** 5.0)) / 2.0
    )
    return g.astype(np.float32)


@dataclass(frozen=True)
class DenoiseSchedule:
    """Host-precomputed per-step tables for the jitted loop."""

    timesteps: np.ndarray  # [N] int
    alpha_t: np.ndarray  # [N]
    alpha_prev: np.ndarray  # [N]
    guidance: np.ndarray  # [N]
    prediction_type: str
    use_dpm: bool = False
    dpm_mults: Optional[dict] = None  # dict of [N] arrays
    guidance_scale: float = 6.0  # kept for truncate() recomputation
    use_dynamic_cfg: bool = False

    @classmethod
    def create(
        cls,
        scheduler_cfg: SchedulerConfig,
        num_inference_steps: int,
        guidance_scale: float,
        use_dynamic_cfg: bool = False,
        use_dpm: bool = False,
    ) -> "DenoiseSchedule":
        ac = compute_alphas_cumprod(scheduler_cfg)
        ts = get_timesteps(scheduler_cfg, num_inference_steps)
        a_t, a_prev = alpha_pair_for_step(
            ac, ts, scheduler_cfg.num_train_timesteps, num_inference_steps,
            scheduler_cfg.set_alpha_to_one,
        )
        mults = (
            dpm_multipliers(ac, ts, scheduler_cfg.num_train_timesteps, num_inference_steps,
                            scheduler_cfg.set_alpha_to_one)
            if use_dpm
            else None
        )
        return cls(
            timesteps=ts,
            alpha_t=a_t,
            alpha_prev=a_prev,
            guidance=guidance_schedule(guidance_scale, num_inference_steps, use_dynamic_cfg),
            prediction_type=scheduler_cfg.prediction_type,
            use_dpm=use_dpm,
            dpm_mults=mults,
            guidance_scale=guidance_scale,
            use_dynamic_cfg=use_dynamic_cfg,
        )

    def truncate(self, strength: float) -> "DenoiseSchedule":
        """V2V partial denoising: keep the last ``strength`` fraction of
        steps (reference get_timesteps, pipeline_cogvideox_video2video.py
        :408-415)."""
        n = len(self.timesteps)
        init_timestep = min(int(n * strength), n)
        t_start = max(n - init_timestep, 0)
        dpm_mults = None
        if self.dpm_mults:
            dpm_mults = {k: v[t_start:].copy() for k, v in self.dpm_mults.items()}
            if len(dpm_mults["has_back"]):
                # the first *executed* step has no previous x0 prediction
                # (reference v2v loop starts with old_pred_original_sample=None)
                dpm_mults["has_back"][0] = 0.0
        n_new = n - t_start
        return dataclasses.replace(
            self,
            timesteps=self.timesteps[t_start:],
            alpha_t=self.alpha_t[t_start:],
            alpha_prev=self.alpha_prev[t_start:],
            # the reference's v2v loop enumerates the *truncated* timesteps
            # with the reduced step count, so the dynamic schedule is
            # recomputed over n_new rather than sliced
            guidance=guidance_schedule(self.guidance_scale, n_new, self.use_dynamic_cfg),
            dpm_mults=dpm_mults,
        )


def _build_step_fn(
    params,
    cfg: TransformerConfig,
    schedule: DenoiseSchedule,
    ref_latents,
    prompt_embeds,
    rope_cos,
    rope_sin,
    do_cfg,
    rng_key,
    attention_backend,
    pos_embedding,
    cfg_mode,
    cond_latents,
    cfg_skip_threshold: float = 0.0,
):
    """Shared per-step body for the fused and segmented loops.

    CFG: the ref tokens are duplicated into the uncond branch too (reference
    ``eval=True`` path).  "batched" runs uncond|cond as one 2B forward
    (reference semantics, best for dp>=2 meshes); "sequential" runs them as
    two B forwards — identical math and FLOPs, half the activation memory
    (the single-chip configuration for the 5B model).
    """
    eps_fn, update_fn = _build_eps_update_fns(
        params, cfg, schedule, ref_latents, prompt_embeds, rope_cos, rope_sin,
        do_cfg, rng_key, attention_backend, pos_embedding, cfg_mode, cond_latents,
        cfg_skip_threshold,
    )

    def step(i, carry):
        latents, old_x0 = carry
        return update_fn(i, latents, old_x0, eps_fn(i, latents))

    return step


def _build_eps_update_fns(
    params,
    cfg: TransformerConfig,
    schedule: DenoiseSchedule,
    ref_latents,
    prompt_embeds,
    rope_cos,
    rope_sin,
    do_cfg,
    rng_key,
    attention_backend,
    pos_embedding,
    cfg_mode,
    cond_latents,
    cfg_skip_threshold: float = 0.0,
):
    """The step body split into ``eps_fn(i, latents) -> noise_pred`` (the
    CFG-mixed transformer forward) and ``update_fn(i, latents, old_x0,
    noise_pred) -> (new_latents, x0)`` (the scheduler update) — separated so
    the adaptive loop can skip the forward while still stepping."""
    timesteps = jnp.asarray(schedule.timesteps, jnp.int32)
    alpha_t = jnp.asarray(schedule.alpha_t)
    alpha_prev = jnp.asarray(schedule.alpha_prev)
    guidance = jnp.asarray(schedule.guidance)
    dpm_mults = (
        {k: jnp.asarray(v) for k, v in schedule.dpm_mults.items()} if schedule.use_dpm else None
    )
    key = rng_key if rng_key is not None else jax.random.PRNGKey(0)

    batched_cfg = do_cfg and cfg_mode == "batched"
    # ref_latents=None: no-ref T2V mode (zero-width ref stream in the
    # transformer — stock CogVideoX semantics)
    ref_in = (
        None if ref_latents is None
        else jnp.concatenate([ref_latents, ref_latents], axis=0) if batched_cfg
        else ref_latents
    )
    if do_cfg and not batched_cfg:
        emb_uncond, emb_cond = jnp.split(prompt_embeds, 2, axis=0)

    def eps_fn(i, latents):
        def fwd(lat_in, emb):
            # ref / timestep batch follow the latent batch (the CFG-skip
            # branch runs a B-sized forward inside a batched-CFG loop)
            ref = (
                None if ref_in is None
                else ref_in if ref_in.shape[0] == lat_in.shape[0]
                else ref_latents
            )
            t = jnp.full((lat_in.shape[0],), timesteps[i], jnp.int32)
            if cond_latents is not None:
                # I2V conditioning: image latents (frame-0 + zero padding)
                # concatenated channel-wise each step (reference
                # pipeline_cogvideox_image2video.py:382-391, loop :744)
                cond = cond_latents
                if lat_in.shape[0] != cond.shape[0]:
                    cond = jnp.concatenate([cond, cond], axis=0)
                lat_in = jnp.concatenate([lat_in, cond.astype(lat_in.dtype)], axis=-1)
            return transformer_forward(
                params, cfg, lat_in, ref, emb, t, rope_cos, rope_sin,
                pos_embedding=pos_embedding, attention_backend=attention_backend,
            ).astype(jnp.float32)

        if do_cfg and cfg_skip_threshold > 0.0:
            # CFG-skip fast path (opt-in): under the dynamic-cosine schedule
            # (reference :269-274) guidance decays to 1.0 over the loop, and
            # at g == 1 the mix reduces to the cond prediction exactly —
            # eps = uncond + g (cond - uncond).  When g - 1 < threshold the
            # uncond forward is skipped with error bounded by
            # (g - 1) * |cond - uncond|.  At 50 steps / g=6 the dynamic
            # schedule has g - 1 < 0.01 for the last ~45% of steps.
            skip = guidance[i] - 1.0 < cfg_skip_threshold
            if batched_cfg:
                _, emb_cond_b = jnp.split(prompt_embeds, 2, axis=0)

                def mixed():
                    noise_pred = fwd(
                        jnp.concatenate([latents, latents], axis=0), prompt_embeds
                    )
                    uncond, cond = jnp.split(noise_pred, 2, axis=0)
                    return uncond + guidance[i] * (cond - uncond)

                return jax.lax.cond(skip, lambda: fwd(latents, emb_cond_b), mixed)

            def mixed():
                uncond = fwd(latents, emb_uncond)
                return uncond + guidance[i] * (fwd(latents, emb_cond) - uncond)

            return jax.lax.cond(skip, lambda: fwd(latents, emb_cond), mixed)
        if batched_cfg:
            noise_pred = fwd(jnp.concatenate([latents, latents], axis=0), prompt_embeds)
            uncond, cond = jnp.split(noise_pred, 2, axis=0)
            return uncond + guidance[i] * (cond - uncond)
        if do_cfg:
            uncond = fwd(latents, emb_uncond)
            cond = fwd(latents, emb_cond)
            return uncond + guidance[i] * (cond - uncond)
        return fwd(latents, prompt_embeds)

    def update_fn(i, latents, old_x0, noise_pred):
        if schedule.use_dpm:
            m_i = {k: v[i] for k, v in dpm_mults.items()}
            n1 = jax.random.normal(jax.random.fold_in(key, 2 * i), latents.shape, jnp.float32)
            n2 = jax.random.normal(jax.random.fold_in(key, 2 * i + 1), latents.shape, jnp.float32)
            new_latents, x0 = dpm_step(
                noise_pred, latents, old_x0, n1, m_i, schedule.prediction_type, noise2=n2
            )
        else:
            new_latents, x0 = ddim_step(
                noise_pred, latents, alpha_t[i], alpha_prev[i], schedule.prediction_type
            )
        return new_latents.astype(latents.dtype), x0.astype(latents.dtype)

    return eps_fn, update_fn


def _with_progress(step, n):
    """Wrap a fori_loop step body with the per-step host progress callback
    (shared by the fused, adaptive, and segmented loops)."""

    def wrapped(i, carry):
        jax.debug.callback(_progress_cb, i, n, ordered=False)
        return step(i, carry)

    return wrapped


def _progress_cb(i, n):
    import sys

    i, n = int(i) + 1, int(n)
    sys.stderr.write(f"\r[s2v_tpu] denoise step {i}/{n}")
    if i == n:
        sys.stderr.write("\n")
    sys.stderr.flush()


def denoise(
    params,
    cfg: TransformerConfig,
    schedule: DenoiseSchedule,
    latents: jnp.ndarray,  # [B, F, h, w, C]
    ref_latents: jnp.ndarray,  # [B, 1, h, w, C]
    prompt_embeds: jnp.ndarray,  # [2B, T, text_dim] (uncond | cond) or [B,...] if no CFG
    rope_cos: Optional[jnp.ndarray],
    rope_sin: Optional[jnp.ndarray],
    do_cfg: bool = True,
    rng_key: Optional[jnp.ndarray] = None,
    attention_backend: str = "xla",
    pos_embedding: Optional[jnp.ndarray] = None,  # sincos table (2b models)
    cfg_mode: str = "batched",  # "batched" (one 2B forward) | "sequential"
    cond_latents: Optional[jnp.ndarray] = None,  # I2V: channel-concat condition
    cfg_skip_threshold: float = 0.0,  # >0: skip the uncond forward when g-1 < thr
    progress: bool = False,  # per-step host progress via jax.debug.callback
) -> jnp.ndarray:
    """Run the full denoise loop; returns final latents [B, F, h, w, C].

    Everything here traces into one XLA program; callers jit it (see
    ``S2VPipeline.generate`` / ``__graft_entry__``).

    ``progress=True`` emits the reference's per-step progress (a tqdm bar,
    pipeline_utils.py:1555) from *inside* the fused loop via an unordered
    ``jax.debug.callback`` — no extra host round-trips on the data path.
    On relayed devices that drop host callbacks, use ``segment_steps``
    instead (the host-stepped loop reports per segment).
    """
    step = _build_step_fn(
        params, cfg, schedule, ref_latents, prompt_embeds, rope_cos, rope_sin,
        do_cfg, rng_key, attention_backend, pos_embedding, cfg_mode, cond_latents,
        cfg_skip_threshold,
    )
    n = len(schedule.timesteps)
    if progress:
        step = _with_progress(step, n)
    init = (latents, jnp.zeros_like(latents))
    final, _ = jax.lax.fori_loop(0, n, step, init)
    return final


def denoise_adaptive(
    params,
    cfg: TransformerConfig,
    schedule: DenoiseSchedule,
    latents: jnp.ndarray,
    ref_latents: jnp.ndarray,
    prompt_embeds: jnp.ndarray,
    rope_cos: Optional[jnp.ndarray],
    rope_sin: Optional[jnp.ndarray],
    threshold: float,
    do_cfg: bool = True,
    rng_key: Optional[jnp.ndarray] = None,
    attention_backend: str = "xla",
    pos_embedding: Optional[jnp.ndarray] = None,
    cfg_mode: str = "batched",
    cond_latents: Optional[jnp.ndarray] = None,
    cfg_skip_threshold: float = 0.0,
    progress: bool = False,
):
    """Training-free adaptive step skipping (opt-in serving fast path; NOT
    the reference algorithm — the exact loop is :func:`denoise`).

    Bounded-difference criterion in the spirit of AdaptiveDiffusion
    (arXiv:2410.09873, PAPERS.md): the latent trajectory's third-order
    difference bounds how much the noise prediction is changing; when
    ``mean|Δ²x| < threshold * mean|Δx|`` the transformer forward is skipped
    and the previous (CFG-mixed) prediction is reused — the scheduler still
    advances every step.  Steps 0, 1 and the final step always compute.

    Returns ``(final_latents, n_skipped)``.
    """
    step = _build_adaptive_step_fn(
        params, cfg, schedule, ref_latents, prompt_embeds, rope_cos, rope_sin,
        threshold, do_cfg, rng_key, attention_backend, pos_embedding, cfg_mode,
        cond_latents, cfg_skip_threshold,
    )
    n = len(schedule.timesteps)
    if progress:
        step = _with_progress(step, n)
    init = adaptive_init_carry(latents)
    final, _, _, _, _, skips = jax.lax.fori_loop(0, n, step, init)
    return final, skips


def adaptive_init_carry(latents):
    """Initial carry for the adaptive step: ``(latents, old_x0, prev_eps,
    prev_lat, prev_d1, n_skipped)``.  Shared by the fused loop and the
    host-stepped segmented loop (the state crosses segment boundaries)."""
    zero = jnp.zeros(latents.shape, jnp.float32)
    return (latents, jnp.zeros_like(latents), zero, latents, zero,
            jnp.asarray(0, jnp.int32))


def _build_adaptive_step_fn(
    params,
    cfg: TransformerConfig,
    schedule: DenoiseSchedule,
    ref_latents,
    prompt_embeds,
    rope_cos,
    rope_sin,
    threshold,
    do_cfg,
    rng_key,
    attention_backend,
    pos_embedding,
    cfg_mode,
    cond_latents,
    cfg_skip_threshold: float = 0.0,
):
    """Per-step body of the adaptive (step-skipping) loop over the carry
    from :func:`adaptive_init_carry`; usable in ``fori_loop`` with traced
    bounds, so segments resume mid-trajectory."""
    n = len(schedule.timesteps)
    eps_fn, update_fn = _build_eps_update_fns(
        params, cfg, schedule, ref_latents, prompt_embeds, rope_cos, rope_sin,
        do_cfg, rng_key, attention_backend, pos_embedding, cfg_mode, cond_latents,
        cfg_skip_threshold,
    )
    thr = jnp.asarray(threshold, jnp.float32)

    def step(i, carry):
        lat, old_x0, prev_eps, prev_lat, prev_d1, skips = carry
        d1 = (lat - prev_lat).astype(jnp.float32)
        d2 = jnp.mean(jnp.abs(d1 - prev_d1))
        rel = jnp.mean(jnp.abs(d1))
        skip = jnp.logical_and(
            jnp.logical_and(i >= 2, i < n - 1), d2 < thr * rel
        )
        eps = jax.lax.cond(skip, lambda: prev_eps, lambda: eps_fn(i, lat))
        new_lat, x0 = update_fn(i, lat, old_x0, eps)
        return (new_lat, x0, eps, lat, d1, skips + skip.astype(jnp.int32))

    return step


def make_segmented_denoise(
    params,
    cfg: TransformerConfig,
    schedule: DenoiseSchedule,
    rope_cos,
    rope_sin,
    do_cfg: bool = True,
    rng_key: Optional[jnp.ndarray] = None,
    attention_backend: str = "xla",
    pos_embedding: Optional[jnp.ndarray] = None,
    cfg_mode: str = "batched",
    cond_latents: Optional[jnp.ndarray] = None,
    cfg_skip_threshold: float = 0.0,
    adaptive_threshold: float = 0.0,
    progress: bool = False,
):
    """Host-steppable denoise: returns ``run(params, carry, ref, emb, rng,
    i0, i1)`` — the single segmented-loop runner (generate() drives it for
    interrupt/callback support and on relays that cap single-execution wall
    time).

    One compiled program executes steps ``[i0, i1)`` (bounds and the DPM
    noise rng are traced scalars, so every segment size and seed reuses the
    same executable — critical for serving).  This is the TPU-native shape
    of the reference's cooperative ``interrupt`` flag and
    ``callback_on_step_end`` (custom_cogvideox_pipe.py:242-243, 299-305):
    the host can stop between segments or inspect/modify latents.

    carry = (latents, old_pred_original_sample), or the 6-tuple from
    :func:`adaptive_init_carry` when ``adaptive_threshold > 0`` (the
    adaptive state rides the carry across segment boundaries).  ``params``/
    ``rng_key`` given here are defaults; the returned runner's leading
    ``params``/``rng`` arguments take precedence when not None.
    """
    default_params, default_rng = params, rng_key

    @jax.jit
    def run(p, carry, ref_latents, prompt_embeds, rng, i0, i1):
        p = default_params if p is None else p
        rng = default_rng if rng is None else rng
        if adaptive_threshold > 0.0:
            step = _build_adaptive_step_fn(
                p, cfg, schedule, ref_latents, prompt_embeds, rope_cos,
                rope_sin, adaptive_threshold, do_cfg, rng, attention_backend,
                pos_embedding, cfg_mode, cond_latents, cfg_skip_threshold,
            )
        else:
            step = _build_step_fn(
                p, cfg, schedule, ref_latents, prompt_embeds, rope_cos,
                rope_sin, do_cfg, rng, attention_backend, pos_embedding,
                cfg_mode, cond_latents, cfg_skip_threshold,
            )
        if progress:
            step = _with_progress(step, len(schedule.timesteps))
        return jax.lax.fori_loop(i0, i1, step, carry)

    return run
