"""Product-path hardware check: S2VPipeline.generate at the flagship
geometry on the real chip (random 5b weights, no snapshot needed).

Validates what bench.py's raw loop does not: the pipeline's backend
resolution (auto -> pallas), the segmented runner + compiled cache, the
HBM guard bypass, and the decode integration — end to end on TPU.

    python tools/e2e_tpu_check.py [--steps 50] [--segment 6] [--clips 1]

``--clips 2`` generates a second clip (new noise/prompt embeddings) in the
same process: clip 1 is the cold number (denoise + decode compiles), clip
2 is the WARM serving latency — the per-request cost of a resident daemon
(compiled-loop cache hit, decode program cached).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--segment", type=int, default=6,
                    help="segment size (the relay caps single executions ~60 s)")
    ap.add_argument("--clips", type=int, default=1,
                    help="clips to generate; clip 2+ measure the warm serving path")
    args = ap.parse_args()

    from s2v_tpu.config import TransformerConfig, VAEConfig
    from s2v_tpu.models.transformer import init_transformer_params_stacked
    from s2v_tpu.models.vae import init_vae_params
    from s2v_tpu.pipelines.s2v import S2VPipeline

    cfg = TransformerConfig.cogvideox_5b()
    vcfg = VAEConfig()
    t0 = time.perf_counter()
    # jit the inits: one compiled program + one dispatch each — per-leaf
    # eager init is hundreds of relay round-trips (measured ~1 s each on a
    # degraded relay: 489 s for the VAE's 436 leaves)
    t_params = jax.jit(
        lambda k: init_transformer_params_stacked(k, cfg)
    )(jax.random.PRNGKey(0))
    v_params = jax.jit(lambda k: init_vae_params(k, vcfg))(jax.random.PRNGKey(1))
    pipe = S2VPipeline(
        transformer_params=t_params,
        transformer_cfg=cfg,
        vae_params=v_params,
        vae_cfg=vcfg,
    )
    pipe.set_attention("auto")
    print(f"init {time.perf_counter() - t0:.1f}s; backend={pipe.attention_backend} "
          f"(auto-resolved on {jax.default_backend()})", flush=True)
    assert pipe.attention_backend == "pallas"

    times = []
    for clip in range(args.clips):
        emb = jax.random.normal(
            jax.random.PRNGKey(2 + 10 * clip),
            (2, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32,
        ).astype(cfg.dtype)
        ref = jax.random.normal(
            jax.random.PRNGKey(3 + 10 * clip), (1, 1, 60, 90, cfg.in_channels), jnp.float32
        )

        t1 = time.perf_counter()
        video = pipe.generate(
            prompt_embeds=emb, ref_latents=ref, height=480, width=720,
            num_frames=49, num_inference_steps=args.steps, guidance_scale=6.0,
            use_dynamic_cfg=True, segment_steps=args.segment,
            callback_on_segment_end=lambda i, lat: print(
                f"  step {i}/{args.steps} (+{time.perf_counter() - t1:.0f}s)", flush=True
            ) or True,
            output_type="np",
        )
        dt = time.perf_counter() - t1
        times.append(dt)
        assert video.shape == (1, 49, 480, 720, 3), video.shape
        assert np.isfinite(video).all()
        label = "cold" if clip == 0 else "warm"
        print(f"PRODUCT PATH OK (clip {clip + 1}, {label}): {video.shape} in "
              f"{dt:.1f}s ({args.steps / dt:.3f} steps/s incl. decode)", flush=True)
    if len(times) > 1:
        print(f"warm serving latency: {min(times[1:]):.1f} s/clip "
              f"(cold first clip {times[0]:.1f} s)", flush=True)


if __name__ == "__main__":
    main()
