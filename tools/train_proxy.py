"""Train a structured-weight proxy for the turbo quality gate (VERDICT r3 #2b).

Random-init weights produce denoise trajectories rough enough that the
adaptive step-skip criterion never fires and PSNR-vs-exact numbers are
unrepresentative (bench_runs/turbo_quality.json adaptive rows: 0/50 skips
at four thresholds).  This tool full-fine-tunes a production-DIM,
shallow-DEPTH transformer (default 4 layers of the exact 5b block: 48x64
heads, 3072 inner, qk-LN, 3-stream AdaLN) on synthetic structured clips so
the v-prediction field is smooth and conditioned — then the turbo sweep
re-runs on these weights:

    python tools/train_proxy.py                     # chip, ~20-40 min
    S2V_TURBO_WEIGHTS=bench_runs/proxy_4l.npz \
    S2V_TURBO_LAYERS=4 python tools/bench_turbo_quality.py

Synthetic data: each "subject" s (of 8) pairs a fixed random prompt
embedding with a procedural latent clip — a sum of low-frequency 3D
Fourier modes (smooth video structure) plus a subject-specific moving
Gaussian blob; the ref latent is the blob at its frame-0 position.  The
model learnably maps (prompt, ref) -> trajectory, which is all the gate
needs: SMOOTH, CONDITIONED denoise dynamics at the real tensor shapes.

Trainer: training/full.py's make_full_train_step (the in-repo FSDP full
fine-tune path, mesh=None single chip, remat on) with the real DDIM
alphas and v-prediction target.  Output: flattened-path npz matching
bench_turbo_quality.py's S2V_TURBO_WEIGHTS loader, plus a loss curve in
the JSON sidecar.

S2V_PROXY_SMOKE=1 runs tiny dims on CPU (CI coverage).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE = bool(os.environ.get("S2V_PROXY_SMOKE"))
LAYERS = int(os.environ.get("S2V_PROXY_LAYERS", "4"))
STEPS = int(os.environ.get("S2V_PROXY_STEPS", "300"))
OUT = os.environ.get(
    "S2V_PROXY_OUT",
    os.path.join(REPO, "bench_runs", f"proxy_{LAYERS}l.npz"),
)


def synth_batch(np, rng, n_subjects, F, H, W, C, step):
    """Procedural structured latents: low-freq Fourier field + moving blob."""
    s = step % n_subjects
    r = np.random.RandomState(1000 + s)
    # smooth field: 6 random low-frequency modes, fixed per subject
    t = np.arange(F)[:, None, None]
    y = np.arange(H)[None, :, None]
    x = np.arange(W)[None, None, :]
    field = np.zeros((F, H, W, C), np.float32)
    for _ in range(6):
        ft, fy, fx = r.uniform(0.2, 1.5, 3)
        ph = r.uniform(0, 6.28, 3)
        amp = r.randn(C).astype(np.float32) * 0.5
        wave = np.sin(2 * np.pi * (ft * t / F + ph[0])) * \
               np.sin(2 * np.pi * (fy * y / H + ph[1])) * \
               np.sin(2 * np.pi * (fx * x / W + ph[2]))
        field += wave[..., None] * amp
    # subject blob moving linearly across the clip
    cy0, cx0 = r.uniform(0.2, 0.8, 2)
    vy, vx = r.uniform(-0.3, 0.3, 2)
    sig = 0.12 * min(H, W)
    blob_amp = r.randn(C).astype(np.float32)
    for f in range(F):
        cy = (cy0 + vy * f / max(F - 1, 1)) * H
        cx = (cx0 + vx * f / max(F - 1, 1)) * W
        g = np.exp(-(((np.arange(H)[:, None] - cy) ** 2
                      + (np.arange(W)[None, :] - cx) ** 2) / (2 * sig * sig)))
        field[f] += g[..., None] * blob_amp * 1.5
    field = field / max(field.std(), 1e-6)
    ref = field[:1].copy()
    return s, field[None], ref[None]


def main():
    if not SMOKE:
        from s2v_tpu.cli_utils import probe_backend

        result = probe_backend(int(os.environ.get("S2V_BENCH_INIT_TIMEOUT", "120")))
        if "devices" not in result:
            print(f"# FATAL: backend init failed/timed out: {result}", flush=True)
            os._exit(2)

    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from s2v_tpu.config import SchedulerConfig, TransformerConfig
    from s2v_tpu.models.transformer import init_transformer_params_stacked
    from s2v_tpu.ops.rope import build_segmented_rope, get_3d_rotary_pos_embed, prepare_video_and_ref_rope
    from s2v_tpu.training.full import make_full_train_step
    from s2v_tpu.training.optim import OptimizerSpec

    if SMOKE:
        cfg = TransformerConfig.tiny()
        F, H, W = 2, 8, 8
        steps = 4
        backend = "xla"
        gh, gw = H // 2, W // 2
        cos, sin = get_3d_rotary_pos_embed(
            cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), F + 1
        )
        tok = gh * gw
        cs, sn = build_segmented_rope(
            cfg.max_text_seq_length, cos[:tok], sin[:tok],
            cos[tok : tok * (F + 1)], sin[tok : tok * (F + 1)],
        )
    else:
        cfg = TransformerConfig.cogvideox_5b(num_layers=LAYERS)
        F, H, W = 13, 60, 90
        steps = STEPS
        backend = "pallas"
        vc, vs, rc, rs = prepare_video_and_ref_rope(480, 720, F, cfg.attention_head_dim)
        cs, sn = build_segmented_rope(cfg.max_text_seq_length, rc, rs, vc, vs)

    n_subjects = 8
    prompt_bank = np.random.RandomState(7).randn(
        n_subjects, cfg.max_text_seq_length, cfg.text_embed_dim
    ).astype(np.float32)

    params = init_transformer_params_stacked(jax.random.PRNGKey(0), cfg)
    master = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    del params
    prep, init_opt, train_step = make_full_train_step(
        cfg, SchedulerConfig(), OptimizerSpec(learning_rate=2e-5),
        attention_backend=backend, remat=True,
        # mixed precision: fp32 master + bf16 forward — fp32 activations at
        # flagship geometry blow the compile-time HBM budget even at 4 layers
        compute_dtype=None if SMOKE else jnp.bfloat16,
    )
    fparams = prep(master)
    del master
    opt = init_opt(fparams)
    jax.block_until_ready(jax.tree.leaves(fparams)[0])

    rng = np.random.RandomState(0)
    losses = []
    t0 = time.perf_counter()
    for step in range(steps):
        sid, clip, ref = synth_batch(np, rng, n_subjects, F, H, W, cfg.in_channels, step)
        batch = {
            "video_latents": jnp.asarray(clip),
            "ref_latents": jnp.asarray(ref),
            "text_embeds": jnp.asarray(prompt_bank[sid][None]),
            "rope_cos": cs,
            "rope_sin": sn,
        }
        fparams, opt, loss = train_step(fparams, opt, batch, jax.random.PRNGKey(step))
        if step % 10 == 0 or step == steps - 1:
            losses.append({"step": step, "loss": round(float(loss), 5)})
            print(f"# step {step}: loss={float(loss):.5f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)

    # save flattened-path npz (the bench_turbo_quality S2V_TURBO_WEIGHTS
    # format); cast to the sweep's compute dtype on the host
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(fparams)[0]:
        kp = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[kp] = np.asarray(leaf, np.float32)
    # the sweep conditions on embeddings the proxy was TRAINED on
    # (bench_turbo_quality reads this reserved key)
    flat["__prompt_bank__"] = prompt_bank
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, **flat)
    with open(OUT + ".json", "w") as f:
        json.dump({"layers": cfg.num_layers, "steps": steps,
                   "geometry": f"F={F} {H}x{W}", "n_subjects": n_subjects,
                   "losses": losses}, f, indent=1)
    print(json.dumps({"out": OUT, "final_loss": losses[-1]["loss"],
                      "first_loss": losses[0]["loss"]}))


if __name__ == "__main__":
    main()
