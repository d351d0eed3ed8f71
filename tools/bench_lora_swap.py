"""Measure LoRA hot-swap latency at the real 5b scale on the TPU.

Fabricates a full-size (42-layer, 3072-dim) random transformer snapshot
on disk (bf16, ~11 GB) + a rank-128 adapter over the reference's 9
target families, then times on the chip:

  1. from_pretrained         — cold load (disk -> host convert -> HBM)
  2. load_lora(adapter)      — first merge swap: snapshot re-read + merge
                               + upload
  3. load_lora(None/adapter) — cached merge swaps: merge + upload only
                               (the base host tree is kept after swap #1)
  4. mode="runtime"          — factor attach (disk read + ~0.4 GB upload),
                               cached re-attach (~0 s), detach

Also validates the never-two-trees-in-HBM ordering at scale: a 16 GB
chip cannot hold 2 x 11.1 GB, so a regression in the free-before-upload
ordering OOMs here — and that base + runtime factors co-fit.

S2V_SWAP_BENCH_STEP=1 additionally times a flagship-geometry denoise
step with vs without the runtime factors attached (the <0.5% per-step
overhead claim; costs two extra compiles).

Usage: python tools/bench_lora_swap.py [workdir]  (needs ~14 GB disk)
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fabricate(workdir: str) -> tuple:
    """Write the 5b-shape snapshot + rank-128 adapter (host side)."""
    import jax

    import ml_dtypes
    from s2v_tpu.config import SchedulerConfig, TransformerConfig, VAEConfig
    from s2v_tpu.loaders.export_hf import (
        config_json,
        transformer_state_dict,
        vae_state_dict,
    )
    from s2v_tpu.loaders.safetensors_io import save_safetensors
    from s2v_tpu.models.transformer import init_transformer_params
    from s2v_tpu.models.vae import init_vae_params
    from make_tiny_snapshot import lora_checkpoint  # noqa: E402
    import json

    snap = os.path.join(workdir, "snapshot_5b")
    lora = os.path.join(workdir, "lora_5b")
    if os.path.exists(os.path.join(snap, "transformer", "model.safetensors")):
        return snap, lora  # reuse a previous fabrication

    tcfg = TransformerConfig.cogvideox_5b()
    # tiny VAE with matching latent channels: from_pretrained needs a vae/
    # dir, but only the transformer matters for swap timing
    vcfg = VAEConfig.tiny(latent_channels=tcfg.in_channels)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        t0 = time.perf_counter()
        params = init_transformer_params(jax.random.PRNGKey(0), tcfg)
        sd = transformer_state_dict(params, tcfg)
        del params
        sd = {k: np.asarray(v).astype(ml_dtypes.bfloat16) for k, v in sd.items()}
        print(f"# fabricated 5b state dict in {time.perf_counter() - t0:.0f}s "
              f"({sum(v.nbytes for v in sd.values()) / 1e9:.1f} GB bf16)")

        d = os.path.join(snap, "transformer")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(config_json(tcfg), f, indent=1)
        t0 = time.perf_counter()
        save_safetensors(sd, os.path.join(d, "model.safetensors"))
        print(f"# snapshot written in {time.perf_counter() - t0:.0f}s")
        del sd

        d = os.path.join(snap, "vae")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(config_json(vcfg), f, indent=1)
        save_safetensors(
            vae_state_dict(init_vae_params(jax.random.PRNGKey(1), vcfg), vcfg),
            os.path.join(d, "model.safetensors"),
        )
        os.makedirs(os.path.join(snap, "scheduler"), exist_ok=True)
        with open(os.path.join(snap, "scheduler", "scheduler_config.json"), "w") as f:
            json.dump(config_json(SchedulerConfig(), skip=()), f, indent=1)

        os.makedirs(lora, exist_ok=True)
        save_safetensors(
            lora_checkpoint(tcfg, rank=128),
            os.path.join(lora, "pytorch_lora_weights_transformer.safetensors"),
        )
    return snap, lora


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/s2v_swap_bench"
    os.makedirs(workdir, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    snap, lora = fabricate(workdir)

    import jax

    from s2v_tpu.pipelines.s2v import S2VPipeline

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}")

    t0 = time.perf_counter()
    pipe = S2VPipeline.from_pretrained(snap)
    jax.block_until_ready(pipe.transformer_params)
    t_load = time.perf_counter() - t0
    print(f"from_pretrained (cold): {t_load:7.1f} s")

    t0 = time.perf_counter()
    pipe.load_lora(lora)  # first swap: disk re-read + merge + upload
    jax.block_until_ready(pipe.transformer_params)
    t_first = time.perf_counter() - t0
    print(f"load_lora first swap:   {t_first:7.1f} s (snapshot re-read + merge + upload)")

    for label, ckpt in (("-> base", None), ("-> adapter", lora)):
        t0 = time.perf_counter()
        pipe.load_lora(ckpt)
        jax.block_until_ready(pipe.transformer_params)
        print(f"load_lora cached {label:10s}: {time.perf_counter() - t0:7.1f} s "
              f"(merge + upload only)")

    # runtime mode: factors ride inside the params pytree; base kernels
    # untouched.  Unwinds the merged adapter first (one more cached merge).
    t0 = time.perf_counter()
    pipe.load_lora(lora, mode="runtime")
    jax.block_until_ready(pipe.transformer_params)
    print(f"runtime attach (first):  {time.perf_counter() - t0:7.1f} s "
          f"(incl. merged-adapter unwind + factor disk read + upload)")
    t0 = time.perf_counter()
    pipe.load_lora(None, mode="runtime")
    print(f"runtime detach:          {time.perf_counter() - t0:7.3f} s")
    t0 = time.perf_counter()
    pipe.load_lora(lora, mode="runtime")
    print(f"runtime re-attach cached:{time.perf_counter() - t0:7.3f} s")

    if os.environ.get("S2V_SWAP_BENCH_STEP") == "1":
        _bench_step_overhead(pipe)

    if os.environ.get("S2V_SWAP_BENCH_KEEP") != "1":
        shutil.rmtree(workdir, ignore_errors=True)


def _bench_step_overhead(pipe):
    """Flagship-geometry transformer forward with vs without the attached
    runtime factors (CFG-batched B=2, S=19126, pallas backend)."""
    import jax
    import jax.numpy as jnp

    from s2v_tpu.models.transformer import RUNTIME_LORA_KEY, transformer_forward
    from s2v_tpu.ops.rope import build_segmented_rope, prepare_video_and_ref_rope

    cfg = pipe.transformer_cfg
    vc, vs, rc, rs = prepare_video_and_ref_rope(480, 720, 13, cfg.attention_head_dim,
                                                cfg.patch_size, 8)
    cos, sin = build_segmented_rope(cfg.max_text_seq_length, rc, rs, vc, vs)
    k = jax.random.PRNGKey(0)
    video = jax.random.normal(k, (2, 13, 60, 90, cfg.in_channels), cfg.dtype)
    ref = jax.random.normal(k, (2, 1, 60, 90, cfg.in_channels), cfg.dtype)
    text = jax.random.normal(k, (2, cfg.max_text_seq_length, cfg.text_embed_dim), cfg.dtype)
    t = jnp.array([500, 500])

    fwd = jax.jit(lambda p: transformer_forward(
        p, cfg, video, ref, text, t, cos, sin, attention_backend="pallas"))

    assert RUNTIME_LORA_KEY in pipe.transformer_params
    for label in ("with runtime lora", "base (detached)  "):
        out = fwd(pipe.transformer_params)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fwd(pipe.transformer_params)
        jax.block_until_ready(out)
        print(f"forward {label}: {(time.perf_counter() - t0) / 3:7.3f} s/step")
        pipe.load_lora(None, mode="runtime")


if __name__ == "__main__":
    main()
