"""Dry-run of the real-weight parity on-ramp (VERDICT r4 #5): the exact
``make parity MODEL_DIR=... LORA_DIR=... DUMP=...`` path, exercised on a
tiny HF-layout snapshot with a self-consistent reference dump — so the
moment a real checkpoint + torch dump arrive by disk, the command is known
to work end to end (load -> LoRA merge -> replay from imported tensors ->
per-stage drift -> PSNR).
"""

import io
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # from_pretrained + jitted denoise, ~1 min


def test_parity_onramp_dry_run(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import jax
    import jax.numpy as jnp

    from make_tiny_snapshot import make_snapshot

    snap = str(tmp_path / "snapshot")
    lora = str(tmp_path / "lora")
    make_snapshot(snap, lora_out=lora)

    # Build the self-consistent "reference" dump with the same pipeline the
    # harness will reconstruct (real usage: these tensors come from the
    # torch stack — tools/parity_dump.py docstring's key contract).
    from s2v_tpu.loaders.safetensors_io import save_safetensors
    from s2v_tpu.pipelines.denoise import DenoiseSchedule, make_segmented_denoise
    from s2v_tpu.pipelines.s2v import S2VPipeline

    pipe = S2VPipeline.from_pretrained(snap, lora_checkpoint=lora)
    tc = pipe.transformer_cfg
    B, F, h, w = 1, 2, 4, 4
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (B, F, h, w, tc.in_channels), jnp.float32)
    ref = jax.random.normal(jax.random.PRNGKey(1), (B, 1, h, w, tc.in_channels), jnp.float32)
    emb = jax.random.normal(
        jax.random.PRNGKey(2), (2 * B, tc.max_text_seq_length, tc.text_embed_dim),
        jnp.float32,
    )
    sc = pipe.vae_cfg.spatial_compression_ratio
    cos, sin = pipe.prepare_rope(h * sc, w * sc, F)
    sched = DenoiseSchedule.create(pipe.scheduler_cfg, 1, 6.0)
    run = make_segmented_denoise(None, tc, sched, cos, sin, do_cfg=True)
    carry = (lat.astype(tc.dtype), jnp.zeros_like(lat, tc.dtype))
    carry = run(pipe.transformer_params, carry,
                ref.astype(tc.dtype), emb.astype(tc.dtype), None, 0, 1)
    frames = pipe.decode_latents(carry[0])

    dump_path = str(tmp_path / "reference_dump.safetensors")
    save_safetensors(
        {
            # ours [B,F,h,w,C] -> torch layout [B,F,C,h,w]
            "inputs::latents": np.asarray(lat).transpose(0, 1, 4, 2, 3),
            "inputs::ref_latents": np.asarray(ref).transpose(0, 1, 4, 2, 3),
            "inputs::prompt_embeds": np.asarray(emb),
            "latents::step0": np.asarray(carry[0], np.float32).transpose(0, 1, 4, 2, 3),
            "frames::final": np.asarray(frames, np.float32),
        },
        dump_path,
    )

    # The exact `make parity` entry point, in-process.
    import parity_dump

    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        parity_dump.main([
            "--model_dir", snap, "--lora_dir", lora,
            "--reference_dump", dump_path, "--num_inference_steps", "1",
        ])
    finally:
        sys.stdout = stdout
    out = buf.getvalue()
    assert "done" in out, out
    # self-consistent replay: zero drift at every compared stage + the PSNR
    # line present (inf for identical frames)
    for line in out.splitlines():
        if "max|d|" in line:
            mx = float(line.split("max|d|=")[1].split()[0])
            assert mx < 1e-5, line
    assert "PSNR" in out, out
