"""save_pretrained: export the pipeline back to the reference HF snapshot
layout and round-trip it through from_pretrained."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # builds tiny pipelines (jit-heavy)


def test_save_pretrained_roundtrip(tmp_path):
    from s2v_tpu.pipelines.s2v import S2VPipeline
    from s2v_tpu.testing import tiny_generate_kwargs, tiny_pipeline

    pipe = tiny_pipeline()
    out = str(tmp_path / "snapshot")
    pipe.save_pretrained(out)

    re = S2VPipeline.from_pretrained(out, dtype=jnp.float32)
    # identical weights through the export -> load inversion pair
    for a, b in zip(
        jax.tree.leaves(pipe.transformer_params), jax.tree.leaves(re.transformer_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree.leaves(pipe.vae_params), jax.tree.leaves(re.vae_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    if pipe.t5_params is not None:
        assert re.t5_params is not None
        for a, b in zip(jax.tree.leaves(pipe.t5_params), jax.tree.leaves(re.t5_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # identical generations (the product-level statement of the round trip)
    kw = tiny_generate_kwargs(pipe, num_inference_steps=1, output_type="latent")
    np.testing.assert_allclose(
        np.asarray(pipe.generate(**kw)), np.asarray(re.generate(**kw)),
        atol=1e-5, rtol=1e-5,
    )


def test_save_pretrained_rejects_int8(tmp_path):
    from s2v_tpu.ops.quant import quantize_transformer_params
    from s2v_tpu.testing import tiny_pipeline

    pipe = tiny_pipeline()
    pipe.transformer_params = quantize_transformer_params(pipe.transformer_params)
    with pytest.raises(ValueError, match="int8-quantized"):
        pipe.save_pretrained(str(tmp_path / "snap"))


def test_save_pretrained_bfloat16_dtype(tmp_path):
    """dtype="bfloat16" writes hub-sized snapshots that still load."""
    import ml_dtypes
    from safetensors import numpy as stn

    from s2v_tpu.pipelines.s2v import S2VPipeline
    from s2v_tpu.testing import tiny_pipeline

    pipe = tiny_pipeline()
    out = str(tmp_path / "snap_bf16")
    pipe.save_pretrained(out, dtype="bfloat16")

    sd = stn.load_file(f"{out}/transformer/diffusion_pytorch_model.safetensors")
    assert all(v.dtype == ml_dtypes.bfloat16 for v in sd.values())

    re = S2VPipeline.from_pretrained(out, dtype=jnp.float32)
    for a, b in zip(
        jax.tree.leaves(pipe.transformer_params), jax.tree.leaves(re.transformer_params)
    ):
        a = np.asarray(a)
        np.testing.assert_allclose(
            a.astype(ml_dtypes.bfloat16).astype(np.float32), np.asarray(b),
            atol=0, rtol=0,  # exactly the bf16-rounded weights
        )


_REF_DIFFUSERS = "/root/reference/diffusers/src"


@pytest.mark.skipif(
    not os.path.isdir(_REF_DIFFUSERS), reason="reference diffusers not present"
)
def test_exported_snapshot_loads_in_reference_stack(tmp_path):
    """The exported snapshot must be consumable by the REFERENCE stack's
    DiffusionPipeline.from_pretrained (model_index.json + _class_name
    configs + diffusers weight filenames), not just by this framework.
    Runs the vendored torch diffusers in a subprocess (its import leaks
    global state we don't want in this process)."""
    import subprocess
    import sys as _sys

    from s2v_tpu.models.transformer import init_transformer_params
    from s2v_tpu.testing import tiny_pipeline

    pipe = tiny_pipeline()
    out = str(tmp_path / "snap_ref")
    pipe.save_pretrained(out)

    code = f"""
import sys
sys.path.insert(0, {_REF_DIFFUSERS!r})
from diffusers import (
    AutoencoderKLCogVideoX, CogVideoXDDIMScheduler, CogVideoXTransformer3DModel,
)
tr = CogVideoXTransformer3DModel.from_pretrained({out!r} + "/transformer")
vae = AutoencoderKLCogVideoX.from_pretrained({out!r} + "/vae")
sched = CogVideoXDDIMScheduler.from_pretrained({out!r} + "/scheduler")
assert sum(p.numel() for p in tr.parameters()) > 0
assert sum(p.numel() for p in vae.parameters()) > 0
print("REF_LOAD_OK")
"""
    r = subprocess.run([_sys.executable, "-c", code], capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "REF_LOAD_OK" in r.stdout

    import json as _json

    with open(os.path.join(out, "model_index.json")) as f:
        idx = _json.load(f)
    assert idx["_class_name"] == "CogVideoXPipeline"
    assert idx["transformer"] == ["diffusers", "CogVideoXTransformer3DModel"]
