"""Export s2v_tpu param pytrees back to the reference HF snapshot layout.

The exact inverses of the load-time conversions in ``s2v_tpu.loaders.hf``
(torch ``[out,in]`` linears, OIHW/OIDHW convs, fused-QKV split back into
``to_q/to_k/to_v``), producing state dicts keyed like the reference
checkpoints (diffusers CogVideoX transformer/VAE, transformers T5 encoder
— see /root/reference/src/inference.py:179-207 for the layout the
reference consumes).  Round-tripping through ``from_pretrained`` is
tested (tests/test_export_hf.py); tools/make_tiny_snapshot.py uses the
same converters to fabricate test fixtures.

This gives the framework the *save* half of L1 the reference lacks
(SURVEY §5: "No saving, no resume"): ``S2VPipeline.save_pretrained``
writes a snapshot the reference stack — or this framework — can load,
e.g. to publish LoRA-merged weights.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np

from s2v_tpu.config import T5Config, TransformerConfig, VAEConfig


def _np(x):
    return np.asarray(x, np.float32)


def _linear(sd, prefix, p, bias=True):
    sd[prefix + ".weight"] = _np(p["kernel"]).T
    if bias and "bias" in p:
        sd[prefix + ".bias"] = _np(p["bias"])


def _affine(sd, prefix, p):
    sd[prefix + ".weight"] = _np(p["weight"])
    sd[prefix + ".bias"] = _np(p["bias"])


def _check_not_quantized(params, what: str):
    import jax

    for leaf in jax.tree.leaves(params):
        if getattr(leaf, "dtype", None) is not None and leaf.dtype == np.int8:
            raise ValueError(
                f"cannot export an int8-quantized {what} tree to the HF "
                "layout (the reference stores bf16/fp32 weights); reload "
                "without quantize_int8 to export"
            )


# ---------------------------------------------------------------------------
# transformer (inverse of loaders.hf.convert_transformer_state_dict)
# ---------------------------------------------------------------------------


def transformer_state_dict(params, cfg: TransformerConfig) -> dict:
    import jax

    _check_not_quantized(params, "transformer")
    sd: dict = {}
    p = cfg.patch_size
    d = cfg.inner_dim

    kern = _np(params["patch_embed"]["proj"]["kernel"])  # [p*p*C, D]
    sd["patch_embed.proj.weight"] = kern.reshape(p, p, cfg.in_channels, d).transpose(3, 2, 0, 1)
    sd["patch_embed.proj.bias"] = _np(params["patch_embed"]["proj"]["bias"])
    _linear(sd, "patch_embed.text_proj", params["patch_embed"]["text_proj"])
    _linear(sd, "time_embedding.linear_1", params["time_embedding"]["linear_1"])
    _linear(sd, "time_embedding.linear_2", params["time_embedding"]["linear_2"])

    blocks = params["blocks"]
    for i in range(cfg.num_layers):
        b = jax.tree.map(lambda x: x[i], blocks)
        pre = f"transformer_blocks.{i}"
        qkv = _np(b["attn"]["qkv"]["kernel"])  # [D, 3D]
        qb = _np(b["attn"]["qkv"]["bias"])
        for j, n in enumerate(("q", "k", "v")):
            sd[f"{pre}.attn1.to_{n}.weight"] = qkv[:, j * d : (j + 1) * d].T
            sd[f"{pre}.attn1.to_{n}.bias"] = qb[j * d : (j + 1) * d]
        _affine(sd, f"{pre}.attn1.norm_q", b["attn"]["norm_q"])
        _affine(sd, f"{pre}.attn1.norm_k", b["attn"]["norm_k"])
        _linear(sd, f"{pre}.attn1.to_out.0", b["attn"]["to_out"])
        _linear(sd, f"{pre}.norm1.linear", b["norm1"]["linear"])
        _affine(sd, f"{pre}.norm1.norm", b["norm1"]["norm"])
        _linear(sd, f"{pre}.norm2.linear", b["norm2"]["linear"])
        _affine(sd, f"{pre}.norm2.norm", b["norm2"]["norm"])
        _linear(sd, f"{pre}.ff.net.0.proj", b["ff"]["net_0"])
        _linear(sd, f"{pre}.ff.net.2", b["ff"]["net_2"])

    _affine(sd, "norm_final", params["norm_final"])
    _linear(sd, "norm_out.linear", params["norm_out"]["linear"])
    _affine(sd, "norm_out.norm", params["norm_out"]["norm"])
    _linear(sd, "proj_out", params["proj_out"])
    return sd


# ---------------------------------------------------------------------------
# VAE (inverse of loaders.hf.convert_vae_state_dict)
# ---------------------------------------------------------------------------


def _conv3d(sd, prefix, p):
    sd[prefix + ".weight"] = _np(p["kernel"]).transpose(4, 3, 0, 1, 2)
    sd[prefix + ".bias"] = _np(p["bias"])


def _conv2d(sd, prefix, p):
    sd[prefix + ".weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    sd[prefix + ".bias"] = _np(p["bias"])


def _norm(sd, prefix, p):
    if "conv_y" in p:  # SpatialNorm3D
        _affine(sd, prefix + ".norm_layer", p["norm"])
        _conv3d(sd, prefix + ".conv_y.conv", p["conv_y"])
        _conv3d(sd, prefix + ".conv_b.conv", p["conv_b"])
    else:
        _affine(sd, prefix, p)


def _resnet(sd, prefix, p):
    _conv3d(sd, prefix + ".conv1.conv", p["conv1"])
    _conv3d(sd, prefix + ".conv2.conv", p["conv2"])
    _norm(sd, prefix + ".norm1", p["norm1"])
    _norm(sd, prefix + ".norm2", p["norm2"])
    if "conv_shortcut" in p:
        _conv3d(sd, prefix + ".conv_shortcut", p["conv_shortcut"])


def vae_state_dict(params, cfg: VAEConfig) -> dict:
    _check_not_quantized(params, "vae")
    sd: dict = {}
    enc, dec = params["encoder"], params["decoder"]

    _conv3d(sd, "encoder.conv_in.conv", enc["conv_in"])
    for i, block in enumerate(enc["down_blocks"]):
        for j, r in enumerate(block["resnets"]):
            _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", r)
        if "downsampler" in block:
            _conv2d(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", block["downsampler"]["conv"])
    for j, r in enumerate(enc["mid_block"]["resnets"]):
        _resnet(sd, f"encoder.mid_block.resnets.{j}", r)
    _affine(sd, "encoder.norm_out", enc["norm_out"])
    _conv3d(sd, "encoder.conv_out.conv", enc["conv_out"])

    _conv3d(sd, "decoder.conv_in.conv", dec["conv_in"])
    for j, r in enumerate(dec["mid_block"]["resnets"]):
        _resnet(sd, f"decoder.mid_block.resnets.{j}", r)
    for i, block in enumerate(dec["up_blocks"]):
        for j, r in enumerate(block["resnets"]):
            _resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", r)
        if "upsampler" in block:
            _conv2d(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", block["upsampler"]["conv"])
    _norm(sd, "decoder.norm_out", dec["norm_out"])
    _conv3d(sd, "decoder.conv_out.conv", dec["conv_out"])
    return sd


# ---------------------------------------------------------------------------
# T5 encoder (inverse of loaders.hf.convert_t5_state_dict)
# ---------------------------------------------------------------------------


def t5_state_dict(params, cfg: T5Config) -> dict:
    import jax

    _check_not_quantized(params, "text encoder")
    sd = {"shared.weight": _np(params["embedding"])}
    sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"] = _np(
        params["relative_attention_bias"]
    )
    blocks = params["blocks"]
    for i in range(cfg.num_layers):
        b = jax.tree.map(lambda x: x[i], blocks)
        pre = f"encoder.block.{i}"
        sd[f"{pre}.layer.0.layer_norm.weight"] = _np(b["ln1"]["weight"])
        for n in ("q", "k", "v", "o"):
            _linear(sd, f"{pre}.layer.0.SelfAttention.{n}", b["attn"][n], bias=False)
        sd[f"{pre}.layer.1.layer_norm.weight"] = _np(b["ln2"]["weight"])
        for n in ("wi_0", "wi_1", "wo"):
            _linear(sd, f"{pre}.layer.1.DenseReluDense.{n}", b["mlp"][n], bias=False)
    sd["encoder.final_layer_norm.weight"] = _np(params["final_ln"]["weight"])
    return sd


# ---------------------------------------------------------------------------
# snapshot writer
# ---------------------------------------------------------------------------


# written into exported configs so diffusers' ConfigMixin.from_config and
# DiffusionPipeline.from_pretrained accept the snapshot (the reference
# vendors diffusers 0.32.0.dev0)
_DIFFUSERS_VERSION = "0.32.0.dev0"


def config_json(cfg, skip=("dtype", "param_dtype"), class_name: Optional[str] = None) -> dict:
    out = {}
    if class_name is not None:
        out["_class_name"] = class_name
        out["_diffusers_version"] = _DIFFUSERS_VERSION
    for f in dataclasses.fields(cfg):
        if f.name in skip:
            continue
        v = getattr(cfg, f.name)
        out[f.name] = list(v) if isinstance(v, tuple) else v
    return out


def save_pipeline_snapshot(pipe, out_dir: str, dtype: Optional[str] = None) -> str:
    """Write the pipeline's current weights as an HF snapshot in the
    DIFFUSERS layout, loadable both by this framework's ``from_pretrained``
    and by the reference stack's ``DiffusionPipeline.from_pretrained``
    (model_index.json + per-module ``_class_name`` configs + diffusers
    weight filenames — reference src/inference.py:179-207):

        <out>/model_index.json
        <out>/transformer/{config.json, diffusion_pytorch_model.safetensors}
        <out>/vae/{config.json, diffusion_pytorch_model.safetensors}
        <out>/text_encoder/{config.json, model.safetensors}   (if loaded)
        <out>/tokenizer/...                                   (if available)
        <out>/scheduler/scheduler_config.json

    LoRA is merged at load in this framework, so the exported transformer
    carries the merged weights — the way to publish a fused checkpoint.
    Sharded (mesh) params are gathered host-side by ``np.asarray``.

    ``dtype``: on-disk dtype, e.g. ``"bfloat16"`` to match the hub 5b
    checkpoints' size; ``None`` keeps lossless fp32.  Submodules are
    converted and written one at a time so peak host RAM is one model,
    not the whole pipeline.
    """
    from s2v_tpu.loaders.safetensors_io import save_safetensors

    cast = None
    if dtype is not None:
        import ml_dtypes

        cast = dict(bfloat16=ml_dtypes.bfloat16, float32=np.float32,
                    float16=np.float16)[dtype]

    # thunks: build each state dict only inside the write loop and drop it
    # before the next submodule (flagship T5+DiT+VAE would otherwise hold
    # ~40 GB of fp32 numpy simultaneously)
    subs = [
        ("transformer", pipe.transformer_cfg, "CogVideoXTransformer3DModel",
         "diffusion_pytorch_model.safetensors",
         lambda: transformer_state_dict(pipe.transformer_params, pipe.transformer_cfg)),
        ("vae", pipe.vae_cfg, "AutoencoderKLCogVideoX",
         "diffusion_pytorch_model.safetensors",
         lambda: vae_state_dict(pipe.vae_params, pipe.vae_cfg)),
    ]
    if pipe.t5_params is not None:
        subs.append(
            ("text_encoder", pipe.t5_cfg, None, "model.safetensors",
             lambda: t5_state_dict(pipe.t5_params, pipe.t5_cfg))
        )
    for sub, cfg, class_name, weights_name, make_sd in subs:
        d = os.path.join(out_dir, sub)
        os.makedirs(d, exist_ok=True)
        cj = config_json(cfg, class_name=class_name)
        if sub == "text_encoder":
            # transformers (not diffusers) consumes this one
            cj["model_type"] = "t5"
            cj["architectures"] = ["T5EncoderModel"]
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(cj, f, indent=1)
        sd = make_sd()
        if cast is not None:
            sd = {k: v.astype(cast) for k, v in sd.items()}
        save_safetensors(sd, os.path.join(d, weights_name))
        del sd

    os.makedirs(os.path.join(out_dir, "scheduler"), exist_ok=True)
    with open(os.path.join(out_dir, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump(
            config_json(pipe.scheduler_cfg, skip=(), class_name="CogVideoXDDIMScheduler"),
            f, indent=1,
        )

    had_tokenizer = _save_tokenizer(pipe, out_dir)
    # a serialized `tokenizers` backend (tokenizer.json) loads via the Fast
    # class without needing the sentencepiece package; only a raw
    # spiece.model requires the slow T5Tokenizer
    tok_class = (
        "T5TokenizerFast"
        if os.path.exists(os.path.join(out_dir, "tokenizer", "tokenizer.json"))
        else "T5Tokenizer"
    )

    index = {
        "_class_name": "CogVideoXPipeline",
        "_diffusers_version": _DIFFUSERS_VERSION,
        "scheduler": ["diffusers", "CogVideoXDDIMScheduler"],
        "transformer": ["diffusers", "CogVideoXTransformer3DModel"],
        "vae": ["diffusers", "AutoencoderKLCogVideoX"],
        "text_encoder": (
            ["transformers", "T5EncoderModel"] if pipe.t5_params is not None else [None, None]
        ),
        "tokenizer": (["transformers", tok_class] if had_tokenizer else [None, None]),
    }
    with open(os.path.join(out_dir, "model_index.json"), "w") as f:
        json.dump(index, f, indent=1)
    return out_dir


def _save_tokenizer(pipe, out_dir: str) -> None:
    """Copy the tokenizer files from the source snapshot when known, else
    serialize the `tokenizers` backend; native-SP without a source dir is
    skipped with a warning (the .model file is the serialized form).
    Returns True when tokenizer/ was written."""
    import logging
    import shutil

    log = logging.getLogger("s2v_tpu")
    tok_dir = os.path.join(out_dir, "tokenizer")
    src = getattr(pipe, "model_dir", None)
    if src:
        src_tok = os.path.join(src, "tokenizer")
        if os.path.isdir(src_tok) and os.path.abspath(src_tok) != os.path.abspath(tok_dir):
            shutil.copytree(src_tok, tok_dir, dirs_exist_ok=True)
            return True
    tok = getattr(pipe, "tokenizer", None)
    inner = getattr(tok, "_tok", None)
    if inner is not None and hasattr(inner, "save"):
        os.makedirs(tok_dir, exist_ok=True)
        inner.save(os.path.join(tok_dir, "tokenizer.json"))
        return True
    log.warning("save_pretrained: no serializable tokenizer (source dir "
                "unknown); snapshot written without tokenizer/")
    return False
