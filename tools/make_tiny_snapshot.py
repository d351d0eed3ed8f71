"""Generate a tiny HF-layout CogVideoX snapshot + LoRA checkpoint for
end-to-end drives of the CLI / serving daemon / trainer without the real
5b weights.

Layout produced (mirrors what ``S2VPipeline.from_pretrained`` consumes,
i.e. the reference hub snapshot structure, src/inference.py:179-247):

    <out>/transformer/{config.json, model.safetensors}
    <out>/vae/{config.json, model.safetensors}
    <out>/text_encoder/{config.json, model.safetensors}
    <out>/tokenizer/tokenizer.json
    <out>/scheduler/scheduler_config.json
    <lora_out>/pytorch_lora_weights_transformer.safetensors   (optional)

State dicts are built by *inverting* the loader conversions in
``s2v_tpu.loaders.hf`` from randomly-initialized s2v_tpu pytrees, so the
torch-layout keys/shapes always round-trip through the real load path.

Usage:
    python tools/make_tiny_snapshot.py /tmp/tiny_snapshot [--lora_out /tmp/tiny_lora_ckpt]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from s2v_tpu.config import SchedulerConfig, T5Config, TransformerConfig, VAEConfig  # noqa: E402


def _np(x):
    return np.asarray(x, np.float32)


def _linear(sd, prefix, p, bias=True):
    sd[prefix + ".weight"] = _np(p["kernel"]).T
    if bias and "bias" in p:
        sd[prefix + ".bias"] = _np(p["bias"])


def _affine(sd, prefix, p):
    sd[prefix + ".weight"] = _np(p["weight"])
    sd[prefix + ".bias"] = _np(p["bias"])


# ---------------------------------------------------------------------------
# transformer (inverse of loaders.hf.convert_transformer_state_dict)
# ---------------------------------------------------------------------------


def transformer_sd(cfg: TransformerConfig):
    from s2v_tpu.models.transformer import init_transformer_params

    params = init_transformer_params(jax.random.PRNGKey(0), cfg)
    sd = {}
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


def vae_sd(cfg: VAEConfig):
    from s2v_tpu.models.vae import init_vae_params

    params = init_vae_params(jax.random.PRNGKey(1), cfg)
    sd = {}
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
# T5 (inverse of loaders.hf.convert_t5_state_dict)
# ---------------------------------------------------------------------------


def t5_sd(cfg: T5Config):
    from s2v_tpu.models.t5 import init_t5_params

    params = init_t5_params(jax.random.PRNGKey(2), cfg)
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
# tokenizer / configs / LoRA
# ---------------------------------------------------------------------------

_WORDS = ["a", "the", "pig", "cat", "dog", "walking", "on", "mat", "grass",
          "video", "of", "in", "red", "blue", "small", "big"]


def write_tokenizer(path: str, vocab_size: int):
    """Tiny WordLevel tokenizer.json with T5 conventions (<pad>=0, </s>=1)."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<pad>": 0, "</s>": 1, "<unk>": 2}
    for w in _WORDS:
        if len(vocab) < vocab_size - 1:  # leave room for <cls>
            vocab[w] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(path)


def lora_checkpoint(tcfg: TransformerConfig, rank: int = 2, seed: int = 7):
    """diffusers-format LoRA state dict over the reference's 9 target
    families (src/inference.py:218-225), incl. the k=2 conv patch embed."""
    rng = np.random.RandomState(seed)
    d = tcfg.inner_dim

    def pair(sd, module, in_dim, out_dim):
        sd[f"transformer.{module}.lora.down.weight"] = rng.randn(rank, in_dim).astype(np.float32) * 0.05
        sd[f"transformer.{module}.lora.up.weight"] = rng.randn(out_dim, rank).astype(np.float32) * 0.05

    sd = {}
    # conv LoRA on the patch embed (A is a conv kernel [r, C, p, p])
    p = tcfg.patch_size
    sd["transformer.patch_embed.proj.lora.down.weight"] = (
        rng.randn(rank, tcfg.in_channels, p, p).astype(np.float32) * 0.05
    )
    sd["transformer.patch_embed.proj.lora.up.weight"] = (
        rng.randn(d, rank, 1, 1).astype(np.float32) * 0.05
    )
    pair(sd, "patch_embed.text_proj", tcfg.text_embed_dim, d)
    for i in range(tcfg.num_layers):
        pre = f"transformer_blocks.{i}"
        for n in ("to_q", "to_k", "to_v", "to_out.0"):
            pair(sd, f"{pre}.attn1.{n}", d, d)
        pair(sd, f"{pre}.norm1.linear", tcfg.time_embed_dim, 6 * d)
        pair(sd, f"{pre}.norm2.linear", tcfg.time_embed_dim, 6 * d)
        pair(sd, f"{pre}.ff.net.2", tcfg.ff_inner_dim, d)
    return sd


def _cfg_json(cfg, skip=("dtype", "param_dtype")):
    import dataclasses

    out = {}
    for f in dataclasses.fields(cfg):
        if f.name in skip:
            continue
        v = getattr(cfg, f.name)
        out[f.name] = list(v) if isinstance(v, tuple) else v
    return out


def make_snapshot(out_dir: str, lora_out: str | None = None, family: str = "5b"):
    from s2v_tpu.loaders.safetensors_io import save_safetensors

    tcfg = TransformerConfig.tiny()
    if family == "2b":
        # sincos positional path (no rotary), fp stays fp32 for CPU tests
        import dataclasses

        tcfg = dataclasses.replace(tcfg, use_rotary_positional_embeddings=False)
    vcfg = VAEConfig.tiny(latent_channels=tcfg.in_channels, sample_height=64, sample_width=64)
    t5cfg = T5Config.tiny(d_model=tcfg.text_embed_dim)
    scfg = SchedulerConfig()

    for sub, cfg, sd in (
        ("transformer", tcfg, transformer_sd(tcfg)),
        ("vae", vcfg, vae_sd(vcfg)),
        ("text_encoder", t5cfg, t5_sd(t5cfg)),
    ):
        d = os.path.join(out_dir, sub)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(_cfg_json(cfg), f, indent=1)
        save_safetensors(sd, os.path.join(d, "model.safetensors"))

    os.makedirs(os.path.join(out_dir, "tokenizer"), exist_ok=True)
    write_tokenizer(os.path.join(out_dir, "tokenizer", "tokenizer.json"), t5cfg.vocab_size)
    os.makedirs(os.path.join(out_dir, "scheduler"), exist_ok=True)
    with open(os.path.join(out_dir, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump(_cfg_json(scfg, skip=()), f, indent=1)

    if lora_out:
        os.makedirs(lora_out, exist_ok=True)
        save_safetensors(
            lora_checkpoint(tcfg),
            os.path.join(lora_out, "pytorch_lora_weights_transformer.safetensors"),
        )
    return out_dir


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("out_dir", nargs="?", default="/tmp/tiny_snapshot")
    ap.add_argument("--lora_out", default=None,
                    help="also write a tiny LoRA checkpoint dir (all 9 target families)")
    ap.add_argument("--family", default="5b", choices=["5b", "2b"],
                    help="2b: sincos positional embeddings (no rotary)")
    args = ap.parse_args(argv)
    make_snapshot(args.out_dir, args.lora_out, family=args.family)
    print(f"snapshot: {args.out_dir}" + (f"  lora: {args.lora_out}" if args.lora_out else ""))


if __name__ == "__main__":
    main()
