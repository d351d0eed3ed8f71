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


def transformer_sd(cfg: TransformerConfig):
    from s2v_tpu.loaders.export_hf import transformer_state_dict
    from s2v_tpu.models.transformer import init_transformer_params

    return transformer_state_dict(init_transformer_params(jax.random.PRNGKey(0), cfg), cfg)


def vae_sd(cfg: VAEConfig):
    from s2v_tpu.loaders.export_hf import vae_state_dict
    from s2v_tpu.models.vae import init_vae_params

    return vae_state_dict(init_vae_params(jax.random.PRNGKey(1), cfg), cfg)


def t5_sd(cfg: T5Config):
    from s2v_tpu.loaders.export_hf import t5_state_dict
    from s2v_tpu.models.t5 import init_t5_params

    return t5_state_dict(init_t5_params(jax.random.PRNGKey(2), cfg), cfg)


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
    from s2v_tpu.loaders.export_hf import config_json

    return config_json(cfg, skip=skip)


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
