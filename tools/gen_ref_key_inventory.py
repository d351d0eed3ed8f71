"""One-shot fixture generator: the REAL checkpoint key inventory of the
reference stack's models, without network access.

The hub checkpoint (THUDM/CogVideoX-5b) is unreachable in this environment
(zero egress — `snapshot_download` fails at DNS resolution; recorded in
STATUS.md).  But its exact state-dict key inventory is fully determined by
the model code + config: instantiating the VENDORED torch classes
(/root/reference/diffusers) at the published 5b config on the meta device
yields every key name and shape the real safetensors files contain, at zero
memory cost.  We commit that as tests/fixtures/cogvideox_5b_key_inventory.json
so tests/test_key_inventory.py can validate our converters against the real
checkpoint layout (VERDICT r2 #3: "validate the converter against the real
config.json/key inventory of the hub checkpoint (committed as a fixture)").

5b config sources:
  * transformer: hub config.json fields documented in SURVEY.md §2.5
    (42 layers, 48 heads x d64, rotary) over the class defaults at
    reference cogvideox_transformer_3d.py:252-280;
  * VAE: the vendored class defaults ARE the published 5b config
    (autoencoder_kl_cogvideox.py:984-1032);
  * text encoder: google/t5-v1_1-xxl (d_model 4096, d_ff 10240, 24 layers,
    64 heads, gated-gelu, vocab 32128) per SURVEY.md §2.4.

Run from the repo root (needs /root/reference present):
    python tools/gen_ref_key_inventory.py
"""

import json
import os
import sys

import torch

REFERENCE = os.environ.get("S2V_REFERENCE_DIR", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "cogvideox_5b_key_inventory.json")

TRANSFORMER_5B = dict(
    num_attention_heads=48,
    attention_head_dim=64,
    in_channels=16,
    out_channels=16,
    flip_sin_to_cos=True,
    freq_shift=0,
    time_embed_dim=512,
    text_embed_dim=4096,
    num_layers=42,
    dropout=0.0,
    attention_bias=True,
    sample_width=90,
    sample_height=60,
    sample_frames=49,
    patch_size=2,
    temporal_compression_ratio=4,
    max_text_seq_length=226,
    activation_fn="gelu-approximate",
    timestep_activation_fn="silu",
    norm_elementwise_affine=True,
    norm_eps=1e-5,
    spatial_interpolation_scale=1.875,
    temporal_interpolation_scale=1.0,
    use_rotary_positional_embeddings=True,
)

T5_XXL = dict(
    d_model=4096,
    d_kv=64,
    d_ff=10240,
    num_layers=24,
    num_heads=64,
    vocab_size=32128,
    feed_forward_proj="gated-gelu",
    is_encoder_decoder=False,
    use_cache=False,
)


def _inventory(state_dict):
    return {k: list(v.shape) for k, v in sorted(state_dict.items())}


def main():
    sys.path.insert(0, os.path.join(REFERENCE, "diffusers", "src"))
    from diffusers.models.autoencoders.autoencoder_kl_cogvideox import (
        AutoencoderKLCogVideoX,
    )
    from diffusers.models.transformers.cogvideox_transformer_3d import (
        CogVideoXTransformer3DModel,
    )
    from transformers import T5Config, T5EncoderModel

    with torch.device("meta"):
        transformer = CogVideoXTransformer3DModel(**TRANSFORMER_5B)
        vae = AutoencoderKLCogVideoX()  # vendored defaults == 5b hub config
        t5 = T5EncoderModel(T5Config(**T5_XXL))

    fixture = {
        "_source": (
            "vendored torch classes at the published 5b configs on the meta "
            "device (tools/gen_ref_key_inventory.py); hub unreachable here"
        ),
        "transformer_config": TRANSFORMER_5B,
        "t5_config": T5_XXL,
        "transformer": _inventory(transformer.state_dict()),
        "vae": _inventory(vae.state_dict()),
        "text_encoder": _inventory(t5.state_dict()),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(fixture, f, indent=1, sort_keys=True)
    print(
        f"wrote {os.path.normpath(OUT)}: "
        f"transformer={len(fixture['transformer'])} keys, "
        f"vae={len(fixture['vae'])} keys, "
        f"text_encoder={len(fixture['text_encoder'])} keys"
    )


if __name__ == "__main__":
    main()
