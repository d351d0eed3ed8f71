"""T5 encoder parity vs HuggingFace transformers (tiny random config).

This doubles as validation of the HF->s2v_tpu weight mapping used by the
loader (reference consumes T5 via transformers, src/inference.py:185-189).
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from s2v_tpu.config import T5Config
from s2v_tpu.models.t5 import build_position_bias_index, init_t5_params, t5_encode



# jit-heavy full-coverage module (see pyproject markers); the fast tier
# (pytest -m 'not slow') keeps kernels/ops/loaders/scheduler coverage
pytestmark = __import__('pytest').mark.slow

def hf_tiny_t5():
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=128,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_heads=4,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
        is_encoder_decoder=False,
        use_cache=False,
    )
    torch.manual_seed(0)
    return T5EncoderModel(hf_cfg).eval()


def port_hf_weights(model, cfg: T5Config):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    blocks = []
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}"
        blocks.append(
            {
                "ln1": {"weight": jnp.asarray(sd[f"{pre}.layer.0.layer_norm.weight"])},
                "attn": {
                    "q": {"kernel": jnp.asarray(sd[f"{pre}.layer.0.SelfAttention.q.weight"].T)},
                    "k": {"kernel": jnp.asarray(sd[f"{pre}.layer.0.SelfAttention.k.weight"].T)},
                    "v": {"kernel": jnp.asarray(sd[f"{pre}.layer.0.SelfAttention.v.weight"].T)},
                    "o": {"kernel": jnp.asarray(sd[f"{pre}.layer.0.SelfAttention.o.weight"].T)},
                },
                "ln2": {"weight": jnp.asarray(sd[f"{pre}.layer.1.layer_norm.weight"])},
                "mlp": {
                    "wi_0": {"kernel": jnp.asarray(sd[f"{pre}.layer.1.DenseReluDense.wi_0.weight"].T)},
                    "wi_1": {"kernel": jnp.asarray(sd[f"{pre}.layer.1.DenseReluDense.wi_1.weight"].T)},
                    "wo": {"kernel": jnp.asarray(sd[f"{pre}.layer.1.DenseReluDense.wo.weight"].T)},
                },
            }
        )
    blocks = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "embedding": jnp.asarray(sd["shared.weight"]),
        "relative_attention_bias": jnp.asarray(
            sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
        ),
        "blocks": blocks,
        "final_ln": {"weight": jnp.asarray(sd["encoder.final_layer_norm.weight"])},
    }


def test_t5_matches_transformers():
    cfg = T5Config.tiny()
    model = hf_tiny_t5()
    params = port_hf_weights(model, cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, size=(2, 16)).astype(np.int32)
    ours = t5_encode(params, cfg, jnp.asarray(ids))
    with torch.no_grad():
        theirs = model(torch.from_numpy(ids.astype(np.int64))).last_hidden_state
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-4, rtol=1e-3)


def test_bias_index_static():
    cfg = T5Config.tiny()
    idx = build_position_bias_index(8, cfg)
    assert idx.shape == (8, 8)
    assert idx[0, 0] == 0  # zero distance -> bucket 0


def test_random_init_runs():
    cfg = T5Config.tiny()
    params = init_t5_params(jax.random.PRNGKey(0), cfg)
    out = t5_encode(params, cfg, jnp.zeros((1, 8), jnp.int32))
    assert out.shape == (1, 8, cfg.d_model)
    assert bool(jnp.isfinite(out).all())
