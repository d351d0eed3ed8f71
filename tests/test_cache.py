"""Converted-params cache roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp

from s2v_tpu.config import TransformerConfig
from s2v_tpu.loaders.cache import load_params, save_params
from s2v_tpu.models.transformer import init_transformer_params, transformer_forward
from s2v_tpu.models.vae import init_vae_params
from s2v_tpu.config import VAEConfig



# jit-heavy full-coverage module (see pyproject markers); the fast tier
# (pytest -m 'not slow') keeps kernels/ops/loaders/scheduler coverage
pytestmark = __import__('pytest').mark.slow

def test_transformer_params_roundtrip(tmp_path):
    cfg = TransformerConfig.tiny()
    params = init_transformer_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "params.safetensors")
    save_params(params, path)
    loaded = load_params(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vae_params_roundtrip_with_lists(tmp_path):
    """VAE trees contain lists (resnet stacks) — index keys must roundtrip."""
    cfg = VAEConfig.tiny()
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "vae.safetensors")
    save_params(params, path)
    loaded = load_params(path)
    assert isinstance(loaded["encoder"]["down_blocks"], list)
    assert len(loaded["encoder"]["down_blocks"]) == 4
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_roundtrip(tmp_path):
    x = {"w": jnp.ones((4, 4), jnp.bfloat16) * 1.5}
    path = str(tmp_path / "bf16.safetensors")
    save_params(x, path)
    loaded = load_params(path)
    assert loaded["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(loaded["w"], np.float32), 1.5)
