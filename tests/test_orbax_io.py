"""Orbax sharded checkpoint roundtrip on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2v_tpu.config import TransformerConfig
from s2v_tpu.models.transformer import init_transformer_params
from s2v_tpu.loaders.orbax_io import load_params_orbax, save_params_orbax
from s2v_tpu.parallel import make_mesh, shard_params, transformer_param_specs


def test_roundtrip_plain(tmp_path):
    cfg = TransformerConfig.tiny()
    params = init_transformer_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt")
    save_params_orbax(params, path)
    loaded = load_params_orbax(path, target=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_with_tp_shardings(tmp_path):
    """Params restore directly into TP placements on a mesh."""
    from jax.sharding import NamedSharding

    cfg = TransformerConfig.tiny()
    params = init_transformer_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt2")
    save_params_orbax(params, path)

    mesh = make_mesh({"data": 2, "model": 4})
    specs = transformer_param_specs(cfg, "model")
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    loaded = load_params_orbax(path, target=params, shardings=shardings)
    qkv = loaded["blocks"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding == shardings["blocks"]["attn"]["qkv"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(qkv), np.asarray(params["blocks"]["attn"]["qkv"]["kernel"])
    )
