"""Converted-parameter checkpoint cache.

The reference re-converts torch checkpoints on every load (SURVEY.md §5:
"load-only... no saving, no resume").  Here, any converted (and
LoRA-merged) pytree can be written back as a flat safetensors file and
reloaded without the torch-layout conversion pass — useful for fast cold
starts and as a save/restore surface for fine-tuned params.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from s2v_tpu.loaders.safetensors_io import load_safetensors, save_safetensors

_SEP = "::"


def flatten_pytree(params) -> Dict[str, np.ndarray]:
    """Nested dict/list pytree -> flat {"a::b::0::c": array} mapping."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k in sorted(node):
                walk(prefix + [str(k)], node[k])
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(prefix + [str(i)], v)
        else:
            arr = np.asarray(jax.device_get(node))
            if arr.dtype == jnp.bfloat16:
                # safetensors numpy handles bf16 via ml_dtypes; keep as-is
                pass
            flat[_SEP.join(prefix)] = arr

    walk([], params)
    return flat


def unflatten_pytree(flat: Dict[str, np.ndarray]):
    """Inverse of :func:`flatten_pytree`; integer path segments become
    list indices."""
    root: dict = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params(params, path: str, dtype=None):
    flat = flatten_pytree(params)
    if dtype is not None:
        flat = {k: np.asarray(v, dtype) for k, v in flat.items()}
    save_safetensors(flat, path)


def load_params(path: str, dtype=None):
    flat = load_safetensors(path)
    tree = unflatten_pytree(flat)
    if dtype is not None:
        tree = jax.tree.map(lambda x: jnp.asarray(x, dtype), tree)
    else:
        tree = jax.tree.map(jnp.asarray, tree)
    return tree
