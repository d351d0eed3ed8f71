"""Orbax-backed sharded checkpointing for multi-host deployments.

The flat-safetensors cache (s2v_tpu.loaders.cache) is single-host; for pod
slices the params live sharded across hosts and must be saved/restored
without gathering.  Orbax handles per-shard IO + layout metadata; restore
takes an optional sharding pytree so params land directly in their
TP/replicated placements.
"""

from __future__ import annotations


import jax


def save_params_orbax(params, path: str) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params_orbax(path: str, target=None, shardings=None):
    """Restore a param pytree.

    ``target``: template pytree (shapes/dtypes) — required for exact dtype
    restore; ``shardings``: matching pytree of ``jax.sharding.Sharding`` to
    place shards directly on a mesh.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target is None:
        return ckptr.restore(path)
    abstract = jax.tree.map(
        lambda x, s=None: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        target,
    )
    if shardings is not None:
        abstract = jax.tree.map(
            lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
            target,
            shardings,
        )
    return ckptr.restore(path, abstract)
