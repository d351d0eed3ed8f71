"""Orbax-backed sharded checkpointing for multi-host deployments.

The flat-safetensors cache (s2v_tpu.loaders.cache) is single-host; for pod
slices the params live sharded across hosts and must be saved/restored
without gathering.  Orbax handles per-shard IO + layout metadata; restore
takes an optional sharding pytree so params land directly in their
TP/replicated placements.
"""

from __future__ import annotations


import jax


_CKPTR = None


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_params_orbax(params, path: str, block: bool = True) -> None:
    """Save a pytree.  ``block=False`` returns once the device->host copy
    is done (orbax copies synchronously at save()) and lets the disk
    writes proceed on orbax's background thread — training continues
    immediately, donated buffers are safe to reuse.  Call
    :func:`wait_for_checkpoints` (or a later blocking save) before
    reading the directory."""
    ckptr = _checkpointer()
    ckptr.save(path, params, force=True)
    if block:
        ckptr.wait_until_finished()


def wait_for_checkpoints() -> None:
    """Block until every pending async save has hit disk."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


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
