"""Temporal-sharded (context-parallel) VAE over an ICI mesh axis.

The reference's ``fake_context_parallel_forward`` is explicitly a
single-device emulation of SAT's context parallelism (SURVEY.md §2.5); this
is the real thing: latent-frame chunks are sharded over a ``seq`` mesh
axis, every causal conv receives its (kt-1)-frame cache from the ring
neighbour via ``lax.ppermute`` (one neighbour hop per conv, overlapped with
compute), and all devices decode their chunks simultaneously — wall-clock
~1/ring of the sequential streaming decode.

Chunking contract: each device processes one uniform chunk of
``T / ring`` frames (must divide; use a frame count like 12 = 6 x 2 for a
6-ring).  Chunk-parity semantics therefore match a *single-device streaming
run with the same uniform chunk size* exactly (tested) — the canonical
13-frame schedule's odd first chunk is inherently sequential-first and is
served by the streaming path.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from s2v_tpu.config import VAEConfig
from s2v_tpu.models.vae import decoder_forward, encoder_forward
from s2v_tpu.ops.causal_conv3d import temporal_halo


def _sharded(forward, params, cfg: VAEConfig, x, mesh: Mesh, axis_name: str):
    from jax.experimental.shard_map import shard_map

    ring = mesh.shape[axis_name]
    if x.shape[1] % ring != 0:
        raise ValueError(
            f"temporal sharding needs frames ({x.shape[1]}) divisible by the "
            f"ring size ({ring}); pad or use the streaming path"
        )

    def local_fn(params, x_local):
        with temporal_halo(axis_name):
            y, _ = forward(params, cfg, x_local, None)
        return y

    spec_x = P(None, axis_name, None, None, None)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), spec_x),
        out_specs=spec_x,
    )
    return jax.jit(fn)(params, x)


def sharded_vae_decode(params, cfg: VAEConfig, z, mesh: Mesh, axis_name: str = "seq"):
    """Latents [B, T, h, w, C] (T divisible by ring) -> pixels, decoded
    context-parallel across the mesh."""
    dec = params["decoder"] if "decoder" in params else params
    return _sharded(decoder_forward, dec, cfg, z, mesh, axis_name)


def sharded_vae_encode(params, cfg: VAEConfig, x, mesh: Mesh, axis_name: str = "seq"):
    """Pixels [B, T, H, W, 3] (T divisible by ring) -> posterior moments."""
    enc = params["encoder"] if "encoder" in params else params
    return _sharded(encoder_forward, enc, cfg, x, mesh, axis_name)
