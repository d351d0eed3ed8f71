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


def sharded_vae_decode_canonical(
    params, cfg: VAEConfig, z, mesh: Mesh, axis_name: str = "seq"
):
    """Context-parallel decode of the reference's *canonical* chunk
    schedule — EXACT parity with the default streaming decode for any
    frame count (the plain :func:`sharded_vae_decode` matches only
    uniform-chunk streaming).

    Reference schedule (autoencoder_kl_cogvideox.py:1186-1194): the first
    chunk absorbs the remainder (13 frames -> [0:3], [3:5], ..., [11:13]).
    The odd first chunk is inherently stream-initial (no cache, odd-size
    temporal-upsample semantics), so it runs as one host-streamed step;
    its conv caches are then *injected* as device 0's halo state and the
    remaining uniform chunks decode in parallel, ``ppermute``-chaining
    caches exactly as the sequential stream would have.

    Falls back to nothing here — callers should check
    ``canonical_cp_chunks`` for feasibility first.
    """
    from jax import shard_map

    dec = params["decoder"] if "decoder" in params else params
    fb = cfg.num_latent_frames_batch_size
    t = z.shape[1]
    n_rest = canonical_cp_chunks(cfg, t)
    first = t - n_rest * fb
    if n_rest <= 0:
        y, _ = decoder_forward(dec, cfg, z, None)
        return y
    if n_rest > mesh.shape[axis_name]:
        raise ValueError(
            f"canonical CP decode needs ring >= {n_rest} chunks "
            f"(have {mesh.shape[axis_name]})"
        )

    # phase 1: the stream-initial odd chunk (sequential by nature)
    y0, cache = decoder_forward(dec, cfg, z[:, :first], None)

    # phase 2: uniform chunks in parallel, device 0 seeded with the cache
    sub = Mesh(
        mesh.devices.ravel()[:n_rest].reshape(n_rest), axis_names=(axis_name,)
    )

    def local_fn(p, c, z_local):
        with temporal_halo(axis_name):
            y, _ = decoder_forward(p, cfg, z_local, c)
        return y

    spec_z = P(None, axis_name, None, None, None)
    fn = shard_map(
        local_fn, mesh=sub, in_specs=(P(), P(), spec_z), out_specs=spec_z,
        check_vma=False,
    )
    # the sub-mesh may be a strict subset of the caller's mesh: re-place
    # operands so their shardings name the same device set
    from jax.sharding import NamedSharding

    rep = NamedSharding(sub, P())
    y_rest = jax.jit(fn)(
        jax.device_put(dec, rep),
        jax.device_put(cache, rep),
        jax.device_put(z[:, first:], NamedSharding(sub, spec_z)),
    )
    # bring both phases onto the same device set before joining
    y_rest = jax.device_put(y_rest, y0.sharding)
    return jax.numpy.concatenate([y0, y_rest], axis=1)


def canonical_cp_chunks(cfg: VAEConfig, num_latent_frames: int) -> int:
    """Number of parallel (phase-2) chunks the canonical schedule yields;
    the mesh's seq axis must be at least this for
    :func:`sharded_vae_decode_canonical`."""
    fb = cfg.num_latent_frames_batch_size
    t = num_latent_frames
    first = fb + t % fb if t > fb else t
    return max((t - first) // fb, 0)


def sharded_vae_encode(params, cfg: VAEConfig, x, mesh: Mesh, axis_name: str = "seq"):
    """Pixels [B, T, H, W, 3] (T divisible by ring) -> posterior moments."""
    enc = params["encoder"] if "encoder" in params else params
    return _sharded(encoder_forward, enc, cfg, x, mesh, axis_name)
