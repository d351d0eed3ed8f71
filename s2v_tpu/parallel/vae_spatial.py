"""Spatial-tile context-parallel VAE decode (prototype, VERDICT r3 #7).

The temporal CP decode (vae_temporal.py) bottoms out at ~1.6 s on a pod —
its parallelism is capped by the latent frame count (13 at the flagship
geometry).  Spatial tiles are the next parallel axis: the reference's
tiled decode (autoencoder_kl_cogvideox.py:1374-1455) decomposes an
above-native frame into overlap-blended tiles that are decoded
INDEPENDENTLY, so the tile loop distributes over a mesh axis with zero
cross-device communication until the final gather + blend.

Design (exact-parity by construction):
  * full-size interior tiles — the bulk of the grid — are stacked and
    decoded by ONE vmapped program with the tile axis sharded over the
    mesh (stack padded to a multiple of the axis size; pad outputs
    dropped);
  * the reference's partial EDGE tiles (its ``range(0, H, overlap)`` loop
    always overshoots) are decoded at their true ragged sizes,
    sequentially, exactly as the single-device path does — decoding them
    padded would change conv boundary values and break parity;
  * gather + the single-device blend math (models/vae.py ``_tiled``), so
    the output matches the sequential tiled decode (tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from s2v_tpu.models.vae import VAEConfig, _decode_plain, blend_h, blend_v


def _grid(cfg: VAEConfig, height: int, width: int):
    th, tw = cfg.tile_latent_min_height, cfg.tile_latent_min_width
    overlap_h = int(th * (1 - cfg.tile_overlap_factor_height))
    overlap_w = int(tw * (1 - cfg.tile_overlap_factor_width))
    rows = list(range(0, height, overlap_h))
    cols = list(range(0, width, overlap_w))
    return rows, cols, th, tw


def spatial_cp_supported(cfg: VAEConfig, z, mesh, axis: str) -> bool:
    if mesh is None or axis not in getattr(mesh, "axis_names", ()):
        return False
    if not (z.shape[2] > cfg.tile_latent_min_height or z.shape[3] > cfg.tile_latent_min_width):
        return False  # untiled regime
    rows, cols, th, tw = _grid(cfg, z.shape[2], z.shape[3])
    n_full = sum(
        1
        for i in rows
        for j in cols
        if i + th <= z.shape[2] and j + tw <= z.shape[3]
    )
    # worth engaging once the parallel part covers at least the mesh axis
    return n_full >= int(mesh.shape[axis])


def spatial_tiled_decode_cp(params, cfg: VAEConfig, z, mesh, axis: str = "seq"):
    """Tiled decode with the full-tile loop sharded over ``mesh[axis]``.

    Output equals ``models.vae._tiled(params, cfg, z, encode=False)``:
    same tiles, same ragged-edge handling, same blend.
    """
    rows, cols, th, tw = _grid(cfg, z.shape[2], z.shape[3])
    size = int(mesh.shape[axis])

    full_pos, edge_pos = [], []
    for i in rows:
        for j in cols:
            (full_pos if i + th <= z.shape[2] and j + tw <= z.shape[3]
             else edge_pos).append((i, j))
    if len(full_pos) < size:
        raise ValueError(
            f"spatial CP needs >= {size} full tiles (have {len(full_pos)}); "
            f"use the sequential tiled decode"
        )

    # --- parallel part: full tiles, stack padded to the axis size
    stack = jnp.stack([z[:, :, i : i + th, j : j + tw] for i, j in full_pos])
    pad = (-len(full_pos)) % size
    if pad:
        stack = jnp.concatenate([stack, stack[:pad]], axis=0)
    stack = jax.device_put(stack, NamedSharding(mesh, P(axis)))
    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    decoded = jax.jit(
        jax.vmap(lambda t: _decode_plain(params_r, cfg, t)),
        out_shardings=NamedSharding(mesh, P(axis)),
    )(stack)
    decoded = jax.device_put(decoded, NamedSharding(mesh, P()))

    tiles = {pos: decoded[n] for n, pos in enumerate(full_pos)}
    # --- ragged edge tiles: sequential, true sizes (parity with _tiled)
    for i, j in edge_pos:
        tiles[(i, j)] = _decode_plain(params, cfg, z[:, :, i : i + th, j : j + tw])

    # --- exact single-device blend (models/vae.py _tiled)
    grid = [[tiles[(i, j)] for j in cols] for i in rows]
    tile_out_h = cfg.tile_sample_min_height
    tile_out_w = cfg.tile_sample_min_width
    blend_e_h = int(tile_out_h * cfg.tile_overlap_factor_height)
    blend_e_w = int(tile_out_w * cfg.tile_overlap_factor_width)
    limit_h = tile_out_h - blend_e_h
    limit_w = tile_out_w - blend_e_w
    result_rows = []
    for i, row in enumerate(grid):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = blend_v(grid[i - 1][j], tile, blend_e_h)
            if j > 0:
                tile = blend_h(row[j - 1], tile, blend_e_w)
            result_row.append(tile[:, :, :limit_h, :limit_w])
        result_rows.append(jnp.concatenate(result_row, axis=3))
    return jnp.concatenate(result_rows, axis=2)


__all__ = ["spatial_cp_supported", "spatial_tiled_decode_cp"]
