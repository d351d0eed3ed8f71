"""3D causal VAE tests: causal-conv cache semantics, up/downsample parity vs
torch reference math, frame-count bookkeeping, tiling blend."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from s2v_tpu.config import VAEConfig
from s2v_tpu.models.vae import (
    blend_h,
    blend_v,
    downsample3d,
    gaussian_sample,
    init_vae_params,
    upsample3d,
    vae_decode,
    vae_encode,
)
from s2v_tpu.ops.causal_conv3d import causal_conv3d, nearest_resize_video



# jit-heavy full-coverage module (see pyproject markers); the fast tier
# (pytest -m 'not slow') keeps kernels/ops/loaders/scheduler coverage
pytestmark = __import__('pytest').mark.slow

def test_causal_conv_cache_equals_full():
    """Chunked streaming with conv cache == one-shot causal conv."""
    rng = np.random.RandomState(0)
    x = rng.randn(1, 10, 6, 6, 3).astype(np.float32)
    kernel = (rng.randn(3, 3, 3, 3, 5) * 0.1).astype(np.float32)
    params = {"kernel": jnp.asarray(kernel), "bias": jnp.zeros(5, jnp.float32)}

    full, _ = causal_conv3d(params, jnp.asarray(x))
    c1, cache = causal_conv3d(params, jnp.asarray(x[:, :4]))
    c2, cache = causal_conv3d(params, jnp.asarray(x[:, 4:7]), cache)
    c3, _ = causal_conv3d(params, jnp.asarray(x[:, 7:]), cache)
    chunked = jnp.concatenate([c1, c2, c3], axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=1e-5)


def test_causal_conv_matches_torch():
    """First-frame replicate pad + zero spatial pad == torch reference
    (autoencoder_kl_cogvideox.py:120-137)."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 5, 6, 6, 3).astype(np.float32)
    kernel = (rng.randn(3, 3, 3, 3, 4) * 0.1).astype(np.float32)  # [kt,kh,kw,ci,co]
    bias = rng.randn(4).astype(np.float32)
    params = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}
    ours, _ = causal_conv3d(params, jnp.asarray(x))

    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # NCTHW
    pad_t = torch.cat([xt[:, :, :1]] * 2 + [xt], dim=2)
    padded = F.pad(pad_t, (1, 1, 1, 1), mode="constant", value=0)
    wt = torch.from_numpy(kernel).permute(4, 3, 0, 1, 2)  # [co,ci,kt,kh,kw]
    out = F.conv3d(padded, wt, torch.from_numpy(bias))
    np.testing.assert_allclose(
        np.asarray(ours), out.permute(0, 2, 3, 4, 1).numpy(), atol=1e-4
    )


def test_downsample3d_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 5, 8, 8, 4).astype(np.float32)  # odd T
    kernel = (rng.randn(3, 3, 4, 4) * 0.1).astype(np.float32)
    bias = rng.randn(4).astype(np.float32)
    params = {"conv": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}}
    ours = downsample3d(params, jnp.asarray(x), compress_time=True)

    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # NCTHW
    b, c, t, h, w = xt.shape
    flat = xt.permute(0, 3, 4, 1, 2).reshape(b * h * w, c, t)
    first, rest = flat[..., 0], flat[..., 1:]
    rest = F.avg_pool1d(rest, 2, 2)
    flat = torch.cat([first[..., None], rest], dim=-1)
    xt = flat.reshape(b, h, w, c, -1).permute(0, 3, 4, 1, 2)
    xt = F.pad(xt, (0, 1, 0, 1))
    bt, ct, tt, ht, wt_ = xt.shape
    frames = xt.permute(0, 2, 1, 3, 4).reshape(bt * tt, ct, ht, wt_)
    conv_w = torch.from_numpy(kernel).permute(3, 2, 0, 1)
    out = F.conv2d(frames, conv_w, torch.from_numpy(bias), stride=2)
    out = out.reshape(bt, tt, *out.shape[1:]).permute(0, 2, 1, 3, 4)
    np.testing.assert_allclose(np.asarray(ours), out.permute(0, 2, 3, 4, 1).numpy(), atol=1e-4)


def test_upsample3d_matches_torch():
    rng = np.random.RandomState(3)
    for t_in in (1, 2, 3):  # even / odd / single-frame branches
        x = rng.randn(1, t_in, 4, 4, 3).astype(np.float32)
        kernel = (rng.randn(3, 3, 3, 3) * 0.1).astype(np.float32)
        bias = rng.randn(3).astype(np.float32)
        params = {"conv": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}}
        ours = upsample3d(params, jnp.asarray(x), compress_time=True)

        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        if t_in > 1 and t_in % 2 == 1:
            first = F.interpolate(xt[:, :, 0], scale_factor=2.0)[:, :, None]
            rest = F.interpolate(xt[:, :, 1:], scale_factor=2.0)
            xt = torch.cat([first, rest], dim=2)
        elif t_in > 1:
            xt = F.interpolate(xt, scale_factor=2.0)
        else:
            xt = F.interpolate(xt.squeeze(2), scale_factor=2.0)[:, :, None]
        b, c, t, h, w = xt.shape
        frames = xt.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        conv_w = torch.from_numpy(kernel).permute(3, 2, 0, 1)
        out = F.conv2d(frames, conv_w, torch.from_numpy(bias), stride=1, padding=1)
        out = out.reshape(b, t, *out.shape[1:]).permute(0, 2, 1, 3, 4)
        np.testing.assert_allclose(
            np.asarray(ours), out.permute(0, 2, 3, 4, 1).numpy(), atol=1e-4,
            err_msg=f"t_in={t_in}",
        )


def test_nearest_resize_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.randn(1, 3, 5, 7, 2).astype(np.float32)
    ours = nearest_resize_video(jnp.asarray(x), (6, 10, 14))
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    theirs = F.interpolate(xt, size=(6, 10, 14), mode="nearest")
    np.testing.assert_allclose(np.asarray(ours), theirs.permute(0, 2, 3, 4, 1).numpy(), atol=1e-6)


def test_vae_roundtrip_frame_counts():
    """49 px frames -> 13 latent frames -> 49 px frames (reference comment
    autoencoder_kl_cogvideox.py:1076-1092)."""
    cfg = VAEConfig.tiny()
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 49, 32, 32, 3), jnp.float32)
    moments = vae_encode(params, cfg, x, use_tiling=False)
    assert moments.shape == (1, 13, 4, 4, 2 * cfg.latent_channels)
    z = gaussian_sample(moments)  # mode
    out = vae_decode(params, cfg, z, use_tiling=False)
    assert out.shape == (1, 49, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_single_frame_encode():
    """Reference-image path: 1 px frame -> 1 latent frame (video_generate.py:35-38)."""
    cfg = VAEConfig.tiny()
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 32, 32, 3), jnp.float32)
    moments = vae_encode(params, cfg, x, use_tiling=False)
    assert moments.shape == (1, 1, 4, 4, 2 * cfg.latent_channels)


def test_blend_matches_reference_loop():
    rng = np.random.RandomState(5)
    a = rng.randn(1, 2, 8, 8, 3).astype(np.float32)
    b = rng.randn(1, 2, 8, 8, 3).astype(np.float32)
    extent = 4
    ours_v = blend_v(jnp.asarray(a), jnp.asarray(b), extent)
    bt = torch.from_numpy(b.copy())
    at = torch.from_numpy(a)
    for y in range(extent):
        bt[:, :, y] = at[:, :, -extent + y] * (1 - y / extent) + bt[:, :, y] * (y / extent)
    np.testing.assert_allclose(np.asarray(ours_v), bt.numpy(), atol=1e-6)

    ours_h = blend_h(jnp.asarray(a), jnp.asarray(b), extent)
    bt = torch.from_numpy(b.copy())
    for xcol in range(extent):
        bt[:, :, :, xcol] = at[:, :, :, -extent + xcol] * (1 - xcol / extent) + bt[:, :, :, xcol] * (xcol / extent)
    np.testing.assert_allclose(np.asarray(ours_h), bt.numpy(), atol=1e-6)


def test_tiled_decode_geometry():
    """Tiled decode reassembles to the full pixel frame.  Geometry scaled
    down from the canonical 480x720 ratios (overlap 1/6, 1/5) so the tile
    grid covers the frame exactly, including ragged final tiles."""
    cfg = VAEConfig.tiny(sample_height=96, sample_width=80)
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    # latent 12x10 > tile minimums (6x5) -> tiling engages
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 12, 10, cfg.latent_channels), jnp.float32)
    out_tiled = vae_decode(params, cfg, z, use_tiling=True)
    assert out_tiled.shape == (1, 9, 96, 80, 3)
    assert bool(jnp.isfinite(out_tiled).all())


def test_tiled_encode_geometry():
    cfg = VAEConfig.tiny(sample_height=96, sample_width=80)
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 9, 96, 80, 3), jnp.float32)
    moments = vae_encode(params, cfg, x, use_tiling=True)
    assert moments.shape == (1, 3, 12, 10, 2 * cfg.latent_channels)

