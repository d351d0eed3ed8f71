"""Training data pipeline: decode/trim/resize conventions + latent batches
feeding an actual LoRA train step."""

import numpy as np
import jax
import pytest

cv2 = pytest.importorskip("cv2")

from s2v_tpu.config import SchedulerConfig, T5Config, TransformerConfig, VAEConfig
from s2v_tpu.models.t5 import init_t5_params
from s2v_tpu.models.transformer import init_transformer_params
from s2v_tpu.models.vae import init_vae_params
from s2v_tpu.pipelines.s2v import S2VPipeline
from s2v_tpu.training.data import (
    VideoFolderDataset,
    latent_batches,
    prefetch_batches,
    read_video_frames,
)
from s2v_tpu.training.lora import LoRASpec, init_lora_params, make_lora_train_step



# jit-heavy full-coverage module (see pyproject markers); the fast tier
# (pytest -m 'not slow') keeps kernels/ops/loaders/scheduler coverage
pytestmark = __import__('pytest').mark.slow

def _write_video(path, frames=10, h=48, w=64):
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 8, (w, h))
    rng = np.random.RandomState(0)
    for _ in range(frames):
        wr.write((rng.rand(h, w, 3) * 255).astype(np.uint8))
    wr.release()


class _FakeTokenizer:
    def encode(self, prompts, max_length=226):
        out = np.zeros((len(prompts), max_length), np.int32)
        for i, p in enumerate(prompts):
            ids = [(hash(w) % 100) + 2 for w in p.split()][: max_length - 1] + [1]
            out[i, : len(ids)] = ids
        return out


def test_read_video_conventions(tmp_path):
    p = tmp_path / "clip.mp4"
    _write_video(p, frames=6)
    # trims, resizes, pads short clips by repeating the last frame
    out = read_video_frames(str(p), num_frames=9, height=32, width=32, skip_frames_start=1)
    assert out.shape == (9, 32, 32, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    np.testing.assert_array_equal(out[-1], out[-2])  # padded tail


def test_latent_batches_feed_train_step(tmp_path):
    _write_video(tmp_path / "a.mp4", frames=9, h=32, w=32)
    _write_video(tmp_path / "b.mp4", frames=9, h=32, w=32)
    (tmp_path / "prompts.txt").write_text("a pig\na cat\n")

    tcfg = TransformerConfig.tiny()
    vcfg = VAEConfig.tiny(latent_channels=tcfg.in_channels, sample_height=64, sample_width=64)
    t5cfg = T5Config.tiny(d_model=tcfg.text_embed_dim)
    key = jax.random.PRNGKey(0)
    base = init_transformer_params(key, tcfg)
    pipe = S2VPipeline(
        transformer_params=base,
        transformer_cfg=tcfg,
        vae_params=init_vae_params(key, vcfg),
        vae_cfg=vcfg,
        t5_params=init_t5_params(key, t5cfg),
        t5_cfg=t5cfg,
        scheduler_cfg=SchedulerConfig(),
        tokenizer=_FakeTokenizer(),
    )
    ds = VideoFolderDataset(str(tmp_path), num_frames=9, height=32, width=32)
    assert len(ds) == 2

    spec = LoRASpec(rank=2, alpha=4.0)
    lora = init_lora_params(jax.random.PRNGKey(1), base, spec)
    init_opt, train_step = make_lora_train_step(base, tcfg, spec, learning_rate=1e-3)
    opt_state = init_opt(lora)
    n = 0
    for batch in latent_batches(ds, pipe, batch_size=2, seed=0):
        assert batch["video_latents"].shape == (2, 3, 4, 4, tcfg.in_channels)
        assert batch["ref_latents"].shape == (2, 1, 4, 4, tcfg.in_channels)
        assert batch["text_embeds"].shape == (2, tcfg.max_text_seq_length, tcfg.text_embed_dim)
        lora, opt_state, loss = train_step(lora, opt_state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))
        n += 1
    assert n == 1


def _tiny_pipe_and_ds(tmp_path):
    _write_video(tmp_path / "a.mp4", frames=9, h=32, w=32)
    _write_video(tmp_path / "b.mp4", frames=9, h=32, w=32)
    (tmp_path / "prompts.txt").write_text("a pig\na cat\n")
    tcfg = TransformerConfig.tiny()
    vcfg = VAEConfig.tiny(latent_channels=tcfg.in_channels, sample_height=64, sample_width=64)
    t5cfg = T5Config.tiny(d_model=tcfg.text_embed_dim)
    key = jax.random.PRNGKey(0)
    pipe = S2VPipeline(
        transformer_params=init_transformer_params(key, tcfg),
        transformer_cfg=tcfg,
        vae_params=init_vae_params(key, vcfg),
        vae_cfg=vcfg,
        t5_params=init_t5_params(key, t5cfg),
        t5_cfg=t5cfg,
        scheduler_cfg=SchedulerConfig(),
        tokenizer=_FakeTokenizer(),
    )
    return pipe, VideoFolderDataset(str(tmp_path), num_frames=9, height=32, width=32)


def test_latent_batches_cache_is_transparent(tmp_path):
    """Batches produced through the encode cache (epoch 2 reuses epoch 1's
    VAE moments / T5 embeds) == batches re-encoded from scratch, for the
    same epoch seed — caching moments (not samples) keeps the per-epoch
    posterior noise semantics exactly."""
    pipe, ds = _tiny_pipe_and_ds(tmp_path)
    cache: dict = {}
    for epoch in (0, 1):
        cached = list(latent_batches(ds, pipe, batch_size=1, seed=epoch, cache=cache))
        fresh = list(latent_batches(ds, pipe, batch_size=1, seed=epoch))
        assert len(cached) == len(fresh) == 2
        for bc, bf in zip(cached, fresh):
            for k in ("video_latents", "ref_latents", "text_embeds"):
                np.testing.assert_allclose(
                    np.asarray(bc[k]), np.asarray(bf[k]), atol=1e-6, rtol=1e-6,
                    err_msg=f"epoch={epoch} {k}",
                )
    assert len(cache) == 2  # one entry per clip, filled in epoch 0
    # different epochs draw different posterior noise from the same moments
    a = np.asarray(next(iter(latent_batches(ds, pipe, 1, seed=0, cache=cache)))["video_latents"])
    b = np.asarray(next(iter(latent_batches(ds, pipe, 1, seed=1, cache=cache)))["video_latents"])
    assert np.abs(a - b).max() > 1e-4


def test_prefetch_batches_order_and_errors():
    assert list(prefetch_batches(iter(range(7)), depth=2)) == list(range(7))

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = prefetch_batches(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_prefetch_batches_early_close_stops_producer():
    """Abandoning the generator (break at max_train_steps) must unblock
    and stop the producer thread instead of leaving it pinned on q.put."""
    import threading

    produced = []

    def source():
        for i in range(1000):
            produced.append(i)
            yield i

    before = threading.active_count()
    it = prefetch_batches(source(), depth=1)
    assert next(it) == 0
    it.close()  # what `break` out of a for-loop does via GC
    # the finally-block joins the producer; thread count returns to baseline
    assert threading.active_count() <= before
    assert len(produced) < 10  # producer stopped early, not after 1000


def test_latent_batches_cache_holds_host_arrays(tmp_path):
    """The encode-once cache must store numpy (host) arrays — device
    entries would accumulate in HBM across a realistic dataset."""
    import numpy as np

    pipe, ds = _tiny_pipe_and_ds(tmp_path)
    cache: dict = {}
    next(iter(latent_batches(ds, pipe, batch_size=1, seed=0, cache=cache)))
    assert cache
    for entry in cache.values():
        for v in entry.values():
            assert isinstance(v, np.ndarray), type(v)


def test_disk_encode_cache_roundtrip(tmp_path):
    import os

    """cache_dir persists encodings: a fresh process (simulated by a new
    in-memory cache + an encode function that would fail) serves batches
    straight from disk, and stale-key invalidation is content-addressed."""
    import numpy as np

    from s2v_tpu.training import data as tdata

    pipe, ds = _tiny_pipe_and_ds(tmp_path)
    cdir = str(tmp_path / "enc_cache")

    b1 = list(tdata.latent_batches(ds, pipe, 1, seed=0, cache={}, cache_dir=cdir))
    files = [f for f in os.listdir(cdir) if f.endswith(".npz")]
    assert len(files) == len(ds)

    # second "run": encoding must not be touched (poison it)
    real = tdata._encode_item_moments

    def boom(*a, **k):
        raise AssertionError("disk cache miss: encode was called")

    tdata._encode_item_moments = boom
    try:
        b2 = list(tdata.latent_batches(ds, pipe, 1, seed=0, cache={}, cache_dir=cdir))
    finally:
        tdata._encode_item_moments = real
    assert len(b2) == len(b1)
    # same deterministic seed -> identical noised batches from disk
    np.testing.assert_allclose(
        np.asarray(b1[0]["video_latents"]), np.asarray(b2[0]["video_latents"]),
        rtol=2e-5, atol=1e-5,
    )

    # prompt change invalidates the key (different content address)
    old_path = tdata._disk_cache_path(cdir, ds, 0)
    ds.prompts[0] = "a completely different prompt"
    assert tdata._disk_cache_path(cdir, ds, 0) != old_path
