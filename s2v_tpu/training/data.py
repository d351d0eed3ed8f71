"""Training data pipeline: video folder -> latent batches.

The reference releases no data pipeline (its upstream trainer templates read
video folders with decord + a prompt column file —
examples/cogvideo/train_cogvideox_lora.py, unused).  This is the TPU-native
equivalent: host-side OpenCV frame decoding with the reference's geometry
conventions (resize to H x W, first `max_num_frames` frames with
skip-frame trimming, [-1, 1] normalization), VAE encoding to latents on
device, and a simple shuffled epoch iterator.

Layout: returns channels-last ``[B, T, H, W, 3]`` pixel tensors /
``[B, F, h, w, C]`` latents matching the rest of the framework.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np


VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def read_video_frames(
    path: str,
    num_frames: int = 49,
    height: int = 480,
    width: int = 720,
    skip_frames_start: int = 0,
    skip_frames_end: int = 0,
) -> np.ndarray:
    """Decode, trim, resize -> float32 [-1, 1] ``[T, H, W, 3]``.

    Mirrors the reference CLI's frame conventions (--max_num_frames,
    --skip_frames_start/end, src/inference.py:53-55); pads by repeating the
    last frame if the clip is short (upstream trainer behaviour)."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames: List[np.ndarray] = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame)
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")

    end = len(frames) - skip_frames_end
    frames = frames[skip_frames_start:end][:num_frames]
    while len(frames) < num_frames:
        frames.append(frames[-1])

    out = np.empty((num_frames, height, width, 3), np.float32)
    for i, f in enumerate(frames):
        f = cv2.resize(f, (width, height), interpolation=cv2.INTER_AREA)
        out[i] = cv2.cvtColor(f, cv2.COLOR_BGR2RGB).astype(np.float32)
    return out / 255.0 * 2.0 - 1.0


@dataclass
class VideoFolderDataset:
    """``root/*.mp4`` with optional ``root/prompts.txt`` (one prompt per
    line, aligned with the sorted video list) and optional per-video subject
    image ``<stem>_ref.png`` for the S2V ref stream."""

    root: str
    num_frames: int = 49
    height: int = 480
    width: int = 720

    def __post_init__(self):
        self.videos = sorted(
            os.path.join(self.root, f)
            for f in os.listdir(self.root)
            if f.lower().endswith(VIDEO_EXTS)
        )
        if not self.videos:
            raise ValueError(f"no videos in {self.root}")
        prompts_file = os.path.join(self.root, "prompts.txt")
        if os.path.exists(prompts_file):
            with open(prompts_file) as f:
                self.prompts = [line.strip() for line in f if line.strip()]
        else:
            self.prompts = [""] * len(self.videos)

    def __len__(self) -> int:
        return len(self.videos)

    def __getitem__(self, idx: int):
        path = self.videos[idx]
        video = read_video_frames(path, self.num_frames, self.height, self.width)
        ref_path = os.path.splitext(path)[0] + "_ref.png"
        if os.path.exists(ref_path):
            from s2v_tpu.utils.video import load_image

            ref = load_image(ref_path)
        else:
            ref = video[0]  # subject defaults to the first frame
        return {"video": video, "ref_image": ref, "prompt": self.prompts[idx % len(self.prompts)]}


def _encode_item_moments(dataset: VideoFolderDataset, pipe, idx: int) -> dict:
    """Deterministic per-item encodings: VAE posterior *moments*
    (mean|logvar — NOT a sample, so caching them does not freeze the
    per-epoch posterior noise) and the T5 prompt embedding."""
    import jax.numpy as jnp

    from s2v_tpu.models.t5 import t5_encode
    from s2v_tpu.models.vae import vae_encode

    it = dataset[idx]
    video = jnp.asarray(it["video"], pipe.vae_cfg.dtype)[None]
    ref = jnp.asarray(it["ref_image"], pipe.vae_cfg.dtype)[None, None]
    vm = vae_encode(pipe.vae_params, pipe.vae_cfg, video)
    rm = vae_encode(pipe.vae_params, pipe.vae_cfg, ref)
    ids = pipe.tokenizer.encode([it["prompt"]], pipe.transformer_cfg.max_text_seq_length)
    emb = t5_encode(pipe.t5_params, pipe.t5_cfg, jnp.asarray(ids))
    return {"vm": vm[0], "rm": rm[0], "emb": emb[0]}


def _disk_cache_path(cache_dir: str, dataset: VideoFolderDataset, idx: int) -> str:
    """Content-addressed path for a clip's cached encodings: keyed on the
    video file identity (path/mtime/size), the requested geometry, the
    prompt, and the optional subject image's identity — any change
    invalidates the entry."""
    import hashlib

    path = dataset.videos[idx]
    st = os.stat(path)
    prompt = dataset.prompts[idx % len(dataset.prompts)]
    ref_path = os.path.splitext(path)[0] + "_ref.png"
    ref_id = ""
    if os.path.exists(ref_path):
        rst = os.stat(ref_path)
        ref_id = f"|{rst.st_mtime_ns}|{rst.st_size}"
    ident = (
        f"{os.path.abspath(path)}|{st.st_mtime_ns}|{st.st_size}|"
        f"{dataset.num_frames}x{dataset.height}x{dataset.width}|{prompt}{ref_id}"
    )
    return os.path.join(
        cache_dir, hashlib.sha1(ident.encode()).hexdigest()[:20] + ".npz"
    )


def latent_batches(
    dataset: VideoFolderDataset,
    pipe,  # S2VPipeline (vae + t5 + tokenizer)
    batch_size: int = 1,
    seed: int = 0,
    rng_noise: bool = True,
    cache: Optional[dict] = None,
    cache_dir: Optional[str] = None,
) -> Iterator[dict]:
    """Shuffled epoch of training batches: VAE-encoded video latents
    (sampled posterior x scaling factor), ref latents, T5 prompt embeds —
    the inputs of ``s2v_tpu.training.lora.lora_loss_fn``.

    ``cache``: pass the same dict across epochs to encode each clip ONCE —
    the deterministic VAE moments / T5 embeds are reused, while the
    posterior noise is still freshly sampled per epoch (identical
    semantics to re-encoding; the heavy host decode + encoder forwards
    are skipped from epoch 2 on).

    ``cache_dir``: additionally persist the encodings to disk
    (content-addressed npz; requires ``cache``), so a RESTARTED run skips
    the VAE/T5 encode pass entirely — caching moments rather than sampled
    latents keeps the per-epoch posterior noise fresh across restarts
    too."""
    import jax
    import jax.numpy as jnp

    from s2v_tpu.models.vae import gaussian_sample

    if cache_dir is not None:
        os.makedirs(cache_dir, exist_ok=True)
    order = list(range(len(dataset)))
    random.Random(seed).shuffle(order)
    key = jax.random.PRNGKey(seed)

    def moments(idx: int) -> dict:
        if cache is None:
            return _encode_item_moments(dataset, pipe, idx)
        if idx not in cache:
            # Cache HOST-side (numpy): the cache grows with the dataset, and
            # device-resident entries would accumulate in HBM across epochs
            # (hundreds of clips x several MB of moments+embeds each).  The
            # jnp.stack at batch build re-uploads just the batch.
            loaded = None
            disk = _disk_cache_path(cache_dir, dataset, idx) if cache_dir else None
            if disk and os.path.exists(disk):
                with np.load(disk) as z:
                    loaded = {k: z[k] for k in ("vm", "rm", "emb")}
            if loaded is None:
                loaded = jax.device_get(_encode_item_moments(dataset, pipe, idx))
                if disk:
                    tmp = disk + ".tmp"
                    with open(tmp, "wb") as f:  # file object: no .npz suffixing
                        np.savez(f, **loaded)
                    os.replace(tmp, disk)  # atomic publish
            cache[idx] = loaded
        return cache[idx]

    for start in range(0, len(order) - batch_size + 1, batch_size):
        items = [moments(i) for i in order[start : start + batch_size]]
        vm = jnp.stack([it["vm"] for it in items])
        rm = jnp.stack([it["rm"] for it in items])
        text_embeds = jnp.stack([it["emb"] for it in items])

        key, k1, k2 = jax.random.split(key, 3)
        noise_v = (
            jax.random.normal(k1, vm.shape[:-1] + (vm.shape[-1] // 2,), jnp.float32)
            if rng_noise
            else None
        )
        video_latents = gaussian_sample(vm, noise_v) * pipe.vae_cfg.scaling_factor
        noise_r = (
            jax.random.normal(k2, rm.shape[:-1] + (rm.shape[-1] // 2,), jnp.float32)
            if rng_noise
            else None
        )
        ref_latents = gaussian_sample(rm, noise_r) * pipe.vae_cfg.scaling_factor

        yield {
            "video_latents": video_latents,
            "ref_latents": ref_latents,
            "text_embeds": text_embeds,
        }


def prefetch_batches(it: Iterator[dict], depth: int = 2) -> Iterator[dict]:
    """Run ``it`` on a background thread with a bounded queue so the
    host-side work of batch i+1 (cv2 decode, preprocessing, dispatch of
    the encoder forwards) overlaps the device train step on batch i.
    JAX dispatch is async, but the cv2 decode is blocking host work the
    train loop would otherwise serialize with.

    Exceptions from the producer re-raise at the consuming ``next()``.
    Closing/abandoning the generator early (e.g. ``break`` at
    ``max_train_steps`` mid-epoch) signals the producer to stop, so no
    thread stays blocked on a full queue pinning device buffers."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    def put(item) -> bool:
        # bounded put that gives up when the consumer has gone away
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def produce():
        try:
            for item in it:
                if not put(item):
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer
            put((_END, e))
            return
        put((_END, None))

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if isinstance(item, tuple) and len(item) == 2 and item[0] is _END:
                if item[1] is not None:
                    raise item[1]
                return
            yield item
    finally:
        stop.set()
        while not q.empty():  # unblock a producer mid-put, drop queued batches
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5.0)
