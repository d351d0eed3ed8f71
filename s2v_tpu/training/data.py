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
from typing import Iterator, List, Optional, Sequence, Tuple

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


def latent_batches(
    dataset: VideoFolderDataset,
    pipe,  # S2VPipeline (vae + t5 + tokenizer)
    batch_size: int = 1,
    seed: int = 0,
    rng_noise: bool = True,
) -> Iterator[dict]:
    """Shuffled epoch of training batches: VAE-encoded video latents
    (sampled posterior x scaling factor), ref latents, T5 prompt embeds —
    the inputs of ``s2v_tpu.training.lora.lora_loss_fn``."""
    import jax
    import jax.numpy as jnp

    from s2v_tpu.models.t5 import t5_encode
    from s2v_tpu.models.vae import gaussian_sample, vae_encode

    order = list(range(len(dataset)))
    random.Random(seed).shuffle(order)
    key = jax.random.PRNGKey(seed)

    for start in range(0, len(order) - batch_size + 1, batch_size):
        items = [dataset[i] for i in order[start : start + batch_size]]
        video = jnp.asarray(np.stack([it["video"] for it in items]), pipe.vae_cfg.dtype)
        ref = jnp.asarray(np.stack([it["ref_image"] for it in items]), pipe.vae_cfg.dtype)[:, None]

        key, k1, k2 = jax.random.split(key, 3)
        vm = vae_encode(pipe.vae_params, pipe.vae_cfg, video)
        noise_v = (
            jax.random.normal(k1, vm.shape[:-1] + (vm.shape[-1] // 2,), jnp.float32)
            if rng_noise
            else None
        )
        video_latents = gaussian_sample(vm, noise_v) * pipe.vae_cfg.scaling_factor

        rm = vae_encode(pipe.vae_params, pipe.vae_cfg, ref)
        noise_r = (
            jax.random.normal(k2, rm.shape[:-1] + (rm.shape[-1] // 2,), jnp.float32)
            if rng_noise
            else None
        )
        ref_latents = gaussian_sample(rm, noise_r) * pipe.vae_cfg.scaling_factor

        ids = pipe.tokenizer.encode(
            [it["prompt"] for it in items], pipe.transformer_cfg.max_text_seq_length
        )
        text_embeds = t5_encode(pipe.t5_params, pipe.t5_cfg, jnp.asarray(ids))

        yield {
            "video_latents": video_latents,
            "ref_latents": ref_latents,
            "text_embeds": text_embeds,
        }
