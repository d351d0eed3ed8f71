"""Post-processing + media IO (reference L6 equivalent).

Parity targets: ``VideoProcessor.postprocess_video`` /
``VaeImageProcessor.denormalize`` (video_processor.py:89-113,
image_processor.py:227 — ``(x/2+0.5).clamp(0,1)``) and ``export_to_video``
(utils/export_utils.py:143-186 — uint8 rounding, mp4 mux at the given fps).

Muxing uses the native C++ muxer (native/mp4_muxer.cc — libavformat +
libx264, the direct equivalent of the reference's imageio-ffmpeg binary),
falling back to OpenCV's bundled writer and finally a raw ``.npy`` dump if
no video backend is available.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def denormalize_video(video: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> [0, 1] float32 (reference image_processor.py:227)."""
    return np.clip(np.asarray(video, dtype=np.float32) / 2.0 + 0.5, 0.0, 1.0)


def to_uint8_frames(video01: np.ndarray) -> np.ndarray:
    """[0,1] float [T, H, W, 3] -> uint8 (reference export_utils.py:158)."""
    return np.round(video01 * 255.0).astype(np.uint8)


def export_to_video(frames: np.ndarray, path: str, fps: int = 8) -> str:
    """Write [T, H, W, 3] frames (uint8 RGB, or [0,1] float) to mp4.

    Mirrors reference ``export_to_video`` semantics (8 fps default).
    """
    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = to_uint8_frames(denormalize_video(frames) if frames.min() < 0 else frames)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    try:
        from s2v_tpu.utils import mp4_native

        return mp4_native.write_mp4(frames, path, fps=fps)
    except Exception:
        pass
    try:
        import cv2

        t, h, w, _ = frames.shape
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if not writer.isOpened():
            raise RuntimeError("cv2.VideoWriter failed to open")
        for frame in frames:
            writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        writer.release()
        return path
    except Exception:
        alt = os.path.splitext(path)[0] + ".npy"
        np.save(alt, frames)
        return alt


def export_to_video_with_frames(
    frames: np.ndarray, path: str, fps: int = 8, frames_dir: Optional[str] = None
) -> str:
    """mp4 + per-frame PNGs (reference export_utils.py:188-234 eval helper)."""
    out = export_to_video(frames, path, fps)
    frames_dir = frames_dir or os.path.splitext(path)[0] + "_frames"
    os.makedirs(frames_dir, exist_ok=True)
    arr = np.asarray(frames)
    if arr.dtype != np.uint8:
        arr = to_uint8_frames(denormalize_video(arr) if arr.min() < 0 else arr)
    try:
        import cv2

        for i, frame in enumerate(arr):
            cv2.imwrite(os.path.join(frames_dir, f"frame_{i:04d}.png"), cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    except Exception:
        np.save(os.path.join(frames_dir, "frames.npy"), arr)
    return out


def load_image(path: str) -> np.ndarray:
    """Load an RGB image as float32 [-1, 1], shape [H, W, 3]
    (reference src/video_generate.py:26-33; NO resizing — the reference
    feeds the image at its native resolution)."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32)
    return img / 255.0 * 2.0 - 1.0


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    """Peak signal-to-noise ratio (the BASELINE.json quality metric)."""
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(max_val**2 / mse)
