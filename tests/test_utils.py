"""Post-processing / media utils tests (reference L6 parity)."""

import os

import numpy as np
import pytest

from s2v_tpu.utils.video import (
    denormalize_video,
    export_to_video,
    export_to_video_with_frames,
    psnr,
    to_uint8_frames,
)


def test_denormalize_matches_reference():
    x = np.array([-1.0, -0.5, 0.0, 0.5, 1.0, 2.0], np.float32)
    out = denormalize_video(x)
    np.testing.assert_allclose(out, [0.0, 0.25, 0.5, 0.75, 1.0, 1.0])


def test_uint8_rounding():
    x = np.array([0.0, 0.5, 1.0], np.float32)
    np.testing.assert_array_equal(to_uint8_frames(x), [0, 128, 255])


def test_export_mp4(tmp_path):
    frames = (np.random.RandomState(0).rand(5, 48, 64, 3) * 255).astype(np.uint8)
    out = export_to_video(frames, str(tmp_path / "v.mp4"), fps=8)
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_export_with_frames(tmp_path):
    frames = (np.random.RandomState(0).rand(3, 32, 32, 3) * 255).astype(np.uint8)
    out = export_to_video_with_frames(frames, str(tmp_path / "v.mp4"), fps=8)
    frames_dir = str(tmp_path / "v_frames")
    assert os.path.isdir(frames_dir)
    assert len(os.listdir(frames_dir)) == 3


def test_psnr():
    a = np.zeros((4, 4))
    assert psnr(a, a) == float("inf")
    b = a + 0.1
    assert abs(psnr(a, b) - 20.0) < 1e-6


def test_native_muxer_roundtrip(tmp_path):
    """Native C++ muxer (libavformat+libx264): frame count, fps metadata,
    odd-size padding, and content PSNR on compressible frames."""
    pytest.importorskip("cv2")
    from s2v_tpu.utils import mp4_native

    if not mp4_native.is_available():
        pytest.skip("native muxer not buildable here")
    import cv2

    t, h, w = 5, 33, 47  # odd dims -> pad path
    grad = np.tile(np.linspace(0, 255, w, dtype=np.uint8)[None, :, None], (h, 1, 3))
    frames = np.stack([np.roll(grad, i * 3, axis=1) for i in range(t)])
    p = mp4_native.write_mp4(frames, str(tmp_path / "n.mp4"), fps=8)
    cap = cv2.VideoCapture(p)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == t
    assert abs(cap.get(cv2.CAP_PROP_FPS) - 8.0) < 0.01
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == w + 1  # padded even
    ok, f0 = cap.read()
    assert ok
    f0 = cv2.cvtColor(f0, cv2.COLOR_BGR2RGB).astype(np.float64)[:h, :w]
    mse = np.mean((f0 - frames[0].astype(np.float64)) ** 2)
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 35.0
