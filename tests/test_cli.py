"""End-to-end drive of the reference-compatible inference CLI
(`python -m s2v_tpu.cli`, mirroring src/inference.py:37-62) against a tiny
HF-layout snapshot — the exact offline real-weight on-ramp command from
README ("Real-weight on-ramp"): snapshot dir + LoRA checkpoint dir + ref
image -> mp4 on disk.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

# two subprocess jit sessions (~10-15 min loaded; r5 durations profile)
pytestmark = [pytest.mark.slow, pytest.mark.heavy]


def test_cli_inference_e2e(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snap, lora = str(tmp_path / "snap"), str(tmp_path / "lora")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "make_tiny_snapshot.py"),
         snap, "--lora_out", lora],
        capture_output=True, text=True, timeout=300, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]

    ref = tmp_path / "ref.png"
    from PIL import Image

    Image.fromarray(
        (np.random.RandomState(0).rand(32, 32, 3) * 255).astype("uint8")
    ).save(ref)

    outdir = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "s2v_tpu.cli",
         "--pretrained_model_name_or_path", snap,
         "--checkpoint_path", lora,
         "--ref_img_path", str(ref),
         "--prompt", "<cls> a pig walking",
         "--height", "32", "--width", "32", "--max_num_frames", "9",
         "--num_inference_steps", "2", "--output_dir", str(outdir)],
        # generous: a 1-CPU host under concurrent load (the on-chip bench
        # runs share this box) can stretch the tiny jit several-fold
        capture_output=True, text=True, timeout=1800, cwd=repo, env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    mp4s = [f for f in os.listdir(outdir) if f.endswith(".mp4")]
    assert mp4s, os.listdir(outdir)
    path = os.path.join(outdir, mp4s[0])
    assert os.path.getsize(path) > 0

    import cv2

    cap = cv2.VideoCapture(path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 9
    assert round(cap.get(cv2.CAP_PROP_FPS)) == 8
    cap.release()
