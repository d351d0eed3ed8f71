"""Frame-quality comparison between two clips (BASELINE.json quality metric:
PSNR > 35 dB vs reference frames).

    python tools/eval_psnr.py ours.mp4 reference.mp4
    python tools/eval_psnr.py ours_frames_dir reference_frames_dir
"""

from __future__ import annotations

import os
import sys

import numpy as np


def load_clip(path: str) -> np.ndarray:
    """mp4 / frame-dir / .npy -> float32 [T, H, W, 3] in [0, 1]."""
    if path.endswith(".npy"):
        arr = np.load(path)
    elif os.path.isdir(path):
        import cv2

        files = sorted(f for f in os.listdir(path) if f.endswith((".png", ".jpg")))
        arr = np.stack([
            cv2.cvtColor(cv2.imread(os.path.join(path, f)), cv2.COLOR_BGR2RGB) for f in files
        ])
    else:
        import cv2

        cap = cv2.VideoCapture(path)
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        cap.release()
        arr = np.stack(frames)
    arr = arr.astype(np.float32)
    if arr.max() > 1.5:
        arr = arr / 255.0
    return arr


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(__doc__)
        return 1
    from s2v_tpu.utils.video import psnr

    a, b = load_clip(argv[0]), load_clip(argv[1])
    t = min(len(a), len(b))
    a, b = a[:t], b[:t]
    if a.shape != b.shape:
        print(f"shape mismatch: {a.shape} vs {b.shape}")
        return 1
    per_frame = [psnr(a[i], b[i]) for i in range(t)]
    print(f"frames compared: {t}")
    print(f"PSNR overall: {psnr(a, b):.2f} dB (target > 35)")
    print(f"PSNR per-frame: min {min(per_frame):.2f}, max {max(per_frame):.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
