"""ctypes binding for the native C++ MP4 muxer (native/mp4_muxer.cc) —
the framework's equivalent of the reference's imageio-ffmpeg binary
dependency (reference utils/export_utils.py:158-186 muxes H.264 yuv420p
mp4 via the ffmpeg executable; here we link libavformat/libavcodec
directly).

Builds the shared library on first use if g++ and the libav* dev headers
are available; callers fall back to other backends when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmp4_muxer.so")

_lib: Optional[ctypes.CDLL] = None


def _load_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    # always invoke make: it rebuilds on source staleness and is a ~ms no-op
    # otherwise; a missing toolchain only matters if the .so is also absent
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "libmp4_muxer.so"], check=True, capture_output=True
        )
    except Exception:
        if not os.path.exists(_LIB_PATH):
            raise
    lib = ctypes.CDLL(_LIB_PATH)
    lib.s2v_mp4_open.restype = ctypes.c_void_p
    lib.s2v_mp4_open.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.s2v_mp4_write_frame.restype = ctypes.c_int
    lib.s2v_mp4_write_frame.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.s2v_mp4_close.restype = ctypes.c_int
    lib.s2v_mp4_close.argtypes = [ctypes.c_void_p]
    lib.s2v_mp4_last_error.restype = ctypes.c_char_p
    lib.s2v_mp4_last_error.argtypes = []
    _lib = lib
    return lib


def is_available() -> bool:
    try:
        _load_lib()
        return True
    except Exception:
        return False


def write_mp4(frames: np.ndarray, path: str, fps: int = 8, crf: int = 23) -> str:
    """Encode uint8 RGB frames [T, H, W, 3] to an H.264 mp4 at ``path``.

    Odd spatial sizes are edge-padded to even (yuv420p requirement —
    imageio-ffmpeg instead pads to 16-px macroblocks with a warning).
    """
    lib = _load_lib()
    frames = np.ascontiguousarray(frames)
    if frames.dtype != np.uint8 or frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError(f"expected uint8 [T, H, W, 3], got {frames.dtype} {frames.shape}")
    t, h, w, _ = frames.shape
    if h % 2 or w % 2:
        frames = np.pad(frames, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)), mode="edge")
        t, h, w, _ = frames.shape

    ctx = lib.s2v_mp4_open(path.encode(), w, h, int(fps), int(crf))
    if not ctx:
        raise RuntimeError(f"mp4 open failed: {lib.s2v_mp4_last_error().decode()}")
    try:
        for frame in frames:
            buf = np.ascontiguousarray(frame)
            if lib.s2v_mp4_write_frame(ctx, buf.ctypes.data_as(ctypes.c_char_p)) != 0:
                raise RuntimeError(f"mp4 write failed: {lib.s2v_mp4_last_error().decode()}")
    except Exception:
        lib.s2v_mp4_close(ctx)
        raise
    if lib.s2v_mp4_close(ctx) != 0:
        raise RuntimeError(f"mp4 close failed: {lib.s2v_mp4_last_error().decode()}")
    return path
