"""Logging + phase profiling (reference L? aux subsystems, SURVEY.md §5).

The reference's observability is a std-logging wrapper + tqdm progress
(diffusers utils/logging.py, pipeline_utils.py:1555).  Here: the same thin
std-logging facade plus first-class ``jax.profiler`` phase annotations —
``phase("denoise-step")`` blocks show up in TensorBoard/xprof traces
captured via the CLI's ``--profile_dir``.
"""

from __future__ import annotations

import contextlib
import logging
import os
import sys
import time
from typing import Iterator

_FORMAT = "%(asctime)s [%(levelname)s] %(name)s: %(message)s"
_configured = False


def get_logger(name: str = "s2v_tpu") -> logging.Logger:
    global _configured
    if not _configured:
        level = os.environ.get("S2V_TPU_LOG_LEVEL", "INFO").upper()
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        root = logging.getLogger("s2v_tpu")
        root.addHandler(handler)
        root.setLevel(level)
        root.propagate = False
        _configured = True
    return logging.getLogger(name)


@contextlib.contextmanager
def phase(name: str, log: bool = False) -> Iterator[None]:
    """Annotate a pipeline phase for jax.profiler traces (+optional timing log)."""
    import jax

    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    if log:
        get_logger().info("%s: %.2fs", name, time.perf_counter() - t0)


class progress:
    """Minimal tqdm-free progress reporter for host-side loops."""

    def __init__(self, total: int, desc: str = ""):
        self.total = total
        self.desc = desc
        self.n = 0
        self._t0 = time.perf_counter()

    def update(self, k: int = 1):
        self.n += k
        dt = time.perf_counter() - self._t0
        sys.stderr.write(f"\r{self.desc} {self.n}/{self.total} [{dt:.0f}s]")
        if self.n >= self.total:
            sys.stderr.write("\n")
        sys.stderr.flush()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
