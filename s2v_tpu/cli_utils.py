"""Shared argparse coercers / choices for the CLI entry points.

One home for the pieces ``cli.py``, ``serve.py`` and ``train.py`` all
need, so flag semantics can't drift between entry points (the same
reasoning that put the backend-name list in ops/attention.py).
"""

from __future__ import annotations

from s2v_tpu.ops.attention import ATTENTION_BACKENDS

ATTENTION_BACKEND_CHOICES = list(ATTENTION_BACKENDS)


def str2bool(v):
    if isinstance(v, bool):
        return v
    if str(v).lower() in ("true", "1", "yes", "y"):
        return True
    if str(v).lower() in ("false", "0", "no", "n"):
        return False
    raise ValueError(f"expected a boolean, got {v!r}")


def tiling_policy(v):
    """--enable_tiling: true | false | auto (tile above native size)."""
    if str(v).lower() == "auto":
        return "auto"
    return str2bool(v)


def add_compilation_cache_flag(p):
    p.add_argument(
        "--compilation_cache_dir", type=str, default="auto",
        help="persistent XLA compilation cache: 'auto' (default, "
             "~/.cache/s2v_tpu/xla or $S2V_TPU_CACHE_DIR), 'off', or a path. "
             "Repeat invocations / daemon restarts skip the flagship jit "
             "compile (~20-40 s on TPU) by reloading compiled executables "
             "from disk")


def enable_compilation_cache(spec: str = "auto", min_compile_seconds: float = 1.0):
    """Point JAX's persistent compilation cache at a durable directory.

    The reference has no equivalent (torch eager, cuDNN autotune only);
    under XLA everything is one big compiled program, so cold-start cost
    without this is the full trace+compile on every process start.  Keyed
    by HLO hash: any shape/flag change compiles fresh, unchanged programs
    load in ~100s of ms.  Returns the directory or None when disabled."""
    import logging
    import os

    import jax

    def _disabled(v) -> bool:
        return v is None or str(v).lower() in ("off", "none", "false", "0", "")

    if _disabled(spec):
        return None
    if str(spec).lower() == "auto":
        spec = os.environ.get(
            "S2V_TPU_CACHE_DIR", os.path.join("~", ".cache", "s2v_tpu", "xla")
        )
        if _disabled(spec):  # S2V_TPU_CACHE_DIR=off disables too
            return None
    path = os.path.expanduser(str(spec))
    try:
        os.makedirs(path, exist_ok=True)
    except OSError as e:
        # the cache is an optimization: degrade to disabled, never fail the
        # run (read-only HOME in a container, etc.)
        logging.getLogger("s2v_tpu").warning(
            "compilation cache disabled (cannot create %s: %s)", path, e
        )
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_seconds))
    return path


def probe_backend(timeout_s: float) -> dict:
    """Initialize the JAX backend on a side daemon thread, bounded.

    Returns ``{"devices": [...]}`` on success, ``{"error": exc}`` on a
    fast failure, or ``{}`` when init is still hung at the deadline.
    Shared by ensure_backend, tools/doctor.py, and bench.py so the
    watchdog semantics cannot drift between them."""
    import threading
    import time

    result: dict = {}

    def _init():
        try:
            import jax

            result["devices"] = jax.devices()
        except BaseException as e:  # report fast failures immediately
            result["error"] = e

    th = threading.Thread(target=_init, daemon=True)
    th.start()
    deadline = time.monotonic() + timeout_s
    while th.is_alive() and time.monotonic() < deadline:
        th.join(1.0)
        if "error" in result:
            break
    return result


def ensure_backend(timeout_s: int = 0):
    """Opt-in bounded first device touch for the CLI entry points.

    The device relay in some deployments can hang indefinitely at backend
    init (observed: jax.devices() stuck >15 min at 0% CPU).  With
    ``S2V_TPU_INIT_TIMEOUT=<seconds>`` set (or ``timeout_s`` passed), the
    backend is initialized on a side thread and a hang exits with a clear
    message instead of wedging a daemon/trainer at startup.  Off by
    default — a busy-but-healthy init (e.g. a long compile queue) must not
    kill a training run."""
    import os

    if not timeout_s:
        raw = os.environ.get("S2V_TPU_INIT_TIMEOUT", "0") or "0"
        try:
            timeout_s = int(float(raw))
        except ValueError:
            raise SystemExit(
                f"S2V_TPU_INIT_TIMEOUT={raw!r} is not a number of seconds"
            ) from None
    if timeout_s <= 0:
        return
    result = probe_backend(timeout_s)
    if "error" in result:
        raise SystemExit(f"jax backend init failed: {result['error']!r}")
    if "devices" not in result:
        raise SystemExit(
            f"jax backend init did not complete in {timeout_s}s (device "
            f"relay unresponsive); retry later, or run on CPU with "
            f"JAX_PLATFORMS=cpu"
        )
