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
