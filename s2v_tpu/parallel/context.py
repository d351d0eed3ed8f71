"""Logical-axis sharding context.

The model code calls :func:`constrain` with *logical* axis names
("dp"/"sp"/"tp"); outside a parallel context it is the identity, and inside
one it becomes ``with_sharding_constraint`` onto the active
``jax.sharding.Mesh``.  This keeps the pure model functions free of any mesh
plumbing while letting GSPMD propagate real shardings (the TPU-native
replacement for the reference's nonexistent distributed layer —
SURVEY.md §2.5)."""

from __future__ import annotations

import contextlib
from typing import Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE: Dict[str, Optional[object]] = {"mesh": None, "map": None}


@contextlib.contextmanager
def mesh_context(mesh: Mesh, logical_to_mesh: Dict[str, Optional[str]]):
    """Activate a mesh + logical->mesh axis mapping, e.g.
    ``{"dp": "data", "tp": "model", "sp": None}``."""
    prev = (_ACTIVE["mesh"], _ACTIVE["map"])
    _ACTIVE["mesh"], _ACTIVE["map"] = mesh, dict(logical_to_mesh)
    try:
        yield
    finally:
        _ACTIVE["mesh"], _ACTIVE["map"] = prev


def constrain(x, *logical_axes):
    """Apply a sharding constraint along logical axes (None = replicated).

    No-op when no mesh context is active, so single-chip paths compile
    unchanged."""
    mesh, mapping = _ACTIVE["mesh"], _ACTIVE["map"]
    if mesh is None or mapping is None:
        return x
    spec = P(*[mapping.get(ax) if ax is not None else None for ax in logical_axes])
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE["mesh"]


def active_axis(logical: str) -> Optional[str]:
    """Mesh axis name a logical axis ("dp"/"tp"/"sp") is mapped to, if any."""
    mapping = _ACTIVE["map"]
    return mapping.get(logical) if mapping else None
