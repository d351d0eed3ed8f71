"""Multi-host (DCN x ICI) mesh construction and process bootstrap.

The reference is single-GPU (SURVEY.md §2.5); its unused trainers lean on
accelerate/NCCL DDP.  The TPU-native story: ``jax.distributed`` for process
bootstrap, then one global mesh whose *outer* axes span hosts (DCN) and
*inner* axes span the chips of each host/slice (ICI).  Shardings that keep
heavy collectives on inner axes ride ICI; only batch-replication traffic
crosses DCN — the layout recommended throughout the scaling-book recipe.

Usage (same code on 1 host or N hosts):

    initialize_distributed()                    # no-op single-process
    mesh = make_hybrid_mesh({"data": n_hosts}, {"model": 4, "seq": 2})
    with mesh: ...
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Bootstrap ``jax.distributed`` for multi-host runs.

    Arguments fall back to the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
    and, on Cloud TPU, the TPU metadata auto-detection built into
    ``jax.distributed.initialize``).  Returns True if a multi-process
    runtime was initialized, False for the single-process no-op.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False  # single-process (or TPU pod auto-detect not requested)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_hybrid_mesh(
    dcn_axes: Dict[str, int], ici_axes: Dict[str, int], devices=None
) -> Mesh:
    """Mesh with named DCN (outer, across hosts) and ICI (inner, within a
    slice) axes, e.g. ``make_hybrid_mesh({"data": 2}, {"model": 4})``.

    Multi-process: uses ``mesh_utils.create_hybrid_device_mesh`` so the DCN
    axes map exactly onto process granules and the ICI axes onto each
    granule's torus with bandwidth-aware ordering.  Single-process (tests,
    one host): the same named layout via a plain reshape — DCN axes are
    then just outer ICI axes, which preserves the program semantics.
    """
    devices = list(devices) if devices is not None else jax.devices()
    names = list(dcn_axes) + list(ici_axes)
    dcn_shape = [dcn_axes[n] for n in dcn_axes]
    ici_shape = [ici_axes[n] for n in ici_axes]
    total = int(np.prod(dcn_shape) * np.prod(ici_shape))
    if total != len(devices):
        raise ValueError(f"mesh wants {total} devices, have {len(devices)}")

    n_proc = len({d.process_index for d in devices})
    if n_proc > 1:
        from jax.experimental import mesh_utils

        # hybrid API takes same-rank shapes whose elementwise product is the
        # global shape: pad each side with 1s so our named axes stay distinct
        ici_full = [1] * len(dcn_shape) + ici_shape
        dcn_full = dcn_shape + [1] * len(ici_shape)
        # Granule choice adapts to the requested DCN product: slice
        # granules when the caller's DCN axes span pod slices (a slice can
        # cover several processes), process granules when they span
        # processes (CPU/simulated hosts report one slice for everything,
        # and a "data = n_hosts" layout is per-process by construction).
        n_slices = len({getattr(d, "slice_index", 0) or 0 for d in devices})
        dcn_total = int(np.prod(dcn_shape))
        if dcn_total == n_slices:
            process_is_granule = False
        elif dcn_total == n_proc:
            process_is_granule = True
        else:
            raise ValueError(
                f"DCN axes {dcn_axes} (product {dcn_total}) match neither "
                f"the slice count ({n_slices}) nor the process count "
                f"({n_proc}); size the outer axes to one of those granules"
            )
        arr = mesh_utils.create_hybrid_device_mesh(
            ici_full, dcn_full, devices=devices,
            process_is_granule=process_is_granule,
        )
        return Mesh(arr, axis_names=names)
    return Mesh(np.asarray(devices).reshape(dcn_shape + ici_shape), axis_names=names)
