"""Mesh construction + parameter/activation sharding for multi-chip runs.

The reference has no distributed code at inference (single GPU,
SURVEY.md §2.5); multi-chip is a *new* TPU-native capability:

  * **TP** ("model" axis): megatron-style head/FF sharding of the
    transformer — qkv & ff-in kernels column-sharded, out-projections
    row-sharded, collectives ride ICI via GSPMD-inserted all-reduces.
  * **SP** ("seq" axis): video-token sequence sharding for single-clip
    latency (BASELINE.json configs[4]); activations constrained along the
    token axis, attention gathers K/V.
  * **DP** ("data" axis): batch replication over DCN for multi-host.

Everything goes through ``jax.sharding`` + jit (no hand-written collectives
on this path — the Pallas ring-attention path is separate).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from s2v_tpu.config import TransformerConfig


def make_mesh(axis_sizes: Dict[str, int], devices=None) -> Mesh:
    """e.g. ``make_mesh({"data": 1, "model": 4, "seq": 2})``; total must
    equal the device count used.

    On real TPU slices the devices are ordered by ``mesh_utils`` so the
    innermost (fastest-collective) axes land on ICI-adjacent chips; a naive
    ``jax.devices()`` reshape would scatter a TP axis across the torus.
    Multi-host meshes go through :func:`s2v_tpu.parallel.multihost.make_hybrid_mesh`.
    """
    devices = list(devices) if devices is not None else jax.devices()
    names = list(axis_sizes.keys())
    shape = [axis_sizes[n] for n in names]
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    devices = devices[:n]
    if devices[0].platform == "tpu" and n > 1:
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh(shape, devices=devices)
            return Mesh(arr, axis_names=names)
        except Exception:
            pass  # odd topologies: fall back to enumeration order
    return Mesh(np.asarray(devices).reshape(shape), axis_names=names)


def transformer_param_specs(cfg: TransformerConfig, model_axis: str = "model"):
    """PartitionSpec pytree for TP-sharded transformer params.

    Per-layer (stacked) kernels carry a leading layer axis; column-parallel
    kernels shard the output feature axis, row-parallel the input axis.
    """
    m = model_axis

    def rep(tree):
        return jax.tree.map(lambda _: P(), tree)

    def block_specs():
        return {
            "norm1": {
                "linear": {"kernel": P(None, None, m), "bias": P(None, m)},
                "norm": {"weight": P(), "bias": P()},
            },
            "attn": {
                "qkv": {"kernel": P(None, None, m), "bias": P(None, m)},
                "norm_q": {"weight": P(), "bias": P()},
                "norm_k": {"weight": P(), "bias": P()},
                "to_out": {"kernel": P(None, m, None), "bias": P(None)},
            },
            "norm2": {
                "linear": {"kernel": P(None, None, m), "bias": P(None, m)},
                "norm": {"weight": P(), "bias": P()},
            },
            "ff": {
                "net_0": {"kernel": P(None, None, m), "bias": P(None, m)},
                "net_2": {"kernel": P(None, m, None), "bias": P(None)},
            },
        }

    return {
        "patch_embed": {
            "proj": {"kernel": P(), "bias": P()},
            "text_proj": {"kernel": P(), "bias": P()},
        },
        "time_embedding": {
            "linear_1": {"kernel": P(), "bias": P()},
            "linear_2": {"kernel": P(), "bias": P()},
        },
        "blocks": block_specs(),
        "norm_final": {"weight": P(), "bias": P()},
        "norm_out": {"linear": {"kernel": P(), "bias": P()}, "norm": {"weight": P(), "bias": P()}},
        "proj_out": {"kernel": P(), "bias": P()},
    }


def t5_param_specs(params, model_axis: str = "model"):
    """Megatron TP ``PartitionSpec`` tree for the T5 encoder
    (models/t5.py): q/k/v and the gated-MLP ``wi_*`` kernels are
    column-parallel (heads / d_ff sharded), ``o``/``wo`` row-parallel (the
    contraction psum is inserted by GSPMD), the relative-attention bias
    table shards its head axis, embeddings / RMSNorm weights replicate.
    Stacked per-layer kernels carry a leading layer axis (P(None, ...)).
    """
    m = model_axis

    def spec_for(path, leaf):
        keys = [str(getattr(p, "key", "")) for p in path]
        if "blocks" in keys:
            if any(k in keys for k in ("q", "k", "v", "wi_0", "wi_1")):
                return P(None, None, m)  # [L, d_model, inner/d_ff]
            if any(k in keys for k in ("o", "wo")):
                return P(None, m, None)  # [L, inner/d_ff, d_model]
            return P()  # layer norms: [L, d_model]
        if "relative_attention_bias" in keys:
            return P(None, m)  # [num_buckets, H]
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def parse_mesh_spec(spec: str) -> Dict[str, int]:
    """CLI mesh grammar -> axis sizes, e.g. ``"dp2,tp4"`` ->
    ``{"data": 2, "model": 4}`` and ``"sp8"`` -> ``{"seq": 8}``.

    Logical names (dp/tp/sp) and mesh names (data/model/seq) both accepted;
    axis order in the string is preserved (outermost first — put the
    DCN-crossing axis first on multi-host).
    """
    alias = {"dp": "data", "tp": "model", "sp": "seq",
             "data": "data", "model": "model", "seq": "seq"}
    out: Dict[str, int] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name = part.rstrip("0123456789")
        size = part[len(name):]
        if name not in alias or not size:
            raise ValueError(
                f"bad mesh spec {part!r} (want e.g. 'dp2,tp4' or 'sp8'; "
                f"axes: dp/data, tp/model, sp/seq)"
            )
        if alias[name] in out:
            raise ValueError(f"duplicate mesh axis {name!r} in {spec!r}")
        if int(size) < 1:
            raise ValueError(f"mesh axis {part!r} must have size >= 1")
        out[alias[name]] = int(size)
    if not out:
        raise ValueError(f"empty mesh spec {spec!r}")
    return out


# TP sharding rules by module path: column-parallel kernels shard the
# output-feature axis, row-parallel the input axis (megatron pairing keeps
# the all-reduce count at 2/block).  norm1/norm2 shard only their adaLN
# ``linear`` (the LayerNorm weight/bias replicate).
_COL_PARALLEL = ("qkv", "net_0", "to_q", "to_k", "to_v",
                 "norm1/linear", "norm1/base_linear",
                 "norm2/linear", "norm2/base_linear")
_ROW_PARALLEL = ("to_out", "net_2")


def transformer_param_specs_like(params, model_axis: str = "model"):
    """Path-matched TP ``PartitionSpec`` tree for *any* transformer param
    tree — stacked or unstacked, bf16 or int8-quantized (the fixed-structure
    :func:`transformer_param_specs` can't describe the int8 {"q","scale"}
    leaves).  Embeddings/norm/head params replicate.
    """
    import jax.tree_util as jtu

    m = model_axis

    def spec_for(path, leaf):
        keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        joined = "/".join(str(k) for k in keys)
        leaf_name = keys[-1] if keys else ""
        ndim = getattr(leaf, "ndim", 0)
        if "runtime_lora" in joined:
            # low-rank factor trees are tiny (~0.4 GB at rank 128) —
            # replicate; the computed delta inherits the kernel's sharding
            # through the elementwise add
            return P()
        if ndim == 0 or "blocks" not in joined and "transformer_blocks" not in joined:
            return P()
        col = any(f"/{n}/" in f"/{joined}/" for n in _COL_PARALLEL)
        row = any(f"/{n}/" in f"/{joined}/" for n in _ROW_PARALLEL)
        axes = [None] * ndim
        if col:
            # kernel [.., in, out], bias [.., out], int8 q [.., in, out],
            # int8 scale [.., 1, out]: output-feature axis is last
            axes[-1] = m
        elif row and leaf_name in ("kernel", "q") and ndim >= 2:
            axes[-2] = m  # input axis; bias/scale are per-output -> replicated
        else:
            return P()
        return P(*axes)

    return jtu.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, specs):
    """Place a param pytree onto the mesh according to a spec pytree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def default_logical_map(mesh: Mesh) -> Dict[str, Optional[str]]:
    """Map logical model axes to whatever axes this mesh actually has."""
    names = set(mesh.axis_names)
    return {
        "dp": "data" if "data" in names else None,
        "tp": "model" if "model" in names else None,
        "sp": "seq" if "seq" in names else None,
    }
