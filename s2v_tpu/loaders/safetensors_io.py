"""safetensors <-> numpy/pytree IO (host-side; reference L1 equivalent).

The reference loads weights through diffusers' ModelMixin/safetensors and
LoRA checkpoints through ``lora_state_dict``'s best-guess file resolution
(loaders/lora_base.py:237-355).  Here: plain safetensors.numpy plus the same
"find the single .safetensors in a checkpoint dir" resolution so reference
checkpoint directories (Accelerate layout with optimizer.bin etc.,
README.md:71-78) load as-is.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import numpy as st_numpy

    return dict(st_numpy.load_file(path))


def save_safetensors(tensors: Dict[str, np.ndarray], path: str) -> None:
    from safetensors import numpy as st_numpy

    # safetensors 0.8 serializes the RAW buffer of non-contiguous arrays
    # (a transposed view round-trips as its un-transposed buffer with the
    # transposed shape — silently wrong values); every converter here
    # emits .T/.transpose views, so contiguous-ify at the choke point
    tensors = {k: np.ascontiguousarray(v) for k, v in tensors.items()}
    st_numpy.save_file(tensors, path)


def load_sharded_safetensors(model_dir: str) -> Dict[str, np.ndarray]:
    """Load a HF model dir: single file or index-sharded safetensors."""
    index = os.path.join(model_dir, "diffusion_pytorch_model.safetensors.index.json")
    alt_index = os.path.join(model_dir, "model.safetensors.index.json")
    for idx_path in (index, alt_index):
        if os.path.exists(idx_path):
            with open(idx_path) as f:
                shard_files = sorted(set(json.load(f)["weight_map"].values()))
            out: Dict[str, np.ndarray] = {}
            for shard in shard_files:
                out.update(load_safetensors(os.path.join(model_dir, shard)))
            return out
    for name in ("diffusion_pytorch_model.safetensors", "model.safetensors"):
        p = os.path.join(model_dir, name)
        if os.path.exists(p):
            return load_safetensors(p)
    # fall back: any single safetensors file
    cands = [f for f in os.listdir(model_dir) if f.endswith(".safetensors")]
    if len(cands) == 1:
        return load_safetensors(os.path.join(model_dir, cands[0]))
    raise FileNotFoundError(f"no safetensors found in {model_dir}")


def best_guess_lora_file(ckpt_dir: str) -> str:
    """Resolve the LoRA safetensors in an Accelerate checkpoint dir
    (reference _best_guess_weight_name, loaders/lora_base.py:314-355:
    filter out optimizer/scheduler/ema files, expect exactly one left)."""
    if os.path.isfile(ckpt_dir):
        return ckpt_dir
    cands = [
        f
        for f in os.listdir(ckpt_dir)
        if f.endswith(".safetensors")
        and not any(sub in f for sub in ("optimizer", "scheduler", "ema", "random_states"))
    ]
    if len(cands) != 1:
        raise FileNotFoundError(
            f"expected exactly one LoRA .safetensors in {ckpt_dir}, found {cands}"
        )
    return os.path.join(ckpt_dir, cands[0])
