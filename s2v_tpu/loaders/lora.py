"""LoRA checkpoint reading + merge-at-init.

The reference injects runtime PEFT adapters (rank 128, alpha 64 -> scale 0.5)
into 9 module families — attention projections, the conv patch embed,
text_proj, both adaLN modulation linears and ff.net.2
(src/inference.py:218-229) — and evaluates ``W x + (alpha/r) B A x`` every
call.  TPU-native equivalent (per BASELINE.json north star): **merge**
``W += (alpha/r) * B @ A`` into the base weights once at load, eliminating
the runtime wrapping entirely.  Identical math, zero overhead.

Key handling reproduces the diffusers/PEFT conversion chain
(src/inference.py:84-100, utils/state_dict_utils.py:248-254):
``transformer.`` prefix strip, ``.lora.down/.lora.up -> lora_A/lora_B``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from s2v_tpu.loaders.safetensors_io import best_guess_lora_file, load_safetensors


def normalize_lora_keys(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """diffusers-format -> canonical ``<module>.lora_A/B`` pairs."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith("transformer."):
            k = k[len("transformer."):]
        k = k.replace(".lora.down.weight", ".lora_A.weight")
        k = k.replace(".lora.up.weight", ".lora_B.weight")
        k = k.replace(".lora_A.default.weight", ".lora_A.weight")
        k = k.replace(".lora_B.default.weight", ".lora_B.weight")
        out[k] = v
    return out


def lora_pairs(state_dict: Dict[str, np.ndarray]):
    """Yield (module_name, A, B) for every lora pair in a normalized dict."""
    for k in sorted(state_dict):
        if k.endswith(".lora_A.weight"):
            module = k[: -len(".lora_A.weight")]
            b_key = module + ".lora_B.weight"
            if b_key not in state_dict:
                raise KeyError(f"unpaired LoRA key: {k}")
            yield module, state_dict[k], state_dict[b_key]


def merge_lora_into_state_dict(
    base_sd: Dict[str, np.ndarray],
    lora_sd: Dict[str, np.ndarray],
    alpha: float = 64.0,
    rank: int | None = None,
) -> Tuple[Dict[str, np.ndarray], list]:
    """Merge LoRA deltas into a torch-layout base state dict (numpy).

    Handles both linear LoRA (A [r, in], B [out, r]) and conv LoRA on the
    k=2 patch embed (A [r, C, kh, kw] conv kernel, B [out, r, 1, 1]):
    the conv pair flattens to a matrix product over ``C*kh*kw``
    (SURVEY.md §7 stage 1).  Scale is alpha / rank with rank inferred from A
    unless given.  Returns (merged_sd, merged_module_names).
    """
    merged = dict(base_sd)
    lora_sd = normalize_lora_keys(lora_sd)
    touched = []
    for module, a, b in lora_pairs(lora_sd):
        w_key = module + ".weight"
        if w_key not in merged:
            raise KeyError(f"LoRA target {w_key} not present in base state dict")
        w = np.asarray(merged[w_key], dtype=np.float32)
        a = np.asarray(a, dtype=np.float32)
        b = np.asarray(b, dtype=np.float32)
        r = rank or a.shape[0]
        scale = alpha / r
        if a.ndim == 2 and b.ndim == 2:
            delta = scale * (b @ a)  # [out, in]
        elif a.ndim == 4 and b.ndim == 4:
            # conv LoRA: B [out, r, 1, 1] @ A [r, cin, kh, kw]
            r_, cin, kh, kw = a.shape
            delta = scale * (b.reshape(b.shape[0], r_) @ a.reshape(r_, cin * kh * kw))
            delta = delta.reshape(b.shape[0], cin, kh, kw)
        else:
            raise ValueError(f"unsupported LoRA shapes for {module}: {a.shape} / {b.shape}")
        if delta.shape != w.shape:
            raise ValueError(f"merge shape mismatch for {module}: {delta.shape} vs {w.shape}")
        merged[w_key] = (w + delta).astype(base_sd[w_key].dtype)
        touched.append(module)
    return merged, touched


def load_and_merge_lora(
    base_sd: Dict[str, np.ndarray], ckpt_dir: str, alpha: float = 64.0, rank: int | None = None
):
    """Full reference load path (§3.5): resolve file -> normalize -> merge."""
    lora_sd = load_safetensors(best_guess_lora_file(ckpt_dir))
    return merge_lora_into_state_dict(base_sd, lora_sd, alpha=alpha, rank=rank)
