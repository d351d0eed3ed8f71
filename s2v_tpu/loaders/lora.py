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


# ---------------------------------------------------------------------------
# runtime (unmerged) factor trees — multi-tenant serving fast path
# ---------------------------------------------------------------------------

# reference per-block module suffix -> runtime target name
_BLOCK_SUFFIXES = {
    "attn1.to_q": "to_q",
    "attn1.to_k": "to_k",
    "attn1.to_v": "to_v",
    "attn1.to_out.0": "to_out",
    "norm1.linear": "norm1.linear",
    "norm2.linear": "norm2.linear",
    "ff.net.2": "ff.net.2",
}


def runtime_lora_tree(
    lora_sd: Dict[str, np.ndarray],
    num_layers: int,
    alpha: float = 64.0,
    rank: int | None = None,
) -> dict:
    """Reference-format LoRA state dict -> *runtime* factor tree (numpy).

    The merge path above folds adapters into the base weights at load; the
    runtime tree instead keeps the low-rank factors separate so the
    transformer applies ``W + a @ b`` per layer inside its block scan
    (models/transformer.py) — the reference's own PEFT-style runtime
    adapters (src/inference.py:218-229), reshaped TPU-first: factors are
    stacked ``[L, in, r]`` / ``[L, r, out]`` along the scan axis and the
    ``alpha/r`` scale is pre-folded into ``a``, so swapping subjects is a
    ~0.4 GB factor upload instead of an 11 GB re-merge.

    Layout::

        {"blocks": {name: {"a": [L, in, r], "b": [L, r, out]}},
         "top":    {name: {"a": [in, r],    "b": [r, out]}}}

    Block names: to_q | to_k | to_v | to_out | norm1.linear | norm2.linear
    | ff.net.2 (the fused-qkv trainer form uses the single name "qkv").
    Top names: patch_proj (conv factors flattened to the patchify-matmul
    layout of loaders/hf.py) | text_proj.  Layers without an adapter for a
    family get zero factors (the scan axis must be dense).
    """
    lora_sd = normalize_lora_keys(lora_sd)
    per_block: Dict[str, dict] = {}
    top: Dict[str, dict] = {}
    for module, a, b in lora_pairs(lora_sd):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        r = rank or a.shape[0]
        scale = alpha / r
        if module == "patch_embed.proj":
            # conv pair (A [r, C, kh, kw], B [out, r, 1, 1]) -> the
            # space-to-depth matmul layout: kernel rows are (kh, kw, c)
            r_, c, kh, kw = a.shape
            a_m = a.transpose(2, 3, 1, 0).reshape(kh * kw * c, r_)
            b_m = b.reshape(b.shape[0], r_).T
            top["patch_proj"] = {"a": a_m * scale, "b": b_m}
            continue
        if module == "patch_embed.text_proj":
            top["text_proj"] = {"a": a.T * scale, "b": b.T}
            continue
        if module.startswith("transformer_blocks."):
            rest = module.split(".", 2)
            layer, suffix = int(rest[1]), rest[2]
            name = _BLOCK_SUFFIXES.get(suffix)
            if name is None:
                raise KeyError(f"unsupported runtime LoRA target: {module}")
            per_block.setdefault(name, {})[layer] = (a.T * scale, b.T)
            continue
        raise KeyError(f"unsupported runtime LoRA target: {module}")

    blocks = {}
    for name, layers in per_block.items():
        a0, b0 = next(iter(layers.values()))
        a_stack = np.zeros((num_layers,) + a0.shape, np.float32)
        b_stack = np.zeros((num_layers,) + b0.shape, np.float32)
        for i, (a_i, b_i) in layers.items():
            if a_i.shape != a0.shape or b_i.shape != b0.shape:
                raise ValueError(
                    f"runtime LoRA needs a uniform rank per family; {name} has "
                    f"{a0.shape}/{b0.shape} and {a_i.shape}/{b_i.shape}"
                )
            a_stack[i], b_stack[i] = a_i, b_i
        blocks[name] = {"a": a_stack, "b": b_stack}
    tree = {}
    if blocks:
        tree["blocks"] = blocks
    if top:
        tree["top"] = top
    return tree


def load_runtime_lora(ckpt_dir: str, num_layers: int, alpha: float = 64.0,
                      rank: int | None = None) -> dict:
    """Resolve + read a reference checkpoint dir into a runtime factor tree."""
    return runtime_lora_tree(
        load_safetensors(best_guess_lora_file(ckpt_dir)), num_layers,
        alpha=alpha, rank=rank,
    )
