"""TPU-native LoRA fine-tuning for the 3-stream S2V transformer.

The reference releases no trainer (README: fine-tuning code not released;
the upstream diffusers LoRA trainers in examples/cogvideo are stock
templates with no S2V hooks — SURVEY.md §2.3).  This module supplies the
missing capability the reference's LoRA checkpoints came from: adapters of
rank r / scale alpha/r on the 9 reference target families
(src/inference.py:218-225 — attention projections, conv patch embed,
text_proj, both adaLN modulation linears, ff.net.2), trained with the
v-prediction objective on the frozen base model.

Design: LoRA params live in a separate pytree mirroring the kernels they
adapt; the loss applies ``W + (alpha/r) A @ B`` per layer INSIDE the block
scan via the runtime factor tree (models/transformer.py RUNTIME_LORA_KEY),
so gradients flow only into A/B (the base tree is a frozen constant under
``jax.grad``) and no second weight tree ever materializes (a whole-tree
merge is loop-invariant and gets hoisted by XLA — see lora_loss_fn).  One
jitted ``train_step`` = forward + grad + optax update, optionally donating
the old state (``donate=True`` at the production call sites); multi-chip
training shards the batch over ``data`` and the per-layer adapted weights
inherit the TP shardings of the base params.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from s2v_tpu.config import SchedulerConfig, TransformerConfig
from s2v_tpu.schedulers.ddim import compute_alphas_cumprod


# target paths are (tree-path, kernel) pairs inside the params pytree;
# per-layer stacked kernels carry the leading [L, in, out] axis.
_TARGETS = {
    "qkv": ("blocks", "attn", "qkv"),  # covers to_q/to_k/to_v (fused)
    "to_out": ("blocks", "attn", "to_out"),
    "norm1.linear": ("blocks", "norm1", "linear"),
    "norm2.linear": ("blocks", "norm2", "linear"),
    "ff.net.2": ("blocks", "ff", "net_2"),
    "patch_proj": ("patch_embed", "proj"),
    "text_proj": ("patch_embed", "text_proj"),
}


@dataclass(frozen=True)
class LoRASpec:
    rank: int = 128
    alpha: float = 64.0
    targets: Tuple[str, ...] = tuple(_TARGETS.keys())
    # train with the *intended* enable_lora semantics (SURVEY.md §0):
    # norm1/norm2 modulation adapters apply to the ref stream only, while
    # video/text keep the base modulation.  Requires the model cfg to have
    # disentangled_modulation=True so block_forward consumes base_linear.
    disentangled: bool = False

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def _kernel_at(params, path):
    node = params
    for p in path:
        node = node[p]
    return node["kernel"]


def _kernel_shape_at(params, path):
    """Kernel shape of a target leaf — bf16 ``{"kernel"}`` or int8
    ``{"q","scale"}`` (QLoRA: the frozen base is quantized, adapters ride
    output-additively; the int8 q array has the kernel's [.., in, out])."""
    node = params
    for p in path:
        node = node[p]
    return (node["kernel"] if "kernel" in node else node["q"]).shape


def base_is_quantized(base_params) -> bool:
    """True when the transformer tree carries int8 kernels (QLoRA base)."""
    blocks = base_params.get("blocks", {})
    return "q" in blocks.get("attn", {}).get("qkv", {})


def init_lora_params(key, base_params, spec: LoRASpec, dtype=jnp.float32):
    """A ~ N(0, 1/r) (PEFT-style kaiming-ish), B = 0 — so the adapted model
    starts exactly at the base model."""
    lora = {}
    keys = jax.random.split(key, len(spec.targets))
    for k, name in zip(keys, spec.targets):
        *lead, d_in, d_out = _kernel_shape_at(base_params, _TARGETS[name])
        a = jax.random.normal(k, (*lead, d_in, spec.rank), dtype) / np.sqrt(spec.rank)
        b = jnp.zeros((*lead, spec.rank, d_out), dtype)
        lora[name] = {"a": a, "b": b}
    return lora


def merge_lora_params(base_params, lora_params, spec: LoRASpec):
    """Functional merge: returns a new tree with
    ``kernel + scale * a @ b`` at each target (gradient flows to a/b)."""
    if base_is_quantized(base_params):
        raise ValueError(
            "merge_lora_params needs a bf16/fp32 base (int8 kernels cannot "
            "absorb a merge); QLoRA adapters are applied output-additively "
            "via the runtime factor tree — see lora_loss_fn"
        )
    merged = jax.tree.map(lambda x: x, base_params)  # shallow-ish copy

    def set_kernel(tree, path, new_kernel):
        node = tree
        for p in path[:-1]:
            node = node[p]
        leaf = dict(node[path[-1]])
        leaf["kernel"] = new_kernel
        node[path[-1]] = leaf

    # rebuild nested dicts along each path so we don't mutate the base tree
    def copy_along(tree, path):
        node = tree
        for p in path:
            node[p] = dict(node[p])
            node = node[p]

    for name, ab in lora_params.items():
        path = _TARGETS[name]
        copy_along(merged, path[:-1])
        kernel = _kernel_at(base_params, path)
        delta = jnp.einsum("...ir,...ro->...io", ab["a"], ab["b"]) * spec.scale
        set_kernel(merged, path, kernel + delta.astype(kernel.dtype))
        if spec.disentangled and name in ("norm1.linear", "norm2.linear"):
            # expose the pre-merge weights so the disentangled block keeps
            # video/text modulation on the base path
            node = merged
            for p in path[:-1]:
                node = node[p]
            # beside the (merged) "linear" leaf, as block_forward expects
            node["base_linear"] = {"kernel": kernel, "bias": node[path[-1]]["bias"]}
    return merged


def lora_loss_fn(
    lora_params,
    base_params,
    cfg: TransformerConfig,
    spec: LoRASpec,
    batch: Dict[str, jnp.ndarray],
    alphas_cumprod: jnp.ndarray,
    rng: jnp.ndarray,
    attention_backend: str = "xla",
    remat: bool = True,
):
    """v-prediction MSE on noised video latents (the CogVideoX objective).

    batch: {"video_latents" [B,F,h,w,C], "ref_latents" [B,1,h,w,C],
            "text_embeds" [B,T,txt], optional "rope_cos"/"rope_sin"}.

    Adapters are applied via the runtime (unmerged) factor tree
    (models/transformer.py RUNTIME_LORA_KEY): per-layer ``W + scale*A@B``
    INSIDE the block scan.  A whole-tree functional merge before the
    forward (the pre-round-4 design) is loop-invariant, so XLA
    materializes every layer's merged target kernels simultaneously as
    HLO temps — measured +6.5 GB at L=16 on v5e (bench_runs/
    r04_probe_L16b.log: bf16[16,12288,3072] + [16,3072,9216] + ... live
    at once), which is why the flagship 42-layer step never fit 16 GB.
    In-scan application keeps delta transients per-layer (~300 MB peak)
    and is mathematically identical (exact in fp32; one fp32-add rounding
    difference in bf16).  ``spec.disentangled`` still uses the functional
    merge — it needs the pre-merge ``base_linear`` beside the adapted
    modulation kernels (SURVEY.md §0 enable_lora semantics).
    """
    from s2v_tpu.training.full import vpred_loss

    if spec.disentangled:
        params = merge_lora_params(base_params, lora_params, spec)
    else:
        from s2v_tpu.models.transformer import RUNTIME_LORA_KEY

        blocks: Dict[str, dict] = {}
        top: Dict[str, dict] = {}
        for name, ab in lora_params.items():
            # compute-dtype factors inside the loss (the fp32 master copy is
            # what the optimizer updates): fp32 factor xs + their scan
            # cotangents cost ~1.5 GB of flagship train-step temps, and the
            # astype transpose hands the caller fp32 grads either way; for
            # fp32 models (cfg.dtype == float32) this is a no-op
            pair = {
                "a": (ab["a"] * spec.scale).astype(cfg.dtype),
                "b": ab["b"].astype(cfg.dtype),
            }
            (top if name in ("patch_proj", "text_proj") else blocks)[name] = pair
        tree = {}
        if blocks:
            tree["blocks"] = blocks
        if top:
            tree["top"] = top
        params = dict(base_params)
        params[RUNTIME_LORA_KEY] = tree
    return vpred_loss(params, cfg, batch, alphas_cumprod, rng,
                      attention_backend=attention_backend, remat=remat)


def make_lora_train_step(
    base_params,
    cfg: TransformerConfig,
    spec: LoRASpec,
    scheduler_cfg: Optional[SchedulerConfig] = None,
    learning_rate: float = 1e-4,
    attention_backend: str = "xla",
    remat: bool = True,
    optimizer_spec=None,
    donate: bool = False,
):
    """Returns (init_opt_state, train_step) with train_step jitted:
    ``(lora, opt_state, batch, rng) -> (lora, opt_state, loss)``.

    ``attention_backend="pallas"`` uses the flash kernels both ways
    (forward + the hand-written backward) — the fast path for on-TPU LoRA
    training.  ``remat`` (default on) checkpoints the block scan so
    activation memory is one layer deep.  ``optimizer_spec`` (a
    ``training.optim.OptimizerSpec``) selects the reference-template
    optimizer surface (adam/adamw/prodigy, LR schedules with warmup,
    grad-norm clipping, gradient accumulation); when omitted the legacy
    plain ``adamw(learning_rate)`` is used.

    ``donate=True`` donates the old lora/opt trees to the step: without
    donation the fp32 outputs "share 0B with arguments"
    (bench_runs/r04_probe_L16b.log) — ~3.3 GB of avoidable duplication at
    rank-128 flagship on a 16 GB chip.  Donation DELETES the input arrays,
    so callers must rebind ``lora, opt_state = train_step(lora, opt_state,
    ...)`` and never touch the old trees again; it is opt-in because
    inspecting pre-step params (tests, debugging) is a legitimate API use.
    The training CLI and on-chip benches enable it."""
    import optax

    if spec.disentangled and base_is_quantized(base_params):
        raise ValueError(
            "disentangled LoRA needs a bf16/fp32 base (it merges modulation "
            "kernels and keeps the pre-merge base_linear beside them, which "
            "int8 kernels cannot express); drop --quantize_base or "
            "--disentangled_modulation"
        )
    if spec.disentangled and not cfg.disentangled_modulation:
        import dataclasses

        cfg = dataclasses.replace(cfg, disentangled_modulation=True)
    alphas = jnp.asarray(compute_alphas_cumprod(scheduler_cfg or SchedulerConfig()))
    if optimizer_spec is not None:
        from s2v_tpu.training.optim import make_optimizer

        tx = make_optimizer(optimizer_spec)
    else:
        tx = optax.adamw(learning_rate)

    def init_opt_state(lora_params):
        return tx.init(lora_params)

    # base_params is a TRACED argument, not a closure capture: a closed-over
    # 5b tree (11.1 GB) would be lowered into the executable as constants
    # (mlir "large amount of constants" + a multi-minute compile); as an
    # argument it is a zero-copy device reference and jit caches on
    # shape/dtype so the public 4-arg call signature below never retraces.
    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def _train_step(lora_params, opt_state, batch, rng, base):
        loss, grads = jax.value_and_grad(lora_loss_fn)(
            lora_params, base, cfg, spec, batch, alphas, rng, attention_backend, remat
        )
        updates, opt_state = tx.update(grads, opt_state, lora_params)
        lora_params = optax.apply_updates(lora_params, updates)
        return lora_params, opt_state, loss

    def train_step(lora_params, opt_state, batch, rng):
        return _train_step(lora_params, opt_state, batch, rng, base_params)

    # expose the raw jitted 5-arg step so tools can .lower()/.compile() it
    # explicitly (compile-vs-execute separation in tools/train_probe.py)
    train_step.jitted = _train_step
    train_step.base_params = base_params
    return init_opt_state, train_step


def runtime_tree_from_training(lora_params, spec: LoRASpec) -> dict:
    """Trainer factor tree -> the inference runtime-LoRA layout
    (models/transformer.py RUNTIME_LORA_KEY; scale pre-folded into ``a``).

    Lets a just-trained adapter serve immediately via
    ``S2VPipeline.set_runtime_lora`` — no reference-format export + re-read
    round trip.  The fused trainer ``qkv`` pair maps to the full-width
    runtime form directly."""
    blocks, top = {}, {}
    for name, ab in lora_params.items():
        pair = {
            "a": np.asarray(ab["a"], np.float32) * spec.scale,
            "b": np.asarray(ab["b"], np.float32),
        }
        if name in ("patch_proj", "text_proj"):
            top[name] = pair
        else:
            blocks[name] = pair
    tree = {}
    if blocks:
        tree["blocks"] = blocks
    if top:
        tree["top"] = top
    return tree


def export_lora_to_reference_format(lora_params, spec: LoRASpec, cfg: TransformerConfig):
    """Export trained adapters as a diffusers-convention state dict
    (``transformer.<module>.lora_A/lora_B.weight`` torch layouts) loadable
    by both this framework's merge path and the reference stack.

    The fused qkv adapter is split into per-projection to_q/to_k/to_v
    entries (B columns partition exactly; A is shared across the three)."""
    out = {}
    d = cfg.inner_dim

    def put(module, a, b):
        # ours: a [in, r], b [r, out]; torch: lora_A [r, in], lora_B [out, r]
        out[f"transformer.{module}.lora_A.weight"] = np.asarray(a.T, np.float32)
        out[f"transformer.{module}.lora_B.weight"] = np.asarray(b.T, np.float32)

    for name, ab in lora_params.items():
        a, b = np.asarray(ab["a"], np.float32), np.asarray(ab["b"], np.float32)
        if name == "qkv":
            for i in range(a.shape[0]):
                for j, proj in enumerate(["to_q", "to_k", "to_v"]):
                    put(f"transformer_blocks.{i}.attn1.{proj}", a[i], b[i][:, j * d : (j + 1) * d])
        elif name in ("to_out", "norm1.linear", "norm2.linear", "ff.net.2"):
            hf = {"to_out": "attn1.to_out.0", "norm1.linear": "norm1.linear",
                  "norm2.linear": "norm2.linear", "ff.net.2": "ff.net.2"}[name]
            for i in range(a.shape[0]):
                put(f"transformer_blocks.{i}.{hf}", a[i], b[i])
        elif name == "text_proj":
            put("patch_embed.text_proj", a, b)
        elif name == "patch_proj":
            # matmul-form [p*p*C, r] x [r, D]; torch conv LoRA is
            # A conv [r, C, p, p], B conv [D, r, 1, 1]
            p = cfg.patch_size
            c = cfg.in_channels
            r = a.shape[-1]
            a_conv = a.reshape(p, p, c, r).transpose(3, 2, 0, 1)  # [r, C, p, p]
            b_conv = b.T.reshape(d, r, 1, 1)
            out["transformer.patch_embed.proj.lora_A.weight"] = np.asarray(a_conv, np.float32)
            out["transformer.patch_embed.proj.lora_B.weight"] = np.asarray(b_conv, np.float32)
    return out
