"""Optimizer / LR-schedule factory for the trainers.

TPU-native counterpart of the optimizer surface in the reference's
upstream trainer template (train_cogvideox_lora.py:284-374,918-983):
``--optimizer adam|adamw|prodigy``, ``--lr_scheduler`` with warmup,
``--max_grad_norm`` clipping and ``--gradient_accumulation_steps`` —
expressed as one optax chain so both the LoRA trainer and the full
fine-tune trainer share it.  Gradient accumulation uses
``optax.MultiSteps`` (mean-accumulated grads, update applied every k-th
microstep) instead of Accelerate's context-manager accumulation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import optax


SCHEDULES = ("constant", "constant_with_warmup", "linear", "cosine")
OPTIMIZERS = ("adamw", "adam", "prodigy")


@dataclass(frozen=True)
class OptimizerSpec:
    """Mirrors the reference trainer template's optimizer flags."""

    optimizer: str = "adamw"
    learning_rate: float = 1e-4
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 0
    max_train_steps: int = 1000  # decay horizon for linear/cosine
    max_grad_norm: Optional[float] = None  # template default 1.0; None = off
    weight_decay: float = 1e-4  # template --adam_weight_decay
    beta1: float = 0.9
    beta2: float = 0.95  # template --adam_beta2 default (cogvideox)
    epsilon: float = 1e-8
    gradient_accumulation_steps: int = 1
    # first-moment (mu) storage dtype for adam/adamw: "bfloat16" halves the
    # largest optimizer buffer (mu tracks the grad EMA — low dynamic range,
    # bf16-safe; nu stays fp32: it scales the update and spans grad^2's
    # range).  At rank-128 flagship LoRA this is 0.6 GB of a 16 GB chip.
    moment_dtype: str = "float32"

    def __post_init__(self):
        if self.optimizer not in OPTIMIZERS:
            raise ValueError(f"optimizer must be one of {OPTIMIZERS}, got {self.optimizer!r}")
        if self.lr_scheduler not in SCHEDULES:
            raise ValueError(f"lr_scheduler must be one of {SCHEDULES}, got {self.lr_scheduler!r}")
        if self.gradient_accumulation_steps < 1:
            raise ValueError("gradient_accumulation_steps must be >= 1")
        if self.moment_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"moment_dtype must be 'float32' or 'bfloat16', got {self.moment_dtype!r}"
            )
        if self.optimizer == "prodigy" and self.moment_dtype != "float32":
            # optax.contrib.prodigy exposes no moment-dtype knob; silently
            # keeping fp32 moments would contradict the requested config
            raise ValueError(
                "moment_dtype='bfloat16' is not supported with "
                "optimizer='prodigy' (optax prodigy keeps fp32 state); use "
                "adam/adamw for low-precision moments"
            )


def make_lr_schedule(spec: OptimizerSpec):
    """optax schedule implementing the diffusers get_scheduler names we
    support (constant / constant_with_warmup / linear / cosine), all with
    linear warmup from 0 like the HF schedulers."""
    lr, warm = spec.learning_rate, int(spec.lr_warmup_steps)
    total = max(int(spec.max_train_steps), warm + 1)
    if spec.lr_scheduler == "constant":
        return optax.constant_schedule(lr)
    if spec.lr_scheduler == "constant_with_warmup":
        if warm == 0:  # HF get_constant_schedule_with_warmup: factor 1 at step 0
            return optax.constant_schedule(lr)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warm), optax.constant_schedule(lr)],
            [warm],
        )
    if spec.lr_scheduler == "linear":
        if warm:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warm),
                 optax.linear_schedule(lr, 0.0, total - warm)],
                [warm],
            )
        return optax.linear_schedule(lr, 0.0, total)
    # cosine
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=warm, decay_steps=total
    )


def make_optimizer(spec: OptimizerSpec) -> optax.GradientTransformation:
    """Build the full chain: [clip] -> optimizer(schedule) [-> MultiSteps]."""
    schedule = make_lr_schedule(spec)
    if spec.optimizer == "prodigy":
        # the template warns lr should be ~1.0 with prodigy
        # (train_cogvideox_lora.py:965-969); prodigy consumes the schedule
        # as a multiplicative factor
        tx = optax.contrib.prodigy(
            learning_rate=schedule, betas=(spec.beta1, spec.beta2),
            eps=spec.epsilon, weight_decay=spec.weight_decay,
        )
    elif spec.optimizer == "adam":
        tx = optax.adam(
            schedule, b1=spec.beta1, b2=spec.beta2, eps=spec.epsilon,
            mu_dtype=spec.moment_dtype,
        )
    else:
        tx = optax.adamw(
            schedule, b1=spec.beta1, b2=spec.beta2, eps=spec.epsilon,
            weight_decay=spec.weight_decay, mu_dtype=spec.moment_dtype,
        )
    if spec.max_grad_norm is not None and spec.max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(spec.max_grad_norm), tx)
    if spec.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=spec.gradient_accumulation_steps)
    return tx
