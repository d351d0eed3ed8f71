"""Full fine-tuning of the 3-stream S2V transformer with FSDP sharding.

The reference releases no trainer at all (README: "fine-tuning code ...
not released"; the upstream examples are LoRA-only templates —
SURVEY.md §0/§2.3).  This module completes the training story beyond
adapters: every transformer parameter is trainable, and memory scales
down with the mesh via FSDP — parameters, gradients, and optimizer
state are *sharded* over the mesh axis, with XLA's GSPMD inserting the
all-gathers (params, forward/backward) and reduce-scatters (grads)
that hand-written ZeRO-3 implementations do manually.

TPU shape of the design:
  * one jitted ``train_step`` (fwd + bwd + optax update), block scan
    rematerialized so activation memory stays one layer deep;
  * FSDP = a ``PartitionSpec`` per leaf sharding its largest divisible
    axis over the ``data`` mesh axis (:func:`fsdp_param_specs`) +
    ``with_sharding_constraint`` pinning the updated params, so the
    weights never materialize unsharded between steps — HBM per chip is
    params/N + one layer of gathered weights;
  * optimizer state inherits the param shardings through ``tx.init``
    under jit (zeros_like propagates sharding);
  * batches shard over the same ``data`` axis (standard FSDP: the data
    axis does double duty).

5b math: 11.1 GB bf16 params -> fp32 master + adam mu/nu = 67 GB of
state, 8.4 GB/chip on a v5e-8 — full fine-tuning fits where a single
chip cannot even hold the fp32 master copy.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from s2v_tpu.config import SchedulerConfig, TransformerConfig
from s2v_tpu.models.transformer import transformer_forward
from s2v_tpu.schedulers.ddim import add_noise, compute_alphas_cumprod, get_velocity


def vpred_loss(
    params,
    cfg: TransformerConfig,
    batch: Dict[str, jnp.ndarray],
    alphas_cumprod: jnp.ndarray,
    rng: jnp.ndarray,
    attention_backend: str = "xla",
    remat: bool = True,
    compute_dtype=None,
):
    """v-prediction MSE on noised video latents (the CogVideoX objective,
    same math as training/lora.py but over the full param tree).

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) casts float params for the
    forward pass while the trainable master copy stays in its own dtype —
    the standard TPU mixed-precision recipe (grads come out in the master
    dtype via the cast's transpose)."""
    if compute_dtype is not None:
        params = jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            params,
        )
    x0 = batch["video_latents"]
    b = x0.shape[0]
    k_t, k_n = jax.random.split(rng)
    t = jax.random.randint(k_t, (b,), 0, alphas_cumprod.shape[0])
    noise = jax.random.normal(k_n, x0.shape, jnp.float32).astype(x0.dtype)
    noisy = add_noise(x0, noise, alphas_cumprod, t)
    target = get_velocity(x0, noise, alphas_cumprod, t)
    pred = transformer_forward(
        params,
        cfg,
        noisy,
        batch["ref_latents"],
        batch["text_embeds"],
        t,
        batch.get("rope_cos"),
        batch.get("rope_sin"),
        attention_backend=attention_backend,
        remat=remat,
    )
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def _best_data_dim(shape, taken, axis_size: int) -> int:
    """Largest ``axis_size``-divisible dimension not already sharded
    (ties -> the later dimension); -1 if none."""
    best = -1
    for i, d in enumerate(shape):
        if i not in taken and d % axis_size == 0 and (best < 0 or d >= shape[best]):
            best = i
    return best


def fsdp_param_specs(params, axis_size: int, axis: str = "data",
                     min_size: int = 2 ** 14):
    """FSDP ``PartitionSpec`` tree: each leaf shards its largest
    ``axis_size``-divisible dimension over ``axis`` (ties -> the later
    dimension, keeping the contraction-friendly feature axis sharded);
    leaves smaller than ``min_size`` elements replicate (norm affines,
    biases — the collective would cost more than the bytes saved)."""
    from jax.sharding import PartitionSpec as P

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if not shape or int(np.prod(shape)) < min_size:
            return P()
        best = _best_data_dim(shape, (), axis_size)
        if best < 0:
            return P()
        axes = [None] * len(shape)
        axes[best] = axis
        return P(*axes)

    return jax.tree.map(spec, params)


def combined_param_specs(tree, data_size: int, model_axis: str = "model",
                         data_axis: str = "data", min_size: int = 2 ** 14):
    """FSDP x TP ``PartitionSpec`` tree: megatron TP specs first
    (:func:`s2v_tpu.parallel.sharding.transformer_param_specs_like` —
    path-matched, so it applies to optimizer-moment trees too, whose
    paths mirror the params), then the largest remaining divisible
    dimension of each big leaf shards over ``data`` — the standard
    2D recipe (ZeRO within the data axis, megatron within the model
    axis)."""
    from jax.sharding import PartitionSpec as P

    from s2v_tpu.parallel.sharding import transformer_param_specs_like

    tp = transformer_param_specs_like(tree, model_axis)

    def merge(leaf, spec):
        shape = getattr(leaf, "shape", ())
        ndim = len(shape)
        axes = list(spec) + [None] * (ndim - len(spec))
        if not shape or int(np.prod(shape)) < min_size or data_size < 2:
            return P(*axes) if any(a is not None for a in axes) else P()
        taken = {i for i, a in enumerate(axes) if a is not None}
        best = _best_data_dim(shape, taken, data_size)
        if best >= 0:
            axes[best] = data_axis
        return P(*axes)

    return jax.tree.map(merge, tree, tp,
                        is_leaf=lambda x: not isinstance(x, (dict, list, tuple)))


def make_full_train_step(
    cfg: TransformerConfig,
    scheduler_cfg: Optional[SchedulerConfig] = None,
    optimizer_spec=None,
    attention_backend: str = "xla",
    remat: bool = True,
    mesh=None,
    fsdp_axis: str = "data",
    fsdp_min_size: int = 2 ** 14,
    compute_dtype=None,
    ema_decay: float = 0.0,
):
    """Returns ``(prepare, init_opt_state, train_step)``:

    ``ema_decay > 0`` maintains an exponential moving average of the
    params (standard practice for full diffusion fine-tunes; sampling
    from the EMA weights is markedly more stable than from the raw
    iterates).  The EMA tree rides inside ``opt_state`` as
    ``(inner_opt_state, ema_tree)`` so checkpoints carry it, and it
    inherits the FSDP shardings elementwise — no extra plumbing.

    * ``prepare(params)`` — FSDP-shards the tree over ``mesh[fsdp_axis]``
      per :func:`fsdp_param_specs` (no-op without a mesh);
    * ``init_opt_state(params)`` — ``tx.init`` jitted with explicit FSDP
      out-shardings for the moments (sharding does NOT propagate into
      fresh ``zeros_like`` outputs on its own — XLA would replicate them,
      silently forfeiting the ZeRO memory win);
    * ``train_step(params, opt_state, batch, rng) ->
      (params, opt_state, loss)`` — jitted, donates the old state, and
      re-pins the updated params to the FSDP specs.

    The spec function is shape-deterministic, so applying it to the
    abstract optimizer state shards each adam moment exactly like the
    parameter it mirrors.
    """
    import optax

    from s2v_tpu.training.optim import OptimizerSpec, make_optimizer

    alphas = jnp.asarray(compute_alphas_cumprod(scheduler_cfg or SchedulerConfig()))
    tx = make_optimizer(optimizer_spec or OptimizerSpec())

    axis_size = 0
    if mesh is not None and fsdp_axis in mesh.axis_names:
        axis_size = int(mesh.shape[fsdp_axis])
    model_size = 0
    if mesh is not None and "model" in mesh.axis_names:
        model_size = int(mesh.shape["model"])
    use_fsdp = axis_size > 1 or model_size > 1

    def _shardings_for(tree):
        from jax.sharding import NamedSharding

        if model_size > 1:
            specs = combined_param_specs(tree, axis_size, model_axis="model",
                                         data_axis=fsdp_axis,
                                         min_size=fsdp_min_size)
        else:
            specs = fsdp_param_specs(tree, axis_size, axis=fsdp_axis,
                                     min_size=fsdp_min_size)
        return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                            is_leaf=lambda x: not isinstance(x, (dict, list, tuple)))

    def prepare(params, dtype=None):
        """Place (and optionally cast) the tree.  Under FSDP each leaf is
        cast HOST-side and device_put directly onto its shard, so a cast
        tree (e.g. the fp32 master of an 11 GB bf16 checkpoint) never
        materializes unsharded on one device."""

        def cast(x):
            if (dtype is not None and hasattr(x, "dtype")
                    and jnp.issubdtype(x.dtype, jnp.floating)):
                return np.asarray(jax.device_get(x)).astype(dtype)
            return x

        if not use_fsdp:
            if dtype is None:
                return params
            return jax.tree.map(lambda x: jnp.asarray(cast(x)), params)
        return jax.tree.map(
            lambda x, s: jax.device_put(cast(x), s), params, _shardings_for(params)
        )

    def _init_state(params):
        st = tx.init(params)
        if ema_decay > 0.0:
            return (st, jax.tree.map(lambda x: x, params))  # ema starts at params
        return st

    def init_opt_state(params):
        if not use_fsdp:
            return jax.jit(_init_state)(params)
        abstract = jax.eval_shape(_init_state, params)
        return jax.jit(_init_state, out_shardings=_shardings_for(abstract))(params)

    from functools import partial

    # donating params + opt_state keeps peak HBM at one copy of the
    # (sharded) training state instead of two
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng):
        if ema_decay > 0.0:
            opt_state, ema = opt_state
        loss, grads = jax.value_and_grad(vpred_loss)(
            params, cfg, batch, alphas, rng, attention_backend, remat, compute_dtype
        )
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if use_fsdp:
            new_params = jax.lax.with_sharding_constraint(
                new_params, _shardings_for(new_params)
            )
        if ema_decay > 0.0:
            # gradient accumulation (optax.MultiSteps): params only move on
            # the k-th microstep — fold the boundary predicate into the
            # decay factor (factor 1.0 = EMA unchanged) so the blend is one
            # pass instead of blend + select
            decay = ema_decay
            if hasattr(new_opt_state, "mini_step"):
                decay = jnp.where(new_opt_state.mini_step == 0, ema_decay, 1.0)
            new_ema = jax.tree.map(
                lambda e, w: e * decay + w.astype(e.dtype) * (1.0 - decay),
                ema, new_params,
            )
            new_opt_state = (new_opt_state, new_ema)
        return new_params, new_opt_state, loss

    return prepare, init_opt_state, train_step
