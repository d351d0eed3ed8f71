"""LoRA fine-tuning CLI.

The TPU-native counterpart of the upstream (unreleased-customization)
trainer templates in the reference's examples/cogvideo — same flag shape
(--rank/--lora_alpha/video-folder dataset), TPU-first internals: jitted
train step over frozen base params, optax AdamW, checkpoints exported in
the diffusers LoRA key format the inference stacks (ours and the
reference's) both load.

    python -m s2v_tpu.train \
        --pretrained_model_name_or_path /path/to/CogVideoX-5b-snapshot \
        --dataset_dir /path/to/videos --output_dir ./lora_out \
        --rank 128 --lora_alpha 64 --max_train_steps 1000
"""

from __future__ import annotations

import argparse
import os
import re
import time

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="TPU-native S2V LoRA trainer")
    p.add_argument("--pretrained_model_name_or_path", type=str, required=True)
    p.add_argument("--dataset_dir", type=str, required=True,
                   help="folder of videos (+ optional prompts.txt / <stem>_ref.png)")
    p.add_argument("--output_dir", type=str, default="lora_out")
    p.add_argument("--train_mode", type=str, default="lora", choices=["lora", "full"],
                   help="lora = adapters on the 9 reference target families; "
                        "full = every transformer param, FSDP-sharded over the "
                        "mesh data axis (params/grads/optimizer state all 1/N "
                        "per chip; composes with a megatron tp axis: "
                        "--mesh dp2,tp4), fp32 master weights + bf16 compute")
    p.add_argument("--compute_dtype", type=str, default="auto",
                   choices=["auto", "none", "bfloat16"],
                   help="full mode forward-pass dtype (master weights stay "
                        "fp32); auto = bfloat16 on TPU, none elsewhere")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="full mode: maintain an EMA of the params at this "
                        "decay (e.g. 0.9999); the final snapshot exports "
                        "the EMA weights. 0 = off")
    p.add_argument("--rank", type=int, default=128)
    p.add_argument("--lora_alpha", type=float, default=64)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--optimizer", type=str, default="adamw",
                   choices=["adamw", "adam", "prodigy"],
                   help="reference-template optimizer choice (prodigy wants "
                        "learning_rate near 1.0)")
    p.add_argument("--lr_scheduler", type=str, default="constant",
                   choices=["constant", "constant_with_warmup", "linear", "cosine"])
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--max_grad_norm", type=float, default=1.0,
                   help="global grad-norm clip (template default 1.0; <=0 disables)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.95)
    p.add_argument("--adam_weight_decay", type=float, default=1e-4)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--moment_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="adam/adamw first-moment (mu) storage dtype; "
                        "bfloat16 halves the largest optimizer buffer "
                        "(~0.6 GB at rank-128 flagship LoRA) with no "
                        "measurable loss impact (mu is a grad EMA)")
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--max_train_steps", type=int, default=1000)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=720)
    p.add_argument("--max_num_frames", type=int, default=49)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--encode_cache_dir", type=str, default=None,
                   help="persist per-clip VAE moments + T5 embeds to disk "
                        "(content-addressed npz): restarted runs skip the "
                        "encode pass; posterior noise stays fresh per epoch")
    p.add_argument("--attention_backend", type=str, default="auto",
                   choices=["auto", "xla", "chunked", "pallas", "ring",
                            "sp_allgather", "sp_ulysses", "sp_windowed",
                            "windowed"],
                   help="auto = pallas on TPU / xla on CPU; pallas = flash "
                        "kernels both ways; windowed = banded sliding-window "
                        "kernels both ways (long clips); sp_* / ring need "
                        "--mesh with a seq axis. pallas_int8 is "
                        "inference-only (no backward kernels)")
    p.add_argument("--remat", type=str, default="full",
                   help="block-scan rematerialization: full = O(1-layer) "
                        "activations (recompute everything in bwd), dots = "
                        "save matmul outputs / recompute elementwise (faster "
                        "bwd, ~2x activation memory), seg = segmented/nested "
                        "checkpointing, sqrt(L) carries instead of L for one "
                        "extra fwd recompute (fits flagship LoRA training in "
                        "16 GB HBM), none = no remat")
    p.add_argument("--attention_window", type=int, default=2,
                   help="half-width (latent frames) for --attention_backend windowed")
    p.add_argument("--disentangled_modulation", action="store_true", default=False,
                   help="train norm1/norm2 LoRA with the intended enable_lora "
                        "semantics (ref-stream-only modulation adapters)")
    p.add_argument("--quantize_base", action="store_true", default=False,
                   help="QLoRA: freeze the base transformer in int8 (6.4 GB "
                        "instead of 11.1) and apply adapters output-additively "
                        "— fits flagship 42-layer rank-128 LoRA training on "
                        "one 16 GB chip (lora mode only)")
    p.add_argument("--validation_prompt", type=str, default=None,
                   help="prompt(s) sampled during training to eyeball progress "
                        "(template log_validation); separate multiple with "
                        "--validation_prompt_separator")
    p.add_argument("--validation_prompt_separator", type=str, default=":::")
    p.add_argument("--validation_ref_img", type=str, default=None,
                   help="subject image for validation (defaults to the first "
                        "dataset clip's ref frame)")
    p.add_argument("--validation_steps", type=int, default=0,
                   help="run validation sampling every N optimizer steps (0 = off)")
    p.add_argument("--num_validation_videos", type=int, default=1)
    p.add_argument("--validation_num_inference_steps", type=int, default=20)
    p.add_argument("--resume_from_checkpoint", type=str, default=None,
                   help="train-state dir written by --checkpointing_steps "
                        "(adapters + optimizer state + step; orbax)")
    p.add_argument("--mesh", type=str, default=None,
                   help="multi-chip training mesh. lora mode: 'dp2,tp4' -> "
                        "base params TP-sharded, batches dp-sharded, adapters "
                        "replicated (gradients all-reduced by GSPMD). "
                        "full mode: 'dp8' -> FSDP (params/grads/optimizer "
                        "state sharded 1/N over the data axis)")
    p.add_argument("--fsdp_base", action="store_true", default=False,
                   help="lora mode + pure-dp mesh: shard the FROZEN base "
                        "tree 1/N over the data axis instead of replicating "
                        "it (ZeRO-3 for the 11 GB base; adapters stay "
                        "replicated)")
    from s2v_tpu.cli_utils import add_compilation_cache_flag

    add_compilation_cache_flag(p)
    return p.parse_args(argv)


_REMAT_MODES = {"full": True, "dots": "dots", "none": False}


def _remat_mode(name: str):
    """full/dots/none/seg/seg<N> -> transformer_forward remat policy
    (seg<N> pins the nested-checkpoint segment count)."""
    if name in _REMAT_MODES:
        return _REMAT_MODES[name]
    if re.fullmatch(r"seg\d*", name):
        return name
    raise SystemExit(f"--remat {name!r}: expected full, dots, none, seg or segN")


def _resume_position(args, step, dataset):
    """(micro, epoch, skip_batches) implied by an optimizer-step count:
    resume continues the shuffled data order exactly — same epoch seed AND
    the within-epoch offset (previously the current epoch was re-dealt
    from batch 0, retraining already-seen batches)."""
    micro = step * args.gradient_accumulation_steps
    bpe = max(1, len(dataset) // args.train_batch_size)
    return micro, micro // bpe, micro % bpe


_RESUME_MISMATCH = (
    "cannot restore {path}: the train-state tree must match the flags that "
    "wrote it — optimizer / lr_scheduler / max_grad_norm / "
    "gradient_accumulation_steps / ema_decay shape the optimizer state, "
    "and a sharded state written under a different --mesh cannot be "
    "restored without that mesh (checkpoints from before the "
    "optimizer-surface upgrade use a plain adamw layout).  "
    "Original error: {err}"
)


def _validate(args, pipe, dataset, step, log, params_override=None, cfg_override=None):
    """Training-time validation sampling (reference template log_validation,
    train_cogvideox_lora.py:639-760): generate --num_validation_videos clips
    per validation prompt with the CURRENT weights and write them under
    output_dir/samples/.  Weights are swapped in-place for the duration
    (merged LoRA or live full-FT params) and restored after."""
    from s2v_tpu.utils.video import export_to_video, to_uint8_frames

    if not args.validation_prompt:
        return
    outdir = os.path.join(args.output_dir, "samples")
    os.makedirs(outdir, exist_ok=True)
    ref = args.validation_ref_img
    if ref is None:
        ref = dataset[0]["ref_image"]  # [H,W,3] in [-1,1], accepted by generate
    prev_params, prev_cfg = pipe.transformer_params, pipe.transformer_cfg
    if params_override is not None:
        pipe.transformer_params = params_override
    if cfg_override is not None:
        pipe.transformer_cfg = cfg_override
    try:
        prompts = [p.strip() for p in
                   args.validation_prompt.split(args.validation_prompt_separator)
                   if p.strip()]
        for pi, prompt in enumerate(prompts):
            for vi in range(args.num_validation_videos):
                frames = pipe.generate(
                    prompt=prompt,
                    ref_image=ref,
                    height=args.height,
                    width=args.width,
                    num_frames=args.max_num_frames,
                    num_inference_steps=args.validation_num_inference_steps,
                    seed=args.seed + vi,
                    output_type="np",
                )
                clip = frames[0] if frames.ndim == 5 else frames
                path = os.path.join(outdir, f"step{step}_p{pi}_v{vi}.mp4")
                export_to_video(to_uint8_frames(clip), path, fps=8)
                log.info("validation step %d: %s", step, path)
    finally:
        pipe.transformer_params, pipe.transformer_cfg = prev_params, prev_cfg


def _run_full(args, pipe, dataset, opt_spec, log):
    """Full-parameter fine-tuning: fp32 master weights (+ optional bf16
    compute), FSDP over the mesh 'data' axis (params/grads/optimizer state
    sharded 1/N per chip via GSPMD), resumable orbax train state, final
    export as an HF-layout pipeline snapshot."""
    import contextlib

    import jax
    import jax.numpy as jnp

    from s2v_tpu.training.data import latent_batches, prefetch_batches
    from s2v_tpu.training.full import make_full_train_step

    compute_dtype = None
    if args.compute_dtype == "bfloat16" or (
        args.compute_dtype == "auto" and jax.default_backend() == "tpu"
    ):
        compute_dtype = jnp.bfloat16

    mesh = None
    batch_sharding = None
    if args.mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from s2v_tpu.parallel.sharding import make_mesh, parse_mesh_spec

        axes = parse_mesh_spec(args.mesh)
        if axes.get("seq", 1) > 1:
            if args.attention_backend == "pallas":
                args.attention_backend = "sp_allgather"
            elif args.attention_backend == "windowed":
                args.attention_backend = "sp_windowed"
        mesh = make_mesh(axes)
        if axes.get("data", 1) > 1:
            if args.train_batch_size % axes["data"]:
                raise SystemExit(
                    f"--train_batch_size {args.train_batch_size} must be "
                    f"divisible by the data mesh axis ({axes['data']})"
                )
            batch_sharding = NamedSharding(mesh, P("data"))
    if mesh is not None:
        # the logical-axis map (not just the raw Mesh) must be active:
        # sp_* attention backends and constrain() consult it
        from s2v_tpu.parallel import default_logical_map, mesh_context

        logical = default_logical_map(mesh)
        mesh_ctx = lambda: mesh_context(mesh, logical)  # noqa: E731
    else:
        mesh_ctx = contextlib.nullcontext

    # any param sharding (FSDP over data and/or megatron TP over model)
    use_fsdp = mesh is not None and any(
        ax in mesh.axis_names and int(mesh.shape[ax]) > 1
        for ax in ("data", "model")
    )
    prepare, init_opt, train_step = make_full_train_step(
        pipe.transformer_cfg, pipe.scheduler_cfg, opt_spec,
        attention_backend=args.attention_backend,
        mesh=mesh, compute_dtype=compute_dtype, ema_decay=args.ema_decay,
        remat=_remat_mode(args.remat),
    )
    # fp32 master weights (the bf16 checkpoint would lose update precision).
    # Under FSDP the cast happens host-side per leaf, landing directly on
    # each shard — the fp32 tree never materializes on one device — and the
    # inference copy of the base moves to host so the only device-resident
    # transformer state is the sharded master.
    if use_fsdp:
        host_base = jax.tree.map(
            lambda x: np.asarray(jax.device_get(x)), pipe.transformer_params
        )
        pipe.transformer_params = host_base
        params = prepare(host_base, dtype=jnp.float32)
    else:
        params = prepare(pipe.transformer_params, dtype=jnp.float32)
    opt_state = init_opt(params)

    def _sample_tree():
        """The weights one should sample from: the EMA when enabled."""
        return opt_state[1] if args.ema_decay > 0 else params

    def _val_params():
        """Weights for validation sampling: with FSDP, gather the sharded
        fp32 master (or EMA) to a host bf16 copy so generate() runs the
        standard single-device path (the training FSDP mesh is not a
        product inference mesh — a sharded-tree generate would compile
        against shardings the pipeline never routes)."""
        tree = _sample_tree()
        if not use_fsdp:
            return tree
        return jax.tree.map(
            lambda x: np.asarray(jax.device_get(x)).astype(jnp.bfloat16)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else np.asarray(x),
            tree,
        )

    def save(step, final=False):
        from s2v_tpu.loaders.orbax_io import save_params_orbax

        state_dir = os.path.join(os.path.abspath(args.output_dir), f"train_state_{step}")
        # periodic saves are async (disk writes overlap the next steps;
        # orbax copies device->host synchronously so donation is safe);
        # the final save blocks
        save_params_orbax(
            {"params": params, "opt_state": opt_state, "step": np.asarray(step, np.int32)},
            state_dir,
            block=final,
        )
        log.info("step %d: saved %s", step, state_dir)
        if final:
            from s2v_tpu.loaders.export_hf import save_pipeline_snapshot

            pipe.transformer_params = jax.tree.map(
                lambda x: np.asarray(x), _sample_tree()
            )
            out = save_pipeline_snapshot(
                pipe, os.path.join(args.output_dir, "snapshot"), dtype="bfloat16"
            )
            log.info("exported fine-tuned pipeline snapshot: %s", out)

    step = 0
    micro = 0
    epoch = 0
    skip_batches = 0
    if args.resume_from_checkpoint:
        from s2v_tpu.loaders.orbax_io import load_params_orbax

        try:
            state = load_params_orbax(
                os.path.abspath(os.path.expanduser(args.resume_from_checkpoint)),
                target={"params": params, "opt_state": opt_state, "step": np.asarray(0, np.int32)},
            )
        except Exception as e:
            raise SystemExit(_RESUME_MISMATCH.format(
                path=args.resume_from_checkpoint, err=e)) from e
        params, opt_state, step = state["params"], state["opt_state"], int(state["step"])
        params = prepare(params)
        opt_state = prepare(opt_state)  # moments back onto the FSDP shards
        micro, epoch, skip_batches = _resume_position(args, step, dataset)
        log.info("resumed from %s at step %d (epoch %d, +%d batches)",
                 args.resume_from_checkpoint, step, epoch, skip_batches)

    t0 = time.perf_counter()
    start_step = step
    encode_cache: dict = {}
    while step < args.max_train_steps:
        batches = prefetch_batches(
            latent_batches(dataset, pipe, args.train_batch_size,
                           seed=args.seed + epoch, cache=encode_cache,
                           cache_dir=args.encode_cache_dir)
        )
        for batch in batches:
            if skip_batches:
                skip_batches -= 1
                continue
            rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), micro)
            if batch_sharding is not None:
                for k in ("video_latents", "ref_latents", "text_embeds"):
                    if k in batch:
                        batch[k] = jax.device_put(batch[k], batch_sharding)
            with mesh_ctx():
                params, opt_state, loss = train_step(params, opt_state, batch, rng)
            micro += 1
            if micro % args.gradient_accumulation_steps:
                continue
            step += 1
            if step % 10 == 0 or step == start_step + 1:
                log.info("step %d/%d loss %.4f (%.2f s/step)",
                         step, args.max_train_steps, float(loss),
                         (time.perf_counter() - t0) / (step - start_step))
            if args.validation_steps and step % args.validation_steps == 0:
                _validate(args, pipe, dataset, step, log, params_override=_val_params())
            if step % args.checkpointing_steps == 0 or step >= args.max_train_steps:
                save(step, final=step >= args.max_train_steps)
            if step >= args.max_train_steps:
                break
        epoch += 1
    from s2v_tpu.loaders.orbax_io import wait_for_checkpoints

    wait_for_checkpoints()
    log.info("full fine-tuning complete")


def main(args=None):
    args = args or get_args()
    os.makedirs(args.output_dir, exist_ok=True)

    import jax

    from s2v_tpu.loaders.safetensors_io import save_safetensors
    from s2v_tpu.pipelines.s2v import S2VPipeline
    from s2v_tpu.training.data import (
        VideoFolderDataset,
        latent_batches,
        prefetch_batches,
    )
    from s2v_tpu.training.lora import (
        LoRASpec,
        export_lora_to_reference_format,
        init_lora_params,
        make_lora_train_step,
    )
    from s2v_tpu.utils.logging import get_logger

    log = get_logger("s2v_tpu.train")
    from s2v_tpu.cli_utils import enable_compilation_cache, ensure_backend
    from s2v_tpu.ops.attention import resolve_attention_backend

    enable_compilation_cache(args.compilation_cache_dir)
    ensure_backend()

    args.attention_backend = resolve_attention_backend(args.attention_backend)
    if not (0.0 <= args.ema_decay < 1.0):
        raise SystemExit(
            f"--ema_decay {args.ema_decay} must be in [0, 1): 1.0 would "
            f"freeze the EMA at the initial weights (and the final snapshot "
            f"would export an untrained model)"
        )
    if args.quantize_base and args.train_mode != "lora":
        raise SystemExit("--quantize_base is a LoRA-mode option (full "
                         "fine-tuning updates the base weights, which must "
                         "stay bf16/fp32)")
    if args.quantize_base and args.disentangled_modulation:
        raise SystemExit("--quantize_base cannot combine with "
                         "--disentangled_modulation (the disentangled path "
                         "merges modulation kernels into the base tree)")
    pipe = S2VPipeline.from_pretrained(
        os.path.expanduser(args.pretrained_model_name_or_path),
        quantize_int8=args.quantize_base,
    )
    pipe.set_attention(args.attention_backend, args.attention_window)
    tc = pipe.vae_cfg.temporal_compression_ratio
    if (args.max_num_frames - 1) % tc:
        # the template trims clips so (F-1) divides the VAE's temporal
        # compression (train_cogvideox_lora.py:614-616); we validate the
        # requested count instead of silently dropping frames
        raise SystemExit(
            f"--max_num_frames {args.max_num_frames} must satisfy "
            f"(F - 1) % {tc} == 0 (e.g. {((args.max_num_frames - 1) // tc) * tc + 1})"
        )
    dataset = VideoFolderDataset(
        args.dataset_dir, num_frames=args.max_num_frames, height=args.height, width=args.width
    )
    log.info("dataset: %d clips", len(dataset))

    from s2v_tpu.training.optim import OptimizerSpec

    opt_spec = OptimizerSpec(
        optimizer=args.optimizer,
        learning_rate=args.learning_rate,
        lr_scheduler=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps,
        max_train_steps=args.max_train_steps,
        max_grad_norm=args.max_grad_norm if args.max_grad_norm > 0 else None,
        weight_decay=args.adam_weight_decay,
        beta1=args.adam_beta1,
        beta2=args.adam_beta2,
        epsilon=args.adam_epsilon,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        moment_dtype=args.moment_dtype,
    )
    if args.train_mode == "full":
        return _run_full(args, pipe, dataset, opt_spec, log)

    spec = LoRASpec(rank=args.rank, alpha=args.lora_alpha,
                    disentangled=args.disentangled_modulation)
    batch_sharding = None
    if args.mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from s2v_tpu.parallel.sharding import parse_mesh_spec

        axes = parse_mesh_spec(args.mesh)
        if axes.get("seq", 1) > 1:
            # a Pallas call under plain GSPMD does not partition over the
            # seq axis: reroute the flash kernel to its shard_map AG-KV
            # wrapper and the banded kernel to its SP form (same policy as
            # generate()); both are differentiable (custom-VJP Pallas
            # kernels both ways), so sharded LoRA training gets them too
            if args.attention_backend == "pallas":
                args.attention_backend = "sp_allgather"
            elif args.attention_backend == "windowed":
                args.attention_backend = "sp_windowed"
        if args.fsdp_base:
            if axes.get("model", 1) > 1:
                raise SystemExit("--fsdp_base conflicts with a TP 'model' "
                                 "axis (base params are already sharded)")
            if axes.get("data", 1) < 2:
                raise SystemExit("--fsdp_base needs a data mesh axis >= 2")
            # frozen base tree sharded 1/N over 'data' (ZeRO-3 for the
            # 11.1 GB bf16 base; GSPMD gathers per layer in the scan) —
            # adapters/optimizer stay replicated (~0.4 GB).  shard_now=False
            # so the base is placed ONCE, directly sharded (set_mesh's
            # default replicate would transiently put the full tree on
            # every chip — the exact footprint this flag avoids)
            from s2v_tpu.parallel.sharding import replicate
            from s2v_tpu.training.full import fsdp_param_specs

            pipe.set_mesh(axes, shard_now=False)
            specs = fsdp_param_specs(pipe.transformer_params, axes["data"])
            pipe.transformer_params = jax.tree.map(
                lambda x, sp: jax.device_put(x, NamedSharding(pipe.mesh, sp)),
                pipe.transformer_params, specs,
            )
            pipe.vae_params = replicate(pipe.vae_params, pipe.mesh)
        else:
            pipe.set_mesh(axes)  # TP-shards the base params in place
        if "data" in pipe.mesh.axis_names:
            batch_sharding = NamedSharding(pipe.mesh, P("data"))
    mesh_ctx = pipe._mesh_ctx  # fresh (re-entrant) context per step

    remat = _remat_mode(args.remat)
    lora = init_lora_params(jax.random.PRNGKey(args.seed), pipe.transformer_params, spec)
    # donate=True: the train loop below rebinds (lora, opt_state) every step,
    # so the old fp32 trees are freed in place (~3.3 GB at rank-128 flagship)
    init_opt, train_step = make_lora_train_step(
        pipe.transformer_params, pipe.transformer_cfg, spec, pipe.scheduler_cfg,
        attention_backend=args.attention_backend, optimizer_spec=opt_spec,
        remat=remat, donate=True,
    )
    opt_state = init_opt(lora)

    def save(step):
        # reference-compatible adapter export (the artifact inference loads)
        sd = export_lora_to_reference_format(lora, spec, pipe.transformer_cfg)
        path = os.path.join(args.output_dir, "pytorch_lora_weights_transformer.safetensors")
        save_safetensors(sd, path)
        # full resumable train state (the reference's Accelerate checkpoint
        # dirs carry optimizer.bin etc. alongside the adapters — README:71-78)
        from s2v_tpu.loaders.orbax_io import save_params_orbax

        state_dir = os.path.join(os.path.abspath(args.output_dir), f"train_state_{step}")
        save_params_orbax(
            {"lora": lora, "opt_state": opt_state, "step": np.asarray(step, np.int32)},
            state_dir,
            block=step >= args.max_train_steps,
        )
        log.info("step %d: saved %s (+ %s)", step, path, state_dir)

    step = 0
    micro = 0
    epoch = 0
    skip_batches = 0
    if args.resume_from_checkpoint:
        from s2v_tpu.loaders.orbax_io import load_params_orbax

        try:
            state = load_params_orbax(
                os.path.abspath(os.path.expanduser(args.resume_from_checkpoint)),
                target={"lora": lora, "opt_state": opt_state, "step": np.asarray(0, np.int32)},
            )
        except Exception as e:
            raise SystemExit(_RESUME_MISMATCH.format(
                path=args.resume_from_checkpoint, err=e)) from e
        lora, opt_state, step = state["lora"], state["opt_state"], int(state["step"])
        micro, epoch, skip_batches = _resume_position(args, step, dataset)
        log.info("resumed from %s at step %d (epoch %d, +%d batches)",
                 args.resume_from_checkpoint, step, epoch, skip_batches)
    t0 = time.perf_counter()
    start_step = step
    # clips are encoded once (VAE moments + T5 embeds cached host-side;
    # posterior noise stays per-epoch), and the host-side batch prep runs
    # on a background thread overlapping the device train step
    encode_cache: dict = {}
    while step < args.max_train_steps:
        batches = prefetch_batches(
            latent_batches(dataset, pipe, args.train_batch_size,
                           seed=args.seed + epoch, cache=encode_cache,
                           cache_dir=args.encode_cache_dir)
        )
        for batch in batches:
            if skip_batches:
                skip_batches -= 1
                continue
            rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), micro)
            if batch_sharding is not None:
                for k in ("video_latents", "ref_latents", "text_embeds"):
                    if k in batch:
                        batch[k] = jax.device_put(batch[k], batch_sharding)
            with mesh_ctx():
                lora, opt_state, loss = train_step(lora, opt_state, batch, rng)
            micro += 1
            if micro % args.gradient_accumulation_steps:
                continue  # optimizer update lands on the k-th microstep
            step += 1
            if step % 10 == 0 or step == start_step + 1:
                log.info("step %d/%d loss %.4f (%.2f s/step)",
                         step, args.max_train_steps, float(loss),
                         (time.perf_counter() - t0) / (step - start_step))
            if args.validation_steps and step % args.validation_steps == 0:
                from s2v_tpu.training.lora import (
                    merge_lora_params, runtime_tree_from_training)

                cfg_ov = None
                if spec.disentangled:
                    import dataclasses

                    cfg_ov = dataclasses.replace(
                        pipe.transformer_cfg, disentangled_modulation=True
                    )
                if args.quantize_base:
                    # int8 base can't absorb a merge: sample through the
                    # runtime factor tree (same composition the QLoRA loss
                    # trains)
                    from s2v_tpu.models.transformer import RUNTIME_LORA_KEY

                    ov = dict(pipe.transformer_params)
                    ov[RUNTIME_LORA_KEY] = runtime_tree_from_training(lora, spec)
                else:
                    ov = merge_lora_params(pipe.transformer_params, lora, spec)
                _validate(args, pipe, dataset, step, log,
                          params_override=ov, cfg_override=cfg_ov)
            if step % args.checkpointing_steps == 0 or step >= args.max_train_steps:
                save(step)
            if step >= args.max_train_steps:
                break
        epoch += 1
    if step % args.checkpointing_steps != 0 and step < args.max_train_steps:
        save(step)  # loop already saved on checkpoint boundaries / at the end
    from s2v_tpu.loaders.orbax_io import wait_for_checkpoints

    wait_for_checkpoints()
    log.info("training complete")


if __name__ == "__main__":
    main()
