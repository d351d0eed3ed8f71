"""End-to-end subject-to-video pipeline (reference L5/L7 equivalent).

Orchestrates: T5 prompt encoding (cond + uncond) -> reference-image VAE
encode -> RoPE table construction -> the jitted CFG denoise loop -> VAE
decode -> postprocess.  Mirrors ``CustomCogVideoXPipeline.__call__``
(src/custom_cogvideox_pipe.py:125-326) + the ``inference`` driver
(src/video_generate.py:7-66) with all shape bookkeeping derived from
configs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from s2v_tpu.config import (
    SchedulerConfig,
    T5Config,
    TransformerConfig,
    VAEConfig,
)
from s2v_tpu.models.t5 import t5_encode
from s2v_tpu.models.vae import gaussian_sample, vae_decode, vae_encode
from s2v_tpu.pipelines.denoise import DenoiseSchedule, denoise
from s2v_tpu.ops.rope import build_segmented_rope, prepare_video_and_ref_rope
from s2v_tpu.utils.video import denormalize_video, load_image


@dataclass
class S2VPipeline:
    """Holds params + configs; all compute goes through jitted pure functions."""

    transformer_params: dict
    transformer_cfg: TransformerConfig
    vae_params: dict
    vae_cfg: VAEConfig
    t5_params: Optional[dict] = None
    t5_cfg: Optional[T5Config] = None
    scheduler_cfg: SchedulerConfig = field(default_factory=SchedulerConfig)
    tokenizer: Optional[object] = None  # T5CLSTokenizer
    # "auto" resolves platform-appropriately at configuration time: the
    # fused Pallas flash kernel on TPU, xla (the parity backend) on CPU —
    # the xla path would OOM a 16 GB chip at the flagship 19,126-token
    # geometry (see ops.attention.attention_hbm_guard)
    attention_backend: str = "auto"
    # VAE execution options (reference enable_tiling/enable_slicing,
    # src/inference.py:204-207 — both on by default there too).  Tiling
    # stays on by default for reference output parity (the reference
    # decodes 480p through 2x2 overlap-blended tiles, and tiled vs untiled
    # decodes differ numerically).  "auto" tiles only when the frame
    # exceeds the VAE's native sample size — on a 16 GB TPU chip the full
    # 480p decode fits HBM untiled and is the mathematically exact decoder
    # output (no blend seams), measured 3.98 s vs 5.28 s tiled.
    # "auto" (default): tile only when the frame exceeds the VAE's native
    # sample size — at the flagship 480x720 that means UNTILED, which is
    # the exact decoder output (tiling's overlap-blend is a GPU memory
    # workaround the reference needs and a 16 GB v5e does not: measured
    # 3.98 s vs 5.27 s tiled for 13->49 frames).  True forces reference
    # tiling numerics, False forces whole-frame.
    vae_tiling: object = "auto"  # "auto" | True | False
    vae_slicing: bool = True
    # multi-chip: a jax.sharding.Mesh + logical->mesh axis map.  Attach via
    # from_pretrained(mesh=...) or set_mesh(); generate() then runs the
    # denoise under the mesh context (TP via sharded params, SP/DP via
    # GSPMD constraints or the ring backend) and routes decode through the
    # context-parallel VAE when a seq axis exists.
    mesh: Optional[object] = None
    logical_map: Optional[dict] = None
    # the resolved source snapshot dir (set by from_pretrained); lets
    # save_pretrained copy non-weight assets (tokenizer files)
    model_dir: Optional[str] = None

    def set_mesh(self, mesh, shard_now: bool = True) -> None:
        """Attach a device mesh: ``"dp2,tp4"`` | ``{"data": 2, "model": 4}``
        | ``jax.sharding.Mesh`` | None (back to single-device).

        With a ``model`` axis the transformer params are megatron-sharded in
        place (works for bf16 and int8 trees); otherwise params are
        replicated across the mesh.  Clears the compiled-loop cache."""
        from s2v_tpu.parallel import default_logical_map, make_mesh
        from s2v_tpu.parallel.sharding import (
            parse_mesh_spec,
            replicate,
            shard_params,
            transformer_param_specs_like,
        )

        if mesh is None:
            self.mesh = self.logical_map = None
            self._runtime_lora_cache.clear()
            self._compiled_denoise.clear()
            return
        if isinstance(mesh, str):
            mesh = make_mesh(parse_mesh_spec(mesh))
        elif isinstance(mesh, dict):
            mesh = make_mesh(mesh)
        self.mesh = mesh
        self.logical_map = default_logical_map(mesh)
        if shard_now:
            if "model" in mesh.axis_names and mesh.shape["model"] > 1:
                specs = transformer_param_specs_like(self.transformer_params, "model")
                self.transformer_params = shard_params(self.transformer_params, mesh, specs)
            else:
                self.transformer_params = replicate(self.transformer_params, mesh)
            self.vae_params = replicate(self.vae_params, mesh)
            if self.t5_on_mesh and self.t5_params is not None:
                from s2v_tpu.parallel.sharding import t5_param_specs

                if "model" in mesh.axis_names and mesh.shape["model"] > 1:
                    self.t5_params = shard_params(
                        self.t5_params, mesh, t5_param_specs(self.t5_params, "model")
                    )
                else:
                    self.t5_params = replicate(self.t5_params, mesh)
                self._prompt_embed_cache.clear()
        # cached runtime-LoRA factor trees were placed for the previous
        # mesh/device layout; an *attached* adapter was just re-placed with
        # the params above, but the idle cache entries are stale
        self._runtime_lora_cache.clear()
        self._compiled_denoise.clear()

    def _mesh_ctx(self):
        import contextlib

        from s2v_tpu.parallel import mesh_context

        if self.mesh is None:
            return contextlib.nullcontext()
        return mesh_context(self.mesh, self.logical_map)

    def _seq_ring(self) -> int:
        """Size of the mesh's 'seq' axis (1 when absent/no mesh)."""
        if self.mesh is not None and "seq" in self.mesh.axis_names:
            return int(self.mesh.shape["seq"])
        return 1

    def set_attention(self, backend: str, window: Optional[int] = None) -> None:
        """Configure the attention backend (and, for the windowed family,
        the window half-width) — the one place entry points route through,
        so the backend-name list lives in ops/attention.py only."""
        import dataclasses

        from s2v_tpu.ops.attention import (
            WINDOWED_BACKENDS,
            resolve_attention_backend,
        )

        backend = resolve_attention_backend(backend)
        self.attention_backend = backend
        if backend in WINDOWED_BACKENDS and window is not None:
            self.transformer_cfg = dataclasses.replace(
                self.transformer_cfg, attention_window_frames=window
            )

    def _resolve_tiling(self, height_px: int, width_px: int) -> bool:
        if self.vae_tiling == "auto":
            return (height_px > self.vae_cfg.sample_height
                    or width_px > self.vae_cfg.sample_width)
        return bool(self.vae_tiling)
    # text encoder placement: True = T5 params live in host RAM and encode
    # runs on the CPU backend (the TPU equivalent of the reference's
    # enable_model_cpu_offload, pipeline_utils.py:991 — on a 16 GB v5e chip
    # T5-XXL ~9.4 GB bf16 + DiT ~11.1 GB cannot both be HBM-resident)
    t5_on_host: bool = False
    # True = T5 params are TP-sharded over the mesh's 'model' axis and
    # encode runs on-device (text_encoder_device="mesh"): pod configs must
    # not inherit the single-chip host path's serial-CPU encode latency
    # (bench_runs/t5_host.json)
    t5_on_mesh: bool = False
    # sticky degraded-decode flag: once a resident-serving decode exhausts
    # HBM, later requests go straight to the lean tiled path instead of
    # re-paying the doomed compile (see decode_latents)
    _decode_lean: bool = field(default=False, repr=False)
    # compiled-denoise cache for repeated generate() calls (serving)
    _compiled_denoise: dict = field(default_factory=dict, repr=False)
    # prompt -> embedding cache (serving: the "" negative prompt repeats
    # every request; host-side T5 is worth caching)
    _prompt_embed_cache: dict = field(default_factory=dict, repr=False)
    # pre-merge base transformer state dict, host numpy (load_lora keeps
    # it so repeat subject swaps skip the snapshot disk re-read)
    _base_transformer_sd: Optional[dict] = field(default=None, repr=False)
    # (path, alpha) of the adapter currently FOLDED into the base weights
    # (merge mode); runtime mode must start from pristine base kernels
    _merged_lora: Optional[tuple] = field(default=None, repr=False)
    # runtime-mode factor trees resident on device, keyed (path, alpha) —
    # re-selecting a cached subject adapter is a dict assignment (~0 s)
    _runtime_lora_cache: dict = field(default_factory=dict, repr=False)

    # ------------------------------------------------------------------
    # loading (reference src/inference.py:172-247)
    # ------------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        model_dir: str,
        lora_checkpoint: Optional[str] = None,
        lora_alpha: float = 64.0,
        dtype=jnp.bfloat16,
        attention_backend: str = "auto",
        quantize_int8: bool = False,
        text_encoder_device: str = "auto",  # "auto" | "device" | "host" | "mesh"
        disentangled_modulation: bool = False,
        mesh=None,  # "dp2,tp4" | {"data": 2, ...} | jax.sharding.Mesh
        cache_dir: Optional[str] = None,
    ) -> "S2VPipeline":
        """Load a CogVideoX snapshot — a local HF-layout dir (transformer/
        vae/ text_encoder/ tokenizer/ scheduler/) or a hub repo id like
        ``THUDM/CogVideoX-5b`` (downloaded via huggingface_hub when the
        network is allowed; see loaders/resolve.py for the offline gates) —
        plus an optional S2V LoRA checkpoint, merged at init.

        ``text_encoder_device="auto"`` keeps T5 in host RAM when the T5 +
        transformer parameters would overflow a single accelerator's HBM
        (single-chip 5b: 9.4 + 11.1 GB > 16 GB v5e)."""
        from s2v_tpu.loaders import (
            convert_t5_state_dict,
            convert_transformer_state_dict,
            convert_vae_state_dict,
            load_and_merge_lora,
            load_sharded_safetensors,
        )
        from s2v_tpu.loaders.resolve import resolve_model_dir

        model_dir = resolve_model_dir(model_dir, cache_dir=cache_dir)

        t_cfg = TransformerConfig.from_hf_config(
            os.path.join(model_dir, "transformer", "config.json"), dtype=dtype, param_dtype=dtype
        )
        sd = load_sharded_safetensors(os.path.join(model_dir, "transformer"))
        if disentangled_modulation:
            # intended enable_lora semantics (SURVEY.md §0): keep the
            # pre-merge modulation linears for the video/text streams
            import dataclasses

            t_cfg = dataclasses.replace(t_cfg, disentangled_modulation=True)
            for i in range(t_cfg.num_layers):
                for n in ("norm1", "norm2"):
                    for wb in ("weight", "bias"):
                        sd[f"transformer_blocks.{i}.{n}.base_linear.{wb}"] = sd[
                            f"transformer_blocks.{i}.{n}.linear.{wb}"
                        ]
        if lora_checkpoint is not None:
            sd, _ = load_and_merge_lora(sd, lora_checkpoint, alpha=lora_alpha)
        transformer_params = convert_transformer_state_dict(sd, t_cfg, quantize_int8=quantize_int8)

        v_cfg = VAEConfig.from_hf_config(
            os.path.join(model_dir, "vae", "config.json"), dtype=dtype, param_dtype=dtype
        )
        vae_params = convert_vae_state_dict(
            load_sharded_safetensors(os.path.join(model_dir, "vae")), v_cfg
        )

        t5_dir = os.path.join(model_dir, "text_encoder")
        t5_params = t5_cfg = tokenizer = None
        t5_on_host = False
        if os.path.isdir(t5_dir):
            t5_cfg = T5Config.from_hf_config(
                os.path.join(t5_dir, "config.json"), dtype=dtype, param_dtype=dtype
            )
            t5_sd = load_sharded_safetensors(t5_dir)  # numpy, host-side
            if text_encoder_device == "host":
                t5_on_host = True
            elif text_encoder_device == "mesh":
                t5_on_host = False  # sharded over the mesh below (set_mesh)
            elif text_encoder_device == "auto":
                itemsize = jnp.dtype(dtype).itemsize
                model_bytes = itemsize * (
                    sum(int(np.prod(v.shape)) for v in t5_sd.values())
                    + sum(x.size for x in jax.tree.leaves(transformer_params))
                )
                dev = jax.devices()[0]
                t5_on_host = dev.platform == "tpu" and model_bytes > 13.5e9
            if t5_on_host:
                # host CPUs emulate bf16 — fp32 encode measured 6x faster
                # at full XXL dims (29 vs 179 s warm on a 1-core host,
                # bench_runs/t5_host.json); RAM cost 19 GB vs 9.4 GB
                import dataclasses

                t5_cfg = dataclasses.replace(
                    t5_cfg, dtype=jnp.float32, param_dtype=jnp.float32
                )
                with jax.default_device(jax.devices("cpu")[0]):
                    t5_params = convert_t5_state_dict(t5_sd, t5_cfg)
            else:
                t5_params = convert_t5_state_dict(t5_sd, t5_cfg)
            from s2v_tpu.utils.tokenizer import T5CLSTokenizer

            try:
                tokenizer = T5CLSTokenizer.from_checkpoint_dir(model_dir)
            except Exception:
                # sentencepiece-only checkpoints (spiece.model, no
                # tokenizer.json): the native C++ unigram tokenizer
                spiece = os.path.join(model_dir, "tokenizer", "spiece.model")
                if os.path.exists(spiece):
                    try:
                        from s2v_tpu.utils.sp_native import NativeSPTokenizer

                        tokenizer = NativeSPTokenizer(spiece)
                    except Exception:
                        tokenizer = None
                else:
                    tokenizer = None

        sched_path = os.path.join(model_dir, "scheduler", "scheduler_config.json")
        scheduler_cfg = (
            SchedulerConfig.from_hf_config(sched_path) if os.path.exists(sched_path) else SchedulerConfig()
        )
        from s2v_tpu.ops.attention import resolve_attention_backend

        pipe = cls(
            transformer_params=transformer_params,
            transformer_cfg=t_cfg,
            vae_params=vae_params,
            vae_cfg=v_cfg,
            t5_params=t5_params,
            t5_cfg=t5_cfg,
            scheduler_cfg=scheduler_cfg,
            tokenizer=tokenizer,
            attention_backend=resolve_attention_backend(attention_backend),
            t5_on_host=t5_on_host,
            model_dir=model_dir,
        )
        if lora_checkpoint is not None:
            pipe._merged_lora = (os.path.realpath(lora_checkpoint), float(lora_alpha))
        if text_encoder_device == "mesh":
            if mesh is None:
                raise ValueError('text_encoder_device="mesh" needs mesh=...')
            pipe.t5_on_mesh = True
        if mesh is not None:
            pipe.set_mesh(mesh)
        return pipe

    def load_lora(self, lora_checkpoint: Optional[str],
                  lora_alpha: float = 64.0, cache_base: bool = True,
                  mode: str = "merge") -> None:
        """Hot-swap the subject LoRA adapter without reloading the pipeline.

        ``mode="merge"`` (default, the exact/zero-overhead path): re-reads
        the BASE transformer weights from the source snapshot
        (``model_dir``; with ``cache_base=True`` the host tree is kept, so
        repeat swaps skip the disk re-read entirely), merges the new
        adapter (``None`` resets to base weights), and swaps the param
        tree in place.  Compiled executables
        stay valid — params are traced arguments of the cached denoise
        programs and shapes/dtypes/shardings are unchanged — so switching
        subjects in a serving daemon costs one host snapshot re-read +
        merge + upload (seconds), not a re-jit (minutes).  The old device
        tree is freed BEFORE the new one uploads: two flagship trees
        (2 x 11.1 GB bf16) would not fit a 16 GB chip.  Host-side failures
        (bad path, key mismatch) raise before the old tree is touched.

        ``mode="runtime"`` (multi-tenant serving fast path): the base
        kernels stay untouched and the adapter rides as a low-rank factor
        tree inside the params pytree, applied per layer inside the block
        scan (models/transformer.py, RUNTIME_LORA_KEY) — the reference's
        own PEFT runtime-adapter architecture (src/inference.py:218-229),
        TPU-shaped.  Swap cost is a ~0.4 GB factor upload (rank 128) — and
        ~0 s for adapters already in the device cache — vs an 11 GB
        re-merge; per-step overhead is <0.5% FLOPs.  Over an int8
        (``quantize_int8=True``) base the factors apply output-additively
        inside each dense (ops/quant.py) — the QLoRA serving composition;
        over bf16 they merge per layer.  ``None`` detaches the factors
        (instant base restore).  Structure changes (attach from base /
        detach) recompile the denoise loop once; swapping between adapters
        reuses executables.

        The reference has no equivalent of either: swapping the subject
        LoRA there means a new process and a full model reload + PEFT
        injection (src/inference.py:172-247).
        """
        from s2v_tpu.loaders import (
            convert_transformer_state_dict,
            load_and_merge_lora,
            load_sharded_safetensors,
        )

        if mode not in ("merge", "runtime"):
            raise ValueError(f"lora mode must be 'merge' or 'runtime', got {mode!r}")
        if mode == "runtime":
            # resolve + validate the factor tree BEFORE unwinding any merged
            # adapter: a bad checkpoint must leave the pipeline exactly as
            # it was (fail-before-mutate, same contract as the merge path)
            tree = self._resolve_runtime_lora(lora_checkpoint, lora_alpha)
            if self._merged_lora is not None:
                # a merged adapter is folded into the kernels; restore the
                # pristine base first so factors don't stack on top of it
                self.load_lora(None, cache_base=cache_base, mode="merge")
            self._attach_runtime_lora(tree)
            return
        self.set_runtime_lora(None)  # merge mode owns the kernels
        if lora_checkpoint is None and self._merged_lora is None:
            return  # base kernels are already pristine: nothing to upload

        base = self._base_transformer_sd
        if base is None:
            if not self.model_dir:
                raise ValueError(
                    "load_lora needs the source snapshot (pipeline was not "
                    "built by from_pretrained); reload with from_pretrained"
                )
            base = load_sharded_safetensors(os.path.join(self.model_dir, "transformer"))
            if self.transformer_cfg.disentangled_modulation:
                for i in range(self.transformer_cfg.num_layers):
                    for n in ("norm1", "norm2"):
                        for wb in ("weight", "bias"):
                            base[f"transformer_blocks.{i}.{n}.base_linear.{wb}"] = base[
                                f"transformer_blocks.{i}.{n}.linear.{wb}"
                            ]
            if cache_base:
                # keep the pre-merge host tree (~11 GB bf16 for the 5b —
                # host RAM, not HBM) so repeat subject swaps skip the
                # snapshot re-read; the merge never mutates base arrays
                self._base_transformer_sd = base
        sd = dict(base)
        if lora_checkpoint is not None:
            sd, _ = load_and_merge_lora(sd, lora_checkpoint, alpha=lora_alpha)
        quantized = any(
            getattr(x, "dtype", None) == jnp.int8
            for x in jax.tree.leaves(self.transformer_params)
        )
        # convert host-side (numpy), free the old device tree, THEN upload —
        # never two transformer trees in HBM at once
        host_params = convert_transformer_state_dict(
            sd, self.transformer_cfg, quantize_int8=quantized, device=False
        )
        del sd
        self.transformer_params = None
        if self.mesh is not None:
            from s2v_tpu.parallel.sharding import (
                replicate,
                shard_params,
                transformer_param_specs_like,
            )

            if "model" in self.mesh.axis_names and self.mesh.shape["model"] > 1:
                specs = transformer_param_specs_like(host_params, "model")
                self.transformer_params = shard_params(host_params, self.mesh, specs)
            else:
                self.transformer_params = replicate(host_params, self.mesh)
        else:
            self.transformer_params = jax.device_put(host_params)
        self._merged_lora = (
            None if lora_checkpoint is None
            else (os.path.realpath(lora_checkpoint), float(lora_alpha))
        )
        # NOTE: _compiled_denoise is intentionally NOT cleared (see above).

    def set_runtime_lora(self, tree: Optional[dict]) -> None:
        """Attach (or detach, ``tree=None``) a runtime LoRA factor tree —
        the layout of ``loaders.lora.runtime_lora_tree`` / the trainer's
        ``runtime_tree_from_training``.  Low-level: callers hand a built
        tree (host numpy or device arrays); ``load_lora(mode="runtime")``
        is the checkpoint-path front end."""
        from s2v_tpu.models.transformer import RUNTIME_LORA_KEY

        if tree is None:
            if isinstance(self.transformer_params, dict):
                self.transformer_params.pop(RUNTIME_LORA_KEY, None)
            return
        self._check_runtime_lora_ok()
        self.transformer_params[RUNTIME_LORA_KEY] = self._place_runtime_tree(tree)

    def _check_runtime_lora_ok(self) -> None:
        """Preconditions for attaching runtime factors, checked BEFORE any
        state is touched."""
        if self._merged_lora is not None:
            raise ValueError(
                "a merged LoRA adapter is folded into the base kernels; "
                "runtime factors would stack on top of it — reset with "
                "load_lora(None) first, or use load_lora(path, "
                "mode='runtime') which unwinds the merge automatically"
            )

    def _place_runtime_tree(self, tree: dict):
        dt = self.transformer_cfg.param_dtype
        tree = jax.tree.map(lambda x: jnp.asarray(x, dt), tree)
        if self.mesh is not None:
            from s2v_tpu.parallel.sharding import replicate

            tree = replicate(tree, self.mesh)
        return tree

    def _resolve_runtime_lora(
        self, lora_checkpoint: Optional[str], lora_alpha: float
    ) -> Optional[dict]:
        """Load (or cache-hit) a placed runtime factor tree WITHOUT touching
        pipeline state — load_lora attaches it only after this succeeds and
        any merged adapter is unwound (fail-before-mutate)."""
        if lora_checkpoint is None:
            return None
        # the merged-adapter case is legal here (the caller unwinds it
        # between resolve and attach); int8 bases take the output-additive
        # factor path inside ops.quant.dense
        key = (os.path.realpath(lora_checkpoint), float(lora_alpha))
        host = self._runtime_lora_cache.pop(key, None)
        if host is None:
            from s2v_tpu.loaders.lora import load_runtime_lora

            host = load_runtime_lora(
                lora_checkpoint, self.transformer_cfg.num_layers, alpha=lora_alpha
            )
            # evict least-recently-used (host numpy, ~0.8 GB fp32 at r128)
            while len(self._runtime_lora_cache) >= 4:
                self._runtime_lora_cache.pop(next(iter(self._runtime_lora_cache)))
        # (re-)insert last: hits refresh recency, so hot adapters survive.
        # The cache holds HOST trees: keeping idle adapters in HBM stole
        # ~0.4 GB per entry from the resident-serving decode budget
        # (round-5 warm-request OOM); a swap now pays one ~0.4 GB factor
        # upload — seconds — and only the ATTACHED adapter lives on device.
        self._runtime_lora_cache[key] = host
        return self._place_runtime_tree(host)

    def _attach_runtime_lora(self, tree: Optional[dict]) -> None:
        from s2v_tpu.models.transformer import RUNTIME_LORA_KEY

        if tree is None:
            self.transformer_params.pop(RUNTIME_LORA_KEY, None)
        else:
            self.transformer_params[RUNTIME_LORA_KEY] = tree

    def save_pretrained(self, out_dir: str, dtype: Optional[str] = None) -> str:
        """Write the current weights as an HF-layout snapshot loadable by
        ``from_pretrained`` (or the reference stack).  LoRA is merged at
        load here, so this exports *fused* weights — the reference has no
        save path at all (SURVEY §5 checkpoint/resume: load-only).
        ``dtype="bfloat16"`` halves the snapshot (hub-checkpoint size);
        default keeps lossless fp32."""
        from s2v_tpu.loaders.export_hf import save_pipeline_snapshot
        from s2v_tpu.models.transformer import RUNTIME_LORA_KEY

        if (isinstance(self.transformer_params, dict)
                and RUNTIME_LORA_KEY in self.transformer_params):
            raise ValueError(
                "save_pretrained with a runtime LoRA attached would export "
                "only the base weights; reload the adapter with "
                "load_lora(path, mode='merge') to export fused weights, or "
                "set_runtime_lora(None) to export the base model"
            )
        return save_pipeline_snapshot(self, out_dir, dtype=dtype)

    # ------------------------------------------------------------------
    # stages
    # ------------------------------------------------------------------

    def encode_prompt(
        self,
        prompt: Union[str, list],
        negative_prompt: Union[str, list, None] = None,
        max_sequence_length: Optional[int] = None,
        do_cfg: bool = True,
    ) -> jnp.ndarray:
        """-> [2B (uncond|cond), T, d_model] (reference encode_prompt
        :43-123; negative prompt defaults to "").  Sequence length defaults
        to the transformer's ``max_text_seq_length`` (226 for CogVideoX)."""
        if self.t5_params is None or self.tokenizer is None:
            raise ValueError("pipeline loaded without a text encoder/tokenizer; pass prompt_embeds")
        if max_sequence_length is None:
            max_sequence_length = self.transformer_cfg.max_text_seq_length
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        cond = self._encode_texts(prompts, max_sequence_length)
        if not do_cfg:
            return cond
        neg = negative_prompt if negative_prompt is not None else ""
        negs = [neg] * len(prompts) if isinstance(neg, str) else list(neg)
        uncond = self._encode_texts(negs, max_sequence_length)
        return jnp.concatenate([uncond, cond], axis=0)

    def _encode_texts(self, texts: list, max_length: int) -> jnp.ndarray:
        """T5-encode a list of strings with a per-text embedding cache.

        When ``t5_on_host`` the encode runs on the CPU backend (params are
        host-committed) and only the resulting [T, d_model] embeddings move
        to the accelerator — the TPU equivalent of the reference's model
        CPU offload for the text encoder."""
        missing = list(dict.fromkeys(t for t in texts if (t, max_length) not in self._prompt_embed_cache))
        if missing:
            ids = jnp.asarray(self.tokenizer.encode(missing, max_length))
            if self.t5_on_host:
                cpu = jax.devices("cpu")[0]
                with jax.default_device(cpu):
                    emb = t5_encode(self.t5_params, self.t5_cfg, jax.device_put(ids, cpu))
                emb = jax.device_put(emb, jax.devices()[0])
            elif self.t5_on_mesh and self.mesh is not None:
                # TP-sharded on-device encode: one jitted program under the
                # mesh; GSPMD inserts the row-parallel psums from the param
                # shardings (t5_param_specs)
                with self._mesh_ctx():
                    emb = jax.jit(lambda p, i: t5_encode(p, self.t5_cfg, i))(
                        self.t5_params, ids
                    )
            else:
                emb = t5_encode(self.t5_params, self.t5_cfg, ids)
            # FIFO cap; never evict keys needed by THIS call
            needed = {(t, max_length) for t in texts}
            for key_ in list(self._prompt_embed_cache):
                if len(self._prompt_embed_cache) + len(missing) <= 32:
                    break
                if key_ not in needed:
                    self._prompt_embed_cache.pop(key_)
            for t, e in zip(missing, emb):
                self._prompt_embed_cache[(t, max_length)] = e
        return jnp.stack([self._prompt_embed_cache[(t, max_length)] for t in texts], axis=0)

    def encode_ref_image(
        self, image: Union[str, np.ndarray], rng_key: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """image (path or [-1,1] float [H, W, 3]) -> scaled ref latents
        [1, 1, h, w, C] (reference src/video_generate.py:26-38: sampled
        posterior x scaling_factor; tiled encode engages at 480x720)."""
        if isinstance(image, str):
            image = load_image(image)
        x = jnp.asarray(image, self.vae_cfg.dtype)[None, None]  # [1, 1, H, W, 3]
        moments = vae_encode(
            self.vae_params, self.vae_cfg, x,
            use_tiling=self._resolve_tiling(x.shape[2], x.shape[3]),
            use_slicing=self.vae_slicing,
        )
        if rng_key is not None:
            noise = jax.random.normal(
                rng_key, moments.shape[:-1] + (moments.shape[-1] // 2,), jnp.float32
            ).astype(moments.dtype)
        else:
            noise = None
        z = gaussian_sample(moments, noise)
        return z * self.vae_cfg.scaling_factor

    def prepare_rope(self, height: int, width: int, num_latent_frames: int):
        cfg = self.transformer_cfg
        if not cfg.use_rotary_positional_embeddings:
            return None, None
        vc, vs, rc, rs = prepare_video_and_ref_rope(
            height,
            width,
            num_latent_frames,
            cfg.attention_head_dim,
            cfg.patch_size,
            self.vae_cfg.spatial_compression_ratio,
        )
        return build_segmented_rope(cfg.max_text_seq_length, rc, rs, vc, vs)

    def decode_latents(self, latents: jnp.ndarray) -> np.ndarray:
        """latents [B, F, h, w, C] -> [B, T, H, W, 3] float32 in [0, 1]
        (reference decode_latents :346-351 + postprocess_video).

        With a mesh carrying a ``seq`` axis the decode runs
        context-parallel (parallel/vae_temporal.py): the canonical-schedule
        variant reproduces the reference's remainder-fold chunking EXACTLY
        (the odd first chunk streams on one device, its conv caches are
        injected as device 0's halo state, the uniform rest decodes in
        parallel) — so the flagship 13-frame decode is CP-served too.
        Untiled (the CP paths decode whole frames)."""
        z = latents.astype(self.vae_cfg.dtype) / self.vae_cfg.scaling_factor
        ring = self._seq_ring()
        sc_ = self.vae_cfg.spatial_compression_ratio
        if ring > 1 and self._resolve_tiling(z.shape[2] * sc_, z.shape[3] * sc_):
            # above-native resolutions tile spatially; with a seq mesh the
            # independent tiles decode in PARALLEL (parallel/vae_spatial.py
            # — bit-compatible with the sequential tiled decode)
            from s2v_tpu.parallel.vae_spatial import (
                spatial_cp_supported,
                spatial_tiled_decode_cp,
            )

            if spatial_cp_supported(self.vae_cfg, z, self.mesh, "seq"):
                frames = spatial_tiled_decode_cp(
                    self.vae_params, self.vae_cfg, z, self.mesh, "seq"
                )
                return denormalize_video(np.asarray(frames.astype(jnp.float32)))
        t = z.shape[1]
        fb = self.vae_cfg.num_latent_frames_batch_size
        n_cp = 0
        if ring > 1:
            from s2v_tpu.parallel.vae_temporal import canonical_cp_chunks

            n_cp = canonical_cp_chunks(self.vae_cfg, t)
        if ring > 1 and t % ring == 0 and t // ring == fb:
            # uniform chunking IS the canonical schedule here and runs
            # fully parallel (the canonical path would stream its first
            # chunk sequentially for no parity gain)
            from s2v_tpu.parallel.vae_temporal import sharded_vae_decode

            frames = sharded_vae_decode(self.vae_params, self.vae_cfg, z, self.mesh)
        elif ring > 1 and 1 <= n_cp <= ring:
            from s2v_tpu.parallel.vae_temporal import sharded_vae_decode_canonical

            frames = sharded_vae_decode_canonical(self.vae_params, self.vae_cfg, z, self.mesh)
        else:
            if ring > 1:
                # n_cp > ring: CP would need a uniform chunk size larger than
                # the canonical fb-frame chunks, silently changing decode
                # numerics vs the single-device/reference output — stream
                # canonically instead (exact parity beats parallelism here)
                from s2v_tpu.utils.logging import get_logger

                get_logger("s2v_tpu.pipeline").warning(
                    "seq mesh (ring=%d) cannot serve the canonical %d-chunk "
                    "decode schedule for %d latent frames; falling back to "
                    "the single-device canonical streaming decode",
                    ring, n_cp, t,
                )
            sc = self.vae_cfg.spatial_compression_ratio
            tiled = self._resolve_tiling(z.shape[2] * sc, z.shape[3] * sc)
            # Resident-serving HBM gate: with the DiT (+adapters, T5)
            # HBM-resident, the untiled 480p decode's ~4-5 GB workspace may
            # not fit.  Attempting it anyway is WORSE than degrading
            # upfront: a failed execution with donated conv-cache buffers
            # does not reliably release HBM, so the retry inherits a full
            # chip (observed round 5).  TPU exposes live memory_stats —
            # route by actual free bytes instead of failing first.
            if not self._decode_lean and not tiled:
                free = self._device_free_bytes()
                if free is not None and free < 5.5e9:
                    from s2v_tpu.utils.logging import get_logger

                    get_logger("s2v_tpu.pipeline").info(
                        "decode: %.1f GB HBM free with the serving stack "
                        "resident — using %s instead of the untiled decode",
                        free / 2**30,
                        "quarter-size tiles" if free < 2.5e9
                        else "reference-style tiling",
                    )
                    if free < 2.5e9:
                        self._decode_lean = True
                    else:
                        tiled = True
            if self._decode_lean:
                # this process already established that only the lean path
                # fits — go straight there (re-attempting the doomed
                # compile/execute wastes ~30-60 s per request)
                return denormalize_video(np.asarray(
                    self._decode_lean_tiles(z).astype(jnp.float32)))
            # degrade, don't die: the "auto" untiled 480p decode fits a
            # 16 GB chip when the decode has the HBM to itself (bench.py
            # frees the DiT first) but can exhaust it in a resident serving
            # process (DiT + adapters + T5 stay loaded).  The tiled decode
            # is the reference's own memory workaround — exact per-tile,
            # overlap-blended seams — so fall back to it instead of failing
            # the request.  The retry happens OUTSIDE the except block: the
            # exception's traceback pins the failed call's locals (the
            # multi-GB conv-cache pytree), and retrying while those are
            # still live just exhausts HBM again.
            oom = False
            try:
                frames = vae_decode(
                    self.vae_params, self.vae_cfg, z,
                    use_tiling=tiled, use_slicing=self.vae_slicing,
                )
            except Exception as e:
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                oom = True  # except-var (and its frame pins) drop at exit
            if oom:
                import gc

                from s2v_tpu.utils.logging import get_logger

                get_logger("s2v_tpu.pipeline").warning(
                    "VAE decode exhausted HBM with the serving stack "
                    "resident — retrying with quarter-size spatial tiles "
                    "(4x less activation peak per decoder call; overlap "
                    "blending as in the reference tiled path).  Subsequent "
                    "requests take the lean path directly."
                )
                self._decode_lean = True
                gc.collect()  # free the failed attempt's device buffers NOW
                frames = self._decode_lean_tiles(z)
        return denormalize_video(np.asarray(frames.astype(jnp.float32)))

    def _device_free_bytes(self):
        """Estimated free HBM on device 0, or None on CPU.

        Prefers live ``memory_stats`` when the backend provides it; the
        axon relay does not, so the fallback computes what this pipeline
        holds resident (transformer incl. runtime factors, VAE, on-device
        T5) against the v5e's 15.75 GB usable (the figure every XLA OOM
        dump on this chip reports) minus its 258 MB reserved block."""
        try:
            import jax

            if jax.default_backend() == "cpu":
                return None
            st = jax.local_devices()[0].memory_stats() or {}
            limit, used = st.get("bytes_limit"), st.get("bytes_in_use")
            if limit is not None and used is not None:
                return int(limit) - int(used)
            resident = 0
            for tree in (self.transformer_params, self.vae_params,
                         None if self.t5_on_host else self.t5_params):
                if tree is None:
                    continue
                for leaf in jax.tree.leaves(tree):
                    if hasattr(leaf, "nbytes"):
                        resident += int(leaf.nbytes)
            usable = 15.75 * 2**30 - 258 * 2**20
            return max(0, int(usable) - resident)
        except Exception:
            return None

    def _decode_lean_tiles(self, z):
        """Degraded-mode decode for HBM-constrained resident serving:
        reference-style tiled decode at quarter-size tiles."""
        import dataclasses

        sc = self.vae_cfg.spatial_compression_ratio
        lean_cfg = dataclasses.replace(
            self.vae_cfg,
            # tile mins derive from sample dims (sample/2); halving them
            # quarters each tile's area.  Floor: 16 latent px.
            sample_height=max(self.vae_cfg.sample_height // 2, 16 * sc),
            sample_width=max(self.vae_cfg.sample_width // 2, 16 * sc),
        )
        return vae_decode(
            self.vae_params, lean_cfg, z,
            use_tiling=True, use_slicing=self.vae_slicing,
        )

    def postprocess_video(self, video01: np.ndarray, output_type: str):
        """Reference ``VideoProcessor.postprocess_video`` output types
        (video_processor.py:89-113): "np" -> float array [B, T, H, W, 3] in
        [0, 1]; "pil" -> per-batch lists of PIL images; "pt" -> torch
        tensor [B, T, C, H, W]."""
        if output_type == "np":
            return video01
        if output_type == "pil":
            from PIL import Image

            from s2v_tpu.utils.video import to_uint8_frames

            return [[Image.fromarray(f) for f in to_uint8_frames(clip)] for clip in video01]
        if output_type == "pt":
            import torch

            return torch.from_numpy(np.ascontiguousarray(video01)).permute(0, 1, 4, 2, 3)
        raise ValueError(f"unknown output_type {output_type!r} (np | pil | pt | latent)")

    # ------------------------------------------------------------------
    # end to end
    # ------------------------------------------------------------------

    def generate(
        self,
        prompt: Optional[str] = None,
        ref_image: Union[str, np.ndarray, None] = None,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 720,
        num_frames: int = 49,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        use_dynamic_cfg: bool = False,
        use_dpm: bool = False,
        num_videos_per_prompt: int = 1,
        seed: int = 420,
        latents: Optional[jnp.ndarray] = None,
        prompt_embeds: Optional[jnp.ndarray] = None,
        ref_latents: Optional[jnp.ndarray] = None,
        output_type: str = "np",
        cfg_mode: str = "auto",  # auto: batched, except B>1 on one chip -> sequential
        adaptive_threshold: float = 0.0,  # >0: opt-in step-skipping fast path
        cfg_skip_threshold: float = 0.0,  # >0: skip uncond forwards once dynamic g-1 < thr
        segment_steps: int = 0,  # >0: host-stepped segments of this many steps
        callback_on_segment_end=None,  # f(step, latents) -> None | False (stop) | new latents
        progress: bool = False,  # per-step progress from inside the fused loop
    ):
        """Generate a clip; returns [B, T, H, W, 3] float in [0,1] (np) or
        the final latents (output_type="latent")."""
        from s2v_tpu.ops.attention import (
            attention_hbm_guard,
            resolve_attention_backend,
            route_seq_backend,
        )

        self.attention_backend = resolve_attention_backend(self.attention_backend)
        tp_size = (
            int(self.mesh.shape["model"])
            if self.mesh is not None and "model" in self.mesh.axis_names
            else 1
        )
        backend, reroute_reason = route_seq_backend(
            self.attention_backend,
            self.transformer_cfg.num_attention_heads,
            self._seq_ring(),
            tp_size,
        )
        if reroute_reason:
            from s2v_tpu.utils.logging import get_logger

            get_logger("s2v_tpu.pipeline").warning(reroute_reason)
        cfg = self.transformer_cfg

        # input validation (reference check_inputs :372-421 + the static
        # positional-table guard custom_cogvideox_pipe.py:152-155)
        # The reference caps clips at sample_frames=49 because its RoPE
        # table is precomputed for 14 frames (custom_cogvideox_pipe.py:
        # 152-155, 224).  Here rotary tables are derived from the request
        # shapes, so rotary (5b-family) models accept longer clips — the
        # BASELINE "longer 8s clip" config; pair with
        # attention_backend="windowed" for O(F) attention cost.  Sincos
        # (2b-family) models keep the static-table cap.
        max_frames = cfg.sample_frames
        if num_frames > max_frames and not cfg.use_rotary_positional_embeddings:
            raise ValueError(
                f"num_frames must be <= {max_frames} (static positional embeddings)"
            )
        sc_total = self.vae_cfg.spatial_compression_ratio * cfg.patch_size
        if height % sc_total or width % sc_total:
            raise ValueError(f"height/width must be divisible by {sc_total}")
        if prompt is None and prompt_embeds is None:
            raise ValueError("provide prompt or prompt_embeds")
        if prompt is not None and prompt_embeds is not None:
            raise ValueError("provide only one of prompt / prompt_embeds")
        # remaining reference check_inputs surface (pipeline_cogvideox.py:
        # 372-421): type combinations that would otherwise be silently
        # ignored or crash later
        if prompt is not None and not isinstance(prompt, (str, list)):
            raise ValueError(f"prompt must be str or list, got {type(prompt)}")
        if isinstance(prompt, list) and not all(isinstance(p, str) for p in prompt):
            raise ValueError("prompt list must contain only strings")
        if prompt_embeds is not None and negative_prompt is not None:
            raise ValueError(
                "negative_prompt is ignored when prompt_embeds is provided "
                "(pass [uncond | cond] rows in prompt_embeds instead)"
            )
        if ref_image is not None and ref_latents is not None:
            raise ValueError("provide only one of ref_image / ref_latents")
        if num_inference_steps < 1:
            raise ValueError("num_inference_steps must be >= 1")
        if num_frames < 1:
            raise ValueError("num_frames must be >= 1")
        if callback_on_segment_end is not None and segment_steps <= 0:
            raise ValueError(
                "callback_on_segment_end needs segment_steps > 0 (the fused "
                "loop has no host hooks; use progress=True for a step bar)"
            )

        key = jax.random.PRNGKey(seed)
        k_lat, k_ref, k_dpm = jax.random.split(key, 3)

        from s2v_tpu.utils.logging import phase

        do_cfg = guidance_scale > 1.0
        if prompt_embeds is None:
            with phase("encode-prompt"):
                prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg=do_cfg)
        prompt_embeds = prompt_embeds.astype(cfg.dtype)
        if num_videos_per_prompt > 1:
            # reference _get_t5_prompt_embeds repeat semantics
            # (pipeline_cogvideox.py:231-235): each prompt row repeated
            prompt_embeds = jnp.repeat(prompt_embeds, num_videos_per_prompt, axis=0)
        batch = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        if ref_latents is None:
            if ref_image is None:
                raise ValueError("need ref_image or ref_latents")
            with phase("encode-ref-image"):
                ref_latents = self.encode_ref_image(ref_image, k_ref)
        ref_latents = ref_latents.astype(cfg.dtype)
        if ref_latents.shape[0] == 1 and batch > 1:
            # one subject image shared across a batch of prompts
            ref_latents = jnp.broadcast_to(ref_latents, (batch, *ref_latents.shape[1:]))

        sc = self.vae_cfg.spatial_compression_ratio
        f_lat = (num_frames - 1) // self.vae_cfg.temporal_compression_ratio + 1
        h_lat, w_lat = height // sc, width // sc
        if latents is None:
            latents = jax.random.normal(
                k_lat, (batch, f_lat, h_lat, w_lat, cfg.in_channels), jnp.float32
            )
        latents = latents.astype(cfg.dtype)

        tokens_per_frame = (h_lat // cfg.patch_size) * (w_lat // cfg.patch_size)
        seq_len = cfg.max_text_seq_length + (1 + f_lat) * tokens_per_frame
        if self.mesh is None or self.mesh.size == 1:
            # multi-chip memory depends on the sharding; the single-chip
            # logits-materialization estimate doesn't apply
            attention_hbm_guard(
                backend,
                batch * (2 if do_cfg and cfg_mode != "sequential" else 1),
                cfg.num_attention_heads,
                seq_len,
            )

        rope_cos, rope_sin = self.prepare_rope(height, width, f_lat)
        pos_embedding = None
        if not cfg.use_rotary_positional_embeddings:
            # 2b/sincos models: static joint [text | video] table
            # (reference embeddings.py:381-402); ref tokens get none.
            from s2v_tpu.ops.sincos import joint_text_video_pos_embedding

            pos_embedding = jnp.asarray(
                joint_text_video_pos_embedding(
                    cfg.inner_dim, h_lat, w_lat, num_frames, cfg.patch_size,
                    self.vae_cfg.temporal_compression_ratio,
                    cfg.max_text_seq_length,
                    cfg.spatial_interpolation_scale,
                    cfg.temporal_interpolation_scale,
                )
            )
        schedule = DenoiseSchedule.create(
            self.scheduler_cfg, num_inference_steps, guidance_scale, use_dynamic_cfg, use_dpm
        )

        if cfg_mode == "auto":
            # batched CFG (one 2B forward) measured faster than sequential
            # (two B forwards) even on one v5e chip — 8.09 vs 8.21 s/step at
            # the 5b geometry — and fits HBM with the T5 host-resident.
            # Measured at B=1 only: multi-prompt batches on a single chip
            # keep sequential CFG (batched would run a 2*batch forward with
            # unverified activation headroom); cfg_mode="sequential"/"batched"
            # override explicitly (identical math either way).
            single_dev = len(jax.devices()) == 1
            cfg_mode = "sequential" if (single_dev and batch > 1) else "batched"
        # cache the compiled loop per configuration so repeated generate()
        # calls (serving) reuse the executable instead of re-jitting
        # the DPM noise key is a traced argument (not a closure) so new
        # seeds reuse the same executable — critical for serving
        # transformer_cfg (frozen dataclass, includes attention_window_frames
        # and dtypes) and the backend are part of the key: reconfiguring a
        # live pipeline must not reuse executables compiled for the old
        # configuration
        cache_key = (
            num_inference_steps, float(guidance_scale), use_dynamic_cfg, use_dpm,
            do_cfg, cfg_mode, height, width, num_frames, batch,
            float(adaptive_threshold), float(cfg_skip_threshold),
            backend, cfg, self.mesh, bool(progress),
        )
        if do_cfg and cfg_skip_threshold > 0.0:
            # host-computable: the guidance table is fixed per schedule
            n_skip = int(np.sum(schedule.guidance - 1.0 < cfg_skip_threshold))
            from s2v_tpu.utils.logging import get_logger

            get_logger("s2v_tpu.pipeline").info(
                "cfg-skip: uncond forward skipped on %d/%d steps", n_skip,
                num_inference_steps,
            )
        if segment_steps > 0:
            # Host-stepped segments: one executable serves every segment
            # (bounds are traced scalars).  Needed (a) for interrupt /
            # per-segment callbacks (reference callback_on_step_end) and
            # (b) on relays that cap single-execution wall time — the
            # fused 50-step program is one ~7-min device launch.
            from s2v_tpu.pipelines.denoise import (
                adaptive_init_carry,
                make_segmented_denoise,
            )

            adaptive = adaptive_threshold > 0.0
            seg_key = ("seg",) + cache_key
            run_seg = self._compiled_denoise.get(seg_key)
            if run_seg is None:
                run_seg = make_segmented_denoise(
                    None, cfg, schedule, rope_cos, rope_sin, do_cfg, None,
                    backend, pos_embedding, cfg_mode, None,
                    cfg_skip_threshold, adaptive_threshold, progress=progress,
                )
                self._compiled_denoise[seg_key] = run_seg
            with phase("denoise", log=True), self._mesh_ctx():
                carry = (
                    adaptive_init_carry(latents)
                    if adaptive
                    else (latents, jnp.zeros_like(latents))
                )
                for i0 in range(0, num_inference_steps, segment_steps):
                    i1 = min(i0 + segment_steps, num_inference_steps)
                    carry = run_seg(
                        self.transformer_params, carry, ref_latents, prompt_embeds,
                        k_dpm, i0, i1,
                    )
                    jax.block_until_ready(carry)
                    if callback_on_segment_end is not None:
                        cb = callback_on_segment_end(i1, carry[0])
                        flag = None
                        if isinstance(cb, (bool, np.bool_)):
                            flag = bool(cb)
                        elif (getattr(cb, "shape", None) == ()
                              and jnp.issubdtype(getattr(cb, "dtype", np.float32), np.bool_)):
                            flag = bool(cb)  # 0-d bool array (e.g. jnp.all)
                        if flag is not None:
                            if not flag:
                                break  # cooperative interrupt (reference :242-243)
                        elif getattr(cb, "shape", None) == carry[0].shape:
                            # reference callback_on_step_end latents override
                            # (custom_cogvideox_pipe.py:299-303): a returned
                            # same-shape array replaces the trajectory's
                            # latents; any other return is ignored
                            carry = (jnp.asarray(cb, carry[0].dtype),) + tuple(carry[1:])
                final = carry[0]
                if adaptive:
                    from s2v_tpu.utils.logging import get_logger

                    get_logger("s2v_tpu.pipeline").info(
                        "adaptive denoise skipped %d/%d forwards",
                        int(carry[5]), num_inference_steps,
                    )
            if output_type == "latent":
                return final
            with phase("vae-decode", log=True):
                return self.postprocess_video(self.decode_latents(final), output_type)

        run = self._compiled_denoise.get(cache_key)
        if run is None:
            if adaptive_threshold > 0.0:
                from s2v_tpu.pipelines.denoise import denoise_adaptive

                run = jax.jit(
                    lambda p, lat, ref, emb, rng: denoise_adaptive(
                        p, cfg, schedule, lat, ref, emb, rope_cos, rope_sin,
                        threshold=adaptive_threshold,
                        do_cfg=do_cfg, rng_key=rng, attention_backend=backend,
                        pos_embedding=pos_embedding, cfg_mode=cfg_mode,
                        cfg_skip_threshold=cfg_skip_threshold, progress=progress,
                    )
                )
            else:
                run = jax.jit(
                    lambda p, lat, ref, emb, rng: denoise(
                        p, cfg, schedule, lat, ref, emb, rope_cos, rope_sin,
                        do_cfg=do_cfg, rng_key=rng, attention_backend=backend,
                        pos_embedding=pos_embedding, cfg_mode=cfg_mode,
                        cfg_skip_threshold=cfg_skip_threshold, progress=progress,
                    )
                )
            self._compiled_denoise[cache_key] = run
        with phase("denoise", log=True), self._mesh_ctx():
            final = run(self.transformer_params, latents, ref_latents, prompt_embeds, k_dpm)
            if adaptive_threshold > 0.0:
                final, skips = final
                from s2v_tpu.utils.logging import get_logger

                get_logger("s2v_tpu.pipeline").info(
                    "adaptive denoise skipped %d/%d forwards", int(skips), num_inference_steps
                )
            final.block_until_ready()

        if output_type == "latent":
            return final
        with phase("vae-decode", log=True):
            return self.postprocess_video(self.decode_latents(final), output_type)
