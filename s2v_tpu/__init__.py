"""s2v_tpu — TPU-native disentangled subject-to-video generation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
carpedkm/disentangled-subject-to-vid (CogVideoX-5b + subject-reference LoRA
inference stack):

- 3-stream CogVideoX DiT transformer (text | reference-image | video tokens)
  with AdaLN-Zero modulation and 3D RoPE         -> ``s2v_tpu.models.transformer``
- 3D causal VAE (encode/decode, conv-cache streaming, spatial tiling)
                                                 -> ``s2v_tpu.models.vae``
- T5 v1.1 text encoder                           -> ``s2v_tpu.models.t5``
- CogVideoX DDIM / DPM schedulers                -> ``s2v_tpu.schedulers``
- CFG-batched denoising pipeline (full loop under one jit)
                                                 -> ``s2v_tpu.pipelines``
- safetensors weight loading + LoRA merge        -> ``s2v_tpu.loaders``
- ICI sequence-parallel sharding                 -> ``s2v_tpu.parallel``
- Pallas fused attention kernels                 -> ``s2v_tpu.ops.pallas``

Design stance (not a port): pure-functional models over param pytrees,
static shapes, ``lax.scan`` over transformer layers and VAE frame chunks,
bf16 weights with fp32 norm/RoPE/softmax math, and ``jax.sharding.Mesh``
based multi-chip scaling.
"""

__version__ = "0.1.0"

from s2v_tpu.config import (  # noqa: F401
    TransformerConfig,
    VAEConfig,
    SchedulerConfig,
    T5Config,
    PipelineConfig,
)


def __getattr__(name):
    # lazy top-level export (mirrors `from diffusers import DiffusionPipeline`
    # ergonomics without importing the model stack at package import)
    if name == "S2VPipeline":
        from s2v_tpu.pipelines.s2v import S2VPipeline

        return S2VPipeline
    raise AttributeError(f"module 's2v_tpu' has no attribute {name!r}")
