"""Multi-chip inference recipe (v5e pod slice).

Round 2: multi-chip is a *product* capability — the pipeline itself takes
a mesh.  Runs end-to-end on a virtual CPU mesh too:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_inference.py

On a real snapshot, the identical flow is just:

    pipe = S2VPipeline.from_pretrained(snapshot, mesh="dp2,tp4")
    video = pipe.generate(prompt=..., ref_image=...)

Three mesh layouts are demonstrated: dp x tp (batch + megatron sharding),
seq (sequence-parallel attention — all-gather-KV + the flash kernel on
TPU — plus context-parallel VAE decode), and the low-level composition
API for custom programs.
"""

import jax
import jax.numpy as jnp

from s2v_tpu.config import VAEConfig
from s2v_tpu.testing import (
    tiny_generate_kwargs as gen_kwargs,
    tiny_pipeline as build_pipeline,
)


def main():
    n = len(jax.devices())
    print(f"{n} devices: {jax.devices()[0].device_kind}")
    tc = VAEConfig.tiny().temporal_compression_ratio

    # --- 1. dp x tp: batch + megatron-sharded transformer -------------------
    pipe = build_pipeline()
    pipe.set_mesh({"data": 2, "model": n // 2})
    video = pipe.generate(**gen_kwargs(pipe, tc + 1))
    print(f"dp2 x tp{n // 2} generate:", video.shape)

    # --- 2. seq: sequence-parallel attention + CP VAE decode ----------------
    pipe = build_pipeline()
    pipe.set_mesh({"seq": n})
    # (n-1)*tc+1 frames -> n latent frames, divisible by the ring, so the
    # decode runs context-parallel (ppermute conv-cache halos)
    video = pipe.generate(**gen_kwargs(pipe, (n - 1) * tc + 1))
    print(f"seq{n} generate (SP attention + CP-VAE decode):", video.shape)

    # --- 3. low-level composition (custom programs) -------------------------
    from s2v_tpu.parallel import default_logical_map, make_mesh, mesh_context
    from s2v_tpu.parallel.sp_attention import allgather_kv_attention

    mesh = make_mesh({"seq": n})
    q = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 2, 16), jnp.float32)
    with mesh_context(mesh, default_logical_map(mesh)):
        out = allgather_kv_attention(q, q, q, mesh)
    print("all-gather-KV attention:", out.shape)


if __name__ == "__main__":
    main()
