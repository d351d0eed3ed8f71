"""Backend resolution ("auto"), the HBM guard, and backend misuse errors."""

import jax
import jax.numpy as jnp
import pytest

from s2v_tpu.ops.attention import (
    ATTENTION_BACKENDS,
    WINDOWED_BACKENDS,
    attention_hbm_guard,
    resolve_attention_backend,
)


def test_auto_resolves_to_platform_backend():
    # the test suite runs on CPU: auto must pick the parity backend there
    assert jax.default_backend() == "cpu"
    assert resolve_attention_backend("auto") == "xla"
    # non-auto names pass through untouched
    for name in ATTENTION_BACKENDS:
        if name != "auto":
            assert resolve_attention_backend(name) == name


def test_backend_choices_cover_windowed_family():
    for name in WINDOWED_BACKENDS:
        assert name in ATTENTION_BACKENDS
    assert "auto" in ATTENTION_BACKENDS


def test_hbm_guard_refuses_flagship_xla_on_tpu():
    # flagship geometry: CFG batch 2, 48 heads, 19,126 tokens -> ~70 GiB of
    # bf16 logits; must refuse on a 16 GiB device
    with pytest.raises(ValueError, match="attention_backend='xla'"):
        attention_hbm_guard(
            "xla", 2, 48, 19126, platform="tpu", limit_bytes=16 * 2**30
        )


def test_hbm_guard_allows_small_geometry_and_other_backends():
    attention_hbm_guard("xla", 2, 48, 1024, platform="tpu", limit_bytes=16 * 2**30)
    attention_hbm_guard("pallas", 2, 48, 19126, platform="tpu", limit_bytes=16 * 2**30)
    # CPU hosts are exempt (paging; xla stays the parity backend)
    attention_hbm_guard("xla", 2, 48, 19126, platform="cpu")


def test_pipeline_resolves_auto_at_set_attention():
    from s2v_tpu.config import TransformerConfig, VAEConfig
    from s2v_tpu.pipelines.s2v import S2VPipeline

    pipe = S2VPipeline(
        transformer_params={},
        transformer_cfg=TransformerConfig.tiny(),
        vae_params={},
        vae_cfg=VAEConfig.tiny(),
    )
    assert pipe.attention_backend == "auto"
    pipe.set_attention("auto")
    assert pipe.attention_backend == "xla"  # CPU test host


def test_banded_attention_requires_global_segment():
    from s2v_tpu.ops.pallas.banded_attention import banded_flash_attention

    q = jnp.zeros((1, 8, 1, 8))
    with pytest.raises(ValueError, match="global_len > 0"):
        banded_flash_attention(q, q, q, 0, 4, 1, interpret=True)
