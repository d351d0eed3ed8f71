"""Shared CLI coercers + the persistent-compilation-cache helper."""

import os

import pytest


def test_str2bool_and_tiling_policy():
    from s2v_tpu.cli_utils import str2bool, tiling_policy

    assert str2bool("true") is True and str2bool("0") is False
    assert tiling_policy("auto") == "auto"
    assert tiling_policy("false") is False
    with pytest.raises(ValueError):
        str2bool("maybe")


def test_enable_compilation_cache(tmp_path):
    """The persistent-cache helper: 'off' is a no-op, a path sets the jax
    config and compiled programs land on disk for the next process."""
    import jax
    import jax.numpy as jnp

    from s2v_tpu.cli_utils import enable_compilation_cache

    assert enable_compilation_cache("off") is None
    assert enable_compilation_cache(None) is None

    d = str(tmp_path / "xla_cache")
    old = jax.config.jax_compilation_cache_dir
    try:
        got = enable_compilation_cache(d, min_compile_seconds=0.0)
        assert got == d and os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T).sum()

        f(jnp.ones((64, 64))).block_until_ready()
        assert os.listdir(d), "compiled executable not persisted"
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_enable_compilation_cache_env_off(tmp_path, monkeypatch):
    """S2V_TPU_CACHE_DIR=off disables rather than creating a dir named 'off';
    an uncreatable dir degrades to disabled instead of crashing."""
    from s2v_tpu.cli_utils import enable_compilation_cache

    monkeypatch.setenv("S2V_TPU_CACHE_DIR", "off")
    assert enable_compilation_cache("auto") is None

    blocker = tmp_path / "file"
    blocker.write_text("x")
    # a path under a regular file cannot be created -> disabled, no raise
    assert enable_compilation_cache(str(blocker / "sub")) is None
