"""Model-source resolution: layout validation + env-gated hub download."""

import json
import os

import pytest

from s2v_tpu.loaders.resolve import resolve_model_dir, validate_snapshot_layout


def _fake_snapshot(tmp_path, with_weights=True):
    for sub in ("transformer", "vae"):
        d = tmp_path / sub
        d.mkdir(parents=True, exist_ok=True)
        (d / "config.json").write_text(json.dumps({}))
        if with_weights:
            (d / "diffusion_pytorch_model.safetensors").write_bytes(b"x")
    return str(tmp_path)


def test_valid_local_dir_passes(tmp_path):
    d = _fake_snapshot(tmp_path)
    assert resolve_model_dir(d) == d


def test_missing_subdir_reports_precisely(tmp_path):
    d = _fake_snapshot(tmp_path)
    import shutil

    shutil.rmtree(tmp_path / "vae")
    with pytest.raises(FileNotFoundError, match="missing subdir vae/"):
        validate_snapshot_layout(d)


def test_missing_weights_reported(tmp_path):
    d = _fake_snapshot(tmp_path, with_weights=False)
    with pytest.raises(FileNotFoundError, match="no .safetensors weights under transformer/"):
        validate_snapshot_layout(d)


def test_repo_id_offline_gives_actionable_error(monkeypatch):
    monkeypatch.setenv("S2V_TPU_OFFLINE", "1")
    with pytest.raises(FileNotFoundError, match="huggingface-cli download THUDM/CogVideoX-5b"):
        resolve_model_dir("THUDM/CogVideoX-5b")


def test_nonexistent_path_not_repo_id():
    with pytest.raises(FileNotFoundError, match="not a hub repo id"):
        resolve_model_dir("/no/such/dir")


def test_repo_id_downloads_when_online(monkeypatch, tmp_path):
    """The hub path goes through snapshot_download (injected here — this
    environment is zero-egress) and layout-validates the result."""
    import huggingface_hub

    d = _fake_snapshot(tmp_path)
    calls = {}

    def fake_download(repo, cache_dir=None, allow_patterns=None):
        calls["repo"] = repo
        return d

    monkeypatch.delenv("S2V_TPU_OFFLINE", raising=False)
    monkeypatch.delenv("HF_HUB_OFFLINE", raising=False)
    monkeypatch.setattr(huggingface_hub, "snapshot_download", fake_download)
    assert resolve_model_dir("THUDM/CogVideoX-5b") == d
    assert calls["repo"] == "THUDM/CogVideoX-5b"
