"""from_pretrained tokenizer resolution: tokenizer.json preferred, native
sentencepiece fallback for spiece.model-only checkpoints."""

import os
import shutil

import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")


def test_spiece_fallback(tmp_path):
    from tests.test_sp_native import build_tiny_spiece
    from s2v_tpu.pipelines.s2v import S2VPipeline

    # minimal snapshot with ONLY transformer+vae (skip t5 here) is not enough
    # to exercise tokenizer resolution, so test the resolution logic directly
    tok_dir = tmp_path / "tokenizer"
    tok_dir.mkdir()
    build_tiny_spiece(str(tok_dir / "spiece.model"))

    from s2v_tpu.utils.tokenizer import T5CLSTokenizer
    from s2v_tpu.utils.sp_native import NativeSPTokenizer

    with pytest.raises(Exception):
        T5CLSTokenizer.from_checkpoint_dir(str(tmp_path))
    tok = NativeSPTokenizer(str(tok_dir / "spiece.model"))
    ids = tok.encode("<cls> a pig", max_length=8)
    assert ids.shape == (1, 8)
    assert ids[0, 0] == tok.cls_id
