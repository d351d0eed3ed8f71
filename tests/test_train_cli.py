"""Trainer CLI end-to-end (tiny config, in-process main()).

The reference ships no trainer; these tests drive `python -m s2v_tpu.train`
semantics through train.main() on a tiny snapshot + 2-clip dataset:
LoRA mode with the full optimizer surface (accumulation, cosine warmup,
clipping) + validation sampling, full fine-tune mode with snapshot
export/reload, and resume.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def snapshot_dir(tmp_path_factory):
    from make_tiny_snapshot import make_snapshot

    d = tmp_path_factory.mktemp("snap")
    make_snapshot(str(d))
    return str(d)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    from s2v_tpu.utils.video import export_to_video

    d = tmp_path_factory.mktemp("clips")
    rng = np.random.default_rng(0)
    for i in range(2):
        frames = (rng.random((9, 32, 32, 3)) * 255).astype(np.uint8)
        export_to_video(frames, os.path.join(str(d), f"clip{i}.mp4"), fps=8)
    (d / "prompts.txt").write_text("a pig\na dog\n")
    return str(d)


def _args(snapshot_dir, dataset_dir, out_dir, *extra):
    from s2v_tpu.train import get_args

    return get_args([
        "--pretrained_model_name_or_path", snapshot_dir,
        "--dataset_dir", dataset_dir,
        "--output_dir", out_dir,
        "--height", "32", "--width", "32", "--max_num_frames", "9",
        "--attention_backend", "xla",
        *extra,
    ])


def test_train_cli_lora_optimizer_surface(snapshot_dir, dataset_dir, tmp_path):
    from s2v_tpu.pipelines.s2v import S2VPipeline
    from s2v_tpu.train import main

    out = str(tmp_path / "lora_out")
    main(_args(
        snapshot_dir, dataset_dir, out,
        "--rank", "2", "--lora_alpha", "4",
        "--max_train_steps", "2", "--checkpointing_steps", "2",
        "--gradient_accumulation_steps", "2",
        "--lr_scheduler", "cosine", "--lr_warmup_steps", "1",
        "--validation_prompt", "a pig", "--validation_steps", "2",
        "--validation_num_inference_steps", "1",
    ))
    ckpt = os.path.join(out, "pytorch_lora_weights_transformer.safetensors")
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(out, "train_state_2"))
    sample = os.path.join(out, "samples", "step2_p0_v0.mp4")
    assert os.path.exists(sample) and os.path.getsize(sample) > 0
    # the exported adapter reloads through the inference merge path
    pipe = S2VPipeline.from_pretrained(snapshot_dir, lora_checkpoint=out)
    assert pipe.transformer_params is not None


def test_train_cli_full_mode_and_resume(snapshot_dir, dataset_dir, tmp_path):
    from s2v_tpu.pipelines.s2v import S2VPipeline
    from s2v_tpu.train import main

    out = str(tmp_path / "ft_out")
    main(_args(
        snapshot_dir, dataset_dir, out,
        "--train_mode", "full", "--compute_dtype", "none",
        "--learning_rate", "1e-5",
        "--max_train_steps", "2", "--checkpointing_steps", "1",
    ))
    snap = os.path.join(out, "snapshot")
    assert os.path.exists(os.path.join(out, "train_state_1"))
    assert os.path.exists(os.path.join(out, "train_state_2"))
    pipe = S2VPipeline.from_pretrained(snap)
    assert pipe.transformer_params is not None

    # resume from step 1 and run to 3
    out2 = str(tmp_path / "ft_resume")
    main(_args(
        snapshot_dir, dataset_dir, out2,
        "--train_mode", "full", "--compute_dtype", "none",
        "--learning_rate", "1e-5",
        "--max_train_steps", "3", "--checkpointing_steps", "10",
        "--resume_from_checkpoint", os.path.join(out, "train_state_1"),
    ))
    assert os.path.exists(os.path.join(out2, "train_state_3"))


def test_train_cli_frame_alignment_guard(snapshot_dir, dataset_dir, tmp_path):
    from s2v_tpu.train import main

    with pytest.raises(SystemExit, match="max_num_frames"):
        main(_args(
            snapshot_dir, dataset_dir, str(tmp_path / "x"),
            "--max_num_frames", "8", "--max_train_steps", "1",
        ))
