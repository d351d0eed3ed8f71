from s2v_tpu.training.lora import (  # noqa: F401
    LoRASpec,
    init_lora_params,
    merge_lora_params,
    lora_loss_fn,
    make_lora_train_step,
)
from s2v_tpu.training.data import VideoFolderDataset, latent_batches, read_video_frames  # noqa: F401
from s2v_tpu.training.full import (  # noqa: F401
    fsdp_param_specs,
    make_full_train_step,
    vpred_loss,
)
from s2v_tpu.training.optim import OptimizerSpec, make_lr_schedule, make_optimizer  # noqa: F401
