from s2v_tpu.loaders.safetensors_io import (  # noqa: F401
    best_guess_lora_file,
    load_safetensors,
    load_sharded_safetensors,
    save_safetensors,
)
from s2v_tpu.loaders.lora import (  # noqa: F401
    load_and_merge_lora,
    merge_lora_into_state_dict,
    normalize_lora_keys,
)
from s2v_tpu.loaders.hf import (  # noqa: F401
    convert_t5_state_dict,
    convert_transformer_state_dict,
    convert_vae_state_dict,
)
