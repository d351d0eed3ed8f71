from s2v_tpu.ops.rope import (  # noqa: F401
    get_1d_rotary_freqs,
    get_3d_rotary_pos_embed,
    get_resize_crop_region_for_grid,
    apply_rotary_emb,
    build_segmented_rope,
    prepare_video_and_ref_rope,
)
from s2v_tpu.ops.timestep import get_timestep_embedding, timestep_embedding_mlp  # noqa: F401
from s2v_tpu.ops.norms import layer_norm, group_norm, rms_norm  # noqa: F401
from s2v_tpu.ops.adaln import ada_layer_norm_zero_3stream, ada_layer_norm_out  # noqa: F401
from s2v_tpu.ops.patchify import patchify_video, unpatchify_video  # noqa: F401
from s2v_tpu.ops.attention import joint_attention  # noqa: F401
from s2v_tpu.ops.quant import dense, int8_dense, quantize_weight_int8, quantize_transformer_params  # noqa: F401
from s2v_tpu.ops.sincos import get_3d_sincos_pos_embed, joint_text_video_pos_embedding  # noqa: F401
from s2v_tpu.ops.causal_conv3d import causal_conv3d, temporal_halo  # noqa: F401
