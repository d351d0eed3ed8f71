from s2v_tpu.models.transformer import (  # noqa: F401
    init_transformer_params,
    transformer_forward,
)
