from s2v_tpu.schedulers.ddim import (  # noqa: F401
    compute_alphas_cumprod,
    get_timesteps,
    ddim_step,
    add_noise,
    get_velocity,
)
from s2v_tpu.schedulers.dpm import dpm_step  # noqa: F401
