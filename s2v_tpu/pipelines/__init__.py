from s2v_tpu.pipelines.denoise import DenoiseSchedule, denoise, guidance_schedule  # noqa: F401
from s2v_tpu.pipelines.s2v import S2VPipeline  # noqa: F401
from s2v_tpu.pipelines.variants import generate_i2v, generate_v2v  # noqa: F401
