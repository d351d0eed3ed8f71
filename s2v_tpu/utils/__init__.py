from s2v_tpu.utils.video import (  # noqa: F401
    denormalize_video,
    export_to_video,
    export_to_video_with_frames,
    load_image,
    psnr,
    to_uint8_frames,
)
