from vec_vad_tpu.ops.stc import (  # noqa: F401
    crop_resize_cube,
    extract_stc,
    cube_to_input,
    flow_magnitude,
)
