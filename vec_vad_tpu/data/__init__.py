from vec_vad_tpu.data.video_index import VideoIndex, context_indices  # noqa: F401
from vec_vad_tpu.data.readers import (  # noqa: F401
    read_frame,
    load_frames,
    load_frame_labels,
)
from vec_vad_tpu.data.synthetic import make_synthetic_dataset  # noqa: F401
