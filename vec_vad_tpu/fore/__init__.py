from vec_vad_tpu.fore.suppress import del_cover_bboxes  # noqa: F401
from vec_vad_tpu.fore.patches import get_patch_boxes, full_frame_box  # noqa: F401
from vec_vad_tpu.fore.motion import motion_maps, motion_bboxes  # noqa: F401
from vec_vad_tpu.fore.detector import (  # noqa: F401
    AppearanceDetector,
    PrecomputedDetector,
    filter_detections,
    compute_foreground_bboxes,
)
from vec_vad_tpu.fore.cascade_detector import (  # noqa: F401
    CascadeDetector,
    CascadeFPNNet,
    train_cascade_detector,
)
from vec_vad_tpu.fore.mmdet_import import (  # noqa: F401
    BackboneFPN,
    convert_backbone_fpn,
    load_backbone_fpn,
)
