from vec_vad_tpu.flow.driver import compute_optical_flow, resize_bilinear  # noqa: F401
from vec_vad_tpu.flow.losses import (  # noqa: F401
    epe,
    l1_loss,
    l2_loss,
    multiscale_loss,
    single_scale_loss,
)
from vec_vad_tpu.flow.harness import FitResult, FlowHarness  # noqa: F401
from vec_vad_tpu.flow.trainer import FlowTrainer, PairMajorAdapter  # noqa: F401
