from vec_vad_tpu.flow.driver import compute_optical_flow, resize_bilinear  # noqa: F401
from vec_vad_tpu.flow.losses import epe, l1_loss, l2_loss, multiscale_loss  # noqa: F401
from vec_vad_tpu.flow.harness import FitResult, FlowHarness  # noqa: F401
from vec_vad_tpu.flow.trainer import FlowTrainer  # noqa: F401
