"""vec_vad_tpu — a TPU-native video anomaly detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
yuguangnudt/VEC_VAD ("Cloze Test Helps: Effective Video Anomaly Detection via
Learning to Complete Video Events", ACM MM 2020).

Pipeline (reference: /root/reference/train.py, test.py):
  1. Foreground localization  -> vec_vad_tpu.fore
  2. Optical flow (FlowNet2)  -> vec_vad_tpu.models.flownet
  3. STC extraction           -> vec_vad_tpu.ops.stc
  4. Cloze completion UNets   -> vec_vad_tpu.models.completion
  5. Scoring & evaluation     -> vec_vad_tpu.score, vec_vad_tpu.eval

Unlike the reference (host-bound OpenCV loops + per-position UNet module
copies + torch DataParallel), every stage here is expressed as batched,
statically-shaped JAX computations: ragged per-frame bbox sets are padded to
fixed capacity with validity masks, the erased-position ensemble is a single
vmapped UNet with stacked parameters, and training/inference steps run under
jit with batch-axis sharding over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from vec_vad_tpu.config import (  # noqa: F401
    DatasetSpec,
    DATASETS,
    ForegroundConfig,
    CompletionConfig,
    PipelineConfig,
    load_ini_config,
)
