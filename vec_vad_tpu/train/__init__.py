from vec_vad_tpu.train.trainer import (  # noqa: F401
    BlockModelState,
    BlockTrainer,
    TrainedBlock,
)
