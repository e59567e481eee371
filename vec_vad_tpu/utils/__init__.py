from vec_vad_tpu.utils.blocks import calc_block_idx  # noqa: F401
from vec_vad_tpu.utils.meters import AverageMeter  # noqa: F401
