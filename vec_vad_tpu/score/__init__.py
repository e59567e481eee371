from vec_vad_tpu.score.scoring import (  # noqa: F401
    BIG_NUMBER,
    fuse_scores,
    frame_scores_from_cubes,
    splat_score_masks,
)
