"""compute_dtype='bfloat16' training: bf16 forward/backward with f32 master
params, loss, and Adam state (the mixed-precision knob the reference has no
analog for — it trains pure f32, train.py:383-402)."""

import numpy as np

from vec_vad_tpu.config import (
    CompletionConfig,
    ForegroundConfig,
    PipelineConfig,
)
from vec_vad_tpu.pipeline import make_trainer


def test_bf16_training_tracks_f32(rng):
    raw = (rng.random((48, 16, 16, 15)) * 255).astype(np.uint8)
    blocks = {}
    for dt in ("float32", "bfloat16"):
        cfg = PipelineConfig(
            dataset_name="UCSDped2",
            fore=ForegroundConfig(patch_size=16),
            model=CompletionConfig(
                nf=4, epochs=2, batch_size=16, context_of_num=0,
                use_flow=False, compute_dtype=dt,
            ),
        )
        trainer = make_trainer(cfg)
        blocks[dt] = trainer.fit_block(raw, None, seed=0)
        # master params stay f32 regardless of compute dtype
        import jax

        for leaf in jax.tree.leaves(blocks[dt].params):
            assert leaf.dtype == np.float32

    a = blocks["float32"].raw_scores
    b = blocks["bfloat16"].raw_scores
    assert np.isfinite(b).all()
    # same ranking and same ballpark (bf16 mantissa ~3 decimal digits)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, corr
    assert abs(b.mean() / a.mean() - 1.0) < 0.15
