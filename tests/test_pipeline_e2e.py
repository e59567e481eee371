"""End-to-end pipeline test on the synthetic dataset: train on normal-only
video, score the test split, expect anomalous frames to rank high (the
reference's golden-number test strategy scaled to a synthetic micro-world).
"""

import numpy as np
import pytest

from vec_vad_tpu.config import (
    CompletionConfig,
    DatasetSpec,
    ForegroundConfig,
    PipelineConfig,
    register_dataset,
)
from vec_vad_tpu.data.synthetic import make_synthetic_dataset
from vec_vad_tpu.data.video_index import VideoIndex
from vec_vad_tpu.eval.metrics import roc_auc_score
from vec_vad_tpu.pipeline import (
    extract_cube_set,
    frame_level_scores,
    make_trainer,
    pixel_score_masks,
    score_cubes,
    train_model,
)


@pytest.fixture(scope="module")
def synth():
    ds = make_synthetic_dataset(
        frames_per_video=36, n_train_videos=3, n_test_videos=2,
        frame_h=48, frame_w=64, seed=3,
    )
    spec = DatasetSpec(
        name="synthE2E", frame_h=48, frame_w=64, file_ext=".tif", scene_num=1,
        ap_score_thr=0.5, ap_min_area=16.0, cover_thr=0.6,
        mt_area_thr=16.0, mt_binary_thr=18.0, mt_extend=2, mt_gauss_mask_size=3,
    )
    register_dataset(spec)
    cfg = PipelineConfig(
        dataset_name="synthE2E",
        fore=ForegroundConfig(patch_size=16, max_boxes_per_frame=8),
        model=CompletionConfig(
            nf=8, epochs=8, batch_size=32, context_of_num=0,
            use_flow=False, raw_range=10,
        ),
    )
    return ds, spec, cfg


@pytest.fixture(scope="module")
def trained(synth):
    ds, spec, cfg = synth
    train_idx = VideoIndex(
        [f"v{i}" for i in range(len(ds.train_video_lengths))],
        ds.train_video_lengths,
    )
    cubes = extract_cube_set(
        cfg, spec, train_idx, ds.train_frames, ds.train_boxes
    )
    assert cubes.size > 40
    trainer = make_trainer(cfg)
    model = train_model(cfg, cubes, trainer=trainer, seed=0)
    return model, trainer


def test_training_produces_block_artifacts(trained):
    model, _ = trained
    assert (0, 0, 0) in model.blocks
    blk = model.blocks[(0, 0, 0)]
    mu, sd = blk.raw_stats
    assert np.isfinite(mu) and sd > 0
    assert blk.raw_scores.ndim == 1


def test_e2e_anomaly_detection(synth, trained):
    ds, spec, cfg = synth
    model, trainer = trained
    test_idx = VideoIndex(["a", "b"], ds.test_video_lengths)
    test_cubes = extract_cube_set(
        cfg, spec, test_idx, ds.test_frames, ds.test_boxes,
        block_mode=cfg.fore.test_block_mode,
    )
    cube_scores = score_cubes(model, test_cubes, trainer=trainer)
    frame_scores = frame_level_scores(
        cube_scores, test_cubes, test_idx.total_frames
    )
    auroc = roc_auc_score(frame_scores, ds.test_labels)
    # the bright/fast anomalous square must be separable from normal motion
    assert auroc > 0.85, f"AUROC {auroc}"

    # pixel masks: anomalous frames' max pixel == frame score
    masks = pixel_score_masks(
        cube_scores, test_cubes, test_idx.total_frames, (48, 64)
    )
    np.testing.assert_allclose(
        masks.reshape(masks.shape[0], -1).max(axis=1), frame_scores, rtol=1e-6
    )


def test_training_loss_decreases(synth):
    ds, spec, cfg = synth
    train_idx = VideoIndex(["a", "b"], ds.train_video_lengths)
    cubes = extract_cube_set(cfg, spec, train_idx, ds.train_frames, ds.train_boxes)
    trainer = make_trainer(cfg)
    raw = cubes.raw.astype(np.float32) / 255.0

    state = trainer.init_state(0)
    import jax.numpy as jnp
    first = None
    for i in range(8):
        state, m = trainer._step_padded(state, raw[:32], None)
        if i == 0:
            first = float(m["loss_raw"])
    last = float(m["loss_raw"])
    assert last < first * 0.8, (first, last)
