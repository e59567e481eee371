"""Two-stream (raw + flow) and multi-block pipeline coverage.

Uses synthetic frame-difference 'flow' maps as the flow modality so the
full raw2flow path runs: flow cube extraction, motion-magnitude filtering,
flow completion targets, two-stream z-norm fusion — without FlowNet2
weights (which don't exist in this environment).
"""

import numpy as np
import pytest

from vec_vad_tpu.config import (
    CompletionConfig,
    DatasetSpec,
    ForegroundConfig,
    PipelineConfig,
)
from vec_vad_tpu.data.synthetic import make_synthetic_dataset
from vec_vad_tpu.data.video_index import VideoIndex
from vec_vad_tpu.eval.metrics import roc_auc_score
from vec_vad_tpu.pipeline import (
    extract_cube_set,
    frame_level_scores,
    group_by_block,
    make_trainer,
    score_cubes,
    train_model,
)

SPEC = DatasetSpec(
    name="s2", frame_h=48, frame_w=64, file_ext=".tif", scene_num=1,
    ap_score_thr=0.5, ap_min_area=16.0, cover_thr=0.6,
    mt_area_thr=16.0, mt_binary_thr=18.0, mt_extend=2, mt_gauss_mask_size=3,
)


def _pseudo_flow(frames: np.ndarray) -> np.ndarray:
    """Frame-difference 'flow' (N, H, W, 2) float32."""
    d = np.diff(frames.astype(np.float32).mean(-1), axis=0, append=frames[-1:].mean(-1))
    return np.stack([d, -d], axis=-1) / 25.0


@pytest.mark.parametrize("h_block,w_block", [(1, 1), (2, 2)])
def test_two_stream_pipeline(h_block, w_block):
    ds = make_synthetic_dataset(
        frames_per_video=30, n_train_videos=3, n_test_videos=2,
        frame_h=48, frame_w=64, seed=9,
    )
    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(
            patch_size=16, max_boxes_per_frame=8,
            h_block=h_block, w_block=w_block, motion_thr=0.0,
        ),
        model=CompletionConfig(
            nf=4, epochs=3, batch_size=32, context_of_num=0, use_flow=True
        ),
    )
    tr_idx = VideoIndex([f"v{i}" for i in range(3)], ds.train_video_lengths)
    tr_flow = _pseudo_flow(ds.train_frames)
    cubes = extract_cube_set(
        cfg, SPEC, tr_idx, ds.train_frames, ds.train_boxes, flow_frames=tr_flow
    )
    assert cubes.flow is not None and cubes.flow.shape[-1] == 2
    groups = group_by_block(cubes)
    if h_block == 2:
        assert len(groups) > 1  # boxes actually route to multiple cells

    trainer = make_trainer(cfg)
    model = train_model(cfg, cubes, trainer=trainer)
    blk = next(iter(model.blocks.values()))
    assert blk.of_scores is not None and blk.of_stats[1] > 0

    te_idx = VideoIndex(["a", "b"], ds.test_video_lengths)
    te_flow = _pseudo_flow(ds.test_frames)
    tc = extract_cube_set(
        cfg, SPEC, te_idx, ds.test_frames, ds.test_boxes,
        flow_frames=te_flow, block_mode=cfg.fore.test_block_mode,
    )
    cs = score_cubes(model, tc, trainer=trainer)
    fs = frame_level_scores(cs, tc, te_idx.total_frames)
    assert np.isfinite(fs[fs > -99999]).all()
    if (h_block, w_block) == (1, 1):
        # two-stream on the easy synthetic world must clearly beat chance;
        # the 2x2 grid quarters each block's training data, so only the
        # mechanics (multi-block training/scoring) are asserted there
        auroc = roc_auc_score(fs, ds.test_labels)
        assert auroc > 0.6, f"AUROC {auroc}"
    else:
        assert len(model.blocks) > 1
        # every scored cube came from a real block decision (trained model
        # or the big_number untrained-block rule)
        assert np.isfinite(cs).all()


def test_grid_resident_path_matches_cubeset_path():
    """infer_frame_scores_grid (resident multi-block fast path) must match
    the step-by-step score_cubes + frame max on a 2x2 grid."""
    from vec_vad_tpu.infer import infer_frame_scores_grid

    ds = make_synthetic_dataset(
        frames_per_video=20, n_train_videos=1, n_test_videos=1,
        frame_h=48, frame_w=64, seed=6,
    )
    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(
            patch_size=16, max_boxes_per_frame=8, h_block=2, w_block=2
        ),
        model=CompletionConfig(
            nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=True
        ),
    )
    tr_idx = VideoIndex(["v"], ds.train_video_lengths)
    tr_flow = _pseudo_flow(ds.train_frames)
    cubes = extract_cube_set(
        cfg, SPEC, tr_idx, ds.train_frames, ds.train_boxes, flow_frames=tr_flow
    )
    trainer = make_trainer(cfg)
    model = train_model(cfg, cubes, trainer=trainer)

    te_idx = VideoIndex(["v"], ds.test_video_lengths)
    tc = extract_cube_set(
        cfg, SPEC, te_idx, ds.test_frames, ds.test_boxes,
        flow_frames=_pseudo_flow(ds.test_frames),
        block_mode=cfg.fore.test_block_mode,
    )
    ref = frame_level_scores(
        score_cubes(model, tc, trainer=trainer), tc, te_idx.total_frames
    )
    fast = infer_frame_scores_grid(
        model, tc, te_idx.total_frames, cube_batch=16
    )
    np.testing.assert_allclose(fast, ref, rtol=2e-4, atol=2e-4)


def test_resident_path_with_flow_matches_cubeset_path():
    """The HBM-resident fast path's use_flow branch (flow extraction, flow
    targets, fused z-norm) must match the step-by-step CubeSet path."""
    from vec_vad_tpu.infer import infer_frame_scores_resident
    from vec_vad_tpu.ops.stc import pad_boxes

    ds = make_synthetic_dataset(
        frames_per_video=16, n_train_videos=1, n_test_videos=1,
        frame_h=48, frame_w=64, seed=8,
    )
    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=16, max_boxes_per_frame=8),
        model=CompletionConfig(
            nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=True
        ),
    )
    tr_idx = VideoIndex(["v"], ds.train_video_lengths)
    tr_flow = _pseudo_flow(ds.train_frames)
    cubes = extract_cube_set(
        cfg, SPEC, tr_idx, ds.train_frames, ds.train_boxes, flow_frames=tr_flow
    )
    trainer = make_trainer(cfg)
    model = train_model(cfg, cubes, trainer=trainer)
    blk = model.blocks[(0, 0, 0)]

    te_idx = VideoIndex(["v"], ds.test_video_lengths)
    te_flow = _pseudo_flow(ds.test_frames)
    tc = extract_cube_set(
        cfg, SPEC, te_idx, ds.test_frames, ds.test_boxes,
        flow_frames=te_flow, block_mode=cfg.fore.test_block_mode,
    )
    ref = frame_level_scores(
        score_cubes(model, tc, trainer=trainer), tc, te_idx.total_frames
    )

    boxes_pad, valid = pad_boxes(ds.test_boxes, 8)
    windows = te_idx.context_indices(
        cfg.model.context_frame_num, cfg.model.border_mode
    )
    of_windows = te_idx.context_indices(
        cfg.model.context_of_num, cfg.model.border_mode
    )
    if of_windows.ndim == 1:
        of_windows = of_windows[:, None]
    mu_r, sd_r = blk.raw_stats
    mu_o, sd_o = blk.of_stats
    fast = infer_frame_scores_resident(
        cfg,
        {"params": blk.params, "batch_stats": blk.batch_stats},
        (mu_r, sd_r, mu_o, sd_o),
        ds.test_frames,
        windows,
        boxes_pad,
        valid,
        flow=te_flow,
        of_windows=of_windows,
        chunk=8,
        cube_batch=16,
    )
    np.testing.assert_allclose(fast, ref, rtol=2e-4, atol=2e-4)


def test_motion_threshold_filters_static_cubes():
    ds = make_synthetic_dataset(
        frames_per_video=12, n_train_videos=1, n_test_videos=1, seed=2
    )
    # zero flow everywhere -> with motion_thr > 0 nothing survives
    flow = np.zeros(ds.train_frames.shape[:3] + (2,), np.float32)
    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=16, max_boxes_per_frame=8, motion_thr=5.0),
        model=CompletionConfig(nf=4, epochs=1, batch_size=8, context_of_num=0),
    )
    idx = VideoIndex(["v"], ds.train_video_lengths)
    cubes = extract_cube_set(cfg, SPEC, idx, ds.train_frames, ds.train_boxes, flow)
    assert cubes.size == 0
