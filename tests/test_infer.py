"""The fused device-resident inference path must produce the same frame
scores as the step-by-step CubeSet path (which mirrors the reference's
per-frame/block loop)."""

import numpy as np

from vec_vad_tpu.config import (
    CompletionConfig,
    DatasetSpec,
    ForegroundConfig,
    PipelineConfig,
)
from vec_vad_tpu.data.synthetic import make_synthetic_dataset
from vec_vad_tpu.data.video_index import VideoIndex
from vec_vad_tpu.infer import infer_frame_scores
from vec_vad_tpu.ops.stc import pad_boxes
from vec_vad_tpu.pipeline import (
    extract_cube_set,
    frame_level_scores,
    make_trainer,
    score_cubes,
    train_model,
)


def test_fused_matches_cubeset_path():
    ds = make_synthetic_dataset(
        frames_per_video=16, n_train_videos=1, n_test_videos=1,
        frame_h=48, frame_w=64, seed=5,
    )
    spec = DatasetSpec(
        name="s", frame_h=48, frame_w=64, file_ext=".tif", scene_num=1,
        ap_score_thr=0.5, ap_min_area=16.0, cover_thr=0.6,
        mt_area_thr=16.0, mt_binary_thr=18.0, mt_extend=2, mt_gauss_mask_size=3,
    )
    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=16, max_boxes_per_frame=8),
        model=CompletionConfig(
            nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=False
        ),
    )
    tr_idx = VideoIndex(["a"], ds.train_video_lengths)
    cubes = extract_cube_set(cfg, spec, tr_idx, ds.train_frames, ds.train_boxes)
    trainer = make_trainer(cfg)
    model = train_model(cfg, cubes, trainer=trainer)
    blk = model.blocks[(0, 0, 0)]

    te_idx = VideoIndex(["a"], ds.test_video_lengths)
    # path 1: CubeSet (reference-mirroring)
    tc = extract_cube_set(
        cfg, spec, te_idx, ds.test_frames, ds.test_boxes,
        block_mode=cfg.fore.test_block_mode,
    )
    ref_scores = frame_level_scores(
        score_cubes(model, tc, trainer=trainer), tc, te_idx.total_frames
    )

    # path 2: fused
    boxes_pad, valid = pad_boxes(ds.test_boxes, 8)
    windows = te_idx.context_indices(
        cfg.model.context_frame_num, cfg.model.border_mode
    )
    mu, sd = blk.raw_stats
    fused = infer_frame_scores(
        cfg,
        {"params": blk.params, "batch_stats": blk.batch_stats},
        (mu, sd, 1.0, 1.0),
        ds.test_frames,
        windows,
        boxes_pad,
        valid,
        chunk=8,
    )
    np.testing.assert_allclose(fused, ref_scores, rtol=2e-4, atol=2e-4)

    # path 3: HBM-resident 3-call path (the bench/serving design)
    from vec_vad_tpu.infer import infer_frame_scores_resident

    resident = infer_frame_scores_resident(
        cfg,
        {"params": blk.params, "batch_stats": blk.batch_stats},
        (mu, sd, 1.0, 1.0),
        ds.test_frames,
        windows,
        boxes_pad,
        valid,
        chunk=8,
        cube_batch=16,
    )
    np.testing.assert_allclose(resident, ref_scores, rtol=2e-4, atol=2e-4)


def test_segmented_matches_resident():
    """infer_frame_scores_segmented (bounded-HBM path for avenue/SHT-scale
    splits) must equal the single-upload resident path, including the
    context overlap at segment boundaries and video starts."""
    from vec_vad_tpu.infer import (
        infer_frame_scores_resident,
        infer_frame_scores_segmented,
    )

    ds = make_synthetic_dataset(
        frames_per_video=13, n_train_videos=1, n_test_videos=2,
        frame_h=48, frame_w=64, seed=17,
    )
    spec = DatasetSpec(
        name="s", frame_h=48, frame_w=64, file_ext=".tif", scene_num=1,
        ap_score_thr=0.5, ap_min_area=16.0, cover_thr=0.6,
        mt_area_thr=16.0, mt_binary_thr=18.0, mt_extend=2, mt_gauss_mask_size=3,
    )
    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=16, max_boxes_per_frame=8),
        model=CompletionConfig(
            nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=False
        ),
    )
    tr_idx = VideoIndex(["a"], ds.train_video_lengths)
    cubes = extract_cube_set(cfg, spec, tr_idx, ds.train_frames, ds.train_boxes)
    trainer = make_trainer(cfg)
    model = train_model(cfg, cubes, trainer=trainer)
    blk = model.blocks[(0, 0, 0)]

    te_idx = VideoIndex(["a", "b"], ds.test_video_lengths)
    boxes_pad, valid = pad_boxes(ds.test_boxes, 8)
    windows = te_idx.context_indices(
        cfg.model.context_frame_num, cfg.model.border_mode
    )
    mu, sd = blk.raw_stats
    variables = {"params": blk.params, "batch_stats": blk.batch_stats}
    full = infer_frame_scores_resident(
        cfg, variables, (mu, sd, 1.0, 1.0), ds.test_frames, windows,
        boxes_pad, valid, chunk=4, cube_batch=16,
    )
    seg = infer_frame_scores_segmented(
        cfg, variables, (mu, sd, 1.0, 1.0), ds.test_frames, windows,
        boxes_pad, valid, segment_frames=6, chunk=4, cube_batch=16,
    )
    np.testing.assert_allclose(seg, full, rtol=2e-4, atol=2e-4)

    # the fallback fused path auto-routes to the segmented path instead of
    # device_put-ing an over-budget stack: a lazy stack is only ever read
    # in slices, and scores still match
    class LazySlices:
        def __init__(self, arr):
            self._a = arr
            self.shape, self.dtype = arr.shape, arr.dtype
            self.whole_reads = 0

        def __getitem__(self, key):
            return self._a[key]

        def __array__(self, dtype=None):  # materializing whole = the bug
            self.whole_reads += 1
            return self._a

    lazy = LazySlices(ds.test_frames)
    routed = infer_frame_scores(
        cfg, variables, (mu, sd, 1.0, 1.0), lazy, windows,
        boxes_pad, valid, device_memory_budget_bytes=1.0,
    )
    assert lazy.whole_reads == 0
    np.testing.assert_allclose(routed, full, rtol=2e-4, atol=2e-4)
