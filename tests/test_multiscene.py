"""Multi-scene model grids: the reference keys its model grid by scene
(model_set[scene_idx-1][h][w], test.py:282-310) even though every stock
dataset runs with scene_idx all-ones. Pin the latent capability: cubes
route to their scene's block for training AND scoring, missing scenes
score big_number, and the streaming scorer honors start_video(scene=)."""

import numpy as np

from vec_vad_tpu.config import (
    CompletionConfig,
    DatasetSpec,
    ForegroundConfig,
    PipelineConfig,
)
from vec_vad_tpu.data.synthetic import make_synthetic_dataset
from vec_vad_tpu.data.video_index import VideoIndex
from vec_vad_tpu.pipeline import (
    VadModel,
    extract_cube_set,
    frame_level_scores,
    make_trainer,
    score_cubes,
    train_model,
)
from vec_vad_tpu.score.scoring import BIG_NUMBER
from vec_vad_tpu.serve import StreamingScorer

SPEC = DatasetSpec(
    name="ms", frame_h=48, frame_w=64, file_ext=".tif", scene_num=2,
    ap_score_thr=0.5, ap_min_area=16.0, cover_thr=0.6,
    mt_area_thr=16.0, mt_binary_thr=18.0, mt_extend=2, mt_gauss_mask_size=3,
)


def _scened_index(names, lengths):
    idx = VideoIndex(names, lengths)
    idx.scene_idx = np.repeat(
        np.arange(1, len(names) + 1), np.asarray(lengths)
    )
    return idx


def test_multiscene_train_score_stream():
    ds = make_synthetic_dataset(
        frames_per_video=14, n_train_videos=2, n_test_videos=2,
        frame_h=48, frame_w=64, seed=31,
    )
    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=16, max_boxes_per_frame=8),
        model=CompletionConfig(
            nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=False
        ),
    )
    tr_idx = _scened_index(["a", "b"], ds.train_video_lengths)
    cubes = extract_cube_set(cfg, SPEC, tr_idx, ds.train_frames, ds.train_boxes)
    assert set(np.unique(cubes.scenes)) == {1, 2}

    trainer = make_trainer(cfg)
    model = train_model(cfg, cubes, trainer=trainer)
    assert (0, 0, 0) in model.blocks and (1, 0, 0) in model.blocks

    te_idx = _scened_index(["a", "b"], ds.test_video_lengths)
    tc = extract_cube_set(
        cfg, SPEC, te_idx, ds.test_frames, ds.test_boxes,
        block_mode=cfg.fore.test_block_mode,
    )
    assert set(np.unique(tc.scenes)) == {1, 2}
    scores = score_cubes(model, tc, trainer=trainer)

    # scene routing is real: dropping scene 2's model turns exactly its
    # cubes into big_number (test.py:308-310) and leaves scene 1 untouched
    m1 = VadModel(
        cfg=model.cfg,
        blocks={k: v for k, v in model.blocks.items() if k[0] == 0},
    )
    s1 = score_cubes(m1, tc, trainer=trainer)
    in2 = tc.scenes == 2
    assert in2.any() and (~in2).any()
    assert (s1[in2] == BIG_NUMBER).all()
    np.testing.assert_allclose(s1[~in2], scores[~in2], rtol=1e-5, atol=1e-5)
    # the full model scores scene-2 cubes with scene 2's own block
    assert not np.allclose(scores[in2], BIG_NUMBER)

    # streaming with start_video(scene=N) reproduces the offline frame max
    offline = frame_level_scores(scores, tc, te_idx.total_frames)
    scorer = StreamingScorer.from_model(model)
    streamed = []
    i = 0
    for vi, ln in enumerate(te_idx.video_lengths):
        scorer.start_video(scene=vi + 1)
        for _ in range(int(ln)):
            streamed.append(scorer.push(ds.test_frames[i], ds.test_boxes[i]))
            i += 1
    np.testing.assert_allclose(
        np.asarray(streamed), offline, rtol=2e-4, atol=2e-4
    )
