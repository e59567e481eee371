"""Scoring aggregation: host vs device mask splat, frame segment max."""

import numpy as np

from vec_vad_tpu.score.scoring import (
    frame_scores_from_cubes,
    fuse_scores,
    splat_score_masks,
    splat_score_masks_device,
)


def test_device_splat_matches_host(rng):
    n_frames, h, w = 9, 24, 30
    m = 25
    frame_ids = np.sort(rng.integers(0, n_frames, m))
    x0 = rng.uniform(0, w - 5, m)
    y0 = rng.uniform(0, h - 5, m)
    boxes = np.stack(
        [x0, y0, x0 + rng.uniform(2, w / 2, m), y0 + rng.uniform(2, h / 2, m)],
        axis=1,
    ).astype(np.float32)
    boxes[:, 2] = np.minimum(boxes[:, 2], w)
    boxes[:, 3] = np.minimum(boxes[:, 3], h)
    scores = rng.normal(size=m).astype(np.float32)

    host = splat_score_masks(scores, boxes, frame_ids, n_frames, (h, w))
    dev = splat_score_masks_device(
        scores, boxes, frame_ids, n_frames, (h, w), frame_chunk=4
    )
    np.testing.assert_allclose(dev, host)

    # frame scores equal mask maxima
    fs = frame_scores_from_cubes(scores, frame_ids, n_frames)
    np.testing.assert_allclose(host.reshape(n_frames, -1).max(1), fs)


def test_device_splat_empty_frames():
    out = splat_score_masks_device(
        np.zeros(0, np.float32), np.zeros((0, 4), np.float32),
        np.zeros(0, np.int64), 3, (8, 10),
    )
    assert out.shape == (3, 8, 10)
    assert (out == -100000.0).all()


def test_per_video_normalization():
    from vec_vad_tpu.score.scoring import normalize_scores_per_video

    scores = np.array([1.0, 3.0, 2.0, -100000.0, 10.0, 20.0])
    fvi = np.array([1, 1, 1, 2, 2, 2])
    out = normalize_scores_per_video(scores, fvi)
    np.testing.assert_allclose(out[:3], [0.0, 1.0, 0.5])
    np.testing.assert_allclose(out[3:], [0.0, 0.0, 1.0])
    # single-valued video -> zeros, no div-by-zero
    out2 = normalize_scores_per_video(np.array([5.0, 5.0]), np.array([1, 1]))
    np.testing.assert_allclose(out2, [0.0, 0.0])


def test_fuse_scores():
    raw = np.array([10.0, 20.0])
    of = np.array([5.0, 7.0])
    fused = fuse_scores(raw, of, (10.0, 5.0), (5.0, 2.0), w_raw=1.0, w_of=2.0)
    np.testing.assert_allclose(fused, [0.0 + 0.0, 2.0 + 2.0])
    only_raw = fuse_scores(raw, None, (10.0, 5.0), None, 1.0, 1.0)
    np.testing.assert_allclose(only_raw, [0.0, 2.0])
