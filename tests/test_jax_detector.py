"""Trainable JAX detector: learns to localize the synthetic moving squares
and plugs into the standard appearance-box filtering."""

import numpy as np
import pytest

from vec_vad_tpu.data.synthetic import make_synthetic_dataset
from vec_vad_tpu.fore.detector import filter_detections
from vec_vad_tpu.fore.jax_detector import (
    CenterNetLite,
    JaxDetector,
    make_targets,
    train_detector,
)


def _iou(a, b):
    ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


@pytest.fixture(scope="module")
def trained_det():
    ds = make_synthetic_dataset(
        frames_per_video=40, n_train_videos=2, n_test_videos=1,
        frame_h=48, frame_w=64, seed=11,
    )
    det = train_detector(
        ds.train_frames, ds.train_boxes, width=16, steps=150, batch_size=8
    )
    return ds, det


def test_targets_shape():
    boxes = [np.array([[4.0, 6.0, 20.0, 22.0]]), np.zeros((0, 4))]
    heat, size, off, mask = make_targets(boxes, (48, 64))
    assert heat.shape == (2, 12, 16, 1)
    assert heat[0].max() == 1.0 and heat[1].max() == 0.0
    assert mask[0].sum() == 1 and mask[1].sum() == 0


def test_detector_learns_synthetic_squares(trained_det):
    ds, det = trained_det
    hits, total = 0, 0
    for f in range(0, 16, 2):
        raw_boxes, scores = det(ds.test_frames[f])
        kept = filter_detections(raw_boxes, scores, score_thr=0.25, min_area=16.0)
        for gt in ds.test_boxes[f]:
            total += 1
            if any(_iou(gt, k) > 0.3 for k in kept):
                hits += 1
    recall = hits / max(total, 1)
    assert recall > 0.6, f"recall {recall} ({hits}/{total})"


def test_detector_protocol_and_batching(trained_det):
    ds, det = trained_det
    boxes, scores = det(ds.test_frames[0])
    assert boxes.shape == (32, 4) and scores.shape == (32,)
    bb, ss = det.detect_batch(ds.test_frames[:4])
    assert bb.shape == (4, 32, 4)
    np.testing.assert_allclose(bb[0], boxes, atol=1e-5)
