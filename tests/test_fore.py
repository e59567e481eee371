"""Foreground-localization parity: motion maps vs a cv2 oracle, overlap
suppression vs a literal re-derivation, patch modes vs the spec."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax.numpy as jnp  # noqa: E402

from vec_vad_tpu.fore.motion import motion_bboxes, motion_maps  # noqa: E402
from vec_vad_tpu.fore.patches import (  # noqa: E402
    full_frame_box,
    get_patch_boxes,
    multi_scale_patch_boxes,
)
from vec_vad_tpu.fore.suppress import del_cover_bboxes  # noqa: E402


def oracle_motion_map(window, gauss_k, binary_thr):
    """cv2 oracle for the dense stage of get_mt_bboxes
    (obj_det_with_motion.py:175-202): blur/absdiff/accumulate/threshold,
    reduced to the nonzero-after-grayscale foreground mask."""
    sum_grad = 0
    for i in range(window.shape[0] - 1):
        a = cv2.GaussianBlur(window[i], (gauss_k, gauss_k), 0)
        b = cv2.GaussianBlur(window[i + 1], (gauss_k, gauss_k), 0)
        sum_grad = cv2.absdiff(a, b) + sum_grad
    sum_grad = cv2.threshold(sum_grad, binary_thr, 255, cv2.THRESH_BINARY)[1]
    gray = cv2.cvtColor(sum_grad, cv2.COLOR_BGR2GRAY)
    return gray > 0


@pytest.mark.parametrize("gauss_k", [3, 5])
def test_motion_map_matches_cv2(rng, gauss_k):
    # moving square + noise so blur/threshold edges get exercised
    win = np.full((3, 40, 56, 3), 90, np.uint8)
    for t in range(3):
        win[t, 10 : 20 + t, 8 + 3 * t : 20 + 3 * t] = 200
    win = np.clip(
        win.astype(np.int16) + rng.integers(-6, 7, win.shape), 0, 255
    ).astype(np.uint8)

    got = np.asarray(motion_maps(jnp.asarray(win[None]), gauss_k, 18))[0]
    expect = oracle_motion_map(win, gauss_k, 18)
    # blur rounding can flip borderline pixels; demand near-exact agreement
    agree = (got == expect).mean()
    assert agree > 0.995, agree


def test_motion_bboxes_finds_moving_object():
    win = np.full((3, 48, 64, 3), 50, np.uint8)
    for t in range(3):
        win[t, 20:34, 10 + 4 * t : 24 + 4 * t] = 220
    m = np.asarray(motion_maps(jnp.asarray(win[None]), 3, 18))[0]
    boxes = motion_bboxes(m, None, area_thr=25.0, extend=2)
    assert boxes.shape[0] >= 1
    # the union of detected boxes covers the motion edges (the moving
    # square's appear/vanish bands; the unchanged interior produces no
    # gradient, so the region may split into multiple contours)
    x0, y0 = boxes[:, 0].min(), boxes[:, 1].min()
    x1, y1 = boxes[:, 2].max(), boxes[:, 3].max()
    assert x0 <= 12 and x1 >= 28 and y0 <= 22 and y1 >= 32, boxes

    # appearance-box suppression removes it
    boxes2 = motion_bboxes(
        m, np.array([[5, 15, 35, 40]]), area_thr=25.0, extend=2
    )
    assert boxes2.shape[0] == 0


def oracle_del_cover(bboxes, cover_thr):
    """Literal re-derivation of obj_det_with_motion.py:94-141."""
    x1, y1, x2, y2 = bboxes[:, 0], bboxes[:, 1], bboxes[:, 2], bboxes[:, 3]
    areas = (y2 - y1 + 1) * (x2 - x1 + 1)
    order = areas.argsort()
    keep = []
    for i in range(order.size):
        xx1 = np.maximum(x1[order[i]], x1[order[i + 1 :]])
        yy1 = np.maximum(y1[order[i]], y1[order[i + 1 :]])
        xx2 = np.minimum(x2[order[i]], x2[order[i + 1 :]])
        yy2 = np.minimum(y2[order[i]], y2[order[i + 1 :]])
        ov = np.maximum(0, xx2 - xx1 + 1) * np.maximum(0, yy2 - yy1 + 1)
        if (ov / areas[order[i]] > cover_thr).sum() == 0:
            keep.append(order[i])
    return bboxes[keep]


def test_del_cover_parity(rng):
    for _ in range(50):
        n = rng.integers(1, 15)
        x1 = rng.uniform(0, 300, n)
        y1 = rng.uniform(0, 200, n)
        boxes = np.stack(
            [x1, y1, x1 + rng.uniform(5, 80, n), y1 + rng.uniform(5, 80, n)],
            axis=1,
        )
        got = del_cover_bboxes(boxes, 0.6)
        expect = oracle_del_cover(boxes, 0.6)
        np.testing.assert_array_equal(got, expect)
    # empty input
    assert del_cover_bboxes(np.zeros((0, 4)), 0.6).shape == (0, 4)


def test_patch_boxes():
    # oracle per simple_patch.py:5-16
    import itertools

    def oracle(h, w, hn, wn):
        hs, ws = h / hn, w / wn
        ys = np.linspace(0, h - 1, hn, endpoint=False)
        xs = np.linspace(0, w - 1, wn, endpoint=False)
        out = []
        for x0, y0 in itertools.product(tuple(xs), tuple(ys)):
            out.append([x0, y0, min(x0 + ws, w - 1), min(y0 + hs, h - 1)])
        return np.array(out)

    np.testing.assert_allclose(get_patch_boxes(240, 360, 3, 4), oracle(240, 360, 3, 4))
    ms = multi_scale_patch_boxes(240, 360)
    assert ms.shape == (12 + 48, 4)
    np.testing.assert_allclose(full_frame_box(240, 360), [[0, 0, 360, 240]])


def test_compute_foreground_precomputed_and_patch_modes():
    from vec_vad_tpu.config import DATASETS, ForegroundConfig, PipelineConfig
    from vec_vad_tpu.data.video_index import VideoIndex
    from vec_vad_tpu.fore.detector import (
        PrecomputedDetector,
        compute_foreground_bboxes,
    )

    det = PrecomputedDetector(
        "/root/reference/raw_datasets/UCSDped2/bboxes_test_obj_det_with_motion.npy"
    )
    n = len(det)
    index = VideoIndex(["v"], np.array([n]))
    cfg = PipelineConfig(dataset_name="UCSDped2")
    spec = DATASETS["UCSDped2"]
    frames = np.zeros((4, 240, 360, 3), np.uint8)  # unused by precomputed
    boxes = compute_foreground_bboxes(
        cfg, spec, index, frames=frames, detector=det
    )
    assert len(boxes) == n and boxes[100].shape[1] == 4

    cfg2 = cfg.replace(fore=ForegroundConfig(extraction_mode="simple_patch"))
    idx4 = VideoIndex(["v"], np.array([4]))
    pb = compute_foreground_bboxes(cfg2, spec, idx4)
    assert len(pb) == 4 and pb[0].shape == (60, 4)

    cfg3 = cfg.replace(fore=ForegroundConfig(extraction_mode="frame"))
    fb = compute_foreground_bboxes(cfg3, spec, idx4)
    assert fb[0].shape == (1, 4)


def test_motion_mode_end_to_end_on_synthetic():
    from vec_vad_tpu.config import DATASETS, PipelineConfig
    from vec_vad_tpu.data.synthetic import make_synthetic_dataset
    from vec_vad_tpu.data.video_index import VideoIndex
    from vec_vad_tpu.fore.detector import compute_foreground_bboxes

    ds = make_synthetic_dataset(frames_per_video=8, n_train_videos=1, n_test_videos=1)
    index = VideoIndex(["v"], ds.train_video_lengths)

    def null_detector(img):
        return np.zeros((0, 4)), np.zeros(0)

    spec = DATASETS["UCSDped2"]
    cfg = PipelineConfig(dataset_name="UCSDped2")
    boxes = compute_foreground_bboxes(
        cfg, spec, index, frames=ds.train_frames, detector=null_detector
    )
    # moving squares must be caught by the motion stage on most frames
    found = sum(1 for b in boxes if b.shape[0] > 0)
    assert found >= len(boxes) - 2, found
