"""STC extraction parity vs the reference recipe (cv2 crop + resize,
vad_datasets.py:70-93)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vec_vad_tpu.ops.stc import (
    crop_resize_cube,
    cube_to_input,
    extract_stc,
    flow_magnitude,
    pad_boxes,
)


def reference_get_foreground(window_thwc, boxes, patch_size):
    """Oracle: integer-ceil crop + cv2.resize per frame (the reference's
    4-dim branch of get_foreground)."""
    cubes = []
    for b in boxes:
        x0, x1 = int(np.ceil(b[0])), int(np.ceil(b[2]))
        y0, y1 = int(np.ceil(b[1])), int(np.ceil(b[3]))
        frames = []
        for t in range(window_thwc.shape[0]):
            crop = window_thwc[t, y0:y1, x0:x1]
            frames.append(cv2.resize(crop, (patch_size, patch_size)))
        cubes.append(np.stack(frames))
    return np.stack(cubes)


def _random_boxes(rng, h, w, n, min_size=3):
    boxes = []
    for _ in range(n):
        x0 = rng.uniform(0, w - min_size - 1)
        y0 = rng.uniform(0, h - min_size - 1)
        boxes.append(
            [x0, y0, rng.uniform(x0 + min_size, w), rng.uniform(y0 + min_size, h)]
        )
    return np.array(boxes, dtype=np.float32)


def test_uint8_parity_with_cv2(rng):
    h, w, t = 48, 64, 5
    window = rng.integers(0, 256, (t, h, w, 3), dtype=np.uint8)
    boxes = _random_boxes(rng, h, w, 12)
    expect = reference_get_foreground(window, boxes, 32).astype(np.float32)
    got = np.asarray(extract_stc(window, boxes, 32, quantize=True))
    # cv2 uses 11-bit fixed-point coefficients on uint8; ours is exact float
    # then rounded — agree within 1 intensity level.
    assert np.abs(got - expect).max() <= 1.0
    # and the large majority agree exactly
    assert (got == expect).mean() > 0.8


def test_float_parity_with_cv2(rng):
    h, w, t = 40, 56, 2
    window = rng.normal(size=(t, h, w, 2)).astype(np.float32)  # flow-like
    boxes = _random_boxes(rng, h, w, 8)
    expect = reference_get_foreground(window, boxes, 32)
    got = np.asarray(extract_stc(window, boxes, 32))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_single_pixel_and_degenerate_boxes(rng):
    h, w = 32, 32
    window = rng.integers(0, 256, (1, h, w, 3), dtype=np.uint8)
    # 1x1 crop replicates the single pixel.
    got = np.asarray(crop_resize_cube(window, np.array([4.0, 5.0, 5.0, 6.0]), 8))
    np.testing.assert_allclose(got[0], np.broadcast_to(window[0, 5, 4], (8, 8, 3)))
    # Degenerate (padded) box must not crash or go out of bounds.
    got = np.asarray(crop_resize_cube(window, np.zeros(4), 8))
    assert np.isfinite(got).all()


def test_upscale_matches_cv2(rng):
    # patch smaller than patch_size -> upscaling path
    h, w = 30, 30
    window = rng.integers(0, 256, (3, h, w, 3), dtype=np.uint8)
    boxes = np.array([[2.0, 3.0, 12.0, 11.0]], dtype=np.float32)
    expect = reference_get_foreground(window, boxes, 32).astype(np.float32)
    got = np.asarray(extract_stc(window, boxes, 32, quantize=True))
    assert np.abs(got - expect).max() <= 1.0


def test_cube_to_input_layout(rng):
    # T-major channel stacking must equal the reference reshape:
    # (T,H,W,C) -> transpose (H,W,T,C) -> reshape (H,W,T*C)
    cube = rng.integers(0, 256, (5, 4, 4, 3)).astype(np.float32)
    got = np.asarray(cube_to_input(cube, scale=True))
    expect = np.transpose(cube, [1, 2, 0, 3]).reshape(4, 4, 15) / 255.0
    np.testing.assert_allclose(got, expect, atol=1e-6)
    # channel k of frame t lands at t*C + k
    np.testing.assert_allclose(got[..., 7], cube[2, :, :, 1] / 255.0, atol=1e-6)
    # batched variant
    cubes = rng.normal(size=(6, 5, 4, 4, 3)).astype(np.float32)
    gotb = np.asarray(cube_to_input(cubes, scale=False))
    for i in range(6):
        np.testing.assert_allclose(
            gotb[i], np.transpose(cubes[i], [1, 2, 0, 3]).reshape(4, 4, 15)
        )


def test_flow_magnitude_matches_reference(rng):
    flow = rng.normal(size=(7, 5, 32, 32, 2)).astype(np.float32)
    got = np.asarray(flow_magnitude(flow))
    # reference (train.py:171-176): mean over T of sum over (H, W, C) —
    # computed on the (T, H, W, C) cube layout
    expect = np.mean(np.sum(flow ** 2, axis=(2, 3, 4)), axis=1)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_pad_boxes_with_reference_fixture():
    boxes = np.load(
        "/root/reference/raw_datasets/UCSDped2/bboxes_test_obj_det_with_motion.npy",
        allow_pickle=True,
    )
    padded, valid = pad_boxes(list(boxes), 64)
    assert padded.shape == (len(boxes), 64, 4)
    counts = np.array([len(b) for b in boxes])
    np.testing.assert_array_equal(valid.sum(1), counts)
    i = int(np.argmax(counts))
    np.testing.assert_allclose(padded[i, : counts[i]], np.asarray(boxes[i], np.float32))
