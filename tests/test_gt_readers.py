"""GT loaders for the avenue (.mat volLabel cell arrays) and ShanghaiTech
(per-video frame-mask .npy) layouts (vad_datasets.py:480-483,699-706),
plus the avenue pixel-mask variant."""

import os

import numpy as np
import pytest

scipy = pytest.importorskip("scipy")
import scipy.io as sio  # noqa: E402

from vec_vad_tpu.data.readers import load_frame_labels, load_pixel_masks
from vec_vad_tpu.data.video_index import VideoIndex


def _make_avenue_gt(root, lengths, h=12, w=16, seed=0):
    """ground_truth_demo/testing_label_mask/<i>_label.mat with a (1, N)
    volLabel cell of (h, w) masks — the reference's exact layout."""
    rng = np.random.default_rng(seed)
    gt_dir = os.path.join(root, "ground_truth_demo", "testing_label_mask")
    os.makedirs(gt_dir, exist_ok=True)
    all_masks = []
    for vi, ln in enumerate(lengths):
        vol = np.empty((1, ln), object)
        for t in range(ln):
            m = np.zeros((h, w), np.uint8)
            if rng.random() < 0.5:
                y, x = rng.integers(0, h - 3), rng.integers(0, w - 3)
                m[y : y + 3, x : x + 3] = 1
            vol[0, t] = m
            all_masks.append(m)
        sio.savemat(os.path.join(gt_dir, f"{vi + 1}_label.mat"), {"volLabel": vol})
    return np.stack(all_masks)


def test_avenue_gt_loaders(tmp_path):
    root = str(tmp_path)
    lengths = [7, 5]
    truth = _make_avenue_gt(root, lengths)
    index = VideoIndex(["01", "02"], np.array(lengths))

    labels = load_frame_labels("avenue", root, index)
    np.testing.assert_array_equal(
        labels, truth.reshape(truth.shape[0], -1).any(1).astype(np.int64)
    )

    masks = load_pixel_masks("avenue", root, index)
    np.testing.assert_array_equal(masks, truth > 0)


def test_shanghaitech_gt_loader(tmp_path):
    root = str(tmp_path)
    gt_dir = os.path.join(root, "Testing", "test_frame_mask")
    os.makedirs(gt_dir, exist_ok=True)
    rng = np.random.default_rng(1)
    lengths = [6, 9]
    parts = []
    for vi, ln in enumerate(lengths):
        arr = rng.integers(0, 2, ln).astype(np.int32)
        np.save(os.path.join(gt_dir, f"{vi + 1:02d}_0001.npy"), arr)
        parts.append(arr)
    truth = np.concatenate(parts)
    index = VideoIndex(["01_0001", "02_0001"], np.array(lengths))

    labels = load_frame_labels("ShanghaiTech", root, index)
    np.testing.assert_array_equal(labels, (truth > 0).astype(np.int64))

    with pytest.raises(ValueError):
        load_pixel_masks("ShanghaiTech", root, index)
