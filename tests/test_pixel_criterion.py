"""Pixel-level coverage criterion (eval.metrics.pixel_level_*): the
scalar reduction must agree with the literal per-threshold definition,
and the GT pixel-mask loader must read the ped/synthetic layout."""

import os

import numpy as np
import pytest

from vec_vad_tpu.eval.metrics import (
    evaluate_scores,
    pixel_level_roc,
    pixel_level_scalars,
)


def _naive_rates(score_masks, gt_masks, thr, coverage=0.4):
    """Literal criterion: anomalous frame detected iff predicted pixels
    cover >= coverage of GT pixels; normal frame fires iff any pixel."""
    tp = fn = fp = tn = 0
    for sm, gm in zip(score_masks, gt_masks):
        det = sm >= thr
        if gm.any():
            cov = (det & gm).sum() / gm.sum()
            if cov >= coverage:
                tp += 1
            else:
                fn += 1
        else:
            if det.any():
                fp += 1
            else:
                tn += 1
    return tp / max(tp + fn, 1), fp / max(fp + tn, 1)


def test_scalar_reduction_matches_naive_definition():
    rng = np.random.default_rng(3)
    n, h, w = 40, 12, 16
    scores = rng.normal(size=(n, h, w))
    gt = np.zeros((n, h, w), bool)
    for i in range(0, n, 2):  # half the frames anomalous, random blobs
        y, x = rng.integers(0, h - 4), rng.integers(0, w - 4)
        gt[i, y : y + 4, x : x + 4] = True
        scores[i, y : y + 4, x : x + 4] += rng.normal(1.0, 1.0, (4, 4))

    scalars, labels = pixel_level_scalars(scores, gt, coverage=0.4)
    assert (labels == gt.reshape(n, -1).any(1)).all()

    for thr in np.quantile(scores, [0.05, 0.3, 0.5, 0.8, 0.95, 0.999]):
        tpr_n, fpr_n = _naive_rates(scores, gt, thr)
        tpr_s = float(np.mean(scalars[labels == 1] >= thr))
        fpr_s = float(np.mean(scalars[labels == 0] >= thr))
        assert tpr_s == pytest.approx(tpr_n)
        assert fpr_s == pytest.approx(fpr_n)


def test_pixel_roc_perfect_and_chance():
    # perfectly localized scores -> AUROC 1.0
    n, h, w = 20, 8, 8
    gt = np.zeros((n, h, w), bool)
    scores = np.zeros((n, h, w))
    gt[:10, 2:6, 2:6] = True
    scores[:10, 2:6, 2:6] = 5.0
    assert pixel_level_roc(scores, gt) == pytest.approx(1.0)

    # anomalous frames with high scores OUTSIDE the GT region score no
    # better than background -> the frame criterion would be fooled but
    # the pixel criterion is not
    scores2 = np.zeros((n, h, w))
    scores2[:10, 6:, 6:] = 5.0  # disjoint from gt
    frame_auc = evaluate_scores(
        scores2.reshape(n, -1).max(1), gt.reshape(n, -1).any(1)
    ).roc_auc
    assert frame_auc == pytest.approx(1.0)  # fooled
    assert pixel_level_roc(scores2, gt) < 0.6  # not fooled


def test_load_pixel_masks_ped_layout(tmp_path):
    from vec_vad_tpu.data.readers import load_pixel_masks
    from vec_vad_tpu.data.synthetic import make_synthetic_dataset
    from vec_vad_tpu.data.video_index import VideoIndex

    root = os.path.join(str(tmp_path), "raw_datasets", "UCSDped2")
    ds = make_synthetic_dataset(
        root=root, frames_per_video=8, n_train_videos=1, n_test_videos=2,
        frame_h=24, frame_w=32, seed=2, write_to_disk=True,
    )
    index = VideoIndex.from_layout("UCSDped2", root, "test", ".tif")
    masks = load_pixel_masks("UCSDped2", root, index)
    assert masks.shape == (index.total_frames, 24, 32)
    np.testing.assert_array_equal(
        masks.reshape(masks.shape[0], -1).any(1), ds.test_labels > 0
    )

    with pytest.raises(ValueError):
        load_pixel_masks("ShanghaiTech", root, index)


def test_device_reduction_matches_host_loop():
    """The chunked device sort path (VERDICT r4 item 5) is element-exact
    vs the np.partition host loop, including frames whose GT region is a
    single pixel, all-normal batches, chunk-boundary tails, and coverage
    values that make k hit |GT| exactly."""
    rng = np.random.default_rng(7)
    n, h, w = 37, 10, 14  # n not a multiple of the device chunk
    scores = rng.normal(size=(n, h, w)).astype(np.float32)
    gt = np.zeros((n, h, w), bool)
    for i in range(n):
        kind = i % 4
        if kind == 0:
            continue  # normal frame
        if kind == 1:
            gt[i, rng.integers(0, h), rng.integers(0, w)] = True  # 1 px
        elif kind == 2:
            gt[i, 2:7, 3:9] = True
        else:
            gt[i] = True  # whole-frame GT
    for cov in (0.05, 0.4, 1.0):
        s_host, l_host = pixel_level_scalars(scores, gt, cov, device=False)
        s_dev, l_dev = pixel_level_scalars(scores, gt, cov, device=True)
        np.testing.assert_array_equal(l_host, l_dev)
        np.testing.assert_array_equal(s_host, s_dev)

    # all-normal batch (labels all zero -> every scalar is the frame max)
    gt0 = np.zeros((5, h, w), bool)
    s_host, _ = pixel_level_scalars(scores[:5], gt0, device=False)
    s_dev, _ = pixel_level_scalars(scores[:5], gt0, device=True)
    np.testing.assert_array_equal(s_host, s_dev)


def test_device_reduction_k_rounding_parity():
    """k must be computed on the HOST in f64 for the device path: f32
    ceil(coverage*|GT|) disagrees with the host loop's f64 for e.g.
    coverage=0.3 with |GT| in {50, 90, 100} (0.3*50 = 15.000000000000002
    in f64 -> k=16, but 15.0 in f32 -> k=15) — a device-side f32 k
    silently changed the selected element only when the input was big
    enough to auto-route."""
    rng = np.random.default_rng(3)
    h, w = 16, 16
    sizes = [50, 90, 100, 10, 30, 60, 120, 200]
    scores = rng.normal(size=(len(sizes), h, w)).astype(np.float32)
    gt = np.zeros((len(sizes), h, w), bool)
    for i, sz in enumerate(sizes):
        gt[i].reshape(-1)[:sz] = True
    for cov in (0.3, 0.7, 0.1):
        s_host, _ = pixel_level_scalars(scores, gt, cov, device=False)
        s_dev, _ = pixel_level_scalars(scores, gt, cov, device=True)
        np.testing.assert_array_equal(s_host, s_dev)


def test_device_reduction_sht_geometry():
    """SHT-geometry masks (480x856) through the device route — the
    auto-router sends real SHT-scale evaluation here; parity checked on a
    subsample of frames against the host loop."""
    from vec_vad_tpu.eval import metrics

    rng = np.random.default_rng(11)
    n, h, w = 48, 480, 856
    scores = (rng.normal(size=(n, h, w)) ** 2).astype(np.float32)
    gt = np.zeros((n, h, w), bool)
    for i in range(0, n, 3):
        y, x = rng.integers(0, h - 60), rng.integers(0, w - 80)
        gt[i, y : y + 60, x : x + 80] = True

    s_dev, l_dev = pixel_level_scalars(scores, gt, device=True)
    sub = [0, 1, 3, 17, 31, 32, 47]  # spans chunk boundaries + tail
    s_host, l_host = pixel_level_scalars(scores[sub], gt[sub], device=False)
    np.testing.assert_array_equal(s_dev[sub], s_host)
    np.testing.assert_array_equal(l_dev[sub], l_host)

    # the auto-router picks the device path at this footprint scaled to
    # full SHT frame counts (size >= threshold), host below
    assert n * h * w < metrics._PIXEL_DEVICE_THRESHOLD  # this fixture: host
    assert 40000 * h * w >= metrics._PIXEL_DEVICE_THRESHOLD  # real SHT: device
