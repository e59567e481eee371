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
