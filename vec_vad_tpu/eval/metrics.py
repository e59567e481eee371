"""Frame-level evaluation metrics in pure NumPy.

Drop-in replacement for the reference's sklearn-based evaluation
(utils.py:29-65): ROC curve + AUROC, EER (both directions), and PR curves
with either class as positive. Implemented against sklearn's exact curve
semantics (stable descending sort, distinct-threshold collapse, ROC
suboptimal-point dropping, PR full-recall truncation) so numbers match
sklearn to float precision — verified by tests/test_metrics.py.

No sklearn dependency on the production path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np


def _binary_curve(
    scores: np.ndarray, labels: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cumulative (fps, tps, thresholds) along decreasing score thresholds,
    one entry per distinct score value."""
    scores = np.asarray(scores, dtype=np.float64).ravel()
    labels = np.asarray(labels).ravel().astype(np.float64)
    order = np.argsort(-scores, kind="stable")
    scores = scores[order]
    labels = labels[order]
    # Collapse runs of equal scores: keep the last index of each run.
    distinct = np.where(np.diff(scores) != 0)[0]
    idxs = np.r_[distinct, scores.size - 1]
    tps = np.cumsum(labels)[idxs]
    fps = 1 + idxs - tps
    return fps, tps, scores[idxs]


def roc_curve(
    scores: np.ndarray, labels: np.ndarray, drop_intermediate: bool = True
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fpr, tpr, thresholds), matching sklearn.metrics.roc_curve."""
    fps, tps, thresholds = _binary_curve(scores, labels)
    if drop_intermediate and fps.size > 2:
        keep = np.where(
            np.r_[True, np.logical_or(np.diff(fps, 2), np.diff(tps, 2)), True]
        )[0]
        fps, tps, thresholds = fps[keep], tps[keep], thresholds[keep]
    # Prepend the (0, 0) origin point.
    fps = np.r_[0.0, fps]
    tps = np.r_[0.0, tps]
    thresholds = np.r_[np.inf, thresholds]
    fpr = fps / fps[-1] if fps[-1] > 0 else np.full_like(fps, np.nan)
    tpr = tps / tps[-1] if tps[-1] > 0 else np.full_like(tps, np.nan)
    return fpr, tpr, thresholds


def precision_recall_curve(
    scores: np.ndarray, labels: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(precision, recall, thresholds), matching
    sklearn.metrics.precision_recall_curve."""
    fps, tps, thresholds = _binary_curve(scores, labels)
    ps = tps + fps
    precision = np.divide(tps, ps, out=np.zeros_like(tps), where=ps > 0)
    if tps[-1] == 0:
        recall = np.ones_like(tps)
    else:
        recall = tps / tps[-1]
    # Reverse so recall is decreasing and append the (1, 0) endpoint —
    # sklearn's output convention (>=1.x without full-recall truncation).
    sl = slice(None, None, -1)
    return (
        np.r_[precision[sl], 1.0],
        np.r_[recall[sl], 0.0],
        thresholds[sl],
    )


def auc(x: np.ndarray, y: np.ndarray) -> float:
    """Trapezoidal area under a curve; handles decreasing x like sklearn."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    dx = np.diff(x)
    direction = 1.0
    if np.any(dx < 0):
        if np.all(dx <= 0):
            direction = -1.0
        else:
            raise ValueError("x is neither increasing nor decreasing")
    return float(direction * np.trapezoid(y, x))


def roc_auc_score(scores: np.ndarray, labels: np.ndarray) -> float:
    fpr, tpr, _ = roc_curve(scores, labels)
    return auc(fpr, tpr)


@dataclass(frozen=True)
class EvalResult:
    roc_auc: float
    eer1: float  # fpr at the EER point (utils.py:44-46)
    eer2: float  # fnr at the EER point
    pr_auc_norm: float  # PR-AUC with "normal" as positive class
    pr_auc_anom: float  # PR-AUC with "anomaly" as positive class
    curves: Dict[str, np.ndarray]


def evaluate_scores(scores: np.ndarray, labels: np.ndarray) -> EvalResult:
    """Full frame-level evaluation (parity with utils.py:29-65).

    `labels` are truthy for anomalous frames. Like the reference, scores are
    re-ordered into [negatives, positives] before curve computation (the
    ordering only affects tie-breaking inside stable sort).
    """
    scores = np.asarray(scores, dtype=np.float64).ravel()
    labels = np.asarray(labels).ravel()
    pos = scores[labels == 1]
    neg = scores[labels != 1]
    if pos.size == 0 or neg.size == 0:
        raise ValueError(
            "evaluate_scores needs both classes present; got "
            f"{pos.size} anomalous and {neg.size} normal frames"
        )
    truth = np.r_[np.zeros_like(neg), np.ones_like(pos)]
    preds = np.r_[neg, pos]

    fpr, tpr, roc_thresholds = roc_curve(preds, truth)
    roc_auc = auc(fpr, tpr)

    fnr = 1.0 - tpr
    i = int(np.nanargmin(np.abs(fnr - fpr)))
    eer1, eer2 = float(fpr[i]), float(fnr[i])

    p_n, r_n, t_n = precision_recall_curve(preds, truth)
    pr_auc_norm = auc(r_n, p_n)
    p_a, r_a, t_a = precision_recall_curve(-preds, 1 - truth)
    pr_auc_anom = auc(r_a, p_a)

    curves = dict(
        preds=preds, truth=truth, fpr=fpr, tpr=tpr,
        roc_thresholds=roc_thresholds, roc_auc=np.float64(roc_auc),
        precision_norm=p_n, recall_norm=r_n, pr_thresholds_norm=t_n,
        pr_auc_norm=np.float64(pr_auc_norm),
        precision_anom=p_a, recall_anom=r_a, pr_thresholds_anom=t_a,
        pr_auc_anom=np.float64(pr_auc_anom),
    )
    return EvalResult(roc_auc, eer1, eer2, pr_auc_norm, pr_auc_anom, curves)


def save_roc_pr_curve_data(
    scores: np.ndarray,
    labels: np.ndarray,
    file_path: Optional[str],
    verbose: bool = True,
) -> float:
    """Evaluate and persist curves as .npz (parity with utils.py:29-65).

    Returns the frame-level AUROC.
    """
    res = evaluate_scores(scores, labels)
    if verbose:
        print(
            "AUC@ROC is {}".format(res.roc_auc),
            "EER1 is {}".format(res.eer1),
            "EER2 is {}".format(res.eer2),
        )
    if file_path is not None:
        np.savez_compressed(file_path, **res.curves)
    return res.roc_auc


# ---------------------------------------------------------------------------
# Pixel-level criterion
# ---------------------------------------------------------------------------

# above this many total pixels the per-frame host loop (np.partition per
# frame) would dominate evaluation wall time; route through the chunked
# device reduction instead. ped2-scale (2010 x 240x360 = 1.7e8) stays on
# host; SHT-scale (40k x 480x856 = 1.6e10) goes to device.
_PIXEL_DEVICE_THRESHOLD = 1 << 29
# frames per device call: bounds the (chunk, H*W) f32 sort workspace to
# ~50-200 MB at SHT geometry
_PIXEL_DEVICE_CHUNK = 32


def _pixel_scalars_device(
    flat: np.ndarray, gt_flat: np.ndarray, coverage: float
) -> np.ndarray:
    """Device twin of the pixel_level_scalars reduction: one masked
    descending sort + per-row k-th-element gather per frame chunk.

    Exact (not approximate) vs the host np.partition path: both select an
    actual element of the frame, and selection-by-value is order-exact in
    f32. Anomalous frames mask non-GT pixels to -inf so the k-th largest
    of the sorted row IS the k-th largest inside the GT region
    (k = ceil(coverage*|GT|) <= |GT|, so the gather never reaches the
    -inf tail); normal frames keep the full row and take k=1 (the max).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chunk_fn(s, g, k):
        lab = g.any(axis=-1)
        masked = jnp.where(lab[:, None] & ~g, -jnp.inf, s)
        top = -jnp.sort(-masked, axis=-1)
        return jnp.take_along_axis(
            top, (k - 1)[:, None], axis=-1, mode="clip"
        )[:, 0]

    n = flat.shape[0]
    c = _PIXEL_DEVICE_CHUNK
    out = np.empty(n, np.float64)
    for lo in range(0, n, c):
        s = flat[lo : lo + c].astype(np.float32)
        g = gt_flat[lo : lo + c]
        if s.shape[0] < c:  # pad the tail so the jit compiles once
            pad = c - s.shape[0]
            s = np.concatenate([s, np.zeros((pad,) + s.shape[1:], s.dtype)])
            g = np.concatenate([g, np.zeros((pad,) + g.shape[1:], bool)])
        # k on the HOST in f64 — the host loop computes
        # ceil(coverage * |GT|) in f64, and f32 ceil disagrees for some
        # (coverage, |GT|) pairs (e.g. 0.3 * 50: f64 15.000000000000002
        # -> 16, f32 15.0 -> 15); shipping k keeps the two auto-routed
        # paths element-exact for EVERY coverage, not just the default
        cnt = g.sum(axis=-1)
        k = np.where(
            cnt > 0, np.ceil(coverage * cnt.astype(np.float64)), 1.0
        ).astype(np.int32)
        k = np.clip(k, 1, np.maximum(cnt, 1)).astype(np.int32)
        out[lo : lo + c] = np.asarray(chunk_fn(s, g, k))[: min(c, n - lo)]
    return out


def pixel_level_scalars(
    score_masks: np.ndarray,
    gt_masks: np.ndarray,
    coverage: float = 0.4,
    device: "Optional[bool]" = None,
) -> "tuple[np.ndarray, np.ndarray]":
    """Reduce per-pixel score masks to per-frame scalars implementing the
    standard VAD pixel-level criterion (Mahadevan et al., CVPR'10; the
    reference stubs every non-frame criterion with NotImplementedError,
    test.py:400-401 — this is a capability extension).

    An anomalous frame counts as detected at threshold t iff the predicted
    anomalous pixels (score >= t) cover >= `coverage` of its GT anomalous
    pixels; a normal frame is a false positive iff ANY pixel fires. Both
    rules are monotone in t, so each frame reduces to one scalar:

      * anomalous frame: the k-th largest score inside the GT region,
        k = ceil(coverage * |GT|)  (detected iff t <= that value);
      * normal frame:    the max score over the whole frame.

    The pixel-level ROC is then the ordinary score ROC over these scalars.
    Returns (scalars, labels).

    device=None auto-routes: above _PIXEL_DEVICE_THRESHOLD total pixels
    (SHT-scale evaluation) the reduction runs as chunked device sorts
    (_pixel_scalars_device, element-exact vs this loop); below, the host
    np.partition loop wins (no transfer, no compile).
    """
    # No dtype conversion: both reductions are pure order-based selection
    # (no arithmetic on scores), and an up-front float64 copy would double
    # the footprint of an SHT-scale mask stack (~66 GB f32) on the host —
    # exactly the scale the device route exists for.
    score_masks = np.asarray(score_masks)
    gt = np.asarray(gt_masks) > 0
    n = score_masks.shape[0]
    if gt.shape[0] != n:
        raise ValueError(f"{n} score masks vs {gt.shape[0]} GT masks")
    labels = gt.reshape(n, -1).any(axis=1).astype(np.int64)
    flat = score_masks.reshape(n, -1)
    if device is None:
        device = flat.size >= _PIXEL_DEVICE_THRESHOLD
    if device:
        return (
            _pixel_scalars_device(flat, gt.reshape(n, -1), coverage),
            labels,
        )
    scalars = np.empty(n, np.float64)
    for i in range(n):
        if labels[i]:
            region = flat[i][gt[i].reshape(-1)]
            k = max(int(np.ceil(coverage * region.size)), 1)
            # k-th largest
            scalars[i] = np.partition(region, region.size - k)[region.size - k]
        else:
            scalars[i] = flat[i].max()
    return scalars, labels


def pixel_level_roc(
    score_masks: np.ndarray,
    gt_masks: np.ndarray,
    coverage: float = 0.4,
    file_path: "Optional[str]" = None,
) -> float:
    """Pixel-level AUROC under the coverage criterion (see
    pixel_level_scalars); persists the ROC/PR curves like
    save_roc_pr_curve_data when `file_path` is given."""
    scalars, labels = pixel_level_scalars(score_masks, gt_masks, coverage)
    return save_roc_pr_curve_data(scalars, labels, file_path, verbose=False)
