"""Visualization helpers (capability parity with
helper/visualization_helper.py).

Score masks to grayscale images, cube batches to tiled grids, and
prediction/target pairs with JET error heatmaps.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def visualize_score(score_mask: np.ndarray, big_number: float = 1e5) -> np.ndarray:
    """(H, W) score mask -> uint8 grayscale image, -big_number floor mapped
    to 0 (visualization_helper.py:6-19)."""
    m = np.asarray(score_mask, dtype=np.float64)
    m = np.where(m <= -big_number, np.nan, m)
    if np.isnan(m).all():  # no cube covered any pixel: render black
        return np.zeros(m.shape, np.uint8)
    lo = float(np.nanmin(m))
    hi = float(np.nanmax(m))
    rng = hi - lo if hi > lo else 1.0
    out = (m - lo) / rng * 255.0
    return np.nan_to_num(out, nan=0.0).astype(np.uint8)


def tile_batch(batch: np.ndarray, cols: int = 8) -> np.ndarray:
    """(N, H, W, C) -> one tiled (rows*H, cols*W, C) image."""
    n, h, w, c = batch.shape
    rows = -(-n // cols)
    canvas = np.zeros((rows * h, cols * w, c), dtype=batch.dtype)
    for i in range(n):
        r, cc = divmod(i, cols)
        canvas[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = batch[i]
    return canvas


def _to_u8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, dtype=np.float64)
    if img.max() <= 1.5:
        img = img * 255.0
    return np.clip(img, 0, 255).astype(np.uint8)


def error_heatmap(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """JET colormap of |a - b| summed over channels
    (visualization_helper.py:70-113)."""
    import cv2

    err = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
    if err.ndim == 3:
        err = err.sum(axis=-1)
    err = (err / (err.max() + 1e-9) * 255.0).astype(np.uint8)
    return cv2.applyColorMap(err, cv2.COLORMAP_JET)


def visualize_pair_map(
    batch_1: np.ndarray, batch_2: np.ndarray, cols: int = 8
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(targets, outputs) cube batches -> (tiled targets, tiled outputs,
    tiled error heatmaps)."""
    t1 = tile_batch(_to_u8(batch_1), cols)
    t2 = tile_batch(_to_u8(batch_2), cols)
    heat = tile_batch(
        np.stack([error_heatmap(a, b) for a, b in zip(batch_1, batch_2)]), cols
    )
    return t1, t2, heat


def score_mask_overlay(
    frame: np.ndarray,
    score_mask: np.ndarray,
    big_number: float = 1e5,
    alpha: float = 0.5,
) -> np.ndarray:
    """Blend a JET heatmap of the anomaly-score mask onto the frame.

    Pixels at the -big_number floor (no cube covered them —
    test.py:350-357's mask init) keep the original frame; scored pixels
    get `alpha` of the colormapped score. The anomaly-overlay view the
    reference produces by hand from its persisted score_mask/<idx> files
    (visualize_score at helper/visualization_helper.py:6-19). Frame may
    be grayscale or BGR, any HxW — the mask is resized to match."""
    import cv2

    frame = np.asarray(frame)
    if frame.ndim == 2:
        frame = np.repeat(frame[:, :, None], 3, axis=2)
    frame = _to_u8(frame)
    m = np.asarray(score_mask, dtype=np.float64)
    covered = m > -big_number
    heat = cv2.applyColorMap(
        visualize_score(score_mask, big_number), cv2.COLORMAP_JET
    )
    if heat.shape[:2] != frame.shape[:2]:
        heat = cv2.resize(
            heat, (frame.shape[1], frame.shape[0]),
            interpolation=cv2.INTER_NEAREST,
        )
        covered = (
            cv2.resize(
                covered.astype(np.uint8),
                (frame.shape[1], frame.shape[0]),
                interpolation=cv2.INTER_NEAREST,
            )
            > 0
        )
    out = frame.copy()
    blend = cv2.addWeighted(frame, 1.0 - alpha, heat, alpha, 0.0)
    out[covered] = blend[covered]
    return out
