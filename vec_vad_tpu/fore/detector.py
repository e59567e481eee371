"""Appearance-detector interface and the foreground-localization driver.

The reference's appearance source is an mmdet Cascade R-CNN R101-FPN behind
`init_detector` / `inference_detector` (fore_det/inference.py:51-122); its
per-dataset score/area filtering lives in `get_ap_bboxes`
(fore_det/obj_det_with_motion.py:47-91). Here the detector is a narrow
interface with two implementations:

  * PrecomputedDetector — serves the shipped final bbox fixtures
    (raw_datasets/*/bboxes_*_obj_det_with_motion.npy, README.md:51), the
    officially supported way to run without mmdet.
  * any callable `img -> (boxes (N, 4), scores (N,))` — plug in a real
    detector (no pretrained weights exist in this zero-egress image, so a
    Cascade R-CNN-equivalent ships as an interface, not weights).

`compute_foreground_bboxes` drives the four extraction modes of
train.py:62-95 / test.py:61-90 over a whole split, with the motion stage
batched on device.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Protocol, Tuple

import numpy as np

from vec_vad_tpu.config import DatasetSpec, PipelineConfig
from vec_vad_tpu.data.video_index import VideoIndex
from vec_vad_tpu.fore.motion import motion_bboxes, motion_maps
from vec_vad_tpu.fore.patches import full_frame_box, multi_scale_patch_boxes
from vec_vad_tpu.fore.suppress import del_cover_bboxes


class AppearanceDetector(Protocol):
    def __call__(self, img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """img (H, W, C) BGR uint8 -> (boxes (N, 4) xyxy, scores (N,))."""
        ...


class PrecomputedDetector:
    """Serves per-frame boxes from a saved object-array .npy fixture."""

    def __init__(self, path: str):
        self.all_boxes = list(np.load(path, allow_pickle=True))

    def __len__(self) -> int:
        return len(self.all_boxes)

    def boxes_for_frame(self, idx: int) -> np.ndarray:
        return np.asarray(self.all_boxes[idx]).reshape(-1, 4)


def filter_detections(
    boxes: np.ndarray,
    scores: np.ndarray,
    score_thr: float,
    min_area: float,
) -> np.ndarray:
    """Score + area filtering of raw detections
    (obj_det_with_motion.py:77-86). Areas use the inclusive convention."""
    boxes = np.asarray(boxes).reshape(-1, 4)
    scores = np.asarray(scores).reshape(-1)
    keep = scores > score_thr
    boxes = boxes[keep]
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    return boxes[areas >= min_area]


def compute_foreground_bboxes(
    cfg: PipelineConfig,
    spec: DatasetSpec,
    index: VideoIndex,
    frames: Optional[np.ndarray] = None,
    detector: Optional[Callable] = None,
    chunk: int = 64,
    detector_batch: int = 4,
) -> List[np.ndarray]:
    """Per-frame foreground boxes for a split, by extraction mode.

    frames: (N, H, W, C) uint8, required for detector/motion modes.
    Returns a ragged list of (K_i, 4) arrays (the bboxes_*.npy schema).
    """
    mode = cfg.fore.extraction_mode
    n = index.total_frames
    h, w = spec.frame_hw

    if mode == "simple_patch":
        tile = multi_scale_patch_boxes(h, w)
        return [tile.copy() for _ in range(n)]
    if mode == "frame":
        box = full_frame_box(h, w)
        return [box.copy() for _ in range(n)]

    assert frames is not None, f"mode {mode!r} needs frames"
    if isinstance(detector, PrecomputedDetector):
        return [detector.boxes_for_frame(i) for i in range(n)]
    assert detector is not None, (
        "obj_det modes need a detector (or PrecomputedDetector fixtures)"
    )

    # appearance stage (host detector) + suppression; detectors exposing
    # detect_many (e.g. MMDetCascadeDetector) get batched calls — one
    # device round trip per detector_batch frames instead of per frame.
    # detector_batch is deliberately small and separate from the decode
    # chunk: the cascade path materializes ~0.8 GB of RoIAlign
    # intermediates per 800x1216 image, so a 64-frame detector batch
    # would blow HBM. The tail batch pads by repeating the last frame
    # (and discards its outputs) so every call reuses ONE compiled shape.
    ap_per_frame: List[np.ndarray] = []
    if hasattr(detector, "detect_many"):
        db = detector_batch
        raw_results = []
        for lo in range(0, n, db):
            hi = min(lo + db, n)
            block = np.asarray(frames[lo:hi])
            if hi - lo < db:
                block = np.concatenate(
                    [block, np.repeat(block[-1:], db - (hi - lo), axis=0)]
                )
            raw_results += [
                (b, s) for b, s, _ in detector.detect_many(block)[: hi - lo]
            ]
    else:
        raw_results = None
    for i in range(n):
        raw_boxes, scores = (
            raw_results[i] if raw_results is not None else detector(frames[i])
        )
        ap = filter_detections(
            raw_boxes, scores, spec.ap_score_thr, spec.ap_min_area
        )
        ap_per_frame.append(del_cover_bboxes(ap, spec.cover_thr))

    if mode == "obj_det":
        return ap_per_frame
    assert mode == "obj_det_with_motion", mode

    # motion stage: hard-bordered 3-frame windows, batched on device
    import jax.numpy as jnp

    windows = index.context_indices(1, "hard")  # (N, 3)
    out: List[np.ndarray] = []
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        # decode the chunk's frame range ONCE and gather the 3-frame windows
        # from it (fancy-indexing a lazy frame source would decode every
        # frame ~3 times)
        f_lo = max(lo - 1, 0)
        block = np.asarray(frames[f_lo : min(hi + 1, n)])
        win = block[windows[lo:hi] - f_lo]  # (B, 3, H, W, C)
        maps = np.asarray(
            motion_maps(
                jnp.asarray(win), spec.mt_gauss_mask_size, int(spec.mt_binary_thr)
            )
        )
        for j, f in enumerate(range(lo, hi)):
            ap = ap_per_frame[f]
            mt = motion_bboxes(maps[j], ap, spec.mt_area_thr, spec.mt_extend)
            if mt.shape[0] > 0:
                out.append(np.concatenate([ap, mt], axis=0))
            else:
                out.append(ap)
    return out
