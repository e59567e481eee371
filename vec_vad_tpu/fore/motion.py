"""Motion-gradient foreground detector.

Parity with `get_mt_bboxes` (fore_det/obj_det_with_motion.py:144-223):
Gaussian-blur adjacent frames of a 3-frame window, accumulate absolute
differences, binary-threshold, zero out (extended) appearance-box regions,
find connected components, keep boxes by area/aspect, extend by 2 px.

TPU split: the dense per-pixel part (blur, absdiff, threshold, channel
reduction) runs as ONE batched jitted pass over all frames — replacing the
reference's per-frame OpenCV loop, its #1 CPU bottleneck. The tiny
per-component part (contour bounding boxes on a sparse binary map) stays on
host via cv2.findContours.

uint8 semantics replicated exactly: cv2's fixed small-Gaussian kernels for
ksize 3/5 at sigma=0, rounding after the blur, and uint8 wraparound when
the two absdiffs accumulate (the reference sums uint8 arrays).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# cv2 getGaussianKernel's fixed coefficients for small kernels at sigma<=0.
_GAUSS_TAPS = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125]),
}


def _blur_u8(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Separable Gaussian blur with BORDER_REFLECT_101 and uint8 rounding,
    batched over leading dims. x: (..., H, W, C) uint8 -> uint8."""
    taps = jnp.asarray(_GAUSS_TAPS[k], jnp.float32)
    pad = k // 2
    xf = x.astype(jnp.float32)
    # reflect-101: edge pixel not duplicated
    xp = jnp.pad(
        xf, [(0, 0)] * (x.ndim - 3) + [(pad, pad), (0, 0), (0, 0)], mode="reflect"
    )
    y = sum(
        taps[i] * xp[..., i : i + x.shape[-3], :, :] for i in range(k)
    )
    yp = jnp.pad(
        y, [(0, 0)] * (x.ndim - 3) + [(0, 0), (pad, pad), (0, 0)], mode="reflect"
    )
    y = sum(
        taps[i] * yp[..., :, i : i + x.shape[-2], :] for i in range(k)
    )
    return jnp.round(y).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("gauss_k", "binary_thr"))
def motion_maps(
    windows: jnp.ndarray, gauss_k: int, binary_thr: int
) -> jnp.ndarray:
    """Batched binary motion maps.

    windows: (B, 3, H, W, C) uint8 — each frame's hard-bordered 3-frame
    context (obj_det_with_motion.py:176-185). Returns (B, H, W) bool:
    True where ANY channel's accumulated gradient exceeds binary_thr
    (the reference's threshold + BGR2GRAY + nonzero-contour chain reduces
    to exactly this).
    """
    blurred = _blur_u8(windows, gauss_k)  # (B, 3, H, W, C)
    d01 = jnp.abs(
        blurred[:, 0].astype(jnp.int16) - blurred[:, 1].astype(jnp.int16)
    ).astype(jnp.uint8)
    d12 = jnp.abs(
        blurred[:, 1].astype(jnp.int16) - blurred[:, 2].astype(jnp.int16)
    ).astype(jnp.uint8)
    acc = d01 + d12  # uint8 wraparound, as in the reference's numpy sum
    return jnp.any(acc > binary_thr, axis=-1)


def motion_bboxes(
    binary_map: np.ndarray,
    ap_boxes: Optional[np.ndarray],
    area_thr: float,
    extend: int,
) -> np.ndarray:
    """Host-side component stage for ONE frame's binary map.

    Zeroes (extended) appearance-box regions, finds external contours,
    keeps boxes with (w+1)*(h+1) > area_thr and aspect < 10, extends by
    `extend` px clamped to the frame (obj_det_with_motion.py:190-218).
    Returns (M, 4) int boxes.
    """
    import cv2

    m = (binary_map.astype(np.uint8)) * 255
    h, w = m.shape
    if ap_boxes is not None:
        for b in np.asarray(ap_boxes).astype(np.int32):
            y1 = max(0, b[1] - extend)
            y2 = min(b[3] + extend, h)
            x1 = max(0, b[0] - extend)
            x2 = min(b[2] + extend, w)
            m[y1 : y2 + 1, x1 : x2 + 1] = 0

    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    out: List[List[int]] = []
    for c in contours:
        x, y, cw, ch = cv2.boundingRect(c)
        if (cw + 1) * (ch + 1) > area_thr and cw / ch < 10 and ch / cw < 10:
            out.append(
                [
                    max(0, x - extend),
                    max(0, y - extend),
                    min(x + cw + extend, w),
                    min(y + ch + extend, h),
                ]
            )
    return np.array(out) if out else np.zeros((0, 4))
