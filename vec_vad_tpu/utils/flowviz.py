"""Flow visualization and IO (capability parity with flowlib.py).

Middlebury color-wheel rendering (flowlib.py:244-282,431-522), .flo file
IO (flowlib.py:84-121), KITTI-style 16-bit png IO, and flow error metrics
(flowlib.py:189-242). Implemented vectorized from the Middlebury
color-coding definition.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

UNKNOWN_FLOW_THRESH = 1e7
TAG_FLOAT = 202021.25


# ---------------------------------------------------------------------------
# Color wheel
# ---------------------------------------------------------------------------


def make_color_wheel() -> np.ndarray:
    """(55, 3) RGB Middlebury color wheel: RY15 YG6 GC4 CB11 BM13 MR6."""
    ry, yg, gc, cb, bm, mr = 15, 6, 4, 11, 13, 6
    wheel = []
    for n, (c0, c1, up) in zip(
        (ry, yg, gc, cb, bm, mr),
        [
            ((255, 0, 0), "g", True),
            ((255, 255, 0), "r", False),
            ((0, 255, 0), "b", True),
            ((0, 255, 255), "g", False),
            ((0, 0, 255), "r", True),
            ((255, 0, 255), "b", False),
        ],
    ):
        base, chan, increasing = c0, c1, up
        for i in range(n):
            c = np.array(base, dtype=np.float64)
            v = np.floor(255.0 * i / n)
            idx = {"r": 0, "g": 1, "b": 2}[chan]
            c[idx] = v if increasing else 255 - v
            wheel.append(c)
    return np.array(wheel)


_WHEEL = make_color_wheel()


def compute_color(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Map normalized flow components to RGB via the color wheel."""
    h, w = u.shape
    img = np.zeros((h, w, 3), dtype=np.uint8)
    nan = np.isnan(u) | np.isnan(v)
    u = np.where(nan, 0, u)
    v = np.where(nan, 0, v)

    ncols = _WHEEL.shape[0]
    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi  # (-1, 1]
    fk = (a + 1.0) / 2.0 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    for c in range(3):
        col0 = _WHEEL[k0, c] / 255.0
        col1 = _WHEEL[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        inside = rad <= 1
        col = np.where(inside, 1 - rad * (1 - col), col * 0.75)
        img[:, :, c] = np.where(nan, 0, np.floor(255.0 * col)).astype(np.uint8)
    return img


def flow_to_image(flow: np.ndarray, max_flow: Optional[float] = None) -> np.ndarray:
    """(H, W, 2) flow -> (H, W, 3) uint8 RGB (flowlib.py:244-282)."""
    u = flow[:, :, 0].astype(np.float64).copy()
    v = flow[:, :, 1].astype(np.float64).copy()
    bad = (np.abs(u) > UNKNOWN_FLOW_THRESH) | (np.abs(v) > UNKNOWN_FLOW_THRESH)
    u[bad] = 0
    v[bad] = 0
    rad = np.sqrt(u ** 2 + v ** 2)
    maxrad = max_flow if max_flow is not None else max(float(rad.max()), -1.0)
    eps = np.finfo(float).eps
    img = compute_color(u / (maxrad + eps), v / (maxrad + eps))
    img[bad] = 0
    return img


# ---------------------------------------------------------------------------
# IO
# ---------------------------------------------------------------------------


def read_flo(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)[0]
        if magic != np.float32(TAG_FLOAT):
            raise ValueError(f"{path}: bad .flo magic {magic}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path: str, flow: np.ndarray) -> None:
    assert flow.ndim == 3 and flow.shape[2] == 2
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.array([TAG_FLOAT], np.float32).tofile(f)
        np.array([w], np.int32).tofile(f)
        np.array([h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_kitti_png(path: str) -> np.ndarray:
    """KITTI 16-bit png: (flow*64 + 2^15, valid) encoding -> (H, W, 3)
    [u, v, valid] (flowlib.py:126-150)."""
    import cv2

    raw = cv2.imread(path, cv2.IMREAD_UNCHANGED).astype(np.float64)
    # cv2 loads BGR -> channels reversed vs (u, v, valid) rgb encoding
    raw = raw[:, :, ::-1]
    flow = np.zeros_like(raw)
    flow[:, :, :2] = (raw[:, :, :2] - 2 ** 15) / 64.0
    flow[:, :, 2] = raw[:, :, 2]
    flow[raw[:, :, 2] == 0, :2] = 0
    return flow


def write_kitti_png(path: str, flow: np.ndarray) -> None:
    import cv2

    h, w = flow.shape[:2]
    out = np.zeros((h, w, 3), np.uint16)
    out[:, :, 0] = np.clip(flow[:, :, 0] * 64.0 + 2 ** 15, 0, 65535).astype(np.uint16)
    out[:, :, 1] = np.clip(flow[:, :, 1] * 64.0 + 2 ** 15, 0, 65535).astype(np.uint16)
    out[:, :, 2] = 1
    cv2.imwrite(path, out[:, :, ::-1])


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def flow_error(
    tu: np.ndarray, tv: np.ndarray, u: np.ndarray, v: np.ndarray
) -> float:
    """Mean endpoint error over known pixels (flowlib.py:189-242)."""
    known = (np.abs(tu) <= UNKNOWN_FLOW_THRESH) & (
        np.abs(tv) <= UNKNOWN_FLOW_THRESH
    )
    du = u[known] - tu[known]
    dv = v[known] - tv[known]
    return float(np.mean(np.sqrt(du ** 2 + dv ** 2)))


def warp_image_np(img: np.ndarray, flow: np.ndarray) -> np.ndarray:
    """Host-side backward warp (flowlib.py:373-400 capability); device code
    should use models.flownet.ops.warp_bilinear."""
    import jax.numpy as jnp

    from vec_vad_tpu.models.flownet.ops import warp_bilinear

    out = warp_bilinear(
        jnp.asarray(img[None], jnp.float32), jnp.asarray(flow[None], jnp.float32)
    )
    return np.asarray(out)[0]
