"""Trainable JAX appearance detector.

The reference's appearance source is an mmdet Cascade R-CNN R101-FPN with
COCO-pretrained weights behind init_detector/inference_detector
(fore_det/inference.py:51-122). Pretrained weights cannot exist in this
zero-egress environment, so this module provides the detector COMPONENT
natively: a compact center-point detector (CenterNet-style: center heatmap
+ size + offset heads on a strided conv backbone) that

  * plugs into the AppearanceDetector protocol (detector.py) and the
    standard get_ap_bboxes filtering (score/area thresholds),
  * trains from scratch on (frame, boxes) supervision — e.g. distilled
    from the shipped bbox fixtures or any labeled source,
  * runs batched under jit; decoding (3x3 local-max NMS + top-k) is
    statically shaped.

It is a detector slot-filler, not a Cascade R-CNN reproduction: swap in a
stronger flax detector through the same protocol when weights exist.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


class CenterNetLite(nn.Module):
    """Small center-point detector. Output stride 4."""

    width: int = 32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) float in [0, 1] -> (heat (B, H/4, W/4, 1),
        size (B, H/4, W/4, 2), offset (B, H/4, W/4, 2))."""
        w = self.width
        x = nn.Conv(w, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        x = nn.Conv(w * 2, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        x = nn.Conv(w * 2, (3, 3))(x)
        x = nn.relu(x)
        x = nn.Conv(w * 4, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(w * 2, (4, 4), strides=(2, 2))(x)
        x = nn.relu(x)
        feat = nn.relu(nn.Conv(w * 2, (3, 3))(x))
        heat = nn.Conv(1, (3, 3), bias_init=nn.initializers.constant(-2.19))(feat)
        size = nn.Conv(2, (3, 3))(feat)
        offset = nn.Conv(2, (3, 3))(feat)
        return heat, size, offset


STRIDE = 4


def make_targets(
    boxes_list: List[np.ndarray], hw: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Gaussian center heatmap + size/offset regression targets."""
    H, W = hw
    fh, fw = H // STRIDE, W // STRIDE
    n = len(boxes_list)
    heat = np.zeros((n, fh, fw, 1), np.float32)
    size = np.zeros((n, fh, fw, 2), np.float32)
    off = np.zeros((n, fh, fw, 2), np.float32)
    mask = np.zeros((n, fh, fw, 1), np.float32)
    ys, xs = np.mgrid[0:fh, 0:fw]
    for i, boxes in enumerate(boxes_list):
        for b in np.asarray(boxes).reshape(-1, 4):
            cx, cy = (b[0] + b[2]) / 2 / STRIDE, (b[1] + b[3]) / 2 / STRIDE
            bw, bh = (b[2] - b[0]) / STRIDE, (b[3] - b[1]) / STRIDE
            ix, iy = int(np.clip(cx, 0, fw - 1)), int(np.clip(cy, 0, fh - 1))
            sigma = max((bw + bh) / 12.0, 0.7)
            g = np.exp(-((xs - ix) ** 2 + (ys - iy) ** 2) / (2 * sigma ** 2))
            heat[i, :, :, 0] = np.maximum(heat[i, :, :, 0], g)
            size[i, iy, ix] = (bw, bh)
            off[i, iy, ix] = (cx - ix, cy - iy)
            mask[i, iy, ix, 0] = 1.0
    return heat, size, off, mask


def detection_loss(pred, targets):
    """Penalty-reduced focal loss on centers + masked L1 on size/offset."""
    heat_p, size_p, off_p = pred
    heat_t, size_t, off_t, mask = targets
    p = jax.nn.sigmoid(heat_p)
    pos = (heat_t >= 0.999).astype(jnp.float32)
    eps = 1e-6
    pos_loss = -pos * ((1 - p) ** 2) * jnp.log(p + eps)
    neg_loss = (
        -(1 - pos) * ((1 - heat_t) ** 4) * (p ** 2) * jnp.log(1 - p + eps)
    )
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    l_heat = (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / n_pos
    l_size = jnp.sum(jnp.abs(size_p - size_t) * mask) / n_pos
    l_off = jnp.sum(jnp.abs(off_p - off_t) * mask) / n_pos
    return l_heat + 0.1 * l_size + l_off


@functools.partial(jax.jit, static_argnames=("net", "top_k"))
def _detect_batch(net, params, frames, top_k):
    """frames: (B, H, W, 3) uint8 -> (boxes (B, top_k, 4), scores)."""
    x = frames.astype(jnp.float32) / 255.0
    heat, size, off = net.apply({"params": params}, x)
    p = jax.nn.sigmoid(heat)[..., 0]  # (B, fh, fw)
    # 3x3 local-max NMS (the CenterNet trick)
    pooled = nn.max_pool(p[..., None], (3, 3), (1, 1), "SAME")[..., 0]
    p = jnp.where(p >= pooled, p, 0.0)
    B, fh, fw = p.shape
    flat = p.reshape(B, -1)
    scores, idx = jax.lax.top_k(flat, top_k)
    iy = (idx // fw).astype(jnp.float32)
    ix = (idx % fw).astype(jnp.float32)
    take = lambda t: jnp.take_along_axis(t.reshape(B, fh * fw, 2), idx[..., None], axis=1, mode="clip")
    sz = take(size)
    of = take(off)
    cx = (ix + of[..., 0]) * STRIDE
    cy = (iy + of[..., 1]) * STRIDE
    bw = jnp.maximum(sz[..., 0], 0.0) * STRIDE
    bh = jnp.maximum(sz[..., 1], 0.0) * STRIDE
    H, W = frames.shape[1:3]
    # clip to the frame like mmdet does — downstream crop-resize assumes
    # in-frame boxes (the reference's numpy crop clamps implicitly)
    boxes = jnp.stack(
        [
            jnp.clip(cx - bw / 2, 0.0, W),
            jnp.clip(cy - bh / 2, 0.0, H),
            jnp.clip(cx + bw / 2, 0.0, W),
            jnp.clip(cy + bh / 2, 0.0, H),
        ],
        axis=-1,
    )
    return boxes, scores


class JaxDetector:
    """AppearanceDetector-protocol wrapper around CenterNetLite."""

    def __init__(self, net: CenterNetLite, params, top_k: int = 32):
        self.net = net
        self.params = params
        self.top_k = top_k

    def __call__(self, img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        boxes, scores = self.detect_batch(img[None])
        return boxes[0], scores[0]

    def detect_batch(self, frames: np.ndarray):
        boxes, scores = _detect_batch(
            self.net, self.params, jnp.asarray(frames), self.top_k
        )
        return np.asarray(boxes), np.asarray(scores)


def train_detector(
    frames: np.ndarray,
    boxes_list: List[np.ndarray],
    width: int = 16,
    steps: int = 200,
    batch_size: int = 8,
    learning_rate: float = 1e-3,
    seed: int = 0,
) -> JaxDetector:
    """Fit CenterNetLite on (frame, boxes) supervision."""
    H, W = frames.shape[1:3]
    net = CenterNetLite(width=width)
    heat, size, off, mask = make_targets(boxes_list, (H, W))

    params = net.init(
        jax.random.key(seed), jnp.zeros((1, H, W, 3))
    )["params"]
    tx = optax.adam(learning_rate)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, xb, tb):
        def loss_fn(p):
            return detection_loss(net.apply({"params": p}, xb), tb)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    rng = np.random.default_rng(seed)
    n = frames.shape[0]
    x_all = frames.astype(np.float32) / 255.0
    loss = np.inf
    for s in range(steps):
        sel = rng.integers(0, n, batch_size)
        tb = (heat[sel], size[sel], off[sel], mask[sel])
        params, opt, loss = step(params, opt, jnp.asarray(x_all[sel]), tb)
    return JaxDetector(net, params)
