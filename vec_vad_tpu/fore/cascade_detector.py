"""Cascade FPN detector: the reference's appearance-detector architecture
class, natively in flax.

The reference uses an mmdet Cascade R-CNN R101-FPN
(fore_det/obj_det_config/cascade_rcnn_r101_fpn_1x.py:1-160): a multi-scale
FPN feature pyramid plus iterative box refinement through R-CNN stages with
INCREASING IoU quality thresholds (0.5/0.6/0.7). COCO weights cannot exist
in this environment, so what ships here is the same architecture class,
trainable from (frame, boxes) supervision:

  * conv backbone -> C2..C5 (strides 4/8/16/32),
  * FPN: 1x1 laterals + top-down upsampling + 3x3 smoothing -> P2..P5
    (the neck of cascade_rcnn_r101_fpn_1x.py:20-27),
  * proposal stage: a shared anchor-free center head on every level
    (heatmap + size + offset), objects assigned to levels by scale,
  * cascade: 2 refinement stages; each RoIAligns a SxS feature patch from
    the scale-assigned level and regresses a standard R-CNN box delta +
    objectness, trained with rising IoU thresholds (0.5, 0.6) against its
    own stage inputs — the Cascade R-CNN recipe (config :75-146),
  * final score: mean of the cascade stages' calibrated scores (mmdet's
    ensemble of stage classifiers at test time).

Everything is statically shaped and jitted end to end: fixed top-k
proposals, masked IoU matching, RoIAlign as vectorized bilinear gathers.
Plugs into the AppearanceDetector protocol (fore/detector.py) exactly like
CenterNet-lite (fore/jax_detector.py), which remains the cheap option.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

STRIDES = (4, 8, 16, 32)
# scale -> level assignment thresholds on sqrt(box area), in pixels
LEVEL_EDGES = (16.0, 32.0, 64.0)
ROI_SIZE = 5
STAGE_IOUS = (0.5, 0.6)  # rising cascade quality gates


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class FPNBackbone(nn.Module):
    """Conv backbone + FPN neck -> P2..P5, all `width*2` channels."""

    width: int = 16

    @nn.compact
    def __call__(self, x):
        w = self.width

        def block(x, ch, stride):
            x = nn.Conv(ch, (3, 3), strides=(stride, stride))(x)
            x = nn.relu(x)
            x = nn.Conv(ch, (3, 3))(x)
            return nn.relu(x)

        c1 = block(x, w, 2)          # /2
        c2 = block(c1, w, 2)         # /4
        c3 = block(c2, w * 2, 2)     # /8
        c4 = block(c3, w * 4, 2)     # /16
        c5 = block(c4, w * 4, 2)     # /32

        fch = w * 2
        laterals = [nn.Conv(fch, (1, 1))(c) for c in (c2, c3, c4, c5)]
        # top-down pathway (fpn neck)
        ps = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = jnp.repeat(jnp.repeat(ps[-1], 2, axis=1), 2, axis=2)
            ps.append(lat + up[:, : lat.shape[1], : lat.shape[2]])
        ps = ps[::-1]  # P2..P5
        return [nn.relu(nn.Conv(fch, (3, 3))(p)) for p in ps]


class CenterHead(nn.Module):
    """Shared anchor-free proposal head (heat/size/offset), applied per
    level; sizes are regressed in units of the level's stride."""

    width: int = 32

    @nn.compact
    def __call__(self, feat):
        h = nn.relu(nn.Conv(self.width, (3, 3))(feat))
        heat = nn.Conv(1, (3, 3), bias_init=nn.initializers.constant(-2.19))(h)
        size = nn.Conv(2, (3, 3))(h)
        offset = nn.Conv(2, (3, 3))(h)
        return heat, size, offset


class RefineHead(nn.Module):
    """One cascade stage: RoI feature patch -> (box delta, objectness)."""

    hidden: int = 64

    @nn.compact
    def __call__(self, roi):  # (N, S, S, C)
        x = roi.reshape(roi.shape[0], -1)
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        delta = nn.Dense(4)(x) * 0.1  # damped deltas stabilize early training
        score = nn.Dense(1)(x)[..., 0]
        return delta, score


class CascadeFPNNet(nn.Module):
    width: int = 16
    head_width: int = 32

    def setup(self):
        self.backbone = FPNBackbone(self.width)
        self.head = CenterHead(self.head_width)
        self.refine1 = RefineHead()
        self.refine2 = RefineHead()

    def pyramid(self, x):
        return self.backbone(x)

    def propose(self, pyramid):
        return [self.head(p) for p in pyramid]

    def refine(self, stage: int, roi):
        return (self.refine1 if stage == 0 else self.refine2)(roi)

    def __call__(self, x):  # init-only path: touch every submodule
        pyr = self.pyramid(x)
        outs = self.propose(pyr)
        c = pyr[0].shape[-1]
        roi = jnp.zeros((1, ROI_SIZE, ROI_SIZE, c))
        return outs, self.refine(0, roi), self.refine(1, roi)


# ---------------------------------------------------------------------------
# Geometry helpers (all jit-safe)
# ---------------------------------------------------------------------------


def roi_align(feat, boxes, stride, out=ROI_SIZE):
    """Sample an (out, out) patch per box with bilinear interpolation at bin
    centers — mmdet RoIAlign semantics (1 sample/bin). feat (H, W, C);
    boxes (N, 4) in IMAGE coords."""
    H, W, _ = feat.shape
    b = boxes / stride
    x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    bw = jnp.maximum(x1 - x0, 1e-3)
    bh = jnp.maximum(y1 - y0, 1e-3)
    i = (jnp.arange(out) + 0.5) / out
    xs = x0[:, None] + i[None, :] * bw[:, None] - 0.5  # (N, out)
    ys = y0[:, None] + i[None, :] * bh[:, None] - 0.5

    xf = jnp.clip(xs, 0.0, W - 1.0)
    yf = jnp.clip(ys, 0.0, H - 1.0)
    xl = jnp.floor(xf).astype(jnp.int32)
    yt = jnp.floor(yf).astype(jnp.int32)
    xr = jnp.minimum(xl + 1, W - 1)
    yb = jnp.minimum(yt + 1, H - 1)
    ax = (xf - xl)[:, None, :, None]  # (N, 1, out, 1)
    ay = (yf - yt)[:, :, None, None]  # (N, out, 1, 1)

    def gather(yy, xx):  # (N, out) x (N, out) -> (N, out, out, C)
        return feat[yy[:, :, None], xx[:, None, :]]

    return (
        (1 - ay) * (1 - ax) * gather(yt, xl)
        + (1 - ay) * ax * gather(yt, xr)
        + ay * (1 - ax) * gather(yb, xl)
        + ay * ax * gather(yb, xr)
    )


def level_of_boxes(boxes):
    """FPN scale assignment by sqrt(area) (the k = k0 + log2(scale/224)
    rule collapsed to static pixel edges)."""
    s = jnp.sqrt(
        jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0)
        * jnp.maximum(boxes[:, 3] - boxes[:, 1], 0.0)
    )
    lvl = jnp.zeros(boxes.shape[0], jnp.int32)
    for e in LEVEL_EDGES:
        lvl = lvl + (s >= e).astype(jnp.int32)
    return lvl


def roi_align_pyramid(pyramid, boxes):
    """RoIAlign each box from its scale-assigned level (computed on every
    level, mask-selected — static shapes beat dynamic dispatch for small
    k)."""
    lvl = level_of_boxes(boxes)
    outs = [
        roi_align(feat, boxes, stride)
        for feat, stride in zip(pyramid, STRIDES)
    ]
    stacked = jnp.stack(outs)  # (L, N, S, S, C)
    onehot = jax.nn.one_hot(lvl, len(pyramid), axis=0)  # (L, N)
    return jnp.einsum("lnijc,ln->nijc", stacked, onehot)


def apply_delta(boxes, delta):
    """Standard R-CNN box transform: (dx, dy, dw, dh) on (cx, cy, w, h)."""
    w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-3)
    h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-3)
    cx = boxes[:, 0] + w / 2 + delta[:, 0] * w
    cy = boxes[:, 1] + h / 2 + delta[:, 1] * h
    w = w * jnp.exp(jnp.clip(delta[:, 2], -2.0, 2.0))
    h = h * jnp.exp(jnp.clip(delta[:, 3], -2.0, 2.0))
    return jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1
    )


def encode_delta(src, dst):
    """Inverse of apply_delta: the regression target from src to dst."""
    sw = jnp.maximum(src[:, 2] - src[:, 0], 1e-3)
    sh = jnp.maximum(src[:, 3] - src[:, 1], 1e-3)
    dw = jnp.maximum(dst[:, 2] - dst[:, 0], 1e-3)
    dh = jnp.maximum(dst[:, 3] - dst[:, 1], 1e-3)
    return jnp.stack(
        [
            ((dst[:, 0] + dw / 2) - (src[:, 0] + sw / 2)) / sw,
            ((dst[:, 1] + dh / 2) - (src[:, 1] + sh / 2)) / sh,
            jnp.log(dw / sw),
            jnp.log(dh / sh),
        ],
        axis=1,
    )


def iou_matrix(a, b):
    """(N, 4) x (G, 4) -> (N, G) IoU."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.maximum(
        (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]), 0.0
    )
    area_b = jnp.maximum(
        (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]), 0.0
    )
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


# ---------------------------------------------------------------------------
# Proposal decoding
# ---------------------------------------------------------------------------


def decode_proposals(level_outs, hw, k_per_level=16, top_k=32):
    """Multi-level center decode -> (top_k, 4) boxes + scores (one image)."""
    H, W = hw
    cand_boxes, cand_scores = [], []
    for (heat, size, off), stride in zip(level_outs, STRIDES):
        p = jax.nn.sigmoid(heat)[..., 0]
        pooled = nn.max_pool(p[None, ..., None], (3, 3), (1, 1), "SAME")[
            0, ..., 0
        ]
        p = jnp.where(p >= pooled, p, 0.0)
        fh, fw = p.shape
        scores, idx = jax.lax.top_k(
            p.reshape(-1), min(k_per_level, fh * fw)
        )
        iy = (idx // fw).astype(jnp.float32)
        ix = (idx % fw).astype(jnp.float32)
        sz = size.reshape(-1, 2)[idx]
        of = off.reshape(-1, 2)[idx]
        cx = (ix + of[:, 0]) * stride
        cy = (iy + of[:, 1]) * stride
        bw = jnp.maximum(sz[:, 0], 0.0) * stride
        bh = jnp.maximum(sz[:, 1], 0.0) * stride
        cand_boxes.append(
            jnp.stack(
                [
                    jnp.clip(cx - bw / 2, 0.0, W),
                    jnp.clip(cy - bh / 2, 0.0, H),
                    jnp.clip(cx + bw / 2, 0.0, W),
                    jnp.clip(cy + bh / 2, 0.0, H),
                ],
                axis=1,
            )
        )
        cand_scores.append(scores)
    boxes = jnp.concatenate(cand_boxes)
    scores = jnp.concatenate(cand_scores)
    top, idx = jax.lax.top_k(scores, top_k)
    return boxes[idx], top


# ---------------------------------------------------------------------------
# Targets + losses
# ---------------------------------------------------------------------------


def make_level_targets(boxes_list: List[np.ndarray], hw: Tuple[int, int]):
    """Per-level gaussian heat + size/offset targets (host-side)."""
    H, W = hw
    out = []
    for stride in STRIDES:
        fh, fw = H // stride, W // stride
        n = len(boxes_list)
        heat = np.zeros((n, fh, fw, 1), np.float32)
        size = np.zeros((n, fh, fw, 2), np.float32)
        off = np.zeros((n, fh, fw, 2), np.float32)
        mask = np.zeros((n, fh, fw, 1), np.float32)
        out.append([heat, size, off, mask])
    ys_xs = [
        np.mgrid[0 : H // s, 0 : W // s] for s in STRIDES
    ]
    for i, boxes in enumerate(boxes_list):
        for b in np.asarray(boxes).reshape(-1, 4):
            side = np.sqrt(
                max(b[2] - b[0], 0.0) * max(b[3] - b[1], 0.0)
            )
            lvl = int(np.searchsorted(np.asarray(LEVEL_EDGES), side, "right"))
            s = STRIDES[lvl]
            heat, size, off, mask = out[lvl]
            fh, fw = heat.shape[1:3]
            cx, cy = (b[0] + b[2]) / 2 / s, (b[1] + b[3]) / 2 / s
            bw, bh = (b[2] - b[0]) / s, (b[3] - b[1]) / s
            ix = int(np.clip(cx, 0, fw - 1))
            iy = int(np.clip(cy, 0, fh - 1))
            sigma = max((bw + bh) / 12.0, 0.7)
            ys, xs = ys_xs[lvl]
            g = np.exp(
                -((xs - ix) ** 2 + (ys - iy) ** 2) / (2 * sigma**2)
            )
            heat[i, :, :, 0] = np.maximum(heat[i, :, :, 0], g)
            size[i, iy, ix] = (bw, bh)
            off[i, iy, ix] = (cx - ix, cy - iy)
            mask[i, iy, ix, 0] = 1.0
    return [tuple(t) for t in out]


def _center_loss(pred, targets):
    heat_p, size_p, off_p = pred
    heat_t, size_t, off_t, mask = targets
    p = jax.nn.sigmoid(heat_p)
    pos = (heat_t >= 0.999).astype(jnp.float32)
    eps = 1e-6
    pos_loss = -pos * ((1 - p) ** 2) * jnp.log(p + eps)
    neg_loss = -(1 - pos) * ((1 - heat_t) ** 4) * (p**2) * jnp.log(1 - p + eps)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    return (
        (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / n_pos
        + 0.1 * jnp.sum(jnp.abs(size_p - size_t) * mask) / n_pos
        + jnp.sum(jnp.abs(off_p - off_t) * mask) / n_pos
    )


def _stage_loss(delta, score, boxes_in, gt, gt_valid, iou_thr):
    """One cascade stage's loss for one image: L1 on encoded deltas for
    foreground proposals (IoU > 0.4 with best GT), BCE objectness labeled
    by the stage's rising IoU gate (Cascade R-CNN, config :75-146)."""
    iou = iou_matrix(boxes_in, gt)  # (K, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    matched_gt = gt[best]
    tgt = encode_delta(boxes_in, matched_gt)
    fg = (best_iou > 0.4).astype(jnp.float32)
    l_reg = jnp.sum(
        jnp.abs(delta - tgt) * fg[:, None]
    ) / jnp.maximum(jnp.sum(fg) * 4, 1.0)
    label = (best_iou > iou_thr).astype(jnp.float32)
    l_cls = jnp.mean(
        optax.sigmoid_binary_cross_entropy(score, label)
    )
    return l_reg + l_cls


# ---------------------------------------------------------------------------
# Training + inference drivers
# ---------------------------------------------------------------------------


class CascadeDetector:
    """AppearanceDetector-protocol wrapper (like fore.jax_detector)."""

    def __init__(self, net: CascadeFPNNet, variables, top_k: int = 32):
        self.net = net
        self.variables = variables
        self.top_k = top_k
        self._detect = functools.partial(
            _detect_batch_cascade, net=net, top_k=top_k
        )

    def __call__(self, img: np.ndarray):
        boxes, scores = self.detect_batch(img[None])
        return boxes[0], scores[0]

    def detect_batch(self, frames: np.ndarray):
        boxes, scores = self._detect(
            variables=self.variables, frames=jnp.asarray(frames)
        )
        return np.asarray(boxes), np.asarray(scores)


@functools.partial(jax.jit, static_argnames=("net", "top_k"))
def _detect_batch_cascade(variables, frames, *, net, top_k):
    x = frames.astype(jnp.float32) / 255.0
    H, W = x.shape[1:3]
    pyr = net.apply(variables, x, method=net.pyramid)
    level_outs = net.apply(variables, pyr, method=net.propose)

    def one(feats, outs):
        boxes, scores0 = decode_proposals(outs, (H, W), top_k=top_k)
        stage_scores = [scores0]
        for stage in range(2):
            roi = roi_align_pyramid(feats, boxes)
            delta, score = net.apply(variables, stage, roi, method=net.refine)
            boxes = apply_delta(boxes, delta)
            boxes = jnp.stack(
                [
                    jnp.clip(boxes[:, 0], 0.0, W),
                    jnp.clip(boxes[:, 1], 0.0, H),
                    jnp.clip(boxes[:, 2], 0.0, W),
                    jnp.clip(boxes[:, 3], 0.0, H),
                ],
                axis=1,
            )
            stage_scores.append(jax.nn.sigmoid(score))
        # mmdet averages the cascade stages' classifiers at test time
        final = (stage_scores[0] + stage_scores[1] + stage_scores[2]) / 3.0
        return boxes, final

    return jax.vmap(one)(pyr, level_outs)


def train_cascade_detector(
    frames: np.ndarray,
    boxes_list: List[np.ndarray],
    width: int = 16,
    steps: int = 300,
    batch_size: int = 8,
    learning_rate: float = 1e-3,
    top_k: int = 32,
    max_gt: int = 8,
    seed: int = 0,
) -> CascadeDetector:
    """Fit the cascade detector on (frame, boxes) supervision."""
    H, W = frames.shape[1:3]
    net = CascadeFPNNet(width=width)
    variables = net.init(jax.random.key(seed), jnp.zeros((1, H, W, 3)))
    level_targets = make_level_targets(boxes_list, (H, W))

    n = len(boxes_list)
    gt = np.zeros((n, max_gt, 4), np.float32)
    gt_valid = np.zeros((n, max_gt), bool)
    for i, bs in enumerate(boxes_list):
        bs = np.asarray(bs).reshape(-1, 4)[:max_gt]
        gt[i, : len(bs)] = bs
        gt_valid[i, : len(bs)] = True

    tx = optax.adam(learning_rate)
    opt = tx.init(variables["params"])

    @jax.jit
    def step(params, opt, xb, tb, gtb, gvb):
        def loss_fn(p):
            v = {"params": p}
            pyr = net.apply(v, xb, method=net.pyramid)
            level_outs = net.apply(v, pyr, method=net.propose)
            loss = 0.0
            for outs, tgt in zip(level_outs, tb):
                loss = loss + _center_loss(outs, tgt)

            def one(feats, outs, g, gv):
                boxes, _ = decode_proposals(outs, (H, W), top_k=top_k)
                l = 0.0
                b = jax.lax.stop_gradient(boxes)
                for stage, thr in enumerate(STAGE_IOUS):
                    roi = roi_align_pyramid(feats, b)
                    delta, score = net.apply(
                        v, stage, roi, method=net.refine
                    )
                    l = l + _stage_loss(delta, score, b, g, gv, thr)
                    b = jax.lax.stop_gradient(apply_delta(b, delta))
                return l

            l_stage = jax.vmap(one)(pyr, level_outs, gtb, gvb)
            return loss + jnp.mean(l_stage)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt2 = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt2, loss

    rng = np.random.default_rng(seed)
    params = variables["params"]
    x_all = frames.astype(np.float32) / 255.0
    for s in range(steps):
        sel = rng.integers(0, n, batch_size)
        tb = [
            tuple(jnp.asarray(t[sel]) for t in tgt)
            for tgt in level_targets
        ]
        params, opt, loss = step(
            params, opt, jnp.asarray(x_all[sel]), tb,
            jnp.asarray(gt[sel]), jnp.asarray(gt_valid[sel]),
        )
    return CascadeDetector(net, {"params": params}, top_k=top_k)
