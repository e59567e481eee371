"""mmdet v1 CascadeRCNN test-time detection path, statically shaped for TPU.

Completes the checkpoint interop started in fore/mmdet_import.py: with the
heads converted (convert_cascade_heads), `MMDetCascadeDetector` reproduces
the reference's `inference_detector(model, img)` pipeline
(fore_det/inference.py:97-123) for the cascade_rcnn_r101_fpn_1x config —
RPN proposals, RoIAlign over the FPN pyramid, three cascade refinement
stages, multiclass NMS — so a user holding the real COCO checkpoint gets
the same boxes from this framework.

The numerics are the mmdet v1 *legacy* conventions, which differ from
modern detectron2/mmdet≥2 and are load-bearing for checkpoint parity:

  * base anchors are rounded to integer coords; w = stride, centred at
    (stride-1)/2 (mmdet/core/anchor/anchor_generator.py, v1).
  * delta2bbox uses the +1 width convention (pw = x2-x1+1) and clamps
    dw/dh at |log(16/1000)| (mmdet/core/bbox/transforms.py, v1).
  * NMS IoU uses +1 areas (mmdet/ops/nms, v1 CPU kernel).
  * RoIAlign is Caffe2-style aligned=False: no half-pixel offset,
    roi size floored at 1, sample_num=2 regular sub-bins, bilinear with
    zero outside [-1, size] (mmdet/ops/roi_align/src/roi_align_kernel.cu).
  * FPN level for a RoI: floor(log2(sqrt(area+1 style)/56 + 1e-6))
    clamped to [0,3] (SingleRoIExtractor.map_roi_levels).
  * class 0 is BACKGROUND; cascade averages the three stages' cls logits
    before one softmax (mmdet/models/detectors/cascade_rcnn.py simple_test).

Everything below jits with static shapes: fixed top-k proposal counts,
greedy NMS as a fori_loop of argmax-pick + IoU-suppress over masked
scores, per-level RoIAlign computed for all levels and blended by the
level assignment (4x compute for zero dynamic shapes — the TPU trade).
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vec_vad_tpu.fore.mmdet_import import BackboneFPN, _conv_hwio, _np

ANCHOR_RATIOS = (0.5, 1.0, 2.0)
ANCHOR_SCALES = (8.0,)
ANCHOR_STRIDES = (4, 8, 16, 32, 64)
STAGE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
              (0.033, 0.033, 0.067, 0.067))
WH_RATIO_CLIP = 16.0 / 1000.0
FINEST_SCALE = 56.0
NUM_CLASSES = 81  # 80 COCO + background at index 0


# ---------------------------------------------------------------------------
# heads (structure + checkpoint naming parity)
# ---------------------------------------------------------------------------


class RPNHead(nn.Module):
    """rpn_head: shared 3x3 conv + 1x1 cls (sigmoid, A anchors) + 1x1 reg."""

    feat_channels: int = 256
    num_anchors: int = len(ANCHOR_RATIOS) * len(ANCHOR_SCALES)

    @nn.compact
    def __call__(self, feat):
        h = nn.relu(nn.Conv(self.feat_channels, (3, 3),
                            padding=[(1, 1), (1, 1)], name="rpn_conv")(feat))
        cls = nn.Conv(self.num_anchors, (1, 1), name="rpn_cls")(h)
        reg = nn.Conv(self.num_anchors * 4, (1, 1), name="rpn_reg")(h)
        return cls, reg


class SharedFCBBoxHead(nn.Module):
    """bbox_head.{i}: flatten(7x7x256) -> fc1024 -> fc1024 -> cls81/reg4."""

    fc_out: int = 1024
    num_classes: int = NUM_CLASSES

    @nn.compact
    def __call__(self, roi_feat):  # (N, 7, 7, 256)
        h = roi_feat.reshape(roi_feat.shape[0], -1)
        h = nn.relu(nn.Dense(self.fc_out, name="fc1")(h))
        h = nn.relu(nn.Dense(self.fc_out, name="fc2")(h))
        cls = nn.Dense(self.num_classes, name="fc_cls")(h)
        reg = nn.Dense(4, name="fc_reg")(h)  # reg_class_agnostic
        return cls, reg


# ---------------------------------------------------------------------------
# legacy box numerics
# ---------------------------------------------------------------------------


def base_anchors(stride: int) -> np.ndarray:
    """mmdet v1 AnchorGenerator.gen_base_anchors: +1 centres, rounded."""
    w = h = float(stride)
    xc, yc = 0.5 * (w - 1), 0.5 * (h - 1)
    hr = np.sqrt(np.asarray(ANCHOR_RATIOS))
    wr = 1.0 / hr
    ws = (w * wr[:, None] * np.asarray(ANCHOR_SCALES)[None]).reshape(-1)
    hs = (h * hr[:, None] * np.asarray(ANCHOR_SCALES)[None]).reshape(-1)
    return np.round(np.stack(
        [xc - 0.5 * (ws - 1), yc - 0.5 * (hs - 1),
         xc + 0.5 * (ws - 1), yc + 0.5 * (hs - 1)], axis=-1)).astype(np.float32)


def grid_anchors(stride: int, feat_h: int, feat_w: int) -> np.ndarray:
    """(H*W*A, 4), shift-major / anchor-minor — matches the head output's
    permute(1,2,0) flattening."""
    base = base_anchors(stride)  # (A, 4)
    sx = np.arange(feat_w, dtype=np.float32) * stride
    sy = np.arange(feat_h, dtype=np.float32) * stride
    shift = np.stack(np.broadcast_arrays(
        sx[None, :], sy[:, None], sx[None, :], sy[:, None]), axis=-1)
    return (shift.reshape(-1, 1, 4) + base[None]).reshape(-1, 4)


def delta2bbox(rois, deltas, stds, max_hw):
    """mmdet v1 transforms.delta2bbox (legacy +1 widths), means all-zero."""
    stds = jnp.asarray(stds, jnp.float32)
    d = deltas * stds
    max_ratio = abs(np.log(WH_RATIO_CLIP))
    dx, dy = d[..., 0], d[..., 1]
    dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
    dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)
    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0] + 1.0
    ph = rois[..., 3] - rois[..., 1] + 1.0
    gw, gh = pw * jnp.exp(dw), ph * jnp.exp(dh)
    gx, gy = px + pw * dx, py + ph * dy
    h, w = max_hw
    x1 = jnp.clip(gx - 0.5 * (gw - 1), 0, w - 1)
    y1 = jnp.clip(gy - 0.5 * (gh - 1), 0, h - 1)
    x2 = jnp.clip(gx + 0.5 * (gw - 1), 0, w - 1)
    y2 = jnp.clip(gy + 0.5 * (gh - 1), 0, h - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def _iou_plus1(box, boxes):
    """v1 NMS IoU: +1 areas."""
    x1 = jnp.maximum(box[0], boxes[:, 0])
    y1 = jnp.maximum(box[1], boxes[:, 1])
    x2 = jnp.minimum(box[2], boxes[:, 2])
    y2 = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.maximum(x2 - x1 + 1, 0) * jnp.maximum(y2 - y1 + 1, 0)
    a = (box[2] - box[0] + 1) * (box[3] - box[1] + 1)
    b = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    return inter / (a + b - inter)


def nms_pick(boxes, scores, iou_thr: float, n_pick: int):
    """Greedy NMS as n_pick argmax-pick/suppress steps (static shapes).

    Returns (idx (n_pick,), valid (n_pick,)): the kept boxes in descending
    score order — identical to sorted greedy NMS because each argmax IS
    the next survivor in score order. Invalid candidates carry -inf."""

    def step(carry, _):
        live_scores = carry
        i = jnp.argmax(live_scores)
        ok = live_scores[i] > -jnp.inf
        sup = _iou_plus1(boxes[i], boxes) > iou_thr
        live_scores = jnp.where(sup | (jnp.arange(boxes.shape[0]) == i),
                                -jnp.inf, live_scores)
        return live_scores, (i, ok)

    _, (idx, ok) = jax.lax.scan(step, scores, None, length=n_pick)
    return idx, ok


# ---------------------------------------------------------------------------
# RoIAlign (Caffe2 aligned=False, sample_num=2) over the FPN pyramid
# ---------------------------------------------------------------------------


def roi_align_v1(feat, boxes, spatial_scale: float, out: int = 7,
                 sample_num: int = 2):
    """feat (H, W, C), boxes (N, 4) in image coords -> (N, out, out, C).

    mmdet v1 roi_align_kernel.cu semantics: start = x1*scale (no -0.5),
    size floored at 1, sample_num^2 regular samples per bin averaged,
    bilinear with zero outside [-1, size] and edge clamping inside."""
    H, W, _ = feat.shape
    x1 = boxes[:, 0] * spatial_scale
    y1 = boxes[:, 1] * spatial_scale
    w = jnp.maximum(boxes[:, 2] * spatial_scale - x1, 1.0)
    h = jnp.maximum(boxes[:, 3] * spatial_scale - y1, 1.0)
    bin_w, bin_h = w / out, h / out
    s = (jnp.arange(sample_num, dtype=jnp.float32) + 0.5) / sample_num
    # sample coords: (N, out, S)
    gx = (x1[:, None, None] + (jnp.arange(out)[None, :, None] +
                               s[None, None, :]) * bin_w[:, None, None])
    gy = (y1[:, None, None] + (jnp.arange(out)[None, :, None] +
                               s[None, None, :]) * bin_h[:, None, None])

    def interp(yy, xx):
        # zero outside [-1, size]; clamp negatives to 0 inside
        oob = (yy < -1.0) | (yy > H) | (xx < -1.0) | (xx > W)
        yy = jnp.clip(yy, 0.0, H - 1)
        xx = jnp.clip(xx, 0.0, W - 1)
        y0 = jnp.floor(yy).astype(jnp.int32)
        x0 = jnp.floor(xx).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, H - 1)
        x1i = jnp.minimum(x0 + 1, W - 1)
        ly, lx = yy - y0, xx - x0
        v00 = feat[y0, x0]
        v01 = feat[y0, x1i]
        v10 = feat[y1i, x0]
        v11 = feat[y1i, x1i]
        val = (v00 * ((1 - ly) * (1 - lx))[..., None]
               + v01 * ((1 - ly) * lx)[..., None]
               + v10 * (ly * (1 - lx))[..., None]
               + v11 * (ly * lx)[..., None])
        return jnp.where(oob[..., None], 0.0, val)

    # broadcast to (N, out, S, out, S): y varies on axes 1,2; x on 3,4
    yy = gy[:, :, :, None, None]
    xx = gx[:, None, None, :, :]
    yy, xx = jnp.broadcast_arrays(yy, xx)
    vals = interp(yy, xx)  # (N, out, S, out, S, C)
    return vals.mean(axis=(2, 4))


def roi_levels(boxes) -> jnp.ndarray:
    """SingleRoIExtractor.map_roi_levels (v1): +1 areas, finest_scale 56."""
    scale = jnp.sqrt((boxes[:, 2] - boxes[:, 0] + 1) *
                     (boxes[:, 3] - boxes[:, 1] + 1))
    lvl = jnp.floor(jnp.log2(scale / FINEST_SCALE + 1e-6))
    return jnp.clip(lvl, 0, 3).astype(jnp.int32)


def roi_align_pyramid(pyramid: Sequence[jnp.ndarray], boxes) -> jnp.ndarray:
    """Extract every RoI from its assigned level (featmap_strides 4..32).
    Computes all 4 levels and selects — static shapes beat gathers with
    data-dependent level counts on TPU."""
    lvl = roi_levels(boxes)
    outs = [roi_align_v1(pyramid[i], boxes, 1.0 / (4 * 2 ** i))
            for i in range(4)]
    stacked = jnp.stack(outs)  # (4, N, 7, 7, C)
    return jnp.take_along_axis(
        stacked, lvl[None, :, None, None, None], axis=0, mode="clip")[0]


# ---------------------------------------------------------------------------
# RPN proposals + cascade test-time path
# ---------------------------------------------------------------------------


def rpn_proposals_level(cls, reg, anchors, img_hw, nms_pre: int,
                        nms_post: int, nms_thr: float):
    """One level of RPNHead.get_bboxes (v1): sigmoid scores, top nms_pre,
    legacy decode, per-level NMS keeping nms_post. Returns (boxes, scores,
    valid) all (nms_post,)-shaped."""
    scores = jax.nn.sigmoid(cls.reshape(-1))
    deltas = reg.reshape(-1, 4)
    k = min(nms_pre, scores.shape[0])
    top_s, top_i = jax.lax.top_k(scores, k)
    boxes = delta2bbox(anchors[top_i], deltas[top_i],
                       (1.0, 1.0, 1.0, 1.0), img_hw)
    idx, ok = nms_pick(boxes, top_s, nms_thr, min(nms_post, k))
    return boxes[idx], jnp.where(ok, top_s[idx], -jnp.inf), ok


def cascade_detect(variables, img, img_hw, *, net: BackboneFPN,
                   rpn: RPNHead, heads: Sequence[SharedFCBBoxHead],
                   anchors_per_level: Sequence[jnp.ndarray],
                   nms_pre: int = 1000, nms_post: int = 1000,
                   max_num: int = 1000, rpn_nms_thr: float = 0.7,
                   score_thr: float = 0.05, rcnn_nms_thr: float = 0.5,
                   max_per_img: int = 100):
    """Full CascadeRCNN.simple_test on one preprocessed image (H, W, 3).

    img_hw: the resized (pre-pad) shape boxes are clipped to.
    Returns (boxes (max_per_img, 4), scores, labels, valid) — labels are
    0-based COCO indices like the reference's result list positions."""
    pyramid = net.apply(variables["body"], img[None])
    pyramid = [p[0] for p in pyramid]

    per = [rpn_proposals_level(
        *rpn.apply(variables["rpn"], pyramid[i][None]),
        anchors_per_level[i], img_hw, nms_pre, nms_post, rpn_nms_thr)
        for i in range(len(pyramid))]
    # strip the batch dim the head call added
    boxes_all = jnp.concatenate([b.reshape(-1, 4) for b, _, _ in per])
    scores_all = jnp.concatenate([s.reshape(-1) for _, s, _ in per])
    k = min(max_num, scores_all.shape[0])
    top_s, top_i = jax.lax.top_k(scores_all, k)
    proposals = boxes_all[top_i]
    valid = top_s > -jnp.inf

    ms_logits = []
    rois = proposals
    for stage, head in enumerate(heads):
        feats = roi_align_pyramid(pyramid[:4], rois)
        logits, reg = head.apply(variables["bbox"][stage], feats)
        ms_logits.append(logits)
        if stage < len(heads) - 1:
            rois = delta2bbox(rois, reg, STAGE_STDS[stage], img_hw)
    bboxes = delta2bbox(rois, reg, STAGE_STDS[len(heads) - 1], img_hw)
    scores = jax.nn.softmax(
        sum(ms_logits) / float(len(ms_logits)), axis=-1)

    # multiclass NMS (v1): per foreground class, threshold + NMS; then a
    # global top max_per_img. Per-class n_pick=max_per_img is exact for
    # the global cap (a class can contribute at most max_per_img boxes).
    def per_class(cls_scores):
        s = jnp.where((cls_scores > score_thr) & valid, cls_scores, -jnp.inf)
        idx, ok = nms_pick(bboxes, s, rcnn_nms_thr, max_per_img)
        return idx, jnp.where(ok, s[idx], -jnp.inf)

    idxs, kept_s = jax.vmap(per_class, in_axes=1)(scores[:, 1:])  # (80, P)
    labels = jnp.broadcast_to(
        jnp.arange(idxs.shape[0])[:, None], idxs.shape)
    flat_s = kept_s.reshape(-1)
    top_s2, pick = jax.lax.top_k(flat_s, max_per_img)
    det_boxes = bboxes[idxs.reshape(-1)[pick]]
    det_labels = labels.reshape(-1)[pick]
    return det_boxes, top_s2, det_labels, top_s2 > -jnp.inf


# ---------------------------------------------------------------------------
# head-checkpoint conversion
# ---------------------------------------------------------------------------


# tensor/layout helpers (_np, _conv_hwio) are shared with the backbone
# converter in mmdet_import so a dtype or layout fix there (e.g. bf16
# checkpoints) covers the head path too


def _conv(sd, key):
    return {"kernel": _conv_hwio(sd[key + ".weight"]),
            "bias": _np(sd[key + ".bias"])}


def _dense(sd, key):
    return {"kernel": _np(sd[key + ".weight"]).T,
            "bias": _np(sd[key + ".bias"])}


def convert_cascade_heads(ckpt, roi_size: int = 7,
                          roi_channels: int = 256) -> Dict:
    """rpn_head.* / bbox_head.{0,1,2}.* -> flax variables for RPNHead and
    the three SharedFCBBoxHeads. The first shared fc consumes the flattened
    RoI feature, which torch lays out (C, 7, 7) and this framework
    (7, 7, C): the converter permutes fc1's input axis accordingly, so
    outputs are bit-comparable despite the NHWC layout."""
    from vec_vad_tpu.fore.mmdet_import import strip_checkpoint

    sd = strip_checkpoint(ckpt)
    rpn = {"params": {
        "rpn_conv": _conv(sd, "rpn_head.rpn_conv"),
        "rpn_cls": _conv(sd, "rpn_head.rpn_cls"),
        "rpn_reg": _conv(sd, "rpn_head.rpn_reg"),
    }}
    heads = []
    for i in range(3):
        p = f"bbox_head.{i}"
        fc1 = _dense(sd, f"{p}.shared_fcs.0")
        w = fc1["kernel"]  # (C*S*S, out) in torch CHW flatten order
        out = w.shape[1]
        fc1["kernel"] = (w.reshape(roi_channels, roi_size, roi_size, out)
                          .transpose(1, 2, 0, 3).reshape(-1, out))
        heads.append({"params": {
            "fc1": fc1,
            "fc2": _dense(sd, f"{p}.shared_fcs.1"),
            "fc_cls": _dense(sd, f"{p}.fc_cls"),
            "fc_reg": _dense(sd, f"{p}.fc_reg"),
        }})
    return {"rpn": rpn, "bbox": heads}


# ---------------------------------------------------------------------------
# the inference_detector-equivalent wrapper
# ---------------------------------------------------------------------------

IMG_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMG_STD = np.array([58.395, 57.12, 57.375], np.float32)


def preprocess(img_bgr: np.ndarray, long_edge: int = 1333,
               short_edge: int = 800) -> Tuple[np.ndarray, Tuple[int, int],
                                               float]:
    """Host half of the test pipeline of cascade_rcnn_r101_fpn_1x.py:175-189:
    keep-ratio rescale to (1333, 800) on the uint8 image (mmcv resizes
    BEFORE Normalize, so uint8 resize is the faithful order), BGR->RGB,
    pad to /32. Normalization happens ON DEVICE (normalize_on_device) so
    the per-frame upload is uint8 — 4x less tunnel traffic than shipping
    the normalized float canvas (hardware at R101/800x1216: 371 vs
    1291 ms/frame through the remote tunnel — both transfer-bound there,
    the compute itself is tens of ms).

    Returns (padded uint8 HWC RGB, resized (h, w), scale_factor)."""
    import cv2

    h, w = img_bgr.shape[:2]
    scale = min(long_edge / max(h, w), short_edge / min(h, w))
    nw, nh = int(w * scale + 0.5), int(h * scale + 0.5)
    resized = cv2.resize(img_bgr, (nw, nh), interpolation=cv2.INTER_LINEAR)
    ph, pw = -(-nh // 32) * 32, -(-nw // 32) * 32
    out = np.zeros((ph, pw, 3), np.uint8)
    out[:nh, :nw] = resized[..., ::-1]
    return out, (nh, nw), scale


def normalize_on_device(img_u8, img_hw: Tuple[int, int]):
    """(x - mean) / std on the uint8 RGB canvas, keeping the mmcv Pad
    semantic: the padding region (beyond img_hw) stays exactly 0.0 because
    mmdet pads AFTER Normalize."""
    x = (img_u8.astype(jnp.float32) - jnp.asarray(IMG_MEAN)) / jnp.asarray(
        IMG_STD)
    H, W = img_u8.shape[:2]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = (ys < img_hw[0]) & (xs < img_hw[1])
    return jnp.where(inside[..., None], x, 0.0)


class MMDetCascadeDetector:
    """AppearanceDetector backed by a converted mmdet cascade checkpoint.

    detect(img) reproduces inference_detector(model, img) with
    rescale=True; __call__ adapts to the (boxes, scores) protocol that
    get_ap_bboxes-style filtering (fore.detector.filter_detections)
    consumes — class labels are dropped exactly like
    obj_det_with_motion.py:77-86 vstacks all classes."""

    def __init__(self, variables, depth: int = 101,
                 img_scale: Tuple[int, int] = (1333, 800), **test_cfg):
        self.net = BackboneFPN(depth=depth)
        self.rpn = RPNHead()
        self.heads = [SharedFCBBoxHead() for _ in range(3)]
        self.variables = variables
        self.img_scale = img_scale
        self.test_cfg = test_cfg
        self._jitted = {}

    @classmethod
    def from_checkpoint(cls, path: str, depth: int | None = None,
                        **test_cfg):
        """depth=None infers it from the checkpoint's stage-3 block count
        (cascade_rcnn_r101_fpn_1x ships R101; R50/R152 variants load
        identically)."""
        import torch

        from vec_vad_tpu.fore.mmdet_import import (
            convert_backbone_fpn, infer_depth, strip_checkpoint)

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        if depth is None:
            depth = infer_depth(strip_checkpoint(ckpt))
        variables = {"body": convert_backbone_fpn(ckpt, depth=depth),
                     **convert_cascade_heads(ckpt)}
        return cls(jax.tree_util.tree_map(jnp.asarray, variables),
                   depth=depth, **test_cfg)

    def _raw_fn(self, padded_hw: Tuple[int, int], img_hw: Tuple[int, int]):
        anchors = [jnp.asarray(grid_anchors(
            s, -(-padded_hw[0] // s), -(-padded_hw[1] // s)))
            for s in ANCHOR_STRIDES]
        fn = functools.partial(
            cascade_detect, net=self.net, rpn=self.rpn,
            heads=self.heads, anchors_per_level=anchors,
            **self.test_cfg)
        return lambda v, im: fn(v, normalize_on_device(im, img_hw), img_hw)

    def _fn_for(self, padded_hw: Tuple[int, int], img_hw: Tuple[int, int]):
        key = (padded_hw, img_hw)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(self._raw_fn(padded_hw, img_hw))
        return self._jitted[key]

    def _batched_fn(self, padded_hw: Tuple[int, int],
                    img_hw: Tuple[int, int]):
        key = ("batch", padded_hw, img_hw)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(jax.vmap(
                self._raw_fn(padded_hw, img_hw), in_axes=(None, 0)))
        return self._jitted[key]

    def detect(self, img_bgr: np.ndarray):
        """-> (boxes (K, 4) in ORIGINAL image coords, scores (K,),
        labels (K,)) for kept detections."""
        padded, img_hw, scale = preprocess(img_bgr, *self.img_scale)
        fn = self._fn_for(padded.shape[:2], img_hw)
        b, s, l, ok = fn(self.variables, jnp.asarray(padded))
        keep = np.asarray(ok)
        return (np.asarray(b)[keep] / scale, np.asarray(s)[keep],
                np.asarray(l)[keep])

    def detect_many(self, frames_bgr) -> list:
        """Batched detect: ONE device call for a same-sized frame stack —
        amortizes the per-call round trip that dominates per-frame latency
        on remote accelerators (precompute-boxes over a whole split is the
        caller, via compute_foreground_bboxes's detect_many fast path).

        Returns a list of (boxes, scores, labels) like detect() per frame.
        """
        pp = [preprocess(f, *self.img_scale) for f in frames_bgr]
        padded = np.stack([p[0] for p in pp])
        (img_hw, scale) = pp[0][1], pp[0][2]
        assert all(p[1] == img_hw for p in pp), "mixed frame sizes in batch"
        fn = self._batched_fn(padded.shape[1:3], img_hw)
        b, s, l, ok = fn(self.variables, jnp.asarray(padded))
        b, s, l, ok = (np.asarray(b), np.asarray(s), np.asarray(l),
                       np.asarray(ok))
        return [(b[i][ok[i]] / scale, s[i][ok[i]], l[i][ok[i]])
                for i in range(len(frames_bgr))]

    def __call__(self, img_bgr: np.ndarray):
        boxes, scores, _ = self.detect(img_bgr)
        return boxes, scores
