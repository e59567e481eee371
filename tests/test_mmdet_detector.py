"""mmdet v1 cascade detection-path numerics, against independent oracles.

mmdet itself is not installable here, so each legacy convention is pinned
against an independently-written loop oracle transcribed from the v1
source semantics (documented in fore/mmdet_detector.py's docstring), and
the heads are pinned against torch modules with mmdet parameter naming —
the same oracle strategy the CUDA ops used (test_flow_extras.py).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

import jax
import jax.numpy as jnp

from vec_vad_tpu.fore.mmdet_detector import (
    ANCHOR_STRIDES,
    MMDetCascadeDetector,
    RPNHead,
    SharedFCBBoxHead,
    base_anchors,
    convert_cascade_heads,
    delta2bbox,
    grid_anchors,
    nms_pick,
    preprocess,
    roi_align_v1,
    roi_levels,
)


def test_base_anchors_structure():
    for stride in ANCHOR_STRIDES:
        a = base_anchors(stride)
        assert a.shape == (3, 4)
        # centred at (stride-1)/2 up to rounding
        cx = (a[:, 0] + a[:, 2]) / 2
        np.testing.assert_allclose(cx, (stride - 1) / 2, atol=0.5)
        # +1 areas scale like stride^2 * 8^2 and match across ratios
        areas = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
        np.testing.assert_allclose(areas / (stride * 8.0) ** 2, 1.0, rtol=0.1)
        # ratio ordering: 0.5 (wide), 1.0, 2.0 (tall)
        w = a[:, 2] - a[:, 0]
        h = a[:, 3] - a[:, 1]
        assert w[0] > w[1] > w[2] and h[0] < h[1] < h[2]
        assert np.all(a == np.round(a))


def test_grid_anchors_tiling():
    g = grid_anchors(8, 2, 3)
    assert g.shape == (2 * 3 * 3, 4)
    base = base_anchors(8)
    # shift-major, anchor-minor; x shifts fastest within a row
    np.testing.assert_array_equal(g[:3], base)
    np.testing.assert_array_equal(g[3:6], base + np.array([8, 0, 8, 0]))
    np.testing.assert_array_equal(g[9:12], base + np.array([0, 8, 0, 8]))


def _delta2bbox_oracle(rois, deltas, stds, max_hw):
    out = np.zeros_like(rois)
    max_ratio = abs(np.log(16.0 / 1000.0))
    for i in range(rois.shape[0]):
        dx, dy, dw, dh = deltas[i] * np.asarray(stds)
        dw = np.clip(dw, -max_ratio, max_ratio)
        dh = np.clip(dh, -max_ratio, max_ratio)
        px = (rois[i, 0] + rois[i, 2]) * 0.5
        py = (rois[i, 1] + rois[i, 3]) * 0.5
        pw = rois[i, 2] - rois[i, 0] + 1.0
        ph = rois[i, 3] - rois[i, 1] + 1.0
        gw, gh = pw * np.exp(dw), ph * np.exp(dh)
        gx, gy = px + pw * dx, py + ph * dy
        out[i] = [np.clip(gx - 0.5 * (gw - 1), 0, max_hw[1] - 1),
                  np.clip(gy - 0.5 * (gh - 1), 0, max_hw[0] - 1),
                  np.clip(gx + 0.5 * (gw - 1), 0, max_hw[1] - 1),
                  np.clip(gy + 0.5 * (gh - 1), 0, max_hw[0] - 1)]
    return out


def test_delta2bbox_legacy():
    rng = np.random.default_rng(0)
    rois = rng.uniform(0, 60, (40, 4)).astype(np.float32)
    rois[:, 2:] += rois[:, :2]
    deltas = rng.normal(0, 2, (40, 4)).astype(np.float32)
    for stds in [(1, 1, 1, 1), (0.1, 0.1, 0.2, 0.2)]:
        got = np.asarray(delta2bbox(
            jnp.asarray(rois), jnp.asarray(deltas), stds, (96, 128)))
        np.testing.assert_allclose(
            got, _delta2bbox_oracle(rois, deltas, stds, (96, 128)),
            rtol=1e-5, atol=1e-4)


def _nms_oracle(boxes, scores, thr):
    order = np.argsort(-scores, kind="stable")
    keep = []
    alive = np.ones(len(scores), bool)
    for i in order:
        if not alive[i] or scores[i] == -np.inf:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x2 - x1 + 1, 0) * np.maximum(y2 - y1 + 1, 0)
        a = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
        b = ((boxes[:, 2] - boxes[:, 0] + 1)
             * (boxes[:, 3] - boxes[:, 1] + 1))
        alive &= (inter / (a + b - inter)) <= thr
    return keep


def test_nms_matches_sorted_greedy_oracle():
    rng = np.random.default_rng(1)
    boxes = rng.uniform(0, 50, (64, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(2, 30, (64, 2))
    scores = rng.uniform(0, 1, 64).astype(np.float32)
    scores[5] = scores[9] = -np.inf  # masked candidates never picked
    idx, ok = jax.jit(nms_pick, static_argnums=(2, 3))(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 64)
    got = list(np.asarray(idx)[np.asarray(ok)])
    assert got == _nms_oracle(boxes, scores, 0.5)


def _roi_align_oracle(feat, boxes, scale, out=7, sn=2):
    H, W, C = feat.shape
    res = np.zeros((len(boxes), out, out, C), np.float32)
    for n, (bx1, by1, bx2, by2) in enumerate(boxes):
        x1, y1 = bx1 * scale, by1 * scale
        w = max(bx2 * scale - x1, 1.0)
        h = max(by2 * scale - y1, 1.0)
        bw, bh = w / out, h / out
        for py in range(out):
            for px in range(out):
                acc = np.zeros(C, np.float32)
                for iy in range(sn):
                    for ix in range(sn):
                        y = y1 + (py + (iy + 0.5) / sn) * bh
                        x = x1 + (px + (ix + 0.5) / sn) * bw
                        if y < -1.0 or y > H or x < -1.0 or x > W:
                            continue
                        y, x = min(max(y, 0.0), H - 1), min(max(x, 0.0), W - 1)
                        y0, x0 = int(np.floor(y)), int(np.floor(x))
                        y1i, x1i = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                        ly, lx = y - y0, x - x0
                        acc += ((1 - ly) * (1 - lx) * feat[y0, x0]
                                + (1 - ly) * lx * feat[y0, x1i]
                                + ly * (1 - lx) * feat[y1i, x0]
                                + ly * lx * feat[y1i, x1i])
                res[n, py, px] = acc / (sn * sn)
    return res


def test_roi_align_caffe2_semantics():
    rng = np.random.default_rng(2)
    feat = rng.normal(size=(9, 11, 3)).astype(np.float32)
    boxes = np.array([[0, 0, 40, 36], [8, 4, 20, 30], [-4, -4, 6, 6],
                      [30, 20, 80, 70], [10, 10, 10.5, 10.5]], np.float32)
    got = np.asarray(roi_align_v1(jnp.asarray(feat), jnp.asarray(boxes), 0.25))
    np.testing.assert_allclose(
        got, _roi_align_oracle(feat, boxes, 0.25), rtol=1e-5, atol=1e-5)


def test_roi_levels_v1():
    boxes = jnp.asarray([[0, 0, 55, 55], [0, 0, 111, 111], [0, 0, 223, 223],
                         [0, 0, 447, 447], [0, 0, 1000, 1000], [0, 0, 3, 3]],
                        jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(roi_levels(boxes)), [0, 1, 2, 3, 3, 0])


class _TorchRPN(tnn.Module):
    def __init__(self):
        super().__init__()
        self.rpn_conv = tnn.Conv2d(256, 256, 3, padding=1)
        self.rpn_cls = tnn.Conv2d(256, 3, 1)
        self.rpn_reg = tnn.Conv2d(256, 12, 1)

    def forward(self, x):
        h = F.relu(self.rpn_conv(x))
        return self.rpn_cls(h), self.rpn_reg(h)


class _TorchBBoxHead(tnn.Module):
    def __init__(self):
        super().__init__()
        self.shared_fcs = tnn.ModuleList(
            [tnn.Linear(256 * 49, 1024), tnn.Linear(1024, 1024)])
        self.fc_cls = tnn.Linear(1024, 81)
        self.fc_reg = tnn.Linear(1024, 4)

    def forward(self, x):  # (N, 256, 7, 7) torch layout
        h = x.flatten(1)
        for fc in self.shared_fcs:
            h = F.relu(fc(h))
        return self.fc_cls(h), self.fc_reg(h)


def test_head_conversion_torch_parity():
    torch.manual_seed(0)
    trpn, theads = _TorchRPN(), [_TorchBBoxHead() for _ in range(3)]
    sd = {}
    for k, v in trpn.state_dict().items():
        sd[f"rpn_head.{k}"] = v
    for i, th in enumerate(theads):
        for k, v in th.state_dict().items():
            sd[f"bbox_head.{i}.{k}"] = v
    variables = convert_cascade_heads(sd)

    feat = torch.randn(1, 256, 6, 8)
    with torch.no_grad():
        rc, rr = trpn(feat)
    cls, reg = RPNHead().apply(
        variables["rpn"], jnp.asarray(feat.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(cls).transpose(0, 3, 1, 2),
                               rc.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(reg).transpose(0, 3, 1, 2),
                               rr.numpy(), rtol=1e-4, atol=1e-5)

    roi = torch.randn(5, 256, 7, 7)
    for i, th in enumerate(theads):
        with torch.no_grad():
            tc, tr = th(roi)
        fc, fr = SharedFCBBoxHead().apply(
            variables["bbox"][i],
            jnp.asarray(roi.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(fc), tc.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(fr), tr.numpy(),
                                   rtol=1e-4, atol=1e-4)


def test_preprocess_protocol():
    import cv2

    from vec_vad_tpu.fore.mmdet_detector import (
        IMG_MEAN, IMG_STD, normalize_on_device)

    img = np.random.default_rng(3).integers(
        0, 256, (240, 360, 3), dtype=np.uint8)
    padded, hw, scale = preprocess(img)
    # UCSD geometry: min(1333/360, 800/240) = 800/240
    assert abs(scale - 800.0 / 240.0) < 1e-9
    assert hw == (800, 1200)
    assert padded.shape == (800, 1216, 3)
    assert padded.dtype == np.uint8  # normalization happens on device

    # host + device halves compose to mmdet's Resize->Normalize->Pad:
    # normalized content, exact 0.0 in the pad region
    dev = np.asarray(normalize_on_device(jnp.asarray(padded), hw))
    resized = cv2.resize(img, (1200, 800), interpolation=cv2.INTER_LINEAR)
    ref = (resized[..., ::-1].astype(np.float32) - IMG_MEAN) / IMG_STD
    np.testing.assert_allclose(dev[:, :1200], ref, rtol=1e-5, atol=1e-5)
    assert np.all(dev[:, 1200:] == 0.0)


def test_full_detect_smoke():
    from tests.test_mmdet_import import TBackboneFPN, _randomize

    torch.manual_seed(1)
    tnet = _randomize(TBackboneFPN(50), seed=7)
    sd = dict(tnet.state_dict())
    trpn, theads = _TorchRPN(), [_TorchBBoxHead() for _ in range(3)]
    for k, v in trpn.state_dict().items():
        sd[f"rpn_head.{k}"] = v
    for i, th in enumerate(theads):
        for k, v in th.state_dict().items():
            sd[f"bbox_head.{i}.{k}"] = v

    from vec_vad_tpu.fore.mmdet_import import convert_backbone_fpn

    variables = {"body": convert_backbone_fpn(sd, depth=50),
                 **convert_cascade_heads(sd)}
    det = MMDetCascadeDetector(
        jax.tree_util.tree_map(jnp.asarray, variables), depth=50,
        nms_pre=48, nms_post=24, max_num=32, max_per_img=8,
        score_thr=1e-4)
    img = np.random.default_rng(4).integers(
        0, 256, (48, 64, 3), dtype=np.uint8)
    boxes, scores, labels = det.detect(img)
    assert boxes.shape[1] == 4 and len(scores) == len(boxes) == len(labels)
    assert len(boxes) <= 8
    if len(boxes):
        assert np.all(np.diff(scores) <= 1e-6)
        assert np.all(boxes[:, 2:] >= boxes[:, :2] - 1e-3)
        assert np.all(boxes >= -1e-3)
        assert np.all(labels >= 0) and np.all(labels < 80)
    b2, s2 = det(img)  # AppearanceDetector protocol
    np.testing.assert_array_equal(b2, boxes)


def test_runner_wiring_uses_configured_checkpoint(tmp_path, monkeypatch):
    """config.fore.mmdet_checkpoint routes obj_det extraction through the
    converted detector (runner.load_split) instead of motion-only."""
    import os

    from vec_vad_tpu import runner as runner_mod
    from vec_vad_tpu.config import load_ini_config
    from vec_vad_tpu.data.synthetic import make_synthetic_dataset

    base = str(tmp_path)
    make_synthetic_dataset(
        root=os.path.join(base, "raw_datasets", "UCSDped2"),
        frames_per_video=6, n_train_videos=1, n_test_videos=1,
        frame_h=48, frame_w=64, seed=5, write_to_disk=True,
    )
    cfg_text = """
[shared_parameters]
dataset_name = UCSDped2
raw_dataset_dir = raw_datasets
foreground_extraction_mode = obj_det
data_root_dir = data
modality = raw
method = SelfComplete
mmdet_checkpoint = {ckpt}
"""
    ckpt = os.path.join(base, "fake.pth")
    cfg_path = os.path.join(base, "config.cfg")
    with open(cfg_path, "w") as f:
        f.write(cfg_text.format(ckpt=ckpt))
    cfg = load_ini_config(cfg_path)
    assert cfg.fore.mmdet_checkpoint == ckpt

    calls = []

    def fake_loader(path):
        assert path == ckpt
        def det(img):
            calls.append(img.shape)
            return (np.array([[2.0, 2.0, 30.0, 40.0]]), np.array([0.9]))
        return det

    monkeypatch.setattr(runner_mod, "_mmdet_detector", fake_loader)
    data = runner_mod.load_split(cfg, base, "testing")
    assert len(calls) == data.index.total_frames
    # the detection survived score/area filtering into the box lists
    assert all(b.shape == (1, 4) for b in data.boxes)


def test_precompute_boxes_cli_roundtrip(tmp_path):
    """`precompute-boxes` writes fixtures load_split then serves verbatim
    (the reference's *_bbox_saved precomputation workflow)."""
    import os

    from vec_vad_tpu import cli
    from vec_vad_tpu import runner as runner_mod
    from vec_vad_tpu.config import load_ini_config
    from vec_vad_tpu.data.synthetic import make_synthetic_dataset

    base = str(tmp_path)
    root = os.path.join(base, "raw_datasets", "UCSDped2")
    make_synthetic_dataset(
        root=root, frames_per_video=6, n_train_videos=1, n_test_videos=1,
        frame_h=48, frame_w=64, seed=6, write_to_disk=True,
    )
    cfg_path = os.path.join(base, "config.cfg")
    with open(cfg_path, "w") as f:
        f.write("""
[shared_parameters]
dataset_name = UCSDped2
raw_dataset_dir = raw_datasets
foreground_extraction_mode = obj_det_with_motion
data_root_dir = data
modality = raw
method = SelfComplete
""")
    rc = cli.main(["precompute-boxes", "--config", cfg_path, "--base", base])
    assert rc == 0
    for split in ("train", "test"):
        fx = os.path.join(root, f"bboxes_{split}_obj_det_with_motion.npy")
        assert os.path.exists(fx), fx

    cfg = load_ini_config(cfg_path)
    data = runner_mod.load_split(cfg, base, "test")
    fixture = np.load(
        os.path.join(root, "bboxes_test_obj_det_with_motion.npy"),
        allow_pickle=True)
    assert len(fixture) == data.index.total_frames
    for served, saved in zip(data.boxes, fixture):
        np.testing.assert_array_equal(
            np.asarray(served).reshape(-1, 4),
            np.asarray(saved).reshape(-1, 4))

    # second invocation without --overwrite is a no-op
    rc = cli.main(["precompute-boxes", "--config", cfg_path, "--base", base])
    assert rc == 0


def test_cascade_detect_composition_oracle():
    """End-to-end cascade_detect vs a numpy/torch re-composition of the v1
    simple_test recipe built from this file's already-verified oracles —
    catches wiring bugs (top-k ordering, level routing, stage chaining,
    logit averaging, multiclass NMS + cap) that per-op tests cannot."""
    import functools

    from tests.test_mmdet_import import TBackboneFPN, _randomize
    from vec_vad_tpu.fore.mmdet_detector import (
        ANCHOR_STRIDES, STAGE_STDS, BackboneFPN, cascade_detect,
        roi_levels as jroi_levels,
    )
    from vec_vad_tpu.fore.mmdet_import import convert_backbone_fpn

    torch.manual_seed(2)
    tnet = _randomize(TBackboneFPN(50), seed=11)
    trpn, theads = _TorchRPN(), [_TorchBBoxHead() for _ in range(3)]
    sd = dict(tnet.state_dict())
    for k, v in trpn.state_dict().items():
        sd[f"rpn_head.{k}"] = v
    for i, th in enumerate(theads):
        for k, v in th.state_dict().items():
            sd[f"bbox_head.{i}.{k}"] = v
    variables = {"body": convert_backbone_fpn(sd, depth=50),
                 **convert_cascade_heads(sd)}
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    H, W = 64, 96
    img_hw = (H, W)
    cfgs = dict(nms_pre=40, nms_post=20, max_num=24, max_per_img=8,
                score_thr=1e-4, rpn_nms_thr=0.7, rcnn_nms_thr=0.5)
    img = np.random.default_rng(8).normal(size=(H, W, 3)).astype(np.float32)

    net = BackboneFPN(depth=50)
    anchors = [grid_anchors(s, -(-H // s), -(-W // s))
               for s in ANCHOR_STRIDES]
    fn = jax.jit(functools.partial(
        cascade_detect, net=net, rpn=RPNHead(),
        heads=[SharedFCBBoxHead() for _ in range(3)],
        anchors_per_level=[jnp.asarray(a) for a in anchors], **cfgs))
    jb, js, jl, jok = fn(variables, jnp.asarray(img), img_hw)
    jb, js, jl = (np.asarray(jb)[np.asarray(jok)],
                  np.asarray(js)[np.asarray(jok)],
                  np.asarray(jl)[np.asarray(jok)])

    # ---- numpy/torch oracle composition ----
    pyramid = [np.asarray(p[0]) for p in
               net.apply(variables["body"], jnp.asarray(img)[None])]
    # RPN proposals
    all_boxes, all_scores = [], []
    for lvl, feat in enumerate(pyramid):
        t = torch.from_numpy(feat.transpose(2, 0, 1).copy())[None]
        with torch.no_grad():
            cls, reg = trpn(t)
        scores = 1 / (1 + np.exp(-cls[0].permute(1, 2, 0).reshape(-1).numpy()))
        deltas = reg[0].permute(1, 2, 0).reshape(-1, 4).numpy()
        k = min(cfgs["nms_pre"], scores.shape[0])
        top = np.argsort(-scores, kind="stable")[:k]
        boxes = _delta2bbox_oracle(
            anchors[lvl][top], deltas[top], (1, 1, 1, 1), img_hw)
        keep = _nms_oracle(boxes, scores[top], cfgs["rpn_nms_thr"])
        keep = keep[:cfgs["nms_post"]]
        all_boxes.append(boxes[keep])
        all_scores.append(scores[top][keep])
    boxes = np.concatenate(all_boxes)
    scores = np.concatenate(all_scores)
    order = np.argsort(-scores, kind="stable")[:cfgs["max_num"]]
    proposals = boxes[order]

    # cascade stages
    def roi_feats(rois):
        lv = np.asarray(jroi_levels(jnp.asarray(rois.astype(np.float32))))
        feats = np.zeros((len(rois), 7, 7, 256), np.float32)
        for i, (r, l) in enumerate(zip(rois, lv)):
            feats[i] = _roi_align_oracle(
                pyramid[l], r[None].astype(np.float32),
                1.0 / (4 * 2 ** l))[0]
        return feats

    rois = proposals
    ms = []
    for st, th in enumerate(theads):
        f = torch.from_numpy(roi_feats(rois).transpose(0, 3, 1, 2))
        with torch.no_grad():
            logit, reg = th(f)
        ms.append(logit.numpy())
        if st < 2:
            rois = _delta2bbox_oracle(rois, reg.numpy(), STAGE_STDS[st],
                                      img_hw)
    final_boxes = _delta2bbox_oracle(rois, reg.numpy(), STAGE_STDS[2],
                                     img_hw)
    logits = sum(ms) / 3.0
    e = np.exp(logits - logits.max(1, keepdims=True))
    probs = e / e.sum(1, keepdims=True)

    dets = []
    for c in range(1, 81):
        s = probs[:, c].copy()
        s[s <= cfgs["score_thr"]] = -np.inf
        keep = _nms_oracle(final_boxes, s, cfgs["rcnn_nms_thr"])
        dets += [(s[i], c - 1, final_boxes[i]) for i in keep if s[i] > 0]
    dets.sort(key=lambda d: -d[0])
    dets = dets[:cfgs["max_per_img"]]

    assert len(dets) == len(js)
    for (os_, ol, ob), (gs, gl, gb) in zip(dets, zip(js, jl, jb)):
        assert ol == gl
        np.testing.assert_allclose(gs, os_, rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(gb, ob, rtol=1e-3, atol=0.15)


def test_detect_many_matches_detect():
    from tests.test_mmdet_import import TBackboneFPN, _randomize
    from vec_vad_tpu.fore.mmdet_import import convert_backbone_fpn

    torch.manual_seed(4)
    tnet = _randomize(TBackboneFPN(50), seed=17)
    sd = dict(tnet.state_dict())
    trpn, theads = _TorchRPN(), [_TorchBBoxHead() for _ in range(3)]
    for k, v in trpn.state_dict().items():
        sd[f"rpn_head.{k}"] = v
    for i, th in enumerate(theads):
        for k, v in th.state_dict().items():
            sd[f"bbox_head.{i}.{k}"] = v
    det = MMDetCascadeDetector(
        jax.tree_util.tree_map(jnp.asarray, {
            "body": convert_backbone_fpn(sd, depth=50),
            **convert_cascade_heads(sd)}),
        depth=50, nms_pre=32, nms_post=16, max_num=16, max_per_img=6,
        score_thr=1e-4)
    frames = np.random.default_rng(9).integers(
        0, 256, (3, 48, 64, 3), dtype=np.uint8)
    batched = det.detect_many(frames)
    for i in range(3):
        b, s, l = det.detect(frames[i])
        bb, bs, bl = batched[i]
        np.testing.assert_allclose(bb, b, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(bs, s, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(bl, l)


def test_compute_foreground_uses_detect_many():
    from vec_vad_tpu.config import DATASETS, PipelineConfig
    from vec_vad_tpu.data.video_index import VideoIndex
    from vec_vad_tpu.fore.detector import compute_foreground_bboxes

    class Stub:
        def __init__(self):
            self.batch_calls = 0
            self.single_calls = 0
            self.batch_sizes = []

        def detect_many(self, frames):
            self.batch_calls += 1
            self.batch_sizes.append(len(frames))
            return [(np.array([[1.0, 1.0, 30.0, 40.0]]), np.array([0.9]),
                     np.array([0])) for _ in range(len(frames))]

        def __call__(self, img):
            self.single_calls += 1
            return np.zeros((0, 4)), np.zeros(0)

    import dataclasses

    cfg = PipelineConfig(dataset_name="UCSDped2")
    cfg = dataclasses.replace(
        cfg, fore=dataclasses.replace(cfg.fore, extraction_mode="obj_det"))
    index = VideoIndex(["v0"], np.array([10]))
    frames = np.zeros((10, 48, 64, 3), np.uint8)
    stub = Stub()
    boxes = compute_foreground_bboxes(
        cfg, DATASETS["UCSDped2"], index, frames=frames, detector=stub,
        detector_batch=4)
    assert stub.batch_calls == 3 and stub.single_calls == 0
    # the tail (10 % 4 = 2 frames) pads to the full compiled batch shape
    # by repeating the last frame; its extra outputs are discarded
    assert stub.batch_sizes == [4, 4, 4]
    assert len(boxes) == 10 and all(b.shape == (1, 4) for b in boxes)
