"""mmdet Cascade R-CNN checkpoint interop: R101 backbone + FPN neck.

The reference's appearance detector is an mmdet CascadeRCNN with a
torchvision-pretrained ResNet-101 backbone and a 5-level FPN neck
(fore_det/inference.py:51-81 loads the checkpoint;
fore_det/obj_det_config/cascade_rcnn_r101_fpn_1x.py:1-27 defines the
graph). COCO weights cannot be downloaded in this environment, so the
repo's own trainable detector (fore/cascade_detector.py) is the same
architecture *class* with its own graph — but a user holding the real
`cascade_rcnn_r101_fpn_1x` checkpoint could not use it. This module closes
that gap structurally: flax modules whose computation matches the mmdet
graph exactly (verified against handwritten torch oracles in
tests/test_mmdet_import.py) plus a state-dict converter keyed on the
mmdet checkpoint's own parameter names.

Semantics replicated (all load-bearing for numerical parity):

  * "pytorch-style" ResNet (mmdet `style='pytorch'`): the stride-2 conv in
    a bottleneck is the 3x3 `conv2`, not `conv1` (caffe style differs).
  * Inference-mode BatchNorm: mmdet freezes BN at test time — normalization
    uses the checkpoint's running statistics, so BN here is the affine map
    (x - mean) / sqrt(var + eps) * weight + bias with eps 1e-5.
  * Stem max-pool: torch MaxPool2d(3, stride=2, padding=1) pads with -inf.
  * FPN (mmdet v1): 1x1 lateral convs WITH bias and no norm/act, top-down
    nearest-neighbour x2 upsample-and-add, 3x3 smoothing convs, and —
    because num_outs=5 exceeds the 4 input levels with add_extra_convs
    off — P6 = max_pool(P5, kernel 1, stride 2).

Everything is NHWC (TPU layout); the converter transposes the checkpoint's
OIHW kernels to HWIO.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# block counts per stage for the torchvision ResNet depths mmdet supports
RESNET_STAGES: Dict[int, Tuple[int, ...]] = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}
BOTTLENECK_EXPANSION = 4


class FrozenBatchNorm(nn.Module):
    """BatchNorm evaluated with stored running statistics (mmdet freezes
    backbone BN; inference always runs in eval mode). Parameters live in
    the regular 'params' collection so the converter can fill them and
    jit treats them like any other weight."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


def _max_pool_torch(x, window: int, stride: int, padding: int):
    """torch MaxPool2d semantics: -inf padding (so border maxima are real
    values, never zeros)."""
    neg = jnp.asarray(-jnp.inf, x.dtype)
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


class _Conv(nn.Module):
    """Plain conv with torch-compatible SAME-by-explicit padding."""

    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=self.use_bias, name="conv",
        )(x)


class Bottleneck(nn.Module):
    """torchvision Bottleneck, pytorch style: 1x1 -> 3x3(stride) -> 1x1,
    identity (or 1x1-conv downsample) residual, ReLU after the add."""

    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * BOTTLENECK_EXPANSION
        h = _Conv(self.planes, 1, name="conv1")(x)
        h = FrozenBatchNorm(self.planes, name="bn1")(h)
        h = nn.relu(h)
        h = _Conv(self.planes, 3, stride=self.stride, name="conv2")(h)
        h = FrozenBatchNorm(self.planes, name="bn2")(h)
        h = nn.relu(h)
        h = _Conv(out_ch, 1, name="conv3")(h)
        h = FrozenBatchNorm(out_ch, name="bn3")(h)
        if self.has_downsample:
            sc = _Conv(out_ch, 1, stride=self.stride, name="down_conv")(x)
            sc = FrozenBatchNorm(out_ch, name="down_bn")(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class ResNetBackbone(nn.Module):
    """torchvision-layout ResNet trunk returning C2..C5 (strides 4/8/16/32)
    — mmdet ResNet(depth, out_indices=(0,1,2,3), style='pytorch')."""

    depth: int = 101

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        counts = RESNET_STAGES[self.depth]
        h = nn.Conv(64, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False, name="conv1")(x)
        h = FrozenBatchNorm(64, name="bn1")(h)
        h = nn.relu(h)
        h = _max_pool_torch(h, 3, 2, 1)
        outs = []
        planes = 64
        for stage, n_blocks in enumerate(counts):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                h = Bottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    # first block always re-projects: channel count changes
                    # (64 -> 256 in stage 0, 2x elsewhere) even when stride=1
                    has_downsample=(b == 0),
                    name=f"layer{stage + 1}_{b}",
                )(h)
            outs.append(h)
            planes *= 2
        return outs


class FPNNeck(nn.Module):
    """mmdet v1 FPN: laterals -> top-down nearest add -> 3x3 smooth ->
    extra stride-2 max-pool levels up to num_outs."""

    out_channels: int = 256
    num_outs: int = 5

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        n_in = len(feats)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), use_bias=True,
                    name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in range(n_in - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(laterals[i], 2, axis=1), 2, axis=2)
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3),
                    padding=[(1, 1), (1, 1)], use_bias=True,
                    name=f"fpn{i}")(lat)
            for i, lat in enumerate(laterals)
        ]
        for _ in range(self.num_outs - n_in):
            outs.append(_max_pool_torch(outs[-1], 1, 2, 0))
        return outs


class BackboneFPN(nn.Module):
    """backbone + neck of cascade_rcnn_r101_fpn_1x (config :6-17): the
    feature extractor every head (RPN + 3 cascade stages) consumes."""

    depth: int = 101
    out_channels: int = 256
    num_outs: int = 5

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = ResNetBackbone(self.depth, name="backbone")(x)
        return FPNNeck(self.out_channels, self.num_outs, name="neck")(feats)


# ---------------------------------------------------------------------------
# state-dict conversion
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    """Accept torch tensors or arrays without importing torch here."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv_hwio(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _bn_params(sd, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[prefix + ".weight"]),
        "bias": _np(sd[prefix + ".bias"]),
        "mean": _np(sd[prefix + ".running_mean"]),
        "var": _np(sd[prefix + ".running_var"]),
    }


def strip_checkpoint(ckpt) -> Dict[str, np.ndarray]:
    """Accept an mmdet checkpoint in any of its shipped forms: the raw
    state_dict, {'state_dict': ...} (mmcv save_checkpoint), or keys wrapped
    with a DataParallel 'module.' prefix (fore_det/inference.py loads with
    map_location then feeds the model directly)."""
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v
    return out


def convert_backbone_fpn(
    ckpt, depth: int = 101, num_fpn_inputs: int = 4
) -> Dict:
    """mmdet cascade_rcnn_*_fpn state_dict -> BackboneFPN flax variables.

    Key map (mmdet v1 checkpoint naming):
      backbone.conv1/bn1                         -> backbone stem
      backbone.layer{L}.{B}.conv{1,2,3}/bn{1,2,3}-> Bottleneck blocks
      backbone.layer{L}.{B}.downsample.{0,1}     -> residual projection
      neck.lateral_convs.{i}.conv                -> FPN laterals
      neck.fpn_convs.{i}.conv                    -> FPN 3x3 smoothing
    """
    sd = strip_checkpoint(ckpt)
    bb: Dict[str, Dict] = {
        "conv1": {"kernel": _conv_hwio(sd["backbone.conv1.weight"])},
        "bn1": _bn_params(sd, "backbone.bn1"),
    }
    for stage, n_blocks in enumerate(RESNET_STAGES[depth]):
        for b in range(n_blocks):
            src = f"backbone.layer{stage + 1}.{b}"
            blk: Dict[str, Dict] = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = {
                    "conv": {"kernel": _conv_hwio(sd[f"{src}.conv{ci}.weight"])}
                }
                blk[f"bn{ci}"] = _bn_params(sd, f"{src}.bn{ci}")
            if f"{src}.downsample.0.weight" in sd:
                blk["down_conv"] = {
                    "conv": {"kernel": _conv_hwio(sd[f"{src}.downsample.0.weight"])}
                }
                blk["down_bn"] = _bn_params(sd, f"{src}.downsample.1")
            bb[f"layer{stage + 1}_{b}"] = blk
    neck: Dict[str, Dict] = {}
    for i in range(num_fpn_inputs):
        neck[f"lateral{i}"] = {
            "kernel": _conv_hwio(sd[f"neck.lateral_convs.{i}.conv.weight"]),
            "bias": _np(sd[f"neck.lateral_convs.{i}.conv.bias"]),
        }
        neck[f"fpn{i}"] = {
            "kernel": _conv_hwio(sd[f"neck.fpn_convs.{i}.conv.weight"]),
            "bias": _np(sd[f"neck.fpn_convs.{i}.conv.bias"]),
        }
    return {"params": {"backbone": bb, "neck": neck}}


def load_backbone_fpn(path: str, depth: int = 101):
    """Load a real mmdet checkpoint file -> (BackboneFPN, variables).

    torch.load handles the zipfile/pickle container the mmdet model zoo
    ships (fore_det/inference.py:51-81 does the torch-side equivalent)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    net = BackboneFPN(depth=depth)
    return net, jax.tree_util.tree_map(
        jnp.asarray, convert_backbone_fpn(ckpt, depth=depth)
    )


def infer_depth(sd: Dict) -> int:
    """ResNet depth from a stripped state-dict: the stage-3 block count is
    unique per depth (6 -> 50, 23 -> 101, 36 -> 152)."""
    n3 = 1 + max(int(k.split(".")[2]) for k in sd
                 if k.startswith("backbone.layer3."))
    for depth, counts in RESNET_STAGES.items():
        if counts[2] == n3:
            return depth
    raise ValueError(f"unrecognized backbone: layer3 has {n3} blocks")
