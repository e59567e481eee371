"""mmdet Cascade R-CNN backbone+FPN importer parity.

Oracle: handwritten torch modules that reproduce the mmdet v1 graph
(ResNet 'pytorch' style + FPN, fore_det/obj_det_config/
cascade_rcnn_r101_fpn_1x.py:6-17) with torchvision/mmdet parameter naming,
randomly initialized INCLUDING random BN running statistics. The real COCO
checkpoint cannot be downloaded here, but conversion correctness is purely
structural: if every tensor lands on the right edge of the graph for a
random state-dict, it lands right for the released one too.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

import jax.numpy as jnp

from vec_vad_tpu.fore.mmdet_import import (
    RESNET_STAGES,
    BackboneFPN,
    convert_backbone_fpn,
    strip_checkpoint,
)


class TBottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, project=False):
        super().__init__()
        out = planes * 4
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.downsample = tnn.Sequential(
            tnn.Conv2d(inplanes, out, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(out),
        ) if project else None

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        sc = x if self.downsample is None else self.downsample(x)
        return F.relu(h + sc)


class TResNet(tnn.Module):
    def __init__(self, depth):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        inplanes, planes = 64, 64
        for stage, n in enumerate(RESNET_STAGES[depth]):
            blocks = []
            for b in range(n):
                blocks.append(TBottleneck(
                    inplanes if b == 0 else planes * 4, planes,
                    stride=(2 if stage > 0 and b == 0 else 1),
                    project=(b == 0)))
            setattr(self, f"layer{stage + 1}", tnn.Sequential(*blocks))
            inplanes, planes = planes * 4, planes * 2

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.max_pool2d(h, 3, stride=2, padding=1)
        outs = []
        for i in range(1, 5):
            h = getattr(self, f"layer{i}")(h)
            outs.append(h)
        return outs


class TConvHolder(tnn.Module):
    """mmdet ConvModule stores the conv as `.conv`."""

    def __init__(self, cin, cout, k):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, padding=k // 2, bias=True)


class TFPN(tnn.Module):
    def __init__(self, in_channels, out_channels=256, num_outs=5):
        super().__init__()
        self.num_outs = num_outs
        self.lateral_convs = tnn.ModuleList(
            [TConvHolder(c, out_channels, 1) for c in in_channels])
        self.fpn_convs = tnn.ModuleList(
            [TConvHolder(out_channels, out_channels, 3) for _ in in_channels])

    def forward(self, feats):
        lat = [m.conv(f) for m, f in zip(self.lateral_convs, feats)]
        for i in range(len(lat) - 1, 0, -1):
            lat[i - 1] = lat[i - 1] + F.interpolate(
                lat[i], scale_factor=2, mode="nearest")
        outs = [m.conv(x) for m, x in zip(self.fpn_convs, lat)]
        for _ in range(self.num_outs - len(outs)):
            outs.append(F.max_pool2d(outs[-1], 1, stride=2))
        return outs


class TBackboneFPN(tnn.Module):
    def __init__(self, depth):
        super().__init__()
        self.backbone = TResNet(depth)
        self.neck = TFPN([256, 512, 1024, 2048])

    def forward(self, x):
        return self.neck(self.backbone(x))


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.uniform_(-0.3, 0.3, generator=g)
                m.running_mean.uniform_(-0.5, 0.5, generator=g)
                m.running_var.uniform_(0.3, 2.0, generator=g)
            elif isinstance(m, tnn.Conv2d):
                # fan-in scaling keeps activations O(1) through 100+
                # layers so f32 reassociation noise stays absolute-small
                fan_in = m.in_channels * m.kernel_size[0] * m.kernel_size[1]
                m.weight.normal_(0.0, 1.0 / fan_in ** 0.5, generator=g)
                if m.bias is not None:
                    m.bias.uniform_(-0.1, 0.1, generator=g)
    model.eval()
    return model


@pytest.mark.parametrize("depth,hw", [(50, (64, 96)), (101, (32, 32))])
def test_forward_parity(depth, hw):
    torch_net = _randomize(TBackboneFPN(depth), seed=depth)
    x = torch.randn(2, 3, *hw, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref = [o.numpy() for o in torch_net(x)]

    variables = convert_backbone_fpn(torch_net.state_dict(), depth=depth)
    net = BackboneFPN(depth=depth)
    outs = net.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert len(outs) == 5
    for o, r in zip(outs, ref):
        scale = float(np.abs(r).max())
        np.testing.assert_allclose(
            np.asarray(o).transpose(0, 3, 1, 2), r,
            rtol=1e-3, atol=1e-5 * max(scale, 1.0))


def test_param_count_r101():
    torch_net = TBackboneFPN(101)
    n_torch = sum(p.numel() for p in torch_net.parameters()) + sum(
        b.numel() for name, b in torch_net.named_buffers()
        if "num_batches_tracked" not in name)
    variables = convert_backbone_fpn(torch_net.state_dict(), depth=101)
    n_flax = sum(int(np.prod(np.shape(v))) for v in
                 __import__("jax").tree_util.tree_leaves(variables))
    assert n_flax == n_torch
    # torchvision resnet101 minus its fc head = 42.5M; FPN neck ~3.3M
    assert n_torch > 45_000_000


def test_checkpoint_forms():
    torch_net = _randomize(TBackboneFPN(50), seed=3)
    sd = torch_net.state_dict()
    base = convert_backbone_fpn(sd, depth=50)
    wrapped = {"state_dict": {"module." + k: v for k, v in sd.items()},
               "meta": {"epoch": 12}}
    again = convert_backbone_fpn(wrapped, depth=50)
    flat_a = __import__("jax").tree_util.tree_leaves(base)
    flat_b = __import__("jax").tree_util.tree_leaves(again)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b)
    assert "backbone.conv1.weight" in strip_checkpoint(wrapped)
