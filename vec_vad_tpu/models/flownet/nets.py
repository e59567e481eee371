"""FlowNet2 component networks in flax (NHWC).

Architectures match the reference exactly — FlowNetC
(components/FlowNetC.py:10-132), FlowNetS (FlowNetS.py:11-96), FlowNetSD
(FlowNetSD.py:9-103), FlowNetFusion (FlowNetFusion.py:9-64) — with
submodule names chosen to mirror the torch checkpoint keys so the weight
converter is a mechanical relayout.

Blocks (components/misc.py:8-44): conv = Conv2d(pad (k-1)//2) [+BN]
+LeakyReLU(0.1); deconv = ConvTranspose2d(k4, s2, p1)+LeakyReLU;
predict_flow = 3x3 conv -> 2ch. Init: xavier_uniform weights, U(0, 1)
biases (the reference's torch-0.3-era nn_init.uniform default,
FlowNetC.py:64-73).

All nets return the 5-scale flow pyramid (flow2..flow6; Fusion returns
flow0) — callers take [0] for inference, all for multi-scale training
losses.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vec_vad_tpu.models.flownet.ops import correlation
from vec_vad_tpu.models.layers import BatchNorm


def _xavier_uniform(key, shape, dtype=jnp.float32):
    # HWIO: fan_in = kh*kw*I, fan_out = kh*kw*O
    kh, kw, i, o = shape
    bound = float(np.sqrt(6.0 / (kh * kw * (i + o))))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _xavier_uniform_convT(key, shape, dtype=jnp.float32):
    # torch ConvTranspose weight (I, O, kh, kw): xavier fan uses dims 0, 1
    kh, kw, i, o = shape
    bound = float(np.sqrt(6.0 / (kh * kw * (i + o))))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _unit_uniform(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, 0.0, 1.0)


def bilinear_deconv_kernel(kh: int, kw: int, in_ch: int, out_ch: int):
    """Bilinear-upsampling initialization for transposed-conv kernels
    (capability parity with init_deconv_bilinear, components/misc.py:65-78):
    channel i -> i carries the separable bilinear tent filter, cross
    channels zero. Returns an HWIO (kh, kw, in, out) array."""
    f = np.ceil(kw / 2.0)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    xs = np.arange(kw) / f
    ys = np.arange(kh) / f
    tent = (1 - np.abs(ys - c))[:, None] * (1 - np.abs(xs - c))[None, :]
    k = np.zeros((kh, kw, in_ch, out_ch), np.float32)
    for i in range(min(in_ch, out_ch)):
        k[:, :, i, i] = tent
    return jnp.asarray(k)


class TorchConv(nn.Module):
    """Conv2d with 'same'-style (k-1)//2 padding, torch-flownet init."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel", _xavier_uniform, (k, k, x.shape[-1], self.features)
        )
        p = (k - 1) // 2
        y = jax.lax.conv_general_dilated(
            x, kernel, (self.stride, self.stride), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", _unit_uniform, (self.features,))
        return y


class TorchConvT4x2(nn.Module):
    """ConvTranspose2d(k=4, s=2, p=1): exact torch placement via
    lhs-dilated conv with flipped kernel."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", _xavier_uniform_convT, (4, 4, x.shape[-1], self.features)
        )
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=(0, 1)),
            window_strides=(1, 1),
            padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", _unit_uniform, (self.features,))
        return y


class ConvBlock(nn.Module):
    """conv(+BN)+LeakyReLU(0.1) (components/misc.py:8-28)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    with_bn: bool = False
    with_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(self.features, self.kernel_size, self.stride, name="conv")(x)
        if self.with_bn:
            x = BatchNorm(name="bn")(x, use_running_average=not train)
        if self.with_relu:
            x = nn.leaky_relu(x, 0.1)
        return x


class Deconv(nn.Module):
    """deconv: ConvT(k4, s2, p1)+LeakyReLU (components/misc.py:31-39)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.leaky_relu(TorchConvT4x2(self.features, name="conv")(x), 0.1)


def _cat(*xs):
    return jnp.concatenate(xs, axis=-1)


class FlowNetC(nn.Module):
    with_bn: bool = False
    use_pallas_correlation: Optional[bool] = None
    interpret_pallas: bool = False

    def setup(self):
        bn = self.with_bn
        self.conv1 = ConvBlock(64, 7, 2, bn)
        self.conv2 = ConvBlock(128, 5, 2, bn)
        self.conv3 = ConvBlock(256, 5, 2, bn)
        self.conv_redir = ConvBlock(32, 1, 1, bn)
        self.conv3_1 = ConvBlock(256, 3, 1, bn)
        self.conv4 = ConvBlock(512, 3, 2, bn)
        self.conv4_1 = ConvBlock(512, 3, 1, bn)
        self.conv5 = ConvBlock(512, 3, 2, bn)
        self.conv5_1 = ConvBlock(512, 3, 1, bn)
        self.conv6 = ConvBlock(1024, 3, 2, bn)
        self.conv6_1 = ConvBlock(1024, 3, 1, bn)
        self.deconv5 = Deconv(512)
        self.deconv4 = Deconv(256)
        self.deconv3 = Deconv(128)
        self.deconv2 = Deconv(64)
        self.predict_flow6 = TorchConv(2, 3)
        self.predict_flow5 = TorchConv(2, 3)
        self.predict_flow4 = TorchConv(2, 3)
        self.predict_flow3 = TorchConv(2, 3)
        self.predict_flow2 = TorchConv(2, 3)
        self.upsampled_flow6_to_5 = TorchConvT4x2(2, use_bias=True)
        self.upsampled_flow5_to_4 = TorchConvT4x2(2, use_bias=True)
        self.upsampled_flow4_to_3 = TorchConvT4x2(2, use_bias=True)
        self.upsampled_flow3_to_2 = TorchConvT4x2(2, use_bias=True)

    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 6) — [img0, img1] channel-concat."""
        x1, x2 = x[..., :3], x[..., 3:]
        c1a = self.conv1(x1, train)
        c2a = self.conv2(c1a, train)
        c3a = self.conv3(c2a, train)
        c1b = self.conv1(x2, train)
        c2b = self.conv2(c1b, train)
        c3b = self.conv3(c2b, train)

        corr = correlation(
            c3a, c3b, 20, 2, self.use_pallas_correlation, self.interpret_pallas
        )
        corr = nn.leaky_relu(corr, 0.1)
        redir = self.conv_redir(c3a, train)

        c3_1 = self.conv3_1(_cat(redir, corr), train)
        c4 = self.conv4_1(self.conv4(c3_1, train), train)
        c5 = self.conv5_1(self.conv5(c4, train), train)
        c6 = self.conv6_1(self.conv6(c5, train), train)

        flow6 = self.predict_flow6(c6)
        flow6_up = self.upsampled_flow6_to_5(flow6)
        cat5 = _cat(c5, self.deconv5(c6), flow6_up)
        flow5 = self.predict_flow5(cat5)
        flow5_up = self.upsampled_flow5_to_4(flow5)
        cat4 = _cat(c4, self.deconv4(cat5), flow5_up)
        flow4 = self.predict_flow4(cat4)
        flow4_up = self.upsampled_flow4_to_3(flow4)
        cat3 = _cat(c3_1, self.deconv3(cat4), flow4_up)
        flow3 = self.predict_flow3(cat3)
        flow3_up = self.upsampled_flow3_to_2(flow3)
        cat2 = _cat(c2a, self.deconv2(cat3), flow3_up)
        flow2 = self.predict_flow2(cat2)
        return flow2, flow3, flow4, flow5, flow6


class FlowNetS(nn.Module):
    input_channels: int = 12
    with_bn: bool = False

    def setup(self):
        bn = self.with_bn
        self.conv1 = ConvBlock(64, 7, 2, bn)
        self.conv2 = ConvBlock(128, 5, 2, bn)
        self.conv3 = ConvBlock(256, 5, 2, bn)
        self.conv3_1 = ConvBlock(256, 3, 1, bn)
        self.conv4 = ConvBlock(512, 3, 2, bn)
        self.conv4_1 = ConvBlock(512, 3, 1, bn)
        self.conv5 = ConvBlock(512, 3, 2, bn)
        self.conv5_1 = ConvBlock(512, 3, 1, bn)
        self.conv6 = ConvBlock(1024, 3, 2, bn)
        self.conv6_1 = ConvBlock(1024, 3, 1, bn)
        self.deconv5 = Deconv(512)
        self.deconv4 = Deconv(256)
        self.deconv3 = Deconv(128)
        self.deconv2 = Deconv(64)
        self.predict_flow6 = TorchConv(2, 3)
        self.predict_flow5 = TorchConv(2, 3)
        self.predict_flow4 = TorchConv(2, 3)
        self.predict_flow3 = TorchConv(2, 3)
        self.predict_flow2 = TorchConv(2, 3)
        self.upsampled_flow6_to_5 = TorchConvT4x2(2, use_bias=False)
        self.upsampled_flow5_to_4 = TorchConvT4x2(2, use_bias=False)
        self.upsampled_flow4_to_3 = TorchConvT4x2(2, use_bias=False)
        self.upsampled_flow3_to_2 = TorchConvT4x2(2, use_bias=False)

    def __call__(self, x, train: bool = False):
        c1 = self.conv1(x, train)
        c2 = self.conv2(c1, train)
        c3 = self.conv3_1(self.conv3(c2, train), train)
        c4 = self.conv4_1(self.conv4(c3, train), train)
        c5 = self.conv5_1(self.conv5(c4, train), train)
        c6 = self.conv6_1(self.conv6(c5, train), train)

        flow6 = self.predict_flow6(c6)
        cat5 = _cat(c5, self.deconv5(c6), self.upsampled_flow6_to_5(flow6))
        flow5 = self.predict_flow5(cat5)
        cat4 = _cat(c4, self.deconv4(cat5), self.upsampled_flow5_to_4(flow5))
        flow4 = self.predict_flow4(cat4)
        cat3 = _cat(c3, self.deconv3(cat4), self.upsampled_flow4_to_3(flow4))
        flow3 = self.predict_flow3(cat3)
        cat2 = _cat(c2, self.deconv2(cat3), self.upsampled_flow3_to_2(flow3))
        flow2 = self.predict_flow2(cat2)
        return flow2, flow3, flow4, flow5, flow6


class FlowNetSD(nn.Module):
    with_bn: bool = False

    def setup(self):
        bn = self.with_bn
        self.conv0 = ConvBlock(64, 3, 1, bn)
        self.conv1 = ConvBlock(64, 3, 2, bn)
        self.conv1_1 = ConvBlock(128, 3, 1, bn)
        self.conv2 = ConvBlock(128, 3, 2, bn)
        self.conv2_1 = ConvBlock(128, 3, 1, bn)
        self.conv3 = ConvBlock(256, 3, 2, bn)
        self.conv3_1 = ConvBlock(256, 3, 1, bn)
        self.conv4 = ConvBlock(512, 3, 2, bn)
        self.conv4_1 = ConvBlock(512, 3, 1, bn)
        self.conv5 = ConvBlock(512, 3, 2, bn)
        self.conv5_1 = ConvBlock(512, 3, 1, bn)
        self.conv6 = ConvBlock(1024, 3, 2, bn)
        self.conv6_1 = ConvBlock(1024, 3, 1, bn)
        self.deconv5 = Deconv(512)
        self.deconv4 = Deconv(256)
        self.deconv3 = Deconv(128)
        self.deconv2 = Deconv(64)
        self.inter_conv5 = ConvBlock(512, 3, 1, bn, with_relu=False)
        self.inter_conv4 = ConvBlock(256, 3, 1, bn, with_relu=False)
        self.inter_conv3 = ConvBlock(128, 3, 1, bn, with_relu=False)
        self.inter_conv2 = ConvBlock(64, 3, 1, bn, with_relu=False)
        self.predict_flow6 = TorchConv(2, 3)
        self.predict_flow5 = TorchConv(2, 3)
        self.predict_flow4 = TorchConv(2, 3)
        self.predict_flow3 = TorchConv(2, 3)
        self.predict_flow2 = TorchConv(2, 3)
        self.upsampled_flow6_to_5 = TorchConvT4x2(2)
        self.upsampled_flow5_to_4 = TorchConvT4x2(2)
        self.upsampled_flow4_to_3 = TorchConvT4x2(2)
        self.upsampled_flow3_to_2 = TorchConvT4x2(2)

    def __call__(self, x, train: bool = False):
        c0 = self.conv0(x, train)
        c1 = self.conv1_1(self.conv1(c0, train), train)
        c2 = self.conv2_1(self.conv2(c1, train), train)
        c3 = self.conv3_1(self.conv3(c2, train), train)
        c4 = self.conv4_1(self.conv4(c3, train), train)
        c5 = self.conv5_1(self.conv5(c4, train), train)
        c6 = self.conv6_1(self.conv6(c5, train), train)

        flow6 = self.predict_flow6(c6)
        cat5 = _cat(c5, self.deconv5(c6), self.upsampled_flow6_to_5(flow6))
        flow5 = self.predict_flow5(self.inter_conv5(cat5, train))
        cat4 = _cat(c4, self.deconv4(cat5), self.upsampled_flow5_to_4(flow5))
        flow4 = self.predict_flow4(self.inter_conv4(cat4, train))
        cat3 = _cat(c3, self.deconv3(cat4), self.upsampled_flow4_to_3(flow4))
        flow3 = self.predict_flow3(self.inter_conv3(cat3, train))
        cat2 = _cat(c2, self.deconv2(cat3), self.upsampled_flow3_to_2(flow3))
        flow2 = self.predict_flow2(self.inter_conv2(cat2, train))
        return flow2, flow3, flow4, flow5, flow6


class FlowNetFusion(nn.Module):
    with_bn: bool = False

    def setup(self):
        bn = self.with_bn
        self.conv0 = ConvBlock(64, 3, 1, bn)
        self.conv1 = ConvBlock(64, 3, 2, bn)
        self.conv1_1 = ConvBlock(128, 3, 1, bn)
        self.conv2 = ConvBlock(128, 3, 2, bn)
        self.conv2_1 = ConvBlock(128, 3, 1, bn)
        self.deconv1 = Deconv(32)
        self.deconv0 = Deconv(16)
        self.inter_conv1 = ConvBlock(32, 3, 1, bn, with_relu=False)
        self.inter_conv0 = ConvBlock(16, 3, 1, bn, with_relu=False)
        self.predict_flow2 = TorchConv(2, 3)
        self.predict_flow1 = TorchConv(2, 3)
        self.predict_flow0 = TorchConv(2, 3)
        self.upsampled_flow2_to_1 = TorchConvT4x2(2)
        self.upsampled_flow1_to_0 = TorchConvT4x2(2)

    def __call__(self, x, train: bool = False):
        c0 = self.conv0(x, train)
        c1 = self.conv1_1(self.conv1(c0, train), train)
        c2 = self.conv2_1(self.conv2(c1, train), train)

        flow2 = self.predict_flow2(c2)
        cat1 = _cat(c1, self.deconv1(c2), self.upsampled_flow2_to_1(flow2))
        flow1 = self.predict_flow1(self.inter_conv1(cat1, train))
        cat0 = _cat(c0, self.deconv0(cat1), self.upsampled_flow1_to_0(flow1))
        flow0 = self.predict_flow0(self.inter_conv0(cat0, train))
        return flow0
