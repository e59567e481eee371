"""NN building blocks with exact torch-numerics parity.

The completion networks' published AUROC depends on torch's default layer
semantics, so these blocks replicate them precisely (verified against torch
CPU in tests/test_layers.py):

  * Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)),
    bias U(±1/sqrt(fan_in))
  * BatchNorm2d: eps 1e-5, momentum 0.1 torch-style (running = 0.9*old +
    0.1*new), batch stats biased for normalization but UNBIASED into the
    running variance
  * ConvTranspose2d(k=3, s=2, p=1, output_padding=1): exact output placement

Everything is NHWC (TPU-native layout; the reference is NCHW).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(±1/sqrt(fan_in)) for HWIO kernels — torch Conv2d's default
    kaiming_uniform(a=sqrt(5))."""
    kh, kw, in_ch, _ = shape
    bound = 1.0 / np.sqrt(kh * kw * in_ch)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_convT_kernel_init(key, shape, dtype=jnp.float32):
    """torch ConvTranspose2d default init. torch's fan_in for a transposed
    conv weight (in, out, kh, kw) is dim-1 x receptive field = out*kh*kw,
    so the bound is 1/sqrt(kh*kw*out_ch)."""
    kh, kw, _, out_ch = shape
    bound = 1.0 / np.sqrt(kh * kw * out_ch)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _uniform_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """3x3/1x1 'same' conv, NHWC, torch-default init."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", torch_conv_kernel_init, (kh, kw, in_ch, self.features)
        )
        bias = self.param("bias", _uniform_bias_init(kh * kw * in_ch), (self.features,))
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1, 1),
            padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias


class ConvTranspose2x(nn.Module):
    """torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1): doubles the
    spatial size (model/unet.py:54). Expressed as a fractionally-strided
    conv: lhs_dilation 2, padding (1, 2), spatially-flipped kernel."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", torch_convT_kernel_init, (3, 3, in_ch, self.features)
        )
        bias = self.param("bias", _uniform_bias_init(9 * self.features), (self.features,))
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=(0, 1)),
            window_strides=(1, 1),
            padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias


class BatchNorm(nn.Module):
    """BatchNorm2d with torch-exact running-stat semantics.

    batch_weight (optional, (B,) 0/1): compute batch statistics over the
    weighted rows only. The trainer wrap-pads partial batches to a fixed
    shape (parallel/mesh.py); passing the pad mask here makes the batch
    statistics equal torch's bare-partial-batch statistics exactly — the
    reference trains its final batch unpadded (train.py:383-402)."""

    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool, batch_weight=None):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            if batch_weight is None:
                n = float(np.prod([x.shape[a] for a in reduce_axes]))
                mean = jnp.mean(x, axis=reduce_axes)
                var = jnp.mean(jnp.square(x - mean), axis=reduce_axes)
                unbias = n / max(n - 1.0, 1.0)
            else:
                w = batch_weight.reshape(
                    (x.shape[0],) + (1,) * (x.ndim - 1)
                ).astype(x.dtype)
                per_row = float(np.prod(x.shape[1:-1]))  # H*W
                n = jnp.maximum(jnp.sum(batch_weight) * per_row, 1.0)
                n_x = n.astype(x.dtype)  # keep stats in the compute dtype
                mean = jnp.sum(x * w, axis=reduce_axes) / n_x
                var = jnp.sum(w * jnp.square(x - mean), axis=reduce_axes) / n_x
                unbias = n / jnp.maximum(n - 1.0, 1.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * (var * unbias)
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * scale + bias


class DoubleConv(nn.Module):
    """(conv3x3 -> BN -> ReLU) x 2 (model/unet.py:4-20)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool, batch_weight=None):
        x = Conv(self.features)(x)
        x = BatchNorm()(x, not train, batch_weight)
        x = nn.relu(x)
        x = Conv(self.features)(x)
        x = BatchNorm()(x, not train, batch_weight)
        x = nn.relu(x)
        return x


def max_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool2d(kernel_size=2) (model/unet.py:38)."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class UNet(nn.Module):
    """Depth-4 completion UNet (model/unet.py:73-267 single-member shape):
    inconv -> 3x(maxpool+double_conv) -> 3x(convT-up + skip concat +
    double_conv) -> 1x1 outconv. Channels: f, 2f, 4f, 8f with f=features_root.
    """

    features_root: int
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool, batch_weight=None):
        f = self.features_root
        w = batch_weight
        x1 = DoubleConv(f)(x, train, w)
        x2 = DoubleConv(2 * f)(max_pool_2x(x1), train, w)
        x3 = DoubleConv(4 * f)(max_pool_2x(x2), train, w)
        x4 = DoubleConv(8 * f)(max_pool_2x(x3), train, w)

        y = ConvTranspose2x(4 * f)(x4)
        y = DoubleConv(4 * f)(jnp.concatenate([x3, y], axis=-1), train, w)
        y = ConvTranspose2x(2 * f)(y)
        y = DoubleConv(2 * f)(jnp.concatenate([x2, y], axis=-1), train, w)
        y = ConvTranspose2x(f)(y)
        y = DoubleConv(f)(jnp.concatenate([x1, y], axis=-1), train, w)

        in_ch = y.shape[-1]
        kernel = self.param(
            "out_kernel", torch_conv_kernel_init, (1, 1, in_ch, self.out_channels)
        )
        bias = self.param("out_bias", _uniform_bias_init(in_ch), (self.out_channels,))
        return (
            jax.lax.conv_general_dilated(
                y, kernel, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + bias
        )
