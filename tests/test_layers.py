"""Numerics parity: flax layers vs torch CPU (the reference's runtime).

These tests transplant identical weights into both implementations and
require near-bit-exact agreement, since AUROC parity with the published
results rides on layer semantics (conv padding, transposed-conv placement,
BN running-stat updates)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vec_vad_tpu.models.layers import (  # noqa: E402
    BatchNorm,
    Conv,
    ConvTranspose2x,
    DoubleConv,
    UNet,
    max_pool_2x,
)


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def test_conv_matches_torch(rng):
    x = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    m = Conv(7)
    params = m.init(jax.random.key(0), x)
    y = np.asarray(m.apply(params, x))

    w = np.asarray(params["params"]["kernel"])  # (3,3,5,7)
    b = np.asarray(params["params"]["bias"])
    yt = F.conv2d(
        torch.from_numpy(nchw(x)),
        torch.from_numpy(np.transpose(w, (3, 2, 0, 1))),  # OIHW
        torch.from_numpy(b),
        padding=1,
    ).numpy()
    np.testing.assert_allclose(y, nhwc(yt), atol=1e-5)


def test_conv_init_bounds(rng):
    x = np.zeros((1, 4, 4, 16), np.float32)
    m = Conv(64)
    params = m.init(jax.random.key(1), x)
    w = np.asarray(params["params"]["kernel"])
    bound = 1.0 / np.sqrt(3 * 3 * 16)
    assert np.abs(w).max() <= bound
    assert np.abs(w).max() > 0.9 * bound  # actually fills the range
    b = np.asarray(params["params"]["bias"])
    assert np.abs(b).max() <= bound


def test_conv_transpose_matches_torch(rng):
    x = rng.normal(size=(2, 6, 6, 4)).astype(np.float32)
    m = ConvTranspose2x(3)
    params = m.init(jax.random.key(0), x)
    y = np.asarray(m.apply(params, x))
    assert y.shape == (2, 12, 12, 3)

    w = np.asarray(params["params"]["kernel"])  # (3,3,in,out)
    b = np.asarray(params["params"]["bias"])
    yt = F.conv_transpose2d(
        torch.from_numpy(nchw(x)),
        torch.from_numpy(np.transpose(w, (2, 3, 0, 1))),  # (in, out, kh, kw)
        torch.from_numpy(b),
        stride=2,
        padding=1,
        output_padding=1,
    ).numpy()
    np.testing.assert_allclose(y, nhwc(yt), atol=1e-5)


def test_max_pool_matches_torch(rng):
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    y = np.asarray(max_pool_2x(x))
    yt = F.max_pool2d(torch.from_numpy(nchw(x)), 2).numpy()
    np.testing.assert_allclose(y, nhwc(yt))


def test_batchnorm_matches_torch(rng):
    x_batches = [rng.normal(size=(4, 6, 6, 5)).astype(np.float32) * (i + 1) for i in range(3)]
    m = BatchNorm()
    variables = m.init(jax.random.key(0), x_batches[0], use_running_average=False)
    bn_t = torch.nn.BatchNorm2d(5)
    bn_t.train()

    state = variables
    for xb in x_batches:
        y, mutated = m.apply(
            state, xb, use_running_average=False, mutable=["batch_stats"]
        )
        state = {"params": state["params"], "batch_stats": mutated["batch_stats"]}
        yt = bn_t(torch.from_numpy(nchw(xb))).detach().numpy()
        np.testing.assert_allclose(np.asarray(y), nhwc(yt), atol=1e-4)

    # Running stats must match torch's (unbiased-var, momentum 0.1) exactly.
    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["mean"]),
        bn_t.running_mean.numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["var"]),
        bn_t.running_var.numpy(),
        rtol=1e-5,
    )

    # Eval mode uses the running stats.
    bn_t.eval()
    xe = x_batches[0]
    ye = np.asarray(m.apply(state, xe, use_running_average=True))
    yte = bn_t(torch.from_numpy(nchw(xe))).detach().numpy()
    np.testing.assert_allclose(ye, nhwc(yte), atol=1e-4)


# ---------------------------------------------------------------------------
# Full UNet parity with a torch oracle
# ---------------------------------------------------------------------------


class TorchDoubleConv(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.seq = torch.nn.Sequential(
            torch.nn.Conv2d(cin, cout, 3, padding=1),
            torch.nn.BatchNorm2d(cout),
            torch.nn.ReLU(),
            torch.nn.Conv2d(cout, cout, 3, padding=1),
            torch.nn.BatchNorm2d(cout),
            torch.nn.ReLU(),
        )

    def forward(self, x):
        return self.seq(x)


class TorchUNet(torch.nn.Module):
    """Oracle with the reference UNet's exact topology (depth 4, convT ups,
    skip concats ordered [skip, up])."""

    def __init__(self, cin, f, cout):
        super().__init__()
        self.inc = TorchDoubleConv(cin, f)
        self.d1 = TorchDoubleConv(f, 2 * f)
        self.d2 = TorchDoubleConv(2 * f, 4 * f)
        self.d3 = TorchDoubleConv(4 * f, 8 * f)
        self.u1 = torch.nn.ConvTranspose2d(8 * f, 4 * f, 3, 2, 1, output_padding=1)
        self.uc1 = TorchDoubleConv(8 * f, 4 * f)
        self.u2 = torch.nn.ConvTranspose2d(4 * f, 2 * f, 3, 2, 1, output_padding=1)
        self.uc2 = TorchDoubleConv(4 * f, 2 * f)
        self.u3 = torch.nn.ConvTranspose2d(2 * f, f, 3, 2, 1, output_padding=1)
        self.uc3 = TorchDoubleConv(2 * f, f)
        self.outc = torch.nn.Conv2d(f, cout, 1)

    def forward(self, x):
        x1 = self.inc(x)
        x2 = self.d1(F.max_pool2d(x1, 2))
        x3 = self.d2(F.max_pool2d(x2, 2))
        x4 = self.d3(F.max_pool2d(x3, 2))
        y = self.uc1(torch.cat([x3, self.u1(x4)], dim=1))
        y = self.uc2(torch.cat([x2, self.u2(y)], dim=1))
        y = self.uc3(torch.cat([x1, self.u3(y)], dim=1))
        return self.outc(y)


def _copy_double_conv(params, tdc):
    """Copy flax DoubleConv params into a TorchDoubleConv."""
    with torch.no_grad():
        for ci, bi, cname, bname in [(0, 1, "Conv_0", "BatchNorm_0"), (3, 4, "Conv_1", "BatchNorm_1")]:
            w = np.asarray(params[cname]["kernel"])
            tdc.seq[ci].weight.copy_(torch.from_numpy(np.transpose(w, (3, 2, 0, 1))))
            tdc.seq[ci].bias.copy_(torch.from_numpy(np.asarray(params[cname]["bias"])))
            tdc.seq[bi].weight.copy_(torch.from_numpy(np.asarray(params[bname]["scale"])))
            tdc.seq[bi].bias.copy_(torch.from_numpy(np.asarray(params[bname]["bias"])))


def test_unet_forward_matches_torch(rng):
    f, cin, cout = 8, 12, 3
    x = rng.normal(size=(2, 32, 32, cin)).astype(np.float32)
    m = UNet(features_root=f, out_channels=cout)
    variables = m.init(jax.random.key(0), x, False)
    p = variables["params"]

    t = TorchUNet(cin, f, cout)
    for flax_name, tmod in [
        ("DoubleConv_0", t.inc), ("DoubleConv_1", t.d1), ("DoubleConv_2", t.d2),
        ("DoubleConv_3", t.d3), ("DoubleConv_4", t.uc1), ("DoubleConv_5", t.uc2),
        ("DoubleConv_6", t.uc3),
    ]:
        _copy_double_conv(p[flax_name], tmod)
    with torch.no_grad():
        for flax_name, tmod in [
            ("ConvTranspose2x_0", t.u1), ("ConvTranspose2x_1", t.u2), ("ConvTranspose2x_2", t.u3),
        ]:
            w = np.asarray(p[flax_name]["kernel"])  # (3,3,in,out)
            tmod.weight.copy_(torch.from_numpy(np.transpose(w, (2, 3, 0, 1))))
            tmod.bias.copy_(torch.from_numpy(np.asarray(p[flax_name]["bias"])))
        t.outc.weight.copy_(
            torch.from_numpy(np.transpose(np.asarray(p["out_kernel"]), (3, 2, 0, 1)))
        )
        t.outc.bias.copy_(torch.from_numpy(np.asarray(p["out_bias"])))

    t.eval()  # fresh BN: running stats are (0, 1) on both sides
    y = np.asarray(m.apply(variables, x, False))
    yt = t(torch.from_numpy(nchw(x))).detach().numpy()
    np.testing.assert_allclose(y, nhwc(yt), atol=2e-4)
