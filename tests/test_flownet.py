"""FlowNet2 family: op parity vs oracles, parameter-count parity vs the
reference architectures, and forward parity vs a torch oracle through the
checkpoint converter."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vec_vad_tpu.models.flownet import (  # noqa: E402
    FlowNet2,
    FlowNetC,
    FlowNetFusion,
    FlowNetS,
    FlowNetSD,
    channel_norm,
    convert_params,
    correlation_pallas,
    correlation_ref,
    torch_state_dict_to_numpy,
    upsample_bilinear,
    upsample_nearest,
    warp_bilinear,
)

# reference parameter counts at with_bn=False (verified by instantiating
# the reference modules: FlowNetC.py:7 etc.)
REF_PARAM_COUNTS = {
    "C": 39_175_298,
    "S12": 38_695_322,
    "SD": 45_371_666,
    "Fusion": 581_226,
}


def _count(params):
    return sum(int(p.size) for p in jax.tree.leaves(params))


def test_param_count_parity():
    key = jax.random.key(0)
    x6 = jnp.zeros((1, 64, 64, 6))
    x12 = jnp.zeros((1, 64, 64, 12))
    x11 = jnp.zeros((1, 64, 64, 11))
    assert _count(FlowNetC().init(key, x6)["params"]) == REF_PARAM_COUNTS["C"]
    assert _count(FlowNetS(12).init(key, x12)["params"]) == REF_PARAM_COUNTS["S12"]
    assert _count(FlowNetSD().init(key, x6)["params"]) == REF_PARAM_COUNTS["SD"]
    assert (
        _count(FlowNetFusion().init(key, x11)["params"])
        == REF_PARAM_COUNTS["Fusion"]
    )


def test_correlation_vs_oracle(rng):
    a = rng.normal(size=(2, 8, 10, 4)).astype(np.float32)
    b = rng.normal(size=(2, 8, 10, 4)).astype(np.float32)
    md, st = 4, 2
    got = np.asarray(correlation_ref(a, b, md, st))
    n = 2 * md // st + 1
    bp = np.pad(b, ((0, 0), (md, md), (md, md), (0, 0)))
    oracle = np.zeros((2, 8, 10, n * n), np.float32)
    for i, dy in enumerate(range(-md, md + 1, st)):
        for j, dx in enumerate(range(-md, md + 1, st)):
            oracle[..., i * n + j] = (
                a * bp[:, md + dy : md + dy + 8, md + dx : md + dx + 10]
            ).sum(-1) / 4
    np.testing.assert_allclose(got, oracle, atol=1e-6)

    pal = np.asarray(
        correlation_pallas(
            jnp.asarray(a), jnp.asarray(b), md, st, tile_h=4, interpret=True
        )
    )
    np.testing.assert_allclose(pal, got, atol=1e-6)


def test_correlation_backward_variants(rng):
    """Analytic jnp backward and the Pallas backward kernels both equal
    autodiff of the reference formulation (the CUDA backward kernels'
    contract, correlation_cuda_kernel.cu:108-290)."""
    from vec_vad_tpu.models.flownet.ops import (
        correlation,
        correlation_bwd_pallas,
        correlation_bwd_ref,
    )

    a = rng.normal(size=(2, 8, 10, 4)).astype(np.float32)
    b = rng.normal(size=(2, 8, 10, 4)).astype(np.float32)
    md, st = 4, 2
    n = 2 * md // st + 1
    g = rng.normal(size=(2, 8, 10, n * n)).astype(np.float32)

    _, vjp = jax.vjp(lambda x, y: correlation_ref(x, y, md, st), a, b)
    want_a, want_b = (np.asarray(v) for v in vjp(jnp.asarray(g)))

    got_a, got_b = correlation_bwd_ref(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(g), md, st
    )
    np.testing.assert_allclose(np.asarray(got_a), want_a, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_b), want_b, atol=1e-5)

    pal_a, pal_b = correlation_bwd_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(g), md, st,
        tile_h=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(pal_a), want_a, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pal_b), want_b, atol=1e-5)

    # the custom_vjp op end-to-end, Pallas fwd+bwd (interpret)
    def loss(x, y):
        return jnp.sum(
            correlation(x, y, md, st, True, True) * jnp.asarray(g)
        )

    ga, gb = jax.grad(loss, argnums=(0, 1))(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(ga), want_a, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), want_b, atol=1e-5)


def test_correlation_bf16_dtype_preserving(rng):
    """bf16 inputs (the FlowNet bf16 compute option) must work through
    BOTH correlation formulations, fwd and bwd, returning bf16 with the
    channel dot accumulated in f32. Regression: the Pallas kernel used
    to declare an f32 out_ref and crash on the bf16 store ('Invalid
    dtype for swap') the first time bf16 flow serving ran on hardware."""
    from vec_vad_tpu.models.flownet.ops import correlation

    a = rng.normal(size=(1, 8, 10, 4)).astype(np.float32)
    b = rng.normal(size=(1, 8, 10, 4)).astype(np.float32)
    md, st = 4, 2
    n = 2 * md // st + 1
    g = rng.normal(size=(1, 8, 10, n * n)).astype(np.float32)

    want = np.asarray(correlation_ref(a, b, md, st))
    _, vjp = jax.vjp(lambda x, y: correlation_ref(x, y, md, st), a, b)
    want_ga, want_gb = (np.asarray(v) for v in vjp(jnp.asarray(g)))

    for pallas in (False, True):
        a16 = jnp.asarray(a, jnp.bfloat16)
        b16 = jnp.asarray(b, jnp.bfloat16)
        out = correlation(a16, b16, md, st, pallas, True)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), want, atol=0.05
        )

        def loss(x, y):
            return jnp.sum(
                (correlation(x, y, md, st, pallas, True)
                 * jnp.asarray(g, jnp.bfloat16)).astype(jnp.float32)
            )

        ga, gb = jax.grad(loss, argnums=(0, 1))(a16, b16)
        assert ga.dtype == gb.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(ga, np.float32), want_ga, atol=0.15
        )
        np.testing.assert_allclose(
            np.asarray(gb, np.float32), want_gb, atol=0.15
        )


def test_warp_matches_cuda_semantics(rng):
    img = rng.normal(size=(1, 6, 7, 3)).astype(np.float32)
    flow = rng.normal(scale=2.5, size=(1, 6, 7, 2)).astype(np.float32)
    got = np.asarray(warp_bilinear(jnp.asarray(img), jnp.asarray(flow)))
    oracle = np.zeros_like(img)
    for y in range(6):
        for x in range(7):
            xf = x + flow[0, y, x, 0]
            yf = y + flow[0, y, x, 1]
            a = xf - np.floor(xf)
            b = yf - np.floor(yf)
            xl = int(np.clip(np.floor(xf), 0, 6))
            xr = int(np.clip(np.floor(xf) + 1, 0, 6))
            yt = int(np.clip(np.floor(yf), 0, 5))
            yb = int(np.clip(np.floor(yf) + 1, 0, 5))
            oracle[0, y, x] = (
                (1 - a) * (1 - b) * img[0, yt, xl]
                + a * (1 - b) * img[0, yt, xr]
                + (1 - a) * b * img[0, yb, xl]
                + a * b * img[0, yb, xr]
            )
    np.testing.assert_allclose(got, oracle, atol=1e-6)


def _warp_oracle_cuda(img: np.ndarray, flow: np.ndarray) -> np.ndarray:
    """Literal CUDA-convention oracle (Resample2d_kernel.cu:43-62): corner
    indices clamp to the frame, blend weights keep the UNCLAMPED
    fractional parts."""
    B, H, W, _ = img.shape
    out = np.zeros_like(img)
    for bi in range(B):
        for y in range(H):
            for x in range(W):
                xf = x + flow[bi, y, x, 0]
                yf = y + flow[bi, y, x, 1]
                a = xf - np.floor(xf)
                b = yf - np.floor(yf)
                xl = int(np.clip(np.floor(xf), 0, W - 1))
                xr = int(np.clip(np.floor(xf) + 1, 0, W - 1))
                yt = int(np.clip(np.floor(yf), 0, H - 1))
                yb = int(np.clip(np.floor(yf) + 1, 0, H - 1))
                out[bi, y, x] = (
                    (1 - a) * (1 - b) * img[bi, yt, xl]
                    + a * (1 - b) * img[bi, yt, xr]
                    + (1 - a) * b * img[bi, yb, xl]
                    + a * b * img[bi, yb, xr]
                )
    return out


def test_warp_extreme_out_of_range(rng):
    """The packed-corner formulation pre-clamps sampling coordinates; the
    CUDA kernel clamps only the corner indices. The two agree because an
    out-of-range sample collapses both corners to the same edge texel,
    making the blend weight irrelevant — lock that equivalence under flow
    that throws most samples far outside a tiny frame (and at exact-edge
    / negative-fraction coordinates)."""
    img = rng.normal(size=(3, 6, 7, 5)).astype(np.float32)
    flow = rng.normal(scale=50.0, size=(3, 6, 7, 2)).astype(np.float32)
    # pepper in the tricky exact values: integer landings, -0.x, H/W-1+0.x
    flow[0, 0, 0] = (-0.3, 0.0)
    flow[0, 0, 1] = (6.0, 5.0)      # lands exactly on the far corner
    flow[0, 1, 2] = (4.5, 4.5)      # last in-range texel pair
    flow[1, 2, 3] = (1e6, -1e6)
    got = np.asarray(warp_bilinear(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(got, _warp_oracle_cuda(img, flow), atol=1e-5)


def test_warp_gradient_matches_numerical(rng):
    """Autodiff through the packed-gather warp (take_along_axis VJP =
    scatter-add) must match central finite differences w.r.t. both the
    image and the flow, including a clamped (zero-gradient) sample."""
    img = rng.normal(size=(1, 4, 5, 2)).astype(np.float32)
    flow = rng.normal(scale=1.5, size=(1, 4, 5, 2)).astype(np.float32)
    flow[0, 0, 0] = (30.0, 30.0)  # clamped: d(out)/d(flow) must be 0 here
    w = rng.normal(size=img.shape).astype(np.float32)

    def loss(i, f):
        return jnp.vdot(warp_bilinear(i, f), jnp.asarray(w))

    gi, gf = jax.grad(loss, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(flow))
    eps = 1e-3
    for arr, grad in ((img, np.asarray(gi)), (flow, np.asarray(gf))):
        flat = arr.reshape(-1)
        for k in rng.choice(flat.size, size=12, replace=False):
            orig = flat[k]
            flat[k] = orig + eps
            up = float(loss(jnp.asarray(img), jnp.asarray(flow)))
            flat[k] = orig - eps
            dn = float(loss(jnp.asarray(img), jnp.asarray(flow)))
            flat[k] = orig
            num = (up - dn) / (2 * eps)
            np.testing.assert_allclose(grad.reshape(-1)[k], num, atol=2e-2)
    assert np.all(np.asarray(gf)[0, 0, 0] == 0.0)


def test_upsample_parity_with_torch(rng):
    x = rng.normal(size=(1, 4, 5, 3)).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    for ac in (False, True):
        yt = F.interpolate(
            xt, scale_factor=4, mode="bilinear", align_corners=ac
        ).numpy()
        yj = np.asarray(upsample_bilinear(jnp.asarray(x), 4, ac))
        np.testing.assert_allclose(yj, np.transpose(yt, (0, 2, 3, 1)), atol=1e-5)
    yn = F.interpolate(xt, scale_factor=4, mode="nearest").numpy()
    np.testing.assert_allclose(
        np.asarray(upsample_nearest(jnp.asarray(x), 4)),
        np.transpose(yn, (0, 2, 3, 1)),
    )
    cn = np.asarray(channel_norm(jnp.asarray(x)))
    np.testing.assert_allclose(cn[..., 0], np.linalg.norm(x, axis=-1), atol=1e-6)


# ---------------------------------------------------------------------------
# Forward parity via the checkpoint converter (torch oracle of FlowNetS)
# ---------------------------------------------------------------------------


def _tconv(cin, cout, k=3, s=1):
    return torch.nn.Sequential(
        torch.nn.Conv2d(cin, cout, k, s, (k - 1) // 2),
        torch.nn.LeakyReLU(0.1),
    )


def _tdeconv(cin, cout):
    return torch.nn.Sequential(
        torch.nn.ConvTranspose2d(cin, cout, 4, 2, 1),
        torch.nn.LeakyReLU(0.1),
    )


class TorchFlowNetS(torch.nn.Module):
    """Oracle with the reference FlowNetS topology and checkpoint key
    layout (FlowNetS.py:11-96)."""

    def __init__(self, cin=12):
        super().__init__()
        self.conv1 = _tconv(cin, 64, 7, 2)
        self.conv2 = _tconv(64, 128, 5, 2)
        self.conv3 = _tconv(128, 256, 5, 2)
        self.conv3_1 = _tconv(256, 256)
        self.conv4 = _tconv(256, 512, 3, 2)
        self.conv4_1 = _tconv(512, 512)
        self.conv5 = _tconv(512, 512, 3, 2)
        self.conv5_1 = _tconv(512, 512)
        self.conv6 = _tconv(512, 1024, 3, 2)
        self.conv6_1 = _tconv(1024, 1024)
        self.deconv5 = _tdeconv(1024, 512)
        self.deconv4 = _tdeconv(1026, 256)
        self.deconv3 = _tdeconv(770, 128)
        self.deconv2 = _tdeconv(386, 64)
        self.predict_flow6 = torch.nn.Conv2d(1024, 2, 3, 1, 1)
        self.predict_flow5 = torch.nn.Conv2d(1026, 2, 3, 1, 1)
        self.predict_flow4 = torch.nn.Conv2d(770, 2, 3, 1, 1)
        self.predict_flow3 = torch.nn.Conv2d(386, 2, 3, 1, 1)
        self.predict_flow2 = torch.nn.Conv2d(194, 2, 3, 1, 1)
        self.upsampled_flow6_to_5 = torch.nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False)
        self.upsampled_flow5_to_4 = torch.nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False)
        self.upsampled_flow4_to_3 = torch.nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False)
        self.upsampled_flow3_to_2 = torch.nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False)

    def forward(self, x):
        c1 = self.conv1(x)
        c2 = self.conv2(c1)
        c3 = self.conv3_1(self.conv3(c2))
        c4 = self.conv4_1(self.conv4(c3))
        c5 = self.conv5_1(self.conv5(c4))
        c6 = self.conv6_1(self.conv6(c5))
        f6 = self.predict_flow6(c6)
        cat5 = torch.cat([c5, self.deconv5(c6), self.upsampled_flow6_to_5(f6)], 1)
        f5 = self.predict_flow5(cat5)
        cat4 = torch.cat([c4, self.deconv4(cat5), self.upsampled_flow5_to_4(f5)], 1)
        f4 = self.predict_flow4(cat4)
        cat3 = torch.cat([c3, self.deconv3(cat4), self.upsampled_flow4_to_3(f4)], 1)
        f3 = self.predict_flow3(cat3)
        cat2 = torch.cat([c2, self.deconv2(cat3), self.upsampled_flow3_to_2(f3)], 1)
        return self.predict_flow2(cat2)


def test_flownets_forward_parity_via_converter(rng):
    t = TorchFlowNetS(12).eval()
    sd = torch_state_dict_to_numpy(t.state_dict())

    net = FlowNetS(12)
    x = rng.normal(size=(1, 64, 64, 12)).astype(np.float32)
    variables = net.init(jax.random.key(0), jnp.asarray(x))
    variables, report = convert_params(dict(variables), sd, strict=True)
    assert not report["missing"]

    flows = net.apply(variables, jnp.asarray(x))
    y = np.asarray(flows[0])
    with torch.no_grad():
        yt = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(y, np.transpose(yt, (0, 2, 3, 1)), atol=2e-4)


def test_flownet2_composite_shapes():
    net = FlowNet2(interpret_pallas=True)
    x = jnp.zeros((1, 2, 64, 128, 3))
    variables = net.init(jax.random.key(0), x)
    out = net.apply(variables, x)
    assert out.shape == (1, 64, 128, 2)
    n_params = _count(variables["params"])
    # C + S + S + SD + Fusion
    expect = (
        REF_PARAM_COUNTS["C"]
        + 2 * REF_PARAM_COUNTS["S12"]
        + REF_PARAM_COUNTS["SD"]
        + REF_PARAM_COUNTS["Fusion"]
    )
    assert n_params == expect, (n_params, expect)


def test_flownet2_composite_bf16_traces_and_matches():
    """Regression: the composite glue (warp_bilinear between stages) used
    to promote bf16 activations to f32, so a bf16-cast FlowNet2/CS/CSS —
    the serving flow_compute_dtype=bfloat16 recipe (serve/live_flow.py)
    — crashed at trace time inside flownets_1's first conv. warp is now
    dtype-preserving (f32 coordinate math, result cast back)."""
    net = FlowNet2(use_pallas_correlation=False)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 255, (1, 2, 64, 64, 3)).astype(np.float32))
    v = net.init(jax.random.key(0), x)
    yf = net.apply(v, x)
    vb = jax.tree.map(lambda l: l.astype(jnp.bfloat16), v)
    yb = net.apply(vb, x.astype(jnp.bfloat16))
    assert yb.dtype == jnp.bfloat16 and yb.shape == yf.shape
    rel = float(
        jnp.max(jnp.abs(yb.astype(jnp.float32) - yf))
        / (jnp.max(jnp.abs(yf)) + 1e-9)
    )
    assert rel < 0.05, rel  # bf16 quantization, not a formulation change


def test_warp_bilinear_dtype_preserving():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
    flow = rng.uniform(-2, 2, (2, 8, 8, 2)).astype(np.float32)
    out_f32 = warp_bilinear(jnp.asarray(img), jnp.asarray(flow))
    assert out_f32.dtype == jnp.float32
    out_bf = warp_bilinear(
        jnp.asarray(img, jnp.bfloat16), jnp.asarray(flow, jnp.bfloat16)
    )
    assert out_bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_bf, np.float32), np.asarray(out_f32),
        rtol=0, atol=0.02,
    )
