"""Flow driver (pair selection, resize protocol), losses, flow IO/viz."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vec_vad_tpu.data.video_index import VideoIndex
from vec_vad_tpu.flow.driver import (
    compute_optical_flow,
    flow_pair_indices,
    resize_bilinear,
)
from vec_vad_tpu.flow.losses import epe, multiscale_loss
from vec_vad_tpu.utils import flowviz


def test_flow_pair_indices_boundary_rule():
    # Reference quirk (calc_optical_flow.py:43-76): at a video's FIRST
    # frame the window is [0, 0, 1] and the boundary branch picks window
    # positions (0, 1) -> the pair (f0, f0), i.e. degenerate zero flow.
    # Mid-video frame t pairs (t, t+1); the last frame pairs (N-2, N-1).
    idx = VideoIndex(["a", "b"], np.array([5, 5]))
    first, second = flow_pair_indices(idx)
    np.testing.assert_array_equal(first[:5], [0, 1, 2, 3, 3])
    np.testing.assert_array_equal(second[:5], [0, 2, 3, 4, 4])
    np.testing.assert_array_equal(first[5:], [5, 6, 7, 8, 8])
    np.testing.assert_array_equal(second[5:], [5, 7, 8, 9, 9])


def test_resize_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.normal(size=(2, 24, 30, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(img), 38, 51))
    for b in range(2):
        expect = cv2.resize(img[b], (51, 38))
        np.testing.assert_allclose(got[b], expect, atol=1e-4)


def test_compute_optical_flow_with_stub_net():
    """Drive the full batched protocol with a stub net that returns the
    (resized) frame difference as 'flow' — checks shapes, batching, pad
    handling, and the no-rescale resize-back."""

    class StubNet:
        def apply(self, variables, pair):
            # pair: (B, 2, 384, 512, 3)
            return (pair[:, 1, :, :, :2] - pair[:, 0, :, :, :2]) / 10.0

    idx = VideoIndex(["a"], np.array([7]))
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (7, 48, 64, 3), dtype=np.uint8)
    flow = compute_optical_flow(StubNet(), {}, idx, frames, chunk=3)
    assert flow.shape == (7, 48, 64, 2)
    assert np.isfinite(flow).all()
    # last frame's flow equals the previous frame's (same pair, cf.
    # calc_optical_flow.py boundary rule)
    np.testing.assert_allclose(flow[6], flow[5], atol=1e-5)


def test_multiscale_loss_matches_reference_recipe(rng):
    torch = pytest.importorskip("torch")

    target = rng.normal(size=(2, 64, 64, 2)).astype(np.float32)
    pyramid = [
        rng.normal(size=(2, 64 // (4 * 2 ** i), 64 // (4 * 2 ** i), 2)).astype(
            np.float32
        )
        for i in range(5)
    ]
    loss, epe_v = multiscale_loss([jnp.asarray(p) for p in pyramid], jnp.asarray(target))

    # reference recipe (losses.py:46-83) with torch ops
    t = torch.from_numpy(np.transpose(target, (0, 3, 1, 2))) * 0.05
    loss_t, epe_t = 0.0, 0.0
    for i, p in enumerate(pyramid):
        w = 0.32 / 2 ** i
        pool = torch.nn.AvgPool2d(4 * 2 ** i, 4 * 2 ** i)
        tt = pool(t)
        pt = torch.from_numpy(np.transpose(p, (0, 3, 1, 2)))
        loss_t += w * torch.abs(pt - tt).mean().item()
        epe_t += w * torch.norm(tt - pt, p=2, dim=1).mean().item()
    assert abs(float(loss) - loss_t) < 1e-5
    assert abs(float(epe_v) - epe_t) < 1e-5


def test_flo_roundtrip_and_color(tmp_path, rng):
    flow = rng.normal(scale=3.0, size=(12, 17, 2)).astype(np.float32)
    p = str(tmp_path / "x.flo")
    flowviz.write_flo(p, flow)
    back = flowviz.read_flo(p)
    np.testing.assert_array_equal(back, flow)

    img = flowviz.flow_to_image(flow)
    assert img.shape == (12, 17, 3) and img.dtype == np.uint8
    # zero flow renders (near) white under max normalization
    z = flowviz.flow_to_image(np.zeros((4, 4, 2), np.float32))
    assert (z > 240).all()

    err = flowviz.flow_error(flow[..., 0], flow[..., 1], flow[..., 0], flow[..., 1])
    assert err == 0.0


def test_kitti_png_roundtrip(tmp_path, rng):
    pytest.importorskip("cv2")
    flow = rng.normal(scale=5.0, size=(8, 9, 2)).astype(np.float32)
    p = str(tmp_path / "k.png")
    flowviz.write_kitti_png(p, flow)
    back = flowviz.read_kitti_png(p)
    np.testing.assert_allclose(back[..., :2], flow, atol=1 / 64.0)
    assert (back[..., 2] == 1).all()


def test_flow_trainer_step():
    """The sharded multiscale train step runs and optimizes on the
    8-virtual-device mesh. Uses a tiny pyramid net with a mesh-divisible
    batch: a full FlowNetS at batch 2 over 8 devices replicates 38M-param
    fwd/bwd work per device on this single CPU core (~6 min/step measured)
    without exercising anything extra — the trainer is net-agnostic."""
    from test_flow_harness import TinyPyramidNet  # rootdir import

    from vec_vad_tpu.flow.trainer import FlowTrainer

    net = TinyPyramidNet()
    trainer = FlowTrainer(net, learning_rate=1e-3)
    rng = np.random.default_rng(0)
    pairs = rng.normal(size=(8, 64, 64, 6)).astype(np.float32)
    target = rng.normal(size=(8, 64, 64, 2)).astype(np.float32)
    state = trainer.init_state(pairs)
    losses = []
    for _ in range(3):
        state, m = trainer.step(state, pairs, target)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert int(state.step) == 3
    # optimization is moving (loss changes step to step)
    assert losses[0] != losses[-1]


class _CountingStack:
    """Array-like [lo:hi] view that records the widest slice decoded —
    proves the segmented driver never materializes the whole split."""

    def __init__(self, frames):
        self._f = frames
        self.shape = frames.shape
        self.max_width = 0

    def __getitem__(self, key):
        if isinstance(key, slice):
            lo, hi, _ = key.indices(self.shape[0])
            self.max_width = max(self.max_width, hi - lo)
        return self._f[key]


def test_compute_optical_flow_segmented_matches_chunked(tmp_path):
    """The memory-bounded segmented path (per-segment decode/upload, one
    device call per segment, immediate per-frame writes) must reproduce
    the materialized path exactly — segment boundaries crossing video
    boundaries, tail padding and the boundary pair rule included — while
    never decoding more than a segment (+2 neighbors) of frames."""
    from vec_vad_tpu.flow.driver import (
        compute_optical_flow_segmented,
        flow_tree_writer,
    )

    class StubNet:
        def apply(self, variables, pair):
            return (pair[:, 1, :, :, :2] - pair[:, 0, :, :, :2]) / 10.0

    idx = VideoIndex(["a", "b", "c"], np.array([6, 5, 7]))
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (18, 32, 40, 3), dtype=np.uint8)
    expect = compute_optical_flow(StubNet(), {}, idx, frames, chunk=4)

    lazy = _CountingStack(frames)
    got = np.zeros_like(expect)
    writes = []

    def write(i, f):
        writes.append(i)
        got[i] = f

    n = compute_optical_flow_segmented(
        StubNet(), {}, idx, lazy, write, segment_frames=5, chunk=4
    )
    assert n == 18
    assert writes == list(range(18))  # every frame written exactly once
    # segment_frames=5 rounds up to 8 (chunk multiple); +2 neighbor frames
    assert lazy.max_width <= 8 + 2
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_flow_tree_writer_matches_save_flow_tree(tmp_path):
    from vec_vad_tpu.flow.driver import flow_tree_writer, save_flow_tree

    idx = VideoIndex(["va", "vb"], np.array([2, 2]))
    idx.frame_paths = [
        "root/ds/va/000.jpg", "root/ds/va/001.jpg",
        "root/ds/vb/000.jpg", "root/ds/vb/001.jpg",
    ]
    flow = np.random.default_rng(3).normal(size=(4, 4, 4, 2)).astype(np.float32)
    d1, d2 = str(tmp_path / "w"), str(tmp_path / "s")
    w = flow_tree_writer(idx, d1, "root/ds")
    for i in range(4):
        w(i, flow[i])
    save_flow_tree(flow, idx, d2, "root/ds")
    import os

    for rel in ["va/000.npy", "va/001.npy", "vb/000.npy", "vb/001.npy"]:
        a = np.load(os.path.join(d1, rel))
        b = np.load(os.path.join(d2, rel))
        np.testing.assert_array_equal(a, b)


def test_compute_optical_flow_resident_matches_chunked():
    """The whole-split resident path (one lax.map device call) must equal
    the per-chunk path, including tail padding and the boundary rule."""

    class StubNet:
        def apply(self, variables, pair):
            return (pair[:, 1, :, :, :2] - pair[:, 0, :, :, :2]) / 10.0

    idx = VideoIndex(["a", "b"], np.array([6, 5]))
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (11, 32, 40, 3), dtype=np.uint8)
    chunked = compute_optical_flow(StubNet(), {}, idx, frames, chunk=4)
    resident = compute_optical_flow(
        StubNet(), {}, idx, frames, chunk=4, resident=True
    )
    assert resident.shape == (11, 32, 40, 2)
    np.testing.assert_allclose(resident, chunked, atol=1e-5)


def test_compute_optical_flow_bf16_dtype_policy():
    """flow_dtype='bfloat16' runs the net forward in bf16 (weights cast
    once, activations cast in the chunk program) but the .npy-facing
    output stays float32 and tracks the f32 result to bf16 rounding.
    Guards the 2.1x TPU fast path (PROFILE.md §5) against dtype leaks:
    an f32 output produced by an accidentally-f32 forward would show
    zero drift, so the test also asserts the forward REALLY saw bf16."""
    import flax.linen as nn

    from vec_vad_tpu.flow.driver import cast_flow_variables

    seen_dtypes = []

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, pair):
            seen_dtypes.append(pair.dtype)
            x = jnp.concatenate([pair[:, 0], pair[:, 1]], axis=-1)
            return nn.Conv(2, (3, 3), dtype=pair.dtype)(x / 255.0)

    net = TinyNet()
    idx = VideoIndex(["a"], np.array([6]))
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 255, (6, 32, 40, 3), dtype=np.uint8)
    variables = net.init(
        jax.random.key(0), jnp.zeros((1, 2, 384, 512, 3))
    )

    f32 = compute_optical_flow(net, variables, idx, frames, chunk=2)
    bf16 = compute_optical_flow(
        net, variables, idx, frames, chunk=2, compute_dtype="bfloat16"
    )
    assert jnp.bfloat16 in seen_dtypes  # the forward actually ran bf16
    assert bf16.dtype == np.float32
    assert np.isfinite(bf16).all()
    # bf16 has ~8 mantissa bits: expect small relative drift, not zero
    scale = np.abs(f32).max()
    assert np.abs(bf16 - f32).max() < 0.05 * scale + 1e-6
    assert np.abs(bf16 - f32).max() > 0.0

    # weight cast is one-time and leaves non-float leaves alone
    cast = cast_flow_variables(
        {"params": {"w": jnp.ones((2,), jnp.float32),
                    "i": jnp.ones((2,), jnp.int32)}},
        "bfloat16",
    )
    assert cast["params"]["w"].dtype == jnp.bfloat16
    assert cast["params"]["i"].dtype == jnp.int32


def test_calc_flow_cli_flag_plumbing(tmp_path, monkeypatch):
    """`calc-flow --flow-dtype bfloat16 --chunk 0` must reach
    run_calc_flow as flow_dtype='bfloat16', chunk=None (per-dtype
    default selection happens inside the runner: 4 f32 / 8 bf16)."""
    import vec_vad_tpu.runner as runner_mod
    from vec_vad_tpu import cli

    calls = {}

    # runner-side per-dtype chunk default (inspect BEFORE monkeypatching)
    import inspect

    src = inspect.getsource(runner_mod.run_calc_flow)
    assert '8 if flow_dtype == "bfloat16" else 4' in src

    def fake_run_calc_flow(cfg, base, **kw):
        calls.update(kw)

    monkeypatch.setattr(runner_mod, "run_calc_flow", fake_run_calc_flow)
    cfg_path = str(tmp_path / "c.cfg")
    with open(cfg_path, "w") as f:
        f.write("[shared_parameters]\ndataset_name = UCSDped2\n")
    rc = cli.main([
        "calc-flow", "--config", cfg_path, "--base", str(tmp_path),
        "--flow-dtype", "bfloat16",
    ])
    assert rc == 0
    assert calls["flow_dtype"] == "bfloat16"
    assert calls["chunk"] is None  # 0 -> per-dtype optimum in the runner


def test_compute_optical_flow_mesh_parity():
    """Data-parallel calc-flow (VERDICT r4 item 3): the pair axis
    shard_mapped over an 8-device mesh must give BIT-IDENTICAL outputs to
    the 1-device run — both the whole-split resident path and the
    segmented path — including pad tails that land mid-device."""
    import flax.linen as nn

    from vec_vad_tpu.flow.driver import compute_optical_flow_segmented
    from vec_vad_tpu.parallel.mesh import get_mesh

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, pair):
            x = jnp.concatenate([pair[:, 0], pair[:, 1]], axis=-1)
            return nn.Conv(2, (3, 3))(x / 255.0)

    net = TinyNet()
    variables = net.init(jax.random.key(0), jnp.zeros((1, 2, 384, 512, 3)))
    idx = VideoIndex(["a", "b"], np.array([13, 6]))
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (19, 32, 40, 3), dtype=np.uint8)

    assert jax.device_count() >= 8, "conftest provides 8 virtual devices"
    mesh = get_mesh()

    single = compute_optical_flow(
        net, variables, idx, frames, chunk=2, resident=True
    )
    sharded = compute_optical_flow(
        net, variables, idx, frames, chunk=2, resident=True, mesh=mesh
    )
    assert sharded.shape == (19, 32, 40, 2)
    np.testing.assert_array_equal(sharded, single)

    # segmented: segment size not divisible by n_dev*chunk gets rounded
    # up internally; outputs must still match the unsharded segmented run
    out_1 = np.zeros((19, 32, 40, 2), np.float32)
    out_8 = np.zeros((19, 32, 40, 2), np.float32)
    compute_optical_flow_segmented(
        net, variables, idx, frames,
        lambda i, f: out_1.__setitem__(i, f), segment_frames=7, chunk=2,
    )
    compute_optical_flow_segmented(
        net, variables, idx, frames,
        lambda i, f: out_8.__setitem__(i, f), segment_frames=7, chunk=2,
        mesh=mesh,
    )
    np.testing.assert_array_equal(out_8, out_1)
    np.testing.assert_array_equal(out_1, single)


def test_calc_flow_mesh_cli_plumbing(tmp_path, monkeypatch):
    """`calc-flow` defaults to use_mesh=True; --no-mesh turns it off."""
    import vec_vad_tpu.runner as runner_mod
    from vec_vad_tpu import cli

    calls = {}

    def fake_run_calc_flow(cfg, base, **kw):
        calls.update(kw)

    monkeypatch.setattr(runner_mod, "run_calc_flow", fake_run_calc_flow)
    cfg_path = str(tmp_path / "c.cfg")
    with open(cfg_path, "w") as f:
        f.write("[shared_parameters]\ndataset_name = UCSDped2\n")
    base = ["calc-flow", "--config", cfg_path, "--base", str(tmp_path)]
    assert cli.main(base) == 0
    assert calls["use_mesh"] is True
    assert cli.main(base + ["--no-mesh"]) == 0
    assert calls["use_mesh"] is False
