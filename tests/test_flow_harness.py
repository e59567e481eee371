"""Flow fine-tuning harness: epoch/validation loop, resume across a
kill/restart, best-checkpoint tracking (FlowNet2_src/main.py:341-350,
592-644 capability parity)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from vec_vad_tpu.flow.datasets import FlyingChairs  # noqa: E402
from vec_vad_tpu.flow.harness import FlowHarness  # noqa: E402
from vec_vad_tpu.flow.trainer import FlowTrainer  # noqa: E402
from vec_vad_tpu.utils.flowviz import write_flo  # noqa: E402


class TinyPyramidNet(nn.Module):
    """Minimal 5-scale pyramid net with the FlowNet output contract
    (flow2..flow6 at 1/4..1/64 resolution); the harness is net-agnostic."""

    @nn.compact
    def __call__(self, pairs, train: bool):
        x = pairs / 255.0
        feats, pyramid = x, []
        for k in range(6):
            feats = nn.relu(
                nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME")(feats)
            )
            if k >= 1:  # scales /4 .. /64
                pyramid.append(nn.Conv(2, (3, 3), padding="SAME")(feats))
        return pyramid  # finest first


@pytest.fixture(scope="module")
def chairs_dir(tmp_path_factory):
    """FlyingChairs-layout fixture: smooth textures shifted by a constant
    (4, 0) flow — learnable by construction."""
    root = tmp_path_factory.mktemp("chairs")
    rng = np.random.default_rng(0)
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(10):
        phase = rng.uniform(0, 6.28, 3)
        img = np.stack(
            [
                127 + 100 * np.sin(xx / 5.0 + phase[c]) * np.cos(yy / 7.0)
                for c in range(3)
            ],
            axis=-1,
        ).astype(np.uint8)
        img2 = np.roll(img, 4, axis=1)
        cv2.imwrite(str(root / f"{i:05d}-img_0.ppm"), img)
        cv2.imwrite(str(root / f"{i:05d}-img_1.ppm"), img2)
        flow = np.zeros((h, w, 2), np.float32)
        flow[..., 0] = 4.0
        write_flo(str(root / f"{i:05d}-flow.flo"), flow)
    return str(root)


def _make(workdir):
    trainer = FlowTrainer(TinyPyramidNet(), learning_rate=2e-3)
    return FlowHarness(trainer, workdir)


def test_fit_validates_and_checkpoints(chairs_dir, tmp_path):
    ds = FlyingChairs(chairs_dir)
    assert len(ds) == 10
    harness = _make(str(tmp_path / "run"))
    result = harness.fit(ds, ds, total_epochs=3, batch_size=5, seed=0)
    assert len(result.history) == 3
    # validation EPE falls on the learnable constant-flow problem
    assert result.history[-1]["val_epe"] < result.history[0]["val_epe"]
    assert result.best_epe == min(h["val_epe"] for h in result.history)
    import os

    assert os.path.exists(os.path.join(harness.workdir, FlowHarness.CKPT))
    assert os.path.exists(os.path.join(harness.workdir, FlowHarness.BEST))

    # inference mode on a pyramid-returning net: full-res flow is
    # upsample4(flow2 * div_flow), the reference wrappers' eval path
    res = harness.infer(result.state.params, ds, batch_size=5, n_batches=1)
    assert res["n"] == 5 and np.isfinite(res["epe"])


def test_resume_continues_exact_trajectory(chairs_dir, tmp_path):
    """Killing after epoch 2 and restarting reproduces the uninterrupted
    4-epoch run exactly (weights AND Adam state round-trip)."""
    ds = FlyingChairs(chairs_dir)
    wd_full = str(tmp_path / "full")
    wd_resume = str(tmp_path / "resume")

    full = _make(wd_full).fit(ds, ds, total_epochs=4, batch_size=5, seed=0)

    _make(wd_resume).fit(ds, ds, total_epochs=2, batch_size=5, seed=0)
    # "restart": fresh trainer + harness objects, same workdir
    resumed_harness = _make(wd_resume)
    resumed = resumed_harness.fit(
        ds, ds, total_epochs=4, batch_size=5, seed=0
    )
    assert [h["epoch"] for h in resumed.history] == [3, 4]
    np.testing.assert_allclose(
        resumed.history[-1]["val_epe"], full.history[-1]["val_epe"],
        rtol=1e-5,
    )
    import jax

    for a, b in zip(
        jax.tree.leaves(full.state.params), jax.tree.leaves(resumed.state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # validation kept falling across the kill/restart
    assert resumed.history[-1]["val_epe"] < resumed.best_epe * 1.5


def test_best_checkpoint_loads(chairs_dir, tmp_path):
    ds = FlyingChairs(chairs_dir)
    harness = _make(str(tmp_path / "run"))
    result = harness.fit(ds, ds, total_epochs=2, batch_size=5, seed=0)
    template = harness.trainer.init_state(
        next(ds.batches(5, shuffle=False))[0], seed=0
    )
    state, epoch, best = harness.load_checkpoint(template, best=True)
    assert best == pytest.approx(result.best_epe)
    assert harness.validate(state, ds, 5) == pytest.approx(best, rel=1e-5)


def test_lr_schedule_decays():
    """lr /= fraction every `frequency` steps (main.py:47-51)."""
    tr = FlowTrainer(
        TinyPyramidNet(), learning_rate=1e-3,
        schedule_lr_frequency=10, schedule_lr_fraction=10.0,
    )
    pairs = np.zeros((1, 64, 64, 6), np.float32)
    state = tr.init_state(pairs, seed=0)
    tgt = np.zeros((1, 64, 64, 2), np.float32)
    for _ in range(12):
        state, m = tr.step(state, pairs, tgt)
    assert int(state.step) == 12  # schedule is step-driven and jit-safe


class TinyFusedNet(nn.Module):
    """Single fused-flow net with the composite output contract
    (FlowNet2/CS/CSS return one (B, H, W, 2) flow)."""

    @nn.compact
    def __call__(self, pairs, train: bool = False):
        x = pairs / 255.0
        h = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(x))
        return nn.Conv(2, (3, 3), padding="SAME")(h)


def test_single_scale_loss_matches_torch_recipe():
    """Oracle: the literal reference L1Loss/L2Loss + EPE
    (FlowNet2_src/losses.py:7-45)."""
    import torch

    from vec_vad_tpu.flow.losses import single_scale_loss

    rng = np.random.default_rng(1)
    o = rng.normal(size=(3, 8, 9, 2)).astype(np.float32)
    t = rng.normal(size=(3, 8, 9, 2)).astype(np.float32)
    ot = torch.from_numpy(o.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(t.transpose(0, 3, 1, 2))
    l1, e1 = single_scale_loss(jnp.asarray(o), jnp.asarray(t), norm="L1")
    l2, e2 = single_scale_loss(jnp.asarray(o), jnp.asarray(t), norm="L2")
    epe_t = float(torch.norm(tt - ot, p=2, dim=1).mean())
    assert abs(float(l1) - float(torch.abs(ot - tt).mean())) < 1e-6
    assert abs(float(l2) - epe_t) < 1e-6  # reference L2 == EPE
    assert abs(float(e1) - epe_t) < 1e-6
    assert abs(float(e2) - epe_t) < 1e-6

    with pytest.raises(ValueError):
        FlowTrainer(TinyFusedNet(), loss="bogus")


def test_single_scale_fit_and_infer_roundtrip(chairs_dir, tmp_path):
    """Composite-recipe training (single-scale loss on the fused output)
    learns the constant-flow problem, and the inference mode
    (main.py:524-589) writes %06d.flo predictions that reproduce the
    reported EPE exactly."""
    import os

    from vec_vad_tpu.utils.flowviz import read_flo

    ds = FlyingChairs(chairs_dir)
    trainer = FlowTrainer(
        TinyFusedNet(), learning_rate=5e-3, loss="single", norm="L1"
    )
    harness = FlowHarness(trainer, str(tmp_path / "run"))
    result = harness.fit(ds, ds, total_epochs=3, batch_size=5, seed=0)
    assert result.history[-1]["val_epe"] < result.history[0]["val_epe"]

    out = str(tmp_path / "flows")
    res = harness.infer(result.state.params, ds, batch_size=4, save_dir=out)
    assert res["n"] == 10
    files = sorted(os.listdir(out))
    assert files == [f"{i:06d}.flo" for i in range(10)]
    flows = np.stack([read_flo(os.path.join(out, f)) for f in files])
    assert flows.shape == (10, 64, 64, 2)
    targets = np.concatenate(
        [t for _, t in ds.batches(4, shuffle=False)], axis=0
    )
    epe = float(np.sqrt(((flows - targets) ** 2).sum(-1)).mean(axis=(1, 2)).mean())
    np.testing.assert_allclose(epe, res["epe"], rtol=1e-5)

    res2 = harness.infer(result.state.params, ds, batch_size=4, n_batches=1)
    assert res2["n"] == 4


def test_real_composite_trains_one_step():
    """The REAL FlowNet2CS composite (78M params) takes one single-scale
    step through the PairMajorAdapter — the reference trains the
    composites exactly this way (main.py:194-197 pairs them with
    L1Loss/L2Loss on the fused full-res output)."""
    from vec_vad_tpu.flow.trainer import PairMajorAdapter
    from vec_vad_tpu.models import flownet

    net = PairMajorAdapter(inner=flownet.FlowNet2CS())
    tr = FlowTrainer(net, loss="single", norm="L1")
    rng = np.random.default_rng(0)
    pairs = rng.uniform(0, 255, (1, 64, 64, 6)).astype(np.float32)
    target = rng.normal(size=(1, 64, 64, 2)).astype(np.float32)
    state = tr.init_state(pairs)
    state, m = tr.step(state, pairs, target)
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(m["epe"]))


def test_cli_flow_net_loss_validation(chairs_dir, tmp_path):
    """flow-train rejects composite+multiscale and component+single with
    actionable messages; flow-infer refuses to run without weights
    (main.py:352-354 quits the same way)."""
    from vec_vad_tpu.cli import main

    common = ["--data-root", chairs_dir, "--workdir", str(tmp_path / "w")]
    with pytest.raises(SystemExit, match="fused"):
        main(["flow-train", *common, "--net", "FlowNet2CS"])
    with pytest.raises(SystemExit, match="multiscale"):
        main(["flow-train", *common, "--net", "FlowNetS", "--loss", "L1"])
    with pytest.raises(SystemExit, match="weights"):
        main([
            "flow-infer", "--data-root", chairs_dir, "--net", "FlowNetS",
            "--workdir", str(tmp_path / "empty"),
        ])
