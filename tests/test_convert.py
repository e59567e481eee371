"""Reference-checkpoint import: full forward parity between the actual
reference torch completion model and our vmapped ensemble with converted
weights — the strongest available evidence that released reference
checkpoints reproduce their scores in this framework."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vec_vad_tpu.config import CompletionConfig  # noqa: E402
from vec_vad_tpu.models.completion import make_completion_net  # noqa: E402
from vec_vad_tpu.models.completion_convert import (  # noqa: E402
    convert_completion_state_dict,
    load_reference_model_grid,
)

REF = "/root/reference"


def _load_reference_net4(nf, tot_of, padding=False):
    """Import the reference model/unet.py as a test oracle (read-only)."""
    if not os.path.exists(os.path.join(REF, "model", "unet.py")):
        pytest.skip("reference not mounted")
    sys.path.insert(0, REF)
    try:
        from model.unet import SelfCompleteNet4, SelfCompleteNetFull
    finally:
        sys.path.pop(0)
    cls = SelfCompleteNet4 if tot_of == 1 else SelfCompleteNetFull
    return cls(
        features_root=nf, tot_raw_num=5, tot_of_num=tot_of,
        border_mode="predict", rawRange=None, useFlow=True, padding=padding,
    )


@pytest.mark.parametrize(
    "tot_of,padding", [(1, False), (5, False), (1, True)]
)
def test_forward_parity_with_reference_torch_model(rng, tot_of, padding):
    """padding=True is the zero-fill erase mode (unet.py:180-182): the
    UNet input keeps all 5 frames' channels (15) with the erased frame
    zeroed, vs the channel-drop 12-channel default."""
    nf = 4
    ref = _load_reference_net4(nf, tot_of, padding).eval()
    sd = {k: np.asarray(v.numpy()) for k, v in ref.state_dict().items()}

    cfg = CompletionConfig(
        nf=nf, context_of_num=0 if tot_of == 1 else 4, padding=padding
    )
    net = make_completion_net(cfg)
    variables = convert_completion_state_dict(sd, net)

    B = 3
    x = rng.random((B, 32, 32, 15)).astype(np.float32)
    x_of = rng.random((B, 32, 32, 2 * tot_of)).astype(np.float32)

    out = net.apply(variables, jnp.asarray(x), jnp.asarray(x_of), False)

    # torch forward: NCHW channel-stacked inputs
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ot = torch.from_numpy(np.transpose(x_of, (0, 3, 1, 2)))
    with torch.no_grad():
        of_out_t, raw_out_t, of_tgt_t, raw_tgt_t = ref(xt, ot)

    # our stacked (E, B, P, P, 3) vs torch channel-concat (B, E*3, P, P)
    raw_ours = np.transpose(np.asarray(out.raw_out), (1, 0, 4, 2, 3)).reshape(
        B, -1, 32, 32
    )
    np.testing.assert_allclose(raw_ours, raw_out_t.numpy(), atol=5e-4)
    of_ours = np.transpose(np.asarray(out.of_out), (1, 0, 4, 2, 3)).reshape(
        B, -1, 32, 32
    )
    np.testing.assert_allclose(of_ours, of_out_t.numpy(), atol=5e-4)
    # targets too (erasure indexing parity)
    raw_tgt_ours = np.transpose(
        np.asarray(out.raw_tgt), (1, 0, 4, 2, 3)
    ).reshape(B, -1, 32, 32)
    np.testing.assert_allclose(raw_tgt_ours, raw_tgt_t.numpy(), atol=1e-6)


def test_reference_model_grid_roundtrip(tmp_path, rng):
    """torch.save'd nested model_set grid (train.py:436 format) loads into
    (key, variables) pairs."""
    nf = 4
    ref = _load_reference_net4(nf, 1)
    sd = ref.state_dict()
    model_set = [[[sd]], [[ ]]]  # 2x1x1 grid, second block untrained
    p = str(tmp_path / "model_set.pt")
    torch.save(model_set, p)

    cfg = CompletionConfig(nf=nf, context_of_num=0)
    net = make_completion_net(cfg)
    grid = load_reference_model_grid(p, net)
    assert len(grid) == 1
    key, variables = grid[0]
    assert key == (0, 0)
    assert "raw_unets" in variables["params"]


def test_vad_model_save_load_roundtrip(tmp_path, rng):
    from vec_vad_tpu.config import ForegroundConfig, PipelineConfig
    from vec_vad_tpu.pipeline import VadModel
    from vec_vad_tpu.runtime.artifacts import load_vad_model, save_vad_model
    from vec_vad_tpu.train.trainer import TrainedBlock

    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=16),
        model=CompletionConfig(nf=4, context_of_num=0, use_flow=False),
    )
    from vec_vad_tpu.models.completion import make_completion_net

    net = make_completion_net(cfg.model)
    x = jnp.zeros((1, 16, 16, 15))
    variables = net.init(jax.random.key(0), x, None, False)
    blk = TrainedBlock(
        params=jax.device_get(variables["params"]),
        batch_stats=jax.device_get(variables["batch_stats"]),
        raw_scores=rng.random(10).astype(np.float32),
        of_scores=None,
    )
    model = VadModel(cfg=cfg, blocks={(0, 0, 0): blk})
    p = str(tmp_path / "model.npz")
    save_vad_model(p, model)
    back = load_vad_model(p)
    assert back.cfg.model.nf == 4 and back.cfg.fore.patch_size == 16
    b2 = back.blocks[(0, 0, 0)]
    np.testing.assert_array_equal(b2.raw_scores, blk.raw_scores)
    for a, b in zip(jax.tree.leaves(blk.params), jax.tree.leaves(b2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # forwards agree
    y1 = net.apply({"params": blk.params, "batch_stats": blk.batch_stats}, x, None, False)
    y2 = net.apply({"params": b2.params, "batch_stats": b2.batch_stats}, x, None, False)
    np.testing.assert_array_equal(np.asarray(y1.raw_out), np.asarray(y2.raw_out))


def test_artifact_cache(tmp_path):
    from vec_vad_tpu.runtime.artifacts import ArtifactCache, fingerprint

    cache = ArtifactCache(str(tmp_path))
    calls = []

    def compute():
        calls.append(1)
        return {"x": np.arange(5)}

    def save(p, v):
        np.savez(p, **v)

    def load(p):
        with np.load(p) as z:
            return {k: z[k] for k in z.files}

    fp = fingerprint("stage-config", np.ones(3))
    v1 = cache.get_or_compute("fg", fp, compute, save, load)
    v2 = cache.get_or_compute("fg", fp, compute, save, load)
    assert len(calls) == 1
    np.testing.assert_array_equal(v1["x"], v2["x"])
    # different fingerprint -> recompute
    fp2 = fingerprint("stage-config", np.zeros(3))
    assert fp2 != fp
    cache.get_or_compute("fg", fp2, compute, save, load)
    assert len(calls) == 2
