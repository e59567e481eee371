"""Reverse checkpoint interop: a model trained here exports to the
reference's torch artifact format (train.py:432-436) and loads into the
ACTUAL reference model with strict=True — interop in both directions
(test_convert.py covers torch -> here)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vec_vad_tpu.config import (  # noqa: E402
    CompletionConfig,
    ForegroundConfig,
    PipelineConfig,
)
from vec_vad_tpu.models.completion import make_completion_net  # noqa: E402
from vec_vad_tpu.models.completion_convert import (  # noqa: E402
    convert_completion_state_dict,
    load_reference_model_grid,
)
from vec_vad_tpu.models.completion_export import (  # noqa: E402
    export_completion_state_dict,
    export_model_grid,
)

REF = "/root/reference"


def _reference_net(nf, tot_of, use_flow=True):
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
        border_mode="predict", rawRange=None, useFlow=use_flow,
        padding=False,
    )


def _init_variables(cfg, rng_key=0):
    net = make_completion_net(cfg)
    P = 32
    x = np.zeros((1, P, P, cfg.tot_raw_num * 3), np.float32)
    x_of = np.zeros((1, P, P, cfg.tot_of_num * 2), np.float32)
    variables = net.init(jax.random.key(rng_key), x, x_of, False)
    # non-trivial running stats so the eval-mode BN path is actually
    # exercised (init gives mean=0/var=1, which normalization ignores)
    variables = jax.tree.map(np.asarray, variables)

    def bump(tree, scale):
        return jax.tree.map(
            lambda x: x + scale * np.random.default_rng(3).standard_normal(
                x.shape
            ).astype(x.dtype),
            tree,
        )

    variables["batch_stats"] = jax.tree.map(
        np.abs, bump(variables["batch_stats"], 0.05)
    )
    return net, variables


@pytest.mark.parametrize("tot_of", [1, 5])
def test_export_loads_into_reference_strict_and_matches(rng, tot_of):
    """Exported state_dict loads strict=True into the actual reference
    module and the torch forward matches our forward — proves key names,
    shapes, weight layout, AND BN running-stat transport."""
    nf = 4
    cfg = CompletionConfig(nf=nf, context_of_num=0 if tot_of == 1 else 4)
    net, variables = _init_variables(cfg)
    sd = export_completion_state_dict(variables, net)

    ref = torch.nn.DataParallel(_reference_net(nf, tot_of))
    ref.load_state_dict(sd, strict=True)  # raises on any key/shape delta
    ref = ref.module.eval()

    B = 2
    x = rng.random((B, 32, 32, 15)).astype(np.float32)
    x_of = rng.random((B, 32, 32, 2 * tot_of)).astype(np.float32)
    out = net.apply(
        jax.tree.map(jnp.asarray, variables), jnp.asarray(x),
        jnp.asarray(x_of), False,
    )
    with torch.no_grad():
        of_t, raw_t, _, _ = ref(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(x_of, (0, 3, 1, 2))),
        )
    raw_ours = np.transpose(np.asarray(out.raw_out), (1, 0, 4, 2, 3)).reshape(
        B, -1, 32, 32
    )
    np.testing.assert_allclose(raw_ours, raw_t.numpy(), atol=5e-4)
    of_ours = np.transpose(np.asarray(out.of_out), (1, 0, 4, 2, 3)).reshape(
        B, -1, 32, 32
    )
    np.testing.assert_allclose(of_ours, of_t.numpy(), atol=5e-4)


def test_export_import_roundtrip_exact():
    """convert(export(v)) == v leaf-for-leaf (the two converters are
    exact inverses)."""
    cfg = CompletionConfig(nf=4, context_of_num=0)
    net, variables = _init_variables(cfg)
    sd = {
        k: np.asarray(v.numpy())
        for k, v in export_completion_state_dict(variables, net).items()
    }
    back = convert_completion_state_dict(sd, net)
    ours = jax.tree_util.tree_leaves_with_path(variables)
    theirs = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(ours) == len(theirs)
    for path, leaf in ours:
        np.testing.assert_array_equal(np.asarray(leaf), theirs[path])


def test_export_model_grid_reference_format(tmp_path):
    """export_model_grid writes the reference's three artifacts: the
    model grid reloads through load_reference_model_grid with identical
    weights, and np.mean/np.std of the score arrays reproduce each
    block's z-norm statistics exactly (test.py:242-266 consumes them
    this way)."""
    from vec_vad_tpu.pipeline import VadModel
    from vec_vad_tpu.train.trainer import TrainedBlock

    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=32, h_block=2, w_block=1),
        model=CompletionConfig(nf=4, context_of_num=0, use_flow=True),
    )
    net, v0 = _init_variables(cfg.model, rng_key=0)
    _, v1 = _init_variables(cfg.model, rng_key=1)
    rng = np.random.default_rng(5)
    model = VadModel(cfg=cfg)
    for key, v in (((0, 0, 0), v0), ((0, 1, 0), v1)):
        model.blocks[key] = TrainedBlock(
            params=v["params"],
            batch_stats=v["batch_stats"],
            raw_scores=rng.random(17).astype(np.float32) * 50,
            of_scores=rng.random(17).astype(np.float32) * 5,
        )

    paths = export_model_grid(model, str(tmp_path))
    assert [os.path.basename(p) for p in paths] == [
        "UCSDped2_model_obj_det_with_motion_SelfComplete.npy",
        "UCSDped2_raw_training_scores_obj_det_with_motion_SelfComplete.npy",
        "UCSDped2_of_training_scores_obj_det_with_motion_SelfComplete.npy",
    ]

    grid = load_reference_model_grid(paths[0], net)
    assert [k for k, _ in grid] == [(0, 0), (1, 0)]
    for (key, back), blk_key in zip(grid, [(0, 0, 0), (0, 1, 0)]):
        blk = model.blocks[blk_key]
        ours = dict(
            jax.tree_util.tree_leaves_with_path(
                {"params": blk.params, "batch_stats": blk.batch_stats}
            )
        )
        for path, leaf in jax.tree_util.tree_leaves_with_path(back):
            np.testing.assert_array_equal(np.asarray(leaf), ours[path])

    raw = torch.load(paths[1], weights_only=False)
    of = torch.load(paths[2], weights_only=False)
    for key, blk_key in (((0, 0), (0, 0, 0)), ((1, 0), (0, 1, 0))):
        blk = model.blocks[blk_key]
        h, w = key
        assert np.isclose(np.mean(raw[h][w]), blk.raw_stats[0])
        assert np.isclose(np.std(raw[h][w]), blk.raw_stats[1])
        assert np.isclose(np.mean(of[h][w]), blk.of_stats[0])
        assert np.isclose(np.std(of[h][w]), blk.of_stats[1])


def test_export_model_grid_multiscene(tmp_path):
    """ShanghaiTech-style grids carry the extra scene level
    (test.py:231-239); untrained cells stay []."""
    from vec_vad_tpu.pipeline import VadModel
    from vec_vad_tpu.train.trainer import TrainedBlock

    cfg = PipelineConfig(
        dataset_name="ShanghaiTech",
        fore=ForegroundConfig(patch_size=32, h_block=1, w_block=1),
        model=CompletionConfig(nf=4, context_of_num=0, use_flow=False),
    )
    net, v = _init_variables(cfg.model, rng_key=2)
    model = VadModel(cfg=cfg)
    model.blocks[(2, 0, 0)] = TrainedBlock(
        params=v["params"], batch_stats=v["batch_stats"],
        raw_scores=np.ones(4, np.float32), of_scores=None,
    )
    paths = export_model_grid(model, str(tmp_path))
    ms = torch.load(paths[0], weights_only=False)
    assert len(ms) == 3 and len(ms[2]) == 1  # scenes 1..3 (max block + 1)
    assert ms[0][0][0] == [] and len(ms[2][0][0]) == 1
    # raw-only model: flow keys absent, matching useFlow=False module
    ref = torch.nn.DataParallel(_reference_net(4, 1, use_flow=False))
    ref.load_state_dict(ms[2][0][0][0], strict=True)


def test_import_model_grid_roundtrip(tmp_path):
    """import_model_grid (the `import-torch` CLI core) is the exact
    inverse of export_model_grid: weights, score arrays, and block keys
    survive the torch artifact roundtrip — the path a user takes with the
    RELEASED reference checkpoints (README.md:63)."""
    from vec_vad_tpu.models.completion_convert import import_model_grid
    from vec_vad_tpu.pipeline import VadModel
    from vec_vad_tpu.train.trainer import TrainedBlock

    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=32, h_block=2, w_block=1),
        model=CompletionConfig(nf=4, context_of_num=0, use_flow=True),
    )
    _, v0 = _init_variables(cfg.model, rng_key=0)
    _, v1 = _init_variables(cfg.model, rng_key=1)
    rng = np.random.default_rng(7)
    model = VadModel(cfg=cfg)
    for key, v in (((0, 0, 0), v0), ((0, 1, 0), v1)):
        model.blocks[key] = TrainedBlock(
            params=v["params"],
            batch_stats=v["batch_stats"],
            raw_scores=rng.random(13).astype(np.float32) * 50,
            of_scores=rng.random(13).astype(np.float32) * 5,
        )
    export_model_grid(model, str(tmp_path))

    back = import_model_grid(cfg, str(tmp_path))
    assert set(back.blocks) == set(model.blocks)
    for key, blk in model.blocks.items():
        got = back.blocks[key]
        np.testing.assert_array_equal(got.raw_scores, blk.raw_scores)
        np.testing.assert_array_equal(got.of_scores, blk.of_scores)
        ours = dict(
            jax.tree_util.tree_leaves_with_path(
                {"params": blk.params, "batch_stats": blk.batch_stats}
            )
        )
        for path, leaf in jax.tree_util.tree_leaves_with_path(
            {"params": got.params, "batch_stats": got.batch_stats}
        ):
            np.testing.assert_array_equal(np.asarray(leaf), ours[path])


def test_import_model_grid_multiscene_raw_only(tmp_path):
    """SHT-style scene grids import with (scene, h, w) keys; raw-only
    models (use_flow=False) skip the of-score file."""
    from vec_vad_tpu.models.completion_convert import import_model_grid
    from vec_vad_tpu.pipeline import VadModel
    from vec_vad_tpu.train.trainer import TrainedBlock

    cfg = PipelineConfig(
        dataset_name="ShanghaiTech",
        fore=ForegroundConfig(patch_size=32, h_block=1, w_block=1),
        model=CompletionConfig(nf=4, context_of_num=0, use_flow=False),
    )
    _, v = _init_variables(cfg.model, rng_key=2)
    model = VadModel(cfg=cfg)
    model.blocks[(2, 0, 0)] = TrainedBlock(
        params=v["params"], batch_stats=v["batch_stats"],
        raw_scores=np.arange(4, dtype=np.float32), of_scores=None,
    )
    export_model_grid(model, str(tmp_path))

    back = import_model_grid(cfg, str(tmp_path))
    assert set(back.blocks) == {(2, 0, 0)}
    got = back.blocks[(2, 0, 0)]
    np.testing.assert_array_equal(got.raw_scores, model.blocks[(2, 0, 0)].raw_scores)
    assert got.of_scores is None
