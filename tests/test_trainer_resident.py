"""The device-resident lax.scan training path must match the per-batch
stepwise path (identical permutations, identical update math)."""

import numpy as np
import jax

from vec_vad_tpu.config import CompletionConfig
from vec_vad_tpu.models.completion import make_completion_net
from vec_vad_tpu.parallel.mesh import get_mesh
from vec_vad_tpu.train.trainer import BlockTrainer


def test_resident_matches_stepwise(rng):
    cfg = CompletionConfig(
        nf=4, epochs=2, batch_size=16, context_of_num=0, use_flow=True
    )
    net = make_completion_net(cfg)
    trainer = BlockTrainer(net, cfg, get_mesh(), patch_size=16)

    n = 48  # divisible by batch_size -> identical padding behavior
    raw = rng.integers(0, 256, (n, 16, 16, 15)).astype(np.uint8)
    of = rng.normal(size=(n, 16, 16, 2)).astype(np.float32)

    blk_step = trainer.fit_block(raw, of, seed=7, resident=False)
    blk_res = trainer.fit_block(raw, of, seed=7, resident=True)

    # Adam's early steps are sign-like (update ~= +-lr), so compile-fusion
    # float noise on near-zero gradients legitimately diverges parameters
    # by O(lr) per step; assert agreement at that scale (6 steps * 1e-3).
    for a, b in zip(
        jax.tree.leaves(blk_step.params), jax.tree.leaves(blk_res.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=8e-3)
    np.testing.assert_allclose(
        blk_step.raw_scores, blk_res.raw_scores, rtol=0.1
    )
    np.testing.assert_allclose(
        blk_step.of_scores, blk_res.of_scores, rtol=0.1
    )


def test_score_scan_matches_stepwise(rng):
    cfg = CompletionConfig(
        nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=True
    )
    net = make_completion_net(cfg)
    trainer = BlockTrainer(net, cfg, get_mesh(), patch_size=16)
    state = trainer.init_state(0)
    raw = rng.integers(0, 256, (21, 16, 16, 15)).astype(np.uint8)
    of = rng.normal(size=(21, 16, 16, 2)).astype(np.float32)
    r1, o1 = trainer.score_block(state, raw, of, resident=True)
    r2, o2 = trainer.score_block(state, raw, of, resident=False)
    np.testing.assert_allclose(r1, r2, rtol=1e-5)
    np.testing.assert_allclose(o1, o2, rtol=1e-5)


def test_resident_handles_tiny_blocks(rng):
    """A block with fewer than batch_size/2 cubes needs a CYCLIC schedule
    pad (order[:pad] would truncate: n=5 at bsz=16 yields 10 rows that
    cannot reshape to (-1, 16)) — the sparse-grid crash ADVICE round 2."""
    cfg = CompletionConfig(
        nf=4, epochs=2, batch_size=16, context_of_num=0, use_flow=False
    )
    net = make_completion_net(cfg)
    trainer = BlockTrainer(net, cfg, get_mesh(), patch_size=16)
    raw = rng.integers(0, 256, (5, 16, 16, 15)).astype(np.uint8)
    blk = trainer.fit_block(raw, None, seed=0, resident=True)
    assert blk.raw_scores.shape == (5,)
    assert np.isfinite(blk.raw_scores).all()


def test_resident_handles_partial_batches(rng):
    cfg = CompletionConfig(
        nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=False
    )
    net = make_completion_net(cfg)
    trainer = BlockTrainer(net, cfg, get_mesh(), patch_size=16)
    raw = rng.integers(0, 256, (21, 16, 16, 15)).astype(np.uint8)  # 16 + 5
    blk = trainer.fit_block(raw, None, seed=0, resident=True)
    assert blk.raw_scores.shape == (21,)
    assert np.isfinite(blk.raw_scores).all()


def test_resident_rejects_streamed_segments(rng):
    """resident=True trains on raw_inputs only — silently dropping streamed
    segments would skew the z-normalization stats, so it must raise."""
    import pytest

    cfg = CompletionConfig(
        nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=False
    )
    trainer = BlockTrainer(
        make_completion_net(cfg), cfg, get_mesh(), patch_size=16
    )
    raw = rng.integers(0, 256, (16, 16, 16, 15)).astype(np.uint8)
    with pytest.raises(ValueError, match="resident"):
        trainer.fit_block(raw, None, segments=[(raw, None)], resident=True)
    # default (resident=None) degrades to the stepwise path and works
    blk = trainer.fit_block(raw, None, segments=[(raw, None)])
    assert blk.raw_scores.shape == (32,)


def test_train_model_float_cubes_stay_sequential(rng):
    """Path auto-selection must not change the training statistics: float
    cubes quantize in the grid trainer's uint8 scan buffers, so they route
    through the sequential trainer (which scores them unquantized)."""
    from vec_vad_tpu.config import ForegroundConfig, PipelineConfig
    from vec_vad_tpu.pipeline import CubeSet, make_trainer, train_model

    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=16, max_boxes_per_frame=4,
                              h_block=2, w_block=1),
        model=CompletionConfig(
            nf=4, epochs=1, batch_size=8, context_of_num=0, use_flow=False
        ),
    )
    m = 24
    cubes = CubeSet(
        raw=rng.random((m, 16, 16, 15)).astype(np.float32),
        flow=None,
        frame_ids=np.arange(m),
        boxes=np.tile(np.array([0, 0, 8, 8], np.float32), (m, 1)),
        cells=np.stack(
            [np.arange(m) % 2, np.zeros(m, np.int64)], axis=1
        ),
        scenes=np.ones(m, np.int64),
    )
    trainer = make_trainer(cfg)
    auto = train_model(cfg, cubes, trainer=trainer, seed=3)
    seq = train_model(
        cfg, cubes, trainer=trainer, seed=3, parallel_blocks=False
    )
    assert sorted(auto.blocks) == sorted(seq.blocks) and len(auto.blocks) == 2
    for k in auto.blocks:
        np.testing.assert_array_equal(
            auto.blocks[k].raw_scores, seq.blocks[k].raw_scores
        )

    # the TEST side must apply the same guard: score_cubes on float cubes
    # must never touch the uint8-buffered grid scorer
    import vec_vad_tpu.train.grid_trainer as gt_mod
    from vec_vad_tpu.pipeline import score_cubes

    real = gt_mod.get_grid_trainer

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("float cubes routed to the grid scorer")

    gt_mod.get_grid_trainer = boom
    try:
        sc = score_cubes(auto, cubes, trainer=trainer)
    finally:
        gt_mod.get_grid_trainer = real
    assert np.isfinite(sc).all()


def test_flow_config_without_flow_trains_raw_only():
    """A two-stream CONFIG whose cubes carry no flow stream must produce
    of_stats=None blocks (the documented raw-only degradation marker)
    with finite weights and raw scores. Regression: the 1-row dummy
    of_buf was gathered with real cube indices, and jnp.take's NaN-fill
    OOB mode silently NaN'd the flow UNet and its training scores —
    serving such a model emitted nan frame scores."""
    import jax

    from vec_vad_tpu.config import (
        CompletionConfig,
        ForegroundConfig,
        PipelineConfig,
    )
    from vec_vad_tpu.pipeline import make_trainer

    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=16, max_boxes_per_frame=8),
        model=CompletionConfig(
            nf=4, epochs=1, batch_size=8, context_of_num=0, use_flow=True
        ),
    )
    tr = make_trainer(cfg)
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (20, 16, 16, 15), dtype=np.uint8)
    blk = tr.fit_block(raw, None)
    assert blk.of_scores is None and blk.of_stats is None
    assert np.isfinite(blk.raw_scores).all()
    for leaf in jax.tree_util.tree_leaves(blk.params):
        assert np.isfinite(np.asarray(leaf)).all()

    # the grid fan-out path must degrade identically
    from vec_vad_tpu.parallel.mesh import get_mesh
    from vec_vad_tpu.train.grid_trainer import GridTrainer

    gt = GridTrainer(tr.net, cfg.model, get_mesh(jax.devices()[:1]), 16)
    blocks = gt.fit_blocks(
        [((0, 0, 0), raw, None), ((0, 0, 1), raw[:10], None)]
    )
    for b in blocks.values():
        assert b.of_scores is None and b.of_stats is None
        assert np.isfinite(b.raw_scores).all()


def test_fit_block_budget_phases(rng):
    """fit_block_budget (VERDICT r4 item 2) itemizes the resident fit's
    wall into the documented phases, every phase positive, the total
    consistent, and the measured trajectory identical to fit_block's
    (same seed -> same schedule -> same scores)."""
    cfg = CompletionConfig(
        nf=4, epochs=2, batch_size=16, context_of_num=0, use_flow=False
    )
    net = make_completion_net(cfg)
    trainer = BlockTrainer(net, cfg, get_mesh(), patch_size=16)
    raw = rng.integers(0, 256, (40, 16, 16, 15)).astype(np.uint8)

    budget = trainer.fit_block_budget(raw, None, seed=3)
    phases = (
        "init_state_s", "schedule_host_s", "upload_s", "train_scan_s",
        "score_pass_s", "param_download_s",
    )
    assert set(budget) == set(phases) | {"total_s"}
    for p in phases:
        assert budget[p] >= 0.0
    assert abs(budget["total_s"] - sum(budget[p] for p in phases)) < 1e-9
    # the budget run IS a fit_block (same path, same order): its final
    # state reproduces fit_block's training scores for the same seed
    blk = trainer.fit_block(raw, None, seed=3)
    state = trainer.init_state(3)
    rng2 = np.random.default_rng(3)
    state, _, _ = trainer._fit_resident(state, raw, None, rng2, 0)
    r, _ = trainer.score_block(state, raw, None)
    np.testing.assert_allclose(r, blk.raw_scores, rtol=1e-6)


def test_init_state_jit_matches_eager(rng):
    """init_state compiles the flax/optax init into ONE program (the
    eager path launched ~1 executable per param leaf — 1.17 s/block at
    flagship scale, PROFILE.md section 7). The compiled init must be
    bit-identical to eager net.init, and seed must stay a traced arg
    (two seeds, one executable, different params)."""
    cfg = CompletionConfig(
        nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=True
    )
    net = make_completion_net(cfg)
    trainer = BlockTrainer(net, cfg, get_mesh(), patch_size=16)

    state = trainer.init_state(11)
    x = np.zeros((1, 16, 16, net.tot_raw_num * net.raw_channels), np.float32)
    x_of = np.zeros((1, 16, 16, net.tot_of_num * net.of_channels), np.float32)
    eager = net.init(jax.random.key(11), x, x_of, False)
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(eager["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(state.batch_stats),
        jax.tree.leaves(eager["batch_stats"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    other = trainer.init_state(12)
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(other.params)
        )
        if np.asarray(a).size > 1
    ]
    assert max(diffs) > 0.0  # the seed is live, not baked in


def test_download_weights_matches_device_get(rng):
    """The packed single-buffer weight download must reproduce per-leaf
    device_get bit-exactly (shapes, dtypes, tree structure, values) —
    it feeds TrainedBlock and every artifact/export path."""
    cfg = CompletionConfig(
        nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=False
    )
    net = make_completion_net(cfg)
    trainer = BlockTrainer(net, cfg, get_mesh(), patch_size=16)
    state = trainer.init_state(3)

    params_p, stats_p = trainer._download_weights(state)
    params_e = jax.device_get(state.params)
    stats_e = jax.device_get(state.batch_stats)
    assert jax.tree_util.tree_structure(
        params_p
    ) == jax.tree_util.tree_structure(params_e)
    for a, b in zip(jax.tree.leaves(params_p), jax.tree.leaves(params_e)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(stats_p), jax.tree.leaves(stats_e)):
        np.testing.assert_array_equal(a, b)

    # mixed-dtype trees fall back to device_get (packed path is f32-only)
    mixed = state.replace(
        params=jax.tree.map(
            lambda l: l.astype("bfloat16") if l.ndim > 1 else l, state.params
        )
    )
    params_m, _ = trainer._download_weights(mixed)
    for a, b in zip(
        jax.tree.leaves(params_m), jax.tree.leaves(mixed.params)
    ):
        assert a.dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(a, np.asarray(b))
