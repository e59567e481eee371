"""Mesh-parallel block-grid training/scoring (train/grid_trainer.py) vs the
sequential per-block path — the TPU fan-out replacing the reference's
sequential grid loops (train.py:270-296, test.py:277-348). The suite runs on
an 8-virtual-device CPU mesh (conftest), so the G-axis sharding actually
executes multi-device."""

import numpy as np
import pytest

from vec_vad_tpu.config import (
    CompletionConfig,
    DatasetSpec,
    ForegroundConfig,
    PipelineConfig,
    register_dataset,
)
from vec_vad_tpu.data.synthetic import make_synthetic_dataset
from vec_vad_tpu.data.video_index import VideoIndex
from vec_vad_tpu.eval.metrics import roc_auc_score
from vec_vad_tpu.pipeline import (
    extract_cube_set,
    frame_level_scores,
    group_by_block,
    make_trainer,
    score_cubes,
    train_model,
)


@pytest.fixture(scope="module")
def grid_world():
    ds = make_synthetic_dataset(
        frames_per_video=24, n_train_videos=2, n_test_videos=2,
        frame_h=48, frame_w=64, seed=11,
    )
    spec = DatasetSpec(
        name="synthGrid", frame_h=48, frame_w=64, file_ext=".tif",
        scene_num=1, ap_score_thr=0.5, ap_min_area=16.0, cover_thr=0.6,
        mt_area_thr=16.0, mt_binary_thr=18.0, mt_extend=2,
        mt_gauss_mask_size=3,
    )
    register_dataset(spec)
    cfg = PipelineConfig(
        dataset_name="synthGrid",
        fore=ForegroundConfig(
            patch_size=16, max_boxes_per_frame=8, h_block=2, w_block=2,
        ),
        model=CompletionConfig(
            nf=4, epochs=2, batch_size=16, context_of_num=0, use_flow=False,
        ),
    )
    train_idx = VideoIndex(["t0", "t1"], ds.train_video_lengths)
    test_idx = VideoIndex(["s0", "s1"], ds.test_video_lengths)
    train_cubes = extract_cube_set(
        cfg, spec, train_idx, ds.train_frames, ds.train_boxes
    )
    test_cubes = extract_cube_set(
        cfg, spec, test_idx, ds.test_frames, ds.test_boxes,
        block_mode=cfg.fore.test_block_mode,
    )
    return ds, cfg, train_cubes, test_cubes, test_idx


def test_grid_routing_spreads_blocks(grid_world):
    _, cfg, train_cubes, _, _ = grid_world
    groups = group_by_block(train_cubes)
    assert len([k for k, v in groups.items() if v.size > 1]) >= 2


def test_grid_parallel_matches_sequential(grid_world):
    """Same seed, same schedules: the vmapped/sharded grid must reproduce the
    sequential per-block trainer (up to fp reassociation)."""
    ds, cfg, train_cubes, test_cubes, test_idx = grid_world
    trainer = make_trainer(cfg)
    m_par = train_model(
        cfg, train_cubes, trainer=trainer, seed=3, parallel_blocks=True
    )
    m_seq = train_model(
        cfg, train_cubes, trainer=trainer, seed=3, parallel_blocks=False
    )
    assert set(m_par.blocks) == set(m_seq.blocks)
    assert len(m_par.blocks) >= 2
    for key in m_seq.blocks:
        a, b = m_par.blocks[key], m_seq.blocks[key]
        np.testing.assert_allclose(
            a.raw_scores, b.raw_scores, rtol=2e-3, atol=1e-4
        )

    # stacked multi-block scoring path == sequential scoring path
    s_par = score_cubes(m_par, test_cubes, trainer=trainer)
    # big_number rows (untrained blocks) must agree exactly
    s_seq = np.zeros(test_cubes.size)
    for key, idx in group_by_block(test_cubes).items():
        blk = m_seq.blocks.get(key)
        if blk is None:
            s_seq[idx] = 100000.0
            continue
        raw_sc, _ = trainer.score_block(blk, test_cubes.raw[idx], None)
        mu, sd = blk.raw_stats
        s_seq[idx] = cfg.model.w_raw * (raw_sc - mu) / sd
    np.testing.assert_allclose(s_par, s_seq, rtol=5e-3, atol=1e-3)


def test_grid_end_to_end_auroc_matches_sequential(grid_world):
    """Absolute detection quality on a 2x2 grid of a micro-dataset is poor by
    construction (tiny per-block training sets make z-norms incomparable
    across blocks — a recipe property, reference-faithful). The invariant
    worth pinning is that the parallel grid path changes NOTHING about the
    end-to-end result vs the sequential path."""
    ds, cfg, train_cubes, test_cubes, test_idx = grid_world
    trainer = make_trainer(cfg)
    aurocs = []
    for par in (True, False):
        model = train_model(
            cfg, train_cubes, trainer=trainer, seed=0, parallel_blocks=par
        )
        scores = score_cubes(model, test_cubes, trainer=trainer)
        frame_scores = frame_level_scores(
            scores, test_cubes, test_idx.total_frames
        )
        aurocs.append(roc_auc_score(frame_scores, ds.test_labels))
    assert abs(aurocs[0] - aurocs[1]) < 5e-3, aurocs


def test_grid_parallel_two_stream_matches_sequential(grid_world):
    """The grid fan-out's FLOW stream (of_buf gathers + of training
    scores) must reproduce the sequential trainer too — raw-only
    coverage would have missed a flow-side regression (e.g. the
    jnp.take NaN-fill dummy-buffer bug)."""
    ds, cfg_raw, _, _, _ = grid_world
    import dataclasses

    from vec_vad_tpu.config import DATASETS

    cfg = cfg_raw.replace(
        model=dataclasses.replace(cfg_raw.model, use_flow=True)
    )
    spec = DATASETS["synthGrid"]
    train_idx = VideoIndex(["t0", "t1"], ds.train_video_lengths)
    d = np.diff(
        ds.train_frames.astype(np.float32).mean(-1), axis=0,
        append=ds.train_frames[-1:].mean(-1),
    )
    tr_flow = np.stack([d, -d], axis=-1) / 25.0
    cubes = extract_cube_set(
        cfg, spec, train_idx, ds.train_frames, ds.train_boxes,
        flow_frames=tr_flow,
    )
    trainer = make_trainer(cfg)
    m_par = train_model(
        cfg, cubes, trainer=trainer, seed=5, parallel_blocks=True
    )
    m_seq = train_model(
        cfg, cubes, trainer=trainer, seed=5, parallel_blocks=False
    )
    assert set(m_par.blocks) == set(m_seq.blocks) and len(m_par.blocks) >= 2
    for key in m_seq.blocks:
        a, b = m_par.blocks[key], m_seq.blocks[key]
        assert a.of_scores is not None and b.of_scores is not None
        np.testing.assert_allclose(
            a.raw_scores, b.raw_scores, rtol=2e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            a.of_scores, b.of_scores, rtol=2e-3, atol=1e-4
        )


def test_grid_stacked_init_matches_trainer_init(grid_world):
    """_stacked_init is now one jitted program per grid width (the eager
    path launched ~3 tiny executables per param leaf); it must equal the
    flagship trainer's jitted init broadcast G times, bit-for-bit, and
    keep the seed live (traced, not baked into the executable)."""
    import jax

    from vec_vad_tpu.parallel.mesh import get_mesh
    from vec_vad_tpu.train.grid_trainer import get_grid_trainer
    from vec_vad_tpu.train.trainer import BlockTrainer

    _, cfg, *_ = grid_world
    gt = get_grid_trainer(
        make_trainer(cfg).net, cfg.model, get_mesh(),
        patch_size=cfg.fore.patch_size,
    )
    bt = BlockTrainer(
        gt.net, cfg.model, get_mesh(), patch_size=cfg.fore.patch_size
    )
    stacked = gt._stacked_init(8, seed=5)
    single = bt.init_state(5)
    for a, b in zip(
        jax.tree.leaves((stacked.params, stacked.batch_stats)),
        jax.tree.leaves((single.params, single.batch_stats)),
    ):
        a = np.asarray(a)
        assert a.shape[0] == 8
        np.testing.assert_array_equal(a, np.broadcast_to(b, a.shape))

    other = gt._stacked_init(8, seed=6)
    diffs = [
        float(np.abs(np.asarray(x) - np.asarray(y)).max())
        for x, y in zip(
            jax.tree.leaves(stacked.params), jax.tree.leaves(other.params)
        )
        if np.asarray(x).size > 8
    ]
    assert max(diffs) > 0.0
