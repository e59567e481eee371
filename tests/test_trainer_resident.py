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
