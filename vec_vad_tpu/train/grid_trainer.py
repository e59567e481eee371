"""Mesh-parallel training/scoring of the (scene, h, w) model-block grid.

The reference trains the grid of independent per-block models strictly
sequentially (train.py:270-296,364-431) and scores one block at a time
(test.py:277-348). The blocks share nothing — the grid is an embarrassingly
parallel axis. TPU-native design: stack every block's state along a leading
`G` axis, vmap the whole resident training scan over it, and shard `G` over
the mesh's 'data' axis — each chip trains its own subset of blocks with
ZERO collectives (the ICI stays idle instead of carrying DataParallel-style
gradient traffic, because the parallel axis is models, not batch).

Blocks have ragged cube counts, so buffers pad to the widest block and a
per-step `active` flag keeps shorter blocks' state frozen once their
schedule is exhausted (padded steps select the old state wholesale — the
Adam moments, step count and BatchNorm statistics all stay exact).

Reference-quirk note: the reference reuses one torch module object across
blocks, so block k+1's training silently CONTINUES from block k's weights
(train.py:260-268 builds `network_architecture` once; train.py:375 wraps the
same object per block). This framework gives every block the same fresh
seed-derived init instead — independent blocks, which is what makes the
grid parallel (and what the paper describes).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec

from vec_vad_tpu.config import CompletionConfig
from vec_vad_tpu.models.completion import SelfCompletionNet
from vec_vad_tpu.train.trainer import (
    BlockModelState,
    TrainedBlock,
    make_score_step,
    make_train_step,
)

BlockKey = Tuple[int, int, int]


def get_grid_trainer(net, cfg, mesh, patch_size: int = 32) -> "GridTrainer":
    """Memoized GridTrainer constructor.

    The grid train/score executables live in per-instance jit caches; on
    this backend a first compile costs tens of seconds, so repeated scoring
    calls (runner loops, benchmarks) must reuse one instance per
    (net, cfg, mesh, patch_size) — all hashable frozen dataclasses/Mesh.
    """
    return _get_grid_trainer_cached(net, cfg, mesh, int(patch_size))


@lru_cache(maxsize=8)
def _get_grid_trainer_cached(net, cfg, mesh, patch_size):
    return GridTrainer(net, cfg, mesh, patch_size)


def _tree_select(flag, new_tree, old_tree):
    """Elementwise state select on a scalar flag (inactive steps keep the
    old state bit-for-bit: params, Adam moments, step AND BatchNorm stats)."""
    return jax.tree.map(lambda a, b: jnp.where(flag, a, b), new_tree, old_tree)


def _tree_stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


class GridTrainer:
    """Trains/scores many independent blocks concurrently over the mesh."""

    def __init__(
        self,
        net: SelfCompletionNet,
        cfg: CompletionConfig,
        mesh: Mesh,
        patch_size: int = 32,
    ):
        self.net = net
        self.cfg = cfg
        self.mesh = mesh
        self.patch_size = patch_size
        self.tx = optax.adam(learning_rate=cfg.learning_rate, eps=cfg.adam_eps)
        self.n_devices = int(np.prod(mesh.devices.shape))
        self._stacked_init_jit = None  # lazy; one executable per grid width
        self._grid_pack_out = None  # lazy jitted weight-download packer
        self._build()

    # -- compiled grid programs ---------------------------------------------

    def _build(self) -> None:
        net, cfg = self.net, self.cfg
        train_step = make_train_step(net, cfg, self.tx)
        score_step = make_score_step(net, cfg)
        multi = self.n_devices > 1

        def sharded_jit(fn, **kw):
            if multi:
                try:
                    from jax import shard_map
                except ImportError:  # older jax
                    from jax.experimental.shard_map import shard_map

                fn = shard_map(
                    fn,
                    mesh=self.mesh,
                    in_specs=PartitionSpec("data"),
                    out_specs=PartitionSpec("data"),
                )
            return jax.jit(fn, **kw)

        def one_block_train(state, raw_u8, of_buf, idx, wmask, active):
            def body(st, step_inputs):
                ii, w, act = step_inputs
                x = jnp.take(raw_u8, ii, axis=0, mode="clip").astype(jnp.float32) / 255.0
                if cfg.use_flow:
                    # minimum-clamp: a flow-less fit passes a 1-row dummy of_buf
                    # and jnp.take's default OOB mode FILLS WITH NaN —
                    # which silently NaN'd the flow UNet (its loss reads
                    # x_of as the target) while the raw stream trained on
                    # (clamped reads return the dummy's zero row)
                    x_of = jnp.take(
                        of_buf, jnp.minimum(ii, of_buf.shape[0] - 1), axis=0,
                        mode="clip",
                    )
                else:
                    x_of = jnp.zeros(
                        x.shape[:-1] + (net.tot_of_num * net.of_channels,)
                    )
                new_st, metrics = train_step(st, x, x_of, w)
                st = _tree_select(act, new_st, st)
                return st, metrics["loss_raw"]

            return jax.lax.scan(body, state, (idx, wmask, active))

        # The model already vmaps its erased-position ensemble through the
        # conv feature-group trick, so a second vmap over blocks would not
        # compose (grouped-conv clash). The right distribution is spatial
        # anyway: shard_map the G axis over the mesh, and each device runs
        # its local blocks sequentially (lax.map) — blocks are independent,
        # so XLA emits ZERO collectives and all chips train concurrently.
        def grid_train(states, raw, of, idx, wmask, active):
            return jax.lax.map(
                lambda args: one_block_train(*args),
                (states, raw, of, idx, wmask, active),
            )

        self._grid_train = sharded_jit(grid_train, donate_argnums=(0,))

        def one_block_score(state, raw_u8, of_buf, idx):
            def body(ii):
                x = jnp.take(raw_u8, ii, axis=0, mode="clip").astype(jnp.float32) / 255.0
                if cfg.use_flow:
                    # minimum-clamp: a flow-less fit passes a 1-row dummy of_buf
                    # and jnp.take's default OOB mode FILLS WITH NaN —
                    # which silently NaN'd the flow UNet (its loss reads
                    # x_of as the target) while the raw stream trained on
                    # (clamped reads return the dummy's zero row)
                    x_of = jnp.take(
                        of_buf, jnp.minimum(ii, of_buf.shape[0] - 1), axis=0,
                        mode="clip",
                    )
                else:
                    x_of = jnp.zeros(
                        x.shape[:-1] + (net.tot_of_num * net.of_channels,)
                    )
                return score_step(state, x, x_of)

            return jax.lax.map(body, idx)

        def grid_score(states, raw, of, idx):
            return jax.lax.map(
                lambda args: one_block_score(*args), (states, raw, of, idx)
            )

        self._grid_score = sharded_jit(grid_score)

    # -- host-side orchestration ---------------------------------------------

    def _stacked_init(self, g: int, seed: int) -> BlockModelState:
        """G copies of the same fresh init (train_model reuses one seed for
        every block, trainer.fit_block semantics).

        One compiled program per grid width: eager flax init + optax Adam
        init + the per-leaf broadcast launch ~3 small executables per param
        leaf on this backend (~300 relay dispatches/grid — same pathology
        the flagship trainer's init had, PROFILE.md §7). `g` is static (one
        executable per distinct grid width, cached by jit), the seed is
        traced (one executable serves every seed)."""
        p = self.patch_size
        net, tx = self.net, self.tx

        def init_fn(gg, seed_arr):
            x = jnp.zeros((1, p, p, net.tot_raw_num * net.raw_channels))
            x_of = jnp.zeros((1, p, p, net.tot_of_num * net.of_channels))
            variables = net.init(jax.random.key(seed_arr), x, x_of, False)
            params = variables["params"]
            state = BlockModelState(
                params=params,
                batch_stats=variables["batch_stats"],
                opt_state=tx.init(params),
                step=jnp.zeros((), jnp.int32),
            )
            return jax.tree.map(
                lambda v: jnp.broadcast_to(v[None], (gg,) + v.shape), state
            )

        if self._stacked_init_jit is None:
            self._stacked_init_jit = jax.jit(init_fn, static_argnums=0)
        return self._stacked_init_jit(g, jnp.uint32(seed))

    @staticmethod
    def _uniform_has_flow(block_data) -> bool:
        """Whether the blocks carry a flow stream; a MIXED list would
        either crash mid-fill (of_buf[bi] = None) or silently discard
        later blocks' flow cubes — reject it (the pipeline always passes
        a uniform stream)."""
        flows_present = [of is not None for _, _, of in block_data]
        if any(flows_present) and not all(flows_present):
            raise ValueError(
                "block_data mixes flow and flow-less blocks; pass a "
                "uniform flow stream"
            )
        return flows_present[0]

    def fit_blocks(
        self,
        block_data: List[Tuple[BlockKey, np.ndarray, Optional[np.ndarray]]],
        seed: int = 0,
        log_every: int = 0,
    ) -> Dict[BlockKey, TrainedBlock]:
        """Train every block concurrently; returns {key: TrainedBlock}.

        block_data: per block (key, raw_cubes, flow_cubes_or_None); raw may
        be uint8 (preferred storage) or [0,1] float. Each block follows the
        exact schedule trainer.fit_block would use for it alone: fresh init
        from `seed`, np.random.default_rng(seed) shuffles, wrap-padded final
        batches with zero loss weights.
        """
        cfg = self.cfg
        bsz = cfg.batch_size
        g_real = len(block_data)
        if g_real == 0:
            return {}
        g = -(-g_real // self.n_devices) * self.n_devices  # pad to mesh width
        counts = [raw.shape[0] for _, raw, _ in block_data]
        n_max = max(counts)
        steps_max = cfg.epochs * (-(-n_max // bsz))
        p = self.patch_size
        tc = self.net.tot_raw_num * self.net.raw_channels
        oc = self.net.tot_of_num * self.net.of_channels
        has_flow = cfg.use_flow and self._uniform_has_flow(block_data)

        raw_buf = np.zeros((g, n_max, p, p, tc), np.uint8)
        of_buf = (
            np.zeros((g, n_max, p, p, oc), np.float32)
            if has_flow
            else np.zeros((g, 1, p, p, oc), np.float32)
        )
        idx = np.zeros((g, steps_max, bsz), np.int32)
        wmask = np.zeros((g, steps_max, bsz), np.float32)
        active = np.zeros((g, steps_max), bool)

        for bi, (key, raw, of) in enumerate(block_data):
            n = raw.shape[0]
            if raw.dtype != np.uint8:
                raw = np.clip(np.round(raw * 255.0), 0, 255).astype(np.uint8)
            raw_buf[bi, :n] = raw
            if has_flow:
                of_buf[bi, :n] = of
            steps_per_epoch = -(-n // bsz)
            rng = np.random.default_rng(seed)
            row = 0
            for _ in range(cfg.epochs):
                order = rng.permutation(n)
                pad = steps_per_epoch * bsz - n
                # cyclic pad: pad may exceed n for blocks smaller than a
                # batch (order[:pad] would truncate); padded slots carry
                # zero loss weight so their content is irrelevant
                sched = np.concatenate([order, np.resize(order, pad)])
                w = np.concatenate(
                    [np.ones(n, np.float32), np.zeros(pad, np.float32)]
                )
                for s in range(steps_per_epoch):
                    idx[bi, row] = sched[s * bsz : (s + 1) * bsz]
                    wmask[bi, row] = w[s * bsz : (s + 1) * bsz]
                    active[bi, row] = True
                    row += 1

        states = self._stacked_init(g, seed)
        states, losses = self._grid_train(
            states,
            jnp.asarray(raw_buf),
            jnp.asarray(of_buf),
            jnp.asarray(idx),
            jnp.asarray(wmask),
            jnp.asarray(active),
        )
        if log_every:
            lr = np.asarray(losses)
            for s in range(0, lr.shape[1], max(1, log_every)):
                print(f"grid step {s}: raw {lr[:g_real, s]}")

        # training-score pass over every block's own cubes (one call)
        raw_sc, of_sc = self._score_stacked(
            states, raw_buf, of_buf, counts, g
        )

        host_params, host_stats = self._download_grid_weights(states)
        out: Dict[BlockKey, TrainedBlock] = {}
        for bi, (key, raw, of) in enumerate(block_data):
            n = counts[bi]
            out[key] = TrainedBlock(
                params=jax.tree.map(lambda v: v[bi], host_params),
                batch_stats=jax.tree.map(lambda v: v[bi], host_stats),
                raw_scores=raw_sc[bi, :n],
                # has_flow, not use_flow: a flow-less fit must mark its
                # blocks of_stats=None (raw-only fusion), like fit_block
                of_scores=of_sc[bi, :n] if has_flow else None,
            )
        return out

    def _download_grid_weights(self, states):
        """(params, batch_stats) of the whole stacked grid to host — as
        ONE packed f32 buffer, and WITHOUT the Adam state. A plain
        device_get(states) paid per-leaf transfer round trips (~100
        leaves) AND shipped opt_state — 2x the param bytes, discarded
        immediately (TrainedBlock keeps weights + stats only). Mixed
        dtypes fall back to device_get of just the two needed subtrees."""
        from vec_vad_tpu.serve._common import _download_f32_tree

        out, self._grid_pack_out = _download_f32_tree(
            (states.params, states.batch_stats), self._grid_pack_out
        )
        return out

    def _score_stacked(self, states, raw_buf, of_buf, counts, g):
        bsz = self.cfg.batch_size
        n_max = raw_buf.shape[1]
        n_pad = -(-n_max // bsz) * bsz
        rows = np.zeros((g, n_pad // bsz, bsz), np.int32)
        flat = np.concatenate(
            [np.arange(n_max), np.zeros(n_pad - n_max, np.int64)]
        ).reshape(-1, bsz)
        rows[:] = flat[None]
        # opt_state dropped (free device-side): scoring ignores it, and
        # this keeps the executable structure identical to score_blocks'
        # opt_state=None states — one compiled grid_score serves both
        r, o = self._grid_score(
            states.replace(opt_state=None),
            jnp.asarray(raw_buf), jnp.asarray(of_buf), jnp.asarray(rows)
        )
        return (
            np.asarray(r).reshape(g, -1),
            np.asarray(o).reshape(g, -1),
        )

    def score_blocks(
        self,
        blocks: Dict[BlockKey, TrainedBlock],
        block_data: List[Tuple[BlockKey, np.ndarray, Optional[np.ndarray]]],
        batch_size: Optional[int] = None,
    ) -> Dict[BlockKey, Tuple[np.ndarray, np.ndarray]]:
        """Eval-mode (raw, of) scores for many blocks in ONE device call.

        block_data lists each block's test cubes; `blocks` provides the
        trained weights. Returns {key: (raw_scores, of_scores)} in cube
        order. Device-call count is O(1) in the number of blocks — the
        resident-path answer to the reference's per-(frame, block) loop
        (test.py:277-348).
        """
        cfg = self.cfg
        bsz = batch_size or cfg.batch_size
        g_real = len(block_data)
        if g_real == 0:
            return {}
        g = -(-g_real // self.n_devices) * self.n_devices
        counts = [raw.shape[0] for _, raw, _ in block_data]
        n_max = max(counts)
        p = self.patch_size
        tc = self.net.tot_raw_num * self.net.raw_channels
        oc = self.net.tot_of_num * self.net.of_channels
        has_flow = cfg.use_flow and self._uniform_has_flow(block_data)

        raw_buf = np.zeros((g, n_max, p, p, tc), np.uint8)
        of_buf = (
            np.zeros((g, n_max, p, p, oc), np.float32)
            if has_flow
            else np.zeros((g, 1, p, p, oc), np.float32)
        )
        states = []
        template = None
        for bi, (key, raw, of) in enumerate(block_data):
            n = raw.shape[0]
            if raw.dtype != np.uint8:
                raw = np.clip(np.round(raw * 255.0), 0, 255).astype(np.uint8)
            raw_buf[bi, :n] = raw
            if has_flow:
                of_buf[bi, :n] = of
            b = blocks[key]
            # opt_state=None: scoring never reads it, a real tx.init here
            # launched ~1 tiny zeros executable per param leaf PER BLOCK,
            # and the stacked Adam zeros (2x the param bytes) would ride
            # the upload only to be ignored
            template = BlockModelState(
                params=b.params,
                batch_stats=b.batch_stats,
                opt_state=None,
                step=jnp.zeros((), jnp.int32),
            )
            states.append(template)
        states += [template] * (g - g_real)
        stacked = _tree_stack(states)

        n_pad = -(-n_max // bsz) * bsz
        rows = np.broadcast_to(
            np.concatenate(
                [np.arange(n_max), np.zeros(n_pad - n_max, np.int64)]
            ).reshape(1, -1, bsz),
            (g, n_pad // bsz, bsz),
        ).astype(np.int32)
        r, o = self._grid_score(
            stacked, jnp.asarray(raw_buf), jnp.asarray(of_buf),
            jnp.asarray(rows),
        )
        r = np.asarray(r).reshape(g, -1)
        o = np.asarray(o).reshape(g, -1)
        return {
            key: (r[bi, : counts[bi]], o[bi, : counts[bi]])
            for bi, (key, _, _) in enumerate(block_data)
        }
