"""Per-block training of the completion ensemble under jit + data sharding.

Reference semantics (train.py:240-437):
  * per (scene, h, w) block with >1 cubes: fresh model, Adam(lr=1e-3,
    eps=1e-7, weight_decay=0), `epochs` passes over shuffled batches of
    `batch_size`, loss = lambda_raw*MSE(raw) + lambda_of*MSE(of) with
    detached targets (train.py:307-314)
  * afterwards one unshuffled eval-mode forward pass collecting per-cube
    scores: squared error summed over (channels, H, W) (train.py:349-355),
    whose mean/std later z-normalize test scores (test.py:264-266)

TPU redesign: fixed-shape batches (wrap-padded + weight-masked) so every
step hits one compiled executable; batch axis sharded over the mesh's
'data' axis with replicated params — XLA emits the gradient psum over ICI.
The reference's partial final batch is reproduced exactly by the weight
mask (masked batch-mean == torch MSELoss mean over the partial batch).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh

from vec_vad_tpu.config import CompletionConfig
from vec_vad_tpu.models.completion import SelfCompletionNet
from vec_vad_tpu.parallel.mesh import (
    data_sharding,
    pad_to_multiple,
    replicated_sharding,
)


class BlockModelState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


@dataclass
class TrainedBlock:
    """Artifact of one block's training: weights + score statistics
    (the coupling the reference persists via model_set +
    *_training_scores_set, train.py:432-436)."""

    params: Any
    batch_stats: Any
    raw_scores: np.ndarray
    of_scores: Optional[np.ndarray]

    @property
    def raw_stats(self) -> Tuple[float, float]:
        return float(np.mean(self.raw_scores)), float(np.std(self.raw_scores))

    @property
    def of_stats(self) -> Optional[Tuple[float, float]]:
        if self.of_scores is None:
            return None
        return float(np.mean(self.of_scores)), float(np.std(self.of_scores))


def _masked_mean_sq(err: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Mean of err^2 over everything, weighting batch elements by w.

    err is (E, B, P, P, C); w is (B,). Equals torch MSELoss (mean) over the
    unpadded batch when w is the 0/1 pad mask."""
    per_elem = jnp.mean(jnp.square(err), axis=(0, 2, 3, 4))  # (B,)
    return jnp.sum(per_elem * w) / jnp.maximum(jnp.sum(w), 1.0)


def _cube_scores(err: jnp.ndarray) -> jnp.ndarray:
    """Per-cube squared error summed over (members, H, W, C) — the
    reference's channel-concatenated MSE sum (train.py:349-355)."""
    return jnp.sum(jnp.square(err), axis=(0, 2, 3, 4))


def make_loss_fn(net: SelfCompletionNet, cfg: CompletionConfig):
    """Training loss closure shared by the single-block and grid trainers.

    compute_dtype='bfloat16' runs the forward/backward in bf16 (params and
    activations cast inside the loss, so the differentiated cast yields f32
    gradients for the f32 master params); the loss/error reduction and the
    Adam state stay f32. The reference trains pure f32 (train.py:383-402)."""
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def loss_fn(params, batch_stats, x, x_of, w):
        if dt != jnp.float32:
            params = jax.tree.map(lambda p: p.astype(dt), params)
            x = x.astype(dt)
            x_of = x_of.astype(dt) if x_of is not None else None
        # masked_bn: the pad mask also drives BatchNorm statistics, so a
        # wrap-padded final batch trains exactly like the reference's bare
        # partial batch (train.py:383-402)
        bw = w if cfg.masked_bn else None
        out, mutated = net.apply(
            {"params": params, "batch_stats": batch_stats},
            x, x_of, True, bw, mutable=["batch_stats"],
        )
        err_raw = (out.raw_out - out.raw_tgt).astype(jnp.float32)
        loss_raw = _masked_mean_sq(err_raw, w)
        if cfg.use_flow and out.of_out is not None:
            err_of = (out.of_out - out.of_tgt).astype(jnp.float32)
            loss_of = _masked_mean_sq(err_of, w)
            loss = cfg.lambda_raw * loss_raw + cfg.lambda_of * loss_of
        else:
            loss_of = jnp.zeros(())
            loss = loss_raw
        return loss, (mutated["batch_stats"], loss_raw, loss_of)

    return loss_fn


def make_train_step(net: SelfCompletionNet, cfg: CompletionConfig, tx):
    """One Adam step on one batch (train.py:383-402 semantics)."""
    loss_fn = make_loss_fn(net, cfg)

    def train_step(state: BlockModelState, x, x_of, w):
        grads, (new_bs, loss_raw, loss_of) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x, x_of, w
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, {"loss_raw": loss_raw, "loss_of": loss_of}

    return train_step


def make_score_step(net: SelfCompletionNet, cfg: CompletionConfig):
    """Eval-mode per-cube (raw, of) score batch (train.py:412-427)."""

    def score_step(state: BlockModelState, x, x_of):
        out = net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, x_of, False,
        )
        raw = _cube_scores(out.raw_out - out.raw_tgt)
        if cfg.use_flow and out.of_out is not None:
            of = _cube_scores(out.of_out - out.of_tgt)
        else:
            of = jnp.zeros_like(raw)
        return raw, of

    return score_step


class BlockTrainer:
    """Compiles and runs training/scoring for completion-net blocks."""

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
        self.tx = optax.adam(
            learning_rate=cfg.learning_rate, eps=cfg.adam_eps
        )
        self._build()

    # -- compiled steps -----------------------------------------------------

    def _build(self) -> None:
        net, cfg, tx = self.net, self.cfg, self.tx
        # Sharding annotations exist to shard the batch over multi-chip
        # meshes. On a single device they are pure overhead — measured 10x
        # slower scan steps when with_sharding_constraint combines with
        # pjit in_shardings — so they apply only when the mesh is real.
        multi = int(np.prod(self.mesh.devices.shape)) > 1
        rep = replicated_sharding(self.mesh) if multi else None
        dat = data_sharding(self.mesh) if multi else None

        def constrain(x):
            if multi:
                return jax.lax.with_sharding_constraint(x, dat)
            return x

        def sharded_jit(fn, in_s, out_s, **kw):
            if multi:
                return jax.jit(fn, in_shardings=in_s, out_shardings=out_s, **kw)
            return jax.jit(fn, **kw)

        train_step = make_train_step(net, cfg, tx)
        score_step = make_score_step(net, cfg)

        self._train_step = sharded_jit(
            train_step,
            (rep, dat, dat, dat),
            (rep, rep),
            donate_argnums=(0,),
        )
        self._score_step = sharded_jit(
            score_step,
            (rep, dat, dat),
            (dat, dat),
        )

        # Whole-training-run executable: lax.scan over every step with the
        # cube set device-resident. One host->device round trip per BLOCK
        # instead of per batch — the training analog of the resident
        # inference path (25 ms tunnel RTT x hundreds of steps otherwise).
        def train_scan(state: BlockModelState, raw_u8, of_buf, idx, wmask):
            # raw_u8: (N, P, P, TC) uint8; of_buf: (N, P, P, OC) f32 or
            # (1, ...) dummy; idx/wmask: (steps, batch)
            def body(st, step_inputs):
                ii, w = step_inputs
                x = constrain(
                    jnp.take(raw_u8, ii, axis=0, mode="clip").astype(jnp.float32) / 255.0
                )
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
                x_of = constrain(x_of)
                st, metrics = train_step(st, x, x_of, w)
                return st, (metrics["loss_raw"], metrics["loss_of"])

            return jax.lax.scan(body, state, (idx, wmask))

        self._train_scan = sharded_jit(
            train_scan,
            (rep, rep, rep, rep, rep),
            (rep, rep),
            donate_argnums=(0,),
        )

        # Whole-split scoring in one call (same rationale as train_scan).
        def make_score_scan(scale: bool):
            def score_scan(state: BlockModelState, raw_buf, of_buf, idx):
                def body(ii):
                    x = jnp.take(raw_buf, ii, axis=0, mode="clip").astype(jnp.float32)
                    if scale:
                        x = x / 255.0
                    if cfg.use_flow:
                        # minimum-clamp (see train_scan): the 1-row dummy
                        # of_buf + jnp.take's NaN-fill OOB mode poisoned
                        # flow-less scoring
                        x_of = jnp.take(
                            of_buf,
                            jnp.minimum(ii, of_buf.shape[0] - 1),
                            axis=0,
                            mode="clip",
                        )
                    else:
                        x_of = jnp.zeros(
                            x.shape[:-1]
                            + (net.tot_of_num * net.of_channels,)
                        )
                    return score_step(state, x, x_of)

                return jax.lax.map(body, idx)

            return sharded_jit(score_scan, (rep, rep, rep, rep), None)

        self._score_scan_u8 = make_score_scan(True)
        self._score_scan_f32 = make_score_scan(False)

        # Per-block state init as ONE compiled program. Eager flax init +
        # optax Adam init launch a small executable per param leaf on
        # this backend (~100 leaves x ~ms relay dispatch = 1.17 s/block
        # at flagship scale, 30% of a resident fit_block's wall —
        # PROFILE.md §7). The seed is a traced argument so one
        # executable serves every block of a grid.
        p = self.patch_size

        def init_fn(seed):
            x = jnp.zeros((1, p, p, net.tot_raw_num * net.raw_channels))
            x_of = jnp.zeros((1, p, p, net.tot_of_num * net.of_channels))
            variables = net.init(jax.random.key(seed), x, x_of, False)
            params = variables["params"]
            return BlockModelState(
                params=params,
                batch_stats=variables["batch_stats"],
                opt_state=tx.init(params),
                step=jnp.zeros((), jnp.int32),
            )

        self._init_jit = jax.jit(init_fn)
        self._pack_out = None  # lazy jitted weight-download packer

    # -- state management ---------------------------------------------------

    def init_state(self, seed: int) -> BlockModelState:
        return self._init_jit(jnp.uint32(seed))

    def state_from_variables(self, variables) -> BlockModelState:
        """Fresh optimizer state around given model variables — e.g. weights
        transplanted from the reference torch model via
        models.completion_convert (parity experiments, checkpoint import)."""
        params = variables["params"]
        return BlockModelState(
            params=params,
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    # -- host-side loops ----------------------------------------------------

    def fit_block(
        self,
        raw_inputs: np.ndarray,
        of_inputs: Optional[np.ndarray],
        seed: int = 0,
        log_every: int = 0,
        segments: Optional[List[Tuple[np.ndarray, Optional[np.ndarray]]]] = None,
        resident: Optional[bool] = None,
        init_state: Optional[BlockModelState] = None,
    ) -> TrainedBlock:
        """Train one block to convergence and collect training scores.

        raw_inputs: (N, P, P, T*3) float32 in [0, 1] or uint8; of_inputs:
        (N, P, P, T_of*2) or None. `segments` optionally streams extra
        (raw, of) chunks per epoch after the first (the ShanghaiTech
        saveSegNum streaming pattern, train.py:292-296).

        resident: run the whole training as one device-resident lax.scan
        (default when there are no streamed segments).
        """
        cfg = self.cfg
        state = init_state if init_state is not None else self.init_state(seed)
        rng = np.random.default_rng(seed)
        bsz = cfg.batch_size
        all_segments = [(raw_inputs, of_inputs)] + (segments or [])
        if resident is None:
            resident = not segments
        elif resident and segments:
            # the resident scan trains on raw_inputs only — silently
            # skipping the streamed segments would still score them below
            # and skew the z-normalization stats
            raise ValueError(
                "resident=True cannot stream extra segments; pass "
                "resident=False (or concatenate the segments)"
            )

        dev0 = None  # device-resident (raw, of) buffers from the train scan
        if resident:
            state, raw_dev, of_dev = self._fit_resident(
                state, raw_inputs, of_inputs, rng, log_every
            )
            # the score pass reuses the HBM cube buffer the train scan
            # uploaded — re-uploading the same cubes costs seconds over a
            # low-bandwidth link (jnp.asarray on a device array is a no-op).
            # Only when the caller's cubes are already uint8: for float
            # inputs the train buffer is quantized and scoring must keep
            # seeing the original values
            if raw_inputs.dtype == np.uint8:
                dev0 = (raw_dev, of_dev if cfg.use_flow else None)
        else:
            for epoch in range(cfg.epochs):
                for seg_raw, seg_of in all_segments:
                    n = seg_raw.shape[0]
                    order = rng.permutation(n)
                    for lo in range(0, n, bsz):
                        sel = order[lo : lo + bsz]
                        xb = seg_raw[sel]
                        ob = seg_of[sel] if seg_of is not None else None
                        state, metrics = self._step_padded(state, xb, ob)
                        if log_every and (lo // bsz) % log_every == 0:
                            lr = float(metrics["loss_raw"])
                            lo_ = float(metrics["loss_of"])
                            print(
                                f"epoch {epoch} batch {lo // bsz}: "
                                f"raw {lr:.5f} of {lo_:.5f}"
                            )

        raw_scores, of_scores = [], []
        for si, (seg_raw, seg_of) in enumerate(all_segments):
            if si == 0 and dev0 is not None:
                seg_raw, seg_of = dev0
            r, o = self.score_block(state, seg_raw, seg_of)
            raw_scores.append(r)
            of_scores.append(o)
        raw_sc = np.concatenate(raw_scores)
        # of_stats=None is the documented "trained WITHOUT a flow stream"
        # marker (serving/fusion degrade to raw-only on it) — a two-stream
        # CONFIG whose extraction had no flow tree must produce it, not a
        # zeros-scored stats pair
        has_of = cfg.use_flow and of_inputs is not None
        of_sc = np.concatenate(of_scores) if has_of else None
        params_h, stats_h = self._download_weights(state)
        return TrainedBlock(
            params=params_h,
            batch_stats=stats_h,
            raw_scores=raw_sc,
            of_scores=of_sc,
        )

    def _download_weights(self, state: BlockModelState):
        """(params, batch_stats) as host numpy trees via ONE device round
        trip: a jitted ravel-concat into a single f32 buffer, one
        download, host-side numpy unflatten. At flagship scale (92
        leaves, 43 MB) packed and per-leaf device_get are within tunnel
        variance of each other (interleaved A/B medians 2.41 vs 2.28 s
        at a 19 MB/s link window, 0.8 s at 54 MB/s — bandwidth-bound
        either way, PROFILE.md §7); packed is kept because it bounds
        the transfer count at one regardless of leaf count, which
        protects grids with many small blocks from per-leaf RTT.
        CAUTION for future A/Bs: device_get caches the host copy on
        the Array — re-downloading the same state measures 0.001 s;
        use fresh states per trial.
        Mixed-dtype trees (none today: params and batch stats are f32
        even under bf16 compute) fall back to device_get."""
        from vec_vad_tpu.serve._common import _download_f32_tree

        out, self._pack_out = _download_f32_tree(
            (state.params, state.batch_stats), self._pack_out
        )
        return out

    def _epoch_schedule(self, n: int, rng) -> Tuple[np.ndarray, np.ndarray]:
        """(idx, wmask) (steps, bsz) arrays scheduling cfg.epochs shuffled
        passes over n cubes, each epoch cyclically padded to a batch
        multiple with zero-weight slots (pad may exceed n for blocks
        smaller than a batch — np.resize wraps; same scheme as
        grid_trainer.fit_blocks)."""
        cfg = self.cfg
        bsz = cfg.batch_size
        steps_per_epoch = -(-n // bsz)
        idx_rows, w_rows = [], []
        for _ in range(cfg.epochs):
            order = rng.permutation(n)
            pad = steps_per_epoch * bsz - n
            idx_rows.append(np.concatenate([order, np.resize(order, pad)]))
            w_rows.append(
                np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
            )
        idx = np.concatenate(idx_rows).reshape(-1, bsz).astype(np.int32)
        wmask = np.concatenate(w_rows).reshape(-1, bsz)
        return idx, wmask

    def _fit_resident(self, state, raw_inputs, of_inputs, rng, log_every: int):
        """All epochs in one compiled lax.scan over a device-resident
        cube buffer. Returns (state, raw_dev_u8, of_dev) — the uploaded
        HBM buffers, so fit_block's score pass can reuse them."""
        cfg = self.cfg
        idx, wmask = self._epoch_schedule(raw_inputs.shape[0], rng)

        if raw_inputs.dtype == np.uint8:
            raw_u8 = raw_inputs
        else:
            raw_u8 = np.clip(np.round(raw_inputs * 255.0), 0, 255).astype(np.uint8)
        of_buf = (
            of_inputs.astype(np.float32)
            if (cfg.use_flow and of_inputs is not None)
            else np.zeros((1,) + raw_inputs.shape[1:-1] + (
                self.net.tot_of_num * self.net.of_channels,), np.float32)
        )
        raw_dev = jnp.asarray(raw_u8)
        of_dev = jnp.asarray(of_buf)
        state, (loss_raw, loss_of) = self._train_scan(
            state,
            raw_dev,
            of_dev,
            jnp.asarray(idx),
            jnp.asarray(wmask),
        )
        if log_every:
            lr = np.asarray(loss_raw)
            lo = np.asarray(loss_of)
            for s in range(0, lr.size, max(1, log_every)):
                print(f"step {s}: raw {lr[s]:.5f} of {lo[s]:.5f}")
        return state, raw_dev, of_dev

    def fit_block_budget(
        self, raw_inputs, of_inputs=None, seed: int = 0
    ) -> dict:
        """Itemized wall budget of one resident fit_block, in seconds —
        where the non-device time goes (VERDICT r4: fit_block walls 4-5x
        its ~1.6 s of device work at bench scale and nothing itemized
        why). Phases, each forced with block_until_ready so the async
        dispatch can't smear one phase's cost into the next:

          init_state_s       net.init + Adam-state program (per-call!)
          schedule_host_s    epoch permutations + idx/wmask build (host)
          upload_s           host uint8 cast (float cubes only) +
                             cube/idx/wmask transfers (0 if already HBM)
          train_scan_s       the whole-run lax.scan execution
          score_pass_s       the training-score scan + score download
          param_download_s   device_get(params + batch_stats)

        Runs each device phase twice and keeps the second (warm) timing,
        so one-time compiles don't masquerade as per-fit cost. The phases
        sum to a warm fit_block wall (same code path, same order)."""
        import time as _time

        out = {}
        for trial in range(2):
            t0 = _time.perf_counter()
            state = self.init_state(seed)
            jax.block_until_ready((state.params, state.opt_state))
            out["init_state_s"] = _time.perf_counter() - t0

            rng = np.random.default_rng(seed)
            t0 = _time.perf_counter()
            idx, wmask = self._epoch_schedule(raw_inputs.shape[0], rng)
            out["schedule_host_s"] = _time.perf_counter() - t0

            t0 = _time.perf_counter()
            # SAME preprocessing as _fit_resident — float cubes cast to
            # uint8 on the host (a float input fed straight to the scan
            # would compile a second, /255-twice executable and hide the
            # cast cost fit_block actually pays)
            if raw_inputs.dtype == np.uint8:
                raw_u8 = raw_inputs
            else:
                raw_u8 = np.clip(
                    np.round(raw_inputs * 255.0), 0, 255
                ).astype(np.uint8)
            has_of = self.cfg.use_flow and of_inputs is not None
            of_buf = (
                of_inputs.astype(np.float32)
                if has_of
                else np.zeros((1,) + tuple(raw_inputs.shape[1:-1]) + (
                    self.net.tot_of_num * self.net.of_channels,), np.float32)
            )
            raw_dev = jnp.asarray(raw_u8)
            of_dev = jnp.asarray(of_buf)
            args = (raw_dev, of_dev, jnp.asarray(idx), jnp.asarray(wmask))
            jax.block_until_ready(args)
            out["upload_s"] = _time.perf_counter() - t0

            t0 = _time.perf_counter()
            state, losses = self._train_scan(state, *args)
            jax.block_until_ready((state.params, losses))
            out["train_scan_s"] = _time.perf_counter() - t0

            t0 = _time.perf_counter()
            r, o = self.score_block(
                state, raw_dev, of_dev if has_of else None
            )
            out["score_pass_s"] = _time.perf_counter() - t0

            t0 = _time.perf_counter()
            self._download_weights(state)
            out["param_download_s"] = _time.perf_counter() - t0
        out["total_s"] = sum(out.values())
        return out

    @staticmethod
    def _as_float_input(xb) -> jnp.ndarray:
        """uint8 cube storage -> ToTensor-scaled float input, on device."""
        xb = jnp.asarray(xb)
        if xb.dtype == jnp.uint8:
            xb = xb.astype(jnp.float32) / 255.0
        return xb

    def _step_padded(self, state, xb, ob):
        bsz = self.cfg.batch_size
        arrays = [xb] if ob is None else [xb, ob]
        padded, mask = pad_to_multiple(arrays, bsz)
        xb = self._as_float_input(padded[0])
        ob = padded[1] if ob is not None else self._dummy_of(xb.shape[0])
        return self._train_step(state, xb, jnp.asarray(ob), jnp.asarray(mask))

    def _dummy_of(self, n: int) -> jnp.ndarray:
        p = self.patch_size
        return jnp.zeros((n, p, p, self.net.tot_of_num * self.net.of_channels))

    def score_block(
        self,
        state_or_block,
        raw_inputs: np.ndarray,
        of_inputs: Optional[np.ndarray],
        batch_size: Optional[int] = None,
        resident: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Eval-mode per-cube (raw, of) scores, in input order."""
        state = self._as_state(state_or_block)
        bsz = batch_size or self.cfg.batch_size
        n = raw_inputs.shape[0]
        if resident and n > 0:
            # one device call: cube buffer resident, lax.map over batches
            n_pad = -(-n // bsz) * bsz
            idx = np.concatenate(
                [np.arange(n), np.zeros(n_pad - n, np.int64)]
            ).reshape(-1, bsz)
            of_buf = (
                of_inputs.astype(np.float32)
                if (self.cfg.use_flow and of_inputs is not None)
                else np.zeros(
                    (1,) + raw_inputs.shape[1:-1]
                    + (self.net.tot_of_num * self.net.of_channels,),
                    np.float32,
                )
            )
            scan = (
                self._score_scan_u8
                if raw_inputs.dtype == np.uint8
                else self._score_scan_f32
            )
            r, o = scan(
                state, jnp.asarray(raw_inputs), jnp.asarray(of_buf),
                jnp.asarray(idx),
            )
            return (
                np.asarray(r).reshape(-1)[:n],
                np.asarray(o).reshape(-1)[:n],
            )

        raws, ofs = [], []
        for lo in range(0, n, bsz):
            xb = raw_inputs[lo : lo + bsz]
            ob = of_inputs[lo : lo + bsz] if of_inputs is not None else None
            arrays = [xb] if ob is None else [xb, ob]
            padded, mask = pad_to_multiple(arrays, bsz)
            xp = self._as_float_input(padded[0])
            op = padded[1] if ob is not None else self._dummy_of(xp.shape[0])
            r, o = self._score_step(state, xp, jnp.asarray(op))
            k = int(mask.sum())
            raws.append(np.asarray(r)[:k])
            ofs.append(np.asarray(o)[:k])
        return np.concatenate(raws), np.concatenate(ofs)

    def _as_state(self, state_or_block) -> BlockModelState:
        if isinstance(state_or_block, BlockModelState):
            return state_or_block
        b = state_or_block
        return BlockModelState(
            params=b.params,
            batch_stats=b.batch_stats,
            opt_state=self.tx.init(b.params),
            step=jnp.zeros((), jnp.int32),
        )
