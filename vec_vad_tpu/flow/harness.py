"""Flow fine-tuning harness: epoch/validation driver with resume and
best-checkpoint tracking.

Capability parity with the reference's flownet2-pytorch trainer
(FlowNet2_src/main.py): the epoch loop with per-epoch validation
(main.py:592-634), best-EPE tracking and checkpoint + model_best saving
(main.py:629-644), `--resume` restoring weights, optimizer state, epoch
counter, and best error (main.py:341-350), and the iteration-based LR
decay schedule (main.py:47-51, tools.update_hyperparameter_schedule).

TPU-native differences: the train step is the compiled sharded
FlowTrainer step (optimizer state lives in the jitted scan, not a torch
object), checkpoints serialize the whole FlowTrainState pytree
(flax.serialization msgpack — weights AND Adam moments, so a resumed run
continues the exact trajectory), and validation is a jitted loss/EPE pass.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from vec_vad_tpu.flow.losses import multiscale_loss, single_scale_loss
from vec_vad_tpu.flow.trainer import FlowTrainer, FlowTrainState


@dataclass
class FitResult:
    state: FlowTrainState
    best_epe: float
    history: List[Dict] = field(default_factory=list)


class FlowHarness:
    """Epoch loop + validation + resumable checkpoints around FlowTrainer."""

    CKPT = "checkpoint.msgpack"
    BEST = "model_best.msgpack"
    META = "meta.json"

    def __init__(
        self,
        trainer: FlowTrainer,
        workdir: str,
        norm: str = "L1",
        loss: Optional[str] = None,
    ):
        """loss: 'multiscale' | 'single' — defaults to the trainer's mode
        so validation scores the same objective training optimizes."""
        self.trainer = trainer
        self.workdir = workdir  # created lazily on first checkpoint write
        net = trainer.net
        loss = loss or getattr(trainer, "loss_mode", "multiscale")
        if loss not in ("multiscale", "single"):
            raise ValueError(
                f"loss must be 'multiscale' or 'single', got {loss!r}"
            )

        if loss == "multiscale":
            def eval_step(params, pairs, target):
                pyramid = net.apply({"params": params}, pairs, True)
                return multiscale_loss(pyramid, target, norm=norm)
        else:
            def eval_step(params, pairs, target):
                flow = net.apply({"params": params}, pairs, False)
                return single_scale_loss(flow, target, norm=norm)

        self._eval_step = jax.jit(eval_step)

        # full-res inference forward: composites (and the FlowNet2C/S/SD
        # wrappers) return the fused flow under train=False; the raw
        # component nets always return the pyramid, whose full-res flow is
        # upsample4(flow2 * div_flow) — exactly the reference wrappers'
        # eval path (flownet2.py:170-172, div_flow=20, bilinear
        # align_corners=True checkpoint-era upsample)
        def infer_fwd(params, pairs):
            out = net.apply({"params": params}, pairs, False)
            if isinstance(out, (tuple, list)):
                from vec_vad_tpu.models.flownet.ops import upsample_bilinear

                out = upsample_bilinear(
                    out[0] * getattr(net, "div_flow", 20.0), 4, True
                )
            return out

        self._infer_step = jax.jit(infer_fwd)

    # -- checkpointing ------------------------------------------------------

    def save_checkpoint(
        self, state: FlowTrainState, epoch: int, best_epe: float,
        is_best: bool,
    ) -> None:
        """checkpoint.msgpack + meta.json each epoch; model_best on
        improvement (tools.save_checkpoint semantics, main.py:636-644)."""
        os.makedirs(self.workdir, exist_ok=True)
        blob = serialization.to_bytes(jax.device_get(state))
        path = os.path.join(self.workdir, self.CKPT)
        with open(path, "wb") as f:
            f.write(blob)
        with open(os.path.join(self.workdir, self.META), "w") as f:
            json.dump({"epoch": epoch, "best_epe": float(best_epe)}, f)
        if is_best:
            with open(os.path.join(self.workdir, self.BEST), "wb") as f:
                f.write(blob)

    def load_checkpoint(
        self, template: FlowTrainState, best: bool = False
    ) -> Optional[tuple]:
        """(state, epoch, best_epe) or None if no checkpoint exists."""
        path = os.path.join(self.workdir, self.BEST if best else self.CKPT)
        meta_path = os.path.join(self.workdir, self.META)
        if not (os.path.exists(path) and os.path.exists(meta_path)):
            return None
        with open(path, "rb") as f:
            state = serialization.from_bytes(template, f.read())
        with open(meta_path) as f:
            meta = json.load(f)
        return state, int(meta["epoch"]), float(meta["best_epe"])

    # -- validation ---------------------------------------------------------

    def validate(self, state, dataset, batch_size: int) -> float:
        """Weighted multi-scale EPE over the validation set
        (main.py:394-516 is_validate branch)."""
        tot, n = 0.0, 0
        for pairs, target in dataset.batches(batch_size, shuffle=False):
            _, epe_v = self._eval_step(
                state.params, jnp.asarray(pairs), jnp.asarray(target)
            )
            b = pairs.shape[0]
            tot += float(epe_v) * b
            n += b
        return tot / max(n, 1)

    # -- inference mode -----------------------------------------------------

    def infer(
        self,
        params,
        dataset,
        batch_size: int,
        save_dir: Optional[str] = None,
        n_batches: int = -1,
    ) -> Dict:
        """Run the net full-res over a flow dataset; optionally save
        predictions; report mean EPE.

        The reference's --inference mode (main.py:87-100 flips the run
        into inference; main.py:524-589 runs the loader, writes each
        prediction as `%06d.flo` under the save dir when --save_flow is
        set, and reports the loss statistics). Datasets without ground
        truth load all-zero targets there, making 'EPE' the mean flow
        norm — same here. Returns {'epe': float, 'n': int, 'flows': dir}.

        A short final batch is padded (last sample repeated) to
        batch_size and the predictions sliced back, so the jitted
        forward compiles ONCE — a second tail-shape compile of a 162M-
        param composite costs minutes on this backend.
        """
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            from vec_vad_tpu.utils.flowviz import write_flo
        tot, n = 0.0, 0
        for bi, (pairs, target) in enumerate(
            dataset.batches(batch_size, shuffle=False)
        ):
            if n_batches >= 0 and bi >= n_batches:
                break
            b = pairs.shape[0]
            if b < batch_size:
                pairs = np.concatenate(
                    [pairs, np.repeat(pairs[-1:], batch_size - b, axis=0)]
                )
            flow = np.asarray(
                self._infer_step(params, jnp.asarray(pairs))
            )[:b]
            per = np.sqrt(
                np.sum((flow - target) ** 2, axis=-1)
            ).mean(axis=(1, 2))
            tot += float(per.sum())
            if save_dir:
                for i in range(flow.shape[0]):
                    write_flo(
                        os.path.join(save_dir, f"{n + i:06d}.flo"), flow[i]
                    )
            n += flow.shape[0]
        return {"epe": tot / max(n, 1), "n": n, "flows": save_dir}

    # -- the epoch loop -----------------------------------------------------

    def fit(
        self,
        train_dataset,
        val_dataset,
        total_epochs: int,
        batch_size: int,
        example_pairs: Optional[np.ndarray] = None,
        seed: int = 0,
        resume: bool = True,
        log: bool = False,
        init_params=None,
    ) -> FitResult:
        """Train to total_epochs, validating each epoch; transparently
        resumes from <workdir>/checkpoint.msgpack when present.

        init_params: start from these net params instead of a random
        init (fine-tuning a converted checkpoint — the reference's
        --resume-from-pretrained path, main.py:341-350). A workdir
        checkpoint still wins when resume=True: the pretrained weights
        seed epoch 1 only."""
        if example_pairs is None:
            pairs0, _ = next(train_dataset.batches(batch_size, shuffle=False))
            example_pairs = pairs0
        state = self.trainer.init_state(example_pairs, seed=seed)
        if init_params is not None:
            state = state.replace(
                params=init_params,
                opt_state=self.trainer.tx.init(init_params),
            )
        start_epoch, best_epe = 1, float("inf")
        if resume:
            loaded = self.load_checkpoint(state)
            if loaded is not None:
                state, last_epoch, best_epe = loaded
                start_epoch = last_epoch + 1
                if log:
                    print(
                        f"resumed epoch {last_epoch} (best EPE {best_epe:.4f})"
                    )

        history: List[Dict] = []
        for epoch in range(start_epoch, total_epochs + 1):
            losses = []
            for pairs, target in train_dataset.batches(
                batch_size, shuffle=True, seed=seed + epoch
            ):
                state, metrics = self.trainer.step(state, pairs, target)
                losses.append(float(metrics["loss"]))
            val_epe = self.validate(state, val_dataset, batch_size)
            is_best = val_epe < best_epe
            best_epe = min(best_epe, val_epe)
            self.save_checkpoint(state, epoch, best_epe, is_best)
            history.append(
                {
                    "epoch": epoch,
                    "train_loss": float(np.mean(losses)) if losses else None,
                    "val_epe": val_epe,
                    "is_best": is_best,
                }
            )
            if log:
                print(
                    f"epoch {epoch}: loss {history[-1]['train_loss']:.5f} "
                    f"val EPE {val_epe:.5f}{' *' if is_best else ''}"
                )
        return FitResult(state=state, best_epe=best_epe, history=history)
