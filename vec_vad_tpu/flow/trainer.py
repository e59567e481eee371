"""Flow-network fine-tuning harness.

Capability parity with the vestigial flownet2-pytorch trainer
(FlowNet2_src/main.py): train/validate any FlowNet2-family net on
(image-pair, flow) batches with the multi-scale loss, under jit with
data-parallel batch sharding — the reference used torch DataParallel.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct
from jax.sharding import Mesh

from vec_vad_tpu.flow.losses import multiscale_loss, single_scale_loss
from vec_vad_tpu.parallel.mesh import data_sharding, get_mesh, replicated_sharding


class FlowTrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class PairMajorAdapter(nn.Module):
    """(B, H, W, 6) dataset batches -> the composites' (B, 2, H, W, 3).

    The flow datasets emit channel-stacked pairs (img0|img1 on the last
    axis) for the component nets; the FlowNet2/CS/CSS composites take
    frame-major input and normalize internally (flownet2.py:66-72).
    Wrapping keeps FlowTrainer/FlowHarness net-agnostic. Params nest
    under 'inner' (a converted composite checkpoint loads as
    {'inner': variables['params']})."""

    inner: nn.Module

    @nn.compact
    def __call__(self, pairs, train: bool = False):
        x = jnp.stack([pairs[..., :3], pairs[..., 3:]], axis=1)
        return self.inner(x, train)


class FlowTrainer:
    """Multi-scale flow training for a pyramid-returning net (FlowNetC/S/SD
    or the FlowNet2 variants in train mode)."""

    def __init__(
        self,
        net,
        learning_rate: float = 1e-4,
        norm: str = "L1",
        mesh: Optional[Mesh] = None,
        schedule_lr_frequency: int = 0,
        schedule_lr_fraction: float = 10.0,
        loss: str = "multiscale",
    ):
        """schedule_lr_frequency/fraction: lr /= fraction every `frequency`
        iterations (FlowNet2_src/main.py:47-51, the reference's
        update_hyperparameter_schedule) — expressed as a pure step-count
        schedule so the compiled train step needs no host-side mutation.

        loss: 'multiscale' supervises a pyramid-returning component net
        (FlowNetC/S/SD, MultiScale loss); 'single' supervises a fused
        single-flow output — the reference's recipe for the
        FlowNet2/CS/CSS composites (main.py:194-197 pairs them with
        L1Loss/L2Loss on the full-res output, losses.py:22-45). `norm`
        picks L1/L2 in both modes."""
        if loss not in ("multiscale", "single"):
            raise ValueError(f"loss must be 'multiscale' or 'single', got {loss!r}")
        self.loss_mode = loss
        self.net = net
        if schedule_lr_frequency:
            def lr(count):
                return learning_rate * jnp.power(
                    1.0 / schedule_lr_fraction,
                    jnp.floor(count / schedule_lr_frequency),
                )

            self.tx = optax.adam(lr)
        else:
            self.tx = optax.adam(learning_rate)
        self.mesh = mesh or get_mesh()
        multi = self.mesh.devices.size > 1
        rep = replicated_sharding(self.mesh) if multi else None
        dat = data_sharding(self.mesh) if multi else None

        if loss == "multiscale":
            def loss_fn(params, pairs, target, w):
                pyramid = net.apply({"params": params}, pairs, True)
                return multiscale_loss(
                    pyramid, target, norm=norm, sample_weight=w
                )
        else:
            def loss_fn(params, pairs, target, w):
                # train=False: the composites return the fused flow under
                # both flags (the reference's pretrained zoo is
                # batchNorm-free, so no train-mode stats are at stake) and
                # the FlowNet2C/S/SD wrappers only return a single flow on
                # this path
                flow = net.apply({"params": params}, pairs, False)
                return single_scale_loss(
                    flow, target, norm=norm, sample_weight=w
                )

        def train_step(state: FlowTrainState, pairs, target, w):
            (loss, epe_v), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, pairs, target, w
            )
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                FlowTrainState(params=params, opt_state=opt_state, step=state.step + 1),
                {"loss": loss, "epe": epe_v},
            )

        if multi:
            self._train_step = jax.jit(
                train_step,
                in_shardings=(rep, dat, dat, dat),
                out_shardings=(rep, rep),
                donate_argnums=(0,),
            )
        else:
            # sharding annotations are pure overhead on one device
            self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._n_devices = self.mesh.devices.size

    def init_state(self, example_pairs: np.ndarray, seed: int = 0) -> FlowTrainState:
        variables = self.net.init(
            jax.random.key(seed), jnp.asarray(example_pairs), True
        )
        params = variables["params"]
        return FlowTrainState(
            params=params,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def step(
        self, state: FlowTrainState, pairs: np.ndarray, target: np.ndarray
    ) -> Tuple[FlowTrainState, dict]:
        from vec_vad_tpu.parallel.mesh import pad_to_multiple

        # the pad mask zero-weights wrapped duplicate rows so the loss/EPE
        # match the unpadded single-device run exactly (BlockTrainer
        # threads its pad mask for the same reason)
        (pairs, target), mask = pad_to_multiple(
            [np.asarray(pairs), np.asarray(target)], self._n_devices
        )
        return self._train_step(
            state, jnp.asarray(pairs), jnp.asarray(target),
            jnp.asarray(mask, jnp.float32),
        )
