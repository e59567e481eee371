"""Flow training losses (parity with FlowNet2_src/losses.py).

epe: mean L2 norm of the flow error over pixels.
multiscale_loss: weighted sum over the 5-scale pyramid with avg-pooled,
div_flow-scaled targets (losses.py:46-83): weights 0.32/2^k, pooling
4*2^k, div_flow 0.05.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


def _batch_mean(x: jnp.ndarray, sample_weight) -> jnp.ndarray:
    """Mean over all elements, or a weighted mean over the batch axis.

    With sample_weight=None this equals jnp.mean(x) exactly (every sample
    has the same element count). Weights exist for wrap-padded batches on
    multi-device meshes: padded duplicate rows get weight 0 so they don't
    bias the loss/EPE relative to the unpadded single-device run."""
    if sample_weight is None:
        return jnp.mean(x)
    per = jnp.mean(x, axis=tuple(range(1, x.ndim)))
    return jnp.sum(per * sample_weight) / jnp.maximum(
        jnp.sum(sample_weight), 1.0
    )


def epe(pred: jnp.ndarray, target: jnp.ndarray, sample_weight=None) -> jnp.ndarray:
    """Endpoint error: pred/target (B, H, W, 2)."""
    return _batch_mean(
        jnp.sqrt(jnp.sum(jnp.square(target - pred), axis=-1)), sample_weight
    )


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray, sample_weight=None) -> jnp.ndarray:
    return _batch_mean(jnp.abs(pred - target), sample_weight)


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray, sample_weight=None) -> jnp.ndarray:
    return epe(pred, target, sample_weight)  # reference "L2" = per-pixel norm mean


def single_scale_loss(
    flow: jnp.ndarray,
    target: jnp.ndarray,
    norm: str = "L1",
    sample_weight=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(loss, epe) pairing one fused full-res flow with the target.

    The reference trains the FlowNet2/CS/CSS composites exactly this way:
    the model returns a single flow and L1Loss/L2Loss compare it to the
    raw target with no pyramid, no div_flow scaling (main.py:194-197
    selects the loss by name; losses.py:22-45). 'L2' is the per-pixel
    norm mean, which equals EPE."""
    loss_fn = l1_loss if norm == "L1" else l2_loss
    return (
        loss_fn(flow, target, sample_weight),
        epe(flow, target, sample_weight),
    )


def _avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return nn.avg_pool(x, (k, k), (k, k))


def multiscale_loss(
    flow_pyramid: Sequence[jnp.ndarray],
    target: jnp.ndarray,
    start_scale: int = 4,
    l_weight: float = 0.32,
    norm: str = "L1",
    div_flow: float = 0.05,
    sample_weight=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(loss, epe) over the (flow2..flow6) pyramid vs a full-res target.

    sample_weight: optional (B,) per-sample weights (see _batch_mean)."""
    loss_fn = l1_loss if norm == "L1" else l2_loss
    target = div_flow * target
    loss = 0.0
    epe_v = 0.0
    for i, pred in enumerate(flow_pyramid):
        w = l_weight / (2 ** i)
        t = _avg_pool(target, start_scale * (2 ** i))
        loss = loss + w * loss_fn(pred, t, sample_weight)
        epe_v = epe_v + w * epe(pred, t, sample_weight)
    return loss, epe_v
