"""Device mesh + sharding helpers.

The reference's only parallelism is single-process torch DataParallel over
local GPUs (train.py:289,375; test.py:237) — scatter/gather per batch. The
TPU-native equivalent is SPMD data parallelism: a 1-D `Mesh` over all chips,
batch axis sharded over 'data', parameters replicated; XLA inserts the
gradient psum over ICI. The per-(scene, block) model grid and the erased-
position ensemble add embarrassingly-parallel axes on top (vmap'd in the
model; block fan-out at the trainer level).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(
    arrays: Sequence[np.ndarray], multiple: int
) -> Tuple[Tuple[np.ndarray, ...], np.ndarray]:
    """Wrap-pad leading dims to a multiple of `multiple`; returns padded
    arrays + a weight mask (1 real, 0 padded). Wrap padding (repeat from the
    start) keeps BatchNorm batch statistics in-distribution, and the mask
    zeroes padded elements out of losses/scores."""
    n = arrays[0].shape[0]
    target = int(np.ceil(max(n, 1) / multiple) * multiple)
    pad = target - n
    idx = np.concatenate([np.arange(n), np.arange(pad) % max(n, 1)])
    mask = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    return tuple(a[idx] for a in arrays), mask
