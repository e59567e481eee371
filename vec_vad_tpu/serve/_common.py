"""Shared serving-step plumbing: window math, one-buffer weight
packing, and fleet sharding/allocation helpers (see the package docstring
in serve/__init__.py)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

def _predict_window(pos: int, ctx: int) -> np.ndarray:
    """The 'predict' border-mode context window for frame `pos` of a video,
    in within-video coordinates: [start]*pad + [start..pos]
    (vad_datasets.py:287-293; matches data.video_index.context_indices)."""
    T = ctx + 1
    start = max(pos - ctx, 0)
    pad = T - (pos - start + 1)
    t = np.arange(T, dtype=np.int64)
    return start + np.maximum(t - pad, 0)


def _pack_f32(tree, dtype=jnp.float32):
    """Flatten a pytree into one uniform-dtype device buffer for
    single-handle argument marshaling: (packed, shapes, treedef);
    packed/shapes None when any leaf differs from `dtype` (pass the
    pytree through instead)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if all(l.dtype == dtype for l in leaves):
        return (
            jnp.concatenate([jnp.ravel(l) for l in leaves]),
            [l.shape for l in leaves],
            treedef,
        )
    return None, None, treedef


def _unflatten_f32(buf, shapes, treedef):
    """Inverse of _pack_f32 under trace (static offsets -> reshapes):
    (tree, consumed_length)."""
    leaves, o = [], 0
    for shp in shapes:
        sz = int(np.prod(shp))
        leaves.append(buf[o : o + sz].reshape(shp))
        o += sz
    return jax.tree_util.tree_unflatten(treedef, leaves), o


def _download_f32_tree(tree, pack_fn=None):
    """One-buffer host download of an all-f32 pytree (the trainers'
    weight-download path): per-leaf device_get pays a transfer round
    trip per leaf on this backend (~100 leaves at flagship scale).
    Returns (host_tree, pack_fn); thread the returned pack_fn back in to
    reuse the jitted packer executable across calls. Mixed-dtype trees
    fall back to jax.device_get (pack_fn returned unchanged)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves or not all(l.dtype == jnp.float32 for l in leaves):
        return jax.device_get(tree), pack_fn
    if pack_fn is None:
        pack_fn = jax.jit(lambda t: _pack_f32(t)[0])
    buf = np.asarray(pack_fn(tree))
    return (
        _unflatten_f32(buf, [l.shape for l in leaves], treedef)[0],
        pack_fn,
    )


def _time_device_chain(call, rings, k: int, repeats: int) -> float:
    """Best-of-`repeats` ms/execution for a donated-ring serving step —
    the device-twin measurement protocol shared by every scorer's
    time_device_step/tick. `call(ring, flow_ring) -> (ring, flow_ring,
    out)` must close over args already staged in HBM; k executions are
    chained through the donated rings and ONE element of the final out
    is downloaded per repeat (execution is in-order on the device
    stream, so forcing the last call bounds all k — and `call` is an
    already-compiled executable, so partial consumption cannot
    dead-code anything). A warm call runs first so a cold compile never
    lands in a timed repeat. Pick k so k*step >= ~300 ms: that keeps
    the one residual link RTT under a few percent
    (runtime/layer_profile.py protocol).

    The chain runs on device-side COPIES of `rings` (the step donates
    its ring arguments, which would otherwise consume the caller's
    buffers): the scorer's serving state is untouched, so a probe can
    run mid-video and scoring resumes exactly where it left off —
    essential for the motion conveyor, whose start_video() refuses to
    run with pending tail state. Returns best_ms."""
    import time as _time

    r, fr = (jnp.copy(x) for x in rings)
    r, fr, out = call(r, fr)  # warm
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = _time.perf_counter()
        for _ in range(k):
            r, fr, out = call(r, fr)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, (_time.perf_counter() - t0) * 1000.0 / k)
    return best


def _fleet_arity(n_cameras, mesh) -> Tuple[int, int]:
    """Validated (C, n_shards) for a camera fleet over an optional mesh."""
    C = int(n_cameras)
    if C < 1:
        raise ValueError("n_cameras must be >= 1")
    n = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    if n > 1 and C % n:
        raise ValueError(
            f"n_cameras={C} must divide evenly over the {n}-device mesh"
        )
    return C, n


def _shard_over_cameras(fn, mesh, n_cam_args: int, n_rep_args: int):
    """shard_map a fleet tick over the camera axis: the first n_cam_args
    arguments shard on their leading (camera) dim, the trailing
    n_rep_args (weights) replicate; outputs (ring, flow_ring, outs) are
    camera-sharded. Zero collectives — cameras are independent."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec

    cam = PartitionSpec(mesh.axis_names[0])
    rep = PartitionSpec()
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(cam,) * n_cam_args + (rep,) * n_rep_args,
        out_specs=(cam, cam, cam),
    )


def _alloc_camera_rings(C, rlen, h, w, of_shape, mesh, n_shards):
    """Fleet rings, pre-sharded on the camera axis when on a mesh so the
    donated buffers round-trip the tick without resharding."""
    shape_r = (C, rlen, h, w, 3)
    if n_shards > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        return (
            jax.device_put(np.zeros(shape_r, np.uint8), sh),
            jax.device_put(np.zeros(of_shape, np.float32), sh),
        )
    return jnp.zeros(shape_r, jnp.uint8), jnp.zeros(of_shape, jnp.float32)
