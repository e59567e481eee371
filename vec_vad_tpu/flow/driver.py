"""Optical-flow precomputation driver.

Replicates calc_optical_flow.py:25-85 exactly, but batched and
device-resident:
  * frame pairs come from ctx=1 'hard' context windows; at a video's FIRST
    frame the boundary branch picks window positions (0, 1) of the
    duplicated window [0, 0, 1] — the pair (f0, f0), i.e. intentional ZERO
    flow; the last frame pairs (N-2, N-1); mid-video frame t pairs
    (t, t+1) (calc_optical_flow.py:43-76, an intentional reference quirk)
  * both frames resize to 512x384 (cv2 bilinear), grayscale replicates to
    3 channels, FlowNet2 runs, and the flow resizes back to the original
    (w, h) WITHOUT magnitude rescaling (the reference's quirk)

The resizes run on device through the same interpolation-matrix matmuls as
STC extraction, and pairs batch through FlowNet2 in chunks instead of the
reference's batch=1 loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vec_vad_tpu.data.video_index import VideoIndex
from vec_vad_tpu.ops.stc import _interp_matrix


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear(frames: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.resize-parity bilinear resize of a full (B, H, W, C) stack."""
    B, H, W, C = frames.shape
    my = _interp_matrix(jnp.int32(0), jnp.int32(H), H, out_h)
    mx = _interp_matrix(jnp.int32(0), jnp.int32(W), W, out_w)
    return jnp.einsum(
        "ph,bhwc,qw->bpqc", my, frames.astype(jnp.float32), mx,
        precision=jax.lax.Precision.HIGHEST,
    )


def flow_pair_indices(index: VideoIndex) -> Tuple[np.ndarray, np.ndarray]:
    """Per-frame (first, second) source-frame indices for the flow pair,
    following the reference's boundary rule (calc_optical_flow.py:43-76)."""
    win = index.context_indices(1, "hard")  # (N, 3)
    boundary = (win[:, 1] == win[:, 0]) | (win[:, 1] == win[:, 2])
    first = np.where(boundary, win[:, 0], win[:, 1])
    second = np.where(boundary, win[:, 1], win[:, 2])
    return first, second


def _make_run_chunk(net, C: int, H: int, W: int, mh: int, mw: int,
                    compute_dtype=jnp.float32):
    """The per-chunk flow program: (B,H,W,C) uint8 pairs -> (B,H,W,2) flow
    at original size (resize to model_hw, gray->3ch replicate, FlowNet2,
    resize back WITHOUT magnitude rescaling — calc_optical_flow.py:59,82).

    `v` is an explicit argument everywhere (not a closure capture):
    captured weight arrays serialize into the program body, which blows
    past remote-compile request limits at FlowNet2 size (observed
    HTTP 413 on the relay backend).

    `compute_dtype=bfloat16` runs the FlowNet forward in bf16 (the caller
    casts the weights once via `cast_flow_variables`; activations cast
    here, the flow returns to f32 in the output resize). Measured 1.8x on
    hardware at fixed batch once the packed-gather warp removed the glue
    bottleneck — see PROFILE.md §5; the resize matmuls stay f32/HIGHEST
    for cv2 parity of the frame resample."""

    def run_chunk(v, f1, f2):
        r1 = resize_bilinear(f1, mh, mw)
        r2 = resize_bilinear(f2, mh, mw)
        if C == 1:
            r1 = jnp.repeat(r1, 3, axis=-1)
            r2 = jnp.repeat(r2, 3, axis=-1)
        pair = jnp.stack([r1, r2], axis=1)  # (B, 2, mh, mw, 3)
        flow = net.apply(v, pair.astype(compute_dtype))
        return resize_bilinear(flow, H, W)

    return run_chunk


def _make_run_pairs(net, C, H, W, mh, mw, compute_dtype, mesh=None,
                    axis: str = "data"):
    """The whole-batch flow program shared by the resident and segmented
    paths: (v, frames, i1, i2) -> flow for every indexed pair, lax.map
    over chunk groups (one device execution, no per-chunk dispatch).

    mesh=None (or a 1-device mesh — sharding a 1-device mesh costs 10x
    per scan step on this backend, see CLAUDE.md) runs single-device with
    i1/i2 shaped (steps, chunk). A >1-device mesh runs DATA-PARALLEL over
    the pair axis with i1/i2 shaped (n_dev, steps, chunk): shard_map over
    `axis`, each device executing the SAME sequential chunk scan on its
    own slice with frames and weights replicated — zero collectives, the
    same shard-the-embarrassing-axis design as GridTrainer. calc-flow is
    the heaviest offline stage (4560 maps at ped2 scale); maps/s scales
    ~n_dev because each FlowNet2 forward is independent.

    Returns (jitted_fn, n_dev or None). The reference's driver is a
    single-GPU batch=1 loop (calc_optical_flow.py:25-85); its training
    harness reached multi-GPU only via DataParallel (FlowNet2_src/
    main.py:211-214) — this is the serving-side equivalent on the mesh.
    """
    run_chunk = _make_run_chunk(net, C, H, W, mh, mw, compute_dtype)

    def seq(v, fwin, i1, i2):
        def one(args):
            a, b = args
            return run_chunk(
                v,
                jnp.take(fwin, a, axis=0, mode="clip"),
                jnp.take(fwin, b, axis=0, mode="clip"),
            )

        return jax.lax.map(one, (i1, i2))

    if mesh is None or mesh.devices.size == 1:
        return jax.jit(seq), None

    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def body(v, fwin, i1, i2):
        # local shapes: i1/i2 (1, steps, chunk) — one device's pair slice
        return seq(v, fwin, i1[0], i2[0])[None]

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(axis),
    )
    return jax.jit(fn), int(mesh.devices.size)


def _pair_index_groups(first, second, sel, chunk, n_dev=None):
    """Reshape flat pair indices (already padded via `sel`) into the
    (steps, chunk) or (n_dev, steps, chunk) layout _make_run_pairs
    expects."""
    i1, i2 = first[sel].astype(np.int32), second[sel].astype(np.int32)
    if n_dev is None:
        return (
            jnp.asarray(i1.reshape(-1, chunk)),
            jnp.asarray(i2.reshape(-1, chunk)),
        )
    steps = sel.size // (n_dev * chunk)
    return (
        jnp.asarray(i1.reshape(n_dev, steps, chunk)),
        jnp.asarray(i2.reshape(n_dev, steps, chunk)),
    )


def cast_flow_variables(variables, compute_dtype):
    """Cast the float leaves of a FlowNet variable pytree to
    `compute_dtype` (non-float leaves untouched). One-time, outside jit —
    halves weight HBM residency for bf16 and keeps the cast out of the
    per-chunk program."""
    compute_dtype = jnp.dtype(compute_dtype)
    if compute_dtype == jnp.float32:
        return variables
    return jax.tree.map(
        lambda l: l.astype(compute_dtype)
        if jnp.issubdtype(l.dtype, jnp.floating) else l,
        variables,
    )


def compute_optical_flow(
    net,
    variables,
    index: VideoIndex,
    frames: np.ndarray,
    chunk: int = 4,
    model_hw: Tuple[int, int] = (384, 512),
    resident: bool = False,
    compute_dtype=jnp.float32,
    mesh=None,
) -> np.ndarray:
    """Dense flow for every frame of a split: (N, H, W, 2) float32.

    resident=True runs the WHOLE split in one device call (lax.map over
    chunks, the flow buffer accumulating in HBM) followed by one bulk
    download, instead of paying a dispatch + download round trip per
    chunk — the same design as the resident scoring path, and the right
    shape for remote/tunneled accelerators where per-call latency
    dominates. Needs HBM for frames + N*H*W*2 floats of flow.

    compute_dtype=bfloat16: FlowNet forward in bf16 (output stays f32).
    Hardware: 2.1x maps/s at the 384x512 protocol with chunk=8 vs the
    f32 chunk=4 default (PROFILE.md §5). Flow values shift by bf16
    rounding — keep f32 where reference score parity matters.

    mesh (resident path only): a >1-device jax.sharding.Mesh runs the
    pair axis data-parallel (see _make_run_pairs) — outputs identical to
    the 1-device run, maps/s ~x n_devices.
    """
    n, H, W, C = frames.shape
    first, second = flow_pair_indices(index)
    mh, mw = model_hw
    variables = cast_flow_variables(variables, compute_dtype)

    frames_j = frames if isinstance(frames, jax.Array) else jnp.asarray(
        np.asarray(frames)
    )

    if resident:
        run_all, n_dev = _make_run_pairs(
            net, C, H, W, mh, mw, compute_dtype, mesh=mesh
        )
        group = chunk * (n_dev or 1)
        n_pad = -(-n // group) * group
        sel = np.concatenate([np.arange(n), np.full(n_pad - n, n - 1)])
        i1, i2 = _pair_index_groups(first, second, sel, chunk, n_dev)
        flow = np.asarray(run_all(variables, frames_j, i1, i2))
        return flow.reshape(n_pad, H, W, 2)[:n]

    run_chunk_j = jax.jit(
        _make_run_chunk(net, C, H, W, mh, mw, compute_dtype)
    )
    out = np.empty((n, H, W, 2), np.float32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        sel = np.arange(lo, hi)
        pad = chunk - sel.size
        sel_p = np.concatenate([sel, np.full(pad, sel[-1])])
        f1 = jnp.take(frames_j, jnp.asarray(first[sel_p]), axis=0, mode="clip")
        f2 = jnp.take(frames_j, jnp.asarray(second[sel_p]), axis=0, mode="clip")
        flow = np.asarray(run_chunk_j(variables, f1, f2))
        out[lo:hi] = flow[: sel.size]
    return out


def compute_optical_flow_segmented(
    net,
    variables,
    index: VideoIndex,
    frames,
    write,
    segment_frames: int = 512,
    chunk: int = 4,
    model_hw: Tuple[int, int] = (384, 512),
    compute_dtype=jnp.float32,
    mesh=None,
) -> int:
    """Memory-bounded flow precomputation for beyond-HBM/RAM splits.

    The reference streams one frame at a time and writes each .npy
    immediately (calc_optical_flow.py:25-85), so ShanghaiTech (~270k
    frames, ~890 GB of f32 flow) runs on any box. This is the TPU-shaped
    equivalent: per segment of `segment_frames` frames,

      * decode ONLY that segment (+1 neighbor frame each side for the
        pair rule) from the lazy stack,
      * one upload, ONE device call (lax.map over chunks) for the whole
        segment's flow, one bulk download,
      * `write(i, flow_i)` immediately per frame, then the segment's
        frames and flow are released.

    Peak host memory ~ segment's frames + flow; HBM likewise. Every
    segment pads to the same static shape so the program compiles ONCE.
    `frames` is any array-like supporting `[lo:hi]` (data.readers.
    LazyFrameStack decodes on slice). Returns the number of frames written.

    mesh: a >1-device jax.sharding.Mesh runs each segment's pair axis
    data-parallel (see _make_run_pairs) — same outputs, each segment's
    wall divided by ~n_devices.
    """
    n = index.total_frames
    H, W = frames.shape[1], frames.shape[2]
    C = frames.shape[3] if len(frames.shape) == 4 else 1
    first, second = flow_pair_indices(index)
    mh, mw = model_hw
    variables = cast_flow_variables(variables, compute_dtype)
    run_seg, n_dev = _make_run_pairs(
        net, C, H, W, mh, mw, compute_dtype, mesh=mesh
    )
    group = chunk * (n_dev or 1)
    S = -(-segment_frames // group) * group

    for lo in range(0, n, S):
        hi = min(lo + S, n)
        # pairs for frames [lo, hi) touch source frames [lo-1, hi]
        # (first frame of a video pairs (t, t), last pairs (t-1, t))
        w0, w1 = max(lo - 1, 0), min(hi + 1, n)
        win = np.asarray(frames[w0:w1])
        if win.ndim == 3:
            win = win[..., None]
        wpad = np.zeros((S + 2,) + win.shape[1:], win.dtype)
        wpad[: win.shape[0]] = win
        sel = np.concatenate(
            [np.arange(lo, hi), np.full(S - (hi - lo), hi - 1)]
        )
        i1, i2 = _pair_index_groups(
            first - w0, second - w0, sel, chunk, n_dev
        )
        flow = np.asarray(
            run_seg(variables, jnp.asarray(wpad), i1, i2)
        ).reshape(S, H, W, 2)
        for k in range(hi - lo):
            write(lo + k, flow[k])
    return n


def flow_tree_writer(index: VideoIndex, of_root: str, dataset_rel: str):
    """Per-frame writer of flow .npy files mirroring the dataset tree
    (calc_optical_flow.py:30-38 layout, for interop with reference
    artifacts). Returns write(i, flow_i)."""
    import os

    assert index.frame_paths is not None
    n_root = len(os.path.normpath(dataset_rel).split(os.sep))

    def write(i: int, flow_i: np.ndarray) -> None:
        parts = os.path.normpath(index.frame_paths[i]).split(os.sep)
        rel = parts[-3:] if n_root == 0 else parts[n_root:]
        stem = os.path.splitext(rel[-1])[0]
        d = os.path.join(of_root, *rel[:-1])
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, stem + ".npy"), flow_i)

    return write


def save_flow_tree(
    flow: np.ndarray, index: VideoIndex, of_root: str, dataset_rel: str
) -> None:
    """Persist a fully-materialized flow stack via flow_tree_writer."""
    write = flow_tree_writer(index, of_root, dataset_rel)
    for i in range(flow.shape[0]):
        write(i, flow[i])
