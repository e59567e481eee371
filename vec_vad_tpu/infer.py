"""Fused device-resident inference: frames -> frame anomaly scores in one
compiled executable per chunk.

This is the TPU-native replacement for the reference's test-time hot loop
(test.py:269-358), which round-trips host<->device per (frame, block):
cv2 crops on the host, a torch forward per block, numpy z-norm, pixel-mask
splat. Here the whole path — temporal-window gather, crop-resize (MXU
matmuls), completion-ensemble forward, per-cube MSE, z-normalization,
fusion, validity masking, per-frame max — is one jitted function over a
chunk of frames. Zero host transfers except the final (chunk,) score
vector.

Single-block (h_block == w_block == 1) fast path; the general model grid
goes through pipeline.score_cubes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vec_vad_tpu.config import PipelineConfig
from vec_vad_tpu.models.completion import SelfCompletionNet, make_completion_net
from vec_vad_tpu.ops.stc import cube_to_input, extract_stc, flow_magnitude
from vec_vad_tpu.score.scoring import BIG_NUMBER


@functools.lru_cache(maxsize=32)
def _resident_fns(
    net: SelfCompletionNet,
    P: int,
    use_flow: bool,
    cube_batch: int,
    w_raw: float,
    w_of: float,
    compute_dtype,
):
    """Compiled phase functions for the resident path, cached so repeated
    calls (and the warmup) reuse one executable per configuration.

    The extraction executables are pipeline._resident_extract_fns' — the
    train- and test-side resident paths run the SAME extract programs, so
    sharing the cache means a train+test run compiles them once."""
    from vec_vad_tpu.pipeline import _resident_extract_fns

    extract_all, extract_all_flow, _ = _resident_extract_fns(P)

    @jax.jit
    def score_all(v, stats, cubes, flows, idx):
        vc = jax.tree.map(lambda p: p.astype(compute_dtype), v)
        mu_r, sd_r, mu_o, sd_o = stats

        def one_batch(ii):
            x = jnp.take(cubes, ii, axis=0, mode="clip").astype(compute_dtype) / 255.0
            if use_flow:
                x_of = jnp.take(flows, ii, axis=0, mode="clip").astype(compute_dtype)
            else:
                x_of = jnp.zeros(
                    (cube_batch, P, P, net.tot_of_num * net.of_channels),
                    compute_dtype,
                )
            out = net.apply(vc, x, x_of, False)
            err = (out.raw_out - out.raw_tgt).astype(jnp.float32)
            sc = jnp.sum(jnp.square(err), axis=(0, 2, 3, 4))
            score = w_raw * (sc - mu_r) / sd_r
            if use_flow and out.of_out is not None:
                oerr = (out.of_out - out.of_tgt).astype(jnp.float32)
                osc = jnp.sum(jnp.square(oerr), axis=(0, 2, 3, 4))
                score = score + w_of * (osc - mu_o) / sd_o
            return score

        return jax.lax.map(one_batch, idx)

    return extract_all, extract_all_flow, score_all


def infer_frame_scores_resident(
    cfg: PipelineConfig,
    variables,
    stats: Tuple[float, float, float, float],
    frames: np.ndarray,
    windows: np.ndarray,
    boxes_pad: np.ndarray,
    valid: np.ndarray,
    flow: Optional[np.ndarray] = None,
    of_windows: Optional[np.ndarray] = None,
    chunk: int = 128,
    cube_batch: int = 2048,
    net: Optional[SelfCompletionNet] = None,
    compute_dtype=jnp.float32,
    big_number: float = BIG_NUMBER,
) -> np.ndarray:
    """Whole-split scoring in three device calls (HBM-resident design).

    chunk/cube_batch defaults come from a hardware sweep at ped2 bench
    scale (PROFILE.md §9): phase-A throughput rises with chunk up to
    ~256-512 (chunk=1024 crashes the TPU compiler's VMEM budget) and
    cube_batch=2048 beats both 1024 and 4096; 128 stays within ~4% of
    the peak while keeping clear of the compile cliff at bigger frame
    geometries.

    The chunked path (`infer_frame_scores`) pays a host<->device round trip
    per chunk — expensive on remote/tunneled accelerators. Here:

      phase A: lax.map over frame chunks extracts EVERY padded cube into an
               HBM-resident (N, K, P, P, T*C) uint8 buffer (one call);
      phase B: the valid (frame, box) pairs — known host-side from the
               validity mask — gather their cubes flat and lax.map over
               fixed-size cube batches runs the completion ensemble +
               z-normalized fusion at 100%% occupancy (no padded-slot
               waste, one call);
      host:    segment-max into per-frame scores.

    Single-block grids (h_block == w_block == 1), like the fused path.
    """
    mc = cfg.model
    fc = cfg.fore
    net = net or make_completion_net(mc)
    P = fc.patch_size
    n, K = valid.shape
    use_flow = mc.use_flow and flow is not None

    # -- host-side flat index set --------------------------------------
    fid, bid = np.nonzero(valid)
    m = fid.size
    n_pad = -(-n // chunk) * chunk
    frame_pad = np.concatenate([np.arange(n), np.full(n_pad - n, n - 1)])
    m_pad = -(-max(m, 1) // cube_batch) * cube_batch
    flat = fid * K + bid
    flat_pad = np.concatenate([flat, np.full(m_pad - m, flat[-1] if m else 0)])

    extract_all, extract_all_flow, score_all = _resident_fns(
        net, P, use_flow, cube_batch, mc.w_raw, mc.w_of, compute_dtype
    )

    # `frames` may already be device-resident (jax.Array) — the intended
    # steady state: upload the frame stack once, score many times.
    frames_dev = (
        frames if isinstance(frames, jax.Array)
        else jax.device_put(np.asarray(frames))
    )
    win_dev = jnp.asarray(windows[frame_pad]).reshape(n_pad // chunk, chunk, -1)
    box_dev = jnp.asarray(boxes_pad[frame_pad]).reshape(
        n_pad // chunk, chunk, K, 4
    )

    # -- phase A: extract all cubes into HBM ---------------------------
    cube_buf = extract_all(frames_dev, win_dev, box_dev)
    cube_buf = cube_buf.reshape((n_pad * K,) + cube_buf.shape[3:])

    if use_flow:
        ow_dev = jnp.asarray(of_windows[frame_pad]).reshape(
            n_pad // chunk, chunk, -1
        )
        flow_dev = jax.device_put(np.asarray(flow))
        flow_buf, mag = extract_all_flow(flow_dev, ow_dev, box_dev)
        flow_buf = flow_buf.reshape((n_pad * K,) + flow_buf.shape[3:])
        mag_flat = mag.reshape(-1)
    else:
        flow_buf = jnp.zeros((1, P, P, net.tot_of_num * net.of_channels))
        mag_flat = None

    # -- phase B: flat scoring ----------------------------------------
    idx_dev = jnp.asarray(flat_pad).reshape(m_pad // cube_batch, cube_batch)
    stats_dev = tuple(jnp.asarray(s, jnp.float32) for s in stats)

    scores = np.asarray(
        score_all(variables, stats_dev, cube_buf, flow_buf, idx_dev)
    )
    scores = scores.reshape(-1)[:m]

    # -- host: motion filter + degenerate-splat filter + segment max ---
    from vec_vad_tpu.score.scoring import degenerate_boxes

    if mag_flat is not None:
        keep = np.asarray(mag_flat)[flat] > fc.motion_thr
    else:
        keep = np.ones(m, bool)
    keep &= ~degenerate_boxes(boxes_pad[fid, bid])
    out = np.full(n, -big_number, dtype=np.float32)
    np.maximum.at(out, fid[keep], scores[keep])
    return out


def infer_frame_scores_segmented(
    cfg: PipelineConfig,
    variables,
    stats: Tuple[float, float, float, float],
    frames,
    windows: np.ndarray,
    boxes_pad: np.ndarray,
    valid: np.ndarray,
    flow=None,
    of_windows: Optional[np.ndarray] = None,
    segment_frames: int = 4096,
    chunk: int = 128,
    cube_batch: int = 2048,
    net: Optional[SelfCompletionNet] = None,
    compute_dtype=jnp.float32,
    big_number: float = BIG_NUMBER,
) -> np.ndarray:
    """Resident scoring for splits whose frame stack + cube buffer exceed
    HBM (avenue is ~10 GB of frames at 15k x 360x640; ShanghaiTech ~40 GB —
    both too big for the single-upload infer_frame_scores_resident on a
    16 GB chip).

    Splits the frame axis into `segment_frames`-sized segments and runs the
    3-call resident design per segment. Each segment uploads exactly the
    frame range its context windows reference (computed from the windows
    rows themselves, so every border mode works, including the overlap at
    segment boundaries), keeping device-call count O(n / segment_frames)
    and peak HBM bounded by one segment. `frames`/`flow` may be lazy
    stacks — only the referenced ranges materialize host-side.

    Equal to infer_frame_scores_resident by construction (test_infer.py).
    """
    n = valid.shape[0]
    if windows.ndim == 1:
        windows = windows[:, None]
    if of_windows is not None and of_windows.ndim == 1:
        of_windows = of_windows[:, None]
    out = np.empty(n, np.float32)
    for lo in range(0, n, segment_frames):
        hi = min(lo + segment_frames, n)
        w_seg = windows[lo:hi]
        ref_lo, ref_hi = int(w_seg.min()), int(w_seg.max()) + 1
        kwargs = {}
        if flow is not None and of_windows is not None:
            ow_seg = of_windows[lo:hi]
            oref_lo, oref_hi = int(ow_seg.min()), int(ow_seg.max()) + 1
            kwargs = dict(
                flow=np.asarray(flow[oref_lo:oref_hi]),
                of_windows=ow_seg - oref_lo,
            )
        out[lo:hi] = infer_frame_scores_resident(
            cfg,
            variables,
            stats,
            np.asarray(frames[ref_lo:ref_hi]),
            w_seg - ref_lo,
            boxes_pad[lo:hi],
            valid[lo:hi],
            chunk=chunk,
            cube_batch=cube_batch,
            net=net,
            compute_dtype=compute_dtype,
            big_number=big_number,
            **kwargs,
        )
    return out


def infer_frame_scores_grid(
    model,
    test_cubes,
    n_frames: int,
    trainer=None,
    cube_batch: int = 2048,
    compute_dtype=jnp.float32,
    big_number: float = BIG_NUMBER,
) -> np.ndarray:
    """Frame scores for a MULTI-BLOCK model grid with the resident design.

    Uses an extracted CubeSet (pipeline.extract_cube_set) — cubes already
    routed to (scene, h, w) cells — and scores EVERY trained block in one
    stacked device call (GridTrainer.score_blocks, block axis sharded over
    the mesh), so the device-call count is O(1) in the number of blocks.
    Cubes in untrained blocks score big_number (test.py:308-310).
    """
    from vec_vad_tpu.pipeline import VadModel, group_by_block
    from vec_vad_tpu.score.scoring import degenerate_boxes, fuse_scores
    from vec_vad_tpu.train.grid_trainer import get_grid_trainer

    assert isinstance(model, VadModel)
    cfg = model.cfg
    mc = cfg.model
    if trainer is None:
        from vec_vad_tpu.pipeline import make_trainer

        trainer = make_trainer(cfg)
    use_flow = mc.use_flow and test_cubes.flow is not None

    cube_scores = np.full(test_cubes.size, big_number, dtype=np.float32)
    trained = {
        k: v
        for k, v in group_by_block(test_cubes).items()
        if model.blocks.get(k) is not None
    }
    if trained:
        gt = get_grid_trainer(trainer.net, mc, trainer.mesh, cfg.fore.patch_size)
        block_data = [
            (
                key,
                test_cubes.raw[idx],
                test_cubes.flow[idx] if use_flow else None,
            )
            for key, idx in trained.items()
        ]
        per_block = gt.score_blocks(
            model.blocks, block_data, batch_size=cube_batch
        )
        for key, idx in trained.items():
            blk = model.blocks[key]
            raw_sc, of_sc = per_block[key]
            use_of = use_flow and blk.of_scores is not None
            cube_scores[idx] = fuse_scores(
                raw_sc,
                of_sc if use_of else None,
                blk.raw_stats,
                blk.of_stats if use_of else None,
                mc.w_raw,
                mc.w_of,
            )

    keep = ~degenerate_boxes(test_cubes.boxes)
    out = np.full(n_frames, -big_number, dtype=np.float32)
    np.maximum.at(out, test_cubes.frame_ids[keep], cube_scores[keep])
    return out


def make_score_chunk_fn(
    net: SelfCompletionNet,
    patch_size: int,
    w_raw: float,
    w_of: float,
    use_flow: bool,
    motion_thr: float = 0.0,
    compute_dtype=jnp.float32,
):
    """Build the jitted chunk scorer.

    Returns fn(variables, stats, frames_dev, flow_dev, windows, of_windows,
               boxes, valid) -> (chunk,) frame scores.
    stats = (raw_mean, raw_std, of_mean, of_std) scalars.
    """

    def chunk_scores(
        variables,
        stats,
        frames_dev,  # (N, H, W, 3) uint8
        flow_dev,  # (N, H, W, 2) float32 or zeros-shaped (1,1,1,2)
        windows,  # (B, T)
        of_windows,  # (B, T_of)
        boxes,  # (B, K, 4)
        valid,  # (B, K) bool
    ):
        B, K = boxes.shape[:2]
        wins = jnp.take(frames_dev, windows, axis=0, mode="clip")  # (B, T, H, W, 3)
        cubes = jax.vmap(
            lambda w, b: extract_stc(w, b, patch_size, quantize=True)
        )(wins, boxes)  # (B, K, T, P, P, 3)
        x = cube_to_input(cubes, scale=True)  # (B, K, P, P, T*3)
        x = x.reshape((B * K,) + x.shape[2:])

        if use_flow:
            fwins = jnp.take(flow_dev, of_windows, axis=0, mode="clip")
            fcubes = jax.vmap(
                lambda w, b: extract_stc(w, b, patch_size, quantize=False)
            )(fwins, boxes)  # (B, K, T_of, P, P, 2)
            mag = flow_magnitude(fcubes)  # (B, K)
            x_of = cube_to_input(fcubes, scale=False)
            x_of = x_of.reshape((B * K,) + x_of.shape[2:])
        else:
            mag = jnp.full((B, K), 10000.0)
            x_of = jnp.zeros(
                (B * K, patch_size, patch_size, net.tot_of_num * net.of_channels)
            )

        x = x.astype(compute_dtype)
        x_of = x_of.astype(compute_dtype)
        variables_c = jax.tree.map(lambda p: p.astype(compute_dtype), variables)
        out = net.apply(variables_c, x, x_of, False)
        err = (out.raw_out - out.raw_tgt).astype(jnp.float32)
        raw_sc = jnp.sum(jnp.square(err), axis=(0, 2, 3, 4))  # (B*K,)
        mu_r, sd_r, mu_o, sd_o = stats
        score = w_raw * (raw_sc - mu_r) / sd_r
        if use_flow and out.of_out is not None:
            oerr = (out.of_out - out.of_tgt).astype(jnp.float32)
            of_sc = jnp.sum(jnp.square(oerr), axis=(0, 2, 3, 4))
            score = score + w_of * (of_sc - mu_o) / sd_o

        score = score.reshape(B, K)
        # a cube whose ceil-box splats zero pixels never reaches the
        # reference's mask max (test.py:354-356)
        nonempty = (jnp.ceil(boxes[..., 2]) > jnp.ceil(boxes[..., 0])) & (
            jnp.ceil(boxes[..., 3]) > jnp.ceil(boxes[..., 1])
        )
        keep = valid & nonempty & (mag > motion_thr)
        score = jnp.where(keep, score, -BIG_NUMBER)
        return jnp.max(score, axis=1)  # (B,)

    return jax.jit(chunk_scores)


def infer_frame_scores(
    cfg: PipelineConfig,
    variables,
    stats: Tuple[float, float, float, float],
    frames: np.ndarray,
    windows: np.ndarray,
    boxes_pad: np.ndarray,
    valid: np.ndarray,
    flow: Optional[np.ndarray] = None,
    of_windows: Optional[np.ndarray] = None,
    chunk: int = 16,
    net: Optional[SelfCompletionNet] = None,
    compute_dtype=jnp.float32,
    device_memory_budget_bytes: float = 4e9,
) -> np.ndarray:
    """Score every frame of a split with the fused path.

    windows/of_windows come from VideoIndex.context_indices; boxes_pad/valid
    from ops.stc.pad_boxes.

    Splits whose frames (+ flow) exceed `device_memory_budget_bytes` are
    automatically routed to infer_frame_scores_segmented (score-equal by
    construction) instead of device_put-ing the world: this path uploads
    the whole stack to HBM, which silently re-imposed the scale ceiling
    the segmented path was built to remove (avenue ~10 GB, SHT ~40 GB).
    """
    mc = cfg.model
    footprint = float(np.prod(frames.shape)) * np.dtype(frames.dtype).itemsize
    if flow is not None:
        footprint += float(np.prod(flow.shape)) * 4.0
    if footprint > device_memory_budget_bytes:
        # derive a segment size that itself respects the budget — the
        # 4096-frame default at avenue/SHT geometry (frames + flow + cube
        # buffers) would exceed HBM on exactly the inputs that trigger
        # this route. x2 headroom covers the per-segment cube buffers and
        # XLA workspace on top of the frame/flow upload.
        per_frame = footprint / max(frames.shape[0], 1)
        seg = int(device_memory_budget_bytes / (2.0 * per_frame))
        seg = max(32, min(4096, seg // 32 * 32))
        return infer_frame_scores_segmented(
            cfg, variables, stats, frames, windows, boxes_pad, valid,
            flow=flow, of_windows=of_windows, net=net,
            segment_frames=seg, compute_dtype=compute_dtype,
        )
    net = net or make_completion_net(mc)
    fn = make_score_chunk_fn(
        net, cfg.fore.patch_size, mc.w_raw, mc.w_of,
        mc.use_flow and flow is not None, cfg.fore.motion_thr,
        compute_dtype,
    )
    n = frames.shape[0]
    frames_dev = jax.device_put(np.asarray(frames))
    if flow is not None:
        flow_dev = jax.device_put(np.asarray(flow))
    else:
        flow_dev = jnp.zeros((1, 1, 1, 2), jnp.float32)
        of_windows = np.zeros((n, 1), np.int64)
    stats_dev = tuple(jnp.asarray(s, jnp.float32) for s in stats)

    out = np.empty(n, dtype=np.float32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        sel = np.arange(lo, hi)
        pad = chunk - sel.size
        sel_p = np.concatenate([sel, np.full(pad, sel[-1])])
        sc = fn(
            variables,
            stats_dev,
            frames_dev,
            flow_dev,
            jnp.asarray(windows[sel_p]),
            jnp.asarray(of_windows[sel_p]),
            jnp.asarray(boxes_pad[sel_p]),
            jnp.asarray(valid[sel_p]),
        )
        out[lo:hi] = np.asarray(sc)[: sel.size]
    return out
