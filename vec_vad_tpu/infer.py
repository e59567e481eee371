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
from vec_vad_tpu.ops.stc import cube_to_input, extract_stc
from vec_vad_tpu.score.scoring import BIG_NUMBER


def make_score_chunk_fn(
    net: SelfCompletionNet,
    patch_size: int,
    w_raw: float,
    w_of: float,
    use_flow: bool,
    motion_thr: float = 0.0,
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
        wins = jnp.take(frames_dev, windows, axis=0)  # (B, T, H, W, 3)
        cubes = jax.vmap(
            lambda w, b: extract_stc(w, b, patch_size, quantize=True)
        )(wins, boxes)  # (B, K, T, P, P, 3)
        x = cube_to_input(cubes, scale=True)  # (B, K, P, P, T*3)
        x = x.reshape((B * K,) + x.shape[2:])

        if use_flow:
            fwins = jnp.take(flow_dev, of_windows, axis=0)
            fcubes = jax.vmap(
                lambda w, b: extract_stc(w, b, patch_size, quantize=False)
            )(fwins, boxes)  # (B, K, T_of, P, P, 2)
            mag = jnp.mean(
                jnp.sum(jnp.square(fcubes), axis=(-3, -2, -1)), axis=-1
            )  # (B, K)
            x_of = cube_to_input(fcubes, scale=False)
            x_of = x_of.reshape((B * K,) + x_of.shape[2:])
        else:
            mag = jnp.full((B, K), 10000.0)
            x_of = jnp.zeros(
                (B * K, patch_size, patch_size, net.tot_of_num * net.of_channels)
            )

        out = net.apply(variables, x, x_of, False)
        raw_sc = jnp.sum(
            jnp.square(out.raw_out - out.raw_tgt), axis=(0, 2, 3, 4)
        )  # (B*K,)
        mu_r, sd_r, mu_o, sd_o = stats
        score = w_raw * (raw_sc - mu_r) / sd_r
        if use_flow and out.of_out is not None:
            of_sc = jnp.sum(
                jnp.square(out.of_out - out.of_tgt), axis=(0, 2, 3, 4)
            )
            score = score + w_of * (of_sc - mu_o) / sd_o

        score = score.reshape(B, K)
        keep = valid & (mag > motion_thr)
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
) -> np.ndarray:
    """Score every frame of a split with the fused path.

    windows/of_windows come from VideoIndex.context_indices; boxes_pad/valid
    from ops.stc.pad_boxes.
    """
    mc = cfg.model
    net = net or make_completion_net(mc)
    fn = make_score_chunk_fn(
        net, cfg.fore.patch_size, mc.w_raw, mc.w_of,
        mc.use_flow and flow is not None, cfg.fore.motion_thr,
    )
    n = frames.shape[0]
    frames_dev = jax.device_put(jnp.asarray(frames))
    if flow is not None:
        flow_dev = jax.device_put(jnp.asarray(flow))
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
