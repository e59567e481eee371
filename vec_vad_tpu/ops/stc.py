"""Spatio-temporal cube (STC) extraction as a fused on-device op.

Replaces the reference's per-bbox CPU hot loop (`get_foreground`,
vad_datasets.py:70-93): integer-ceil box edges, crop the same box from every
frame of the temporal window, bilinear-resize each crop to patch_size².

TPU-native formulation: bilinear resize is separable, so each crop-resize is
two small matrix multiplications with interpolation matrices built from the
(dynamic) box coordinates:

    patch[t, p, q, c] = sum_{h, w} My[p, h] * window[t, h, w, c] * Mx[q, w]

My/Mx are (P, H)/(P, W) dense matrices with <=2 nonzeros per row, built with
static shapes from traced box coords — so the whole thing jits, vmaps over
boxes, and runs on the MXU instead of cv2 on the host. Sampling follows
cv2.resize INTER_LINEAR's half-pixel-center convention with edge clamping
(verified against cv2 in tests/test_stc.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _interp_matrix(lo, hi, src_size: int, out_size: int) -> jnp.ndarray:
    """(out_size, src_size) bilinear interpolation matrix sampling the
    half-open crop [lo, hi) with cv2's half-pixel-center convention.

    lo/hi are traced int32 scalars (already integer-ceil'd box edges,
    vad_datasets.py:74-75). Degenerate crops (hi <= lo) sample column `lo`.
    """
    lo = jnp.asarray(lo, jnp.int32)
    hi = jnp.maximum(jnp.asarray(hi, jnp.int32), lo + 1)
    crop = (hi - lo).astype(jnp.float32)
    j = jnp.arange(out_size, dtype=jnp.float32)
    # cv2 convention: src = (dst + 0.5) * scale - 0.5, clamped to the crop.
    pos = jnp.clip((j + 0.5) * crop / out_size - 0.5, 0.0, crop - 1.0)
    i0f = jnp.floor(pos)
    frac = pos - i0f
    i0 = i0f.astype(jnp.int32) + lo
    i1 = jnp.minimum(i0 + 1, hi - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (out_size, src_size), 1)
    m = jnp.where(cols == i0[:, None], 1.0 - frac[:, None], 0.0)
    m = m + jnp.where(cols == i1[:, None], frac[:, None], 0.0)
    return m


@functools.partial(jax.jit, static_argnames=("patch_size", "quantize"))
def crop_resize_cube(
    window: jnp.ndarray, box: jnp.ndarray, patch_size: int = 32,
    quantize: bool = False,
) -> jnp.ndarray:
    """Crop `box` from every frame of `window` and resize to patch_size².

    Args:
      window: (T, H, W, C) float or uint8 frame stack.
      box: (4,) [x_min, y_min, x_max, y_max]; edges are integer-ceil'd like
        the reference (vad_datasets.py:74-75).
      quantize: round the result to integers, mimicking the reference's
        uint8 cube storage (cv2.resize on uint8 rounds to nearest).

    Returns: (T, P, P, C) float32 cube.
    """
    x0 = jnp.ceil(box[0]).astype(jnp.int32)
    y0 = jnp.ceil(box[1]).astype(jnp.int32)
    x1 = jnp.ceil(box[2]).astype(jnp.int32)
    y1 = jnp.ceil(box[3]).astype(jnp.int32)
    T, H, W, C = window.shape
    my = _interp_matrix(y0, y1, H, patch_size)  # (P, H)
    mx = _interp_matrix(x0, x1, W, patch_size)  # (P, W)
    win = window.astype(jnp.float32)
    patch = jnp.einsum(
        "ph,thwc,qw->tpqc", my, win, mx,
        precision=jax.lax.Precision.HIGHEST,
    )
    if quantize:
        patch = jnp.round(patch)
    return patch


@functools.partial(jax.jit, static_argnames=("patch_size", "quantize"))
def extract_stc(
    window: jnp.ndarray,
    boxes: jnp.ndarray,
    patch_size: int = 32,
    quantize: bool = False,
) -> jnp.ndarray:
    """Vectorized crop-resize for a padded (K, 4) box set.

    Returns (K, T, P, P, C) float32 cubes. Rows for invalid/padded boxes
    contain garbage; callers mask with their validity vector.
    """
    return jax.vmap(
        lambda b: crop_resize_cube(window, b, patch_size, quantize)
    )(boxes)


def cube_to_input(cubes: jnp.ndarray, scale: bool) -> jnp.ndarray:
    """Stack a cube's frames into the network's channel dimension.

    (..., T, P, P, C) -> (..., P, P, T*C) with T-major channel order —
    matching the reference's (H, W, T·C) reshape + ToTensor
    (vad_datasets.py:148-166). `scale=True` applies the uint8 -> [0, 1]
    ToTensor scaling used for raw frames (flow cubes stay unscaled).
    """
    t_axis = cubes.ndim - 4
    perm = list(range(t_axis)) + [t_axis + 1, t_axis + 2, t_axis, t_axis + 3]
    x = jnp.transpose(cubes, perm)
    x = x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))
    if scale:
        x = x / 255.0
    return x


def flow_magnitude(flow_cubes: jnp.ndarray) -> jnp.ndarray:
    """Per-cube motion magnitude for the motion filter (train.py:167-178):
    sum of squared flow over (H, W, C), averaged over the temporal axis.

    flow_cubes: (K, T, P, P, 2) -> (K,)
    """
    return jnp.mean(jnp.sum(flow_cubes.astype(jnp.float32) ** 2, axis=(-3, -2, -1)), axis=-1)


def pad_boxes(
    boxes_list, max_boxes: int
) -> "tuple[np.ndarray, np.ndarray]":
    """Pad a ragged per-frame list of (K_i, 4) box arrays to a dense
    (N, max_boxes, 4) array + (N, max_boxes) validity mask.

    This is the static-shape bridge for the reference's object-array bbox
    files (raw_datasets/*/bboxes_*.npy)."""
    n = len(boxes_list)
    out = np.zeros((n, max_boxes, 4), dtype=np.float32)
    valid = np.zeros((n, max_boxes), dtype=bool)
    for i, b in enumerate(boxes_list):
        b = np.asarray(b, dtype=np.float32).reshape(-1, 4)
        k = min(b.shape[0], max_boxes)
        if b.shape[0] > max_boxes:
            raise ValueError(
                f"frame {i} has {b.shape[0]} boxes > max_boxes={max_boxes}"
            )
        out[i, :k] = b[:k]
        valid[i, :k] = True
    return out, valid
