"""Pallas STC extraction kernel: fetch only each box's row stripe.

The einsum extraction path (ops.stc) contracts interpolation matrices
against FULL frames — simple and MXU-friendly, but it reads all H*W per
(cube, frame) when a box covers a narrow row band. This kernel DMAs a
fixed (MAX_CROP + 8)-row stripe around each box from HBM into VMEM and
interpolates there, cutting HBM traffic by ~H/(MAX_CROP+8) per cube.

STATUS: compiles and runs correctly on TPU hardware (verified vs the
einsum path on the real UCSDped2 workload), but the one-cube-per-program
grid serializes DMA latency, so at typical box densities the batched
einsum path is currently FASTER and remains the default. This kernel is
the building block for a multi-cube-per-program, double-buffered variant;
it also documents the Mosaic constraints that shape such kernels
(8/128-aligned dynamic DMA offsets with pl.multiple_of, (small, M)
scalar-prefetch layouts to fit SMEM, int32-hop uint8 casts).

Mosaic constrains dynamic DMA offsets to the memref tiling (sublane
starts divisible by 8, lane starts by 128), so the stripe starts at an
8-aligned row and spans the full width; the x crop happens inside the
interpolation matrix (which reads only the crop's columns anyway — the
lane dimension costs bandwidth, not extra FLOPs beyond the contraction).

Layout: frames channel-major (N, C, H, W) so stripes are 2-D slices;
output (M, T, C, P, P) transposes to the channel-stacked cube layout
afterwards (cheap XLA op on small cubes). Boxes taller than MAX_CROP
fall back to the einsum path (`fits` mask from prepare_cube_meta).

cv2 sampling semantics match ops.stc._interp_matrix exactly (verified in
tests/test_stc_pallas.py, including on-hardware spot checks).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def prepare_cube_meta(
    boxes: np.ndarray, max_crop: int, frame_hw: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-cube scalars for the kernel.

    boxes: (M, 4) raw xyxy. Returns (y_origin (M, 1) int32 [8-aligned
    stripe start], meta (M, 4) float32 [ch, cw, dy, x0], fits (M,) bool).
    Integer-ceil edges per the reference (vad_datasets.py:74-75).
    """
    H, W = frame_hw
    stripe = max_crop + 8
    x0 = np.ceil(boxes[:, 0]).astype(np.int64)
    y0 = np.ceil(boxes[:, 1]).astype(np.int64)
    x1 = np.maximum(np.ceil(boxes[:, 2]).astype(np.int64), x0 + 1)
    y1 = np.maximum(np.ceil(boxes[:, 3]).astype(np.int64), y0 + 1)
    cw = x1 - x0
    ch = y1 - y0
    fits = ch <= max_crop
    y0c = np.clip((y0 // 8) * 8, 0, max(H - stripe, 0))
    origins = y0c[:, None].astype(np.int32)
    meta = np.stack([ch, cw, y0 - y0c, x0], axis=1).astype(np.float32)
    return origins, meta, fits


def _interp_rows(extent, offset, P: int, MC: int):
    """(P, MC) bilinear sampling matrix for a crop of `extent` starting at
    `offset` inside the fetched window (cv2 half-pixel convention)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).astype(jnp.float32)
    pos = jnp.clip((i + 0.5) * extent / P - 0.5, 0.0, extent - 1.0) + offset
    i0 = jnp.floor(pos)
    frac = pos - i0
    hi = offset + extent - 1.0
    i1 = jnp.minimum(i0 + 1.0, hi)
    cols = jax.lax.broadcasted_iota(jnp.int32, (P, MC), 1).astype(jnp.float32)
    m = jnp.where(cols == i0, 1.0 - frac, 0.0)
    m = m + jnp.where(cols == i1, frac, 0.0)
    return m


def _stc_kernel(
    # scalar-prefetch refs
    win_ref,      # (T, M) int32 frame index per time/cube — transposed so
                  # the long cube axis is the (padded-to-128) minor dim in
                  # SMEM; (M, small) layouts blow the 1 MB SMEM budget
    org_ref,      # (1, M) int32 stripe start row (8-aligned)
    meta_ref,     # (4, M) f32 (ch, cw, dy, x0)
    # tensor refs
    frames_ref,   # (N, C, H, W) uint8 in ANY/HBM
    out_ref,      # (1, CPB, T, C, P, P) f32 block (this program's cubes)
    # scratch
    stripe_buf,   # (CPB, T, C, STRIPE, W) uint8 VMEM
    sems,         # DMA semaphores (CPB, T)
    *,
    T: int,
    C: int,
    P: int,
    stripe: int,
    W: int,
    quantize: bool,
    cpb: int,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)

    # Issue every cube's stripe DMAs up front so transfers overlap both
    # each other and the per-cube compute below.
    copies = []
    for j in range(cpb):
        m = g * cpb + j
        # prepare_cube_meta 8-aligns the stripe start; tell Mosaic so the
        # dynamic DMA offset provably matches the (8, 128) tiling
        y0c = pl.multiple_of(org_ref[0, m], 8)
        for t in range(T):
            dma = pltpu.make_async_copy(
                frames_ref.at[win_ref[t, m], :, pl.ds(y0c, stripe), :],
                stripe_buf.at[j, t],
                sems.at[j, t],
            )
            dma.start()
            copies.append(dma)

    for j in range(cpb):
        m = g * cpb + j
        ch = meta_ref[0, m]
        cw = meta_ref[1, m]
        dy = meta_ref[2, m]
        x0 = meta_ref[3, m]
        my = _interp_rows(ch, dy, P, stripe)  # (P, STRIPE)
        mx = _interp_rows(cw, x0, P, W)  # (P, W)
        for t in range(T):
            copies[j * T + t].wait()
            for c in range(C):
                # Mosaic has no direct uint8 -> f32 cast; hop via int32.
                win = stripe_buf[j, t, c].astype(jnp.int32).astype(jnp.float32)
                patch = jnp.dot(
                    jnp.dot(my, win, preferred_element_type=jnp.float32),
                    mx.T,
                    preferred_element_type=jnp.float32,
                )  # (P, P)
                if quantize:
                    patch = jnp.round(patch)
                out_ref[0, j, t, c] = patch


def _extract_call(
    frames_chw, win_idx, origins, meta, P, max_crop, quantize, interpret,
    cpb: int = 8,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, C, H, W = frames_chw.shape
    M, T = win_idx.shape
    stripe = max_crop + 8
    assert H >= stripe, (H, stripe)
    cpb = min(cpb, M)
    while M % cpb:  # largest divisor of M not exceeding the requested cpb
        cpb -= 1
    win_t = win_idx.T          # (T, M)
    org_t = origins.T          # (1, M)
    meta_t = meta.T            # (4, M)

    kernel = functools.partial(
        _stc_kernel, T=T, C=C, P=P, stripe=stripe, W=W, quantize=quantize,
        cpb=cpb,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(M // cpb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, cpb, T, C, P, P), lambda g, *_: (g, 0, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((cpb, T, C, stripe, W), jnp.uint8),
            pltpu.SemaphoreType.DMA((cpb, T)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (M // cpb, cpb, T, C, P, P), jnp.float32
        ),
        interpret=interpret,
    )(win_t, org_t, meta_t, frames_chw)
    return out.reshape(M, T, C, P, P)


@functools.partial(
    jax.jit,
    static_argnames=("patch_size", "max_crop", "quantize", "interpret", "chunk_m"),
)
def extract_cubes_pallas(
    frames_chw: jnp.ndarray,  # (N, C, H, W) uint8
    win_idx: jnp.ndarray,  # (M, T) int32
    origins: jnp.ndarray,  # (M, 1) int32
    meta: jnp.ndarray,  # (M, 4) float32
    patch_size: int = 32,
    max_crop: int = 128,
    quantize: bool = True,
    interpret: bool = False,
    chunk_m: int = 4096,
) -> jnp.ndarray:
    """(M, T, C, P, P) float32 cubes via row-stripe DMA.

    The per-cube metadata is scalar-prefetched into SMEM (~1 MB), so the
    cube axis is processed in chunk_m-sized pieces under lax.map. Callers
    must pad M to a multiple of chunk_m (or pass a smaller chunk_m that
    divides M).
    """
    M, T = win_idx.shape
    P = patch_size
    if M <= chunk_m:
        return _extract_call(
            frames_chw, win_idx, origins, meta, P, max_crop, quantize, interpret
        )
    assert M % chunk_m == 0, (M, chunk_m)
    n_chunks = M // chunk_m

    def one(args):
        w, o, mt = args
        return _extract_call(
            frames_chw, w, o, mt, P, max_crop, quantize, interpret
        )

    out = jax.lax.map(
        one,
        (
            win_idx.reshape(n_chunks, chunk_m, T),
            origins.reshape(n_chunks, chunk_m, 1),
            meta.reshape(n_chunks, chunk_m, 4),
        ),
    )
    C = frames_chw.shape[1]
    return out.reshape(M, T, C, P, P)
