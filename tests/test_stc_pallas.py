"""Pallas STC kernel parity vs the einsum extraction path (interpret mode;
the same comparison was verified on real TPU hardware at the full
UCSDped2 workload)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vec_vad_tpu.ops.stc import extract_stc
from vec_vad_tpu.ops.stc_pallas import extract_cubes_pallas, prepare_cube_meta


def test_pallas_stc_matches_einsum(rng):
    N, H, W = 12, 64, 128
    frames = rng.integers(0, 256, (N, H, W, 3), dtype=np.uint8)
    M, T = 9, 5
    win = rng.integers(0, N, (M, T)).astype(np.int32)
    boxes = []
    for _ in range(M):
        x0 = rng.uniform(0, W - 6)
        y0 = rng.uniform(0, H - 6)
        boxes.append(
            [x0, y0, min(x0 + rng.uniform(3, 40), W), min(y0 + rng.uniform(3, 30), H)]
        )
    boxes = np.array(boxes, np.float32)
    MC = 32
    origins, meta, fits = prepare_cube_meta(boxes, MC, (H, W))
    assert fits.all()
    assert (origins[:, 0] % 8 == 0).all()

    frames_chw = jnp.asarray(np.transpose(frames, (0, 3, 1, 2)))
    out = np.asarray(
        extract_cubes_pallas(
            frames_chw, jnp.asarray(win), jnp.asarray(origins),
            jnp.asarray(meta), 16, MC, True, True,
        )
    )
    assert out.shape == (M, T, 3, 16, 16)
    for i in range(M):
        ref = np.asarray(
            extract_stc(frames[win[i]], boxes[i][None], 16, quantize=True)
        )[0]
        got = np.transpose(out[i], (0, 2, 3, 1))
        # both paths quantize; disagreements only at exact .5 rounding
        # boundaries between float orders of operations
        assert np.abs(got - ref).max() <= 1.0


def test_prepare_cube_meta_fit_flag():
    boxes = np.array(
        [[0.0, 0.0, 20.0, 20.0], [0.0, 0.0, 20.0, 200.0]], np.float32
    )
    origins, meta, fits = prepare_cube_meta(boxes, 64, (256, 256))
    np.testing.assert_array_equal(fits, [True, False])
    # ch, cw recorded exactly
    np.testing.assert_allclose(meta[0, :2], [20.0, 20.0])
