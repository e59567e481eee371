"""Gradient taps, dataset stats, visualization helpers, meters."""

import numpy as np

import jax
import jax.numpy as jnp

from vec_vad_tpu.data.readers import dataset_mean_std
from vec_vad_tpu.utils.gradtap import GradTaps
from vec_vad_tpu.utils.meters import AverageMeter
from vec_vad_tpu.utils.visualize import (
    tile_batch,
    visualize_pair_map,
    visualize_score,
)


def test_grad_tap_captures_intermediate_gradients(rng):
    taps = GradTaps()

    @jax.jit
    def loss(w, x):
        h = taps.tap("hidden", x * w)
        return jnp.sum(h ** 2)

    w = jnp.asarray(3.0)
    x = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    g = jax.grad(loss)(w, x)
    # d loss / d hidden = 2 * hidden
    np.testing.assert_allclose(
        taps.grads["hidden"], 2.0 * np.asarray(x) * 3.0, rtol=1e-6
    )
    np.testing.assert_allclose(float(g), float((2 * 3.0 * x * x).sum()), rtol=1e-6)


def test_dataset_mean_std(rng):
    frames = rng.integers(0, 256, (100, 8, 9, 3), dtype=np.uint8)
    mean, std = dataset_mean_std(frames)
    x = frames.astype(np.float64) / 255.0
    np.testing.assert_allclose(mean, x.mean(axis=(0, 1, 2)), atol=1e-9)
    np.testing.assert_allclose(std, x.std(axis=(0, 1, 2)), atol=1e-9)


def test_visualize_helpers(rng):
    mask = np.full((10, 12), -1e5)
    mask[2:5, 3:6] = 7.0
    mask[6, 6] = 1.0
    img = visualize_score(mask)
    assert img.dtype == np.uint8 and img[3, 4] == 255 and img[0, 0] == 0
    assert img[6, 6] == 0  # the minimum finite score maps to 0

    batch = rng.integers(0, 256, (5, 4, 4, 3)).astype(np.uint8)
    tiled = tile_batch(batch, cols=3)
    assert tiled.shape == (8, 12, 3)
    np.testing.assert_array_equal(tiled[:4, :4], batch[0])

    a = rng.random((2, 4, 4, 3)).astype(np.float32)
    b = rng.random((2, 4, 4, 3)).astype(np.float32)
    t1, t2, heat = visualize_pair_map(a, b, cols=2)
    assert t1.shape == t2.shape == (4, 8, 3)
    assert heat.shape == (4, 8, 3)


def test_average_meter():
    m = AverageMeter()
    m.update(2.0, n=2)
    m.update(5.0)
    assert m.count == 3
    np.testing.assert_allclose(m.avg, (2.0 * 2 + 5.0) / 3)
    m.reset()
    assert m.count == 0 and m.avg == 0
