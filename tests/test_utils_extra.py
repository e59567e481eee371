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


def test_segment_flow_matches_reference_recipe(rng):
    """Oracle: the literal flowlib.py:150-184 sequential recipe."""
    from vec_vad_tpu.utils import flowviz

    flow = rng.normal(scale=2.0, size=(13, 11, 2)).astype(np.float64)
    # Exercise every special branch: exact zeros, axis-aligned flow, huge flow.
    flow[0, 0] = (0.0, 0.0)
    flow[1, 1] = (0.0, 3.0)
    flow[2, 2] = (0.0, -3.0)
    flow[3, 3] = (3.0, 0.0)
    flow[4, 4] = (-3.0, 0.0)
    flow[5, 5] = (2e8, 1.0)
    flow[6, 6] = (1.0, -2e8)

    u = flow[:, :, 0].copy()
    v = flow[:, :, 1].copy()
    idx = (np.abs(u) > 1e8) | (np.abs(v) > 1e8)
    idx2 = np.abs(u) == 0.0
    class0 = (v == 0) & (u == 0)
    u[idx2] = 0.00001
    tan_value = v / u
    class1 = (tan_value < 1) & (tan_value >= 0) & (u > 0) & (v >= 0)
    class2 = (tan_value >= 1) & (u >= 0) & (v >= 0)
    class3 = (tan_value < -1) & (u <= 0) & (v >= 0)
    class4 = (tan_value < 0) & (tan_value >= -1) & (u < 0) & (v >= 0)
    class8 = (tan_value >= -1) & (tan_value < 0) & (u > 0) & (v <= 0)
    class7 = (tan_value < -1) & (u >= 0) & (v <= 0)
    class6 = (tan_value >= 1) & (u <= 0) & (v <= 0)
    class5 = (tan_value >= 0) & (tan_value < 1) & (u < 0) & (v <= 0)
    expected = np.zeros(u.shape)
    for label, mask in [
        (1, class1), (2, class2), (3, class3), (4, class4),
        (5, class5), (6, class6), (7, class7), (8, class8),
    ]:
        expected[mask] = label
    expected[class0] = 0
    expected[idx] = 0

    seg = flowviz.segment_flow(flow)
    np.testing.assert_array_equal(seg, expected)
    assert set(np.unique(seg)) <= set(range(9))


def test_disparity_io_roundtrip(tmp_path, rng):
    import cv2

    from vec_vad_tpu.utils import flowviz

    disp = (rng.random((6, 7)) * 128).astype(np.float32)
    # .flo packing: u-channel carries disparity, v is zero
    p = str(tmp_path / "d.flo")
    flowviz.disp_to_flowfile(disp, p)
    back = flowviz.read_flo(p)
    np.testing.assert_array_equal(back[..., 0], disp)
    np.testing.assert_array_equal(back[..., 1], 0)

    # KITTI png roundtrip at the 1/256 quantization
    q = str(tmp_path / "d.png")
    cv2.imwrite(q, (disp * 256).astype(np.uint16))
    got = flowviz.read_disp_png(q)
    np.testing.assert_allclose(got, disp, atol=1 / 256.0)


def test_render_flow_and_scale_image(tmp_path, rng):
    from matplotlib import colors as mcolors

    from vec_vad_tpu.utils import flowviz

    flow = rng.normal(scale=4.0, size=(9, 8, 2)).astype(np.float32)
    y = flowviz.render_flow(flow, mode="Y")
    np.testing.assert_array_equal(y, flowviz.flow_to_image(flow))

    # 'RGB' mode oracle: the literal flowlib.py:51-77 HSV recipe via
    # matplotlib's own hsv_to_rgb.
    f3 = np.dstack([np.abs(flow), rng.integers(0, 2, (9, 8)).astype(np.float64)])
    du, dv, valid = f3[:, :, 0], f3[:, :, 1], f3[:, :, 2]
    max_flow = max(np.max(du), np.max(dv))
    img = np.zeros((9, 8, 3), dtype=np.float64)
    img[:, :, 0] = np.arctan2(dv, du) / (2 * np.pi)
    img[:, :, 1] = np.sqrt(du * du + dv * dv) * 8 / max_flow
    img[:, :, 2] = 8 - img[:, :, 1]
    img[img < 0] = 0
    img[img > 1] = 1
    img = mcolors.hsv_to_rgb(img)
    for c in range(3):
        img[:, :, c] = img[:, :, c] * valid
    got = flowviz.render_flow(f3, mode="RGB")
    np.testing.assert_allclose(got, img, atol=1e-12)

    # show_flow reads + renders without displaying
    p = str(tmp_path / "s.flo")
    flowviz.write_flo(p, flow)
    shown = flowviz.show_flow(p, show=False)
    np.testing.assert_array_equal(shown, y)

    im = rng.random((5, 5)).astype(np.float32)
    scaled = flowviz.scale_image(im, (0, 255))
    assert scaled.dtype == np.uint8 and scaled.min() == 0 and scaled.max() == 255
