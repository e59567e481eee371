"""Native C++ frame loader: decode parity with cv2, prefetch pipeline,
fallback behavior."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vec_vad_tpu.runtime.native_loader import (
    NativeFrameStack,
    NativePool,
    NativePrefetcher,
    get_lib,
    make_frame_stack,
    native_supported,
)


@pytest.fixture(scope="module")
def jpg_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("jpgds")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(24):
        img = rng.integers(0, 256, (60, 80, 3), dtype=np.uint8)
        p = str(root / f"{i:03d}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    return paths


def test_lib_builds_and_loads():
    assert get_lib() is not None


def test_jpeg_decode_matches_cv2(jpg_tree):
    pool = NativePool(2)
    out = pool.decode_batch(jpg_tree, 60, 80)
    ref = np.stack([cv2.imread(p) for p in jpg_tree])
    # same libjpeg underneath -> bit-identical BGR output
    np.testing.assert_array_equal(out, ref)


def test_png_decode_matches_cv2(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for i in range(6):
        img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
        p = str(tmp_path / f"{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    out = NativePool(2).decode_batch(paths, 40, 50)
    np.testing.assert_array_equal(out, np.stack([cv2.imread(p) for p in paths]))


def test_tiff_decode_matches_cv2(tmp_path):
    """UCSDped2 ships grayscale .tif frames (frame_size table,
    vad_datasets.py:16) — the flagship dataset must hit the native path.
    Gray expands to replicated BGR exactly like cv2.imread IMREAD_COLOR."""
    rng = np.random.default_rng(2)
    paths = []
    for i in range(4):  # grayscale, like the real dataset
        img = rng.integers(0, 256, (40, 50), dtype=np.uint8)
        p = str(tmp_path / f"g{i}.tif")
        cv2.imwrite(p, img)
        paths.append(p)
    for i in range(2):  # color tiffs too
        img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
        p = str(tmp_path / f"c{i}.tiff")
        cv2.imwrite(p, img)
        paths.append(p)
    out = NativePool(2).decode_batch(paths, 40, 50)
    np.testing.assert_array_equal(out, np.stack([cv2.imread(p) for p in paths]))


def test_prefetcher_streams_all(jpg_tree):
    pf = NativePrefetcher(jpg_tree, chunk=10, h=60, w=80, n_threads=2)
    chunks = list(pf)
    assert sum(c.shape[0] for c in chunks) == len(jpg_tree)
    assert [c.shape[0] for c in chunks] == [10, 10, 4]
    ref = np.stack([cv2.imread(p) for p in jpg_tree])
    np.testing.assert_array_equal(np.concatenate(chunks), ref)


def test_frame_stack_and_fallback(jpg_tree, tmp_path):
    from vec_vad_tpu.data.readers import LazyFrameStack
    from vec_vad_tpu.data.video_index import VideoIndex

    idx = VideoIndex(["v"], np.array([len(jpg_tree)]), list(jpg_tree))
    fs = make_frame_stack(idx)
    assert isinstance(fs, NativeFrameStack)
    ref = np.stack([cv2.imread(p) for p in jpg_tree])
    np.testing.assert_array_equal(fs[3:9], ref[3:9])
    np.testing.assert_array_equal(fs[np.array([[0, 1], [2, 3]])],
                                  ref[np.array([[0, 1], [2, 3]])])

    # .tif is native since round 5 (UCSDped2's own format)
    tif = str(tmp_path / "x.tif")
    cv2.imwrite(tif, ref[0])
    assert native_supported(tif)
    idx2 = VideoIndex(["v"], np.array([1]), [tif])
    assert isinstance(make_frame_stack(idx2), NativeFrameStack)

    # a genuinely unsupported extension -> cv2 fallback
    bmp = str(tmp_path / "x.bmp")
    cv2.imwrite(bmp, ref[0])
    assert not native_supported(bmp)
    idx3 = VideoIndex(["v"], np.array([1]), [bmp])
    assert isinstance(make_frame_stack(idx3), LazyFrameStack)


def test_decode_error_reporting(jpg_tree):
    pool = NativePool(2)
    with pytest.raises(IOError):
        pool.decode_batch(jpg_tree[:3], 10, 10)  # wrong dims
    with pytest.raises(IOError):
        pool.decode_batch(["/nonexistent.jpg"], 60, 80)
