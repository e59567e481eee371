"""Context-window parity: vectorized context_indices vs a literal scalar
oracle re-derived from the reference algorithm (vad_datasets.py:277-354)."""

import numpy as np
import pytest

from vec_vad_tpu.data.video_index import (
    VideoIndex,
    VideoTooShortError,
    context_indices,
)


def oracle_context_range(frame_video_idx, indice, ctx, border_mode):
    """Scalar oracle following the reference's control flow literally."""
    fvi = list(frame_video_idx)
    n = len(fvi)
    if border_mode == "elastic":
        if indice - ctx < 0:
            indice = ctx
        elif indice + ctx > n - 1:
            indice = n - 1 - ctx
        start, end = indice - ctx, indice + ctx
        need = 2 * ctx + 1
    elif border_mode == "predict":
        start = max(indice - ctx, 0)
        end = indice
        need = ctx + 1
    else:  # hard
        start = max(indice - ctx, 0)
        end = min(indice + ctx, n - 1)
        need = 2 * ctx + 1

    center = fvi[indice]
    vid = fvi[start : end + 1]
    pad = need - len(vid)
    if pad > 0:
        vid = [vid[0]] * pad + vid if start == 0 else vid + [vid[-1]] * pad
    tmp = np.array(vid) - center
    offset = int(tmp.sum())
    if tmp[0] != 0 and tmp[-1] != 0:
        raise VideoTooShortError("both ends foreign")
    if pad == 0 and offset == 0:
        return list(range(start, end + 1))
    if border_mode == "elastic":
        return list(range(start - offset, end - offset + 1))
    if border_mode == "predict":
        if pad > 0 and abs(offset) > 0:
            raise VideoTooShortError("pad and offset")
        idx = list(range(start - offset, end + 1))
        return [idx[0]] * max(abs(offset), pad) + idx
    # hard
    if pad > 0 and abs(offset) > 0:
        raise VideoTooShortError("pad and offset")
    if offset > 0:
        idx = list(range(start, end - offset + 1))
        return idx + [idx[-1]] * abs(offset)
    if offset < 0:
        idx = list(range(start - offset, end + 1))
        return [idx[0]] * abs(offset) + idx
    if start == 0:
        idx = list(range(start - offset, end + 1))
        return [idx[0]] * pad + idx
    idx = list(range(start, end - offset + 1))
    return idx + [idx[-1]] * pad


def _fvi(lengths):
    return np.repeat(np.arange(1, len(lengths) + 1), lengths)


@pytest.mark.parametrize("border_mode", ["elastic", "predict", "hard"])
@pytest.mark.parametrize("ctx", [1, 2, 4])
@pytest.mark.parametrize(
    "lengths",
    [
        [30],
        [12, 9, 15],
        [5, 5, 5, 5],
        [9, 40, 6],
    ],
)
def test_parity_with_oracle(border_mode, ctx, lengths):
    fvi = _fvi(lengths)
    expected, oracle_raises = [], False
    try:
        for i in range(len(fvi)):
            expected.append(oracle_context_range(fvi, i, ctx, border_mode))
    except VideoTooShortError:
        oracle_raises = True

    if oracle_raises:
        with pytest.raises(VideoTooShortError):
            context_indices(fvi, ctx, border_mode)
        return
    got = context_indices(fvi, ctx, border_mode)
    for i in range(len(fvi)):
        assert list(got[i]) == expected[i], (border_mode, ctx, lengths, i)


@pytest.mark.parametrize("border_mode", ["predict", "hard"])
def test_too_short_raises(border_mode):
    # First video shorter than the context: frame in the 2nd video near the
    # array head hits the reference's NotImplementedError path.
    fvi = _fvi([2, 10])
    with pytest.raises(VideoTooShortError):
        context_indices(fvi, 4, border_mode)


def test_window_properties():
    fvi = _fvi([10, 10])
    win = context_indices(fvi, 4, "predict")
    assert win.shape == (20, 5)
    # Right-most element is the frame itself.
    np.testing.assert_array_equal(win[:, -1], np.arange(20))
    # All window frames come from the frame's own video.
    np.testing.assert_array_equal(fvi[win], np.repeat(fvi[:, None], 5, axis=1))
    # ctx=0 degenerates to identity.
    np.testing.assert_array_equal(
        context_indices(fvi, 0, "predict")[:, 0], np.arange(20)
    )


def test_video_index_synthetic_roundtrip(tmp_path):
    from vec_vad_tpu.data.readers import load_frame_labels, load_frames
    from vec_vad_tpu.data.synthetic import make_synthetic_dataset

    ds = make_synthetic_dataset(
        root=str(tmp_path), frames_per_video=12, write_to_disk=True
    )
    train_idx = VideoIndex.from_layout("synthetic", str(tmp_path), "train", ".tif")
    test_idx = VideoIndex.from_layout("synthetic", str(tmp_path), "test", ".tif")
    assert train_idx.total_frames == ds.train_frames.shape[0]
    assert test_idx.total_frames == ds.test_frames.shape[0]
    np.testing.assert_array_equal(train_idx.video_lengths, ds.train_video_lengths)

    frames = load_frames(test_idx)
    assert frames.shape == ds.test_frames.shape
    np.testing.assert_array_equal(frames, ds.test_frames)

    labels = load_frame_labels("synthetic", str(tmp_path), test_idx)
    np.testing.assert_array_equal(labels, ds.test_labels)
    assert labels.sum() > 0
