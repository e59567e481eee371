"""Block-routing parity: our calc_block_idx vs a literal re-expression of the
reference algorithm (utils.py:5-26)."""

import numpy as np
import pytest

from vec_vad_tpu.utils.blocks import calc_block_idx, calc_block_idx_batched


def reference_calc_block_idx(x_min, x_max, y_min, y_max, h_step, w_step, mode):
    """Independent re-derivation of utils.py:5-26 used as the test oracle."""
    all_blocks = []
    center = np.array([(y_min + y_max) / 2, (x_min + x_max) / 2])
    all_blocks.append(center + center)
    if mode > 1:
        all_blocks.append(np.array([y_min, center[1]]) + center)
        all_blocks.append(np.array([y_max, center[1]]) + center)
        all_blocks.append(np.array([center[0], x_min]) + center)
        all_blocks.append(np.array([center[0], x_max]) + center)
    if mode >= 9:
        all_blocks.append(np.array([y_min, x_min]) + center)
        all_blocks.append(np.array([y_max, x_max]) + center)
        all_blocks.append(np.array([y_max, x_min]) + center)
        all_blocks.append(np.array([y_min, x_max]) + center)
    all_blocks = np.array(all_blocks) / 2
    h_idx = list((all_blocks[:, 0] / h_step).astype(np.int64))
    w_idx = list((all_blocks[:, 1] / w_step).astype(np.int64))
    return set(zip(h_idx, w_idx))


@pytest.mark.parametrize("mode", [1, 2, 9])
def test_block_idx_parity(rng, mode):
    h, w = 240, 360
    for h_block, w_block in [(1, 1), (2, 2), (3, 4)]:
        h_step, w_step = h / h_block, w / w_block
        for _ in range(200):
            x1, y1 = rng.uniform(0, w - 2), rng.uniform(0, h - 2)
            x2 = rng.uniform(x1 + 1, w)
            y2 = rng.uniform(y1 + 1, h)
            ours = set(calc_block_idx(x1, x2, y1, y2, h_step, w_step, mode))
            ref = reference_calc_block_idx(x1, x2, y1, y2, h_step, w_step, mode)
            assert ours == ref


@pytest.mark.parametrize("mode", [1, 2, 9])
def test_batched_matches_scalar(rng, mode):
    h, w = 240, 360
    h_block, w_block = 3, 4
    h_step, w_step = h / h_block, w / w_block
    boxes = []
    for _ in range(100):
        x1, y1 = rng.uniform(0, w - 2), rng.uniform(0, h - 2)
        boxes.append([x1, y1, rng.uniform(x1 + 1, w), rng.uniform(y1 + 1, h)])
    boxes = np.array(boxes)
    member = calc_block_idx_batched(boxes, h_step, w_step, mode, h_block, w_block)
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        expect = set(calc_block_idx(x1, x2, y1, y2, h_step, w_step, mode))
        got = {(hh, ww) for hh, ww in zip(*np.nonzero(member[i]))}
        assert got == expect


def test_config_roundtrip(tmp_path):
    from vec_vad_tpu.config import load_ini_config

    cfg_text = """
[shared_parameters]
dataset_name = UCSDped2
raw_dataset_dir = raw_datasets
foreground_extraction_mode = obj_det_with_motion
data_root_dir = data
modality = raw2flow
method = SelfComplete

[train_parameters]
mode=train

[test_parameters]
mode=test

[UCSDped2]
patch_size=32
h_block=1
w_block=1
train_bbox_saved = True
train_foreground_saved = False
test_bbox_saved = True
test_foreground_saved = False
scores_saved = False
train_block_mode = 1
test_block_mode = 1
motionThr = 0

[SelfComplete]
border_mode = predict
epochs = 10
batch_size = 128
nf = 32
useFlow = True
context_frame_num = 4
context_of_num = 0
rawRange = 10
padding = False
lambda_raw = 1.0
lambda_of = 1.0
w_raw =1
w_of =1
"""
    p = tmp_path / "config.cfg"
    p.write_text(cfg_text)
    cfg = load_ini_config(str(p))
    assert cfg.dataset_name == "UCSDped2"
    assert cfg.model.tot_raw_num == 5
    assert cfg.model.tot_of_num == 1
    assert cfg.model.resolved_raw_range is None  # rawRange=10 >= 5 -> all
    assert cfg.model.raw_of_offset == 4
    assert cfg.fore.patch_size == 32
    assert cfg.dataset.frame_hw == (240, 360)
