"""Elastic border mode: streamed chunk extraction must match whole-stack
per-frame extraction even when windows slide across uneven video
boundaries (regression for the chunk-span underflow found in review)."""

import numpy as np

from vec_vad_tpu.config import (
    CompletionConfig,
    DatasetSpec,
    ForegroundConfig,
    PipelineConfig,
)
from vec_vad_tpu.data.video_index import VideoIndex
from vec_vad_tpu.ops.stc import extract_stc
from vec_vad_tpu.pipeline import extract_cube_set

SPEC = DatasetSpec(
    name="s", frame_h=32, frame_w=48, file_ext=".tif", scene_num=1,
    ap_score_thr=0.5, ap_min_area=16.0, cover_thr=0.6,
    mt_area_thr=16.0, mt_binary_thr=18.0, mt_extend=2, mt_gauss_mask_size=3,
)


def test_elastic_streaming_matches_whole_stack(rng):
    lengths = [41, 14, 45]  # uneven videos force window slides near bounds
    n = sum(lengths)
    frames = rng.integers(0, 256, (n, 32, 48, 3), dtype=np.uint8)
    boxes = [np.array([[4.0, 4.0, 20.0, 20.0]], np.float32)] * n
    idx = VideoIndex(["a", "b", "c"], np.array(lengths))
    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=16, max_boxes_per_frame=8),
        model=CompletionConfig(
            nf=4, context_of_num=0, use_flow=False,
            border_mode="elastic", context_frame_num=4,
        ),
    )
    cubes = extract_cube_set(cfg, SPEC, idx, frames, boxes, chunk=16)
    win = idx.context_indices(4, "elastic")
    for i in range(n):
        ref = np.asarray(extract_stc(frames[win[i]], boxes[i], 16, quantize=True))[0]
        ref_in = np.transpose(ref, (1, 2, 0, 3)).reshape(16, 16, -1)
        np.testing.assert_array_equal(
            cubes.raw[i].astype(np.float32), ref_in, err_msg=f"frame {i}"
        )
