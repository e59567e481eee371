"""Device-resident training-side extraction (pipeline.extract_cube_set_resident)
vs the chunked host path — same cubes, same metadata, and the trainer must
consume the HBM-resident CubeSet with identical results (the design that
removes the GB-scale cube round trip from training)."""

import numpy as np
import pytest

import jax

from vec_vad_tpu.config import (
    CompletionConfig,
    DatasetSpec,
    ForegroundConfig,
    PipelineConfig,
    register_dataset,
)
from vec_vad_tpu.data.synthetic import make_synthetic_dataset
from vec_vad_tpu.data.video_index import VideoIndex
from vec_vad_tpu.pipeline import (
    extract_cube_set,
    extract_cube_set_resident,
    make_trainer,
    train_model,
)


@pytest.fixture(scope="module")
def world():
    ds = make_synthetic_dataset(
        frames_per_video=20, n_train_videos=2, n_test_videos=1,
        frame_h=48, frame_w=64, seed=2,
    )
    spec = DatasetSpec(
        name="synthResExt", frame_h=48, frame_w=64, file_ext=".tif",
        scene_num=1, ap_score_thr=0.5, ap_min_area=16.0, cover_thr=0.6,
        mt_area_thr=16.0, mt_binary_thr=18.0, mt_extend=2,
        mt_gauss_mask_size=3,
    )
    register_dataset(spec)
    idx = VideoIndex(["a", "b"], ds.train_video_lengths)
    return ds, spec, idx


def _pseudo_flow(frames):
    d = frames[1:].astype(np.float32) - frames[:-1].astype(np.float32)
    flow = np.zeros(frames.shape[:3] + (2,), np.float32)
    flow[1:, ..., 0] = d.mean(-1) / 8.0
    flow[1:, ..., 1] = -d.mean(-1) / 16.0
    return flow


def test_resident_matches_host_extraction_raw(world):
    ds, spec, idx = world
    cfg = PipelineConfig(
        dataset_name="synthResExt",
        fore=ForegroundConfig(patch_size=16, max_boxes_per_frame=8),
        model=CompletionConfig(nf=4, context_of_num=0, use_flow=False),
    )
    host = extract_cube_set(cfg, spec, idx, ds.train_frames, ds.train_boxes)
    res = extract_cube_set_resident(
        cfg, spec, idx, ds.train_frames, ds.train_boxes
    )
    assert isinstance(res.raw, jax.Array)  # cubes never left the device
    np.testing.assert_array_equal(np.asarray(res.raw), host.raw)
    np.testing.assert_array_equal(res.frame_ids, host.frame_ids)
    np.testing.assert_allclose(res.boxes, host.boxes)
    np.testing.assert_array_equal(res.cells, host.cells)
    np.testing.assert_array_equal(res.scenes, host.scenes)


def test_resident_matches_host_extraction_flow_and_motion_filter(world):
    ds, spec, idx = world
    flow = _pseudo_flow(ds.train_frames)
    cfg = PipelineConfig(
        dataset_name="synthResExt",
        fore=ForegroundConfig(
            patch_size=16, max_boxes_per_frame=8, motion_thr=5.0,
        ),
        model=CompletionConfig(nf=4, context_of_num=0, use_flow=True),
    )
    host = extract_cube_set(
        cfg, spec, idx, ds.train_frames, ds.train_boxes, flow_frames=flow
    )
    res = extract_cube_set_resident(
        cfg, spec, idx, ds.train_frames, ds.train_boxes, flow_frames=flow
    )
    assert host.size == res.size > 0
    np.testing.assert_array_equal(np.asarray(res.raw), host.raw)
    np.testing.assert_allclose(
        np.asarray(res.flow), host.flow, rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(res.frame_ids, host.frame_ids)


def test_trainer_consumes_resident_cubeset(world):
    """fit_block/train_model over a device-resident CubeSet == the host
    CubeSet (identical bytes in, identical training out)."""
    ds, spec, idx = world
    cfg = PipelineConfig(
        dataset_name="synthResExt",
        fore=ForegroundConfig(patch_size=16, max_boxes_per_frame=8),
        model=CompletionConfig(
            nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=False,
        ),
    )
    host = extract_cube_set(cfg, spec, idx, ds.train_frames, ds.train_boxes)
    res = extract_cube_set_resident(
        cfg, spec, idx, ds.train_frames, ds.train_boxes
    )
    trainer = make_trainer(cfg)
    m_host = train_model(cfg, host, trainer=trainer, seed=0)
    m_res = train_model(cfg, res, trainer=trainer, seed=0)
    assert set(m_host.blocks) == set(m_res.blocks)
    for key in m_host.blocks:
        np.testing.assert_allclose(
            m_host.blocks[key].raw_scores,
            m_res.blocks[key].raw_scores,
            rtol=1e-6,
        )
