"""Online serving (serve.StreamingScorer) must reproduce the offline
resident path's frame scores exactly: the reference recipe is causal
(border_mode='predict', train.py:116-121), so streaming one frame at a
time through a device ring buffer is score-equivalent to scoring the
materialized split."""

import numpy as np
import pytest

from vec_vad_tpu.config import (
    CompletionConfig,
    DatasetSpec,
    ForegroundConfig,
    PipelineConfig,
)
from vec_vad_tpu.data.synthetic import make_synthetic_dataset
from vec_vad_tpu.data.video_index import VideoIndex
from vec_vad_tpu.infer import infer_frame_scores_resident
from vec_vad_tpu.ops.stc import pad_boxes
from vec_vad_tpu.pipeline import extract_cube_set, make_trainer, train_model
from vec_vad_tpu.serve import StreamingScorer

SPEC = DatasetSpec(
    name="s", frame_h=48, frame_w=64, file_ext=".tif", scene_num=1,
    ap_score_thr=0.5, ap_min_area=16.0, cover_thr=0.6,
    mt_area_thr=16.0, mt_binary_thr=18.0, mt_extend=2, mt_gauss_mask_size=3,
)


def _pseudo_flow(frames: np.ndarray) -> np.ndarray:
    d = np.diff(
        frames.astype(np.float32).mean(-1), axis=0, append=frames[-1:].mean(-1)
    )
    return np.stack([d, -d], axis=-1) / 25.0


def _train_tiny(use_flow: bool, seed: int):
    ds = make_synthetic_dataset(
        frames_per_video=14, n_train_videos=1, n_test_videos=2,
        frame_h=48, frame_w=64, seed=seed,
    )
    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=16, max_boxes_per_frame=8),
        model=CompletionConfig(
            nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=use_flow
        ),
    )
    tr_idx = VideoIndex(["v"], ds.train_video_lengths)
    tr_flow = _pseudo_flow(ds.train_frames) if use_flow else None
    cubes = extract_cube_set(
        cfg, SPEC, tr_idx, ds.train_frames, ds.train_boxes, flow_frames=tr_flow
    )
    model = train_model(cfg, cubes, trainer=make_trainer(cfg))
    return ds, cfg, model


def _offline_scores(ds, cfg, model, te_idx, te_flow=None):
    blk = model.blocks[(0, 0, 0)]
    boxes_pad, valid = pad_boxes(ds.test_boxes, cfg.fore.max_boxes_per_frame)
    windows = te_idx.context_indices(
        cfg.model.context_frame_num, cfg.model.border_mode
    )
    mu_r, sd_r = blk.raw_stats
    if blk.of_stats is not None:
        mu_o, sd_o = blk.of_stats
    else:
        mu_o, sd_o = 0.0, 1.0
    kwargs = {}
    if te_flow is not None:
        ow = te_idx.context_indices(
            cfg.model.context_of_num, cfg.model.border_mode
        )
        kwargs = dict(flow=te_flow, of_windows=ow if ow.ndim > 1 else ow[:, None])
    return infer_frame_scores_resident(
        cfg,
        {"params": blk.params, "batch_stats": blk.batch_stats},
        (mu_r, sd_r, mu_o, sd_o),
        ds.test_frames,
        windows,
        boxes_pad,
        valid,
        chunk=8,
        cube_batch=16,
        **kwargs,
    )


def _stream_scores(ds, cfg, model, te_idx, te_flow=None):
    scorer = StreamingScorer.from_model(model)
    out = []
    i = 0
    for ln in te_idx.video_lengths:
        scorer.start_video()
        for _ in range(int(ln)):
            flow = te_flow[i] if te_flow is not None else None
            out.append(scorer.push(ds.test_frames[i], ds.test_boxes[i], flow=flow))
            i += 1
    return np.asarray(out, np.float32)


def test_streaming_matches_offline_raw():
    ds, cfg, model = _train_tiny(use_flow=False, seed=12)
    te_idx = VideoIndex(["a", "b"], ds.test_video_lengths)
    offline = _offline_scores(ds, cfg, model, te_idx)
    streamed = _stream_scores(ds, cfg, model, te_idx)
    np.testing.assert_allclose(streamed, offline, rtol=2e-4, atol=2e-4)


def test_streaming_matches_offline_flow():
    ds, cfg, model = _train_tiny(use_flow=True, seed=13)
    te_idx = VideoIndex(["a", "b"], ds.test_video_lengths)
    te_flow = _pseudo_flow(ds.test_frames)
    offline = _offline_scores(ds, cfg, model, te_idx, te_flow)
    streamed = _stream_scores(ds, cfg, model, te_idx, te_flow)
    np.testing.assert_allclose(streamed, offline, rtol=2e-4, atol=2e-4)


def test_streaming_flow_model_without_flow_matches_offline():
    """flow=None on a flow-fusing model degrades exactly like the offline
    pipeline run without a flow tree (pipeline.extract_cube_set with
    flow_frames=None): zero flow cubes, motion filter bypassed — the serve
    CLI hits this when no optical_flow/ dir exists in the workspace."""
    from vec_vad_tpu.pipeline import frame_level_scores, score_cubes

    ds = make_synthetic_dataset(
        frames_per_video=14, n_train_videos=1, n_test_videos=2,
        frame_h=48, frame_w=64, seed=18,
    )
    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=16, max_boxes_per_frame=8),
        model=CompletionConfig(
            nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=True
        ),
    )
    tr_idx = VideoIndex(["v"], ds.train_video_lengths)
    cubes = extract_cube_set(
        cfg, SPEC, tr_idx, ds.train_frames, ds.train_boxes, flow_frames=None
    )
    trainer = make_trainer(cfg)
    model = train_model(cfg, cubes, trainer=trainer)

    te_idx = VideoIndex(["a", "b"], ds.test_video_lengths)
    tc = extract_cube_set(
        cfg, SPEC, te_idx, ds.test_frames, ds.test_boxes, flow_frames=None,
        block_mode=cfg.fore.test_block_mode,
    )
    offline = frame_level_scores(
        score_cubes(model, tc, trainer=trainer), tc, te_idx.total_frames
    )

    streamed = _stream_scores(ds, cfg, model, te_idx)  # flow=None pushes
    np.testing.assert_allclose(streamed, offline, rtol=2e-4, atol=2e-4)

    # push_many degrades identically
    scorer = StreamingScorer.from_model(model)
    scorer.start_video()
    n0 = int(ds.test_video_lengths[0])
    many = scorer.push_many(
        ds.test_frames[:n0], [ds.test_boxes[i] for i in range(n0)]
    )
    np.testing.assert_allclose(
        np.asarray(many, np.float32), offline[:n0], rtol=2e-4, atol=2e-4
    )


def test_multicamera_matches_single():
    """MultiCameraScorer's one-call-per-tick fleet step must score each
    camera exactly like an independent StreamingScorer driven with the
    same stream — including staggered per-camera video boundaries."""
    from vec_vad_tpu.serve import MultiCameraScorer

    ds, cfg, model = _train_tiny(use_flow=True, seed=21)
    frames = ds.test_frames
    flow = _pseudo_flow(frames)
    n = frames.shape[0]
    C = 3

    # three independent per-camera streams over one tick axis:
    #   cam 0: the split in order, new video at the real boundary
    #   cam 1: the split reversed, one long video
    #   cam 2: in order, video boundary at tick 5 (staggered vs cam 0)
    l0 = int(ds.test_video_lengths[0])
    cam_frames = [frames, frames[::-1], frames]
    cam_boxes = [ds.test_boxes, list(ds.test_boxes)[::-1], ds.test_boxes]
    cam_flow = [flow, flow[::-1], flow]
    cam_bounds = [{0, l0}, {0}, {0, 5}]

    want = []
    for c in range(C):
        sc = StreamingScorer.from_model(model)
        outs = []
        for t in range(n):
            if t in cam_bounds[c]:
                sc.start_video()
            outs.append(
                sc.push(cam_frames[c][t], cam_boxes[c][t], flow=cam_flow[c][t])
            )
        want.append(outs)
    want = np.asarray(want, np.float32)  # (C, n)

    mc = MultiCameraScorer.from_model(model, n_cameras=C)
    got = np.zeros((C, n), np.float32)
    for t in range(n):
        for c in range(C):
            if t in cam_bounds[c]:
                mc.start_video(camera=c)
        got[:, t] = mc.push_tick(
            np.stack([cam_frames[c][t] for c in range(C)]),
            [cam_boxes[c][t] for c in range(C)],
            flows=np.stack([cam_flow[c][t] for c in range(C)]),
        )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # single-stream entry points are disabled on the fleet scorer
    with pytest.raises(NotImplementedError):
        mc.push(frames[0], ds.test_boxes[0])

    # pipelined ticks: identical scores, emitted one tick late
    T = 6
    mcp = MultiCameraScorer.from_model(model, n_cameras=C, pipeline_depth=1)
    mcp.start_video()  # all cameras, one video
    outs = []
    for t in range(T):
        r = mcp.push_tick(
            np.stack([frames[t]] * C), [ds.test_boxes[t]] * C,
            flows=np.stack([flow[t]] * C),
        )
        outs.append(r)
    assert outs[0] is None
    tail = mcp.drain()
    assert len(tail) == 1
    emitted = np.asarray(outs[1:] + tail, np.float32)  # (T, C)
    for c in range(C):
        np.testing.assert_allclose(
            emitted[:, c], want[0, :T], rtol=2e-4, atol=2e-4
        )


def test_streaming_edge_cases():
    ds, cfg, model = _train_tiny(use_flow=False, seed=14)
    scorer = StreamingScorer.from_model(model)
    scorer.start_video()
    # frame with no boxes -> -big_number (test.py:350-357: untouched mask)
    s = scorer.push(ds.test_frames[0], np.zeros((0, 4), np.float32))
    assert s == -scorer.big_number
    # degenerate boxes only -> -big_number
    s = scorer.push(
        ds.test_frames[1], np.array([[5.0, 5.0, 5.0, 9.0]], np.float32)
    )
    assert s == -scorer.big_number
    # too many boxes -> error
    with pytest.raises(ValueError):
        scorer.push(ds.test_frames[2], np.zeros((9, 4), np.float32))
    # non-causal border mode refused
    import dataclasses

    cfg_bad = cfg.replace(
        model=dataclasses.replace(cfg.model, border_mode="elastic")
    )
    blk = model.blocks[(0, 0, 0)]
    with pytest.raises(ValueError):
        StreamingScorer(
            cfg_bad,
            {"params": blk.params, "batch_stats": blk.batch_stats},
            (0.0, 1.0, 0.0, 1.0),
        )


def test_streaming_pipelined_matches_sync():
    """pipeline_depth=d shifts WHEN scores emerge, never WHAT they are:
    push returns frame t-d's score (None while filling), drain() flushes
    the tail — the sequence equals the depth-0 scores exactly."""
    ds, cfg, model = _train_tiny(use_flow=False, seed=15)
    te_idx = VideoIndex(["a", "b"], ds.test_video_lengths)
    sync = _stream_scores(ds, cfg, model, te_idx)

    scorer = StreamingScorer.from_model(model, pipeline_depth=2)
    out = []
    i = 0
    for ln in te_idx.video_lengths:
        scorer.start_video()
        for _ in range(int(ln)):
            s = scorer.push(ds.test_frames[i], ds.test_boxes[i])
            if s is not None:
                out.append(s)
            i += 1
    out.extend(scorer.drain())
    np.testing.assert_allclose(np.asarray(out, np.float32), sync, rtol=1e-6)


def test_streaming_push_many_matches_push():
    """Micro-batched push_many (k frames per device call) must produce
    the exact per-frame push() scores, across video boundaries handled by
    start_video between batches."""
    ds, cfg, model = _train_tiny(use_flow=True, seed=17)
    te_idx = VideoIndex(["a", "b"], ds.test_video_lengths)
    te_flow = _pseudo_flow(ds.test_frames)
    sync = _stream_scores(ds, cfg, model, te_idx, te_flow)

    scorer = StreamingScorer.from_model(model)
    out, i = [], 0
    for ln in te_idx.video_lengths:
        scorer.start_video()
        lo = i
        while i < lo + int(ln):
            k = min(4, lo + int(ln) - i)
            out.extend(
                scorer.push_many(
                    ds.test_frames[i : i + k],
                    [ds.test_boxes[j] for j in range(i, i + k)],
                    flows=te_flow[i : i + k],
                )
            )
            i += k
    np.testing.assert_allclose(
        np.asarray(out, np.float32), sync, rtol=2e-4, atol=2e-4
    )


def test_streaming_gray_matches_rgb():
    """gray_stream uploads one channel; scores are bit-identical when the
    source is channel-replicated (cv2's gray->BGR read of .tif frames)."""
    ds, cfg, model = _train_tiny(use_flow=False, seed=16)
    te_idx = VideoIndex(["a", "b"], ds.test_video_lengths)
    gray = ds.test_frames[..., :1]
    frames3 = np.repeat(gray, 3, axis=-1)

    def run(scorer, frames):
        out, i = [], 0
        for ln in te_idx.video_lengths:
            scorer.start_video()
            for _ in range(int(ln)):
                out.append(scorer.push(frames[i], ds.test_boxes[i]))
                i += 1
        return np.asarray(out, np.float32)

    rgb_scores = run(StreamingScorer.from_model(model), frames3)
    gray_scores = run(
        StreamingScorer.from_model(model, gray_stream=True), gray[..., 0]
    )
    np.testing.assert_array_equal(gray_scores, rgb_scores)


def test_streaming_grid_matches_offline():
    """Multi-block (2x2 grid) streaming: per-box host routing to the
    stacked block models must reproduce the offline CubeSet path,
    including big_number for boxes landing in untrained cells."""
    from vec_vad_tpu.pipeline import frame_level_scores, score_cubes

    ds = make_synthetic_dataset(
        frames_per_video=16, n_train_videos=1, n_test_videos=1,
        frame_h=48, frame_w=64, seed=21,
    )
    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(
            patch_size=16, max_boxes_per_frame=8, h_block=2, w_block=2
        ),
        model=CompletionConfig(
            nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=False
        ),
    )
    tr_idx = VideoIndex(["v"], ds.train_video_lengths)
    cubes = extract_cube_set(cfg, SPEC, tr_idx, ds.train_frames, ds.train_boxes)
    trainer = make_trainer(cfg)
    model = train_model(cfg, cubes, trainer=trainer)
    assert len(model.blocks) >= 2  # a real grid

    te_idx = VideoIndex(["v"], ds.test_video_lengths)
    tc = extract_cube_set(
        cfg, SPEC, te_idx, ds.test_frames, ds.test_boxes,
        block_mode=cfg.fore.test_block_mode,
    )
    offline = frame_level_scores(
        score_cubes(model, tc, trainer=trainer), tc, te_idx.total_frames
    )

    # extraction used the custom 48x64 SPEC, so grid routing must too
    # (the default route_hw is the config table's geometry)
    scorer = StreamingScorer.from_model(
        model, route_hw=(SPEC.frame_h, SPEC.frame_w)
    )
    streamed = []
    i = 0
    for ln in te_idx.video_lengths:
        scorer.start_video()
        for _ in range(int(ln)):
            streamed.append(scorer.push(ds.test_frames[i], ds.test_boxes[i]))
            i += 1
    np.testing.assert_allclose(
        np.asarray(streamed), offline, rtol=2e-4, atol=2e-4
    )


def test_packed_weights_bit_identical():
    """pack_weights=True marshals the block weights + stats as ONE flat
    buffer (one relay argument handle instead of ~100 pytree leaves —
    leaf count sits directly on the per-frame dispatch floor of the
    remote backend); the step computes the same ops on the same values,
    so scores must match the pytree-argument path bit-for-bit."""
    ds, cfg, model = _train_tiny(use_flow=True, seed=21)
    te_idx = VideoIndex(["a", "b"], ds.test_video_lengths)
    te_flow = _pseudo_flow(ds.test_frames)

    def run(pack):
        scorer = StreamingScorer.from_model(model, pack_weights=pack)
        assert (len(scorer._weight_args) == 1) == pack
        out, i = [], 0
        for ln in te_idx.video_lengths:
            scorer.start_video()
            for _ in range(int(ln)):
                out.append(
                    scorer.push(
                        ds.test_frames[i], ds.test_boxes[i], flow=te_flow[i]
                    )
                )
                i += 1
        return np.asarray(out, np.float32)

    np.testing.assert_array_equal(run(True), run(False))


def test_multicamera_mesh_matches_single_device():
    """Fleet sharding over the device mesh (cameras split across devices,
    weights replicated, zero collectives) must score every camera exactly
    like the unsharded tick — the per-device program IS the single-device
    camera scan over its local cameras."""
    import jax

    from vec_vad_tpu.parallel.mesh import get_mesh
    from vec_vad_tpu.serve import MultiCameraScorer

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    ds, cfg, model = _train_tiny(use_flow=False, seed=30)
    C = 8
    base = MultiCameraScorer.from_model(model, n_cameras=C)
    sharded = MultiCameraScorer.from_model(model, n_cameras=C, mesh=get_mesh())
    assert sharded._n_shards == len(jax.devices())
    base.start_video()
    sharded.start_video()
    nt = len(ds.test_frames)
    for t in range(4):
        fr = np.stack(
            [ds.test_frames[(t + 2 * c) % nt] for c in range(C)]
        )
        boxes = [ds.test_boxes[(t + 2 * c) % nt] for c in range(C)]
        a = base.push_tick(fr, boxes)
        b = sharded.push_tick(fr, boxes)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    # camera count must divide the mesh
    with pytest.raises(ValueError):
        MultiCameraScorer.from_model(model, n_cameras=3, mesh=get_mesh())


def _motion_frames(lengths, h=48, w=64, seed=0):
    """Smooth frames with one moving block per video — real motion
    structure so the reference's motion detector finds clean contours
    (pure noise would light the whole map)."""
    r = np.random.default_rng(seed)
    vids = []
    for vi, n in enumerate(lengths):
        base = (
            100
            + 40 * np.sin(np.arange(w, dtype=np.float32) / 11.0 + vi)[None, :]
            + 20 * np.cos(np.arange(h, dtype=np.float32) / 7.0)[:, None]
        )
        frames = np.repeat(base[None, ..., None], n, axis=0)
        frames = np.repeat(frames, 3, axis=-1)
        y0 = int(r.integers(4, h - 16))
        for t in range(n):
            x0 = (3 + 3 * t) % (w - 14)
            frames[t, y0 : y0 + 12, x0 : x0 + 10] += 90.0
        vids.append(np.clip(frames, 0, 255).astype(np.uint8))
    return np.concatenate(vids, axis=0)


def _offline_scores_with_boxes(cfg, model, frames, boxes, te_idx,
                               te_flow=None):
    blk = model.blocks[(0, 0, 0)]
    boxes_pad, valid = pad_boxes(boxes, cfg.fore.max_boxes_per_frame)
    windows = te_idx.context_indices(
        cfg.model.context_frame_num, cfg.model.border_mode
    )
    mu_r, sd_r = blk.raw_stats
    mu_o, sd_o = blk.of_stats if blk.of_stats is not None else (0.0, 1.0)
    kwargs = {}
    if te_flow is not None:
        ow = te_idx.context_indices(
            cfg.model.context_of_num, cfg.model.border_mode
        )
        kwargs = dict(
            flow=te_flow, of_windows=ow if ow.ndim > 1 else ow[:, None]
        )
    return infer_frame_scores_resident(
        cfg,
        {"params": blk.params, "batch_stats": blk.batch_stats},
        (mu_r, sd_r, mu_o, sd_o),
        frames,
        windows,
        boxes_pad,
        valid,
        chunk=8,
        cube_batch=16,
        **kwargs,
    )


def test_motion_streaming_matches_offline():
    """MotionStreamingScorer (boxes computed IN the loop from the frame
    stream) reproduces the offline pipeline run with motion-mode
    foreground boxes (fore.detector.compute_foreground_bboxes) exactly —
    same maps, same contours, same scores. Includes 2-frame and 1-frame
    videos to pin the head/tail window clamps."""
    from dataclasses import replace

    from vec_vad_tpu.fore.detector import compute_foreground_bboxes
    from vec_vad_tpu.serve import MotionStreamingScorer

    ds, cfg, model = _train_tiny(use_flow=False, seed=21)
    # no 1-frame video: the offline hard-border stage rejects those
    # (reference-exact VideoTooShortError) — streaming handles them
    # gracefully instead (separate test below)
    lengths = [12, 9, 2]
    frames = _motion_frames(lengths, seed=3)
    te_idx = VideoIndex(
        [f"v{i}" for i in range(len(lengths))], np.asarray(lengths)
    )

    cfg_m = replace(
        cfg, fore=replace(cfg.fore, extraction_mode="obj_det_with_motion")
    )
    empty_det = lambda img: (np.zeros((0, 4)), np.zeros(0))  # noqa: E731
    offline_boxes = compute_foreground_bboxes(
        cfg_m, SPEC, te_idx, frames=frames, detector=empty_det, chunk=5
    )
    assert sum(b.shape[0] for b in offline_boxes) > 0, "no motion found"
    offline = _offline_scores_with_boxes(
        cfg_m, model, frames, offline_boxes, te_idx
    )

    scorer = MotionStreamingScorer.from_model(model, spec=SPEC)
    streamed = []
    i = 0
    for ln in lengths:
        scorer.start_video()
        vid = []
        for _ in range(ln):
            s = scorer.push(frames[i])
            if s is not None:
                vid.append(s)
            i += 1
        vid += scorer.end_video()
        assert len(vid) == ln
        streamed += vid
    np.testing.assert_allclose(
        np.asarray(streamed, np.float32), offline, rtol=2e-4, atol=2e-4
    )

    # gray_stream composes: these frames are channel-replicated, so the
    # 1-channel upload must reproduce the same maps, boxes, and scores
    scorer = MotionStreamingScorer.from_model(model, spec=SPEC,
                                              gray_stream=True)
    streamed_g = []
    i = 0
    for ln in lengths:
        scorer.start_video()
        vid = []
        for _ in range(ln):
            s = scorer.push(frames[i, ..., 0])
            if s is not None:
                vid.append(s)
            i += 1
        streamed_g += vid + scorer.end_video()
    np.testing.assert_allclose(
        np.asarray(streamed_g, np.float32),
        np.asarray(streamed, np.float32), rtol=1e-6, atol=1e-6,
    )


def test_motion_streaming_two_stream_flow():
    """Motion-in-the-loop composes with the two-stream model + streamed
    flow maps (the hardware CLI config: serve --motion on a useFlow
    workspace): scores match the offline motion-mode two-stream path,
    including the motion-magnitude cube filter."""
    from dataclasses import replace

    from vec_vad_tpu.fore.detector import compute_foreground_bboxes
    from vec_vad_tpu.serve import MotionStreamingScorer

    ds, cfg, model = _train_tiny(use_flow=True, seed=24)
    lengths = [12, 8]
    frames = _motion_frames(lengths, seed=9)
    te_flow = _pseudo_flow(frames)
    te_idx = VideoIndex(["a", "b"], np.asarray(lengths))

    cfg_m = replace(
        cfg,
        fore=replace(
            cfg.fore, extraction_mode="obj_det_with_motion", motion_thr=0.1
        ),
    )
    empty_det = lambda img: (np.zeros((0, 4)), np.zeros(0))  # noqa: E731
    offline_boxes = compute_foreground_bboxes(
        cfg_m, SPEC, te_idx, frames=frames, detector=empty_det, chunk=5
    )
    assert sum(b.shape[0] for b in offline_boxes) > 0
    offline = _offline_scores_with_boxes(
        cfg_m, model, frames, offline_boxes, te_idx, te_flow
    )

    scorer = MotionStreamingScorer.from_model(model, spec=SPEC)
    scorer.cfg = cfg_m  # motion_thr for the mag filter, as the CLI loads
    streamed = []
    i = 0
    for ln in lengths:
        scorer.start_video()
        vid = []
        for _ in range(ln):
            s = scorer.push(frames[i], flow=te_flow[i])
            if s is not None:
                vid.append(s)
            i += 1
        vid += scorer.end_video()
        assert len(vid) == ln
        streamed += vid
    np.testing.assert_allclose(
        np.asarray(streamed, np.float32), offline, rtol=2e-4, atol=2e-4
    )


def test_motion_streaming_one_frame_video():
    """A 1-frame video (the offline hard-border stage errors on these)
    degrades gracefully online: its motion window is [0, 0, 0], the map
    is empty, no boxes -> the frame scores -big_number."""
    from vec_vad_tpu.serve import MotionStreamingScorer

    ds, cfg, model = _train_tiny(use_flow=False, seed=23)
    frames = _motion_frames([1], seed=7)
    scorer = MotionStreamingScorer.from_model(model, spec=SPEC)
    scorer.start_video()
    assert scorer.push(frames[0]) is None
    out = scorer.end_video()
    assert out == [-scorer.big_number]


def test_motion_flow_streaming_self_contained():
    """MotionFlowStreamingScorer: `push(frame)` is the ENTIRE input —
    boxes from the in-loop motion recipe AND flow from the in-loop
    FlowNet — and the scores match the offline two-stream pipeline run
    with motion-mode boxes + driver-computed flow (same net, same
    protocol), including the reference's flow-pair rule at heads/tails
    and the 2-frame-video degenerate pair, plus the motion-magnitude
    cube filter."""
    from dataclasses import replace

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from vec_vad_tpu.flow.driver import compute_optical_flow
    from vec_vad_tpu.fore.detector import compute_foreground_bboxes
    from vec_vad_tpu.serve import MotionFlowStreamingScorer

    class TinyFlow(nn.Module):
        @nn.compact
        def __call__(self, pair, train: bool = False):
            x = jnp.concatenate([pair[:, 0], pair[:, 1]], axis=-1) / 255.0
            x = nn.relu(nn.Conv(8, (3, 3))(x))
            return nn.Conv(2, (3, 3))(x)

    fhw = (24, 32)
    fnet = TinyFlow()
    fvars = fnet.init(
        jax.random.key(7), jnp.zeros((1, 2) + fhw + (3,), jnp.float32)
    )

    ds, cfg, model = _train_tiny(use_flow=True, seed=27)
    # 3-frame tail (not 2): a 2-frame video's flow pair is position-
    # dependent offline (the reference's global-head pad quirk) —
    # serving uses standalone-video semantics, tested separately below
    lengths = [12, 9, 3]
    frames = _motion_frames(lengths, seed=11)
    te_idx = VideoIndex(
        [f"v{i}" for i in range(len(lengths))], np.asarray(lengths)
    )
    te_flow = compute_optical_flow(fnet, fvars, te_idx, frames, model_hw=fhw)

    cfg_m = replace(
        cfg,
        fore=replace(
            cfg.fore, extraction_mode="obj_det_with_motion", motion_thr=0.05
        ),
    )
    empty_det = lambda img: (np.zeros((0, 4)), np.zeros(0))  # noqa: E731
    offline_boxes = compute_foreground_bboxes(
        cfg_m, SPEC, te_idx, frames=frames, detector=empty_det, chunk=5
    )
    assert sum(b.shape[0] for b in offline_boxes) > 0, "no motion found"
    offline = _offline_scores_with_boxes(
        cfg_m, model, frames, offline_boxes, te_idx, te_flow
    )

    scorer = MotionFlowStreamingScorer.from_model(
        model, spec=SPEC, flow_net=fnet, flow_variables=fvars,
        flow_model_hw=fhw,
    )
    scorer.cfg = cfg_m  # motion_thr for the mag filter, as the CLI loads
    streamed = []
    i = 0
    for ln in lengths:
        scorer.start_video()
        vid = []
        for _ in range(ln):
            s = scorer.push(frames[i])  # frames ONLY — nothing else
            if s is not None:
                vid.append(s)
            i += 1
        vid += scorer.end_video()
        assert len(vid) == ln
        streamed += vid
    streamed = np.asarray(streamed, np.float32)
    # the test is vacuous if every frame degenerates to -big_number
    assert (streamed > -scorer.big_number).sum() >= len(streamed) // 2
    np.testing.assert_allclose(streamed, offline, rtol=2e-4, atol=2e-4)

    # standalone 2-frame video: BOTH frames' flow pairs degenerate to
    # (f0, f0) — the own-split semantics the serving stack uses
    # (FlowStreamingScorer's convention; see _flow_pair's docstring)
    frames2 = _motion_frames([2], seed=13)
    te_idx2 = VideoIndex(["a"], np.asarray([2]))
    te_flow2 = compute_optical_flow(
        fnet, fvars, te_idx2, frames2, model_hw=fhw
    )
    boxes2 = compute_foreground_bboxes(
        cfg_m, SPEC, te_idx2, frames=frames2, detector=empty_det, chunk=5
    )
    offline2 = _offline_scores_with_boxes(
        cfg_m, model, frames2, boxes2, te_idx2, te_flow2
    )
    sc2 = MotionFlowStreamingScorer.from_model(
        model, spec=SPEC, flow_net=fnet, flow_variables=fvars,
        flow_model_hw=fhw,
    )
    sc2.cfg = cfg_m
    sc2.start_video()
    vid2 = [s for s in (sc2.push(frames2[0]), sc2.push(frames2[1]))
            if s is not None]
    vid2 += sc2.end_video()
    np.testing.assert_allclose(
        np.asarray(vid2, np.float32), offline2, rtol=2e-4, atol=2e-4
    )

    # the flow= argument is the streamed-flow scorer's job
    with pytest.raises(ValueError, match="computes flow in the loop"):
        scorer2 = MotionFlowStreamingScorer.from_model(
            model, spec=SPEC, flow_net=fnet, flow_variables=fvars,
            flow_model_hw=fhw,
        )
        scorer2.start_video()
        scorer2.push(frames[0], flow=te_flow[0])

    # raw-only models are MotionStreamingScorer territory
    ds_r, cfg_r, model_r = _train_tiny(use_flow=False, seed=28)
    with pytest.raises(ValueError, match="two-stream"):
        MotionFlowStreamingScorer.from_model(
            model_r, spec=SPEC, flow_net=fnet, flow_variables=fvars,
            flow_model_hw=fhw,
        )


def test_motion_streaming_ap_merge():
    """Caller-supplied appearance boxes merge exactly like the offline
    obj_det_with_motion stage: they mask the motion map and concatenate
    ahead of the motion boxes."""
    from dataclasses import replace

    from vec_vad_tpu.fore.detector import compute_foreground_bboxes
    from vec_vad_tpu.serve import MotionStreamingScorer

    ds, cfg, model = _train_tiny(use_flow=False, seed=22)
    lengths = [10]
    frames = _motion_frames(lengths, seed=5)
    te_idx = VideoIndex(["v"], np.asarray(lengths))
    ap = np.array([[8.0, 8.0, 24.0, 24.0]], np.float32)

    cfg_m = replace(
        cfg, fore=replace(cfg.fore, extraction_mode="obj_det_with_motion")
    )
    fixed_det = lambda img: (ap.copy(), np.ones(1))  # noqa: E731
    offline_boxes = compute_foreground_bboxes(
        cfg_m, SPEC, te_idx, frames=frames, detector=fixed_det, chunk=4
    )
    offline = _offline_scores_with_boxes(
        cfg_m, model, frames, offline_boxes, te_idx
    )

    # the offline appearance stage filters + suppresses before the merge;
    # with one box those are identity, so pushing `ap` directly matches
    scorer = MotionStreamingScorer.from_model(model, spec=SPEC)
    scorer.start_video()
    streamed = []
    for i in range(lengths[0]):
        s = scorer.push(frames[i], ap_boxes=ap)
        if s is not None:
            streamed.append(s)
    streamed += scorer.end_video()
    np.testing.assert_allclose(
        np.asarray(streamed, np.float32), offline, rtol=2e-4, atol=2e-4
    )


def test_time_device_step_probes():
    """The serving device-time twins (bench's link-weather separators,
    VERDICT r4 item 1c) run, return positive ms, and leave the scorer
    functional after a start_video() reset — for the plain streaming
    step, the fleet tick, and the live-flow fused step."""
    from vec_vad_tpu.serve import FlowStreamingScorer, MultiCameraScorer

    ds, cfg, model = _train_tiny(use_flow=False, seed=5)
    te_idx = VideoIndex(["a", "b"], ds.test_video_lengths)

    scorer = StreamingScorer.from_model(model)
    scorer.start_video()
    for i in range(3):
        scorer.push(ds.test_frames[i], ds.test_boxes[i])
    ms = scorer.time_device_step(
        ds.test_frames[0], ds.test_boxes[0], k=3, repeats=2
    )
    assert ms > 0.0
    scorer.start_video()
    s = scorer.push(ds.test_frames[0], ds.test_boxes[0])
    assert np.isfinite(s)

    mcs = MultiCameraScorer.from_model(model, n_cameras=2)
    mcs.start_video()
    frames2 = ds.test_frames[:2]
    boxes2 = [ds.test_boxes[0], ds.test_boxes[1]]
    mcs.push_tick(frames2, boxes2)
    ms = mcs.time_device_tick(frames2, boxes2, k=3, repeats=2)
    assert ms > 0.0
    mcs.start_video()
    assert mcs.push_tick(frames2, boxes2) is not None

    # live-flow twin (tiny flow net; full FlowNet2 costs seconds/step on
    # one CPU core)
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    class TinyFlow(nn.Module):
        @nn.compact
        def __call__(self, pairs, train: bool = False):
            x = jnp.concatenate([pairs[:, 0], pairs[:, 1]], axis=-1) / 255.0
            return nn.Conv(2, (3, 3), padding="SAME")(x)

    fnet = TinyFlow()
    fvars = fnet.init(jax.random.key(0), jnp.zeros((1, 2, 16, 16, 3)))
    blk = model.blocks[(0, 0, 0)]
    cfg2 = PipelineConfig(
        dataset_name=cfg.dataset_name, fore=cfg.fore,
        model=CompletionConfig(
            nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=True
        ),
    )
    from vec_vad_tpu.models.completion import make_completion_net

    net2 = make_completion_net(cfg2.model)
    P = cfg2.fore.patch_size
    v2 = net2.init(
        jax.random.key(0),
        np.zeros((1, P, P, cfg2.model.tot_raw_num * 3), np.float32),
        np.zeros((1, P, P, cfg2.model.tot_of_num * 2), np.float32),
        False,
    )
    lf = FlowStreamingScorer(
        cfg2, v2, (100.0, 30.0, 1.0, 1.0),
        flow_net=fnet, flow_variables=fvars, flow_model_hw=(16, 16),
        net=net2, max_boxes=cfg2.fore.max_boxes_per_frame,
    )
    lf.start_video()
    for i in range(3):
        lf.push(ds.test_frames[i], ds.test_boxes[i])
    ms = lf.time_device_step(ds.test_frames[0], ds.test_boxes[0],
                             k=2, repeats=2)
    assert ms > 0.0
    del blk, te_idx


def test_time_device_step_motion_probes():
    """The motion scorers' device twins are OVERRIDDEN to time the fused
    step (`_step_m` with the extended [base, mwin(, pair, fwflag)] ctrl)
    — the inherited twin would silently time the plain score step. Both
    run, return positive ms, and leave the scorer functional after
    start_video()."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from vec_vad_tpu.models.completion import make_completion_net
    from vec_vad_tpu.serve import (
        MotionFlowStreamingScorer,
        MotionStreamingScorer,
    )

    ds, cfg, model = _train_tiny(use_flow=False, seed=5)

    scorer = MotionStreamingScorer.from_model(model, spec=SPEC)
    scorer.start_video()
    for i in range(4):
        scorer.push(ds.test_frames[i])
    ms = scorer.time_device_step(
        ds.test_frames[0], ds.test_boxes[0], k=2, repeats=2
    )
    assert ms > 0.0
    scorer.end_video()  # the conveyor requires a flush before a new video
    scorer.start_video()
    assert scorer.push(ds.test_frames[0]) is None  # conveyor refilling

    class TinyFlow(nn.Module):
        @nn.compact
        def __call__(self, pairs, train: bool = False):
            x = jnp.concatenate([pairs[:, 0], pairs[:, 1]], axis=-1) / 255.0
            return nn.Conv(2, (3, 3), padding="SAME")(x)

    fnet = TinyFlow()
    fvars = fnet.init(jax.random.key(0), jnp.zeros((1, 2, 16, 16, 3)))
    cfg2 = PipelineConfig(
        dataset_name=cfg.dataset_name, fore=cfg.fore,
        model=CompletionConfig(
            nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=True
        ),
    )
    net2 = make_completion_net(cfg2.model)
    P = cfg2.fore.patch_size
    v2 = net2.init(
        jax.random.key(0),
        np.zeros((1, P, P, cfg2.model.tot_raw_num * 3), np.float32),
        np.zeros((1, P, P, cfg2.model.tot_of_num * 2), np.float32),
        False,
    )
    mf = MotionFlowStreamingScorer(
        cfg2, v2, (100.0, 30.0, 1.0, 1.0), spec=SPEC,
        flow_net=fnet, flow_variables=fvars, flow_model_hw=(16, 16),
        net=net2, max_boxes=cfg2.fore.max_boxes_per_frame,
    )
    mf.start_video()
    for i in range(4):
        mf.push(ds.test_frames[i])
    ms = mf.time_device_step(
        ds.test_frames[0], ds.test_boxes[0], k=2, repeats=2
    )
    assert ms > 0.0
    mf.end_video()
    mf.start_video()
    assert mf.push(ds.test_frames[0]) is None


def test_download_f32_tree_roundtrip_and_fallback():
    """The trainers' one-buffer weight download (serve/_common
    ._download_f32_tree): bit-exact vs per-leaf device_get, reuses the
    threaded-back jitted packer, and falls back (pack_fn untouched) on
    mixed-dtype or empty trees."""
    import jax
    import jax.numpy as jnp

    from vec_vad_tpu.serve._common import _download_f32_tree

    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": (jnp.ones((4,), jnp.float32), jnp.full((1, 2), 7.5)),
    }
    host, pack_fn = _download_f32_tree(tree)
    ref = jax.device_get(tree)
    assert pack_fn is not None
    for got, want in zip(jax.tree.leaves(host), jax.tree.leaves(ref)):
        np.testing.assert_array_equal(np.asarray(got), want)

    # threading the packer back reuses the same executable (same object)
    host2, pack_fn2 = _download_f32_tree(tree, pack_fn)
    assert pack_fn2 is pack_fn
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(host2)[0]), ref["a"]
    )

    # mixed dtype: device_get fallback, pack_fn passes through unchanged
    mixed = {"w": jnp.ones((2,), jnp.float32), "n": jnp.zeros((2,), jnp.int32)}
    hostm, pfm = _download_f32_tree(mixed, pack_fn)
    assert pfm is pack_fn
    assert hostm["n"].dtype == np.int32

    # empty tree: no leaves to pack
    hoste, pfe = _download_f32_tree({}, None)
    assert hoste == {} and pfe is None
