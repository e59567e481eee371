"""Live-flow streaming (serve.FlowStreamingScorer): flow computed on
device from the frame ring, one fused call per push, must reproduce the
offline pipeline's scores exactly — including the reference's flow-pair
rule (zero flow at video heads, flow(t -> t+1) mid-video, the tail pair
at video ends; calc_optical_flow.py:43-76)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
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
from vec_vad_tpu.flow.driver import compute_optical_flow
from vec_vad_tpu.infer import infer_frame_scores_resident
from vec_vad_tpu.ops.stc import pad_boxes
from vec_vad_tpu.pipeline import extract_cube_set, make_trainer, train_model
from vec_vad_tpu.serve import FlowStreamingScorer

SPEC = DatasetSpec(
    name="s", frame_h=48, frame_w=64, file_ext=".tif", scene_num=1,
    ap_score_thr=0.5, ap_min_area=16.0, cover_thr=0.6,
    mt_area_thr=16.0, mt_binary_thr=18.0, mt_extend=2, mt_gauss_mask_size=3,
)
FLOW_HW = (24, 32)  # tiny stand-in for the driver's 384x512 protocol


class TinyFlow(nn.Module):
    """Minimal stand-in with FlowNet2's serving contract:
    (B, 2, mh, mw, 3) frame pairs in 0..255 -> (B, mh, mw, 2) flow."""

    @nn.compact
    def __call__(self, pair, train: bool = False):
        x = jnp.concatenate([pair[:, 0], pair[:, 1]], axis=-1) / 255.0
        x = nn.relu(nn.Conv(8, (3, 3))(x))
        return nn.Conv(2, (3, 3))(x)


def _flow_net():
    net = TinyFlow()
    v = net.init(
        jax.random.key(7), jnp.zeros((1, 2) + FLOW_HW + (3,), jnp.float32)
    )
    return net, v


def _train_two_stream(seed, context_of_num):
    ds = make_synthetic_dataset(
        frames_per_video=14, n_train_videos=1, n_test_videos=2,
        frame_h=48, frame_w=64, seed=seed,
    )
    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=16, max_boxes_per_frame=8),
        model=CompletionConfig(
            nf=4, epochs=1, batch_size=16,
            context_of_num=context_of_num, use_flow=True,
        ),
    )
    fnet, fvars = _flow_net()
    tr_idx = VideoIndex(["v"], ds.train_video_lengths)
    tr_flow = compute_optical_flow(
        fnet, fvars, tr_idx, ds.train_frames, model_hw=FLOW_HW
    )
    cubes = extract_cube_set(
        cfg, SPEC, tr_idx, ds.train_frames, ds.train_boxes,
        flow_frames=tr_flow,
    )
    model = train_model(cfg, cubes, trainer=make_trainer(cfg))
    return ds, cfg, model, fnet, fvars


def _offline_scores(ds, cfg, model, te_idx, te_flow):
    blk = model.blocks[(0, 0, 0)]
    boxes_pad, valid = pad_boxes(ds.test_boxes, cfg.fore.max_boxes_per_frame)
    windows = te_idx.context_indices(
        cfg.model.context_frame_num, cfg.model.border_mode
    )
    ow = te_idx.context_indices(cfg.model.context_of_num, cfg.model.border_mode)
    mu_r, sd_r = blk.raw_stats
    mu_o, sd_o = blk.of_stats
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
        flow=te_flow,
        of_windows=ow if ow.ndim > 1 else ow[:, None],
    )


def _stream(scorer, frames, boxes, video_lengths):
    out, i = [], 0
    for ln in video_lengths:
        scorer.start_video()
        for _ in range(int(ln)):
            s = scorer.push(frames[i], boxes[i])
            if s is not None:
                out.append(s)
            i += 1
        s = scorer.end_video()
        if s is not None:
            out.append(s)
    out.extend(scorer.drain())
    return np.asarray(out, np.float32)


def test_live_flow_bf16_compute_dtype():
    """flow_compute_dtype=bfloat16 streams finite scores close to f32.

    Regression for the bf16 flow path: composites crashed at trace time
    until warp_bilinear became dtype-preserving (test_flownet.py covers
    the composite trace); this covers the serving wiring — weights cast
    once, activations per call, flow returned to f32 before scoring."""
    ds, cfg, model, fnet, fvars = _train_two_stream(31, 0)
    te_idx = VideoIndex(["a", "b"], ds.test_video_lengths)
    s32 = _stream(
        FlowStreamingScorer.from_model(
            model, flow_net=fnet, flow_variables=fvars,
            flow_model_hw=FLOW_HW,
        ),
        ds.test_frames, ds.test_boxes, te_idx.video_lengths,
    )
    s16 = _stream(
        FlowStreamingScorer.from_model(
            model, flow_net=fnet, flow_variables=fvars,
            flow_model_hw=FLOW_HW, flow_compute_dtype=jnp.bfloat16,
        ),
        ds.test_frames, ds.test_boxes, te_idx.video_lengths,
    )
    assert s16.shape == s32.shape
    assert np.all(np.isfinite(s16))
    np.testing.assert_allclose(s16, s32, rtol=0.1, atol=0.05)


@pytest.mark.parametrize("context_of_num", [0, 4])
def test_live_flow_matches_offline(context_of_num):
    """Streamed scores with ON-DEVICE flow == offline scores with the
    driver-precomputed flow tree, frame for frame (both test videos,
    head/mid/tail pair rules all exercised)."""
    ds, cfg, model, fnet, fvars = _train_two_stream(31, context_of_num)
    te_idx = VideoIndex(["a", "b"], ds.test_video_lengths)
    te_flow = compute_optical_flow(
        fnet, fvars, te_idx, ds.test_frames, model_hw=FLOW_HW
    )
    offline = _offline_scores(ds, cfg, model, te_idx, te_flow)

    scorer = FlowStreamingScorer.from_model(
        model, flow_net=fnet, flow_variables=fvars, flow_model_hw=FLOW_HW
    )
    streamed = _stream(
        scorer, ds.test_frames, ds.test_boxes, te_idx.video_lengths
    )
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=2e-4, atol=2e-4)


def test_live_flow_two_frame_video_tail():
    """N=2 video: BOTH frames' pairs are the degenerate (f0, f0) — the
    tail window of a 2-frame video is still the head window [0, 0, 1]
    (flow_pair_indices), so a naive flow(0 -> 1) tail would diverge."""
    ds, cfg, model, fnet, fvars = _train_two_stream(32, 0)
    te_idx = VideoIndex(["a"], np.array([2]))
    frames = ds.test_frames[:2]
    boxes = ds.test_boxes[:2]
    te_flow = compute_optical_flow(fnet, fvars, te_idx, frames, model_hw=FLOW_HW)
    np.testing.assert_array_equal(np.asarray(te_flow[0]), np.asarray(te_flow[1]))

    blk = model.blocks[(0, 0, 0)]
    boxes_pad, valid = pad_boxes(list(boxes), cfg.fore.max_boxes_per_frame)
    windows = te_idx.context_indices(
        cfg.model.context_frame_num, cfg.model.border_mode
    )
    ow = te_idx.context_indices(cfg.model.context_of_num, cfg.model.border_mode)
    offline = infer_frame_scores_resident(
        cfg,
        {"params": blk.params, "batch_stats": blk.batch_stats},
        blk.raw_stats + blk.of_stats,
        frames, windows, boxes_pad, valid, chunk=2, cube_batch=16,
        flow=te_flow, of_windows=ow if ow.ndim > 1 else ow[:, None],
    )
    scorer = FlowStreamingScorer.from_model(
        model, flow_net=fnet, flow_variables=fvars, flow_model_hw=FLOW_HW
    )
    streamed = _stream(scorer, frames, boxes, [2])
    np.testing.assert_allclose(streamed, offline, rtol=2e-4, atol=2e-4)


def test_live_flow_api_discipline():
    """push before start_video and start_video over an unflushed video
    raise; raw-only models are refused; pipeline_depth shifts emission
    without changing scores."""
    ds, cfg, model, fnet, fvars = _train_two_stream(33, 0)
    te_idx = VideoIndex(["a", "b"], ds.test_video_lengths)

    scorer = FlowStreamingScorer.from_model(
        model, flow_net=fnet, flow_variables=fvars, flow_model_hw=FLOW_HW
    )
    with pytest.raises(ValueError):
        scorer.push(ds.test_frames[0], ds.test_boxes[0])
    scorer.start_video()
    scorer.push(ds.test_frames[0], ds.test_boxes[0])
    scorer.push(ds.test_frames[1], ds.test_boxes[1])
    with pytest.raises(ValueError):
        scorer.start_video()
    scorer.end_video()
    scorer.start_video()  # now fine

    base = _stream(
        FlowStreamingScorer.from_model(
            model, flow_net=fnet, flow_variables=fvars, flow_model_hw=FLOW_HW
        ),
        ds.test_frames, ds.test_boxes, te_idx.video_lengths,
    )
    piped = _stream(
        FlowStreamingScorer.from_model(
            model, flow_net=fnet, flow_variables=fvars,
            flow_model_hw=FLOW_HW, pipeline_depth=2,
        ),
        ds.test_frames, ds.test_boxes, te_idx.video_lengths,
    )
    np.testing.assert_array_equal(base, piped)

    import dataclasses

    cfg_raw = cfg.replace(
        model=dataclasses.replace(cfg.model, use_flow=False)
    )
    with pytest.raises(ValueError):
        FlowStreamingScorer(
            cfg_raw, None, None, flow_net=fnet, flow_variables=fvars,
            blocks={(0, 0, 0): (None, (0.0, 1.0))},
        )


def _camera_feeds(ds):
    """Two equal-length per-camera streams from the two test videos."""
    n = int(ds.test_video_lengths[0])
    feeds = [
        (ds.test_frames[:n], ds.test_boxes[:n]),
        (ds.test_frames[n : 2 * n], ds.test_boxes[n : 2 * n]),
    ]
    return n, feeds


def _stream_fleet(scorer, feeds, n):
    rows = []
    scorer.start_video()
    for t in range(n):
        out = scorer.push_tick(
            np.stack([f[0][t] for f in feeds]),
            [f[1][t] for f in feeds],
        )
        if out is not None:
            rows.append(out)
    out = scorer.end_video()
    if out is not None:
        rows.append(out)
    rows.extend(scorer.drain())
    return np.asarray(rows, np.float32)  # (n, C)


def test_multicamera_live_flow_matches_single():
    """MultiCameraFlowScorer's fused tick == per-camera
    FlowStreamingScorer streams, column for column."""
    from vec_vad_tpu.serve import MultiCameraFlowScorer

    ds, cfg, model, fnet, fvars = _train_two_stream(34, 0)
    n, feeds = _camera_feeds(ds)

    singles = []
    for frames, boxes in feeds:
        sc = FlowStreamingScorer.from_model(
            model, flow_net=fnet, flow_variables=fvars, flow_model_hw=FLOW_HW
        )
        singles.append(_stream(sc, frames, boxes, [n]))
    singles = np.stack(singles, axis=1)  # (n, C)

    fleet = MultiCameraFlowScorer.from_model(
        model, n_cameras=2, flow_net=fnet, flow_variables=fvars,
        flow_model_hw=FLOW_HW,
    )
    rows = _stream_fleet(fleet, feeds, n)
    assert rows.shape == singles.shape
    np.testing.assert_allclose(rows, singles, rtol=1e-5, atol=1e-5)


def test_multicamera_live_flow_mesh_matches():
    """The mesh-sharded fleet live-flow tick (cameras over devices, flow
    + block weights replicated) scores exactly like the unsharded one."""
    import jax

    from vec_vad_tpu.parallel.mesh import get_mesh
    from vec_vad_tpu.serve import MultiCameraFlowScorer

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    ds, cfg, model, fnet, fvars = _train_two_stream(35, 0)
    n, feeds2 = _camera_feeds(ds)
    C = 8
    feeds = [feeds2[c % 2] for c in range(C)]

    kw = dict(
        n_cameras=C, flow_net=fnet, flow_variables=fvars,
        flow_model_hw=FLOW_HW,
    )
    base = MultiCameraFlowScorer.from_model(model, **kw)
    sharded = MultiCameraFlowScorer.from_model(model, mesh=get_mesh(), **kw)
    a = _stream_fleet(base, feeds, n)
    b = _stream_fleet(sharded, feeds, n)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_live_flow_gray_matches_rgb():
    """gray_stream live-flow == RGB live-flow on the replicated frames:
    the ring replication feeds the SAME 3-channel pair into the flow net
    that cv2's gray->BGR load would (and the offline driver's C==1
    replicate-then-resize commutes with resize-then-replicate)."""
    ds, cfg, model, fnet, fvars = _train_two_stream(36, 0)
    n = int(ds.test_video_lengths[0])
    gray = ds.test_frames[:n, :, :, 0]
    rgb = np.repeat(gray[..., None], 3, axis=-1)

    kw = dict(flow_net=fnet, flow_variables=fvars, flow_model_hw=FLOW_HW)
    a = _stream(
        FlowStreamingScorer.from_model(model, gray_stream=True, **kw),
        gray, ds.test_boxes, [n],
    )
    b = _stream(
        FlowStreamingScorer.from_model(model, **kw),
        rgb, ds.test_boxes, [n],
    )
    np.testing.assert_array_equal(a, b)


def test_live_flow_grid_matches_pushed_flow():
    """Live-flow serving on a MULTI-BLOCK grid model == the base
    streaming scorer fed the driver-precomputed flow: grid routing and
    the flow-lag emission schedule compose."""
    from vec_vad_tpu.config import register_dataset
    from vec_vad_tpu.serve import StreamingScorer

    spec = DatasetSpec(
        name="synthFlowGrid", frame_h=48, frame_w=64, file_ext=".tif",
        scene_num=1, ap_score_thr=0.5, ap_min_area=16.0, cover_thr=0.6,
        mt_area_thr=16.0, mt_binary_thr=18.0, mt_extend=2,
        mt_gauss_mask_size=3,
    )
    register_dataset(spec)
    ds = make_synthetic_dataset(
        frames_per_video=14, n_train_videos=2, n_test_videos=1,
        frame_h=48, frame_w=64, seed=41,
    )
    cfg = PipelineConfig(
        dataset_name="synthFlowGrid",
        fore=ForegroundConfig(
            patch_size=16, max_boxes_per_frame=8, h_block=2, w_block=2
        ),
        model=CompletionConfig(
            nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=True
        ),
    )
    fnet, fvars = _flow_net()
    tr_idx = VideoIndex(["t0", "t1"], ds.train_video_lengths)
    tr_flow = compute_optical_flow(
        fnet, fvars, tr_idx, ds.train_frames, model_hw=FLOW_HW
    )
    cubes = extract_cube_set(
        cfg, spec, tr_idx, ds.train_frames, ds.train_boxes,
        flow_frames=tr_flow,
    )
    model = train_model(cfg, cubes, trainer=make_trainer(cfg))
    assert len(model.blocks) >= 2  # actually a grid

    te_idx = VideoIndex(["a"], ds.test_video_lengths)
    te_flow = compute_optical_flow(
        fnet, fvars, te_idx, ds.test_frames, model_hw=FLOW_HW
    )
    n = int(ds.test_video_lengths[0])
    base = StreamingScorer.from_model(model, route_hw=(48, 64))
    base.start_video()
    pushed = np.asarray(
        [
            base.push(ds.test_frames[t], ds.test_boxes[t], flow=te_flow[t])
            for t in range(n)
        ],
        np.float32,
    )
    live = _stream(
        FlowStreamingScorer.from_model(
            model, flow_net=fnet, flow_variables=fvars,
            flow_model_hw=FLOW_HW, route_hw=(48, 64),
        ),
        ds.test_frames, ds.test_boxes, [n],
    )
    np.testing.assert_allclose(live, pushed, rtol=2e-4, atol=2e-4)


def test_live_flow_push_many_matches_push():
    """Micro-batched live-flow (k frames per device call) emits exactly
    the per-push score sequence, across uneven chunking and video ends."""
    ds, cfg, model, fnet, fvars = _train_two_stream(42, 0)
    te_idx = VideoIndex(["a", "b"], ds.test_video_lengths)
    kw = dict(flow_net=fnet, flow_variables=fvars, flow_model_hw=FLOW_HW)

    ref = _stream(
        FlowStreamingScorer.from_model(model, **kw),
        ds.test_frames, ds.test_boxes, te_idx.video_lengths,
    )

    scorer = FlowStreamingScorer.from_model(model, **kw)
    out, i = [], 0
    for ln in te_idx.video_lengths:
        scorer.start_video()
        todo = int(ln)
        for chunk in (5, 3, 6):  # uneven chunks covering the 14 frames
            sel = slice(i, i + min(chunk, todo))
            out.extend(
                scorer.push_many(
                    ds.test_frames[sel], list(ds.test_boxes[sel.start:sel.stop])
                )
            )
            i += min(chunk, todo)
            todo -= min(chunk, todo)
        s = scorer.end_video()
        if s is not None:
            out.append(s)
    out.extend(scorer.drain())
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref, rtol=1e-5, atol=1e-5
    )


def test_live_flow_bf16_flow_compute():
    """flow_compute_dtype=bfloat16 runs the FlowNet forward in bf16
    (weights packed as one bf16 buffer) and stays close to the f32
    scores — the quantization perturbs only the flow stream's inputs."""
    ds, cfg, model, fnet, fvars = _train_two_stream(43, 0)
    n = int(ds.test_video_lengths[0])
    kw = dict(flow_net=fnet, flow_variables=fvars, flow_model_hw=FLOW_HW)
    a = _stream(
        FlowStreamingScorer.from_model(model, **kw),
        ds.test_frames[:n], ds.test_boxes[:n], [n],
    )
    sc16 = FlowStreamingScorer.from_model(
        model, flow_compute_dtype=jnp.bfloat16, **kw
    )
    assert sc16._flow_arg.dtype == jnp.bfloat16
    b = _stream(sc16, ds.test_frames[:n], ds.test_boxes[:n], [n])
    assert np.isfinite(b).all()
    # scores are z-normed (O(1) scale); bf16 flow perturbs them slightly
    np.testing.assert_allclose(a, b, atol=0.15)


def test_serve_cli_flow_dtype_plumbing(monkeypatch):
    """`serve --flow-dtype bfloat16` must reach the scorer as
    flow_compute_dtype=bfloat16 via _build_live_flow (FlowNet2 build
    stubbed out — a real 162.5M-param init is minutes on one CPU core)."""
    from types import SimpleNamespace

    import vec_vad_tpu.models.flownet as fmod
    from vec_vad_tpu import cli

    class StubNet:
        def init(self, key, x):
            return {}

    monkeypatch.setattr(fmod, "FlowNet2", StubNet)
    _, _, kw = cli._build_live_flow(
        SimpleNamespace(flow_checkpoint=None, flow_dtype="bfloat16")
    )
    assert kw == {"flow_compute_dtype": jnp.bfloat16}
    _, _, kw = cli._build_live_flow(
        SimpleNamespace(flow_checkpoint=None, flow_dtype="float32")
    )
    assert kw == {"flow_compute_dtype": jnp.float32}


def test_fleet_live_flow_device_tick_twin():
    """MultiCameraFlowScorer.time_device_tick times the real fleet tick
    (the inherited single-camera twin is blocked — it would run against
    the (C, ...) rings) and leaves the fleet functional after the flush
    + start_video() reset."""
    import pytest

    from vec_vad_tpu.serve import MultiCameraFlowScorer

    ds, cfg, model, fnet, fvars = _train_two_stream(35, 0)
    n, feeds = _camera_feeds(ds)
    fleet = MultiCameraFlowScorer.from_model(
        model, n_cameras=2, flow_net=fnet, flow_variables=fvars,
        flow_model_hw=FLOW_HW,
    )
    fleet.start_video()
    for t in range(3):
        fleet.push_tick(
            np.stack([feeds[0][0][t], feeds[1][0][t]]),
            [feeds[0][1][t], feeds[1][1][t]],
        )
    ms = fleet.time_device_tick(
        np.stack([feeds[0][0][0], feeds[1][0][0]]),
        [feeds[0][1][0], feeds[1][1][0]], k=2, repeats=2,
    )
    assert ms > 0.0
    with pytest.raises(NotImplementedError):
        fleet.time_device_step(feeds[0][0][0], feeds[0][1][0])
    fleet.end_video()
    fleet.start_video()
    assert fleet.push_tick(
        np.stack([feeds[0][0][0], feeds[1][0][0]]),
        [feeds[0][1][0], feeds[1][1][0]],
    ) is not None  # tick 0 emits immediately
