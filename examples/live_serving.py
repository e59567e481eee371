"""Runnable online-serving demo: the three streaming modes on synthetic
camera feeds (no real data needed).

    JAX_PLATFORMS=cpu python examples/live_serving.py

1. trains a tiny two-stream model on a synthetic dataset,
2. single-camera streaming (StreamingScorer, one device call per frame),
3. fleet serving (MultiCameraScorer, C cameras per device call),
4. LIVE-flow serving (FlowStreamingScorer: optical flow computed on
   device inside the same per-frame call — no precomputed flow tree),
and checks each mode's scores against the offline pipeline/one another.
Takes a couple of minutes on one CPU core; on a TPU the same steps are
the production serving path (30-50 ms/frame through a remote relay,
sub-ms device compute).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from vec_vad_tpu.config import (
        CompletionConfig,
        DatasetSpec,
        ForegroundConfig,
        PipelineConfig,
    )
    from vec_vad_tpu.data.synthetic import make_synthetic_dataset
    from vec_vad_tpu.data.video_index import VideoIndex
    from vec_vad_tpu.flow.driver import compute_optical_flow
    from vec_vad_tpu.pipeline import extract_cube_set, make_trainer, train_model
    from vec_vad_tpu.serve import (
        FlowStreamingScorer,
        MultiCameraScorer,
        StreamingScorer,
    )

    class TinyFlow(nn.Module):
        """Stand-in with FlowNet2's serving contract (pairs -> flow);
        swap in models.flownet.FlowNet2 + a converted checkpoint for the
        real thing."""

        @nn.compact
        def __call__(self, pair, train: bool = False):
            x = jnp.concatenate([pair[:, 0], pair[:, 1]], axis=-1) / 255.0
            return nn.Conv(2, (3, 3))(nn.relu(nn.Conv(8, (3, 3))(x)))

    spec = DatasetSpec(
        name="demo", frame_h=48, frame_w=64, file_ext=".tif", scene_num=1,
        ap_score_thr=0.5, ap_min_area=16.0, cover_thr=0.6,
        mt_area_thr=16.0, mt_binary_thr=18.0, mt_extend=2,
        mt_gauss_mask_size=3,
    )
    ds = make_synthetic_dataset(
        frames_per_video=16, n_train_videos=1, n_test_videos=2,
        frame_h=48, frame_w=64, seed=1,
    )
    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=16, max_boxes_per_frame=8),
        model=CompletionConfig(
            nf=4, epochs=1, batch_size=16, context_of_num=0, use_flow=True
        ),
    )

    fnet = TinyFlow()
    fvars = fnet.init(jax.random.key(7), jnp.zeros((1, 2, 24, 32, 3)))
    tr_idx = VideoIndex(["v"], ds.train_video_lengths)
    tr_flow = compute_optical_flow(
        fnet, fvars, tr_idx, ds.train_frames, model_hw=(24, 32)
    )
    cubes = extract_cube_set(
        cfg, spec, tr_idx, ds.train_frames, ds.train_boxes,
        flow_frames=tr_flow,
    )
    print(f"training on {cubes.size} cubes ...")
    model = train_model(cfg, cubes, trainer=make_trainer(cfg))

    te_idx = VideoIndex(["a", "b"], ds.test_video_lengths)
    te_flow = compute_optical_flow(
        fnet, fvars, te_idx, ds.test_frames, model_hw=(24, 32)
    )
    n = int(ds.test_video_lengths[0])

    # 1. single-camera streaming with precomputed flow
    sc = StreamingScorer.from_model(model)
    sc.start_video()
    single = [
        sc.push(ds.test_frames[t], ds.test_boxes[t], flow=te_flow[t])
        for t in range(n)
    ]
    print(f"streaming:  {np.round(single[:6], 3)} ...")

    # 2. fleet: both test videos as two concurrent cameras
    mc = MultiCameraScorer.from_model(model, n_cameras=2)
    mc.start_video()
    fleet = [
        mc.push_tick(
            np.stack([ds.test_frames[t], ds.test_frames[n + t]]),
            [ds.test_boxes[t], ds.test_boxes[n + t]],
            flows=np.stack([te_flow[t], te_flow[n + t]]),
        )
        for t in range(n)
    ]
    assert np.allclose([r[0] for r in fleet], single, atol=2e-4)
    print(f"fleet cam0: {np.round([r[0] for r in fleet][:6], 3)} ... (== streaming)")

    # 3. live flow: no precomputed tree; flow computed on device per push
    lf = FlowStreamingScorer.from_model(
        model, flow_net=fnet, flow_variables=fvars, flow_model_hw=(24, 32)
    )
    lf.start_video()
    live = []
    for t in range(n):
        s = lf.push(ds.test_frames[t], ds.test_boxes[t])
        if s is not None:
            live.append(s)
    s = lf.end_video()
    if s is not None:
        live.append(s)
    assert np.allclose(live, single, atol=2e-4)
    print(f"live-flow:  {np.round(live[:6], 3)} ... (== streaming)")
    print("all three serving modes agree with the offline recipe. done.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
