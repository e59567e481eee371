"""Online (streaming) anomaly scoring for production serving.

The reference is strictly offline: test.py scores a fully materialized
split from disk artifacts. But its scoring recipe is *causal* — the
foreground/completion context windows use border_mode='predict'
(train.py:116-121), i.e. every frame is completed from itself plus the
`context_frame_num` frames BEFORE it (vad_datasets.py:287-293). That makes
true online serving possible with zero algorithmic change: a camera feed
can be scored frame-by-frame with exactly the scores the offline pipeline
would produce.

`StreamingScorer` is that serving path, designed TPU-first:

  * all state lives in HBM: a ring buffer of the last `tot_raw_num` frames
    (+ a flow ring when the flow stream is enabled), every block's model
    weights stacked along a leading block axis, and the per-block
    training-score statistics;
  * ONE device call per frame: a single donated-buffer jitted step that
    writes the incoming frame into the ring, gathers the context window,
    extracts every padded bbox cube (crop+resize as MXU interpolation
    matmuls), runs the completion ensemble under every block's weights
    (vmap over the stacked block axis), and returns one concatenated
    result vector so the host pays exactly one download;
  * static shapes throughout: boxes are padded to a fixed K, the window
    layout is precomputed host-side as ring slots, so the step compiles
    once and replays for every frame of every video;
  * (scene, h, w) block grids route host-side: each box's grid cell(s)
    (utils.calc_block_idx, test.py:282-310 semantics) select which block's
    score applies; boxes landing in untrained cells score big_number
    (anomaly), exactly like the offline path.

Scores match the offline paths exactly (tests/test_serve.py): same uint8
cube quantization, same ensemble forward, same z-norm/fusion, same motion
+ degenerate-box filters, same -big_number for empty frames
(test.py:296-357 semantics).

`MultiCameraScorer` extends the same step to fleet serving: C concurrent
camera streams scored in one device call per tick (the per-frame step
scanned over a leading camera axis, optionally sharded over a device
mesh), with per-camera video boundaries and scene routing.
`FlowStreamingScorer` fuses a FlowNet forward into the per-frame step so
a two-stream model serves a raw camera feed with NO precomputed flow —
something the reference's offline calc_optical_flow relay cannot do.
`MotionStreamingScorer` computes the foreground boxes in the loop from
the frame stream (the reference's motion recipe), and
`MotionFlowStreamingScorer` combines both: `push(frame)` is the entire
input — boxes AND flow computed inside the fused per-frame call, the
fully self-contained "switch on a camera" mode for two-stream models.

Hardware (UCSDped2 geometry through the remote relay, 200-frame
medians, round-4 bench): synchronous push 34.6 ms median / 37.5 ms p90
per frame; pipeline_depth=2 sustains 83.7 fps; push_many (8 frames per
device call) 133 fps; 8-camera fleet tick 425 fps aggregate; live-flow
(full FlowNet2 fused in the step) 65.8 fps pipelined; the fully
self-contained motion+flow mode 21.9 fps synchronous. The per-call
relay round trip (~25 ms) dominates the single-frame modes — on
locally-attached TPU hardware the same step is sub-millisecond of
device work.
"""

from __future__ import annotations

from vec_vad_tpu.serve._common import (  # noqa: F401
    _alloc_camera_rings,
    _fleet_arity,
    _pack_f32,
    _predict_window,
    _shard_over_cameras,
    _unflatten_f32,
)
from vec_vad_tpu.serve.fleet import MultiCameraScorer  # noqa: F401
from vec_vad_tpu.serve.live_flow import (  # noqa: F401
    FlowStreamingScorer,
    MultiCameraFlowScorer,
)
from vec_vad_tpu.serve.motion import MotionStreamingScorer  # noqa: F401
from vec_vad_tpu.serve.motion_flow import (  # noqa: F401
    MotionFlowStreamingScorer,
)
from vec_vad_tpu.serve.streaming import StreamingScorer  # noqa: F401

__all__ = [
    "StreamingScorer",
    "MultiCameraScorer",
    "FlowStreamingScorer",
    "MultiCameraFlowScorer",
    "MotionStreamingScorer",
    "MotionFlowStreamingScorer",
]
