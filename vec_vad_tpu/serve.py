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

Hardware (UCSDped2 geometry through the remote relay, 200-frame medians,
BENCH_r03): synchronous push 34.4 ms median / 39.1 ms p90 per frame;
pipeline_depth=2 sustains 29.8 fps; push_many (8 frames per device call)
sustains 131 fps. The per-call relay round trip (~25 ms) dominates the
single-frame modes — on locally-attached TPU hardware the same step is
sub-millisecond of device work.
"""

from __future__ import annotations

from collections import deque
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vec_vad_tpu.config import PipelineConfig
from vec_vad_tpu.models.completion import SelfCompletionNet, make_completion_net
from vec_vad_tpu.ops.stc import cube_to_input, extract_stc, flow_magnitude
from vec_vad_tpu.score.scoring import BIG_NUMBER, degenerate_boxes
from vec_vad_tpu.utils.blocks import calc_block_idx


def _predict_window(pos: int, ctx: int) -> np.ndarray:
    """The 'predict' border-mode context window for frame `pos` of a video,
    in within-video coordinates: [start]*pad + [start..pos]
    (vad_datasets.py:287-293; matches data.video_index.context_indices)."""
    T = ctx + 1
    start = max(pos - ctx, 0)
    pad = T - (pos - start + 1)
    t = np.arange(T, dtype=np.int64)
    return start + np.maximum(t - pad, 0)


def _pack_f32(tree, dtype=jnp.float32):
    """Flatten a pytree into one uniform-dtype device buffer for
    single-handle argument marshaling: (packed, shapes, treedef);
    packed/shapes None when any leaf differs from `dtype` (pass the
    pytree through instead)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if all(l.dtype == dtype for l in leaves):
        return (
            jnp.concatenate([jnp.ravel(l) for l in leaves]),
            [l.shape for l in leaves],
            treedef,
        )
    return None, None, treedef


def _unflatten_f32(buf, shapes, treedef):
    """Inverse of _pack_f32 under trace (static offsets -> reshapes):
    (tree, consumed_length)."""
    leaves, o = [], 0
    for shp in shapes:
        sz = int(np.prod(shp))
        leaves.append(buf[o : o + sz].reshape(shp))
        o += sz
    return jax.tree_util.tree_unflatten(treedef, leaves), o


def _fleet_arity(n_cameras, mesh) -> Tuple[int, int]:
    """Validated (C, n_shards) for a camera fleet over an optional mesh."""
    C = int(n_cameras)
    if C < 1:
        raise ValueError("n_cameras must be >= 1")
    n = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    if n > 1 and C % n:
        raise ValueError(
            f"n_cameras={C} must divide evenly over the {n}-device mesh"
        )
    return C, n


def _shard_over_cameras(fn, mesh, n_cam_args: int, n_rep_args: int):
    """shard_map a fleet tick over the camera axis: the first n_cam_args
    arguments shard on their leading (camera) dim, the trailing
    n_rep_args (weights) replicate; outputs (ring, flow_ring, outs) are
    camera-sharded. Zero collectives — cameras are independent."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec

    cam = PartitionSpec(mesh.axis_names[0])
    rep = PartitionSpec()
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(cam,) * n_cam_args + (rep,) * n_rep_args,
        out_specs=(cam, cam, cam),
    )


def _alloc_camera_rings(C, rlen, h, w, of_shape, mesh, n_shards):
    """Fleet rings, pre-sharded on the camera axis when on a mesh so the
    donated buffers round-trip the tick without resharding."""
    shape_r = (C, rlen, h, w, 3)
    if n_shards > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        return (
            jax.device_put(np.zeros(shape_r, np.uint8), sh),
            jax.device_put(np.zeros(of_shape, np.float32), sh),
        )
    return jnp.zeros(shape_r, jnp.uint8), jnp.zeros(of_shape, jnp.float32)


class StreamingScorer:
    """Per-frame online scorer over a device-resident frame ring.

    Usage:
        scorer = StreamingScorer.from_model(model)   # all trained blocks
        scorer.start_video()                         # per video (scene=N)
        for frame, boxes, flow in camera_feed:
            score = scorer.push(frame, boxes, flow=flow)  # one device call

    `push` returns the frame-level anomaly score: the max over the frame's
    valid, non-degenerate (and motion-passing, when flow is streamed) box
    scores — each box scored by the block(s) its grid cell routes to, with
    big_number for untrained cells — or -big_number for a frame with no
    scoring boxes (test.py:282-357 semantics).

    Only border_mode='predict' (the reference's default) is causal;
    'elastic'/'hard' windows reference future frames and cannot stream.
    """

    def __init__(
        self,
        cfg: PipelineConfig,
        variables,
        stats: Tuple[float, float, float, float],
        net: Optional[SelfCompletionNet] = None,
        max_boxes: Optional[int] = None,
        compute_dtype=jnp.float32,
        big_number: float = BIG_NUMBER,
        blocks: Optional[Dict[tuple, tuple]] = None,
        pipeline_depth: int = 0,
        gray_stream: bool = False,
        route_hw: Optional[Tuple[int, int]] = None,
        pack_weights: bool = True,
    ):
        """Single-block form: (variables, stats) serve every box (a 1x1
        grid at block key (0, 0, 0)). Grid form: pass `blocks` mapping
        (scene-1, h, w) -> (variables, (mu_r, sd_r, mu_o, sd_o)) and leave
        variables/stats as None.

        pipeline_depth: with depth d >= 1, `push(frame_t)` enqueues the
        device step for frame t and returns the score of frame t-d (None
        while the pipeline fills; `drain()` at stream end). The device
        steps chain through the donated ring, so while the host blocks on
        frame t-d's tiny result download, frames t-d+1..t are already in
        flight — the relay round trip amortizes across d frames. Scores
        are IDENTICAL to depth 0; only the emission time shifts. Real-time
        25 fps streams should serve with d=2 (adds 2 frame times = 80 ms
        of latency, buys ~2x sustained throughput over a high-RTT link).

        gray_stream: the stream's frames are single-channel (H, W) or
        (H, W, 1) uint8; the device replicates to 3 channels before the
        ring write — bit-identical to cv2.imread's gray->BGR replication
        (how the reference reads UCSDped2's .tif frames) at a third of
        the per-push upload.

        route_hw: (h, w) geometry for block-grid routing, which must match
        the spec the model's cubes were EXTRACTED with (pipeline.py routes
        by spec.frame_h / h_block). Defaults to the config table's
        dataset geometry — correct for every runner/CLI workflow; pass it
        explicitly when extraction used a custom DatasetSpec.

        pack_weights: marshal the block weights + stats table into the
        jitted step as ONE flat f32 buffer instead of a ~100-leaf pytree
        (the flagship grid is 92 leaves). Hardware A/B (interleaved
        pushes, drift-fair): latency-NEUTRAL — 31.3 ms median packed vs
        31.9 unpacked; per-argument dispatch marshaling measured at
        ~6 us/leaf (92 tiny args 1.18 ms/call vs one buffer 0.66), so
        handle count is not the serving floor (link RTT + the 86 KB
        frame upload is). The packed form stays the default for its
        memory shape — ONE weight buffer resident in HBM instead of a
        stacked pytree — and scores are bit-identical either way. Auto-
        disabled when any weight leaf is not float32.
        """
        mc = cfg.model
        if mc.border_mode != "predict":
            raise ValueError(
                "online serving requires the causal 'predict' border mode; "
                f"got {mc.border_mode!r}"
            )
        self.cfg = cfg
        self.net = net or make_completion_net(mc)
        self.big_number = float(big_number)
        self.K = int(max_boxes or cfg.fore.max_boxes_per_frame)
        self.P = int(cfg.fore.patch_size)
        self.R = int(mc.tot_raw_num)
        self.R_of = int(mc.tot_of_num)
        self.ctx = int(mc.context_frame_num)
        self.ctx_of = int(mc.context_of_num)
        self.use_flow = bool(mc.use_flow)
        self._compute_dtype = compute_dtype
        self.route_hw = (
            tuple(route_hw) if route_hw is not None else cfg.dataset.frame_hw
        )

        if blocks is None:
            if variables is None:
                raise ValueError("pass (variables, stats) or blocks=")
            blocks = {(0, 0, 0): (variables, tuple(stats))}
        self._keys = sorted(blocks)
        self.B = len(self._keys)
        self._kidx = {k: i for i, k in enumerate(self._keys)}
        self._vars = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *[blocks[k][0] for k in self._keys],
        )
        # stats rows are (mu_r, sd_r, mu_o, sd_o, of_on); a 4-tuple means
        # of_on=1. of_on=0 marks a block trained WITHOUT a flow stream
        # (TrainedBlock.of_stats is None) — its score is raw-only, matching
        # the offline fuse_scores(..., of_stats=None) degradation exactly.
        self._stats = jnp.asarray(
            np.array(
                [
                    tuple(blocks[k][1]) + (1.0,) * (5 - len(blocks[k][1]))
                    for k in self._keys
                ],
                np.float32,
            )
        )  # (B, 5)

        # one-buffer weight marshaling (see __init__ docstring): flatten
        # every stacked leaf + the stats table into a single device array;
        # the jitted steps rebuild the pytree with static slices
        packed, self._wshapes, self._wtree = _pack_f32(self._vars)
        if pack_weights and packed is not None:
            self._weight_args = (
                jnp.concatenate([packed, jnp.ravel(self._stats)]),
            )
            # the stacked pytree is dead once packed — drop it so weight
            # HBM residency stays 1x (only treedef/shapes are needed to
            # rebuild the tree inside the jit)
            self._vars = None
        else:
            self._wshapes = None
            self._weight_args = (self._vars, self._stats)

        # rings allocate lazily on the first push (frame geometry comes
        # from the stream, not the config's dataset table)
        self._ring = None
        self._flow_ring = None
        self._zero_flow = None
        self._n_pushed = 0  # global frames pushed (ring write counter)
        self._v0 = 0  # value of _n_pushed when the current video started
        self._scene = 1
        self.pipeline_depth = int(pipeline_depth)
        self.gray_stream = bool(gray_stream)
        self._pending: deque = deque()  # in-flight (out, boxes, nb, scene)
        self._step = self._build_step()

    # -- constructors ---------------------------------------------------

    @classmethod
    def from_model(cls, model, key=None, **kw) -> "StreamingScorer":
        """Serve a trained VadModel: all trained blocks of its
        (scene, h, w) grid (`key` restricts to one block)."""

        def pack(blk):
            mu_r, sd_r = blk.raw_stats
            of = blk.of_stats
            mu_o, sd_o = of if of is not None else (0.0, 1.0)
            return (
                {"params": blk.params, "batch_stats": blk.batch_stats},
                (mu_r, sd_r, mu_o, sd_o, 0.0 if of is None else 1.0),
            )

        keys = [key] if key is not None else sorted(model.blocks)
        blocks = {k: pack(model.blocks[k]) for k in keys}
        return cls(model.cfg, None, None, blocks=blocks, **kw)

    # -- the jitted per-frame step --------------------------------------

    def _unweight(self, weights):
        """Rebuild (variables, stats) from the step's trailing weight args:
        either the packed single buffer or the (pytree, stats) pair.
        Pure structure manipulation — runs under trace; the slices have
        static offsets so XLA sees plain reshapes."""
        if self._wshapes is None:
            variables, stats = weights
            return variables, stats
        (packed,) = weights
        variables, o = _unflatten_f32(packed, self._wshapes, self._wtree)
        return variables, packed[o:].reshape(self.B, 5)

    def _build_step(self):
        net, P, K = self.net, self.P, self.K
        use_flow = self.use_flow
        w_raw, w_of = self.cfg.model.w_raw, self.cfg.model.w_of
        cdt = self._compute_dtype
        R, R_of = self.R, self.R_of
        gray = self.gray_stream

        def write_frame(ring, frame, slot):
            if gray:
                # cv2.imread replicates gray sources across BGR exactly
                frame = jnp.broadcast_to(
                    frame.reshape(frame.shape[0], frame.shape[1], 1),
                    (frame.shape[0], frame.shape[1], 3),
                )
            return jax.lax.dynamic_update_slice(
                ring, frame[None], (slot, 0, 0, 0)
            )

        def score_from_rings(ring, flow_ring, win, owin,
                             boxes, variables, stats):
            wd = jnp.take(ring, win, axis=0, mode="clip")
            cubes = extract_stc(wd, boxes, P, quantize=True)
            # uint8 round-trip: bit-identical to the offline HBM cube buffer
            x = cube_to_input(cubes, scale=False).astype(jnp.uint8)
            x = x.astype(cdt) / 255.0

            if use_flow:
                owd = jnp.take(flow_ring, owin, axis=0, mode="clip")
                fcubes = extract_stc(owd, boxes, P, quantize=False)
                mag = flow_magnitude(fcubes)
                x_of = cube_to_input(fcubes, scale=False).astype(cdt)
            else:
                mag = jnp.full((K,), jnp.inf, jnp.float32)
                x_of = jnp.zeros(
                    (K, P, P, net.tot_of_num * net.of_channels), cdt
                )

            def block_scores(v, st):
                vc = jax.tree.map(lambda p: p.astype(cdt), v)
                out = net.apply(vc, x, x_of, False)
                err = (out.raw_out - out.raw_tgt).astype(jnp.float32)
                sc = jnp.sum(jnp.square(err), axis=(0, 2, 3, 4))
                score = w_raw * (sc - st[0]) / st[1]
                if use_flow and out.of_out is not None:
                    oerr = (out.of_out - out.of_tgt).astype(jnp.float32)
                    osc = jnp.sum(jnp.square(oerr), axis=(0, 2, 3, 4))
                    # st[4] gates blocks trained without a flow stream
                    # (of_stats None) down to raw-only fusion
                    score = score + st[4] * w_of * (osc - st[2]) / st[3]
                return score

            scores = jax.vmap(block_scores)(variables, stats)  # (B, K)
            # one flat result vector -> the host forces ONE download
            # (scores and mag separately would each pay a tunnel round trip)
            return jnp.concatenate([scores.reshape(-1), mag])

        def one(ring, flow_ring, frame, flow_map, ctrl,
                boxes, variables, stats):
            # ctrl packs every small int argument into ONE host array
            # (slot, of_slot, win[R], owin[R_of]) — one transfer, not four
            slot, of_slot = ctrl[0], ctrl[1]
            win, owin = ctrl[2 : 2 + R], ctrl[2 + R : 2 + R + R_of]
            ring = write_frame(ring, frame, slot)
            if use_flow:
                flow_ring = jax.lax.dynamic_update_slice(
                    flow_ring, flow_map[None], (of_slot, 0, 0, 0)
                )
            out = score_from_rings(
                ring, flow_ring, win, owin, boxes, variables, stats
            )
            return ring, flow_ring, out

        self._one = one  # reused by MultiCameraScorer's scanned tick step
        self._write_frame = write_frame  # reused by FlowStreamingScorer
        self._score_from_rings = score_from_rings

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(ring, flow_ring, frame, flow_map, ctrl, boxes, *weights):
            variables, stats = self._unweight(weights)
            return one(ring, flow_ring, frame, flow_map, ctrl, boxes,
                       variables, stats)

        # micro-batched variant: ONE device call scores k frames (a scan
        # threading the rings), amortizing the per-call relay round trip
        # k-fold — the high-throughput serving mode for high-RTT links
        @partial(jax.jit, donate_argnums=(0, 1))
        def step_many(ring, flow_ring, frames, flow_maps, ctrls,
                      boxes, *weights):
            variables, stats = self._unweight(weights)

            def body(carry, xs):
                r, fr = carry
                f, fm, c, b = xs
                r, fr, out = one(r, fr, f, fm, c, b, variables, stats)
                return (r, fr), out

            (ring, flow_ring), outs = jax.lax.scan(
                body, (ring, flow_ring), (frames, flow_maps, ctrls, boxes)
            )
            return ring, flow_ring, outs

        self._step_many = step_many
        return step

    # -- streaming API --------------------------------------------------

    def start_video(self, scene: int = 1) -> None:
        """Mark a video boundary: context windows never cross it
        (context_range never spans videos, vad_datasets.py:277-354).
        `scene` selects the scene row of the block grid (1-based, the
        reference's scene_idx convention; all-ones for every stock
        dataset)."""
        self._v0 = self._n_pushed
        self._scene = int(scene)

    def push(
        self,
        frame: np.ndarray,
        boxes: np.ndarray,
        flow: Optional[np.ndarray] = None,
    ) -> Optional[float]:
        """Score one frame. `frame` is (H, W, 3) uint8 ((H, W) when
        gray_stream), `boxes` an (n, 4) float xyxy array (n <= max_boxes),
        `flow` the frame's (H, W, 2) flow map (required when the model
        fuses the flow stream — the caller chooses the pairing rule, e.g.
        the reference's flow(t -> t+1) with a one-frame emission delay, or
        a causal flow(t-1 -> t)).

        Returns the frame's score; with pipeline_depth=d, returns the score
        of the frame pushed d calls ago (None while the pipeline fills).

        For a flow-fusing model, flow=None degrades exactly like the
        offline pipeline run without a flow tree (pipeline.extract_cube_set
        with flow_frames=None): the flow stream scores zero cubes and the
        motion-magnitude filter is bypassed (the offline path's 10000.0
        sentinel)."""
        frame = np.asarray(frame, np.uint8)
        if self.gray_stream:
            if frame.ndim == 3:
                frame = frame[..., 0]
        elif frame.ndim != 3:
            raise ValueError("3-channel frame expected (or gray_stream=True)")
        self._ensure_rings(*frame.shape[:2])
        pos = self._n_pushed - self._v0  # position within current video

        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        nb = boxes.shape[0]
        if nb > self.K:
            raise ValueError(f"{nb} boxes > max_boxes={self.K}")
        boxes_pad = np.zeros((self.K, 4), np.float32)
        boxes_pad[:nb] = boxes

        slot = self._n_pushed % self.R
        win = (self._v0 + _predict_window(pos, self.ctx)) % self.R
        skip_mag = False
        if self.use_flow:
            of_slot = self._n_pushed % self.R_of
            owin = (self._v0 + _predict_window(pos, self.ctx_of)) % self.R_of
            if flow is None:
                flow_in = np.zeros(frame.shape[:2] + (2,), np.float32)
                skip_mag = True
            else:
                flow_in = np.asarray(flow, np.float32)
        else:
            of_slot = 0
            owin = np.zeros(self.R_of, np.int64)
            if self._zero_flow is None:
                self._zero_flow = jnp.zeros((1, 1, 2), jnp.float32)
            flow_in = self._zero_flow
        ctrl = np.concatenate(
            [[slot, of_slot], win, owin]
        ).astype(np.int32)

        # host arrays go straight to the jitted call (one dispatch moves
        # them all) instead of paying a jnp.asarray round trip each
        self._ring, self._flow_ring, out = self._step(
            self._ring,
            self._flow_ring,
            frame,
            flow_in,
            ctrl,
            boxes_pad,
            *self._weight_args,
        )
        self._n_pushed += 1
        self._enqueue_result(out)
        self._pending.append((out, boxes_pad, nb, self._scene, skip_mag))
        if len(self._pending) <= self.pipeline_depth:
            return None  # pipeline still filling
        return self._finish(*self._pending.popleft())

    def push_many(
        self,
        frames: np.ndarray,
        boxes_list,
        flows: Optional[np.ndarray] = None,
    ) -> List[float]:
        """Score k consecutive frames of the CURRENT video in ONE device
        call (a compiled scan threading the ring), returning their k
        scores. Amortizes the per-call link round trip k-fold — on a
        high-RTT link this is the robust way to stay real-time (k=4 adds
        160 ms of buffering at 25 fps). Scores are identical to k push()
        calls; the program compiles once per distinct k. All k frames
        must belong to the current video (call start_video between
        batches at video boundaries). Pipelined push() results still in
        flight are unaffected (drain() them separately). flows=None on a
        flow-fusing model degrades like push(flow=None): zero flow cubes,
        motion filter bypassed."""
        frames = np.asarray(frames, np.uint8)
        k = frames.shape[0]
        skip_mag = self.use_flow and flows is None  # offline no-flow-tree
        if self.gray_stream and frames.ndim == 4:
            frames = frames[..., 0]
        self._ensure_rings(*frames.shape[1:3])

        ctrls = np.zeros((k, 2 + self.R + self.R_of), np.int32)
        boxes_pad = np.zeros((k, self.K, 4), np.float32)
        nbs = []
        for j in range(k):
            t = self._n_pushed + j
            pos = t - self._v0
            b = np.asarray(boxes_list[j], np.float32).reshape(-1, 4)
            if b.shape[0] > self.K:
                raise ValueError(f"{b.shape[0]} boxes > max_boxes={self.K}")
            boxes_pad[j, : b.shape[0]] = b
            nbs.append(b.shape[0])
            ctrls[j, 0] = t % self.R
            ctrls[j, 2 : 2 + self.R] = (
                self._v0 + _predict_window(pos, self.ctx)
            ) % self.R
            if self.use_flow:
                ctrls[j, 1] = t % self.R_of
                ctrls[j, 2 + self.R :] = (
                    self._v0 + _predict_window(pos, self.ctx_of)
                ) % self.R_of
        if not self.use_flow:
            flow_in = np.zeros((k, 1, 1, 2), np.float32)
        elif flows is None:
            flow_in = np.zeros((k,) + frames.shape[1:3] + (2,), np.float32)
        else:
            flow_in = np.asarray(flows, np.float32)

        self._ring, self._flow_ring, outs = self._step_many(
            self._ring, self._flow_ring, frames, flow_in, ctrls,
            boxes_pad, *self._weight_args,
        )
        self._n_pushed += k
        outs = np.asarray(outs)  # one download for all k frames
        return [
            self._finish(outs[j], boxes_pad[j], nbs[j], self._scene, skip_mag)
            for j in range(k)
        ]

    def _ensure_rings(self, h: int, w: int) -> None:
        """Lazy ring allocation from the first pushed frame's geometry
        (shared by push and push_many — the rings must be identical
        whichever entry point fills first)."""
        if self._ring is not None:
            return
        self._ring = jnp.zeros((self.R, h, w, 3), jnp.uint8)
        if self.use_flow:
            self._flow_ring = jnp.zeros((self.R_of, h, w, 2), jnp.float32)
        else:
            self._flow_ring = jnp.zeros((1, 1, 1, 2), jnp.float32)

    def _enqueue_result(self, out) -> None:
        """Start the device->host copy of a pipelined step's score vector
        NOW (fire-and-forget) instead of when `_finish` pops it. On the
        remote-relay backend the download is a full link round trip;
        requested at dispatch time it overlaps the next pushes' work, so
        the later np.asarray finds the bytes already local. No-op in
        synchronous mode (depth 0 materializes immediately anyway) or on
        runtimes without the async-copy API."""
        if self.pipeline_depth > 0:
            try:
                out.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass

    def drain(self) -> List[float]:
        """Materialize and return the scores still in flight (stream end)."""
        out = [self._finish(*e) for e in self._pending]
        self._pending.clear()
        return out

    def _finish(self, out, boxes_pad, nb, scene, skip_mag=False) -> float:
        return self._finish_host(
            np.asarray(out), boxes_pad, nb, scene, skip_mag
        )

    def _finish_host(self, out, boxes_pad, nb, scene, skip_mag=False) -> float:
        """Score reduction on an already-downloaded result vector (the
        motion scorer downloads once and splits score + map parts)."""
        smat = out[: self.B * self.K].reshape(self.B, self.K)
        mag = out[self.B * self.K : self.B * self.K + self.K]

        keep = np.zeros(self.K, bool)
        keep[:nb] = True
        keep &= ~degenerate_boxes(boxes_pad)
        if self.use_flow and not skip_mag:
            keep &= mag > self.cfg.fore.motion_thr

        # host-side grid routing (test.py:282-310): each kept box scores
        # under the block(s) its cell routes to; untrained cell -> anomaly.
        # Cell geometry is route_hw (the extraction spec's), exactly like
        # the offline paths (pipeline.py h_step = spec.frame_h / h_block) —
        # routing by the live stream size would diverge from offline scores
        # whenever the pushed frames differ from the spec's geometry
        # (run_test explicitly supports such workspaces)
        fc = self.cfg.fore
        h_step = self.route_hw[0] / fc.h_block
        w_step = self.route_hw[1] / fc.w_block
        best = None
        for k in np.nonzero(keep)[0]:
            b = boxes_pad[k]
            for (hc, wc) in calc_block_idx(
                b[0], b[2], b[1], b[3], h_step, w_step, fc.test_block_mode
            ):
                i = self._kidx.get((scene - 1, hc, wc))
                cand = self.big_number if i is None else float(smat[i, k])
                best = cand if best is None else max(best, cand)
        return -self.big_number if best is None else best


class MultiCameraScorer(StreamingScorer):
    """Fleet serving: C concurrent camera streams scored in ONE device
    call per tick (one frame from each camera).

    Where `StreamingScorer.push_many` batches k frames of one stream
    through a sequential `lax.scan` (each frame's ring write feeds the
    next window), a multi-camera tick scans over the CAMERA axis with
    each camera's ring threaded independently (no cross-camera
    dependency): the host pays one dispatch + one result download for
    the whole fleet, and the per-frame device cost equals the proven
    single-stream step's. Latency-wise this beats push_many for live
    fleets: k-batching one stream buffers k frame intervals, while a
    fleet tick batches ACROSS streams at the natural frame rate with no
    added buffering.

    State is the single-camera design with a leading camera axis: frame
    ring (C, R, H, W, 3), flow ring (C, R_of, H, W, 2), per-camera video
    start/scene. All cameras share one frame geometry (fixed shapes are
    what make the step compile once); run one scorer per geometry group
    for a mixed fleet. Every camera contributes a frame every tick — for
    a dropped frame, re-push the camera's previous frame with its boxes
    (the ring then holds the same context an offline run of that
    duplicated-frame video would).

    Scores are exactly `StreamingScorer.push` per camera
    (tests/test_serve.py::test_multicamera_matches_single).

    Usage:
        scorer = MultiCameraScorer.from_model(model, n_cameras=8)
        scorer.start_video()                  # all cameras, scene 1
        scorer.start_video(camera=3, scene=2) # camera 3 cuts to a new video
        for frames, boxes in fleet_feed:      # frames (C, H, W, 3)
            scores = scorer.push_tick(frames, boxes)   # C scores

    Pass `mesh=` (a 1-D device mesh) to shard the fleet over chips: each
    device serves C / n_devices cameras with zero collectives per tick
    (cameras are independent), so fleet capacity scales linearly over ICI
    while the host still pays one dispatch + one download per tick.
    """

    def __init__(self, cfg, variables=None, stats=None, *, n_cameras,
                 mesh=None, **kw):
        """mesh: a 1-D jax.sharding.Mesh to shard the fleet over: each
        device serves C / n_devices cameras (rings, frames, ctrl and box
        tensors sharded on the camera axis; weights replicated). The
        per-device program is the proven single-device camera scan over
        its local cameras — cameras are independent, so the tick needs
        ZERO collectives and scales linearly over ICI. Ignored for a
        1-device mesh (sharding annotations on a single device measurably
        slow the scan — CLAUDE.md)."""
        self.C, self._n_shards = _fleet_arity(n_cameras, mesh)
        self.mesh = mesh
        super().__init__(cfg, variables, stats, **kw)
        self._cam_v0 = np.zeros(self.C, np.int64)
        self._cam_scene = np.ones(self.C, np.int64)
        self._tick = 0

        one = self._one

        # Formulation matters here: `vmap(one)` over the camera axis
        # measured 67.4 ms/tick on hardware where this `lax.scan` over the
        # camera axis (rings threaded as per-iteration xs/ys, not carry —
        # cameras are independent) runs the identical work in 13.8 ms,
        # matching push_many's scan body cost exactly. XLA compiles the
        # scan body once at the single-camera shapes it already handles
        # well; the batched-vmap program lowers the ring update/gather and
        # crop-resize einsums into a far slower fused form.
        def tick(ring, flow_ring, frames, flow_maps, ctrls,
                 boxes, *weights):
            variables, stats = self._unweight(weights)

            def body(_, xs):
                r, fr, f, fm, c, b = xs
                r, fr, out = one(r, fr, f, fm, c, b, variables, stats)
                return (), (r, fr, out)

            _, (ring, flow_ring, outs) = jax.lax.scan(
                body, (), (ring, flow_ring, frames, flow_maps, ctrls, boxes)
            )
            return ring, flow_ring, outs

        if self._n_shards > 1:
            tick = _shard_over_cameras(
                tick, self.mesh, 6, len(self._weight_args)
            )
        self._step_tick = partial(jax.jit, donate_argnums=(0, 1))(tick)

    # -- per-camera stream state ---------------------------------------

    def start_video(self, camera: Optional[int] = None, *,
                    scene: int = 1) -> None:
        """Mark a video boundary on one camera (or every camera when
        `camera` is None): its context windows never cross the boundary.
        `scene` selects the camera's scene row of the block grid
        (1-based, as StreamingScorer.start_video)."""
        if camera is None:
            self._cam_v0[:] = self._tick
            self._cam_scene[:] = int(scene)
        else:
            self._cam_v0[camera] = self._tick
            self._cam_scene[camera] = int(scene)

    def push(self, *a, **kw):
        raise NotImplementedError(
            "MultiCameraScorer scores per tick; use push_tick "
            "(or a StreamingScorer for a single stream)"
        )

    push_many = push

    # -- the fleet tick -------------------------------------------------

    def push_tick(
        self,
        frames: np.ndarray,
        boxes_list,
        flows: Optional[np.ndarray] = None,
    ) -> Optional[List[float]]:
        """Score one frame from each of the C cameras in one device call.

        frames: (C, H, W, 3) uint8 ((C, H, W) when gray_stream);
        boxes_list: per camera an (n_c, 4) float xyxy array;
        flows: optional (C, H, W, 2) per-camera flow maps — None on a
        flow-fusing model degrades per camera exactly like
        StreamingScorer.push(flow=None).

        Returns the C frame scores (ordered by camera); with
        pipeline_depth=d, returns the scores of the tick pushed d calls
        ago (None while the pipeline fills; drain() at stream end)."""
        frames = np.asarray(frames, np.uint8)
        if frames.shape[0] != self.C:
            raise ValueError(
                f"expected {self.C} camera frames, got {frames.shape[0]}"
            )
        skip_mag = self.use_flow and flows is None
        if self.gray_stream and frames.ndim == 4:
            frames = frames[..., 0]
        self._ensure_rings(*frames.shape[1:3])

        ctrls = np.zeros((self.C, 2 + self.R + self.R_of), np.int32)
        boxes_pad = np.zeros((self.C, self.K, 4), np.float32)
        nbs = []
        for c in range(self.C):
            pos = self._tick - self._cam_v0[c]
            b = np.asarray(boxes_list[c], np.float32).reshape(-1, 4)
            if b.shape[0] > self.K:
                raise ValueError(f"{b.shape[0]} boxes > max_boxes={self.K}")
            boxes_pad[c, : b.shape[0]] = b
            nbs.append(b.shape[0])
            ctrls[c, 0] = self._tick % self.R
            ctrls[c, 2 : 2 + self.R] = (
                self._cam_v0[c] + _predict_window(pos, self.ctx)
            ) % self.R
            if self.use_flow:
                ctrls[c, 1] = self._tick % self.R_of
                ctrls[c, 2 + self.R :] = (
                    self._cam_v0[c] + _predict_window(pos, self.ctx_of)
                ) % self.R_of
        if not self.use_flow:
            flow_in = np.zeros((self.C, 1, 1, 2), np.float32)
        elif flows is None:
            flow_in = np.zeros(
                (self.C,) + frames.shape[1:3] + (2,), np.float32
            )
        else:
            flow_in = np.asarray(flows, np.float32)

        self._ring, self._flow_ring, outs = self._step_tick(
            self._ring, self._flow_ring, frames, flow_in, ctrls,
            boxes_pad, *self._weight_args,
        )
        self._tick += 1
        self._enqueue_result(outs)
        self._pending.append(
            (outs, boxes_pad, nbs, self._cam_scene.copy(), skip_mag)
        )
        if len(self._pending) <= self.pipeline_depth:
            return None  # pipeline still filling
        return self._finish_tick(*self._pending.popleft())

    def _ensure_rings(self, h: int, w: int) -> None:
        if self._ring is not None:
            return
        of_shape = (
            (self.C, self.R_of, h, w, 2) if self.use_flow
            else (self.C, 1, 1, 1, 2)
        )
        self._ring, self._flow_ring = _alloc_camera_rings(
            self.C, self.R, h, w, of_shape, self.mesh, self._n_shards
        )

    def drain(self) -> List[List[float]]:
        """Materialize the tick scores still in flight (stream end)."""
        out = [self._finish_tick(*e) for e in self._pending]
        self._pending.clear()
        return out

    def _finish_tick(self, outs, boxes_pad, nbs, scenes,
                     skip_mag) -> List[float]:
        outs = np.asarray(outs)  # ONE download for the whole fleet's tick
        return [
            self._finish(
                outs[c], boxes_pad[c], nbs[c], int(scenes[c]), skip_mag
            )
            for c in range(self.C)
        ]


class FlowStreamingScorer(StreamingScorer):
    """Live two-stream serving: optical flow is computed ON DEVICE from
    the frame ring and fused into the same per-frame device call — a raw
    camera feed serves a flow-fusing model with no precomputed flow tree.
    The reference cannot do this at all: its pipeline requires a full
    offline calc_optical_flow.py pass writing .npy files before test.py
    can score (calc_optical_flow.py:25-85).

    Scores are EXACTLY the offline pipeline's, because the reference's
    flow-pair rule is reproduced frame-for-frame (flow.driver
    .flow_pair_indices semantics):

      flow[0]     = net(f0, f0)      (the boundary picks the degenerate
                                      pair — near-zero flow from a
                                      trained net, but COMPUTED, not
                                      literal zeros)
      flow[t]     = flow(t -> t+1)   for 0 < t < N-1
      flow[N-1]   = flow(N-2 -> N-1)

    flow[t] needs frame t+1, so frame t's score emerges one push later
    ("flow lag"): push(f_0) returns frame 0's score immediately (its
    pair is (f0, f0) — available at once), push(f_u) returns frame u-1's
    score (None at u=1: frame 0 was already emitted and frame 1 waits
    for f_2), and end_video() flushes the last frame. One fused device
    call per push: ring write + FlowNet forward at the driver's resize
    protocol (512x384 default, no magnitude rescale) + STC extraction +
    ensemble scoring; the flow map never leaves HBM. Composes with
    pipeline_depth like the base class.

    The flow net rides the same packed-weight marshaling as the block
    weights (FlowNet2's ~650 MB pytree is ~230 leaves — one buffer
    handle instead).

    Usage:
        scorer = FlowStreamingScorer.from_model(
            model, flow_net=flownet2, flow_variables=fvars)
        for video in feed:
            scorer.start_video()
            for frame, boxes in video:
                s = scorer.push(frame, boxes)   # score of previous frame
            tail = scorer.end_video()           # last frame's score
    """

    def __init__(self, cfg, variables=None, stats=None, *, flow_net,
                 flow_variables, flow_model_hw=(384, 512),
                 flow_compute_dtype=jnp.float32, **kw):
        """flow_compute_dtype: dtype of the FlowNet forward (weights cast
        once at construction, activations per call; the resulting flow
        map returns to float32 before the ring write and scoring). The
        completion ensemble's tiny convs don't profit from bf16
        (CLAUDE.md measurement) but FlowNet2's 384x512 convs are
        MXU-sized — bf16 here targets the step's dominant compute.
        Scores shift by the flow quantization; default stays float32."""
        if not cfg.model.use_flow:
            raise ValueError(
                "FlowStreamingScorer serves two-stream models; "
                "use StreamingScorer for raw-only (use_flow=False)"
            )
        super().__init__(cfg, variables, stats, **kw)
        self.flow_net = flow_net
        self._flow_hw = tuple(flow_model_hw)
        self._flow_dtype = flow_compute_dtype
        if flow_compute_dtype != jnp.float32:
            flow_variables = jax.tree.map(
                lambda l: jnp.asarray(l, flow_compute_dtype), flow_variables
            )
        packed, self._fshapes, self._ftree = _pack_f32(
            flow_variables, dtype=flow_compute_dtype
        )
        self._flow_arg = packed if packed is not None else flow_variables
        self._step_flow = self._build_flow_step()
        self._last = None  # (frame, boxes_pad, nb) of the newest push
        self._first = None  # first frame of the current video (N=2 tail)
        self._video_closed = True
        # the step writes frame u BEFORE scoring frame u-1, whose raw
        # window still needs f_{u-R} — one extra slot keeps it alive
        self._rlen = self.R + 1

    def _unpack_flow(self, fw):
        if self._fshapes is None:
            return fw
        return _unflatten_f32(fw, self._fshapes, self._ftree)[0]

    def _build_flow_step(self):
        from vec_vad_tpu.flow.driver import resize_bilinear

        R, R_of = self.R, self.R_of
        B, K = self.B, self.K
        write_frame = self._write_frame
        score_from_rings = self._score_from_rings
        fnet = self.flow_net
        mh, mw = self._flow_hw
        fdt = self._flow_dtype

        def one_flow(ring, flow_ring, frame, ctrl, boxes,
                     fvars, variables, stats):
            slot, prev_slot = ctrl[0], ctrl[1]
            of_slot, wflag = ctrl[2], ctrl[3]
            win = ctrl[4 : 4 + R]
            owin = ctrl[4 + R : 4 + R + R_of]

            ring = write_frame(ring, frame, slot)
            H, W = ring.shape[1], ring.shape[2]

            def live(fr):
                pair = jnp.stack(
                    [jnp.take(ring, prev_slot, axis=0, mode="clip"),
                     jnp.take(ring, slot, axis=0, mode="clip")]
                )  # (2, H, W, 3) uint8
                # the driver's protocol exactly (flow/driver.py
                # run_chunk): cv2-parity resize to model_hw, forward,
                # resize back WITHOUT magnitude rescaling
                pr = resize_bilinear(pair, mh, mw).astype(fdt)
                flow = fnet.apply(fvars, pr[None]).astype(jnp.float32)
                flow = resize_bilinear(flow, H, W)[0]  # (H, W, 2)
                fr = jax.lax.dynamic_update_slice(
                    fr, flow[None], (of_slot, 0, 0, 0)
                )
                return fr, score_from_rings(
                    ring, fr, win, owin, boxes, variables, stats
                )

            def skip(fr):
                # the u=1 push only advances the rings: flow(0->1) is
                # used by no frame (flow[0] stays net(f0, f0)) and its
                # score is discarded — skip the whole FlowNet + ensemble.
                # (+ 0*fr[...] marks the constant as mesh-axis-varying so
                # the branch types match the live one under shard_map)
                return fr, jnp.zeros(
                    (B * K + K,), jnp.float32
                ) + 0.0 * fr[0, 0, 0, 0]

            # wflag=1 exactly when the result is consumed
            flow_ring, out = jax.lax.cond(wflag > 0, live, skip, flow_ring)
            return ring, flow_ring, out

        self._one_flow = one_flow  # reused by MultiCameraFlowScorer

        @partial(jax.jit, donate_argnums=(0, 1))
        def step_flow(ring, flow_ring, frame, ctrl, boxes, fw, *weights):
            variables, stats = self._unweight(weights)
            fvars = self._unpack_flow(fw)
            return one_flow(ring, flow_ring, frame, ctrl, boxes,
                            fvars, variables, stats)

        # micro-batched variant (the live-flow analog of the base class's
        # step_many): ONE device call advances k frames, each scoring its
        # predecessor — amortizes the per-call relay round trip k-fold
        @partial(jax.jit, donate_argnums=(0, 1))
        def step_flow_many(ring, flow_ring, frames, ctrls, boxes,
                           fw, *weights):
            variables, stats = self._unweight(weights)
            fvars = self._unpack_flow(fw)

            def body(carry, xs):
                r, fr = carry
                f, c, b = xs
                r, fr, out = one_flow(r, fr, f, c, b, fvars, variables,
                                      stats)
                return (r, fr), out

            (ring, flow_ring), outs = jax.lax.scan(
                body, (ring, flow_ring), (frames, ctrls, boxes)
            )
            return ring, flow_ring, outs

        self._step_flow_many = step_flow_many
        return step_flow

    # -- streaming API ---------------------------------------------------

    def start_video(self, scene: int = 1) -> None:
        if self._n_pushed > self._v0 and not self._video_closed:
            raise ValueError(
                "end_video() must flush the previous video before "
                "start_video() (the last frame's score is still pending)"
            )
        super().start_video(scene)
        self._video_closed = False
        self._last = None

    def _norm_frame(self, frame: np.ndarray) -> np.ndarray:
        frame = np.asarray(frame, np.uint8)
        if self.gray_stream:
            if frame.ndim == 3:
                frame = frame[..., 0]
        elif frame.ndim != 3:
            raise ValueError("3-channel frame expected (or gray_stream=True)")
        return frame

    def _pad_boxes(self, boxes) -> Tuple[np.ndarray, int]:
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        nb = boxes.shape[0]
        if nb > self.K:
            raise ValueError(f"{nb} boxes > max_boxes={self.K}")
        boxes_pad = np.zeros((self.K, 4), np.float32)
        boxes_pad[:nb] = boxes
        return boxes_pad, nb

    def _ensure_rings(self, h: int, w: int) -> None:
        if self._ring is not None:
            return
        self._ring = jnp.zeros((self._rlen, h, w, 3), jnp.uint8)
        self._flow_ring = jnp.zeros((self.R_of, h, w, 2), jnp.float32)

    def _flow_ctrl(self, tpos: int, slot: int, prev_slot: int,
                   wflag: int) -> np.ndarray:
        """ctrl for scoring within-video frame `tpos` whose flow pair is
        (prev_slot, slot) in the raw ring."""
        of_slot = (self._v0 + tpos) % self.R_of
        win = (self._v0 + _predict_window(tpos, self.ctx)) % self._rlen
        owin = (self._v0 + _predict_window(tpos, self.ctx_of)) % self.R_of
        return np.concatenate(
            [[slot, prev_slot, of_slot, wflag], win, owin]
        ).astype(np.int32)

    def push(self, frame: np.ndarray, boxes: np.ndarray) -> Optional[float]:
        """Score a frame's PREDECESSOR (see class docstring): returns
        frame u-1's score at push u (frame 0's at push 0, None at push 1
        and while any pipeline_depth fills)."""
        if self._video_closed:
            raise ValueError("call start_video() first")
        pos = self._n_pushed - self._v0
        frame = self._norm_frame(frame)
        boxes_pad, nb = self._pad_boxes(boxes)
        self._ensure_rings(*frame.shape[:2])
        slot = self._n_pushed % self._rlen
        if pos == 0:
            # frame 0's pair is (f0, f0): score it in the same call
            ctrl = self._flow_ctrl(tpos=0, slot=slot, prev_slot=slot, wflag=1)
            sb, snb = boxes_pad, nb
            self._first = frame
        else:
            # score the predecessor with its pair (u-1, u); the u=1 call
            # only advances the rings (frame 0 already emitted, wflag=0)
            ctrl = self._flow_ctrl(
                tpos=pos - 1, slot=slot,
                prev_slot=(self._n_pushed - 1) % self._rlen,
                wflag=1 if pos >= 2 else 0,
            )
            _, sb, snb = self._last
        self._ring, self._flow_ring, out = self._step_flow(
            self._ring, self._flow_ring, frame, ctrl, sb,
            self._flow_arg, *self._weight_args,
        )
        self._n_pushed += 1
        self._last = (frame, boxes_pad, nb)
        if pos == 1:
            return None  # nothing emitted: frame 1 waits for f_2
        self._enqueue_result(out)
        self._pending.append((out, sb, snb, self._scene, False))
        if len(self._pending) <= self.pipeline_depth:
            return None
        return self._finish(*self._pending.popleft())

    def end_video(self) -> Optional[float]:
        """Flush the current video's last frame: its flow pair is only
        known now — flow(N-2 -> N-1) for N >= 3, the degenerate (f0, f0)
        for N = 2 (the tail window of a 2-frame video is still the head
        window [0, 0, 1]; flow.driver.flow_pair_indices). Returns its
        score (or an earlier pending one under pipeline_depth; None for
        an empty/1-frame video where nothing is pending)."""
        if self._video_closed:
            return None
        self._video_closed = True
        n = self._n_pushed - self._v0
        if n < 2:
            return None  # 0 frames, or 1 frame already scored at push 0
        _, boxes_pad, nb = self._last
        g = self._n_pushed - 1
        if n == 2:
            # pair (f0, f0): re-send f0 to its own slot, idempotently
            frame = self._first
            slot = prev_slot = self._v0 % self._rlen
        else:
            # pair (N-2, N-1): re-send the last frame to its own slot
            frame = self._last[0]
            slot = g % self._rlen
            prev_slot = (g - 1) % self._rlen
        ctrl = self._flow_ctrl(
            tpos=n - 1, slot=slot, prev_slot=prev_slot, wflag=1
        )
        self._ring, self._flow_ring, out = self._step_flow(
            self._ring, self._flow_ring, frame, ctrl, boxes_pad,
            self._flow_arg, *self._weight_args,
        )
        self._enqueue_result(out)
        self._pending.append((out, boxes_pad, nb, self._scene, False))
        if len(self._pending) <= self.pipeline_depth:
            return None
        return self._finish(*self._pending.popleft())

    def push_many(self, frames, boxes_list) -> List[float]:
        """Micro-batched live-flow: ONE device call advances k frames of
        the CURRENT video (no start_video between them), each scoring
        its predecessor with the usual one-push lag. Returns the scores
        emitted by this call, in frame order: k steady-state, k-1 at a
        video's FIRST batch (frame 0 emits immediately, the batch's last
        frame stays pending), fewer while pipeline_depth fills —
        end_video() still flushes the final frame. Buffers k frame
        intervals; use push() for latency-critical streams."""
        if self._video_closed:
            raise ValueError("call start_video() first")
        frames = np.asarray(frames, np.uint8)
        if self.gray_stream:
            if frames.ndim == 4:
                frames = frames[..., 0]
        elif frames.ndim != 4:
            raise ValueError("(k, H, W, 3) frames expected "
                             "(or gray_stream=True)")
        k = frames.shape[0]
        if k == 0:
            return []
        self._ensure_rings(*frames.shape[1:3])

        ctrls = np.zeros((k, 4 + self.R + self.R_of), np.int32)
        sboxes = np.zeros((k, self.K, 4), np.float32)
        emits = []
        prev = self._last
        for j in range(k):
            g = self._n_pushed + j
            pos = g - self._v0
            bp, nb = self._pad_boxes(boxes_list[j])
            slot = g % self._rlen
            if pos == 0:
                ctrls[j] = self._flow_ctrl(0, slot, slot, 1)
                sb, snb = bp, nb
                self._first = frames[j]
            else:
                ctrls[j] = self._flow_ctrl(
                    pos - 1, slot, (g - 1) % self._rlen,
                    1 if pos >= 2 else 0,
                )
                _, sb, snb = prev
            sboxes[j] = sb
            emits.append((pos != 1, sb, snb))
            prev = (frames[j], bp, nb)
        self._last = prev

        self._ring, self._flow_ring, outs = self._step_flow_many(
            self._ring, self._flow_ring, frames, ctrls, sboxes,
            self._flow_arg, *self._weight_args,
        )
        self._n_pushed += k
        outs = np.asarray(outs)  # one download for all k frames
        scores = []
        for j, (emit, sb, snb) in enumerate(emits):
            if not emit:
                continue
            self._pending.append((outs[j], sb, snb, self._scene, False))
            if len(self._pending) > self.pipeline_depth:
                scores.append(self._finish(*self._pending.popleft()))
        return scores


class MultiCameraFlowScorer(FlowStreamingScorer):
    """Fleet serving with LIVE on-device flow: C tick-synchronized camera
    streams, each frame's flow computed from its camera's ring inside ONE
    device call per tick (the flow-fused per-frame body scanned over the
    camera axis; `mesh=` shards cameras over devices with zero
    collectives, as MultiCameraScorer).

    Emission follows FlowStreamingScorer's flow lag per tick: tick 0
    returns every camera's frame-0 score (degenerate (f0, f0) pairs),
    tick 1 returns None, tick u returns the frame u-1 scores, and
    end_video() flushes the last frames.

    Camera streams share fleet-wide video boundaries (start_video /
    end_video cut ALL cameras): the tick-synchronized fleet pattern is
    continuous streams started and stopped together. For per-camera
    mid-stream video cuts, serve that camera with its own
    FlowStreamingScorer.
    """

    def __init__(self, cfg, variables=None, stats=None, *, n_cameras,
                 mesh=None, **kw):
        self.C, self._n_shards = _fleet_arity(n_cameras, mesh)
        self.mesh = mesh
        super().__init__(cfg, variables, stats, **kw)
        self._cam_scene = np.ones(self.C, np.int64)
        self._tick = 0
        self._tick_v0 = 0
        self._first_frames = None
        self._last_tick = None  # (frames, boxes_pad, nbs) of newest tick

        one_flow = self._one_flow

        def tick_flow(ring, flow_ring, frames, ctrls, boxes, fw, *weights):
            variables, stats = self._unweight(weights)
            fvars = self._unpack_flow(fw)

            def body(_, xs):
                r, fr, f, c, b = xs
                r, fr, out = one_flow(r, fr, f, c, b, fvars, variables,
                                      stats)
                return (), (r, fr, out)

            _, (ring, flow_ring, outs) = jax.lax.scan(
                body, (), (ring, flow_ring, frames, ctrls, boxes)
            )
            return ring, flow_ring, outs

        if self._n_shards > 1:
            tick_flow = _shard_over_cameras(
                tick_flow, self.mesh, 5, 1 + len(self._weight_args)
            )
        self._tick_flow = partial(jax.jit, donate_argnums=(0, 1))(tick_flow)

    def _ensure_rings(self, h: int, w: int) -> None:
        if self._ring is not None:
            return
        self._ring, self._flow_ring = _alloc_camera_rings(
            self.C, self._rlen, h, w, (self.C, self.R_of, h, w, 2),
            self.mesh, self._n_shards,
        )

    # -- fleet stream state ----------------------------------------------

    def start_video(self, scene=1) -> None:
        """Start a fleet-wide video on every camera; `scene` is an int or
        a per-camera sequence selecting block-grid scene rows."""
        if self._tick > self._tick_v0 and not self._video_closed:
            raise ValueError(
                "end_video() must flush the previous videos before "
                "start_video()"
            )
        self._tick_v0 = self._tick
        self._cam_scene[:] = np.asarray(scene, np.int64)
        self._video_closed = False
        self._first_frames = None

    def push(self, *a, **kw):
        raise NotImplementedError("MultiCameraFlowScorer scores per tick; "
                                  "use push_tick")

    # guard: the inherited single-camera push_many would run against the
    # fleet's (C, ...) rings and per-tick state and fail confusingly
    push_many = push

    def _norm_frames(self, frames) -> np.ndarray:
        frames = np.asarray(frames, np.uint8)
        if frames.shape[0] != self.C:
            raise ValueError(
                f"expected {self.C} camera frames, got {frames.shape[0]}"
            )
        if self.gray_stream:
            if frames.ndim == 4:
                frames = frames[..., 0]
        elif frames.ndim != 4:
            raise ValueError("(C, H, W, 3) frames expected "
                             "(or gray_stream=True)")
        return frames

    def _pad_boxes_tick(self, boxes_list):
        boxes_pad = np.zeros((self.C, self.K, 4), np.float32)
        nbs = []
        for c in range(self.C):
            b = np.asarray(boxes_list[c], np.float32).reshape(-1, 4)
            if b.shape[0] > self.K:
                raise ValueError(f"{b.shape[0]} boxes > max_boxes={self.K}")
            boxes_pad[c, : b.shape[0]] = b
            nbs.append(b.shape[0])
        return boxes_pad, nbs

    def _fleet_ctrl(self, tpos, slot, prev_slot, wflag) -> np.ndarray:
        """Tick ctrl rows: identical slot math for every camera (the
        fleet is tick-synchronized), tiled to (C, len)."""
        v0 = self._tick_v0
        of_slot = (v0 + tpos) % self.R_of
        win = (v0 + _predict_window(tpos, self.ctx)) % self._rlen
        owin = (v0 + _predict_window(tpos, self.ctx_of)) % self.R_of
        row = np.concatenate(
            [[slot, prev_slot, of_slot, wflag], win, owin]
        ).astype(np.int32)
        return np.tile(row, (self.C, 1))

    def _emit(self, outs, boxes_pad, nbs, scenes):
        self._enqueue_result(outs)
        self._pending.append((outs, boxes_pad, nbs, scenes, False))
        if len(self._pending) <= self.pipeline_depth:
            return None
        return self._finish_tick(*self._pending.popleft())

    def push_tick(self, frames, boxes_list) -> Optional[List[float]]:
        """Score one frame per camera; returns the PREVIOUS tick's C
        scores (this tick's at tick 0; None at tick 1 and while any
        pipeline_depth fills)."""
        if self._video_closed:
            raise ValueError("call start_video() first")
        pos = self._tick - self._tick_v0
        frames = self._norm_frames(frames)
        boxes_pad, nbs = self._pad_boxes_tick(boxes_list)
        self._ensure_rings(*frames.shape[1:3])
        slot = self._tick % self._rlen
        if pos == 0:
            ctrls = self._fleet_ctrl(0, slot, slot, 1)
            sb, snb = boxes_pad, nbs
            self._first_frames = frames
        else:
            ctrls = self._fleet_ctrl(
                pos - 1, slot, (self._tick - 1) % self._rlen,
                1 if pos >= 2 else 0,
            )
            _, sb, snb = self._last_tick
        self._ring, self._flow_ring, outs = self._tick_flow(
            self._ring, self._flow_ring, frames, ctrls, sb,
            self._flow_arg, *self._weight_args,
        )
        self._tick += 1
        self._last_tick = (frames, boxes_pad, nbs)
        if pos == 1:
            return None
        return self._emit(outs, sb, snb, self._cam_scene.copy())

    def end_video(self) -> Optional[List[float]]:
        """Flush every camera's last frame (see FlowStreamingScorer
        .end_video for the tail pair rule)."""
        if self._video_closed:
            return None
        self._video_closed = True
        n = self._tick - self._tick_v0
        if n < 2:
            return None
        _, boxes_pad, nbs = self._last_tick
        g = self._tick - 1
        if n == 2:
            frames = self._first_frames
            slot = prev_slot = self._tick_v0 % self._rlen
        else:
            frames = self._last_tick[0]
            slot = g % self._rlen
            prev_slot = (g - 1) % self._rlen
        ctrls = self._fleet_ctrl(n - 1, slot, prev_slot, 1)
        self._ring, self._flow_ring, outs = self._tick_flow(
            self._ring, self._flow_ring, frames, ctrls, boxes_pad,
            self._flow_arg, *self._weight_args,
        )
        return self._emit(outs, boxes_pad, nbs, self._cam_scene.copy())

    # the fleet drain/download plumbing is identical to the
    # precomputed-flow fleet's
    drain = MultiCameraScorer.drain
    _finish_tick = MultiCameraScorer._finish_tick


class MotionStreamingScorer(StreamingScorer):
    """Self-contained online serving: foreground boxes computed IN the
    per-frame loop from the frame stream itself, by the reference's
    motion-detector recipe (obj_det_with_motion.py:144-223) — so a raw
    camera feed serves with NO precomputed bbox source at all.

    Per push of frame u, ONE fused device call:

      * writes frame u into the ring,
      * computes the binary motion map of frame u-1 (its hard-bordered
        3-frame window [u-2, u-1, u] needs frame u — the same one-push
        lookahead the offline stage has, vad_datasets.py ctx=1 'hard'),
      * scores frame u-2 with the boxes derived from ITS map (host
        contour stage between pushes, fore.motion.motion_bboxes),
      * returns one result vector: block scores + motion magnitudes +
        the map bit-packed 8 pixels/byte (a 240x360 map rides along as
        ~11 KB instead of a separate 86 KB download).

    Scores therefore emerge with a 3-push lag (map -> host contours ->
    boxes -> score -> download, a built-in depth-1 pipeline); end_video()
    flushes the tail with the reference's tail-clamped windows. Scores
    are identical to the offline pipeline run with
    fore.detector.compute_foreground_bboxes motion-mode boxes
    (tests/test_serve.py::test_motion_streaming_matches_offline).

    `push(frame, ap_boxes=...)` optionally merges externally detected
    appearance boxes exactly like the offline stage (they mask the
    motion map and concatenate ahead of the motion boxes); pass boxes
    already filtered/suppressed (filter_detections + del_cover_bboxes).
    """

    def __init__(self, cfg, variables=None, stats=None, *, spec=None, **kw):
        if kw.get("pipeline_depth"):
            raise ValueError(
                "MotionStreamingScorer pipelines internally (the map "
                "harvest is a one-push conveyor); pipeline_depth must be 0"
            )
        super().__init__(cfg, variables, stats, **kw)
        self.spec = spec if spec is not None else cfg.dataset
        # ring must hold the scored frame's full predict window PLUS the
        # two newer frames (u-1, u) the motion lookahead keeps alive
        self._rlen = self.R + 2
        self._of_rlen = (self.R_of + 2) if self.use_flow else 1
        self._step_m = self._build_motion_step()
        self._video_closed = True
        self._reset_video_state()

    # -- state ------------------------------------------------------------

    def _reset_video_state(self) -> None:
        self._boxq: Dict[int, np.ndarray] = {}   # pos -> combined boxes
        self._apq: Dict[int, np.ndarray] = {}    # pos -> caller ap boxes
        self._skipq: Dict[int, bool] = {}        # pos -> flow missing?
        self._flight: deque = deque()  # (out, boxes_pad, nb, scene,
        #                                 skip_mag, scored_pos, mapped_pos)
        self._last_push = None  # (frame, flow_in) for idempotent tail calls

    def start_video(self, scene: int = 1) -> None:
        if self._n_pushed > self._v0 and not self._video_closed:
            raise ValueError(
                "end_video() must flush the previous video before "
                "start_video() (tail frames' maps/scores are pending)"
            )
        super().start_video(scene)
        self._video_closed = False
        self._reset_video_state()

    def _ensure_rings(self, h: int, w: int) -> None:
        if self._ring is not None:
            return
        self._ring = jnp.zeros((self._rlen, h, w, 3), jnp.uint8)
        if self.use_flow:
            self._flow_ring = jnp.zeros(
                (self._of_rlen, h, w, 2), jnp.float32
            )
        else:
            self._flow_ring = jnp.zeros((1, 1, 1, 2), jnp.float32)
        self._hw = (h, w)
        self._wp = -(-w // 8) * 8  # map row padded to whole bytes

    # -- the fused step ---------------------------------------------------

    def _build_motion_step(self):
        one = self._one
        R, R_of = self.R, self.R_of
        gk = int(self.spec.mt_gauss_mask_size)
        bthr = int(self.spec.mt_binary_thr)

        from vec_vad_tpu.fore.motion import motion_maps

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(ring, flow_ring, frame, flow_map, ctrl, boxes, *weights):
            variables, stats = self._unweight(weights)
            base = ctrl[: 2 + R + R_of]
            mwin = ctrl[2 + R + R_of : 5 + R + R_of]
            ring, flow_ring, out = one(
                ring, flow_ring, frame, flow_map, base, boxes,
                variables, stats,
            )
            wd = jnp.take(ring, mwin, axis=0, mode="clip")  # (3, H, W, C) uint8
            mp = motion_maps(wd[None], gk, bthr)[0]  # (H, W) bool
            H, W = mp.shape
            wp = -(-W // 8) * 8
            bits = jnp.pad(mp, ((0, 0), (0, wp - W))).reshape(H, wp // 8, 8)
            weights8 = jnp.array(
                [128, 64, 32, 16, 8, 4, 2, 1], jnp.float32
            )  # np.unpackbits' big-endian bit order
            packed = jnp.sum(bits.astype(jnp.float32) * weights8, axis=-1)
            return ring, flow_ring, jnp.concatenate(
                [out, packed.reshape(-1)]
            )

        return step

    # -- streaming API ----------------------------------------------------

    def push(self, frame: np.ndarray, ap_boxes=None,
             flow: Optional[np.ndarray] = None) -> Optional[float]:
        """Feed frame u; returns the score of frame u-3 (None while the
        conveyor fills — end_video() flushes the tail). `ap_boxes`:
        optional pre-filtered appearance boxes for THIS frame (merged
        with its motion boxes like the offline obj_det_with_motion
        stage); `flow` as in StreamingScorer.push."""
        if self._video_closed:
            raise ValueError("call start_video() first")
        frame = self._norm_motion_frame(frame)
        self._ensure_rings(*frame.shape[:2])
        pos = self._n_pushed - self._v0
        self._apq[pos] = (
            np.zeros((0, 4), np.float32)
            if ap_boxes is None
            else np.asarray(ap_boxes, np.float32).reshape(-1, 4)
        )
        # harvest the previous call FIRST: it carries the map of frame
        # pos-1 whose host contour stage yields... the boxes a later push
        # scores with — and for this push, boxes of frame pos-2 (set by
        # the harvest at push pos-1). Its download was requested at
        # dispatch (copy_to_host_async), so the bytes are usually local.
        ret = None
        while self._flight:
            r = self._harvest(self._flight.popleft())
            if r is not None:
                ret = r
        self._dispatch(frame, flow, pos, scored=pos - 2,
                       mapped=pos - 1, tail_hint=None)
        return ret

    def end_video(self) -> List[float]:
        """Flush the current video: compute the tail frames' maps with
        their now-known tail-clamped windows ([n-2, n-1, n-1] for the
        last frame, [0, 0, 0] for a 1-frame video) and emit every
        pending score, in frame order."""
        if self._video_closed:
            return []
        self._video_closed = True
        n = self._n_pushed - self._v0
        if n == 0:
            return []
        emits: List[float] = []
        while self._flight:
            r = self._harvest(self._flight.popleft())
            if r is not None:
                emits.append(r)
        frame, flow_in = self._last_push
        for t in range(max(n - 2, 0), n):
            if t not in self._boxq:
                # map-only call for t with its tail-clamped window
                self._dispatch(frame, flow_in, n - 1, scored=-1,
                               mapped=t, tail_hint=n, redispatch=True)
                self._harvest(self._flight.popleft())
            nxt = t + 1 if (t + 1 < n and t + 1 not in self._boxq) else -1
            self._dispatch(frame, flow_in, n - 1, scored=t,
                           mapped=nxt, tail_hint=n, redispatch=True)
            r = self._harvest(self._flight.popleft())
            assert r is not None
            emits.append(r)
        return emits

    def drain(self) -> List[float]:
        """Alias for the flush; prefer end_video()."""
        return self.end_video()

    # -- internals ---------------------------------------------------------

    def _norm_motion_frame(self, frame: np.ndarray) -> np.ndarray:
        frame = np.asarray(frame, np.uint8)
        if self.gray_stream:
            if frame.ndim == 3:
                frame = frame[..., 0]
        elif frame.ndim != 3:
            raise ValueError("3-channel frame expected (or gray_stream=True)")
        return frame

    def _dispatch(self, frame, flow, pos, scored, mapped, tail_hint,
                  redispatch=False):
        """One device call: write `frame` (slot of push index `pos`;
        idempotent rewrite when redispatch), score frame `scored` (<0 =
        dummy), compute the motion map of frame `mapped` (<0 = dummy).
        tail_hint = video length once known (end_video), for the upper
        window clamp."""
        rlen, orlen = self._rlen, self._of_rlen
        push_idx = self._v0 + pos
        slot = push_idx % rlen

        if scored >= 0:
            bx = self._boxq.pop(scored)
            nb = bx.shape[0]
            if nb > self.K:
                raise ValueError(f"{nb} boxes > max_boxes={self.K}")
            boxes_pad = np.zeros((self.K, 4), np.float32)
            boxes_pad[:nb] = bx
            win = (self._v0 + _predict_window(scored, self.ctx)) % rlen
            skip_mag = self._skipq.pop(scored, not self.use_flow)
        else:
            boxes_pad = np.zeros((self.K, 4), np.float32)
            nb = 0
            win = np.zeros(self.R, np.int64)
            skip_mag = True

        if mapped >= 0:
            hi = (tail_hint - 1) if tail_hint is not None else mapped + 1
            mwin = (
                self._v0
                + np.array(
                    [max(mapped - 1, 0), mapped, min(mapped + 1, hi)]
                )
            ) % rlen
        else:
            mwin = np.zeros(3, np.int64)

        if self.use_flow:
            of_slot = push_idx % orlen
            owin = (
                self._v0 + _predict_window(max(scored, 0), self.ctx_of)
            ) % orlen
            if redispatch:
                flow_in = flow  # the stored last flow_in, rewritten
            elif flow is None:
                flow_in = np.zeros(frame.shape[:2] + (2,), np.float32)
                self._skipq[pos] = True
            else:
                flow_in = np.asarray(flow, np.float32)
                self._skipq[pos] = False
        else:
            of_slot = 0
            owin = np.zeros(self.R_of, np.int64)
            if self._zero_flow is None:
                self._zero_flow = jnp.zeros((1, 1, 2), jnp.float32)
            flow_in = self._zero_flow

        ctrl = np.concatenate(
            [[slot, of_slot], win, owin, mwin]
        ).astype(np.int32)
        self._ring, self._flow_ring, out = self._step_m(
            self._ring, self._flow_ring, frame, flow_in, ctrl, boxes_pad,
            *self._weight_args,
        )
        if not redispatch:
            self._n_pushed += 1
            self._last_push = (frame, flow_in)
        try:
            out.copy_to_host_async()  # harvest comes next push
        except (AttributeError, NotImplementedError):
            pass
        self._flight.append(
            (out, boxes_pad, nb, self._scene, skip_mag, scored, mapped)
        )
        return out

    def _harvest(self, entry) -> Optional[float]:
        from vec_vad_tpu.fore.motion import motion_bboxes

        out, boxes_pad, nb, scene, skip_mag, scored, mapped = entry
        arr = np.asarray(out)
        if mapped >= 0:
            h, w = self._hw
            tail = arr[self.B * self.K + self.K :]
            m = np.unpackbits(
                np.asarray(tail, np.float32)
                .astype(np.uint8)
                .reshape(h, self._wp // 8),
                axis=1,
            )[:, :w].astype(bool)
            ap = self._apq.pop(mapped, np.zeros((0, 4), np.float32))
            mt = motion_bboxes(
                m, ap if ap.shape[0] else None,
                self.spec.mt_area_thr, self.spec.mt_extend,
            )
            self._boxq[mapped] = (
                np.concatenate([ap, mt.astype(np.float32)], axis=0)
                if mt.shape[0] > 0
                else ap
            )
        if scored >= 0:
            return self._finish_host(arr, boxes_pad, nb, scene, skip_mag)
        return None
