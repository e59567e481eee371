"""Live-flow serving: optical flow computed ON DEVICE inside the
per-frame call — single stream and fleet variants (see the package
docstring in serve/__init__.py)."""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vec_vad_tpu.serve._common import (
    _alloc_camera_rings,
    _fleet_arity,
    _pack_f32,
    _predict_window,
    _shard_over_cameras,
    _time_device_chain,
    _unflatten_f32,
)
from vec_vad_tpu.serve.fleet import MultiCameraScorer
from vec_vad_tpu.serve.streaming import StreamingScorer

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
        map returns to float32 before the ring write and scoring).
        Hardware (post warp-fix, PROFILE.md §6): bf16 is ~9% per-frame
        here (74.8 vs 68.6 fps pipelined — the b1 step is dispatch-bound,
        unlike batched calc-flow where bf16 is 1.8x) and halves the
        162.5M-param flow-weight HBM residency. Scores shift by the flow
        quantization; default stays float32."""
        if not cfg.model.use_flow:
            raise ValueError(
                "FlowStreamingScorer serves two-stream models; "
                "use StreamingScorer for raw-only (use_flow=False)"
            )
        super().__init__(cfg, variables, stats, **kw)
        self.flow_net = flow_net
        self._flow_hw = tuple(flow_model_hw)
        self._flow_dtype = flow_compute_dtype
        from ..flow.driver import cast_flow_variables

        flow_variables = cast_flow_variables(flow_variables, flow_compute_dtype)
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

    def time_device_step(
        self, frame: np.ndarray, boxes: np.ndarray,
        k: int = 16, repeats: int = 3,
    ) -> float:
        """Device-time twin of the live-flow push(): same protocol as
        StreamingScorer.time_device_step (args pre-staged in HBM, k
        chained executions through the donated rings, one download), for
        the fused flow+score step — overridden because step_flow's
        signature carries the flow weights instead of a flow-map input.
        Runs on ring copies — serving state is untouched."""
        frame = self._norm_frame(frame)
        boxes_pad, _ = self._pad_boxes(boxes)
        self._ensure_rings(*frame.shape[:2])
        pos = max(self._n_pushed - self._v0, 2)
        ctrl = self._flow_ctrl(
            tpos=pos - 1, slot=self._n_pushed % self._rlen,
            prev_slot=(self._n_pushed - 1) % self._rlen, wflag=1,
        )
        staged = [jax.device_put(a) for a in (frame, ctrl, boxes_pad)]
        jax.block_until_ready(staged)
        best = _time_device_chain(
            lambda r, fr: self._step_flow(
                r, fr, *staged, self._flow_arg, *self._weight_args
            ),
            (self._ring, self._flow_ring), k, repeats,
        )
        return best

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

    def time_device_step(self, *a, **kw):
        raise NotImplementedError(
            "MultiCameraFlowScorer times per tick; use time_device_tick "
            "(the inherited single-camera twin would run against the "
            "fleet's (C, ...) rings)"
        )

    def time_device_tick(
        self, frames, boxes_list, k: int = 8, repeats: int = 3,
    ) -> float:
        """Device-time twin of the live-flow fleet tick: ms/tick for the
        jitted camera-scan step alone (C ring writes + C FlowNet
        forwards + C ensemble scores), args pre-staged in HBM, k
        executions chained through the donated rings
        (serve/_common._time_device_chain protocol, as
        MultiCameraScorer.time_device_tick). Runs on ring copies —
        the fleet's serving state is untouched."""
        frames = self._norm_frames(frames)
        boxes_pad, _ = self._pad_boxes_tick(boxes_list)
        self._ensure_rings(*frames.shape[1:3])
        pos = max(self._tick - self._tick_v0, 2)
        ctrls = self._fleet_ctrl(
            pos - 1, self._tick % self._rlen,
            (self._tick - 1) % self._rlen, 1,
        )
        staged = [jax.device_put(a) for a in (frames, ctrls, boxes_pad)]
        jax.block_until_ready(staged)
        best = _time_device_chain(
            lambda r, fr: self._tick_flow(
                r, fr, *staged, self._flow_arg, *self._weight_args
            ),
            (self._ring, self._flow_ring), k, repeats,
        )
        return best

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
