"""Self-contained serving: foreground boxes computed IN the serving
loop from the frame stream (see the package docstring in
serve/__init__.py)."""

from __future__ import annotations

from collections import deque
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vec_vad_tpu.serve._common import _predict_window, _time_device_chain
from vec_vad_tpu.serve.streaming import StreamingScorer

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

    def push_many(self, *a, **kw):
        raise NotImplementedError(
            "MotionStreamingScorer scores through the map conveyor — the "
            "inherited micro-batched push_many would bypass it (no motion "
            "maps, box queue desync); push frames one at a time"
        )

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

    def time_device_step(
        self, frame: np.ndarray, boxes: np.ndarray,
        k: int = 64, repeats: int = 3,
    ) -> float:
        """Device-time twin of the FUSED motion step (ring write +
        ensemble score + 3-frame motion map + bit-pack) — overridden
        because push() drives `_step_m` with the extended
        [base, mwin] ctrl; the inherited twin would time the plain
        score step and underreport the fused cost. `boxes` plays the
        scored frame's box list (in production they come from the
        conveyor's contour stage). Runs on ring copies — the
        conveyor's pending state is untouched, so a probe can run
        mid-video."""
        frame = self._norm_motion_frame(frame)
        self._ensure_rings(*frame.shape[:2])
        rlen, orlen = self._rlen, self._of_rlen
        pos = max(self._n_pushed - self._v0, 3)
        b = np.asarray(boxes, np.float32).reshape(-1, 4)
        if b.shape[0] > self.K:
            raise ValueError(f"{b.shape[0]} boxes > max_boxes={self.K}")
        boxes_pad = np.zeros((self.K, 4), np.float32)
        boxes_pad[: b.shape[0]] = b
        slot = (self._v0 + pos) % rlen
        win = (self._v0 + _predict_window(pos - 2, self.ctx)) % rlen
        mwin = (self._v0 + np.array([pos - 2, pos - 1, pos])) % rlen
        if self.use_flow:
            of_slot = (self._v0 + pos) % orlen
            owin = (
                self._v0 + _predict_window(pos - 2, self.ctx_of)
            ) % orlen
            flow_in = np.zeros(frame.shape[:2] + (2,), np.float32)
        else:
            of_slot = 0
            owin = np.zeros(self.R_of, np.int64)
            flow_in = np.zeros((1, 1, 2), np.float32)
        ctrl = np.concatenate(
            [[slot, of_slot], win, owin, mwin]
        ).astype(np.int32)
        staged = [
            jax.device_put(a) for a in (frame, flow_in, ctrl, boxes_pad)
        ]
        jax.block_until_ready(staged)
        best = _time_device_chain(
            lambda r, fr: self._step_m(r, fr, *staged, *self._weight_args),
            (self._ring, self._flow_ring), k, repeats,
        )
        return best

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
