"""Fully self-contained two-stream serving: raw frames in, scores out —
foreground boxes computed IN the loop (the reference's motion recipe)
AND optical flow computed ON DEVICE from the frame ring (the reference's
calc_optical_flow protocol). Nothing is precomputed: no bbox source, no
flow tree. See the package docstring in serve/__init__.py."""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vec_vad_tpu.serve._common import (
    _pack_f32,
    _predict_window,
    _time_device_chain,
    _unflatten_f32,
)
from vec_vad_tpu.serve.motion import MotionStreamingScorer

class MotionFlowStreamingScorer(MotionStreamingScorer):
    """Self-contained TWO-STREAM online serving: `push(frame)` is the
    whole input — the "switch on a camera" mode for two-stream models.

    Per push of frame u, ONE fused device call:

      * writes frame u into the raw ring,
      * computes the binary motion map of frame u-1 (its hard-bordered
        3-frame window [u-2, u-1, u] needs frame u, exactly like
        MotionStreamingScorer),
      * computes the flow of the SCORED frame u-2 with FlowNet2 from the
        raw ring — its reference pair (u-2, u-1) (calc_optical_flow.py's
        rule: head (f0, f0), mid (t, t+1), tail (N-2, N-1), 2-frame
        videos degenerate to (f0, f0) for BOTH frames;
        flow.driver.flow_pair_indices is the truth source) is already
        resident when u-2 scores — and writes it to the flow ring,
      * scores frame u-2 with the boxes derived from ITS motion map
        (host contour stage between pushes) and the fresh flow,
        motion-magnitude cube filter included.

    Scores emerge with the same 3-push lag as MotionStreamingScorer and
    end_video() flushes the tail with the now-known tail-clamped motion
    windows AND tail flow pairs. Scores match the offline two-stream
    pipeline run with motion-mode boxes + driver-computed flow
    (tests/test_serve.py::test_motion_flow_streaming_self_contained).

    `push(frame, ap_boxes=...)` still merges externally detected
    appearance boxes like the offline obj_det_with_motion stage; the
    `flow=` argument is rejected — flow is computed in the loop.
    """

    def __init__(self, cfg, variables=None, stats=None, *, flow_net,
                 flow_variables, flow_model_hw=(384, 512),
                 flow_compute_dtype=jnp.float32, **kw):
        """flow_compute_dtype as in FlowStreamingScorer: bf16 forward
        (weights cast once, flow returns to f32 before the ring write),
        ~9% per-frame on hardware and half the flow-weight HBM."""
        if not cfg.model.use_flow:
            raise ValueError(
                "MotionFlowStreamingScorer serves two-stream models; use "
                "MotionStreamingScorer for raw-only (use_flow=False)"
            )
        # flow attributes must exist before super().__init__ builds the
        # fused step via our _build_motion_step override
        self.flow_net = flow_net
        self._flow_hw = tuple(flow_model_hw)
        self._flow_dtype = flow_compute_dtype
        from ..flow.driver import cast_flow_variables

        flow_variables = cast_flow_variables(flow_variables, flow_compute_dtype)
        packed, self._fshapes, self._ftree = _pack_f32(
            flow_variables, dtype=flow_compute_dtype
        )
        self._flow_arg = packed if packed is not None else flow_variables
        super().__init__(cfg, variables, stats, **kw)

    def _unpack_flow(self, fw):
        if self._fshapes is None:
            return fw
        return _unflatten_f32(fw, self._fshapes, self._ftree)[0]

    # -- the fused step ----------------------------------------------------

    def _build_motion_step(self):
        from vec_vad_tpu.flow.driver import resize_bilinear
        from vec_vad_tpu.fore.motion import motion_maps

        R, R_of = self.R, self.R_of
        B, K = self.B, self.K
        gk = int(self.spec.mt_gauss_mask_size)
        bthr = int(self.spec.mt_binary_thr)
        fnet = self.flow_net
        mh, mw = self._flow_hw
        fdt = self._flow_dtype
        write_frame = self._write_frame
        score_from_rings = self._score_from_rings

        # ctrl layout = MotionStreamingScorer's [slot, of_slot, win(R),
        # owin(R_of), mwin(3)] + [pair_prev, pair_cur, flow_flag]
        @partial(jax.jit, donate_argnums=(0, 1))
        def step(ring, flow_ring, frame, ctrl, boxes, fw, *weights):
            variables, stats = self._unweight(weights)
            fvars = self._unpack_flow(fw)
            slot, of_slot = ctrl[0], ctrl[1]
            win = ctrl[2 : 2 + R]
            owin = ctrl[2 + R : 2 + R + R_of]
            mwin = ctrl[2 + R + R_of : 5 + R + R_of]
            pprev = ctrl[5 + R + R_of]
            pcur = ctrl[6 + R + R_of]
            fwflag = ctrl[7 + R + R_of]

            ring = write_frame(ring, frame, slot)
            H, W = ring.shape[1], ring.shape[2]

            def live(fr):
                pair = jnp.stack(
                    [jnp.take(ring, pprev, axis=0, mode="clip"),
                     jnp.take(ring, pcur, axis=0, mode="clip")]
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
                # map-only conveyor calls (scored < 0) skip FlowNet +
                # ensemble entirely
                return fr, jnp.zeros(
                    (B * K + K,), jnp.float32
                ) + 0.0 * fr[0, 0, 0, 0]

            flow_ring, out = jax.lax.cond(fwflag > 0, live, skip, flow_ring)

            # motion-map part, identical to MotionStreamingScorer's step
            wd = jnp.take(ring, mwin, axis=0, mode="clip")
            mp = motion_maps(wd[None], gk, bthr)[0]  # (H, W) bool
            wp = -(-W // 8) * 8
            bits = jnp.pad(mp, ((0, 0), (0, wp - W))).reshape(H, wp // 8, 8)
            weights8 = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.float32)
            packed = jnp.sum(bits.astype(jnp.float32) * weights8, axis=-1)
            return ring, flow_ring, jnp.concatenate(
                [out, packed.reshape(-1)]
            )

        return step

    # -- streaming API -----------------------------------------------------

    def push(self, frame: np.ndarray, ap_boxes=None,
             flow: Optional[np.ndarray] = None) -> Optional[float]:
        if flow is not None:
            raise ValueError(
                "MotionFlowStreamingScorer computes flow in the loop; "
                "streaming flow maps is MotionStreamingScorer's job"
            )
        return super().push(frame, ap_boxes)

    # -- internals -----------------------------------------------------------

    def _flow_pair(self, scored: int, tail_hint) -> tuple:
        """The scored frame's within-video flow-pair positions, following
        flow_pair_indices on a standalone video: (0,0) at heads, (t, t+1)
        mid-video, (N-2, N-1) at tails, (0, 0) for BOTH frames of a
        2-frame video. "Standalone" is the deliberate convention for the
        whole live-flow serving stack (FlowStreamingScorer.end_video
        too): the reference's hard-window arithmetic pads at the HEAD
        only when the window hits the GLOBAL frame-array start
        (vad_datasets.py offset rule), so a 2-frame video's tail pair is
        degenerate when the video is first in the split but (0, 1)
        otherwise — a stream has no global position, so each video gets
        the own-split semantics (identical everywhere except that one
        2-frame head quirk)."""
        if scored == 0:
            return 0, 0
        if tail_hint is not None and scored == tail_hint - 1:
            if tail_hint == 2:
                return 0, 0
            return scored - 1, scored
        return scored, scored + 1

    def time_device_step(
        self, frame, boxes, k: int = 16, repeats: int = 3,
    ) -> float:
        """Device-time twin of the fully self-contained step (ring write
        + FlowNet pair forward + ensemble score + motion map) — the ctrl
        extends the motion layout with [pair_prev, pair_cur, fwflag=1]
        and the flow weights ride as an explicit argument. Runs on
        ring copies — the conveyor's pending state is untouched."""
        frame = self._norm_motion_frame(frame)
        self._ensure_rings(*frame.shape[:2])
        rlen, orlen = self._rlen, self._of_rlen
        pos = max(self._n_pushed - self._v0, 3)
        scored = pos - 2
        b = np.asarray(boxes, np.float32).reshape(-1, 4)
        if b.shape[0] > self.K:
            raise ValueError(f"{b.shape[0]} boxes > max_boxes={self.K}")
        boxes_pad = np.zeros((self.K, 4), np.float32)
        boxes_pad[: b.shape[0]] = b
        slot = (self._v0 + pos) % rlen
        win = (self._v0 + _predict_window(scored, self.ctx)) % rlen
        owin = (self._v0 + _predict_window(scored, self.ctx_of)) % orlen
        of_slot = (self._v0 + scored) % orlen
        mwin = (self._v0 + np.array([pos - 2, pos - 1, pos])) % rlen
        pair = ((self._v0 + scored) % rlen, (self._v0 + scored + 1) % rlen)
        ctrl = np.concatenate(
            [[slot, of_slot], win, owin, mwin, pair, [1]]
        ).astype(np.int32)
        staged = [jax.device_put(a) for a in (frame, ctrl, boxes_pad)]
        jax.block_until_ready(staged)
        best = _time_device_chain(
            lambda r, fr: self._step_m(
                r, fr, *staged, self._flow_arg, *self._weight_args
            ),
            (self._ring, self._flow_ring), k, repeats,
        )
        return best

    def _dispatch(self, frame, flow, pos, scored, mapped, tail_hint,
                  redispatch=False):
        """One fused device call: write `frame`, compute `mapped`'s motion
        map, compute `scored`'s flow from its ring pair and score it
        (scored/mapped < 0 = dummy). Mirrors MotionStreamingScorer's
        conveyor contract; the host-streamed `flow` argument is unused
        (live flow) and only threads through for the parent's
        end_video/_last_push bookkeeping."""
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
            owin = (
                self._v0 + _predict_window(scored, self.ctx_of)
            ) % orlen
            pa, pb = self._flow_pair(scored, tail_hint)
            pair = ((self._v0 + pa) % rlen, (self._v0 + pb) % rlen)
            of_slot = (self._v0 + scored) % orlen
            fwflag = 1
        else:
            boxes_pad = np.zeros((self.K, 4), np.float32)
            nb = 0
            win = np.zeros(self.R, np.int64)
            owin = np.zeros(self.R_of, np.int64)
            pair = (0, 0)
            of_slot = 0
            fwflag = 0

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

        ctrl = np.concatenate(
            [[slot, of_slot], win, owin, mwin, pair, [fwflag]]
        ).astype(np.int32)
        self._ring, self._flow_ring, out = self._step_m(
            self._ring, self._flow_ring, frame, ctrl, boxes_pad,
            self._flow_arg, *self._weight_args,
        )
        if not redispatch:
            self._n_pushed += 1
            self._last_push = (frame, None)
        try:
            out.copy_to_host_async()  # harvest comes next push
        except (AttributeError, NotImplementedError):
            pass
        # skip_mag False: the scored frame's flow is always computed live
        self._flight.append(
            (out, boxes_pad, nb, self._scene, False, scored, mapped)
        )
        return out
