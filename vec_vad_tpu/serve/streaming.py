"""Single-stream online scorer (see the package docstring in
serve/__init__.py for the serving design and hardware numbers)."""

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

from vec_vad_tpu.serve._common import (
    _pack_f32,
    _time_device_chain,
    _predict_window,
    _unflatten_f32,
)

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

    def time_device_step(
        self, frame: np.ndarray, boxes: np.ndarray,
        k: int = 64, repeats: int = 3,
    ) -> float:
        """Device-time twin of push(): ms/frame for the jitted per-frame
        step alone, with every argument pre-staged in HBM, k executions
        chained on the device stream (donated rings threaded), and ONE
        download forcing the final out (in-order execution bounds all k).

        Excludes what link weather owns — host marshaling, the per-frame
        upload, and the per-push result round trip — so a bench artifact
        can tell a device regression from a bad tunnel day (the
        _time_device_chain protocol; a k*step wall >= ~300 ms keeps the
        residual RTT under a few percent). Runs on ring copies — the
        scorer's serving state is untouched."""
        frame = np.asarray(frame, np.uint8)
        if self.gray_stream and frame.ndim == 3:
            frame = frame[..., 0]
        self._ensure_rings(*frame.shape[:2])
        pos = self._n_pushed - self._v0
        b = np.asarray(boxes, np.float32).reshape(-1, 4)
        if b.shape[0] > self.K:
            raise ValueError(f"{b.shape[0]} boxes > max_boxes={self.K}")
        boxes_pad = np.zeros((self.K, 4), np.float32)
        boxes_pad[: b.shape[0]] = b
        win = (self._v0 + _predict_window(pos, self.ctx)) % self.R
        if self.use_flow:
            owin = (self._v0 + _predict_window(pos, self.ctx_of)) % self.R_of
            flow_in = np.zeros(frame.shape[:2] + (2,), np.float32)
        else:
            owin = np.zeros(self.R_of, np.int64)
            flow_in = np.zeros((1, 1, 2), np.float32)
        ctrl = np.concatenate(
            [[self._n_pushed % self.R, self._n_pushed % self.R_of],
             win, owin]
        ).astype(np.int32)

        staged = [
            jax.device_put(a) for a in (frame, flow_in, ctrl, boxes_pad)
        ]
        jax.block_until_ready(staged)
        best = _time_device_chain(
            lambda r, fr: self._step(r, fr, *staged, *self._weight_args),
            (self._ring, self._flow_ring), k, repeats,
        )
        return best

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
