"""End-to-end inference throughput benchmark on real TPU hardware.

Measures the full test-time scoring path of the flagship configuration
(UCSDped2 geometry, SelfCompleteNet4-equivalent ensemble, precomputed
bboxes — driver config #1 in BASELINE.json) with the fused device-resident
pipeline: HBM frame stack -> temporal-window gather -> crop-resize ->
completion-ensemble forward -> z-normalized scores -> per-frame max.

Inputs: synthetic 240x360 frames (no raw video ships with the repo) with
the REAL UCSDped2 test bbox fixture (raw_datasets/UCSDped2/
bboxes_test_obj_det_with_motion.npy) driving box geometry, so the workload
shape matches the real dataset exactly (2010 frames, real per-frame box
counts).

Prints ONE json line: frames/second over the full test set.
vs_baseline is the real-time factor (throughput / 25 fps surveillance
video), since the reference publishes no throughput numbers
(BASELINE.md: AUROC only).
"""

import json
import time

import numpy as np


def pallas_correlation_check() -> dict:
    """Pallas-vs-einsum correlation fwd+bwd ON HARDWARE at FlowNetC scale
    (batch 4, 256ch, 48x64 — the conv3 cost-volume input for 512x384
    frames): verifies the Pallas kernel against the jnp formulation and
    pins BOTH timings so the production default (ops.py: auto — Pallas on
    TPU) is a driver-recorded, data-backed choice.

    Timing protocol: K executions queued on the device stream with only an
    8-byte scalar downloaded at the end (in-order execution means forcing
    the last result bounds all K) — fwd+bwd here is ~11 GFLOP (~ms), so a
    bulk gradient download (25 MB over the ~40 MB/s tunnel) or per-call
    sync would swamp the thing being measured. (A lax.scan variant blew
    the remote compiler's time budget; eager chaining reuses the single
    compiled executable.)"""
    import jax
    import jax.numpy as jnp

    from vec_vad_tpu.models.flownet.ops import correlation

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(4, 48, 64, 256)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4, 48, 64, 256)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(4, 48, 64, 441)).astype(np.float32))
    K = 10

    def loss(x, y, pal):
        return jnp.sum(correlation(x, y, 20, 2, pal, False) * g)

    f = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)

    reduce = jax.jit(lambda ga, gb: jnp.sum(ga) + jnp.sum(gb))

    def timed(pal):
        float(reduce(*f(a, b, pal)))  # compile + warm both executables
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                ga, gb = f(a, b, pal)
            float(reduce(ga, gb))
            best = min(best, (time.perf_counter() - t0) * 1000.0 / K)
        return best

    # independent try blocks so a failure on one side still records the
    # other's timing (distinguishes "Pallas broken, einsum fine" from
    # "both broken" in the bench record; -1.0 marks the failed side)
    out = {}
    try:
        ga_r, gb_r = f(a, b, False)
        out["jnp_correlation_ms"] = round(timed(False), 2)
    except Exception:
        ga_r = gb_r = None
        out["jnp_correlation_ms"] = -1.0
    try:
        ga_p, gb_p = f(a, b, True)
        out["pallas_correlation_ok"] = bool(
            ga_r is not None
            and np.allclose(np.asarray(ga_p), np.asarray(ga_r), atol=1e-3)
            and np.allclose(np.asarray(gb_p), np.asarray(gb_r), atol=1e-3)
        )
        out["pallas_correlation_ms"] = round(timed(True), 2)
    except Exception:
        out["pallas_correlation_ok"] = False
        out["pallas_correlation_ms"] = -1.0
    return out


def _analytic_flops() -> dict:
    """XLA's own FLOP counts for the benched programs, computed in a CPU
    child process. The axon plugin's Lowered.cost_analysis() returns None
    in-process (even for cpu lowering_platforms), so the counting runs
    where it works: a subprocess forced onto the CPU backend, lowering
    with abstract (eval_shape) arguments — no compile, no device, ~20 s.
    Returns {} on any failure (MFU fields then report -1.0)."""
    import os
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    code = r"""
import json
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from vec_vad_tpu.config import CompletionConfig
from vec_vad_tpu.models.completion import make_completion_net
from vec_vad_tpu.models.flownet import FlowNet2

def flops(fn, *args):
    return float(jax.jit(fn).lower(*args).cost_analysis()["flops"])

out = {}
# completion-ensemble forward, batch 128 (the inference/training unit)
mc = CompletionConfig(nf=32, context_of_num=0, use_flow=False)
net = make_completion_net(mc)
P, bb = 32, 128
x = jax.ShapeDtypeStruct((bb, P, P, mc.tot_raw_num * 3), jnp.float32)
of = jax.ShapeDtypeStruct((bb, P, P, mc.tot_of_num * 2), jnp.float32)
v = jax.eval_shape(
    lambda k, x, of: net.init(k, x, of, False), jax.random.key(0), x, of
)
out["completion_fwd_b128"] = flops(
    lambda v, x, of: net.apply(v, x, of, False).raw_out, v, x, of
)
# FlowNet2 forward, batch 4 at 192x256 (jnp correlation so the cost
# model sees the einsum; the Pallas kernel is an opaque custom call)
fnet = FlowNet2(use_pallas_correlation=False)
fx = jax.ShapeDtypeStruct((4, 2, 192, 256, 3), jnp.float32)
fv = jax.eval_shape(lambda k, fx: fnet.init(k, fx), jax.random.key(0), fx)
out["flownet2_fwd_b4_192x256"] = flops(
    lambda v, x: jnp.sum(fnet.apply(v, x)), fv, fx
)
print(json.dumps(out))
"""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], env=env, cwd=here,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            timeout=300,
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception:
        return {}


# v5e MXU peak (bf16 multiply, f32 accumulate): 197 TFLOP/s/chip. The
# benched stages run f32 compute, which lowers through the same MXU
# passes — MFU is reported against the bf16 peak (the standard convention
# when no separate f32 peak is published for the part).
CHIP_PEAK_TFLOPS = 197.0


def _mfu(record: dict, tag: str, flops: float, seconds: float) -> None:
    """Attach <tag>_tflops / <tag>_tflops_per_s / <tag>_mfu_pct."""
    if flops <= 0 or seconds <= 0:
        record[f"{tag}_mfu_pct"] = -1.0
        return
    record[f"{tag}_tflops"] = round(flops / 1e12, 3)
    tps = flops / seconds / 1e12
    record[f"{tag}_tflops_per_s"] = round(tps, 2)
    record[f"{tag}_mfu_pct"] = round(100.0 * tps / CHIP_PEAK_TFLOPS, 2)


def flownet2_throughput_check(flops_tbl: dict) -> dict:
    """End-to-end FlowNet2 forward throughput ON HARDWARE at a small
    /64-divisible geometry (batch 4 at 192x256 — bounded compile; the
    persistent executable cache makes repeat rounds free). Pins the whole
    L0+L1 flow stack (correlation/warp/channelnorm + the 162.5M-param
    composite) on the scoreboard as maps/s so regressions are visible —
    round-3 flow numbers lived only in prose. Timing protocol:
    scan+perturb (runtime/layer_profile.py, PROFILE.md) — K iterations
    inside ONE jitted lax.scan with params as EXPLICIT args, hoisting
    defeated by carry-perturbing the first weight leaf, one 4-byte
    download. Two traps this sidesteps, both measured: (a) K queued
    eager calls marshal FlowNet2's ~230-leaf pytree per call and swing
    with host load (26.4 ms/call under a competing test suite vs 25.7
    in-scan); (b) CLOSURE-captured zero-init params bake 229/230 leaves
    into the program as constants and XLA constant-folds part of the
    net — a probe built that way reported 12.9 ms/map, 2x faster than
    the device really runs. FLOPs from the jnp-correlation lowering
    (the Pallas kernel is a custom call XLA counts as 0; the timed run
    uses the production default — Pallas on TPU)."""
    import jax
    import jax.numpy as jnp

    from vec_vad_tpu.models.flownet import FlowNet2

    B, h, w = 4, 192, 256
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 255, (B, 2, h, w, 3)).astype(np.float32))

    out = {}
    try:
        net = FlowNet2()
        # zero-init params ON DEVICE via eval_shape (no 650 MB upload, no
        # giant init program — FLOP count and timing don't depend on
        # weight values)
        shapes = jax.eval_shape(
            lambda k: net.init(k, x[:1]), jax.random.key(0)
        )
        variables = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes
        )
        # K sized so one timed run (K x ~14-25 ms/batch) is >=330 ms
        # wall — the ~25 ms relay RTT then pollutes the per-map figure
        # by <8% even on the faster bf16 arm (K=8 left bf16 ~22% high)
        K = 24

        # explicit args, not closure captures: captured pytrees serialize
        # into the program body (remote-compile 413 limit, CLAUDE.md)
        @jax.jit
        def run(v, xx):
            def body(acc, _):
                leaves, tree = jax.tree.flatten(v)
                leaves = [
                    leaves[0] + (acc * 1e-38).astype(leaves[0].dtype)
                ] + leaves[1:]
                vv = jax.tree.unflatten(tree, leaves)
                y = net.apply(vv, xx)
                return acc + jnp.sum(y).astype(jnp.float32), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return acc

        float(run(variables, x))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(variables, x))
            best = min(best, (time.perf_counter() - t0) / K)
        out["flow_maps_per_s"] = round(B / best, 1)
        _mfu(
            out, "flow_fwd",
            flops_tbl.get("flownet2_fwd_b4_192x256", -1.0), best,
        )

        # the production bf16 fast path (calc-flow --flow-dtype bfloat16,
        # PROFILE.md §5: 1.8x at fixed batch, 2.1x with the chunk-8
        # default at the VAD protocol) — pinned at the same geometry and
        # batch as the f32 arm so the ratio is the dtype win alone
        # own try/except so a bf16-only failure (e.g. a bf16 compile
        # issue) can't clobber the already-measured f32 number
        try:
            from vec_vad_tpu.flow.driver import cast_flow_variables

            v_bf = cast_flow_variables(variables, jnp.bfloat16)
            x_bf = x.astype(jnp.bfloat16)
            float(run(v_bf, x_bf))
            best_bf = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(v_bf, x_bf))
                best_bf = min(best_bf, (time.perf_counter() - t0) / K)
            out["flow_maps_per_s_bf16"] = round(B / best_bf, 1)
        except Exception as e:
            out["flow_maps_per_s_bf16"] = -1.0
            out["flow_bf16_error"] = repr(e)[:200]
    except Exception as e:
        out["flow_maps_per_s"] = -1.0
        out["flow_error"] = repr(e)[:200]
    return out


def link_health(payload_mb: float = 8.0) -> dict:
    """Measured health of the host<->device link at this moment: RTT
    (median of 12 tiny scalar round trips through a jitted add) and
    up/down bandwidth (one payload_mb transfer each way, forced).

    The relay tunnel's bandwidth swings 5-40 MB/s and its RTT drifts
    run-to-run (CLAUDE.md); without this preamble in the artifact, a real
    serving regression and a bad tunnel day are indistinguishable
    (VERDICT r4 item 1a). Call at bench start AND end — the pair bounds
    the weather during the run."""
    import jax
    import jax.numpy as jnp

    out = {}
    try:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.float32(0.0)
        float(f(x))  # compile
        rtts = []
        for _ in range(12):
            t0 = time.perf_counter()
            float(f(x))  # tiny upload + dispatch + scalar download
            rtts.append(time.perf_counter() - t0)
        out["link_rtt_ms"] = round(float(np.median(rtts)) * 1000.0, 2)

        nbytes = int(payload_mb * 1e6)
        host = np.zeros(nbytes, np.uint8)
        t0 = time.perf_counter()
        dev = jax.device_put(host)
        jax.block_until_ready(dev)
        out["link_up_mbps"] = round(nbytes / 1e6 / (time.perf_counter() - t0), 1)
        t0 = time.perf_counter()
        np.asarray(dev)
        out["link_down_mbps"] = round(nbytes / 1e6 / (time.perf_counter() - t0), 1)
        del dev
    except Exception as e:
        out["link_error"] = repr(e)[:200]
    return out


def _median_spread(record: dict, name: str, vals, unit_round: int = 1) -> None:
    """Pin <name> = median of per-round values + <name>_spread_pct =
    100*(max-min)/median — the interleaved-repeats protocol (the repo's
    own documented rule: sequential A/Bs on this tunnel lie; only
    interleaved samples bound the drift)."""
    vals = [v for v in vals if v > 0]
    if not vals:
        record[name] = -1.0
        return
    med = float(np.median(vals))
    record[name] = round(med, unit_round)
    if len(vals) > 1:
        record[f"{name}_spread_pct"] = round(
            100.0 * (max(vals) - min(vals)) / max(med, 1e-9), 1
        )


def _require_backend(timeout_s: float = 240.0):
    """Bounded backend init. The remote relay has been observed to go
    UNAVAILABLE for hours, during which jax.devices() HANGS ~25 min
    before raising — a bench run caught in that window must emit an
    honest error record instead of hanging the driver. Returns None on
    success, else the failure description (a raise-fast error is
    reported verbatim so an environment bug is not misdiagnosed as a
    transient outage)."""
    import threading

    result = []

    def probe():
        try:
            import jax

            jax.devices()
            result.append(None)
        except Exception as e:  # report, don't swallow
            result.append(f"backend init raised: {e!r}")

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not result:
        return (
            f"jax.devices() did not come up within {timeout_s:.0f} s "
            "(relay outage)"
        )
    return result[0]


def main() -> None:
    err = _require_backend()
    if err is not None:
        import os

        print(json.dumps({
            "metric": "e2e_fps",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": f"TPU backend unavailable: {err}",
        }))
        # a possibly-hung probe thread would block interpreter teardown
        os._exit(0)

    import jax

    from vec_vad_tpu.runtime import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    # link-health preamble: RTT + bandwidth at run start (merged into the
    # record once it exists; a closing sample bounds the weather)
    link0 = link_health()

    from vec_vad_tpu.config import CompletionConfig, ForegroundConfig, PipelineConfig
    from vec_vad_tpu.data.video_index import VideoIndex
    from vec_vad_tpu.infer import infer_frame_scores_resident
    from vec_vad_tpu.models.completion import make_completion_net
    from vec_vad_tpu.ops.stc import pad_boxes

    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=32, max_boxes_per_frame=32),
        model=CompletionConfig(nf=32, context_of_num=0, use_flow=False),
    )

    boxes_list = list(
        np.load(
            "/root/reference/raw_datasets/UCSDped2/"
            "bboxes_test_obj_det_with_motion.npy",
            allow_pickle=True,
        )
    )
    n = len(boxes_list)
    h, w = cfg.dataset.frame_hw
    # UCSDped2 test split: 12 videos x ~180 frames
    lengths = [n // 12] * 11
    lengths.append(n - sum(lengths))
    index = VideoIndex([f"v{i}" for i in range(12)], np.array(lengths))

    rng = np.random.default_rng(0)
    # UCSDped2 frames are grayscale .tif; cv2.imread replicates the single
    # channel across BGR — synthesize the same structure
    gray = rng.integers(0, 256, (n, h, w, 1), dtype=np.uint8)
    frames = np.repeat(gray, 3, axis=-1)
    boxes_pad, valid = pad_boxes(boxes_list, cfg.fore.max_boxes_per_frame)
    windows = index.context_indices(
        cfg.model.context_frame_num, cfg.model.border_mode
    )

    net = make_completion_net(cfg.model)
    P = cfg.fore.patch_size
    x0 = np.zeros((1, P, P, cfg.model.tot_raw_num * 3), np.float32)
    of0 = np.zeros((1, P, P, cfg.model.tot_of_num * 2), np.float32)
    variables = net.init(jax.random.key(0), x0, of0, False)
    stats = (100.0, 30.0, 1.0, 1.0)

    # The steady-state serving design: the frame stack uploads to HBM once,
    # then the whole split scores in three device calls (extract-all ->
    # flat gather -> score-all). Warmup compiles; the timed run measures
    # the full end-to-end scoring of all 2010 frames / ~35k cubes.
    import jax.numpy as jnp

    # device_put on the numpy array directly: device_put(jnp.asarray(x))
    # TRANSFERS TWICE over the tunnel (measured 140 s vs 47 s for 661 MB)
    frames_dev = jax.device_put(frames)
    np.asarray(frames_dev[0, 0, 0, 0])  # force the upload to finish
    kwargs = dict(
        cfg=cfg, variables=variables, stats=stats, frames=frames_dev,
        windows=windows, boxes_pad=boxes_pad, valid=valid, chunk=256,
        net=net,
    )
    infer_frame_scores_resident(**kwargs)  # warmup (compile)

    t0 = time.perf_counter()
    scores = infer_frame_scores_resident(**kwargs)
    dt = time.perf_counter() - t0
    assert scores.shape == (n,) and np.isfinite(scores[valid.any(1)]).all()

    fps = n / dt
    record = {
        "metric": "ucsdped2_test_inference_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 25.0, 2),
    }
    record.update(link0)

    # -- MFU accounting (analytic FLOPs / chip peak) ----------------------
    # The scoring pass's FLOPs are dominated by the completion-ensemble
    # forward over every valid cube (the extraction interpolation matmuls
    # are ~1% of it); XLA's own HLO cost analysis counts the lowered
    # forward, scaled to the split's cube count.
    n_cubes = int(valid.sum())
    flops_tbl = _analytic_flops()
    fwd_flops_b = flops_tbl.get("completion_fwd_b128", -1.0)
    per_cube_fwd = fwd_flops_b / 128.0 if fwd_flops_b > 0 else -1.0
    record["inference_cubes"] = n_cubes
    _mfu(record, "inference", per_cube_fwd * n_cubes, dt)

    # -- Online serving: INTERLEAVED repeats + device twins ---------------
    # Every arm is measured R times round-robin (sync, piped, batch8,
    # cam8, live-flow, sync, piped, ...) and reported as
    # median-of-rounds + spread — the repo's own honest-A/B protocol
    # (sequential runs on this tunnel drift 3x; CLAUDE.md round-3 notes).
    # Each arm also gets a DEVICE-TIME twin (args pre-staged in HBM, k
    # chained executions, one download) so the artifact separates device
    # regressions from link weather (VERDICT r4 item 1). r04 ran the
    # FlowNet2 compiles BEFORE serving; the flow stages now run AFTER so
    # bench-order HBM/executable pressure can't depress these numbers.
    from vec_vad_tpu.serve import MultiCameraScorer, StreamingScorer

    rounds, n_sync, n_pipe, n_b8, n_t8, n_lf = 3, 70, 70, 9, 9, 36
    kw = dict(net=net, max_boxes=cfg.fore.max_boxes_per_frame,
              gray_stream=True)

    sync_sc = StreamingScorer(cfg, variables, stats, **kw)
    pipe_sc = StreamingScorer(cfg, variables, stats, pipeline_depth=2, **kw)
    b8_sc = StreamingScorer(cfg, variables, stats, **kw)
    ncam, kb = 8, 8
    mcs = MultiCameraScorer(
        cfg, variables, stats, n_cameras=ncam, pipeline_depth=2, **kw
    )
    for sc in (sync_sc, pipe_sc, b8_sc, mcs):
        sc.start_video()

    lf = None
    try:
        # LIVE-FLOW serving (FlowStreamingScorer): the full two-stream
        # model with FlowNet2 computed on-device inside the per-frame
        # fused step — the flagship "switch on a camera" mode. Zero-init
        # FlowNet2 weights via eval_shape (timing is value-independent; a
        # real init/upload costs minutes through the tunnel).
        from vec_vad_tpu.config import CompletionConfig, PipelineConfig
        from vec_vad_tpu.models.completion import make_completion_net
        from vec_vad_tpu.models.flownet import FlowNet2
        from vec_vad_tpu.serve import FlowStreamingScorer

        cfg2 = PipelineConfig(
            dataset_name=cfg.dataset_name, fore=cfg.fore,
            model=CompletionConfig(
                nf=cfg.model.nf, context_of_num=0, use_flow=True
            ),
        )
        net2 = make_completion_net(cfg2.model)
        v2 = net2.init(
            jax.random.key(0),
            np.zeros((1, P, P, cfg2.model.tot_raw_num * 3), np.float32),
            np.zeros((1, P, P, cfg2.model.tot_of_num * 2), np.float32),
            False,
        )
        fn2 = FlowNet2()
        fshapes = jax.eval_shape(
            lambda k: fn2.init(k, jnp.zeros((1, 2, 384, 512, 3))),
            jax.random.key(0),
        )
        fvars = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), fshapes)
        lf = FlowStreamingScorer(
            cfg2, v2, (100.0, 30.0, 1.0, 1.0), pipeline_depth=2,
            flow_net=fn2, flow_variables=fvars, flow_model_hw=(384, 512),
            net=net2, max_boxes=cfg2.fore.max_boxes_per_frame,
            gray_stream=True,
        )
        lf.start_video()
    except Exception as e:
        record["liveflow_fps"] = -1.0
        record["liveflow_error"] = repr(e)[:200]

    def m_sync():
        lat = []
        for i in range(n_sync):
            t0 = time.perf_counter()
            s = sync_sc.push(gray[i % n, ..., 0], boxes_list[i % n])
            lat.append(time.perf_counter() - t0)
            assert np.isfinite(s)
        return np.array(lat) * 1000.0

    def m_pipe():
        t0 = time.perf_counter()
        for i in range(n_pipe):
            pipe_sc.push(gray[i % n, ..., 0], boxes_list[i % n])
        return n_pipe / (time.perf_counter() - t0)

    def m_b8():
        t0 = time.perf_counter()
        for bi in range(n_b8):
            s = b8_sc.push_many(
                gray[bi * kb : bi * kb + kb, ..., 0],
                [boxes_list[j] for j in range(bi * kb, bi * kb + kb)],
            )
            assert len(s) == kb
        return n_b8 * kb / (time.perf_counter() - t0)

    def m_cam8():
        t0 = time.perf_counter()
        for i in range(n_t8):
            # each camera streams a different region of the fixture split
            mcs.push_tick(
                np.stack(
                    [gray[(i + c * 211) % n, ..., 0] for c in range(ncam)]
                ),
                [boxes_list[(i + c * 211) % n] for c in range(ncam)],
            )
        return n_t8 * ncam / (time.perf_counter() - t0)

    def m_lf():
        t0 = time.perf_counter()
        for i in range(n_lf):
            lf.push(gray[i % n, ..., 0], boxes_list[i % n])
        return n_lf / (time.perf_counter() - t0)

    # warmup: compile every executable + fill every pipeline OUTSIDE the
    # timed rounds (first-call compiles are 20-240 s on this backend)
    m_sync(), m_pipe(), m_b8(), m_cam8()
    if lf is not None:
        # first push compiles the fused FlowNet2 step — historically the
        # flakiest executable on this backend (remote-compile 413s,
        # Mosaic bf16 crashes, relay outages); a failure here must not
        # sink the already-measured record
        try:
            m_lf()
        except Exception as e:
            record["liveflow_fps"] = -1.0
            record["liveflow_error"] = repr(e)[:200]
            lf = None

    sync_lat, pipe_fps, b8_fps, cam8_fps, lf_fps = [], [], [], [], []
    for _ in range(rounds):
        sync_lat.append(m_sync())
        pipe_fps.append(m_pipe())
        b8_fps.append(m_b8())
        cam8_fps.append(m_cam8())
        if lf is not None:
            try:
                lf_fps.append(m_lf())
            except Exception as e:
                record["liveflow_fps"] = -1.0
                record["liveflow_error"] = repr(e)[:200]
                lf, lf_fps = None, []

    pooled = np.concatenate(sync_lat)
    record["streaming_ms_per_frame"] = round(float(np.median(pooled)), 1)
    record["streaming_p90_ms"] = round(float(np.percentile(pooled, 90)), 1)
    _median_spread(
        record, "streaming_sync_fps",
        [1000.0 / float(np.median(r)) for r in sync_lat],
    )
    _median_spread(record, "streaming_fps", pipe_fps)
    _median_spread(record, "streaming_batch8_fps", b8_fps)
    _median_spread(record, "streaming_cam8_fps", cam8_fps)
    if lf_fps:
        _median_spread(record, "liveflow_fps", lf_fps)
        if record["liveflow_fps"] > 0:
            record["liveflow_ms_per_frame"] = round(
                1000.0 / record["liveflow_fps"], 1
            )

    # device twins: ms the step costs with the link taken out of the loop
    try:
        record["streaming_step_device_ms"] = round(
            sync_sc.time_device_step(gray[0, ..., 0], boxes_list[0]), 2
        )
        record["cam8_tick_device_ms"] = round(
            mcs.time_device_tick(
                np.stack([gray[c * 211 % n, ..., 0] for c in range(ncam)]),
                [boxes_list[c * 211 % n] for c in range(ncam)],
            ), 2
        )
        if lf is not None:
            record["liveflow_step_device_ms"] = round(
                lf.time_device_step(gray[0, ..., 0], boxes_list[0], k=16),
                2,
            )
    except Exception as e:
        record["device_twin_error"] = repr(e)[:200]

    # -- Training: fit_block wall + itemized budget ------------------------
    # One flagship block (2048 cubes, 10 epochs at batch 128 = 160
    # optimizer steps) through the public fit_block surface — whole-run
    # device-resident lax.scan + the training-score pass (the reference's
    # per-block recipe, train.py:375-431). HBM-resident cubes, like the
    # real pipeline. fit_block_budget itemizes where the non-scan wall
    # goes (VERDICT r4 item 2) and pins the scan-only device twin.
    from vec_vad_tpu.parallel.mesh import get_mesh
    from vec_vad_tpu.train.trainer import BlockTrainer

    n_cubes_blk = 2048
    raw = jax.device_put(rng.integers(
        0, 256, (n_cubes_blk, P, P, cfg.model.tot_raw_num * 3), dtype=np.uint8
    ))
    np.asarray(raw[0, 0, 0, 0])  # force the upload out of the timed region
    trainer = BlockTrainer(net, cfg.model, get_mesh(), patch_size=P)
    steps = cfg.model.epochs * (-(-n_cubes_blk // cfg.model.batch_size))
    trainer.fit_block(raw, None)  # compile + warm
    fit_walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        blk = trainer.fit_block(raw, None)
        fit_walls.append(time.perf_counter() - t0)
    assert np.isfinite(blk.raw_scores).all()
    _median_spread(record, "train_fit_block_s", fit_walls, unit_round=2)
    dt = record["train_fit_block_s"]
    record["train_steps_per_s"] = round(steps / dt, 1)
    try:
        budget = trainer.fit_block_budget(raw, None)
        for key, val in budget.items():
            record[f"train_budget_{key}"] = round(val, 3)
        record["train_step_device_ms"] = round(
            budget["train_scan_s"] / steps * 1000.0, 2
        )
    except Exception as e:
        record["train_budget_error"] = repr(e)[:200]
    # train MFU: fwd + bwd ~= 3x the forward FLOPs (the standard 1:2
    # fwd:bwd accounting; Adam/BN elementwise work is noise next to the
    # convs), over steps x batch cubes (the trainer pads each epoch
    # cyclically to a batch multiple), plus the score pass (1x fwd over
    # the block's cubes).
    train_flops = (
        3.0 * per_cube_fwd * steps * cfg.model.batch_size
        + per_cube_fwd * n_cubes_blk
    )
    _mfu(record, "train", train_flops, dt)

    # -- Flow stages LAST (r04 ran them before serving; isolating them
    # here removes bench-order pressure from the serving numbers) --------
    record.update(pallas_correlation_check())
    record.update(flownet2_throughput_check(flops_tbl))

    # closing link sample: the (start, end) pair bounds the tunnel
    # weather the run saw
    for key, val in link_health().items():
        record[key.replace("link_", "link_end_")] = val
    print(json.dumps(record))


if __name__ == "__main__":
    main()
