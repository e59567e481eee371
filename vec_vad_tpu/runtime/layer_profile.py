"""Device-resident micro-profiling for the completion-ensemble convs.

The reference ships no per-layer profiling (its hot loop is timed only by
epoch prints, train.py:375-402). On this TPU setup, naive per-op timing is
impossible: the relay adds ~25 ms per materialized call and async dispatch
returns instantly, so anything short of a fused multi-iteration device
program measures the tunnel, not the op.

Protocol (validated in round 4 experiments):
  * the op runs ITERS times inside one jitted `lax.scan`, so iteration
    cost is pure device time (one dispatch + one 4-byte download total);
  * loop-invariant hoisting is defeated by perturbing the SMALLEST
    argument with `carry * 1e-38` (an exact no-op in f32/bf16 arithmetic
    — adding 1e-38 to O(1) values rounds away — but a data dependence XLA
    must respect). Perturbing a big activation instead adds a full
    HBM copy per iteration and flattens every measurement to the copy
    cost (~0.5 ms for a 67 MB buffer): that failure mode is why this
    helper exists.

Use `profile_unet_convs()` for the standard per-shape table on the
flagship UNet geometry, or `timed_scan()` for ad-hoc programs.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


#: Wall-time floor one timing run must clear for the relay RTT (~25 ms
#: through the axon tunnel) to pollute the per-iteration figure by <10%.
#: Probes below this are RE-RUN with proportionally more scan iterations
#: — the round-4 "0.23 ms/iteration floor regardless of FLOPs" reading
#: was exactly this artifact (100 iters x 0.23 ms = one RTT).
MIN_WALL_S = 0.3


def _time_scalar_fn(run, args, flops_once, iters, repeats):
    """Shared timing discipline: one compile+warm call, then best-of-
    `repeats` wall times of `run(*args)` forced via a 4-byte scalar
    download (in-order stream bounds all iters). Returns (ms/iter, TF/s)."""
    float(run(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        v = run(*args)
        float(v)
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    tps = (flops_once / per / 1e12) if flops_once > 0 else 0.0
    return per * 1e3, tps


def _build_timed_scan(f: Callable, pi: int, n: int):
    """The jitted n-iteration probe program for `f` (see timed_scan).

    Kept as a separate helper so tests can compile it and assert, via
    XLA cost_analysis, that the probed op survives whole: consuming only
    y[0] lets XLA dead-code-eliminate every output element that doesn't
    feed it — a conv probed that way sliced itself to one output pixel
    and reported 7,400 TF/s on a 197 TF/s chip. The FULL sum forces the
    whole op; its own cost is one HBM read of the output, small next to
    any op worth profiling.
    """

    @jax.jit
    def run(*a):
        def body(acc, _):
            pert = list(a)
            pert[pi] = a[pi] + (acc * 1e-38).astype(a[pi].dtype)
            y = f(*pert)
            return acc + jnp.sum(y.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    return run


def timed_scan(
    f: Callable,
    args: Sequence,
    flops_once: float,
    iters: int = 100,
    perturb: int = -1,
    repeats: int = 3,
    min_wall_s: float = MIN_WALL_S,
    max_iters: int = 200_000,
) -> Tuple[float, float]:
    """Time `f(*args)` on-device: returns (ms_per_iter, tflops_per_s).

    perturb: index of the argument to carry-perturb; -1 picks the
    smallest-by-bytes argument automatically (perturbation cost must be
    negligible next to the op being measured).

    Auto-scales the scan length: if the whole timed run finishes in under
    `min_wall_s`, the relay RTT (~25 ms/dispatch on this setup) is a
    first-order term and the per-iteration number LIES — the probe is
    recompiled with proportionally more iterations until wall >= the
    floor. Pass min_wall_s=0 to disable (e.g. CPU unit tests).

    args are passed to the jitted program as EXPLICIT arguments — a
    closure-captured device buffer serializes into the program body, and
    this backend's remote-compile endpoint rejects bodies >~100s MB with
    HTTP 413 (CLAUDE.md; a batch-8192 activation is ~400 MB).
    """
    sizes = [np.prod(np.shape(a)) for a in args]
    pi = int(np.argmin(sizes)) if perturb < 0 else perturb

    def build(n):
        return _build_timed_scan(f, pi, n)

    args = tuple(args)
    ms, tps = _time_scalar_fn(build(iters), args, flops_once, iters, repeats)
    wall = ms * iters / 1e3
    while wall < min_wall_s and iters < max_iters:
        # target 1.5x the floor so one rescale usually suffices
        iters = min(max_iters, max(iters + 1, int(iters * 1.5 * min_wall_s / max(wall, 1e-6))))
        ms, tps = _time_scalar_fn(build(iters), args, flops_once, iters, repeats)
        wall = ms * iters / 1e3
    return ms, tps


# (name, H==W, Cin, Cout): every distinct 3x3-conv shape in the depth-4
# completion UNet at features_root=32, patch 32 (models/layers.py UNet;
# reference model/unet.py:73-267). Cin=12 is the erased 4-frame raw input.
UNET_CONV_SHAPES: List[Tuple[str, int, int, int]] = [
    ("inc_a", 32, 12, 32),
    ("inc_b", 32, 32, 32),
    ("down1_a", 16, 32, 64),
    ("down1_b", 16, 64, 64),
    ("down2_a", 8, 64, 128),
    ("down2_b", 8, 128, 128),
    ("down3_a", 4, 128, 256),
    ("down3_b", 4, 256, 256),
    ("up1_a", 8, 256, 128),
    ("up1_b", 8, 128, 128),
    ("up2_a", 16, 128, 64),
    ("up2_b", 16, 64, 64),
    ("up3_a", 32, 64, 32),
    ("up3_b", 32, 32, 32),
]


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def profile_unet_convs(
    batch: int = 512,
    dtypes: Sequence = (jnp.float32, jnp.bfloat16),
    iters: int = 100,
    shapes: Optional[List[Tuple[str, int, int, int]]] = None,
    seed: int = 0,
) -> Dict[str, Dict[str, Tuple[float, float]]]:
    """Per-conv-shape timing table for the flagship UNet.

    batch: effective conv batch. The production ensemble folds E members
    into grouped channels at batch B (training B=128, E=4 -> pass 512 for
    the equivalent dense-batch shape; inference cube_batch=2048 -> 8192).

    Returns {shape_name: {dtype_name: (ms_per_iter, tflops_per_s)}}.
    """
    rng = np.random.default_rng(seed)
    out: Dict[str, Dict[str, Tuple[float, float]]] = {}
    for name, H, cin, cout in shapes or UNET_CONV_SHAPES:
        x = rng.normal(size=(batch, H, H, cin)).astype(np.float32)
        w = (rng.normal(size=(3, 3, cin, cout)) * 0.05).astype(np.float32)
        fl = 2.0 * batch * H * H * 9 * cin * cout
        row: Dict[str, Tuple[float, float]] = {}
        for dt in dtypes:
            ms, tps = timed_scan(
                _conv,
                (jnp.asarray(x, dt), jnp.asarray(w, dt)),
                fl,
                iters=iters,
            )
            row[jnp.dtype(dt).name] = (round(ms, 4), round(tps, 1))
        out[name] = row
    return out


def profile_ensemble_formulations(
    batch: int = 128,
    members: int = 4,
    H: int = 32,
    C: int = 32,
    iters: int = 100,
    seed: int = 0,
) -> Dict[str, Tuple[float, float]]:
    """Compare layouts for 'E independent convs with E weight sets'.

    The completion ensemble (models/completion.py, reference
    model/models.py:13-64 "model_set of independent UNets") is one UNet
    nn.vmap'ed over stacked params. On TPU the same math admits several
    layouts; this measures each at one representative conv shape:

      vmap          — jax.vmap(conv) over the member axis (production).
      grouped       — members folded into channels, feature_group_count=E.
      blockdiag     — members folded into channels, one dense conv with a
                      block-diagonal (E*C, E*C) kernel: E^2/E more FLOPs
                      but a single large MXU contraction.
      sharedw_batch — members folded into BATCH with one shared weight:
                      not the same math (lower bound — what a weight-shared
                      layout would cost).

    Returns {layout: (ms_per_iter, tflops_per_s)} with TFLOP/s computed
    against the USEFUL flops (vmap count) so layouts are comparable.
    """
    rng = np.random.default_rng(seed)
    E = members
    x_e = jnp.asarray(
        rng.normal(size=(E, batch, H, H, C)).astype(np.float32)
    )
    w_e = jnp.asarray(
        (rng.normal(size=(E, 3, 3, C, C)) * 0.05).astype(np.float32)
    )
    fl = 2.0 * E * batch * H * H * 9 * C * C
    out: Dict[str, Tuple[float, float]] = {}

    out["vmap"] = timed_scan(
        lambda x, w: jax.vmap(_conv)(x, w), (x_e, w_e), fl, iters=iters
    )

    x_g = jnp.moveaxis(x_e, 0, -2).reshape(batch, H, H, E * C)
    w_g = jnp.concatenate([w_e[i] for i in range(E)], axis=-1)

    def grouped(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=E,
        )

    out["grouped"] = timed_scan(grouped, (x_g, w_g), fl, iters=iters)

    wb = np.zeros((3, 3, E * C, E * C), np.float32)
    we = np.asarray(w_e)
    for i in range(E):
        wb[:, :, i * C : (i + 1) * C, i * C : (i + 1) * C] = we[i]
    out["blockdiag"] = timed_scan(
        _conv, (x_g, jnp.asarray(wb)), fl, iters=iters
    )

    x_b = x_e.reshape(E * batch, H, H, C)
    out["sharedw_batch"] = timed_scan(
        _conv, (x_b, w_e[0]), fl, iters=iters
    )
    return {k: (round(ms, 4), round(tps, 1)) for k, (ms, tps) in out.items()}


#: Analytic forward FLOPs per cube for the flagship completion ensemble
#: (nf=32, E=4 members, patch 32) — XLA cost analysis, see bench.py's
#: CPU-subprocess accounting. fwd+bwd is accounted as 3x fwd (standard
#: dgrad+wgrad convention).
FLAGSHIP_PER_CUBE_FWD_FLOPS = 1.378e9


def profile_completion_program(
    batches: Sequence[int] = (128, 1024),
    dtypes: Sequence = (jnp.float32, jnp.bfloat16),
    mode: str = "fwdbwd",
    iters: int = 20,
    per_cube_flops: float = FLAGSHIP_PER_CUBE_FWD_FLOPS,
    seed: int = 0,
) -> Dict[str, Tuple[float, float]]:
    """Whole-program probes on the production completion ensemble.

    Times the real `make_completion_net` forward (mode="fwd": the scoring
    math, per-member sum-squared error) or a train-style grad-of-MSE
    (mode="fwdbwd") under the scan+perturb protocol, with the params cast
    to each compute dtype exactly like BlockTrainer's compute_dtype path
    (train/trainer.py). Loop hoisting is defeated by perturbing the first
    param leaf with the carry.

    Hardware numbers live in PROFILE.md §3 (they were re-measured in
    round 4 after two timing traps were found and fixed: the relay-RTT
    floor on short scans, and dead-code elimination when the probe
    consumed only one output element — see timed_scan and MIN_WALL_S).

    Returns {f"{mode}_b{B}_{dtype}": (ms_per_iter, tflops_per_s)}.
    """
    from vec_vad_tpu.config import CompletionConfig
    from vec_vad_tpu.models.completion import make_completion_net

    rng = np.random.default_rng(seed)
    mc = CompletionConfig(nf=32, context_of_num=0, use_flow=False)
    net = make_completion_net(mc)
    P = 32
    x0 = np.zeros((1, P, P, mc.tot_raw_num * 3), np.float32)
    of0 = np.zeros((1, P, P, mc.tot_of_num * 2), np.float32)
    variables = net.init(jax.random.key(0), x0, of0, False)

    def perturbed(v, acc):
        leaves, tree = jax.tree.flatten(v)
        leaves = [leaves[0] + (acc * 1e-38).astype(leaves[0].dtype)] + leaves[1:]
        return jax.tree.unflatten(tree, leaves)

    results: Dict[str, Tuple[float, float]] = {}
    for B in batches:
        x = jnp.asarray(
            rng.uniform(0, 1, (B, P, P, mc.tot_raw_num * 3)).astype(np.float32)
        )
        of = jnp.zeros((B, P, P, mc.tot_of_num * 2), jnp.float32)
        for dt in dtypes:
            fl = (per_cube_flops if mode == "fwd" else 3.0 * per_cube_flops) * B

            # variables/x/of as EXPLICIT jit args (closure-captured
            # buffers serialize into the program body — HTTP 413 on the
            # remote-compile relay past ~100s of MB, see timed_scan)
            def build(n):
                @jax.jit
                def run(v0, x0, of0):
                    def body(acc, _):
                        v = perturbed(v0, acc)
                        if mode == "fwd":
                            return acc + fwd_v(v, x0, of0), None
                        g = jax.grad(loss_v)(v, x0, of0)
                        # consume EVERY grad leaf: reading one leaf lets
                        # XLA skip the other layers' weight-gradients
                        # (dead-code elimination — see timed_scan)
                        tot = sum(
                            jnp.sum(l.astype(jnp.float32))
                            for l in jax.tree.leaves(g)
                        )
                        return acc + tot, None

                    acc, _ = jax.lax.scan(
                        body, jnp.float32(0.0), None, length=n
                    )
                    return acc

                return run

            def fwd_v(v, x0, of0):
                vc = jax.tree.map(lambda p: p.astype(dt), v)
                out = net.apply(vc, x0.astype(dt), of0.astype(dt), False)
                err = (out.raw_out - out.raw_tgt).astype(jnp.float32)
                # full reduction over members AND batch — indexing [0]
                # here let XLA dead-code-eliminate the other members'
                # forwards (see timed_scan)
                return jnp.sum(jnp.square(err))

            def loss_v(v, x0, of0):
                vc = jax.tree.map(lambda p: p.astype(dt), v)
                out = net.apply(vc, x0.astype(dt), of0.astype(dt), False)
                err = (out.raw_out - jax.lax.stop_gradient(out.raw_tgt))
                return jnp.mean(jnp.square(err.astype(jnp.float32)))

            n = iters
            ms, tps = _time_scalar_fn(build(n), (variables, x, of), fl, n, 3)
            wall = ms * n / 1e3
            while wall < MIN_WALL_S and n < 10_000:
                n = min(10_000, max(n + 1, int(n * 1.5 * MIN_WALL_S / max(wall, 1e-6))))
                ms, tps = _time_scalar_fn(
                    build(n), (variables, x, of), fl, n, 3
                )
                wall = ms * n / 1e3
            key = f"{mode}_b{B}_{jnp.dtype(dt).name}"
            results[key] = (round(ms, 3), round(tps, 1))
    return results


def format_table(
    table: Dict[str, Dict[str, Tuple[float, float]]],
) -> str:
    dts = list(next(iter(table.values())).keys())
    hdr = "shape".ljust(10) + "".join(
        f"{d + ' ms':>14}{d + ' TF/s':>14}" for d in dts
    )
    lines = [hdr]
    for name, row in table.items():
        line = name.ljust(10)
        for d in dts:
            ms, tps = row[d]
            line += f"{ms:>14.4f}{tps:>14.1f}"
        lines.append(line)
    return "\n".join(lines)


def main() -> None:  # pragma: no cover - hardware entry point
    import argparse

    from vec_vad_tpu.runtime import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument(
        "--ensemble", action="store_true",
        help="run the ensemble-formulation comparison instead",
    )
    ap.add_argument(
        "--program", choices=("fwd", "fwdbwd"), default=None,
        help="run the whole-completion-program probe instead",
    )
    args = ap.parse_args()
    if args.program:
        res = profile_completion_program(
            batches=(args.batch,), mode=args.program, iters=args.iters
        )
        for k, (ms, tps) in res.items():
            print(f"{k:>24}: {ms:.3f} ms  {tps:.1f} TF/s")
    elif args.ensemble:
        for k, v in profile_ensemble_formulations(
            batch=args.batch, iters=args.iters
        ).items():
            print(f"{k:>14}: {v[0]:.4f} ms  {v[1]:.1f} TF/s")
    else:
        table = profile_unet_convs(batch=args.batch, iters=args.iters)
        print(format_table(table))


if __name__ == "__main__":  # pragma: no cover
    main()
