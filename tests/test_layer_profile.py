"""runtime.layer_profile: the scan+perturb timing protocol (CPU smoke).

The numbers only mean something on hardware; here we verify the protocol
machinery — scan compiles, the perturbation picks the smallest arg, the
table/formatter round-trip — so the hardware tool can't bit-rot.
"""

import jax.numpy as jnp
import numpy as np

import jax

from vec_vad_tpu.runtime.layer_profile import (
    UNET_CONV_SHAPES,
    _build_timed_scan,
    _conv,
    format_table,
    profile_completion_program,
    profile_ensemble_formulations,
    profile_unet_convs,
    timed_scan,
)


def test_probe_reduction_consumes_every_output_element():
    """The probe must FULL-SUM the op output into its carry.

    Round 4 shipped a probe that consumed only `ravel(y)[0]`; the TPU
    compiler dead-code-eliminated every other output element (a conv
    sliced itself to one output pixel and read 7,400 TF/s on a 197 TF/s
    chip). XLA:CPU does NOT perform that elimination (verified: its
    cost_analysis counts the full conv either way), so the gate locks
    the protocol by VALUE: the probe returns n_iters x sum(op output)
    — any single-element reduction produces a different number.
    """
    B, H, cin, cout, n = 4, 8, 8, 16, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, H, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), jnp.float32)
    run = _build_timed_scan(_conv, 1, n)
    expect = n * float(jnp.sum(_conv(x, w)))
    np.testing.assert_allclose(float(run(x, w)), expect, rtol=1e-5)


def test_timed_scan_basic():
    a = jnp.asarray(np.random.default_rng(0).normal(size=(64, 64)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).normal(size=(64, 64)), jnp.float32)
    ms, tps = timed_scan(jnp.dot, (a, b), 2.0 * 64**3, iters=5, repeats=1)
    assert ms > 0 and tps > 0


def test_timed_scan_perturbs_smallest_arg():
    # scalar-ish second arg is smaller: perturbing it must not change dtype
    x = jnp.ones((32, 32), jnp.bfloat16)
    w = jnp.ones((4,), jnp.bfloat16)
    ms, _ = timed_scan(lambda x, w: x * w[0], (x, w), 0.0, iters=3, repeats=1)
    assert ms > 0


def test_profile_table_and_formatter():
    shapes = [("tiny", 4, 3, 8)]
    table = profile_unet_convs(
        batch=2, dtypes=(jnp.float32,), iters=2, shapes=shapes
    )
    assert set(table) == {"tiny"}
    ms, tps = table["tiny"]["float32"]
    assert ms > 0 and tps >= 0  # tiny-shape TF/s rounds to 0 on CPU
    txt = format_table(table)
    assert "tiny" in txt and "float32 ms" in txt


def test_ensemble_formulations_smoke():
    out = profile_ensemble_formulations(batch=2, members=2, H=4, C=8, iters=2)
    assert set(out) == {"vmap", "grouped", "blockdiag", "sharedw_batch"}
    assert all(ms > 0 for ms, _ in out.values())


def test_completion_program_probe_smoke():
    # whole-program probe compiles and times the real net (tiny batch)
    out = profile_completion_program(
        batches=(2,), dtypes=(jnp.float32,), mode="fwdbwd", iters=2
    )
    assert set(out) == {"fwdbwd_b2_float32"}
    ms, tps = out["fwdbwd_b2_float32"]
    assert ms > 0 and tps >= 0


def test_standard_shape_list_matches_unet():
    # depth-4 UNet: 2 convs per DoubleConv x (1 inc + 3 down + 3 up)
    assert len(UNET_CONV_SHAPES) == 14
    # channel progression f..8f and symmetric decoder
    assert UNET_CONV_SHAPES[0][1:] == (32, 12, 32)
    assert UNET_CONV_SHAPES[7][1:] == (4, 256, 256)


def test_timed_scan_rescales_subfloor_probes(monkeypatch):
    """The honest-measurement gate (VERDICT r4 item 8): a probe whose
    whole timed run finishes under min_wall_s measures the relay RTT,
    not the op (round 4: a '0.23 ms/iteration floor regardless of
    FLOPs' was the LINK) — timed_scan must rebuild it with more
    iterations until wall >= the floor (or max_iters)."""
    import vec_vad_tpu.runtime.layer_profile as lp

    iters_seen = []
    orig = lp._time_scalar_fn

    def spy(run, args, flops_once, iters, repeats):
        iters_seen.append(iters)
        return orig(run, args, flops_once, iters, repeats)

    monkeypatch.setattr(lp, "_time_scalar_fn", spy)
    x = jnp.ones((8,), jnp.float32)
    max_iters = 50_000
    ms, _ = lp.timed_scan(
        lambda x: x * 2.0, (x,), 0.0, iters=2, repeats=1,
        min_wall_s=0.05, max_iters=max_iters,
    )
    # the sub-floor probe was re-run with strictly more iterations...
    assert len(iters_seen) >= 2 and iters_seen[-1] > iters_seen[0]
    # ...until the wall cleared the floor (or the iteration cap)
    wall = ms * iters_seen[-1] / 1e3
    assert wall >= 0.04 or iters_seen[-1] == max_iters

    # min_wall_s=0 disables rescaling (the CPU-unit-test escape hatch)
    iters_seen.clear()
    lp.timed_scan(
        lambda x: x * 2.0, (x,), 0.0, iters=2, repeats=1, min_wall_s=0.0
    )
    assert iters_seen == [2]
