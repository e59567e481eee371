"""bench.py measurement-protocol helpers (CPU): the interleaved
median+spread reducer and the link-health preamble — the scoreboard's
variance-proofing machinery (VERDICT r4 item 1) must not bit-rot."""

import sys

import numpy as np


sys.path.insert(0, "/root/repo")


def test_median_spread_reducer():
    from bench import _median_spread

    rec = {}
    _median_spread(rec, "x_fps", [100.0, 110.0, 90.0])
    assert rec["x_fps"] == 100.0
    assert rec["x_fps_spread_pct"] == 20.0

    # failed rounds (<=0) are dropped; all-failed pins -1.0 and no spread
    rec = {}
    _median_spread(rec, "y_fps", [50.0, -1.0, 70.0])
    assert rec["y_fps"] == 60.0
    rec = {}
    _median_spread(rec, "z_fps", [-1.0, -1.0])
    assert rec["z_fps"] == -1.0 and "z_fps_spread_pct" not in rec

    # single sample: value pinned, spread omitted (nothing to bound)
    rec = {}
    _median_spread(rec, "w_fps", [42.0])
    assert rec["w_fps"] == 42.0 and "w_fps_spread_pct" not in rec


def test_link_health_smoke():
    """On CPU the 'link' is host memory — the point is the field contract:
    rtt/up/down all present and positive, no exception path taken."""
    from bench import link_health

    out = link_health(payload_mb=1.0)
    assert "link_error" not in out
    assert out["link_rtt_ms"] > 0
    assert out["link_up_mbps"] > 0 and out["link_down_mbps"] > 0
