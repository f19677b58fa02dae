"""Theil-Sen slope (operators/regression.py:theilsen_slope).

Pins the e6-quantized pairwise-slope median against an independent
plain-Python replica (explicit truncating division — Python's // is
floor, so the replica spells out truncation), the robustness property
that motivates the estimator, and the truncation contract on negative
slopes.
"""

import pytest

from telemetry_streaming_spark.operators.regression import theilsen_slope

SCALE = 10**6


def _tdiv(a, b):
    """Truncate-toward-zero integer division (Spark div / DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _replica(points, scale=SCALE):
    """points: list of (group, x, y) -> {group: (n_points, n_pairs, slope)}"""
    out = {}
    groups = {}
    for g, x, y in points:
        groups.setdefault(g, []).append((x, y))
    for g, pts in groups.items():
        slopes = []
        for i, (x1, y1) in enumerate(pts):
            for x2, y2 in pts[i + 1 :]:
                lo, hi = ((x1, y1), (x2, y2)) if x1 < x2 else ((x2, y2), (x1, y1))
                slopes.append(
                    (_tdiv(scale * (hi[1] - lo[1]), hi[0] - lo[0]), lo[0], hi[0])
                )
        slopes.sort()
        if slopes:
            med = slopes[(len(slopes) + 1) // 2 - 1][0]
        else:
            med = None  # pair-less group: NULL slope, kept in output
        out[g] = (len(pts), len(slopes), med)
    return out


def _run(spark, points, **kw):
    df = spark.createDataFrame(points, ["g", "x", "y"])
    return {
        r["g"]: (r["n_points"], r["n_pairs"], r["theilsen_slope_e6"])
        for r in theilsen_slope(df, "x", "y", ["g"], **kw).collect()
    }


def test_theilsen_hand_outlier_robust(spark):
    """Slopes [1,1,1,33,49,97] -> lower median 1: the outlier at
    (4,100) does not move the estimate (OLS slope here is ~28)."""
    pts = [("a", 1, 1), ("a", 2, 2), ("a", 3, 3), ("a", 4, 100)]
    assert _run(spark, pts) == {"a": (4, 6, 1_000_000)}


def test_theilsen_matches_python_replica(spark):
    pts = [
        ("up", x, 7 * x + (x % 3) - 1) for x in range(1, 20)
    ] + [
        ("down", x, -5 * x + (x * x) % 7) for x in range(1, 15)
    ] + [
        ("flat", x, 42) for x in range(1, 10)
    ]
    assert _run(spark, pts) == _replica(pts)


def test_theilsen_negative_slope_truncates_toward_zero(spark):
    """dy=-1 over dx=3: -1e6 div 3 is -333333 (truncation), not
    -333334 (floor) — the stated cross-engine contract."""
    pts = [("a", 0, 1), ("a", 3, 0)]
    assert _run(spark, pts) == {"a": (2, 1, -333_333)}


def test_theilsen_pair_count_is_choose_two(spark):
    pts = [("a", x, x * x) for x in range(10)]
    n_points, n_pairs, _ = _run(spark, pts)["a"]
    assert (n_points, n_pairs) == (10, 45)


def test_theilsen_tie_total_order_is_deterministic(spark):
    """All-equal slopes: every pair quantizes identically, median is
    that value regardless of which pair the order picks."""
    pts = [("a", x, 3 * x) for x in range(1, 8)]
    a = _run(spark, pts)
    b = _run(spark, pts)
    assert a == b == {"a": (7, 21, 3_000_000)}


def test_theilsen_plan_is_jvm_side(spark):
    """All built-ins: no Python eval anywhere in the pair/median plan."""
    import contextlib
    import io

    df = spark.createDataFrame([("a", x, x) for x in range(5)], ["g", "x", "y"])
    out = theilsen_slope(df, "x", "y", ["g"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_theilsen_single_point_group_is_kept_with_null_slope(spark):
    """A group with no valid pair must appear (n_pairs = 0, NULL
    slope), matching grouped_linreg's degenerate-group behavior, not
    vanish from the output."""
    pts = [("lone", 5, 42), ("pair", 1, 1), ("pair", 2, 3)]
    got = _run(spark, pts)
    assert got == _replica(pts)
    assert got["lone"] == (1, 0, None)
