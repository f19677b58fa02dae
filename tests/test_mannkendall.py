"""Mann-Kendall trend test (operators/regression.py:mann_kendall).

Independent plain-Python replica (explicit pair loop, tie groups,
integer significance cross-multiplication) plus hand pins: monotone
series hit S = n(n-1)/2, ties shrink the variance numerator exactly,
and the significance flag flips where the continuity-corrected
normal test says it should.
"""

import pyspark.sql.functions as F

from telemetry_streaming_spark.operators.regression import mann_kendall


def _replica(points):
    groups = {}
    for g, x, y in points:
        groups.setdefault(g, []).append((x, y))
    out = {}
    for g, pts in groups.items():
        n = len(pts)
        s = 0
        for i, (x1, y1) in enumerate(pts):
            for x2, y2 in pts[i + 1 :]:
                lo, hi = ((x1, y1), (x2, y2)) if x1 < x2 else ((x2, y2), (x1, y1))
                s += (hi[1] > lo[1]) - (hi[1] < lo[1])
        counts = {}
        for _, y in pts:
            counts[y] = counts.get(y, 0) + 1
        tie_sum = sum(t * (t - 1) * (2 * t + 5) for t in counts.values() if t > 1)
        var18 = n * (n - 1) * (2 * n + 5) - tie_sum
        sig = int(s != 0 and 180000 * (abs(s) - 1) ** 2 > 38416 * var18)
        out[g] = (n, s, var18, (s > 0) - (s < 0), sig)
    return out


def _run(spark, points):
    df = spark.createDataFrame(points, ["g", "x", "y"])
    return {
        r["g"]: (
            r["n_points"],
            r["s_stat"],
            r["var_s_num18"],
            r["trend"],
            r["significant"],
        )
        for r in mann_kendall(df, "x", "y", ["g"]).collect()
    }


def test_mk_matches_python_replica(spark):
    pts = (
        [("up", x, 3 * x + (x % 4)) for x in range(12)]
        + [("noisy", x, (x * 7) % 5) for x in range(10)]
        + [("down", x, 50 - 2 * x) for x in range(9)]
        + [("tied", x, x // 3) for x in range(9)]
    )
    assert _run(spark, pts) == _replica(pts)


def test_mk_monotone_hand_values(spark):
    """Strictly increasing n=10: S = 45, var18 = 10*9*25 = 2250,
    180000*44^2 = 348.5M > 38416*2250 = 86.4M -> significant."""
    pts = [("a", x, x * x) for x in range(10)]
    assert _run(spark, pts) == {"a": (10, 45, 2250, 1, 1)}


def test_mk_constant_series_is_null_trend(spark):
    """All-tied y: S = 0, tie term removes the whole variance
    numerator (one tie group of n), never significant."""
    pts = [("a", x, 7) for x in range(6)]
    assert _run(spark, pts) == {"a": (6, 0, 6 * 5 * 17 - 6 * 5 * 17, 0, 0)}


def test_mk_short_noisy_series_not_significant(spark):
    """n=4 cannot reach |z| > 1.96 with any S: max S = 6,
    180000*25 = 4.5M < 38416*126 = 4.84M."""
    pts = [("a", x, [1, 3, 2, 4][x]) for x in range(4)]
    got = _run(spark, pts)["a"]
    assert got[4] == 0 and got[0] == 4


def test_mk_single_point_group_is_kept(spark):
    """n = 1: no pairs -> S = 0, variance numerator 0, never
    significant — a defined row, not a silent drop."""
    pts = [("lone", 5, 42), ("pair", 1, 1), ("pair", 2, 3)]
    got = _run(spark, pts)
    assert got == _replica(pts)
    assert got["lone"] == (1, 0, 0, 0, 0)


def _smk_replica(points, season_of):
    """Seasonal Hirsch-Slack replica: per-(group, season) MK stats via
    the plain replica, summed per group, verdict on the sums."""
    by_season = {}
    for g, x, y in points:
        by_season.setdefault((g, season_of(x)), []).append((g, x, y))
    per = {}
    for (g, _), pts in by_season.items():
        n, s, var18, _, _ = _replica([(g, x, y) for g, x, y in pts])[g]
        agg = per.setdefault(g, [0, 0, 0, 0])
        agg[0] += n
        agg[1] += 1
        agg[2] += s
        agg[3] += var18
    out = {}
    for g, (n, k, s, var18) in per.items():
        sig = int(s != 0 and 180000 * (abs(s) - 1) ** 2 > 38416 * var18)
        out[g] = (n, k, s, var18, (s > 0) - (s < 0), sig)
    return out


def test_seasonal_mk_matches_replica_and_beats_plain_on_cyclic_data(spark):
    """A strong 4-phase cycle plus a small drift: the seasonal test
    must (a) equal the replica exactly and (b) recover the positive
    trend that the cycle hides — every within-season series is
    strictly increasing, so seasonal S is maximal."""
    from telemetry_streaming_spark.operators.regression import (
        seasonal_mann_kendall,
    )

    cycle = [0, 1000, -500, 250]
    pts = [("a", x, cycle[x % 4] + x) for x in range(32)]
    df = spark.createDataFrame(pts, ["g", "x", "y"]).withColumn(
        "season", F.col("x") % 4
    )
    got = {
        r["g"]: (
            r["n_points"], r["n_seasons"], r["s_stat"],
            r["var_s_num18"], r["trend"], r["significant"],
        )
        for r in seasonal_mann_kendall(df, "x", "y", ["g"], "season").collect()
    }
    assert got == _smk_replica(pts, lambda x: x % 4)
    n_points, n_seasons, s, var18, trend, sig = got["a"]
    assert (n_points, n_seasons) == (32, 4)
    assert s == 4 * (8 * 7 // 2)  # every within-season pair concordant
    assert (trend, sig) == (1, 1)
