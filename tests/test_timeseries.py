"""resample_ffill / scd2_intervals semantics on hand data."""

import pytest

from telemetry_streaming_spark.operators.timeseries import resample_ffill, scd2_intervals


@pytest.fixture(scope="module")
def obs(spark):
    # key A: obs at 30s and 420s; key B: single obs exactly on a grid line
    return spark.createDataFrame(
        [("A", 30, 1.0), ("A", 420, 2.0), ("B", 600, 9.0)],
        "k string, ts_s long, v double",
    )


def test_resample_ffill_grid_and_fill(obs):
    out = {
        (r["k"], r["grid_ts_s"]): r["v"]
        for r in resample_ffill(obs, on="k", ts_seconds="ts_s", step_seconds=300).collect()
    }
    assert out == {
        ("A", 0): None,      # grid floor precedes the first observation
        ("A", 300): 1.0,     # carried forward from ts 30
        ("B", 600): 9.0,     # on-grid observation matches itself
    }


def test_resample_ffill_origin_shifts_grid(obs):
    out = {
        (r["k"], r["grid_ts_s"]): r["v"]
        for r in resample_ffill(
            obs, on="k", ts_seconds="ts_s", step_seconds=300, origin=30
        ).collect()
    }
    # B's span [600, 600] floors to grid start 330; the next line (630)
    # exceeds the last observation, so B gets the single pre-obs row.
    assert out == {
        ("A", 30): 1.0,
        ("A", 330): 1.0,
        ("B", 330): None,
    }


def test_resample_rejects_bad_step(obs):
    with pytest.raises(ValueError, match="positive"):
        resample_ffill(obs, on="k", ts_seconds="ts_s", step_seconds=0)


def test_scd2_intervals_chain(spark):
    changes = spark.createDataFrame(
        [("A", 10, "v1"), ("A", 20, "v2"), ("A", 30, "v3"), ("B", 5, "w1")],
        "k string, ts long, val string",
    )
    rows = {
        (r["k"], r["val"]): (r["valid_from"], r["valid_to"])
        for r in scd2_intervals(changes, on="k", ts_col="ts").collect()
    }
    assert rows == {
        ("A", "v1"): (10, 20),
        ("A", "v2"): (20, 30),
        ("A", "v3"): (30, None),
        ("B", "w1"): (5, None),
    }


def test_scd2_collision_raises(spark):
    changes = spark.createDataFrame([("A", 1, 2)], "k string, ts long, valid_to long")
    with pytest.raises(ValueError, match="collides"):
        scd2_intervals(changes, on="k", ts_col="ts")


def test_latest_snapshot_matches_manual(spark):
    from telemetry_streaming_spark.operators.timeseries import latest_snapshot
    from telemetry_streaming_spark.sources.registry import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders", parallelize=False)
    out = {r.o_custkey: (r.o_orderkey, r.o_orderdate) for r in latest_snapshot(
        orders, on="o_custkey", ts_col="o_orderdate", tie_cols=["o_orderkey"]).collect()}
    rows = orders.select("o_custkey", "o_orderkey", "o_orderdate").collect()
    expected = {}
    for r in rows:
        cur = expected.get(r.o_custkey)
        if cur is None or (r.o_orderdate, r.o_orderkey) > (cur[1], cur[0]):
            expected[r.o_custkey] = (r.o_orderkey, r.o_orderdate)
    assert out == expected
    # exactly one row per key
    assert len(out) == len({r.o_custkey for r in rows})


def test_winsorize_clamps_to_group_bounds(spark):
    import pyspark.sql.functions as F
    import pytest

    from telemetry_streaming_spark.operators.outliers import winsorize
    from telemetry_streaming_spark.sources.registry import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events", parallelize=False)
    out = winsorize(events, "value", ["event_type"], lo=0.1, hi=0.9)
    bad = out.where(
        (F.col("value_w") < F.col("lo_bound")) | (F.col("value_w") > F.col("hi_bound"))
    ).count()
    assert bad == 0
    # interior values pass through untouched
    passthru = out.where(
        (F.col("value") >= F.col("lo_bound")) & (F.col("value") <= F.col("hi_bound"))
        & (F.col("value") != F.col("value_w"))
    ).count()
    assert passthru == 0
    with pytest.raises(ValueError):
        winsorize(events, "value", ["event_type"], lo=0.9, hi=0.1)


def test_winsorize_sketch_tier_bounds_are_close(spark):
    """approx_percentile bounds must land within the value range and
    near the exact bounds (rank error <= 1/accuracy)."""
    from telemetry_streaming_spark.operators.outliers import winsorize
    from telemetry_streaming_spark.sources.registry import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events", parallelize=False)
    exact = {r.event_type: (r.lo_bound, r.hi_bound) for r in winsorize(
        events, "value", ["event_type"]).select("event_type", "lo_bound", "hi_bound").distinct().collect()}
    approx = {r.event_type: (r.lo_bound, r.hi_bound) for r in winsorize(
        events, "value", ["event_type"], exact=False, accuracy=10000
    ).select("event_type", "lo_bound", "hi_bound").distinct().collect()}
    for et, (lo_e, hi_e) in exact.items():
        lo_a, hi_a = approx[et]
        assert abs(lo_a - lo_e) <= max(1.0, 0.1 * abs(lo_e))
        assert abs(hi_a - hi_e) <= max(1.0, 0.05 * abs(hi_e))


def test_robust_stats_flags_planted_outliers(spark):
    import pytest

    from telemetry_streaming_spark.operators.outliers import robust_stats

    rows = [("a", float(v)) for v in [10, 11, 12, 13, 14, 1000]] + [
        ("b", float(v)) for v in [5, 5, 5, 5]
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    out = {r.g: r for r in robust_stats(df, "x", ["g"], k=3.0).collect()}
    assert out["a"].n_outliers == 1          # the planted 1000
    assert out["a"].med == 12.5
    # constant group: MAD 0, every deviation is 0, so nothing flags
    assert out["b"].n_outliers == 0
    assert out["b"].mad == 0.0
    with pytest.raises(ValueError):
        robust_stats(df, "x", ["g"], k=0)


def test_robust_stats_sketch_tier_close_to_exact(spark):
    from telemetry_streaming_spark.operators.outliers import robust_stats
    from telemetry_streaming_spark.sources.registry import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events", parallelize=False)
    exact = {r.event_type: r for r in robust_stats(events, "value", ["event_type"]).collect()}
    approx = {r.event_type: r for r in robust_stats(
        events, "value", ["event_type"], exact=False, accuracy=10_000).collect()}
    for et, e in exact.items():
        a = approx[et]
        assert abs(a.med - e.med) <= max(0.5, 0.05 * abs(e.med))
        assert abs(a.mad - e.mad) <= max(0.5, 0.1 * abs(e.mad))


def test_merge_aggregates_multi_step_equals_full(spark):
    """Three-way split, merged pairwise then with the third — any
    merge tree must equal the one-pass aggregate (associativity)."""
    import pyspark.sql.functions as F
    import pytest

    from telemetry_streaming_spark.operators.incremental import merge_aggregates
    from telemetry_streaming_spark.sources.registry import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events", parallelize=False)

    def agg(part):
        return part.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("user_id").alias("s"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )

    parts = [agg(ev.where(F.col("event_id") % 3 == i)) for i in range(3)]
    kw = dict(count_cols=["n"], sum_cols=["s"], min_cols=["lo"], max_cols=["hi"])
    ab = merge_aggregates(parts[:2], ["event_type"], **kw)
    abc = merge_aggregates([ab, parts[2]], ["event_type"], **kw)
    full = {tuple(r) for r in agg(ev).collect()}
    assert {tuple(r) for r in abc.collect()} == full
    with pytest.raises(ValueError):
        merge_aggregates([], ["event_type"], **kw)
    with pytest.raises(ValueError):
        merge_aggregates(parts[:1], ["event_type"])
    with pytest.raises(ValueError):
        merge_aggregates([parts[0].drop("n")], ["event_type"], **kw)


def test_sketch_merge_equals_one_pass_sketch(spark):
    """merge(sketch(A), sketch(B)) must equal sketch(A union B) — not
    approximately: HLL union is register-wise max and top-k combine
    merges summaries, so the read-out estimates are identical."""
    import pyspark.sql.functions as F
    import pytest

    from telemetry_streaming_spark.operators.incremental import (
        distinct_sketch,
        merge_sketch_aggregates,
        topk_sketch,
    )
    from telemetry_streaming_spark.sources.registry import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events", parallelize=False)

    def skagg(part):
        return part.groupBy("event_type").agg(
            distinct_sketch("user_id").alias("du"),
            topk_sketch("user_id").alias("tu"),
        )

    parts = [skagg(ev.where(F.col("event_id") % 2 == i)) for i in range(2)]
    m = merge_sketch_aggregates(parts, ["event_type"], hll_cols=["du"], topk_cols=["tu"])

    def readout(df):
        rows = df.selectExpr(
            "event_type",
            "hll_sketch_estimate(du) AS d",
            "approx_top_k_estimate(tu, 5) AS t",
        ).collect()
        return {r.event_type: (r.d, sorted((e.item, e["count"]) for e in r.t)) for r in rows}

    assert readout(m) == readout(skagg(ev))
    # at this cardinality the HLL sparse mode is exact
    exact = {r.event_type: r.d for r in ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("d")).collect()}
    assert {k: v[0] for k, v in readout(m).items()} == exact
    with pytest.raises(ValueError):
        merge_sketch_aggregates(parts, ["event_type"])


def test_grouped_linreg_recovers_known_line(spark):
    import pytest

    from telemetry_streaming_spark.operators.regression import grouped_linreg

    rows = [("a", x, 3 * x + 7) for x in range(100, 110)] + [
        ("b", x, 42) for x in range(5)
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r.g: r for r in grouped_linreg(df, ["g"], "x", "y").collect()}
    assert out["a"].slope == pytest.approx(3.0, abs=1e-12)
    # intercept reported at x_min=100: y(100) = 307
    assert out["a"].intercept_at_xmin == pytest.approx(307.0, abs=1e-9)
    assert out["a"].r == pytest.approx(1.0, abs=1e-12)
    # constant y: slope 0, r NULL (zero variance)
    assert out["b"].slope == 0.0
    assert out["b"].r is None
    with pytest.raises(ValueError):
        grouped_linreg(df, [], "x", "y")


def test_snapshot_diff_classifies_changes(spark):
    import pytest

    from telemetry_streaming_spark.operators.incremental import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 21.0), (4, "d", 40.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()}
    # 1 unchanged (absent), 2 value-updated, 3 deleted, 4 NULL->value update, 5 inserted
    assert got == {2: "update", 3: "delete", 4: "update", 5: "insert"}
    with pytest.raises(ValueError):
        snapshot_diff(old, new, [], ["s"])


def test_pattern_match_finds_planted_subsequence(spark):
    """A series containing the exact query pattern must rank first with
    distance 0; windows never span users."""
    import datetime as dt

    from telemetry_streaming_spark.operators.timeseries import pattern_match_topk

    def rows(uid, vals, t0=0):
        return [
            (uid, 1000 * uid + i, dt.datetime(2024, 1, 1, 0, 0, t0 + i), float(v))
            for i, v in enumerate(vals)
        ]

    pattern = [12.0, 34.0, 8.0]
    data = (
        rows(1, [5.0, 12.0, 34.0, 8.0, 99.0])  # exact match at offset 1
        + rows(2, [12.0, 34.0])  # prefix only: too short, never a window
        + rows(3, [12.0, 34.0, 9.0])  # off by 1.0 on the last point
    )
    df = spark.createDataFrame(data, "user_id long, event_id long, ts timestamp, value double")
    got = pattern_match_topk(
        df, pattern_cents=[1200, 3400, 800], k=3, key_col="user_id"
    ).collect()
    assert (got[0].user_id, got[0].dist2) == (1, 0)
    # user 3's full-series window differs by 100 cents on one point
    assert (got[1].user_id, got[1].dist2) == (3, 100 * 100)
    # user 2 contributes no window at all (series shorter than pattern)
    assert all(r.user_id != 2 for r in got)


def test_pattern_match_rejects_bad_params(spark):
    import datetime as dt

    from telemetry_streaming_spark.operators.timeseries import pattern_match_topk

    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1), 1.0)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pattern_match_topk(df, [], k=1)
    with _pytest.raises(ValueError):
        pattern_match_topk(df, [100], k=0)


def test_znorm_pattern_match_is_shape_invariant_and_matches_numpy(spark):
    """A window that is the pattern scaled and shifted must score ~0;
    scores match a numpy replica of the same normalization."""
    import datetime as dt

    import numpy as np

    from telemetry_streaming_spark.operators.timeseries import pattern_match_topk_znorm

    def rows(uid, vals):
        return [
            (uid, 1000 * uid + i, dt.datetime(2024, 1, 1, 0, 0, i), float(v))
            for i, v in enumerate(vals)
        ]

    pattern = [1.0, 3.0, 2.0]
    data = (
        rows(1, [10.0, 30.0, 20.0])  # pattern x10: identical shape
        + rows(2, [101.0, 103.0, 102.0])  # pattern shifted +100: identical shape
        + rows(3, [3.0, 1.0, 2.0])  # different shape
        + rows(4, [5.0, 5.0, 5.0])  # constant: no shape, skipped
    )
    df = spark.createDataFrame(data, "user_id long, event_id long, ts timestamp, value double")
    got = pattern_match_topk_znorm(df, pattern, k=10).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r.zdist2)
    assert min(by_user[1]) < 1e-9 and min(by_user[2]) < 1e-9
    assert 4 not in by_user  # constant windows skipped

    # numpy replica for user 3's full window
    p = np.array(pattern)
    pn = (p - p.mean()) / p.std()
    v = np.array([3.0, 1.0, 2.0])
    zn = (v - v.mean()) / np.sqrt(((v - v.mean()) ** 2).mean())
    want = round(float(((zn - pn) ** 2).sum()), 6)
    assert abs(min(by_user[3]) - want) < 1e-6


def test_znorm_pattern_match_rejects_bad_pattern(spark):
    import datetime as dt

    import pytest as _pytest

    from telemetry_streaming_spark.operators.timeseries import pattern_match_topk_znorm

    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1), 1.0)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    with _pytest.raises(ValueError):
        pattern_match_topk_znorm(df, [1.0])
    with _pytest.raises(ValueError):
        pattern_match_topk_znorm(df, [2.0, 2.0, 2.0])


def _py_dtw(w, p, band):
    """Reference banded DTW (independent of the operator's numpy code)."""
    inf = float("inf")
    m = len(p)
    prev = [inf] * m
    for i in range(m):
        cur = [inf] * m
        for j in range(max(0, i - band), min(m - 1, i + band) + 1):
            d = (w[i] - p[j]) ** 2
            if i == 0 and j == 0:
                best = 0.0
            else:
                best = min(
                    prev[j] if i > 0 else inf,
                    cur[j - 1] if j > 0 else inf,
                    prev[j - 1] if i > 0 and j > 0 else inf,
                )
            cur[j] = d + best
        prev = cur
    return prev[m - 1]


def test_dtw_matches_python_reference_and_beats_euclidean_on_warp(spark):
    import datetime as dt
    import random

    from telemetry_streaming_spark.operators.timeseries import dtw_pattern_match

    pattern = [1.0, 5.0, 5.0, 1.0]
    # user 1's window [1,5,1,1] is the pattern with the 5-plateau
    # compressed and the 1-tail stretched: euclidean cost is 16 (the
    # missing second 5), DTW with band>=1 aligns plateau/tail
    # many-to-one at zero cost
    warped = [0.0, 1.0, 5.0, 1.0, 1.0, 0.0]
    rng = random.Random(3)
    rows = [
        (1, 100 + i, dt.datetime(2024, 1, 1, 0, 0, i), v) for i, v in enumerate(warped)
    ] + [
        (2, 200 + i, dt.datetime(2024, 1, 1, 0, 0, i), round(rng.uniform(10, 90), 2))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    got = dtw_pattern_match(df, pattern, band=1, k=30).collect()

    # replicate every window score with the pure-python DP
    series = {}
    for uid, eid, ts, v in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        series.setdefault(uid, []).append((int(ts.timestamp()), float(v)))
    want = {}
    for uid, sv in series.items():
        vals = [v for _, v in sv]
        for s in range(len(vals) - len(pattern) + 1):
            want[(uid, sv[s][0])] = round(_py_dtw(vals[s:s + len(pattern)], pattern, 1), 6)
    assert {(r.user_id, r.ts_s): r.dtw_dist for r in got} == want
    # the warped window (offset 1) is the global best at zero cost —
    # euclidean distance on the same window is 16
    best = got[0]
    assert best.user_id == 1 and best.dtw_dist == want[(1, best.ts_s)]
    assert best.dtw_dist == 0.0


def test_dtw_series_cap_raises(spark):
    import datetime as dt

    import pytest as _pytest

    from telemetry_streaming_spark.operators.timeseries import dtw_pattern_match

    rows = [(1, i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    with _pytest.raises(Exception, match="max_series_len"):
        dtw_pattern_match(df, [1.0, 2.0], max_series_len=10).collect()


class TestTrailingWindowStats:
    def _dense(self, spark, days=4, per_day=40, parts=2):
        rows = []
        for p in range(parts):
            i = 0
            for d in range(days):
                for _ in range(per_day):
                    rows.append((f"t{p}", d, i, (i * 13 + p) % 97))
                    i += 1
        return spark.createDataFrame(rows, "part string, day int, seq long, v long")

    def test_sliced_equals_reference(self, spark):
        """The day-sliced rewrite must reproduce every (n, s1, s2)
        triple of the single-window reference exactly — including
        frames that span a day boundary through carried rows."""
        from telemetry_streaming_spark.operators.timeseries import trailing_window_stats

        df = self._dense(spark)
        ref = {
            (r.part, r.seq): (r.n, r.s1, r.s2)
            for r in trailing_window_stats(df, "part", ["seq"], "v", lookback=29).collect()
        }
        sliced = {
            (r.part, r.seq): (r.n, r.s1, r.s2)
            for r in trailing_window_stats(
                df, "part", ["seq"], "v", lookback=29, slice_col="day"
            ).collect()
        }
        assert ref == sliced and len(ref) == 320

    def test_sliced_tasks_are_bounded(self, spark):
        """Scale gate: every window in the sliced plan partitions by
        (part, day) — no window ever sorts a whole partition."""
        import re

        from telemetry_streaming_spark.operators.timeseries import trailing_window_stats

        df = self._dense(spark)
        plan = (
            trailing_window_stats(df, "part", ["seq"], "v", lookback=29, slice_col="day")
            ._jdf.queryExecution().executedPlan().toString()
        )
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            spec = m.group(1)
            if "specifiedwindowframe" in spec and "RowFrame" in spec:
                assert "day" in spec, spec

    def test_sparse_interior_slice_raises(self, spark):
        """An INTERIOR slice with < lookback rows violates the carry
        contract and must fail loudly, not emit wrong frames."""
        import pytest

        from telemetry_streaming_spark.operators.timeseries import trailing_window_stats

        df = self._dense(spark, days=3, per_day=10)  # 10 < lookback 29
        with pytest.raises(ValueError, match="interior"):
            trailing_window_stats(df, "part", ["seq"], "v", lookback=29, slice_col="day")

    def test_partial_first_and_last_slices_allowed(self, spark):
        """The first slice's carry is complete history regardless of
        size and the last slice never feeds carries — both may be
        partial, and the frames still match the reference exactly."""
        import pyspark.sql.functions as F

        from telemetry_streaming_spark.operators.timeseries import trailing_window_stats

        dense = self._dense(spark, days=4, per_day=40, parts=1)
        # keep only 7 rows of day 0 and 5 rows of day 3
        df = dense.where(
            ((F.col("day") != 0) | (F.col("seq") < 7))
            & ((F.col("day") != 3) | (F.col("seq") < 127))
        )
        ref = {
            r.seq: (r.n, r.s1, r.s2)
            for r in trailing_window_stats(df, "part", ["seq"], "v", lookback=29).collect()
        }
        sliced = {
            r.seq: (r.n, r.s1, r.s2)
            for r in trailing_window_stats(
                df, "part", ["seq"], "v", lookback=29, slice_col="day"
            ).collect()
        }
        assert ref == sliced

    def test_nonmonotone_order_across_slices_raises(self, spark):
        """Order keys that reset per slice would sort carries after the
        next slice's natives and silently wreck frames — the contract
        check must catch it (review finding)."""
        import pyspark.sql.functions as F
        import pytest

        from telemetry_streaming_spark.operators.timeseries import trailing_window_stats

        df = self._dense(spark, days=3, per_day=40, parts=1).withColumn(
            "seq", F.col("seq") % 40  # per-day reset
        )
        with pytest.raises(ValueError, match="monotone"):
            trailing_window_stats(df, "part", ["seq"], "v", lookback=29, slice_col="day")

    def test_slice_gap_raises(self, spark):
        import pytest
        import pyspark.sql.functions as F

        from telemetry_streaming_spark.operators.timeseries import trailing_window_stats

        df = self._dense(spark).withColumn(
            "day", F.when(F.col("day") >= 2, F.col("day") + 1).otherwise(F.col("day"))
        )
        with pytest.raises(ValueError, match="consecutive"):
            trailing_window_stats(df, "part", ["seq"], "v", lookback=29, slice_col="day")


def test_active_user_snapshot_null_event_type_oracle_parity(spark, tmp_path):
    """Oracle/impl parity on NULL event_type (ADVICE r6): the impl's
    ~coalesce(delete_when, false) keeps a survivor row whose
    event_type is NULL; the oracle's `event_type <> 'error'` alone
    would drop it under three-valued logic.  Run BOTH engines on data
    that actually contains NULL event_type."""
    import datetime

    import duckdb
    from pyspark.sql import Row

    from __spark_entry__ import oracle_sql, queries
    from tests.oracle_harness import compare_query

    t0 = datetime.datetime(2024, 1, 1)

    def ev(eid, uid, etype, minutes):
        return Row(
            event_id=eid,
            ts=t0 + datetime.timedelta(minutes=minutes),
            user_id=uid,
            event_type=etype,
            value=1.0,
            props="{}",
        )

    rows = [
        ev(1, 10, "click", 0), ev(2, 10, None, 5),      # latest is NULL: kept
        ev(3, 20, None, 0), ev(4, 20, "error", 5),      # latest is error: dropped
        ev(5, 30, "error", 0), ev(6, 30, "view", 5),    # error superseded: kept
        ev(7, 40, None, 0),                             # only a NULL event: kept
    ]
    # single-file parquet, matching the testdata layout both engines read
    spark.createDataFrame(rows).toPandas().to_parquet(
        str(tmp_path / "events.parquet"), index=False
    )
    duck = duckdb.connect()
    compare_query(
        spark,
        duck,
        "active_user_snapshot",
        queries()["active_user_snapshot"],
        oracle_sql()["active_user_snapshot"],
        str(tmp_path),
    )
    got = {
        r.user_id
        for r in queries()["active_user_snapshot"](spark, str(tmp_path)).collect()
    }
    assert got == {10, 30, 40}


def test_znorm_window_stats_matches_python_replica(spark):
    """Integer replica pin for the znorm sufficient-statistics
    companion: per-key window counts, flat-window detection, and the
    variance/covariance numerators recomputed in pure Python over the
    same (ts, id)-ordered cent values — including a constant run
    (flat windows must count in n_flat and contribute 0 to cov)."""
    import datetime

    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.timeseries import znorm_window_stats

    t0 = datetime.datetime(2024, 1, 1)
    weights = [-3, -1, 1, 3]
    m = len(weights)

    vals = {
        1: [1.0, 2.0, 4.0, 8.0, 16.0, 3.25],         # varied shapes
        2: [5.0] * 6,                                  # all-flat windows
        3: [1.0, 1.0],                                 # too short: no window
    }
    rows = []
    eid = 0
    for uid, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append(Row(
                event_id=eid, ts=t0 + datetime.timedelta(seconds=i),
                user_id=uid, event_type="x", value=v, props="{}",
            ))
            eid += 1
    df = spark.createDataFrame(rows)
    got = {
        r["user_id"]: (r["n_windows"], r["n_flat"], r["var_num_sum"],
                       r["cov_num_sum"], r["cov_num_max"])
        for r in znorm_window_stats(df, weights).collect()
    }

    expect = {}
    for uid, vs in vals.items():
        cents = [int(v * 100 + 0.5) for v in vs]
        wins = [cents[i:i + m] for i in range(len(cents) - m + 1)]
        if not wins:
            continue
        stats = []
        for win in wins:
            sx, sxx = sum(win), sum(x * x for x in win)
            sxp = sum(w * x for w, x in zip(weights, win))
            var_num = m * sxx - sx * sx
            cov_num = m * sxp - sum(weights) * sx
            stats.append((var_num, cov_num))
        expect[uid] = (
            len(stats),
            sum(1 for v, _ in stats if v == 0),
            sum(v for v, _ in stats),
            sum(c for _, c in stats),
            max(c for _, c in stats),
        )
    assert got == expect
    # the all-flat user: every window flat, zero numerators
    assert got[2][1] == got[2][0] and got[2][2] == 0 and got[2][3] == 0


def test_znorm_window_stats_rejects_bad_params(spark):
    import pytest
    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.timeseries import znorm_window_stats

    df = spark.createDataFrame(
        [Row(event_id=1, ts=None, user_id=1, value=1.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    with pytest.raises(ValueError, match=">= 2"):
        znorm_window_stats(df, [1])
    with pytest.raises(ValueError, match="integers"):
        znorm_window_stats(df, [1.5, 2.0])


def test_epoch_seconds_floors_pre_epoch_fractional_timestamps(spark):
    """r8 (r7 ADVICE): ``unix_micros(ts) div 1000000`` truncates toward
    zero, so 1969-12-31 23:59:59.5 (epoch -0.5 s) mapped to second 0
    while every oracle floors it to -1 — pre-epoch window ordering and
    hashes could diverge.  ``epoch_seconds`` (now used by the znorm /
    pattern-match / behavior operators) must floor on both sides of
    1970, matching Python's floor of the true epoch value."""
    import datetime
    import math

    from pyspark.sql import Row

    from telemetry_streaming_spark.functions import epoch_seconds

    ts_list = [
        datetime.datetime(1969, 12, 31, 23, 59, 58, 250000),
        datetime.datetime(1969, 12, 31, 23, 59, 59, 500000),
        datetime.datetime(1970, 1, 1, 0, 0, 0, 0),
        datetime.datetime(1970, 1, 1, 0, 0, 0, 750000),
        datetime.datetime(2024, 6, 1, 12, 30, 15, 123456),
    ]
    df = spark.createDataFrame([Row(i=i, ts=t) for i, t in enumerate(ts_list)])
    got = {r.i: r.s for r in df.select("i", epoch_seconds("ts").alias("s")).collect()}
    utc = datetime.timezone.utc
    expect = {
        i: math.floor(t.replace(tzinfo=utc).timestamp())
        for i, t in enumerate(ts_list)
    }
    assert got == expect
    assert got[1] == -1  # the truncation-vs-floor divergence case


def _dtw_replica(win, pattern, band):
    """Banded DTW over integer sequences — the pure-Python pin."""
    inf = float("inf")
    m = len(pattern)
    prev = [inf] * m
    for i in range(m):
        cur = [inf] * m
        for j in range(max(0, i - band), min(m - 1, i + band) + 1):
            d = (win[i] - pattern[j]) ** 2
            if i == 0 and j == 0:
                best = 0
            else:
                best = min([prev[j]] + ([cur[j - 1], prev[j - 1]] if j > 0 else []))
            cur[j] = d + best
        prev = cur
    return prev[m - 1]


def test_dtw_window_stats_matches_python_replica(spark):
    """Integer replica pin for the banded-DTW companion (r7 verdict
    item 4): per-key window counts, min/summed distances, and the
    earliest best-window timestamp recomputed in pure Python over the
    same (ts, id)-ordered cent values — including an all-flat key and
    a too-short key, plus band=0 (pure euclidean diagonal)."""
    import datetime

    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.timeseries import dtw_window_stats

    t0 = datetime.datetime(2024, 1, 1)
    base_s = int(t0.replace(tzinfo=datetime.timezone.utc).timestamp())
    pattern_cents = [100, 300, 200, 400]
    m = len(pattern_cents)
    vals = {
        1: [1.0, 2.0, 4.0, 8.0, 3.0, 2.5],
        2: [5.0] * 5,
        3: [1.0, 1.0],
    }
    rows = []
    eid = 0
    for uid, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append(Row(
                event_id=eid, ts=t0 + datetime.timedelta(seconds=i),
                user_id=uid, event_type="x", value=v, props="{}",
            ))
            eid += 1
    df = spark.createDataFrame(rows)

    for band in (0, 1):
        got = {
            r.user_id: (r.n_windows, r.dtw_min, r.dtw_sum, r.best_ts_s)
            for r in dtw_window_stats(df, pattern_cents, band=band).collect()
        }
        expect = {}
        for uid, vs in vals.items():
            cents = [int(v * 100 + 0.5) for v in vs]
            wins = [(i, cents[i:i + m]) for i in range(len(cents) - m + 1)]
            if not wins:
                continue
            ds = [(_dtw_replica(w, pattern_cents, band), base_s + i) for i, w in wins]
            dmin = min(d for d, _ in ds)
            expect[uid] = (
                len(ds), dmin, sum(d for d, _ in ds),
                min(t for d, t in ds if d == dmin),
            )
        assert got == expect, (band, got, expect)


def test_dtw_window_stats_pins_the_float_tier(spark):
    """The companion IS the float tier's verification oracle: with
    pattern = pattern_cents / 100, the float dtw_pattern_match distance
    of the best window equals dtw_min / 1e4 exactly (cent diffs square
    to 1e4 x dollar diffs), and the best window's ts matches."""
    import datetime

    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.timeseries import (
        dtw_pattern_match,
        dtw_window_stats,
    )

    t0 = datetime.datetime(2024, 1, 1)
    pattern_cents = [100, 300, 200, 400]
    rows = [
        Row(event_id=i, ts=t0 + datetime.timedelta(seconds=i),
            user_id=1, event_type="x", value=v, props="{}")
        for i, v in enumerate([1.0, 2.0, 4.0, 8.0, 3.0, 2.5, 1.0, 3.1, 2.0, 4.2])
    ]
    df = spark.createDataFrame(rows)
    stats = dtw_window_stats(df, pattern_cents, band=1).collect()[0]
    top = dtw_pattern_match(
        df, [c / 100 for c in pattern_cents], band=1, k=1
    ).collect()[0]
    assert abs(top["dtw_dist"] - stats["dtw_min"] / 1e4) < 1e-9
    assert top["ts_s"] == stats["best_ts_s"]


def test_dtw_window_stats_rejects_bad_args(spark):
    import pytest
    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.timeseries import dtw_window_stats

    import datetime

    df = spark.createDataFrame(
        [Row(event_id=1, ts=datetime.datetime(2024, 1, 1), user_id=1, value=1.0)]
    )
    with pytest.raises(ValueError, match=">= 2"):
        dtw_window_stats(df, [100])
    with pytest.raises(ValueError, match="band"):
        dtw_window_stats(df, [100, 200], band=-1)
    with pytest.raises(ValueError, match="integers"):
        dtw_window_stats(df, [100.5, 200])


def test_concurrency_sweep_hand_intervals(spark):
    """late r8: hand-checkable sweep — [0,10)+[5,15) overlap to peak 2
    in bucket 0 (bucket_s=3600 puts everything in one bucket for the
    intra case); a window spanning a bucket boundary carries its open
    count into the next bucket (peak there stays 1 even though the
    only local delta is a close); a close and an open at the same
    instant never double-count (close sorts first)."""
    import datetime as dt

    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.timeseries import concurrency_sweep

    def ts(sec):
        return dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
            seconds=sec
        )

    # duration 10s, bucket 100s
    rows = [Row(ts=ts(s)) for s in (0, 5, 20, 95, 130)]
    # windows: [0,10) [5,15) [20,30) [95,105) [130,140)
    df = spark.createDataFrame(rows)
    got = {
        r.bucket: (r.n_deltas, r.peak_concurrency)
        for r in concurrency_sweep(df, duration_s=10, bucket_s=100).collect()
    }
    # bucket 0: deltas at 0+,5+,10-,15-,20+,30-,95+ -> peaks 2
    # bucket 1: deltas at 105-,130+,140- with carry-in 1 -> peak 1
    assert got == {0: (7, 2), 1: (3, 1)}

    # close-before-open tie: [0,10) and [10,20) never overlap
    df2 = spark.createDataFrame([Row(ts=ts(0)), Row(ts=ts(10))])
    got2 = {
        r.bucket: r.peak_concurrency
        for r in concurrency_sweep(df2, duration_s=10, bucket_s=3600).collect()
    }
    assert got2 == {0: 1}


def test_concurrency_sweep_negative_epoch_floor_buckets(spark):
    """r9 (r8 ADVICE): pre-1970 timestamps (negative epoch seconds)
    must bucket by FLOOR division, matching the oracle's `//` — a
    truncate-toward-zero `div` would put t=-7 (bucket_s=100) in bucket
    0 instead of -1 and shift the intra-bucket prefix maxima."""
    import datetime as dt

    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.timeseries import concurrency_sweep

    def ts(sec):
        return dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
            seconds=sec
        )

    # windows: [-150,-140) [-7,3) [0,10) — the -7 start floors to
    # bucket -1 and overlaps [0,10)'s bucket-0 carry
    df = spark.createDataFrame([Row(ts=ts(s)) for s in (-150, -7, 0)])
    got = {
        r.bucket: (r.n_deltas, r.peak_concurrency)
        for r in concurrency_sweep(df, duration_s=10, bucket_s=100).collect()
    }
    # bucket -2: open -150, close -140 -> peak 1
    # bucket -1: open -7 -> peak 1 (carry 0)
    # bucket 0: open 0, close 3, close 10, carry-in 1 -> peak 2
    assert got == {-2: (2, 1), -1: (1, 1), 0: (3, 2)}


def test_cusum_shifts_matches_sequential_recurrence(spark):
    """r9: the closed-form (prefix sum + running extrema) CUSUM must
    equal the textbook sequential recurrence S+ = max(0, S+ + d),
    S- = max(0, S- - d) computed in plain Python, on a series with a
    deliberate upward level shift — and the alert must fire only
    after the shift accumulates."""
    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.timeseries import cusum_shifts

    vals = [10, 9, 11, 10, 10, 16, 17, 16, 18, 17]  # shift up at i=5
    rows = [Row(k="a", day=i, value=v) for i, v in enumerate(vals)]
    # a flat second key: never alerts, CUSUM pinned at 0
    rows += [Row(k="b", day=i, value=5) for i in range(4)]
    df = spark.createDataFrame(rows)
    got = {
        (r.k, r.day): r
        for r in cusum_shifts(
            df, ["k"], "day", "value", threshold_pct=50
        ).collect()
    }

    target = sum(vals) // len(vals)
    sp = sn = 0
    for i, v in enumerate(vals):
        d = v - target
        sp = max(0, sp + d)
        sn = max(0, sn - d)
        r = got[("a", i)]
        assert (r.cusum_pos, r.cusum_neg) == (sp, sn), f"i={i}"
        assert r.target == target
        assert r.alert == int(
            100 * sp > 50 * target or 100 * sn > 50 * target
        )
    # the shift must actually have alerted by the end
    assert got[("a", len(vals) - 1)].alert == 1
    for i in range(4):
        r = got[("b", i)]
        assert (r.cusum_pos, r.cusum_neg, r.alert) == (0, 0, 0)
