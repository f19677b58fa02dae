"""Property tests: the temporal joins vs independent reference
implementations — asof_join against pandas.merge_asof, interval_join
against a brute-force range scan.  Randomized keys/timestamps/ties
cover the boundary cases hand-picked fixtures miss (exact-tie rows,
empty keys, bin-boundary points, bin-width invariance)."""

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from telemetry_streaming_spark.operators.joins import asof_join, interval_join

EPOCH = datetime(2024, 1, 1)


def ts_of(s: int) -> datetime:
    return EPOCH + timedelta(seconds=s)


left_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=12
)
# dict keyed by (k, t) => right side unique per (key, ts), the
# operator's documented contract
right_rows = st.dictionaries(
    st.tuples(st.integers(0, 3), st.integers(0, 100)),
    st.integers(-5, 5),
    min_size=1,
    max_size=12,
)


@pytest.mark.usefixtures("spark")
@given(
    left=left_rows,
    right=right_rows,
    direction=st.sampled_from(["backward", "forward"]),
    strict=st.booleans(),
    tolerance=st.sampled_from([None, 0, 7, 30]),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_asof_matches_pandas_merge_asof(spark, left, right, direction, strict, tolerance):
    ldf = spark.createDataFrame(
        [(i, k, ts_of(t)) for i, (k, t) in enumerate(left)],
        "id long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, ts_of(t), float(px)) for (k, t), px in right.items()],
        "k long, rts timestamp, px double",
    )
    got = {
        r["id"]: r["px"]
        for r in asof_join(
            ldf, rdf, left_on="k", left_ts="ts", right_ts="rts",
            direction=direction, strict=strict, tolerance_seconds=tolerance,
        ).collect()
    }

    lp = pd.DataFrame(
        {"id": range(len(left)), "k": [k for k, _ in left], "ts": [ts_of(t) for _, t in left]}
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        {
            "k": [k for k, _ in right],
            "rts": [ts_of(t) for _, t in right],
            "px": [float(v) for v in right.values()],
        }
    ).sort_values("rts", kind="stable")
    ref = pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="k",
        direction=direction, allow_exact_matches=not strict,
        tolerance=None if tolerance is None else pd.Timedelta(seconds=tolerance),
    )
    want = {int(r.id): (None if pd.isna(r.px) else float(r.px)) for r in ref.itertuples()}
    assert got == want


interval_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100), st.integers(0, 40)),
    min_size=1,
    max_size=8,
)
point_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 140)), min_size=1, max_size=12
)


@pytest.mark.usefixtures("spark")
@given(
    points=point_rows,
    intervals=interval_rows,
    bin_seconds=st.sampled_from([1, 7, 60, 500]),
    closed=st.sampled_from(["left", "right", "both", "neither"]),
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_interval_join_matches_brute_force(spark, points, intervals, bin_seconds, closed):
    """Pairs must equal the brute-force range scan for every boundary
    mode, and be invariant to the bin width."""
    pdf = spark.createDataFrame(
        [(i, k, ts_of(t)) for i, (k, t) in enumerate(points)],
        "pid long, k long, ts timestamp",
    )
    idf = spark.createDataFrame(
        [(j, k, ts_of(s), ts_of(s + d)) for j, (k, s, d) in enumerate(intervals)],
        "iv long, k long, start timestamp, end timestamp",
    )
    out = interval_join(
        pdf, idf, point_on="k", point_ts="ts",
        interval_start="start", interval_end="end",
        bin_seconds=bin_seconds, closed=closed, point_prefix="p_",
    )
    got = sorted((r["iv"], r["p_pid"]) for r in out.collect())

    lo_ok = {"left": lambda t, s: t >= s, "both": lambda t, s: t >= s}.get(
        closed, lambda t, s: t > s
    )
    hi_ok = {"right": lambda t, e: t <= e, "both": lambda t, e: t <= e}.get(
        closed, lambda t, e: t < e
    )
    want = sorted(
        (j, i)
        for j, (ik, s, d) in enumerate(intervals)
        for i, (pk, t) in enumerate(points)
        if pk == ik and lo_ok(t, s) and hi_ok(t, s + d)
    )
    assert got == want
