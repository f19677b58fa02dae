"""asof_join / interval_join semantics + plan-shape gates.

The temporal joins must behave like DuckDB ASOF JOIN / a range
predicate join while compiling to equi-shuffle plans only (no
BroadcastNestedLoopJoin, no CartesianProduct) — that is the whole
point of the operators (operators/joins.py).
"""

from datetime import datetime, timedelta

import pytest

from telemetry_streaming_spark.operators.joins import asof_join, interval_join
from tests.test_plans import explain_str


def t(minute, second=0):
    return datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, "A", t(3)),
            (2, "A", t(5)),   # exact tie with a right row
            (3, "A", t(0) - timedelta(minutes=1)),  # before any right row
            (4, "B", t(59)),
            (5, "C", t(0)),   # key absent on the right
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("A", t(0), 1.0),
            ("A", t(5), 2.0),
            ("B", t(1), 5.0),
        ],
        "k string, rts timestamp, px double",
    )
    return left, right


def _by_id(df):
    return {r["id"]: r for r in df.collect()}


def test_asof_backward_with_ties(sides):
    left, right = sides
    out = _by_id(asof_join(left, right, left_on="k", left_ts="ts", right_ts="rts"))
    assert out[1]["px"] == 1.0 and out[1]["rts"] == t(0)
    assert out[2]["px"] == 2.0          # tie matches by default
    assert out[3]["px"] is None and out[3]["rts"] is None
    assert out[4]["px"] == 5.0
    assert out[5]["px"] is None
    assert set(out[1].asDict()) == {"id", "k", "ts", "rts", "px"}


def test_asof_backward_strict_excludes_tie(sides):
    left, right = sides
    out = _by_id(
        asof_join(left, right, left_on="k", left_ts="ts", right_ts="rts", strict=True)
    )
    assert out[2]["px"] == 1.0          # t(5) tie skipped -> t(0)
    assert out[1]["px"] == 1.0
    assert out[3]["px"] is None


def test_asof_forward(sides):
    left, right = sides
    out = _by_id(
        asof_join(left, right, left_on="k", left_ts="ts", right_ts="rts", direction="forward")
    )
    assert out[1]["px"] == 2.0          # next at-or-after t(3) is t(5)
    assert out[2]["px"] == 2.0          # tie matches
    assert out[3]["px"] == 1.0          # first A quote
    assert out[4]["px"] is None         # nothing after t(59) for B
    out_strict = _by_id(
        asof_join(
            left, right, left_on="k", left_ts="ts", right_ts="rts",
            direction="forward", strict=True,
        )
    )
    assert out_strict[2]["px"] is None  # tie excluded, nothing later


def test_asof_tolerance(sides):
    left, right = sides
    out = _by_id(
        asof_join(
            left, right, left_on="k", left_ts="ts", right_ts="rts", tolerance_seconds=60
        )
    )
    assert out[1]["px"] is None         # 3 min gap > 60 s tolerance
    assert out[2]["px"] == 2.0          # 0 s gap survives


def test_asof_column_collision_raises(sides):
    left, right = sides
    with pytest.raises(ValueError, match="collides"):
        asof_join(
            left.withColumn("px", left["id"] * 1.0),
            right, left_on="k", left_ts="ts", right_ts="rts",
        )


def test_asof_plan_has_no_join_node(sides):
    """The union+window formulation must not contain a join at all —
    one hash exchange on the key feeds a sort + window."""
    left, right = sides
    plan = explain_str(asof_join(left, right, left_on="k", left_ts="ts", right_ts="rts"))
    physical = plan.split("== Physical Plan ==")[-1]
    assert "Join" not in physical
    assert "Window" in physical and "hashpartitioning(_k0" in physical


@pytest.fixture(scope="module")
def interval_sides(spark):
    points = spark.createDataFrame(
        [
            (10, "A", t(0)),           # on the start boundary of iv 1
            (11, "A", t(2, 30)),
            (12, "A", t(5)),           # on the end boundary of iv 1
            (13, "A", t(30)),          # outside every interval
            (14, "B", t(2)),           # key B has no interval
        ],
        "pid long, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(1, "A", t(0), t(5)), (2, "A", t(4), t(6))],
        "iv long, k string, start timestamp, end timestamp",
    )
    return points, intervals


def pairs_of(df):
    return sorted((r["iv"], r["p_pid"]) for r in df.collect())


def test_interval_join_closed_modes(interval_sides):
    points, intervals = interval_sides
    kw = dict(
        point_on="k", point_ts="ts", interval_start="start", interval_end="end",
        bin_seconds=60, point_prefix="p_",
    )
    # [start, end): boundary start in, end out; 60 s bins => iv 1 spans 6 bins
    assert pairs_of(interval_join(points, intervals, closed="left", **kw)) == [
        (1, 10), (1, 11), (2, 12),
    ]
    assert pairs_of(interval_join(points, intervals, closed="right", **kw)) == [
        (1, 11), (1, 12), (2, 12),
    ]
    assert pairs_of(interval_join(points, intervals, closed="both", **kw)) == [
        (1, 10), (1, 11), (1, 12), (2, 12),
    ]
    assert pairs_of(interval_join(points, intervals, closed="neither", **kw)) == [
        (1, 11), (2, 12),
    ]


def test_interval_join_multi_bin_no_duplicates(interval_sides):
    """An interval spanning many bins must still emit each matching
    pair exactly once (a point lands in exactly one bin)."""
    points, intervals = interval_sides
    out = interval_join(
        points, intervals,
        point_on="k", point_ts="ts", interval_start="start", interval_end="end",
        bin_seconds=10, closed="both", point_prefix="p_",  # iv 1 covers 31 bins
    )
    got = pairs_of(out)
    assert got == sorted(set(got))
    assert got == [(1, 10), (1, 11), (1, 12), (2, 12)]


def test_interval_join_plan_is_equi_join(interval_sides):
    points, intervals = interval_sides
    plan = explain_str(
        interval_join(
            points, intervals,
            point_on="k", point_ts="ts", interval_start="start", interval_end="end",
            bin_seconds=60, point_prefix="p_",
        )
    )
    physical = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastNestedLoopJoin" not in physical
    assert "CartesianProduct" not in physical


def test_query_plan_gates(spark):
    """Registry-level pins for the two temporal-join queries."""
    from telemetry_streaming_spark.plans.queries import QUERIES
    from tests.conftest import SF_SMOKE

    asof_plan = explain_str(QUERIES["asof_join"].fn(spark, SF_SMOKE))
    physical = asof_plan.split("== Physical Plan ==")[-1]
    assert "Join" not in physical

    range_plan = explain_str(QUERIES["range_join"].fn(spark, SF_SMOKE))
    physical = range_plan.split("== Physical Plan ==")[-1]
    assert "BroadcastNestedLoopJoin" not in physical
    assert "CartesianProduct" not in physical


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_enrich_matches_asof_join(sides, direction, strict):
    """The streaming-compatible array-probe formulation must agree
    with the union+window batch operator on every (direction, strict)
    combination."""
    from telemetry_streaming_spark.operators.joins import asof_enrich

    left, right = sides
    kw = dict(left_on="k", left_ts="ts", right_ts="rts", direction=direction, strict=strict)
    want = {r["id"]: (r["rts"], r["px"]) for r in asof_join(left, right, **kw).collect()}
    got = {r["id"]: (r["rts"], r["px"]) for r in asof_enrich(left, right, **kw).collect()}
    assert got == want


def test_asof_enrich_plan_has_no_shuffle_of_left(sides):
    """The stream side must not be exchanged: one broadcast join, no
    hash exchange of the left, no window/sort."""
    from telemetry_streaming_spark.operators.joins import asof_enrich

    left, right = sides
    plan = explain_str(asof_enrich(left, right, left_on="k", left_ts="ts", right_ts="rts"))
    physical = plan.split("== Physical Plan ==")[-1]
    assert "BroadcastHashJoin" in physical
    assert "Window" not in physical


class TestIntervalOverlapJoin:
    def test_matches_naive_and_emits_each_pair_once(self, spark):
        """Adversarial shapes: intervals spanning MANY bins (the
        first-shared-bin trick must still emit each overlapping pair
        exactly once), touching-but-not-overlapping edges, nested
        intervals."""
        from datetime import datetime, timedelta

        from telemetry_streaming_spark.operators.joins import interval_overlap_join

        t0 = datetime(2024, 1, 1)

        def iv(id_, user, start_min, end_min):
            return (id_, user, t0 + timedelta(minutes=start_min), t0 + timedelta(minutes=end_min))

        left = spark.createDataFrame(
            [iv(1, 1, 0, 300),      # spans many 10-min bins
             iv(2, 1, 50, 60),
             iv(3, 2, 0, 10)],
            "lid long, user_id long, ls timestamp, le timestamp",
        )
        right = spark.createDataFrame(
            [iv(10, 1, 100, 110),   # nested inside interval 1
             iv(11, 1, 60, 70),     # touches interval 2 at 60: NO overlap (half-open)
             iv(12, 1, 55, 65),     # overlaps interval 2 and 1
             iv(13, 2, 10, 20),     # touches interval 3: no overlap
             iv(14, 3, 0, 100)],    # different user
            "rid long, user_id long, rs timestamp, re timestamp",
        )
        out = interval_overlap_join(
            left, right, on="user_id",
            left_start="ls", left_end="le", right_start="rs", right_end="re",
            bin_seconds=600,
        ).select("lid", "r_rid").collect()
        pairs = sorted((r.lid, r.r_rid) for r in out)
        assert pairs == [(1, 10), (1, 11), (1, 12), (2, 12)]
        assert len(pairs) == len(set(pairs))  # exactly-once emission

    def test_empty_and_inverted_intervals_never_overlap(self, spark):
        """Half-open semantics: [x, x) has zero measure, so an empty
        interval strictly inside another must NOT be emitted (it used
        to satisfy the residual predicate); inverted intervals
        (end < start) are corrupt rows and are dropped too."""
        from datetime import datetime, timedelta

        from telemetry_streaming_spark.operators.joins import interval_overlap_join

        t0 = datetime(2024, 1, 1)

        def iv(id_, user, start_min, end_min):
            return (id_, user, t0 + timedelta(minutes=start_min), t0 + timedelta(minutes=end_min))

        left = spark.createDataFrame(
            [iv(1, 1, 5, 5),      # empty, strictly inside right 10
             iv(2, 1, 30, 20),    # inverted
             iv(3, 1, 0, 60)],    # honest interval
            "lid long, user_id long, ls timestamp, le timestamp",
        )
        right = spark.createDataFrame(
            [iv(10, 1, 0, 60),
             iv(11, 1, 15, 15)],  # empty on the right side too
            "rid long, user_id long, rs timestamp, re timestamp",
        )
        out = interval_overlap_join(
            left, right, on="user_id",
            left_start="ls", left_end="le", right_start="rs", right_end="re",
            bin_seconds=600,
        ).select("lid", "r_rid").collect()
        assert sorted((r.lid, r.r_rid) for r in out) == [(3, 10)]

    def test_overwide_interval_raises_instead_of_exploding(self, spark):
        """A corrupt far-future end must fail fast with a sizing hint,
        not materialize millions of bin copies."""
        from datetime import datetime

        import pytest

        from telemetry_streaming_spark.operators.joins import interval_overlap_join

        left = spark.createDataFrame(
            [(1, 1, datetime(2024, 1, 1), datetime(2099, 1, 1))],
            "lid long, user_id long, ls timestamp, le timestamp",
        )
        right = spark.createDataFrame(
            [(2, 1, datetime(2024, 1, 1), datetime(2024, 1, 2))],
            "rid long, user_id long, rs timestamp, re timestamp",
        )
        j = interval_overlap_join(
            left, right, on="user_id",
            left_start="ls", left_end="le", right_start="rs", right_end="re",
            bin_seconds=60, max_bins_per_row=1000,
        )
        with pytest.raises(Exception, match="spans > 1000 bins"):
            j.collect()

    def test_plan_has_no_nested_loop(self, spark):
        from telemetry_streaming_spark.operators.joins import interval_overlap_join
        import contextlib, io

        left = spark.createDataFrame(
            [(1, 1)], "lid long, user_id long"
        ).selectExpr("lid", "user_id", "timestamp'2024-01-01' AS ls", "timestamp'2024-01-02' AS le")
        right = spark.createDataFrame(
            [(2, 1)], "rid long, user_id long"
        ).selectExpr("rid", "user_id", "timestamp'2024-01-01' AS rs", "timestamp'2024-01-02' AS re")
        j = interval_overlap_join(
            left, right, on="user_id",
            left_start="ls", left_end="le", right_start="rs", right_end="re",
            bin_seconds=3600,
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        assert "BroadcastNestedLoopJoin" not in buf.getvalue()
