"""Behavioral analytics operators: funnel ordering semantics,
retention invariants, gap bucketing."""

import datetime as dt

import pytest

from telemetry_streaming_spark.operators.behavior import (
    cohort_retention,
    conversion_funnel,
    inter_event_gaps,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_funnel_requires_strict_order(spark):
    rows = [
        # u1 completes in order
        (1, "view", 0), (1, "click", 10), (1, "purchase", 20),
        # u2 clicks BEFORE viewing: click must not count; no later click
        (2, "click", 0), (2, "view", 10), (2, "purchase", 20),
        # u3 views only
        (3, "view", 0),
        # u4 never views: not in the funnel at all
        (4, "click", 0), (4, "purchase", 10),
        # u5 same-timestamp click (not strictly after view): rejected,
        # but a later click rescues the funnel
        (5, "view", 0), (5, "click", 0), (5, "click", 7), (5, "purchase", 9),
    ]
    out = {r.user_id: r for r in conversion_funnel(
        _ev(spark, rows), ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 3, 5}
    assert out[1].stages_completed == 3
    assert out[2].stages_completed == 1 and out[2].stage2_ts is None
    assert out[3].stages_completed == 1
    assert out[5].stages_completed == 3
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    assert out[5].stage2_ts == base + 7
    assert out[5].stage3_ts == base + 9


def test_funnel_rejects_empty_stages(spark):
    with pytest.raises(ValueError):
        conversion_funnel(_ev(spark, [(1, "view", 0)]), [])


def test_retention_offset_zero_is_cohort_size(spark):
    day = 86_400
    rows = [
        (1, "view", 0), (1, "view", day + 5),          # active day 0 and 1
        (2, "view", 10),                                # day 0 only
        (3, "view", day), (3, "view", 3 * day),         # cohort day 1, back day 3
    ]
    out = {(r.cohort_period, r.offset): r.n_active
           for r in cohort_retention(_ev(spark, rows)).collect()}
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    assert out[(base, 0)] == 2          # users 1, 2
    assert out[(base, 1)] == 1          # user 1 returns
    assert out[(base + day, 0)] == 1    # user 3's cohort
    assert out[(base + day, 2)] == 1    # user 3 two days later
    # offset-0 count >= any later offset for the same cohort
    for (c, o), n in out.items():
        if o > 0:
            assert n <= out[(c, 0)]


def test_gap_buckets_are_log2_bit_length(spark):
    rows = [(1, "view", s) for s in [0, 1, 3, 10, 1000]]
    got = sorted((r.gap_s, r.gap_bucket) for r in inter_event_gaps(_ev(spark, rows)).collect())
    # gaps: 1, 2, 7, 990 -> bit lengths 1, 2, 3, 10
    assert got == [(1, 1), (2, 2), (7, 3), (990, 10)]


def test_gap_multiset_invariant_under_ties(spark):
    """Events sharing a floored second may sort either way; the gap
    multiset must not depend on the tie order."""
    rows = [(1, "view", 0), (1, "click", 0), (1, "view", 5)]
    gaps = sorted(r.gap_s for r in inter_event_gaps(_ev(spark, rows)).collect())
    assert gaps == [0, 5]
