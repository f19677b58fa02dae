"""Property tests: behavioral operators vs brute-force references.

Randomized event logs (few users, colliding timestamps, missing
stages) exercise the boundary cases fixtures miss: same-second stage
events, funnels broken mid-way, users active in one period only,
zero-gap event bursts."""

from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from telemetry_streaming_spark.operators.behavior import (
    cohort_retention,
    conversion_funnel,
    inter_event_gaps,
)

EPOCH = datetime(2024, 1, 1)
EPOCH_S = int(EPOCH.replace(tzinfo=timezone.utc).timestamp())
STAGES = ["a", "b", "c"]

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),                      # user
        st.sampled_from(["a", "b", "c", "x"]),  # type (x = noise)
        st.integers(0, 30),                     # seconds
    ),
    min_size=1,
    max_size=25,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, t, EPOCH + timedelta(seconds=s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )


def _brute_funnel(rows):
    out = {}
    for user in {u for u, _, _ in rows}:
        mine = [(s, t) for u, t, s in rows if u == user]
        reached = []
        cur = None
        for stage in STAGES:
            cands = [
                s for s, t in mine
                if t == stage and (cur is None or s > cur)
            ]
            if not cands:
                break
            cur = min(cands)
            reached.append(cur + EPOCH_S)
        if reached:
            out[user] = reached
    return out


@pytest.mark.usefixtures("spark")
@given(rows=events_strategy)
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_funnel_matches_brute_force(spark, rows):
    got = {}
    for r in conversion_funnel(_df(spark, rows), STAGES).collect():
        ts = [r.stage1_ts, r.stage2_ts, r.stage3_ts]
        got[r.user_id] = [t for t in ts if t is not None]
        assert r.stages_completed == len(got[r.user_id])
        # NULLs only ever trail (a broken funnel never resumes)
        n = len(got[r.user_id])
        assert ts[:n] == got[r.user_id] and all(t is None for t in ts[n:])
    assert got == _brute_funnel(rows)


def _brute_retention(rows, p):
    activity = {(u, (s + EPOCH_S) - ((s + EPOCH_S) % p)) for u, _, s in rows}
    first = {}
    for u, per in activity:
        first[u] = min(first.get(u, per), per)
    out = {}
    for u, per in activity:
        key = (first[u], (per - first[u]) // p)
        out[key] = out.get(key, 0) + 1
    return out


@pytest.mark.usefixtures("spark")
@given(rows=events_strategy, period=st.sampled_from([5, 7, 86_400]))
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_retention_matches_brute_force(spark, rows, period):
    got = {
        (r.cohort_period, r.offset): r.n_active
        for r in cohort_retention(_df(spark, rows), period_seconds=period).collect()
    }
    assert got == _brute_retention(rows, period)


@pytest.mark.usefixtures("spark")
@given(rows=events_strategy)
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_gaps_match_brute_force(spark, rows):
    got = sorted(
        (r.user_id, r.gap_s) for r in inter_event_gaps(_df(spark, rows)).collect()
    )
    expected = []
    for user in {u for u, _, _ in rows}:
        ss = sorted(s for u, _, s in rows if u == user)
        expected += [(user, b - a) for a, b in zip(ss, ss[1:])]
    assert got == sorted(expected)
