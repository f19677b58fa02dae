"""EventPingEvents + ExperimentEnrollments golden parity
(EventPingEventsTest.scala, ExperimentEnrollmentsAggregatorTest.scala;
counts in FIXTURES.md §8)."""

import datetime

from telemetry_streaming_spark.jobs.event_ping_events import explode_events
from telemetry_streaming_spark.jobs.experiment_enrollments import aggregate as enroll_agg
from tests.fixtures import event_ping, main_ping, to_df

K = 4


def test_default_event_ping_four_rows(spark):
    """default event ping => 4 flat rows (1 parent + 3 dynamic); 10
    pings => 40 (EventPingEventsTest.scala:20)."""
    assert explode_events(to_df(spark, [event_ping()])).count() == 4
    assert explode_events(to_df(spark, [event_ping() for _ in range(10)])).count() == 40


def test_first_event_row_golden(spark):
    """exact first EventRow (EventPingEventsTest.scala:23-29)."""
    rows = explode_events(to_df(spark, [event_ping()])).collect()
    parent = [r for r in rows if r.event_process == "parent"]
    assert len(parent) == 1
    r = parent[0]
    assert r.document_id == "an_id"
    assert r.client_id == "client1"
    assert r.normalized_channel == "release"
    assert r.country == "IT"
    assert r.locale == "it_IT"
    assert r.app_name == "Firefox"
    assert r.app_version == "62.0"
    assert r.os == "Linux"
    assert r.os_version == "42"
    assert r.session_id == "dd302e9d-569b-4058-b7e8-02b2ff83522c"
    assert r.subsession_id == "79a2728f-af12-4ed3-b56d-0531a03c2f26"
    assert r.session_start_time == 1530291900000
    assert r.timestamp == 1460036116  # ns -> s
    assert r.sample_id == "73"  # double -> int string (bug 1507238)
    assert r.event_timestamp == 123456
    assert r.event_category == "activity_stream"
    assert r.event_method == "end"
    assert r.event_object == "session"
    assert r.event_string_value == "909"
    assert r.event_map_values == {"addon_version": "2018.06.22"}


def test_event_without_optionals(spark):
    rows = explode_events(
        to_df(spark, [event_ping(events={"parent": [[1, "cat", "m", "o"]]})])
    ).collect()
    assert len(rows) == 1
    assert rows[0].event_string_value is None
    assert rows[0].event_map_values is None


def test_experiments_map(spark):
    rows = explode_events(
        to_df(spark, [event_ping(events={"parent": [[1, "c", "m", "o"]]}, experiments={"exp1": "six"})])
    ).collect()
    assert rows[0].experiments == {"exp1": "six"}


def _enroll_event(method, experiment, branch):
    return [554879, "normandy", method, "preference_study", experiment, {"branch": branch}]


def test_enrollment_counts_golden(spark):
    """k enroll + k unenroll (ExpA/six) + k enroll (ExpB/one) => rows
    (ExpA,six,k,k), (ExpB,one,k,0) in window 13:35-13:40
    (ExperimentEnrollmentsAggregatorTest.scala:37-67)."""
    pings = (
        [event_ping(events={"dynamic": [_enroll_event("enroll", "ExpA", "six")]}) for _ in range(K)]
        + [event_ping(events={"dynamic": [_enroll_event("unenroll", "ExpA", "six")]}) for _ in range(K)]
        + [event_ping(events={"dynamic": [_enroll_event("enroll", "ExpB", "one")]}) for _ in range(K)]
    )
    rows = {(r.experiment_id, r.branch_id): r for r in enroll_agg(to_df(spark, pings)).collect()}
    assert set(rows) == {("ExpA", "six"), ("ExpB", "one")}
    a, b = rows[("ExpA", "six")], rows[("ExpB", "one")]
    assert (a.enroll_count, a.unenroll_count) == (K, K)
    assert (b.enroll_count, b.unenroll_count) == (K, 0)
    assert a.window_start == datetime.datetime(2016, 4, 7, 13, 35)
    assert a.window_end == datetime.datetime(2016, 4, 7, 13, 40)
    assert a.object == "preference_study"
    assert a.submission_date_s3 == "20160407"


def test_enrollment_from_main_ping_dynamic_only(spark):
    """main pings contribute normandy events only from the dynamic
    process (MainPing.scala:131-134)."""
    ping_dynamic = main_ping(
        payload={"processes": {"dynamic": {"events": [_enroll_event("enroll", "ExpC", "two")]}}}
    )
    ping_parent = main_ping(
        payload={"processes": {"parent": {"events": [_enroll_event("enroll", "ExpD", "two")]}}}
    )
    rows = enroll_agg(to_df(spark, [ping_dynamic, ping_parent])).collect()
    ids = {r.experiment_id for r in rows}
    assert ids == {"ExpC"}
