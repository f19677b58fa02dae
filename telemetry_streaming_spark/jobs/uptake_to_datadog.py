"""UptakeEventsToDatadog — normandy/uptake events to DogStatsD
metrics (P24; UptakeEventsToDatadog.scala:60-113).

Metric construction is columnar (a DataFrame of metric structs); the
datagram string and the UDP ForeachWriter live in
sinks/dogstatsd.py.  Main pings contribute normandy events only
(MainPing.scala:131-134); event pings contribute both normandy and
uptake.remotecontent.result (EventPing.scala:42-48).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from telemetry_streaming_spark.functions import events as E
from telemetry_streaming_spark.functions import pings as P

ALLOWED_DOC_TYPES = ("main", "event")
UPTAKE_CATEGORIES = ("normandy", "uptake.remotecontent.result")

METRIC_DDL = "struct<name: string, value: string, type: string, tags: map<string,string>>"


def _uptake_events(ping) -> Column:
    meta = ping["meta"]
    payload = ping["payload"]
    main_events = E.main_ping_events(payload, processes=("dynamic",))
    event_events = E.event_ping_events(payload)
    events = F.when(meta["docType"] == "main", main_events).otherwise(event_events)
    allowed = F.when(meta["docType"] == "main", F.array(F.lit("normandy"))).otherwise(
        F.array(*[F.lit(c) for c in UPTAKE_CATEGORIES])
    )
    return F.filter(
        events, lambda pe: F.array_contains(allowed, pe["event"]["category"])
    )


def metrics(raw: DataFrame) -> DataFrame:
    """One row per DogStatsD metric: counters for every event, timer
    metrics when extra.duration / extra.age parse as ints."""
    return _metrics_parsed(P.parse_pings(raw))


def metrics_guarded(raw: DataFrame, streaming: bool = False):
    """``metrics()`` with the parse-rejection observation attached
    BEFORE the null-filter: returns ``(df, observation)``.  The
    --raise-on-error surface (UptakeEventsToDatadog.scala:117-118):
    undecodable envelopes are counted in the same pass and the caller
    raises when the count is nonzero (the only throw-path this job has
    — event filtering/docType misses are intentional drops).
    ``streaming=True`` attaches the observation by name (observation
    comes back None; per-batch values surface via
    QueryProgressEvent.observedMetrics, read by the CLI's guard
    listener exactly like error_aggregator's)."""
    from telemetry_streaming_spark.observability import observe_counts

    parsed = P.parsed_pings_raw(raw)
    bad = F.col("__corrupt").isNotNull() | F.col("ping").isNull()
    parsed, obs = observe_counts(
        parsed,
        "parse_guard",
        streaming=streaming,
        rows_seen=F.count(F.lit(1)),
        rows_rejected=F.sum(bad.cast("long")),
    )
    return (
        _metrics_parsed(
            parsed.where(F.col("__corrupt").isNull() & F.col("ping").isNotNull()).select("ping")
        ),
        obs,
    )


def count_parse_failures(raw: DataFrame) -> dict:
    """Explicit recount fallback for the empty-result path where
    Observation.get cannot deliver (observability.observation_counts)."""
    bad = F.col("__corrupt").isNotNull() | F.col("ping").isNull()
    row = (
        P.parsed_pings_raw(raw)
        .agg(
            F.count(F.lit(1)).alias("rows_seen"),
            F.sum(bad.cast("long")).alias("rows_rejected"),
        )
        .first()
    )
    return {"rows_seen": row["rows_seen"], "rows_rejected": row["rows_rejected"] or 0}


def _metrics_parsed(parsed: DataFrame) -> DataFrame:
    ping = F.col("ping")
    meta = ping["meta"]

    rows = (
        parsed.where(meta["docType"].isin(*ALLOWED_DOC_TYPES))
        .select(F.explode(_uptake_events(ping)).alias("pe"))
        .select(F.col("pe")["event"].alias("e"))
    )
    e = F.col("e")
    is_normandy = e["category"] == "normandy"

    normandy_name = F.concat_ws(
        ".", F.lit("telemetry"), e["category"], e["object"], e["method"]
    )
    normandy_tags = F.map_from_arrays(
        F.array(F.lit("experiment"), F.lit("branch")),
        F.array(
            F.coalesce(e["value"], F.lit("")),
            F.coalesce(e["extra"]["branch"], F.lit("")),
        ),
    )

    uptake_name = F.concat_ws(
        ".",
        F.lit("telemetry.uptake"),
        e["object"],
        e["method"],
        F.coalesce(e["value"], F.lit("null")),
    )
    source_parts = F.split(e["extra"]["source"], "/")
    # bug 1539249: tag uptake events with source type/subtype/details
    uptake_tags = F.map_filter(
        F.map_from_arrays(
            F.array(F.lit("source_type"), F.lit("source_subtype"), F.lit("source_details")),
            F.array(
                F.try_element_at(source_parts, F.lit(1)),
                F.try_element_at(source_parts, F.lit(2)),
                F.try_element_at(source_parts, F.lit(3)),
            ),
        ),
        lambda _, v: v.isNotNull(),
    )

    name = F.when(is_normandy, normandy_name).otherwise(uptake_name)
    tags = F.when(is_normandy, normandy_tags).otherwise(uptake_tags)

    counter = F.struct(
        name.alias("name"), F.lit("1").alias("value"), F.lit("c").alias("type"), tags.alias("tags")
    )

    def timer(extra_key: str) -> Column:
        # try_cast: the reference tolerates non-numeric durations
        # (Try(d.toInt).toOption); ANSI cast would throw
        v = e["extra"][extra_key].try_cast("int")
        return F.when(
            ~is_normandy & v.isNotNull(),
            F.struct(
                F.concat(uptake_name, F.lit(f".{extra_key}")).alias("name"),
                v.cast("string").alias("value"),
                F.lit("ms").alias("type"),
                tags.alias("tags"),
            ),
        )

    all_metrics = F.filter(
        F.array(counter, timer("duration"), timer("age")), lambda m: m.isNotNull()
    )
    return rows.select(F.explode(all_metrics).alias("m")).select(
        F.col("m")["name"].alias("name"),
        F.col("m")["value"].alias("value"),
        F.col("m")["type"].alias("type"),
        F.col("m")["tags"].alias("tags"),
    )
