"""Observability (SURVEY §2.10 O1) — metric counters and observed
aggregates.

The reference registers LongAccumulators with Spark's metrics system
and marks them from sink code (AccumulatorMetricsSource.scala:38-94;
mark sites HttpSink.scala:66-71, :176-193: success / error / retry /
payload-too-large / dropped).  PySpark cannot subclass the JVM
``Source``, so the engine exposes the same surface two ways:

- :class:`SinkMetrics` — Python accumulators that executor-side sink
  code (foreach / foreachPartition) marks; values aggregate on the
  driver exactly like the reference's accumulators.  A metrics
  poller/exporter reads ``snapshot()`` on its own cadence (the
  reference polls every 10s).
- :func:`observe_counts` — ``df.observe`` wrapper for plan-level
  metrics (rows seen, rows rejected, ...) with zero extra passes over
  the data; batch reads come back via ``Observation``, streaming via
  ``QueryProgressEvent.observedMetrics``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Observation, SparkSession

METRIC_NAMES = ("success", "error", "retry", "payload_too_large", "dropped")


class SinkMetrics:
    """Accumulator-backed counters for executor-side sinks (O1).

    Instances are picklable into foreachPartition closures; ``add``s
    from any executor aggregate on the driver.
    """

    def __init__(self, spark: SparkSession, names: tuple[str, ...] = METRIC_NAMES):
        sc = spark.sparkContext
        self._acc = {n: sc.accumulator(0) for n in names}

    def mark(self, name: str, n: int = 1) -> None:
        self._acc[name].add(n)

    def value(self, name: str) -> int:
        return int(self._acc[name].value)

    def snapshot(self) -> dict[str, int]:
        return {n: int(a.value) for n, a in self._acc.items()}


def observe_counts(df: DataFrame, name: str, **metrics: Column):
    """Attach named observed aggregates to a plan: returns
    ``(df, observation)``.  Metrics are computed as a side output of
    the existing pass — no second scan (the idiomatic replacement for
    the reference's per-record accumulator bumps inside flatMap)."""
    obs = Observation(name)
    return df.observe(obs, *[m.alias(k) for k, m in metrics.items()]), obs


def reject_counters(valid: Column) -> dict[str, Column]:
    """The standard pair: rows seen / rows rejected, for the
    exception-as-filter parity mode (SURVEY §7.4 risk 3 —
    ``raiseOnError`` becomes 'assert rejected == 0')."""
    return {
        "rows_seen": F.count(F.lit(1)),
        "rows_rejected": F.sum(F.when(~valid, 1).otherwise(0)),
    }
