"""ExperimentsErrorAggregator — the ErrorAggregator variant keyed by
experiment with the reduced dimension set and no histogram-error
metrics (ExperimentsErrorAggregator.scala:11-39; SURVEY Appendix A:
"8 dims, no histogram errors")."""

from __future__ import annotations

from pyspark.sql import DataFrame

from telemetry_streaming_spark.jobs import error_aggregator
from telemetry_streaming_spark.schemas import (
    ERROR_AGGREGATE_METRICS,
    EXPERIMENT_ERROR_DIMENSIONS,
)


def aggregate(raw: DataFrame, streaming: bool = False) -> DataFrame:
    return error_aggregator.aggregate(
        raw,
        streaming=streaming,
        dimensions=EXPERIMENT_ERROR_DIMENSIONS,
        stats=list(ERROR_AGGREGATE_METRICS),
    )
