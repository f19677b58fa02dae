"""Every registry query must survive empty input tables.

An engine that crashes on an empty partition/day/table is not
operable: at 100TB, empty slices are routine (a new tenant, a
filtered-out day, a cold-start corpus).  This sweep materializes a
schema-identical 0-row copy of every testdata table and runs the full
registry against it — queries must plan and execute to an empty (or
schema-stable) result, never raise."""

import os

import pytest

from telemetry_streaming_spark.plans.queries import QUERIES
from telemetry_streaming_spark.sources.registry import TABLES

SF_SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        df = spark.read.parquet(os.path.join(SF_SRC, f"{t}.parquet")).limit(0)
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    return d


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_tables(spark, empty_sf, name):
    df = QUERIES[name].fn(spark, empty_sf)
    rows = df.collect()
    assert isinstance(rows, list)
    assert len(df.schema.fields) > 0
    spark.catalog.clearCache()
