"""Every oracle-backed registry query must match DuckDB exactly.

This is a local replica of the driver's CORRECTNESS gate (sf0.01);
run at sf0.001 by default for speed, sf0.01 with SPARK_GRAFT_PARITY_SF.
"""

import os

import pytest

from telemetry_streaming_spark.plans.queries import QUERIES
from tests.oracle_harness import compare_query

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    spec = QUERIES[name]
    compare_query(spark, duck, name, spec.fn, spec.oracle, SF_DIR)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    keys = set(e.queries())
    oracle_keys = set(e.oracle_sql())
    assert oracle_keys <= keys


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_are_deterministic(spark, name):
    """No SQL oracle means the driver only sees row counts — so pin
    the stronger property locally: two executions in one session must
    produce identical result sets (sketches, sampling, clustering and
    DP tiers are all seeded/deterministic by design)."""
    spec = QUERIES[name]
    a = sorted(map(str, spec.fn(spark, SF_DIR).collect()))
    b = sorted(map(str, spec.fn(spark, SF_DIR).collect()))
    assert a == b
    spark.catalog.clearCache()
