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

# Two-tier split (r11, pytest.ini): the DEFAULT (fast) run checks the
# driver's OWN correctness sample — the 50-query LRU front window from
# plans/queries.py — so the fast tier replicates exactly the gate the
# driver will apply this round; the remaining queries run under
# `-m full` (the full 200+-query sweep that outgrew the driver's
# verify window in r10).
from telemetry_streaming_spark.plans.queries import _FRONT_WINDOW

_FAST_PARITY = set(_FRONT_WINDOW[:50])


def _tiered(names):
    return [
        n if n in _FAST_PARITY else pytest.param(n, marks=pytest.mark.full)
        for n in names
    ]


@pytest.mark.parametrize("name", _tiered(ORACLE_QUERIES))
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


# full tier: double-execution of every rows-only query (the fast tier
# keeps the single-run smoke above, so coverage is a time split only)
@pytest.mark.full
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
