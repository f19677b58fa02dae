"""Pins for operators/validation.py: planted violations of every rule
kind, NULL-handling contracts, and bloom-vs-exact referential
agreement."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from telemetry_streaming_spark.operators.validation import (
    accepted_values,
    in_range,
    matches,
    not_null,
    referential,
    unique,
    validate,
)


def _counts(df):
    return {r["rule"]: r["n_violations"] for r in df.collect()}


def test_row_rules_count_planted_violations(spark):
    df = spark.createDataFrame(
        [
            Row(a=1, s="ok", v="x"),
            Row(a=None, s="ok", v="y"),      # null a
            Row(a=99, s="bad!", v="x"),      # out of range + bad format
            Row(a=5, s="ok", v="zz"),        # bad domain
        ]
    )
    got = _counts(
        validate(
            df,
            [
                not_null("a_nn", "a"),
                in_range("a_rng", "a", 0, 10),
                matches("s_fmt", "s", "^[a-z]+$"),
                accepted_values("v_dom", "v", ["x", "y"]),
            ],
        )
    )
    assert got == {"a_nn": 1, "a_rng": 1, "s_fmt": 1, "v_dom": 1}


def test_nulls_only_flagged_by_not_null(spark):
    df = spark.createDataFrame([Row(a=None, s=None, v=None)], "a int, s string, v string")
    got = _counts(
        validate(
            df,
            [
                in_range("rng", "a", 0, 10),
                matches("fmt", "s", "^x$"),
                accepted_values("dom", "v", ["x"]),
            ],
        )
    )
    assert got == {"rng": 0, "fmt": 0, "dom": 0}


def test_unique_counts_extra_rows(spark):
    df = spark.createDataFrame(
        [Row(k=1, j=1), Row(k=1, j=1), Row(k=1, j=2), Row(k=2, j=1)]
    )
    got = _counts(validate(df, [unique("k_uni", "k"), unique("kj_uni", "k", "j")]))
    # k: 4 rows, 2 distinct -> 2 extras; (k,j): 4 rows, 3 distinct -> 1
    assert got == {"k_uni": 2, "kj_uni": 1}


def test_unique_ignores_null_key_rows(spark):
    """NULL-key rows are not_null's business: 2 dup rows + 3 NULL-key
    rows must report 1 violation, not 4 (ADVICE r5 — COUNT(*) in the
    minuend double-counted NULLs across the two rules)."""
    df = spark.createDataFrame(
        [Row(k=1), Row(k=1), Row(k=None), Row(k=None), Row(k=None)],
        schema="k int",
    )
    got = _counts(validate(df, [unique("k_uni", "k"), not_null("k_nn", "k")]))
    assert got == {"k_uni": 1, "k_nn": 3}
    # composite key: a row with ANY NULL component is skipped
    df2 = spark.createDataFrame(
        [Row(k=1, j=1), Row(k=1, j=1), Row(k=1, j=None), Row(k=None, j=1)],
        schema="k int, j int",
    )
    got2 = _counts(validate(df2, [unique("kj_uni", "k", "j")]))
    assert got2 == {"kj_uni": 1}


@pytest.mark.parametrize("use_bloom", [True, False])
def test_referential_counts_dangling_fks(spark, use_bloom):
    df = spark.createDataFrame(
        [Row(fk=1), Row(fk=2), Row(fk=999), Row(fk=999), Row(fk=None)]
    )
    ref = spark.createDataFrame([Row(pk=i) for i in range(10)])
    got = _counts(
        validate(
            df,
            [referential("fk_ref", "fk", ref, "pk", use_bloom=use_bloom)],
        )
    )
    # two dangling rows (999 twice); NULL fk skipped by contract
    assert got == {"fk_ref": 2}


def test_bloom_and_exact_referential_agree_on_random_data(spark):
    import random

    rng = random.Random(31)
    df = spark.createDataFrame([Row(fk=rng.randint(0, 3_000)) for _ in range(2_000)])
    ref = spark.createDataFrame([Row(pk=i) for i in range(0, 3_000, 2)])
    a = _counts(validate(df, [referential("r", "fk", ref, "pk", use_bloom=True)]))
    b = _counts(validate(df, [referential("r", "fk", ref, "pk", use_bloom=False)]))
    assert a == b


def test_validate_rejects_bad_input(spark):
    df = spark.createDataFrame([Row(a=1)])
    with pytest.raises(ValueError):
        validate(df, [])
    with pytest.raises(ValueError):
        validate(df, [not_null("x", "a"), in_range("x", "a", 0, 1)])  # dup name
    with pytest.raises(ValueError):
        validate(df, [not_null("bad name'", "a")])
    with pytest.raises(ValueError):
        not_null("nn")  # no columns
    with pytest.raises(ValueError):
        accepted_values("d", "a", [])
    with pytest.raises(ValueError):
        unique("u")


def test_clean_table_reports_zero_rows_per_rule(spark):
    df = spark.createDataFrame([Row(a=1), Row(a=2)])
    got = _counts(validate(df, [not_null("nn", "a"), unique("u", "a")]))
    assert got == {"nn": 0, "u": 0}
