"""Property and plan pins for operators/bloomfilter.py.

The oracle parity test proves the registry query exact; these pin the
operator guarantees the oracle cannot see: no false negatives, a sane
false-positive rate, and — the point of the operator — a shuffle-free
big-side probe plan.
"""

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from telemetry_streaming_spark.operators.bloomfilter import (
    MAX_BLOOM_BITS,
    bloom_semi_join,
    build_bloom,
    with_bloom_probe,
)


def _keys_df(spark, values):
    return spark.createDataFrame([Row(k=v) for v in values])


def test_bloom_has_no_false_negatives(spark):
    rng = random.Random(3)
    members = sorted(rng.sample(range(1_000_000), 2_000))
    table = build_bloom(_keys_df(spark, members), "k")
    probed = with_bloom_probe(
        _keys_df(spark, members), "k", table, m_bits=1 << 16, n_hashes=3
    )
    assert probed.where(~F.col("__bloom_hit")).count() == 0


def test_bloom_false_positive_rate_is_sane(spark):
    rng = random.Random(4)
    members = set(rng.sample(range(1_000_000), 2_000))
    non_members = [v for v in rng.sample(range(1_000_000, 2_000_000), 5_000)]
    table = build_bloom(_keys_df(spark, sorted(members)), "k")
    hits = (
        with_bloom_probe(
            _keys_df(spark, non_members), "k", table, m_bits=1 << 16, n_hashes=3
        )
        .where(F.col("__bloom_hit"))
        .count()
    )
    # theoretical ~ (1 - e^{-3*2000/65536})^3 ~= 6.4e-4; allow 10x slack
    assert hits / 5_000 < 0.01


def test_bloom_semi_join_is_exact(spark):
    rng = random.Random(5)
    big = spark.createDataFrame([Row(k=i, payload=i * 7) for i in range(5_000)])
    keys = _keys_df(spark, sorted(rng.sample(range(10_000), 800)))
    got = sorted(r["k"] for r in bloom_semi_join(big, "k", keys, "k").collect())
    expect = sorted(set(r["k"] for r in keys.collect()) & set(range(5_000)))
    assert got == expect


def test_bloom_probe_plan_has_no_exchange(spark):
    """The probe side must stay scan -> project/filter: zero shuffles
    before the confirm join (the whole point at 100TB)."""
    big = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    table = build_bloom(
        _keys_df(spark, list(range(100))), "k", m_bits=1 << 16, n_hashes=3
    )
    probed = with_bloom_probe(
        big, "c_custkey", table, m_bits=1 << 16, n_hashes=3
    ).where(F.col("__bloom_hit"))
    plan = probed._sc._jvm.PythonSQLUtils.explainString(
        probed._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan


def test_bloom_empty_keys_rejects_everything(spark):
    big = spark.createDataFrame([Row(k=i) for i in range(100)])
    empty = spark.createDataFrame([], "k bigint")
    assert bloom_semi_join(big, "k", empty, "k").count() == 0


def test_bloom_build_validates_params(spark):
    df = _keys_df(spark, [1, 2, 3])
    with pytest.raises(ValueError):
        build_bloom(df, "k", m_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        build_bloom(df, "k", m_bits=MAX_BLOOM_BITS * 2)
    with pytest.raises(ValueError):
        build_bloom(df, "k", n_hashes=0)
    with pytest.raises(ValueError):
        with_bloom_probe(df, "k", [0] * 10, m_bits=1 << 16, n_hashes=3)


def test_bloom_is_type_insensitive_across_build_and_probe(spark):
    """xxhash64 hashes value+type; the canonical string cast must make
    an INT-keyed build serve a BIGINT-keyed probe (and vice versa) —
    otherwise every true member misses and the 'EXACT semi-join'
    contract silently breaks (ADVICE r5)."""
    members = [1, 5, 42, 999, 777]
    keys_int = spark.createDataFrame(
        [Row(k=v) for v in members], schema="k int"
    )
    big_bigint = spark.createDataFrame(
        [Row(k=v, payload=v * 7) for v in range(1_000)],
        schema="k bigint, payload bigint",
    )
    table = build_bloom(keys_int, "k")
    probed = with_bloom_probe(
        big_bigint, "k", table, m_bits=1 << 16, n_hashes=3
    )
    hit = sorted(
        r["k"]
        for r in probed.where(F.col("__bloom_hit")).collect()
        if r["k"] in members
    )
    assert hit == sorted(members), "true members missed across key types"
    got = sorted(
        r["k"] for r in bloom_semi_join(big_bigint, "k", keys_int, "k").collect()
    )
    assert got == sorted(members)


def test_shrink_bloom_folding_is_exact(spark):
    """h % (m/2) == (h % m) % (m/2) for power-of-two m: the folded
    table must behave identically to a direct build at the folded size
    — no false negatives, and bit-for-bit the same words."""
    from telemetry_streaming_spark.operators.bloomfilter import shrink_bloom

    rng = random.Random(7)
    members = sorted(rng.sample(range(1_000_000), 300))
    big_table = build_bloom(_keys_df(spark, members), "k", m_bits=1 << 16)
    folded = shrink_bloom(big_table, max_density=0.5, min_words=16)
    assert len(folded) < len(big_table) and len(big_table) % len(folded) == 0
    direct = build_bloom(
        _keys_df(spark, members), "k", m_bits=len(folded) * 64
    )
    assert folded == direct
    probed = with_bloom_probe(
        _keys_df(spark, members), "k", folded,
        m_bits=len(folded) * 64, n_hashes=3,
    )
    assert probed.where(~F.col("__bloom_hit")).count() == 0


def test_shrink_bloom_respects_density_and_floor():
    from telemetry_streaming_spark.operators.bloomfilter import shrink_bloom

    # saturated table refuses to fold below the density cap
    dense = [-1] * 64  # all bits set
    assert shrink_bloom(dense, max_density=0.5, min_words=1) == dense
    # sparse table folds down to the word floor, never past it
    sparse = [1] + [0] * 1023
    assert len(shrink_bloom(sparse, min_words=16)) == 16
