"""Naive-reference pin for power_decay_ewma (calendar-gap handling is
the part a row-offset formulation gets wrong)."""

import pytest
import random

from pyspark.sql import Row

from telemetry_streaming_spark.operators.timeseries import power_decay_ewma


def _naive(rows, k):
    by_day = {(r["g"], r["day"]): r["v"] for r in rows}
    out = {}
    for (g, day), v in by_day.items():
        num = den = 0
        for j in range(k):
            src = by_day.get((g, day - j))
            if src is not None:
                num += src * (1 << (k - 1 - j))
                den += 1 << (k - 1 - j)
        out[(g, day)] = (v, num, den)
    return out


@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_power_decay_ewma_matches_naive_with_gaps(spark):
    rng = random.Random(11)
    rows = []
    for g in ["a", "b"]:
        day = 0
        for _ in range(40):
            day += rng.choice([1, 1, 2, 5])  # deliberate gaps
            rows.append(Row(g=g, day=day, v=rng.randint(0, 10_000)))
    df = spark.createDataFrame(rows)
    got = {
        (r["g"], r["day"]): (r["v"], r["ewma_num"], r["ewma_den"])
        for r in power_decay_ewma(df, ["g"], "day", "v", window_days=8).collect()
    }
    assert got == _naive([r.asDict() for r in rows], 8)


def test_power_decay_ewma_isolated_day_is_self_weighted(spark):
    df = spark.createDataFrame([Row(g="a", day=100, v=7)])
    [r] = power_decay_ewma(df, ["g"], "day", "v", window_days=8).collect()
    # only lag 0 present: num = 7 * 2^7, den = 2^7
    assert (r["ewma_num"], r["ewma_den"]) == (7 * 128, 128)


def test_power_decay_ewma_rejects_bad_window(spark):
    import pytest

    df = spark.createDataFrame([Row(g="a", day=1, v=1)])
    with pytest.raises(ValueError):
        power_decay_ewma(df, ["g"], "day", "v", window_days=0)
