"""resample_ffill / scd2_intervals semantics on hand data."""

import pytest

from telemetry_streaming_spark.operators.timeseries import resample_ffill, scd2_intervals


@pytest.fixture(scope="module")
def obs(spark):
    # key A: obs at 30s and 420s; key B: single obs exactly on a grid line
    return spark.createDataFrame(
        [("A", 30, 1.0), ("A", 420, 2.0), ("B", 600, 9.0)],
        "k string, ts_s long, v double",
    )


def test_resample_ffill_grid_and_fill(obs):
    out = {
        (r["k"], r["grid_ts_s"]): r["v"]
        for r in resample_ffill(obs, on="k", ts_seconds="ts_s", step_seconds=300).collect()
    }
    assert out == {
        ("A", 0): None,      # grid floor precedes the first observation
        ("A", 300): 1.0,     # carried forward from ts 30
        ("B", 600): 9.0,     # on-grid observation matches itself
    }


def test_resample_ffill_origin_shifts_grid(obs):
    out = {
        (r["k"], r["grid_ts_s"]): r["v"]
        for r in resample_ffill(
            obs, on="k", ts_seconds="ts_s", step_seconds=300, origin=30
        ).collect()
    }
    # B's span [600, 600] floors to grid start 330; the next line (630)
    # exceeds the last observation, so B gets the single pre-obs row.
    assert out == {
        ("A", 30): 1.0,
        ("A", 330): 1.0,
        ("B", 330): None,
    }


def test_resample_rejects_bad_step(obs):
    with pytest.raises(ValueError, match="positive"):
        resample_ffill(obs, on="k", ts_seconds="ts_s", step_seconds=0)


def test_scd2_intervals_chain(spark):
    changes = spark.createDataFrame(
        [("A", 10, "v1"), ("A", 20, "v2"), ("A", 30, "v3"), ("B", 5, "w1")],
        "k string, ts long, val string",
    )
    rows = {
        (r["k"], r["val"]): (r["valid_from"], r["valid_to"])
        for r in scd2_intervals(changes, on="k", ts_col="ts").collect()
    }
    assert rows == {
        ("A", "v1"): (10, 20),
        ("A", "v2"): (20, 30),
        ("A", "v3"): (30, None),
        ("B", "w1"): (5, None),
    }


def test_scd2_collision_raises(spark):
    changes = spark.createDataFrame([("A", 1, 2)], "k string, ts long, valid_to long")
    with pytest.raises(ValueError, match="collides"):
        scd2_intervals(changes, on="k", ts_col="ts")
