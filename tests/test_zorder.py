"""Z-order clustering (functions/zorder.py + compact --zorder-by).

Pins: the Morton key is a bit-exact python-replica match; z-ordered
compaction tightens per-file min/max on BOTH interleaved columns
(single-column sort bounds only its own), which is the entire point —
multiplicative file pruning for conjunctive filters."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from telemetry_streaming_spark.functions.zorder import with_zorder_key, zorder_key


def _morton(qx, qy, bits):
    out = 0
    for i in range(bits):
        out |= ((qx >> i) & 1) << (i * 2)
        out |= ((qy >> i) & 1) << (i * 2 + 1)
    return out


def test_zorder_key_matches_python_replica(spark):
    import random

    rng = random.Random(11)
    rows = [(rng.randint(0, 1000), rng.randint(0, 1000)) for _ in range(500)]
    df = spark.createDataFrame([Row(x=a, y=b) for a, b in rows])
    bits = 10
    keyed = with_zorder_key(df, ["x", "y"], bits=bits)
    got = {(r["x"], r["y"]): r["__zkey"] for r in keyed.collect()}
    cells = (1 << bits) - 1
    lo_x, hi_x = min(a for a, _ in rows), max(a for a, _ in rows)
    lo_y, hi_y = min(b for _, b in rows), max(b for _, b in rows)

    def q(v, lo, hi):
        import math

        return int(math.floor((v - lo) / (hi - lo) * cells + 0.5))

    for (a, b), k in got.items():
        assert k == _morton(q(a, lo_x, hi_x), q(b, lo_y, hi_y), bits), (a, b)


def test_zorder_handles_nulls_and_constant_columns(spark):
    df = spark.createDataFrame(
        [Row(x=None, y=5), Row(x=3, y=5), Row(x=None, y=5)],
        "x int, y int",
    )
    out = with_zorder_key(df, ["x", "y"], bits=8).collect()
    assert all(r["__zkey"] is not None for r in out)
    with pytest.raises(ValueError):
        with_zorder_key(df, [], bits=8)
    with pytest.raises(ValueError):
        with_zorder_key(df, ["x", "y"], bits=40)  # 80 bits > 63
    with pytest.raises(ValueError):
        zorder_key([F.col("x")], 64)


def test_compact_zorder_tightens_both_columns(spark, tmp_path):
    """Per-file (max-min) spread of BOTH filter columns must shrink
    far below the global range under z-order, while a single-column
    sort leaves the second column's spread near-global."""
    import random

    from telemetry_streaming_spark.cli import main

    rng = random.Random(23)
    n = 100_000
    df = spark.createDataFrame(
        [Row(a=rng.randint(0, 100_000), b=rng.randint(0, 100_000),
             pay=rng.getrandbits(512).to_bytes(64, "big").hex())  # random padding -> many files
         for i in range(n)]
    )
    src = str(tmp_path / "src")
    df.repartition(8).write.parquet(src)

    def per_file_spread(path, col):
        spreads = []
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                part = spark.read.parquet(os.path.join(path, f))
                row = part.agg(
                    F.min(col).alias("lo"), F.max(col).alias("hi")
                ).collect()[0]
                spreads.append(row["hi"] - row["lo"])
        return sum(spreads) / len(spreads)

    zout = str(tmp_path / "z")
    main(["compact", "--input-path", src, "--output-path", zout,
          "--target-file-mb", "1", "--zorder-by", "a,b"], spark=spark)
    sout = str(tmp_path / "s")
    main(["compact", "--input-path", src, "--output-path", sout,
          "--target-file-mb", "1", "--sort-by", "a"], spark=spark)

    n_files = len([f for f in os.listdir(zout) if f.endswith(".parquet")])
    if n_files < 4:
        pytest.skip("not enough output files to measure clustering")
    # rows preserved
    assert spark.read.parquet(zout).count() == n
    za, zb = per_file_spread(zout, "a"), per_file_spread(zout, "b")
    sa, sb = per_file_spread(sout, "a"), per_file_spread(sout, "b")
    # z-order bounds BOTH columns well below the 100k global range...
    assert za < 60_000 and zb < 60_000, (za, zb)
    # ...while round-robin + within-file sort leaves PER-FILE min/max
    # near-global on every column (it only tightens row groups), so
    # z-order must beat it on both for file-level pruning
    assert za < sa * 0.75 and zb < sb * 0.75, (za, sa, zb, sb)


def test_compact_rejects_sort_and_zorder_together(spark, tmp_path):
    from telemetry_streaming_spark.cli import main

    src = str(tmp_path / "src")
    spark.createDataFrame([Row(a=1)]).write.parquet(src)
    with pytest.raises(SystemExit):
        main(["compact", "--input-path", src,
              "--output-path", str(tmp_path / "o"),
              "--sort-by", "a", "--zorder-by", "a"], spark=spark)
