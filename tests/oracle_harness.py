"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query in Spark and its oracle SQL in DuckDB over the
same parquet directory, then asserts row count, column-name set, and
exact value equality (rows sorted by all columns, columns sorted by
name).  Exactness is intentional: the engine's oracle strategy
(integer-scaled float aggregation, epoch-second windows) is designed
to be bit-identical across engines, so any drift is a real bug.
"""

from __future__ import annotations

import math
import os

import pandas as pd

from telemetry_streaming_spark.sources.registry import TABLES


def register_duck_views(con, sf_dir: str) -> None:
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare_query(spark, duck, name: str, spark_fn, oracle_sql: str, sf_dir: str):
    register_duck_views(duck, sf_dir)
    got = _normalize(spark_fn(spark, sf_dir).toPandas())
    want = _normalize(duck.execute(oracle_sql).df())

    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch spark={list(got.columns)} duck={list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count spark={len(got)} duck={len(want)}"

    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g):
            for i, (a, b) in enumerate(zip(g, w)):
                ok = (pd.isna(a) and pd.isna(b)) or a == b or (
                    not math.isinf(a) and abs(a - b) <= 0.0
                )
                assert ok, f"{name}.{c}[{i}]: spark={a!r} duck={b!r} diff={a - b!r}"
        else:
            mism = (g.fillna("__NULL__") != w.fillna("__NULL__")) if g.isna().any() or w.isna().any() else (g != w)
            bad = mism[mism].index.tolist()[:5]
            assert not bad, (
                f"{name}.{c}: {len(mism[mism])} mismatches, first at {bad}: "
                f"spark={g.iloc[bad[0]]!r} duck={w.iloc[bad[0]]!r}"
            )
