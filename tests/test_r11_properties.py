"""Focused pins for the r11 optimization restructures.

Each test pins an internals change of this round against the shape it
replaced, on real sf data — the same discipline as
test_r10_properties.py."""

import pandas as pd
import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

SF = "/root/testdata/sf0.01"


def test_weighted_median_bucketed_cumsum_equals_flag_window(spark):
    """r11 VERDICT item 7: the two-level bucketed prefix sum must be
    row-identical to the single per-flag cumsum window it replaced
    (the oracle still states the flag-window form)."""
    from telemetry_streaming_spark.plans.queries import QUERIES

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    r = li.groupBy("l_returnflag", cents.alias("p")).agg(
        F.sum("l_quantity").cast("long").alias("q")
    )
    w = Window.partitionBy("l_returnflag").orderBy("p")
    c = r.select(
        "l_returnflag",
        "p",
        F.sum("q").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("q").over(Window.partitionBy("l_returnflag")).alias("tot"),
    )
    flag_window = (
        c.where(2 * F.col("cum") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("p").alias("weighted_median_cents"),
            F.min("tot").alias("total_qty"),
        )
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    bucketed = (
        QUERIES["weighted_median_price"]
        .fn(spark, SF)
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bucketed, flag_window)


def test_setsim_arrays_first_equals_distinct_stream_shape(spark):
    """r11 VERDICT item 5: the arrays-first token pipeline (one
    collect_set aggregate, sizes in-row) must reproduce the former
    distinct-stream + sizes-aggregate shape exactly."""
    from telemetry_streaming_spark.operators.checkpointing import cut_lineage
    from telemetry_streaming_spark.operators.dedup import setsim_prefix_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = (
        setsim_prefix_pairs(docs, threshold_num=19, threshold_den=20)
        .toPandas()
        .sort_values(["id1", "id2"])
        .reset_index(drop=True)
    )

    # former shape, verbatim (r10): distinct token stream, separate
    # sizes aggregate, collect_list verify arrays
    toks = (
        docs.where(F.col("text").rlike(r"\S"))
        .select(
            F.col("doc_id").alias("__id"),
            F.explode(
                F.split(F.expr(r"trim(BOTH ' \t\r\n' FROM lower(text))"), r"\s+")
            ).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )
    toks = cut_lineage(toks)
    sizes = toks.groupBy("__id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    w = Window.partitionBy("__id").orderBy("df", "token")
    ordered = (
        toks.join(dfreq, "token").join(sizes, "__id")
        .withColumn("p", F.row_number().over(w))
    )
    num, den = 19, 20
    prefix = cut_lineage(
        ordered.where(
            F.col("p")
            <= F.col("n") - F.expr(f"({num} * n + {den - 1}) div {den}") + 1
        ).select("__id", "token", "n")
    )
    a = prefix.select(F.col("__id").alias("id1"), "token", F.col("n").alias("n1"))
    b = prefix.select(F.col("__id").alias("id2"), "token", F.col("n").alias("n2"))
    cand = (
        a.join(b, "token")
        .where(F.col("id1") < F.col("id2"))
        .where(
            (F.lit(den) * F.col("n1") >= F.lit(num) * F.col("n2"))
            & (F.lit(den) * F.col("n2") >= F.lit(num) * F.col("n1"))
        )
        .select("id1", "id2")
        .distinct()
    )
    arrays = toks.groupBy("__id").agg(
        F.sort_array(F.collect_list("token")).alias("__toks"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    a1 = arrays.select(
        F.col("__id").alias("id1"), F.col("__toks").alias("__t1"), F.col("n").alias("n1")
    )
    a2 = arrays.select(
        F.col("__id").alias("id2"), F.col("__toks").alias("__t2"), F.col("n").alias("n2")
    )
    inter = (
        cand.join(a1, "id1").join(a2, "id2")
        .select(
            "id1", "id2",
            F.size(F.array_intersect("__t1", "__t2")).cast("long").alias("n_common"),
            "n1", "n2",
        )
    )
    union_sz = F.col("n1") + F.col("n2") - F.col("n_common")
    want = (
        inter.where(F.lit(den) * F.col("n_common") >= F.lit(num) * union_sz)
        .select(
            "id1", "id2", "n_common", "n1", "n2",
            F.expr("1000000 * n_common div (n1 + n2 - n_common)")
            .cast("long")
            .alias("jaccard_e6"),
        )
        .toPandas()
        .sort_values(["id1", "id2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
