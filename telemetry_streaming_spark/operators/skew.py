"""Skew-mitigation utilities for 100TB-scale shuffles.

AQE's skew-join splitting (enabled in session.py) handles most
sort-merge skew at runtime, but two shapes still need explicit help:

- **Heavy-hitter aggregation** (:func:`salted_agg`): one key holding a
  large fraction of rows turns its reduce task into a straggler even
  under AQE (aggregation skew is not AQE-splittable).  Salting runs a
  two-phase aggregate — partial by (key, salt), final by key — so the
  hot key's rows spread over ``n_salts`` tasks.  Works for any
  algebraic aggregate expressed as (partial, merge) pairs.

- **Hot-key broadcast join** (:func:`salted_join`): a fact-fact equi
  join where a handful of keys dominate.  The skewed side gets a
  random salt in [0, n_salts); the other side is exploded across all
  salts — shuffle volume for the small side multiplies by n_salts, but
  the hot key's probe rows spread over n_salts reducers.  Use only for
  the hot keys: the standard recipe splits the input into hot/cold via
  a key-frequency sketch and unions a plain join of the cold part.

Citations: the reference has no joins at all (SURVEY §1.1), so this is
engine-native scale tooling rather than ported behavior.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(df: DataFrame, n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Uniform random salt in [0, n_salts).  rand() is seeded per-task
    by Spark; the salt only controls placement, never results."""
    return df.withColumn(col_name, (F.rand() * n_salts).cast("int"))


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation immune to heavy-hitter keys.

    ``aggs`` maps output column name -> (partial_agg_expr,
    final_merge_expr) where the partial expression aggregates input
    rows and the final expression merges the per-salt partials by
    referencing the partial's output name.  Example::

        salted_agg(events, ["user_id"], {
            "n":   (F.count(F.lit(1)),  F.sum(F.col("n"))),
            "sum": (F.sum("value"),     F.sum(F.col("sum"))),
            "mx":  (F.max("value"),     F.max(F.col("mx"))),
        })

    Phase 1 groups by (group_cols..., salt) — the hot key's rows land
    on ``n_salts`` different reduce tasks; phase 2 merges n_salts rows
    per key, which is trivially balanced.  Non-decomposable aggregates
    (exact median, collect_list order) do not fit this contract —
    Spark's own partial aggregation has the same limitation.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*group_cols, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has heavy-hitter join keys.

    The skewed side gets one salt per row; ``other`` is exploded
    n_salts times so every (key, salt) bucket finds its match.  Join
    key becomes (on..., salt); the output drops the salt.  Use for the
    hot slice of a key split; joining the full input this way
    multiplies the small side's shuffle by n_salts.
    """
    s = with_salt(skewed, n_salts)
    o = other.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = s.join(o, [*on, "__salt"], how)
    return out.drop("__salt")


def split_hot_keys(
    df: DataFrame,
    key_cols: Sequence[str],
    threshold: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(hot_rows, cold_rows, hot_keys): frequency-split on the key.

    hot_keys is a tiny frame (broadcast into the split joins) listing
    keys with more than ``threshold`` rows — the input to the standard
    skew recipe: ``salted_join(hot_rows, dim) UNION plain_join(
    cold_rows, dim)``.
    """
    hot_keys = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") > threshold)
        .select(*key_cols)
    )
    hot = df.join(F.broadcast(hot_keys), list(key_cols), "left_semi")
    cold = df.join(F.broadcast(hot_keys), list(key_cols), "left_anti")
    return hot, cold, hot_keys


def key_skew_report(
    df: DataFrame, key_cols: Sequence[str], top_k: int = 10
) -> DataFrame:
    """One-row skew diagnosis for a prospective shuffle key: key
    cardinality, the heaviest key's share, and the top-k keys' share —
    the numbers that decide between a plain aggregate, ``salted_agg``,
    and ``split_hot_keys`` BEFORE a 100TB job discovers its straggler
    at hour three.

    Scale shape: one count aggregate on the key (map-side combined),
    then two bounded consumers — a 1-row global aggregate and a
    TakeOrdered top-k (per-partition top-k + driver merge of k rows).
    Deliberately NOT a row_number window over the counts: that would
    funnel all n_keys rows through a single-partition sort, the exact
    pathology this report exists to prevent.

    Columns: n_rows, n_keys, max_count, topk_rows, topk_share,
    skew_ratio (= max_count / mean count; 1.0 means perfectly even).
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_count"),
    )
    order = [F.col("cnt").desc()] + [F.col(c).asc() for c in key_cols]
    topk = (
        counts.orderBy(*order)
        .limit(top_k)
        .agg(F.sum("cnt").alias("topk_rows"))
    )
    return totals.crossJoin(F.broadcast(topk)).select(
        "n_rows",
        "n_keys",
        "max_count",
        "topk_rows",
        (F.col("topk_rows").cast("double") / F.col("n_rows")).alias("topk_share"),
        (
            F.col("max_count").cast("double") * F.col("n_keys") / F.col("n_rows")
        ).alias("skew_ratio"),
    )
