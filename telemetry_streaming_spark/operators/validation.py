"""Declarative data-quality constraint validation (Deequ-style).

A pipeline ingesting 100TB needs its contracts CHECKED, not assumed:
null keys, out-of-range measures, malformed strings, duplicate
primary keys, dangling foreign keys.  This module turns a rule list
into the cheapest plan that counts every violation exactly:

- **row-local rules** (:func:`not_null`, :func:`in_range`,
  :func:`matches`, :func:`accepted_values`) all fold into ONE
  conditional-sum aggregate over a single scan — adding a rule adds a
  sum, never a pass.  The 1-row result unpivots to (rule, count).
- **:func:`unique`** — primary-key violations as
  ``COUNT(*) - COUNT(DISTINCT key)`` (the extra rows beyond the first
  per key): a two-level partial-distinct aggregate, one shuffle on
  the key.  Rows with a NULL key component are ignored here (both
  engines' DISTINCT semantics) — pair with :func:`not_null`.
- **:func:`referential`** — dangling-FK count, Bloom-accelerated via
  :mod:`operators/bloomfilter`: a probe MISS is a *definite*
  violation (Bloom has no false negatives) and is counted map-side
  with zero shuffle; only probe HITS — true members plus the ~1%
  false positives — reach the exact anti-join.  At scale this turns
  the full-fact anti-join shuffle into (members + fp_rate) of it.
  NULL foreign keys are skipped (cover with :func:`not_null`).

Each rule family is its own aggregate branch; Catalyst prunes every
branch's scan to the referenced columns, so the multi-branch plan
re-reads narrow columns, not the table.  Callers validating many
rules on a hot frame can cache it first.

Regex note: :func:`matches` uses Java regex in Spark and whatever
dialect the comparison engine has — keep patterns in the common
subset (character classes, anchors, counts), per the events_to_
amplitude tier-dialect note.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str  # 'row' | 'unique' | 'referential'
    predicate: Column | None = None  # row kind: True == violation
    cols: tuple[str, ...] = ()
    ref: DataFrame | None = field(default=None, compare=False)
    ref_col: str | None = None
    use_bloom: bool = True


def not_null(name: str, *cols: str) -> Rule:
    pred = None
    for c in cols:
        t = F.col(c).isNull()
        pred = t if pred is None else (pred | t)
    if pred is None:
        raise ValueError("not_null needs at least one column")
    return Rule(name, "row", predicate=pred)


def in_range(name: str, col: str, lo, hi) -> Rule:
    """Violation: non-NULL value outside [lo, hi] (NULLs are
    not_null's business)."""
    c = F.col(col)
    return Rule(name, "row", predicate=c.isNotNull() & ~c.between(lo, hi))


def matches(name: str, col: str, pattern: str) -> Rule:
    c = F.col(col)
    return Rule(name, "row", predicate=c.isNotNull() & ~c.rlike(pattern))


def accepted_values(name: str, col: str, values) -> Rule:
    vals = list(values)
    if not vals:
        raise ValueError("accepted_values needs a non-empty domain")
    c = F.col(col)
    return Rule(name, "row", predicate=c.isNotNull() & ~c.isin(*vals))


def unique(name: str, *cols: str) -> Rule:
    if not cols:
        raise ValueError("unique needs at least one column")
    return Rule(name, "unique", cols=tuple(cols))


def referential(
    name: str, col: str, ref: DataFrame, ref_col: str, *, use_bloom: bool = True
) -> Rule:
    return Rule(
        name, "referential", cols=(col,), ref=ref, ref_col=ref_col, use_bloom=use_bloom
    )


def _count_referential(df: DataFrame, rule: Rule) -> DataFrame:
    keys = df.select(F.col(rule.cols[0]).alias("__fk")).where(
        F.col("__fk").isNotNull()
    )
    ref_keys = rule.ref.select(F.col(rule.ref_col).alias("__fk")).distinct()
    if rule.use_bloom:
        from telemetry_streaming_spark.operators.bloomfilter import (
            build_bloom,
            shrink_bloom,
            with_bloom_probe,
        )

        table = shrink_bloom(build_bloom(ref_keys, "__fk"))
        probed = with_bloom_probe(
            keys, "__fk", table, m_bits=len(table) * 64, n_hashes=3
        )
        misses = probed.where(~F.col("__bloom_hit"))
        hits = probed.where(F.col("__bloom_hit")).drop("__bloom_hit")
        dangling_hits = hits.join(ref_keys, on="__fk", how="left_anti")
        violations = misses.select("__fk").union(dangling_hits.select("__fk"))
    else:
        violations = keys.join(ref_keys, on="__fk", how="left_anti")
    return violations.agg(
        F.lit(rule.name).alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_violations"),
    )


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Count every rule's violations exactly; returns ``(rule,
    n_violations)`` with one row per rule (0 when clean)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    import re

    bad = [n for n in names if not re.fullmatch(r"[A-Za-z0-9_.:-]+", n or "")]
    if bad:
        raise ValueError(f"rule names must be simple identifiers: {bad}")
    parts: list[DataFrame] = []
    # row-local AND unique rules fuse into ONE aggregate over one scan
    # (unique is itself just an aggregate of this frame; a separate
    # branch would pay another scan + job for no reason — the
    # multi-branch scheduling floor is the dominant cost of a
    # many-rule validate at small per-rule work)
    fused: list[tuple[str, object]] = []
    for r in rules:
        if r.kind == "row":
            # coalesce: SUM over zero rows is NULL — an empty (or
            # fully filtered) frame must report 0 violations, not NULL
            fused.append(
                (
                    r.name,
                    F.coalesce(
                        F.sum(F.when(r.predicate, 1).otherwise(0)), F.lit(0)
                    ).cast("long"),
                )
            )
        elif r.kind == "unique":
            # Minuend counts only fully-non-null key rows: COUNT(*)
            # would charge every NULL-key row as a duplicate (DISTINCT
            # skips them), double-counting NULLs already covered by
            # not_null and contradicting the "NULL keys are ignored"
            # contract above.
            all_non_null = None
            for c in r.cols:
                t = F.col(c).isNotNull()
                all_non_null = t if all_non_null is None else (all_non_null & t)
            fused.append(
                (
                    r.name,
                    F.coalesce(
                        F.sum(F.when(all_non_null, 1).otherwise(0))
                        - F.count_distinct(*[F.col(c) for c in r.cols]),
                        F.lit(0),
                    ).cast("long"),
                )
            )
        elif r.kind == "referential":
            parts.append(_count_referential(df, r))
        else:
            raise ValueError(f"unknown rule kind {r.kind!r}")
    if fused:
        agg = df.agg(
            *[col.alias(f"__v{i}") for i, (_n, col) in enumerate(fused)]
        )
        stack_args = ", ".join(
            f"'{name}', __v{i}" for i, (name, _c) in enumerate(fused)
        )
        parts.insert(
            0,
            agg.select(
                F.expr(
                    f"stack({len(fused)}, {stack_args}) AS (rule, n_violations)"
                )
            ),
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def validate_windowed(
    df: DataFrame,
    rules: list[Rule],
    ts_col: str,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Windowed data-quality monitor: per tumbling window and rule, the
    exact violation count — ``(window_start, window_end, rule,
    n_violations)``.  The streaming tier of :func:`validate`: a
    100 TB ingest wants its contracts watched per arrival window, not
    only audited in batch.

    STREAM-SAFE by construction: every rule is evaluated as a ROW-level
    flag before aggregation, so the whole monitor is ONE stateful
    windowed aggregate (append emission under ``watermark``) no matter
    how many rules ride it:

    - row-local rules flag via their predicate (stateless);
    - :func:`referential` rules flag via the Bloom literal probe (a
      definite violation on miss) plus a stream-static LEFT join
      against the reference keys for the probe hits — the join key is
      NULLed for misses so they never look up, and a hit with no match
      is the exact dangling-FK flag.  No false positives survive: the
      result is exactly batch ``validate``'s count.
    - :func:`unique` is rejected: primary-key uniqueness is global
      state, not a window property (run it in the batch audit).

    Rows with a NULL ``ts_col`` have no window and are EXCLUDED from
    every count (Spark's window generator drops them; a SQL mirror
    must filter ``ts IS NOT NULL`` or it grows a NULL-window group).
    A NULL event time is itself a contract breach — catch it with
    ``not_null(ts)`` in the batch audit, where all rows count.

    Plan: scan -> flags (codegen'd) -> optional broadcast left join ->
    one windowed hash aggregate -> stack unpivot.  Shuffle carries
    O(windows x rules) cells after map-side combine.
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    if any(r.kind == "unique" for r in rules):
        raise ValueError(
            "unique() is global state, not a window property — "
            "run it in the batch validate()"
        )
    src = df.withWatermark(ts_col, watermark) if watermark else df
    flags: list[tuple[str, Column]] = []
    for i, r in enumerate(rules):
        if r.kind == "row":
            flags.append((r.name, r.predicate))
        elif r.kind == "referential":
            from telemetry_streaming_spark.operators.bloomfilter import (
                build_bloom,
                shrink_bloom,
                with_bloom_probe,
            )

            fk = F.col(r.cols[0])
            ref_keys = (
                r.ref.select(F.col(r.ref_col).alias(f"__ref{i}")).distinct()
            )
            table = shrink_bloom(build_bloom(ref_keys, f"__ref{i}"))
            src = with_bloom_probe(
                src,
                r.cols[0],
                table,
                m_bits=len(table) * 64,
                n_hashes=3,
                flag_col=f"__hit{i}",
            )
            # NULL the join key for probe misses (definite violations,
            # no lookup needed) and for NULL FKs (not_null's business)
            src = src.withColumn(
                f"__jk{i}",
                F.when(fk.isNotNull() & F.col(f"__hit{i}"), fk),
            ).join(
                F.broadcast(ref_keys),
                F.col(f"__jk{i}") == F.col(f"__ref{i}"),
                "left",
            )
            flags.append(
                (
                    r.name,
                    fk.isNotNull()
                    & (~F.col(f"__hit{i}") | F.col(f"__ref{i}").isNull()),
                )
            )
        else:
            raise ValueError(f"unsupported rule kind for windows: {r.kind!r}")
    agg = src.groupBy(F.window(ts_col, window).alias("w")).agg(
        *[
            F.sum(F.when(flag, 1).otherwise(0)).cast("long").alias(f"__v{i}")
            for i, (_n, flag) in enumerate(flags)
        ]
    )
    stack_args = ", ".join(f"'{name}', __v{i}" for i, (name, _f) in enumerate(flags))
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.expr(f"stack({len(flags)}, {stack_args}) AS (rule, n_violations)"),
    )
