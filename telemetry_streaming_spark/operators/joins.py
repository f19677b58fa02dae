"""Temporal join operators: as-of join and interval (range) join.

Spark has no native ASOF JOIN (DuckDB/Pandas do) and compiles raw
inequality joins to BroadcastNestedLoopJoin — O(n*m) and a driver OOM
at scale.  Both operators here re-express the semantics as plans built
only from equi-shuffles, sorts, and window functions, so Catalyst can
run them as ordinary exchange + sort stages on a 1000-executor
cluster:

- ``asof_join``: the classic union-then-window formulation.  Tag both
  sides, union them into one (key, ts)-stream, shuffle ONCE on the
  key, sort each partition by (ts, side), and carry the most recent
  right-side payload forward with ``last(..., ignorenulls=True)``.
  Cost: one shuffle of |L|+|R| rows + one sort — the same work a
  native engine's merge-based ASOF does, with no join explosion.
- ``interval_join``: time-bin bucketing.  Each point maps to exactly
  one fixed-width bin; each interval explodes to the bins it covers
  (``floor(len / bin_width) + 1`` copies).  An equi-join on
  (key, bin) then a residual range predicate gives exact semantics
  with a shuffled hash/sort-merge join.  Because a point lands in
  exactly one bin, a matching pair appears exactly once — no
  post-join dedup.

Skew: both operators shuffle on the join key alone.  A pathologically
hot key serializes into one task's sort (asof) or one hash bucket
(interval); callers with known-hot keys can pre-split with
``operators.skew.salt_keys`` on the aggregation that usually follows.

Scale ledger: SCALE.md §joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_enrich", "interval_join", "interval_join_stream"]


def _as_list(x: str | list[str]) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str | list[str],
    right_on: str | list[str] | None = None,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    strict: bool = False,
    tolerance_seconds: int | None = None,
    right_prefix: str = "",
) -> DataFrame:
    """For every left row, attach the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) its timestamp, per key.

    Equivalent to DuckDB ``ASOF LEFT JOIN`` / pandas ``merge_asof``.
    ``strict=True`` excludes ties (strictly before/after).  Right rows
    must be unique per (key, right_ts) — pre-aggregate if not, or the
    surviving row among ties is unspecified.

    Returns all left columns plus the matched right timestamp and every
    right non-key, non-ts column (optionally prefixed); unmatched left
    rows keep them null.  ``tolerance_seconds`` nulls out matches
    farther than the tolerance, mirroring pandas' ``tolerance``.
    """
    lkeys = _as_list(left_on)
    rkeys = _as_list(right_on) if right_on is not None else lkeys
    if len(lkeys) != len(rkeys):
        raise ValueError("left_on and right_on must have the same arity")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    payload_cols = [c for c in right.columns if c not in rkeys and c != right_ts]
    out_names = [right_prefix + c for c in payload_cols]
    for name in [*out_names, right_prefix + right_ts]:
        if name in left.columns:
            raise ValueError(f"output column {name!r} collides with a left column; set right_prefix")

    # One unified stream.  _side orders ties: with strict=False the right
    # row must sort before any left row at the same ts so the running
    # last() has already absorbed it; strict=True sorts it after instead.
    tagged_r = right.select(
        *[F.col(rk).alias(f"_k{i}") for i, rk in enumerate(rkeys)],
        F.col(right_ts).alias("_ts"),
        F.lit(0 if not strict else 2).alias("_side"),
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in payload_cols]
        ).alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    tagged_l = left.select(
        *[F.col(lk).alias(f"_k{i}") for i, lk in enumerate(lkeys)],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tagged_r.schema["_payload"].dataType).alias("_payload"),
        *left.columns,
    )

    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*[f"_k{i}" for i in range(len(lkeys))])
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        tagged_l.unionByName(tagged_r)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )

    if tolerance_seconds is not None:
        gap = F.abs(F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_match._rts")))
        merged = merged.withColumn(
            "_match",
            F.when(gap <= F.lit(int(tolerance_seconds) * 1_000_000), F.col("_match")),
        )

    return merged.select(
        *left.columns,
        F.col("_match._rts").alias(right_prefix + right_ts),
        *[F.col(f"_match.{c}").alias(p) for c, p in zip(payload_cols, out_names)],
    )


def asof_enrich(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str | list[str],
    right_on: str | list[str] | None = None,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    strict: bool = False,
    right_prefix: str = "",
    broadcast: bool = True,
) -> DataFrame:
    """Streaming-compatible as-of: enrich ``left`` with the nearest
    ``right`` row per key, where ``right`` is a *static* (bounded)
    dimension table — e.g. "attach the config/price/model version that
    was live when this event happened".

    ``asof_join`` needs a global per-key sort (window function), which
    Structured Streaming forbids.  This variant folds the static side
    into one sorted history array per key — ``struct(ts, payload)``
    sorts by its leading field — then equi-joins (broadcast by
    default) and probes the array with ``F.filter`` + ``element_at``:
    narrow, stateless column ops, legal in a streaming plan and
    incrementally correct because each output row depends only on its
    own input row plus the static side.  Cost: O(versions-per-key) per
    row, interpreted (higher-order functions don't codegen) — right
    for dimension histories (SCD tables, config rollouts: tens of
    versions/key), wrong for event-vs-event as-of at 100TB, which is
    ``asof_join``'s job.  Same matching semantics as ``asof_join``
    (direction/strict/unique-per-(key, ts) contract).
    """
    lkeys = _as_list(left_on)
    rkeys = _as_list(right_on) if right_on is not None else lkeys
    if len(lkeys) != len(rkeys):
        raise ValueError("left_on and right_on must have the same arity")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    payload_cols = [c for c in right.columns if c not in rkeys and c != right_ts]
    out_names = [right_prefix + c for c in payload_cols]
    for name in [*out_names, right_prefix + right_ts]:
        if name in left.columns:
            raise ValueError(f"output column {name!r} collides with a left column; set right_prefix")

    hist = right.groupBy(*[F.col(rk).alias(f"_k{i}") for i, rk in enumerate(rkeys)]).agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col(right_ts).alias("_rts"), *[F.col(c) for c in payload_cols])
            )
        ).alias("_hist")
    )
    if broadcast:
        hist = F.broadcast(hist)

    joined = left.join(
        hist,
        on=[F.col(lk) == F.col(f"_k{i}") for i, lk in enumerate(lkeys)],
        how="left",
    )
    lts = F.col(left_ts)
    if direction == "backward":
        keep = (lambda e: e["_rts"] < lts) if strict else (lambda e: e["_rts"] <= lts)
        pick = -1  # sorted ascending: last kept = greatest rts
    else:
        keep = (lambda e: e["_rts"] > lts) if strict else (lambda e: e["_rts"] >= lts)
        pick = 1
    cand = F.filter(F.col("_hist"), keep)
    match = F.when(F.size(cand) >= 1, F.element_at(cand, pick))
    return joined.select(
        *left.columns,
        match["_rts"].alias(right_prefix + right_ts),
        *[match[c].alias(p) for c, p in zip(payload_cols, out_names)],
    )


def _bin_of(ts: Column, bin_seconds: int) -> Column:
    return F.floor(F.unix_micros(ts) / F.lit(int(bin_seconds) * 1_000_000)).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_on: str | list[str],
    interval_on: str | list[str] | None = None,
    point_ts: str,
    interval_start: str,
    interval_end: str,
    bin_seconds: int,
    closed: str = "left",
    point_prefix: str = "",
) -> DataFrame:
    """Inner-join every point row to every interval row of the same key
    whose [start, end] range contains the point's timestamp.

    ``closed`` picks boundary inclusivity: ``left`` = [start, end),
    ``right`` = (start, end], ``both`` = [start, end], ``neither``.
    ``bin_seconds`` is the bucketing width — pick it near the typical
    interval length so each interval explodes to ~2 bins.  Returns all
    interval columns plus all point non-key columns (optionally
    prefixed).
    """
    pkeys = _as_list(point_on)
    ikeys = _as_list(interval_on) if interval_on is not None else pkeys
    if len(pkeys) != len(ikeys):
        raise ValueError("point_on and interval_on must have the same arity")
    if closed not in ("left", "right", "both", "neither"):
        raise ValueError(f"closed must be left|right|both|neither, got {closed!r}")

    p_payload = [c for c in points.columns if c not in pkeys]
    for c in p_payload:
        if point_prefix + c in intervals.columns:
            raise ValueError(
                f"output column {point_prefix + c!r} collides with an interval column; set point_prefix"
            )

    p = points.select(
        *[F.col(k).alias(f"_pk{i}") for i, k in enumerate(pkeys)],
        _bin_of(F.col(point_ts), bin_seconds).alias("_pbin"),
        *[F.col(c).alias(point_prefix + c) for c in p_payload],
    )
    iv = intervals.withColumn(
        "_ibin",
        F.explode(
            F.sequence(
                _bin_of(F.col(interval_start), bin_seconds),
                _bin_of(F.col(interval_end), bin_seconds),
            )
        ),
    )

    pt = F.col(point_prefix + point_ts)
    lo, hi = F.col(interval_start), F.col(interval_end)
    cond = (pt >= lo) if closed in ("left", "both") else (pt > lo)
    cond &= (pt <= hi) if closed in ("right", "both") else (pt < hi)

    eq = [F.col("_ibin") == F.col("_pbin")] + [
        F.col(ik) == F.col(f"_pk{i}") for i, ik in enumerate(ikeys)
    ]
    joined = iv.join(p, on=eq, how="inner").where(cond)
    return joined.drop("_ibin", "_pbin", *[f"_pk{i}" for i in range(len(pkeys))])


def interval_join_stream(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_on: str | list[str],
    interval_on: str | list[str] | None = None,
    point_ts: str,
    interval_start: str,
    interval_end: str,
    closed: str = "left",
    point_prefix: str = "",
) -> DataFrame:
    """Stream-stream twin of ``interval_join``: both sides are
    *streaming* DataFrames (each with ``withWatermark`` already
    applied on its time column — required, it bounds the join state).

    No binning here: Structured Streaming's stream-stream join keys
    its state store on the equi-columns and uses the time-range
    condition itself to evict state once the watermark passes
    ``interval_end`` — so state is O(rows within the watermark
    horizon), not O(stream).  Batch callers should use
    ``interval_join`` (this shape would be a nested-loop there).
    Same semantics contract: ``closed`` picks boundary inclusivity,
    output is interval columns + prefixed point columns.
    """
    pkeys = [point_on] if isinstance(point_on, str) else list(point_on)
    ikeys = (
        ([interval_on] if isinstance(interval_on, str) else list(interval_on))
        if interval_on is not None
        else pkeys
    )
    if len(pkeys) != len(ikeys):
        raise ValueError("point_on and interval_on must have the same arity")
    if closed not in ("left", "right", "both", "neither"):
        raise ValueError(f"closed must be left|right|both|neither, got {closed!r}")

    p_payload = [c for c in points.columns if c not in pkeys]
    for c in p_payload:
        if point_prefix + c in intervals.columns:
            raise ValueError(
                f"output column {point_prefix + c!r} collides with an interval column; set point_prefix"
            )
    p = points.select(
        *[F.col(k).alias(f"_pk{i}") for i, k in enumerate(pkeys)],
        *[F.col(c).alias(point_prefix + c) for c in p_payload],
    )
    pt = F.col(point_prefix + point_ts)
    lo, hi = F.col(interval_start), F.col(interval_end)
    cond = (pt >= lo) if closed in ("left", "both") else (pt > lo)
    cond &= (pt <= hi) if closed in ("right", "both") else (pt < hi)
    for i, ik in enumerate(ikeys):
        cond &= F.col(ik) == F.col(f"_pk{i}")
    return intervals.join(p, on=cond, how="inner").drop(
        *[f"_pk{i}" for i in range(len(pkeys))]
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_seconds: int,
    right_prefix: str = "r_",
    max_bins_per_row: int = 4096,
) -> DataFrame:
    """Inner-join interval rows from two sets on the same key where the
    half-open ranges [start, end) OVERLAP — the meetings/availability
    join `interval_join` (point-vs-interval) cannot express.

    Shape: both sides replicate to the time bins they touch
    (copies = len/bin + 1) and meet in an equi-join on (key, bin) —
    never a BroadcastNestedLoopJoin.  An overlapping pair can share
    MANY bins; instead of a distinct shuffle over the pair output, the
    pair is emitted only in its FIRST shared bin — max(bin(l.start),
    bin(r.start)) — which both sides provably cover, so each pair
    appears exactly once with zero post-dedup.  The residual
    l.start < r.end AND r.start < l.end predicate keeps the join
    exact.  Epoch-second integer bins, so binning is engine-portable.

    Hygiene: empty or inverted intervals (end <= start) denote no time
    span under half-open semantics and are dropped — without the
    filter, [x, x) strictly inside another interval would satisfy the
    residual predicate and emit a measure-zero "overlap".  A row whose
    interval spans more than ``max_bins_per_row`` bins (a corrupt
    far-future end, or bin_seconds mis-sized for the data) raises with
    a sizing hint instead of exploding an unbounded F.sequence into an
    executor OOM.
    """
    keys = [on] if isinstance(on, str) else list(on)
    reserved = {"__bin", "__first_l", "__first_r", "__s_l", "__e_l", "__s_r", "__e_r"}
    bad = reserved & (set(left.columns) | set(right.columns))
    if bad:
        raise ValueError(f"input columns collide with internal names: {sorted(bad)}")
    prefixed = [right_prefix + c for c in right.columns if c not in keys]
    if len(set(prefixed)) != len(prefixed) or set(prefixed) & set(keys):
        raise ValueError("right_prefix produces duplicate or key-colliding columns")
    for pc in prefixed:
        if pc in left.columns:
            raise ValueError(f"output column {pc!r} collides; set right_prefix")

    def binned(df, start, end, side):
        s = F.unix_seconds(F.col(start))
        e = F.unix_seconds(F.col(end))
        first = F.floor(s / bin_seconds).cast("long")
        last = F.floor((e - 1) / bin_seconds).cast("long")  # [s, e) half-open
        # assert_true inside a filter predicate cannot be pruned by the
        # optimizer; it returns NULL (-> coalesce TRUE) on healthy rows
        # and raises on the first over-wide interval.
        guard = F.coalesce(
            F.assert_true(
                last - first < F.lit(max_bins_per_row),
                F.concat(
                    F.lit(
                        f"interval_overlap_join: interval spans > "
                        f"{max_bins_per_row} bins of {bin_seconds}s "
                        f"(start epoch-s="
                    ),
                    s.cast("string"),
                    F.lit(", end epoch-s="),
                    e.cast("string"),
                    F.lit(
                        "); raise bin_seconds or max_bins_per_row, or "
                        "clean the corrupt timestamp"
                    ),
                ),
            ).cast("boolean"),
            F.lit(True),
        )
        return (
            df.where(s < e)  # drop empty/inverted intervals
            .where(guard)
            .select(
                *keys,
                F.explode(F.sequence(first, last)).alias("__bin"),
                first.alias(f"__first_{side}"),
                s.alias(f"__s_{side}"),
                e.alias(f"__e_{side}"),
                *[F.col(c) for c in df.columns if c not in keys],
            )
        )

    l = binned(left, left_start, left_end, "l")
    r_cols = [c for c in right.columns if c not in keys]
    r = binned(right, right_start, right_end, "r").select(
        *keys, "__bin", "__first_r", "__s_r", "__e_r",
        *[F.col(c).alias(right_prefix + c) for c in r_cols],
    )
    joined = l.join(r, [*keys, "__bin"])
    overlap = (F.col("__s_l") < F.col("__e_r")) & (F.col("__s_r") < F.col("__e_l"))
    first_shared = F.col("__bin") == F.greatest(F.col("__first_l"), F.col("__first_r"))
    return joined.where(overlap & first_shared).drop(
        "__bin", "__first_l", "__first_r", "__s_l", "__e_l", "__s_r", "__e_r"
    )
