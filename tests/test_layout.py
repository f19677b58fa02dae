"""Storage-layout proofs: the write side must produce files whose
parquet footers actually enable the pruning the read side relies on."""

import glob
import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from telemetry_streaming_spark.sources.layout import (
    write_partitioned,
    write_range_sorted,
)
from telemetry_streaming_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE
from tests.test_plans import explain_str


def _file_ranges(path: str, col: str):
    ranges = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            ranges.append((lo, hi))
    return sorted(ranges)


def test_range_sorted_files_have_disjoint_stats(spark, tmp_path):
    """repartitionByRange + sortWithinPartitions must yield files with
    non-overlapping min/max on the sort key — the property row-group
    pruning needs."""
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    out = str(tmp_path / "docs_sorted")
    write_range_sorted(docs, out, "doc_id", n_files=4)

    ranges = _file_ranges(out, "doc_id")
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges {(lo1, hi1)} vs {(lo2, hi2)}"

    # and the round trip is lossless
    back = spark.read.parquet(out)
    assert back.count() == docs.count()

    # a range predicate on the key reaches the scan as PushedFilters
    plan = explain_str(back.where(F.col("doc_id") < 10))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "LessThan(doc_id,10)" in pushed[0]


def test_partitioned_write_prunes_directories(spark, tmp_path):
    """A predicate on the partition column must become a
    PartitionFilter (no data I/O for other partitions), not a data
    filter."""
    events = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    out = str(tmp_path / "events_by_type")
    write_partitioned(events, out, "event_type", sort_cols="user_id")

    back = spark.read.parquet(out)
    q = back.where(F.col("event_type") == "click")
    plan = explain_str(q)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "event_type" in pf[0]
    # the data-filter list must NOT contain the partition predicate
    # (the line disappears entirely when nothing is pushed to data I/O)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert not pushed or "event_type" not in pushed[0]

    want = events.where(F.col("event_type") == "click").count()
    assert q.count() == want

    # in-partition sort gives disjoint user_id footers inside a directory
    ranges = _file_ranges(os.path.join(out, "event_type=click"), "user_id")
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_partitioned_write_rejects_high_cardinality(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError, match="distinct values"):
        write_partitioned(events, str(tmp_path / "x"), "event_id", max_cardinality=10)


def test_zorder_boxes_beat_linear_sort_on_secondary_column(spark, tmp_path):
    """Z-ordered files must carry tight footer stats on BOTH clustered
    columns; a linear sort leaves the secondary column spanning the
    whole domain in every file, so a predicate on it can skip nothing."""
    import pyarrow.parquet as pq

    from telemetry_streaming_spark.sources.layout import write_range_sorted, write_zordered
    from telemetry_streaming_spark.sources.registry import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events", parallelize=False).select(
        "event_id", "user_id", "value"
    )
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "l")
    write_zordered(events, zdir, ["user_id", "value"], n_files=8, bits=8)
    write_range_sorted(events, ldir, "user_id", n_files=8)

    def spans(d, col):
        out = []
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            los, his = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        los.append(c.statistics.min)
                        his.append(c.statistics.max)
            if los:
                out.append(max(his) - min(los))
        return out

    lo, hi = [
        (r[0], r[1]) for r in events.selectExpr("min(value)", "max(value)").collect()
    ][0]
    domain = hi - lo
    z_spans = sorted(spans(zdir, "value"))
    l_spans = sorted(spans(ldir, "value"))
    assert len(z_spans) >= 4 and len(l_spans) >= 4
    # linear sort by user_id: the typical file's value span covers
    # most of the domain (nothing to skip on the secondary column)
    assert l_spans[len(l_spans) // 2] > 0.55 * domain
    # z-order: the typical file covers a small value box (z-curve
    # fold-boundary files may still span wide — medians, not means)
    assert z_spans[len(z_spans) // 2] < 0.4 * domain
    # and user_id stays clustered too (both-column skipping)
    uz = spans(zdir, "user_id")
    full_u = max(r.user_id for r in events.collect()) - min(r.user_id for r in events.collect())
    assert sum(uz) / len(uz) < 0.9 * full_u
    # round-trip: no rows lost or duplicated
    assert spark.read.parquet(zdir).count() == events.count()


def test_zorder_rejects_bad_params(spark):
    import pytest

    from telemetry_streaming_spark.sources.layout import write_zordered, zorder_key
    from telemetry_streaming_spark.sources.registry import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events", parallelize=False)
    with pytest.raises(ValueError):
        zorder_key(events, ["a", "b", "c", "d", "e"])
    with pytest.raises(ValueError):
        zorder_key(events, ["user_id", "value"], bits=32)
    with pytest.raises(ValueError):
        write_zordered(events, "/tmp/x", ["user_id"], n_files=0)


def test_zorder_string_column_spreads_and_stays_monotone(spark):
    """High-cardinality strings sharing a long common prefix must
    spread over many rank bins (the raw 8-byte-prefix integer sits
    near 2^63 where double ulp erases low-byte differences — the
    min-shift keeps them) and binning must be monotone in string
    order.  Dates likewise."""
    import datetime as dt

    from telemetry_streaming_spark.sources.layout import zorder_key

    df = spark.createDataFrame(
        [(f"user_{i:04d}", float(i % 97), dt.date(2024, 1 + i % 12, 1)) for i in range(500)],
        "name string, value double, day date",
    )
    keyed, _ = zorder_key(df, ["name", "value"], bits=8)
    rows = sorted(
        (r["name"], r["__zbin_name"]) for r in keyed.select("name", "__zbin_name").collect()
    )
    assert all(a[1] <= b[1] for a, b in zip(rows, rows[1:]))
    assert len({b for _, b in rows}) > 30  # real spread, not 1-2 bins

    keyed2, _ = zorder_key(df, ["day", "value"], bits=8)
    rows2 = sorted(
        (r["day"], r["__zbin_day"]) for r in keyed2.select("day", "__zbin_day").collect()
    )
    assert all(a[1] <= b[1] for a, b in zip(rows2, rows2[1:]))
    assert len({b for _, b in rows2}) == 12
