"""Property pins for round-4 additions — edge behaviors established in
the verification drives, held here so CI keeps them."""

import pyspark.sql.functions as F


def test_attribution_is_latest_strict_within_tolerance(spark):
    """The attributed click must be (a) strictly earlier, (b) within
    tolerance, and (c) the LATEST such click — pinned against a
    brute-force python replica on adversarial timestamps (same-instant
    click+purchase, just-inside / just-outside the tolerance edge)."""
    from datetime import datetime, timedelta

    from telemetry_streaming_spark.operators.joins import asof_join

    t0 = datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        # (event_id, user, ts, type)
        (1, 1, t0, "click"),
        (2, 1, t0, "purchase"),                      # same instant: strict -> no match
        (3, 1, t0 + timedelta(seconds=1), "purchase"),  # matches click 1
        (4, 2, t0 - timedelta(days=7), "click"),
        (5, 2, t0, "purchase"),                      # exactly 7d: inside (<=)
        (6, 3, t0 - timedelta(days=7, seconds=1), "click"),
        (7, 3, t0, "purchase"),                      # 7d+1s: outside
        (8, 4, t0 - timedelta(hours=2), "click"),
        (9, 4, t0 - timedelta(hours=1), "click"),
        (10, 4, t0, "purchase"),                     # latest wins: click 9
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("id"))
    )
    got = {
        r.event_id: r.click_id
        for r in asof_join(
            purchases, clicks, left_on="user_id", left_ts="ts", right_ts="ts",
            strict=True, tolerance_seconds=7 * 86400, right_prefix="click_",
        ).collect()
    }
    assert got == {2: None, 3: 1, 5: 4, 7: None, 10: 9}


def test_doc_length_bucket_is_bit_length(spark):
    """bucket == bit_length(token_count), including the 0-token edge
    (bin(0)='0' -> bucket 1 in both engines)."""
    docs = spark.createDataFrame(
        [(1, "", "s"), (2, "one", "s"), (3, "a b c d e f g h", "s")],
        "doc_id long, text string, source string",
    )
    from telemetry_streaming_spark.functions import text as T

    n_tok = T.token_count(F.col("text"))
    got = {
        r.doc_id: (r.n, r.b)
        for r in docs.select(
            "doc_id", n_tok.alias("n"), F.length(F.bin(n_tok)).alias("b")
        ).collect()
    }
    for doc_id, (n, b) in got.items():
        assert b == max(int(n).bit_length(), 1), (doc_id, n, b)


def test_cross_source_leakage_ignores_within_source_dups(spark):
    """Duplicates confined to ONE source are not leakage; only texts
    spanning sources are flagged."""
    from telemetry_streaming_spark.plans.queries import QUERIES
    import os
    import tempfile

    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(1, "same text", "a"), (2, "same text", "a"),   # within-source dup
         (3, "leaky", "a"), (4, "leaky", "b"),           # cross-source
         (5, "unique", "c")],
        "doc_id long, text string, source string",
    ).write.parquet(os.path.join(d, "documents.parquet"))
    out = QUERIES["cross_source_leakage"].fn(spark, d).collect()
    assert len(out) == 1
    assert out[0].n_docs == 2 and out[0].n_sources == 2
    assert (out[0].min_source, out[0].max_source) == ("a", "b")


def test_trigram_counts_match_python_replica(spark):
    """Gram generation must agree with a brute-force python count,
    including docs shorter than 3 tokens (zero grams, no crash)."""
    import os
    import tempfile
    from collections import Counter

    from telemetry_streaming_spark.plans.queries import QUERIES

    texts = ["a b c d", "a b c", "a b", "", "  x  y  z  "]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    ).write.parquet(os.path.join(d, "documents.parquet"))
    expect = Counter()
    for t in texts:
        toks = t.strip().split()
        for i in range(len(toks) - 2):
            expect[" ".join(toks[i : i + 3])] += 1
    got = {r.gram: r.n for r in QUERIES["text_ngram_topk"].fn(spark, d).collect()}
    assert got == dict(expect)


def test_kmeans_update_membership_is_total(spark):
    """Every vector lands in exactly one cluster: per-pos member counts
    sum to the corpus size for every dimension."""
    from telemetry_streaming_spark.operators.similarity import kmeans_update

    df = spark.createDataFrame(
        [(i, [float(i % 5 + 1), float((i * 7) % 3 + 1)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    cents = [[0.0, 1.0], [4.0, 0.0]]
    rows = kmeans_update(df, "embedding", cents).collect()
    by_pos = {}
    for r in rows:
        by_pos.setdefault(r.pos, 0)
        by_pos[r.pos] += r.n_members
    assert set(by_pos) == {0, 1}
    assert all(v == 40 for v in by_pos.values()), by_pos


def test_per_group_cap_smaller_groups_untouched(spark):
    """Groups at or under the cap keep every row."""
    from telemetry_streaming_spark.operators.sampling import per_group_cap

    docs = spark.createDataFrame(
        [(i, "big") for i in range(50)] + [(100 + i, "small") for i in range(5)],
        "doc_id long, source string",
    )
    out = per_group_cap(docs, "source", "doc_id", cap=10)
    counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 10, "small": 5}


def test_apply_mixture_tolerates_null_stratum(spark):
    """A NULL source row must not crash the plan->execute loop (review
    finding: sorted() over a rates dict containing None)."""
    from telemetry_streaming_spark.operators.sampling import apply_mixture, mixture_plan

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")], "doc_id long, source string"
    )
    plan = mixture_plan(docs, "source", {"a": 0.9})
    out = {r.doc_id for r in apply_mixture(docs, plan, "doc_id", "source").collect()}
    assert out <= {1, 2} and 3 not in out  # NULL stratum falls to rate 0


def test_pca_survives_anticorrelated_init(spark):
    """Perfectly anticorrelated coordinates make cov @ ones == 0; the
    multi-init power iteration must still find the true component
    (review finding: silent 0.0 eigenvalue)."""
    import numpy as np

    from telemetry_streaming_spark.operators.similarity import top_principal_component

    rows = [(i, [float(a), float(-a)]) for i, a in enumerate(range(-20, 21))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    lam, v = top_principal_component(df, iters=60)
    assert lam > 0.0
    assert abs(abs(v[0]) - abs(v[1])) < 1e-6 and v[0] * v[1] < 0  # [.707, -.707]


def test_pca_rejects_ragged_embeddings(spark):
    import pytest

    from telemetry_streaming_spark.operators.similarity import top_principal_component

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="same length"):
        top_principal_component(df)


def test_report_survives_null_text_source(spark, tmp_path, capsys):
    """A source whose documents all have NULL text reports zeros
    instead of crashing the audit (review finding)."""
    import json as _json
    import os

    from telemetry_streaming_spark.cli import main

    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "real words here", "good"), (2, None, "broken"), (3, None, "broken")],
        "doc_id long, text string, source string",
    ).write.parquet(d)
    out = str(tmp_path / "card.json")
    main(["report", "--input-path", d, "--output-path", out], spark=spark)
    card = _json.loads(open(out).read())
    assert card["per_source"]["broken"]["n_tokens"] == 0
    assert card["per_source"]["good"]["n_tokens"] == 3


def test_attribution_position_u_shape_hand_verified(tmp_path, spark):
    """r8: U-shaped credit on planted touch chains — 1 touch takes the
    full million, 2 split 500k/500k, 3 give 400k/200k/400k, 5 give
    400k/66666x3/400k (integer floor on the middles) — and clicks at
    or after the conversion ts earn nothing."""
    import datetime

    from pyspark.sql import Row

    from telemetry_streaming_spark.plans.queries import QUERIES

    t0 = datetime.datetime(2024, 1, 10, 12, 0, 0)

    def click(eid, uid, minutes_before):
        return Row(event_id=eid, ts=t0 - datetime.timedelta(minutes=minutes_before),
                   user_id=uid, event_type="click", value=1.0, props="{}")

    rows = []
    # user 1: single touch
    rows += [click(101, 1, 30)]
    # user 2: two touches
    rows += [click(201, 2, 40), click(202, 2, 20)]
    # user 3: three touches
    rows += [click(301, 3, 50), click(302, 3, 30), click(303, 3, 10)]
    # user 4: five touches
    rows += [click(400 + i, 4, 60 - 10 * i) for i in range(5)]
    # user 5: one click AT the conversion ts (excluded) + one after
    rows += [click(501, 5, 0),
             Row(event_id=502, ts=t0 + datetime.timedelta(minutes=5), user_id=5,
                 event_type="click", value=1.0, props="{}")]
    for uid in (1, 2, 3, 4, 5):
        rows.append(Row(event_id=900 + uid, ts=t0, user_id=uid,
                        event_type="purchase", value=9.0, props="{}"))
    df = spark.createDataFrame(rows)
    path = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(path)

    got = {
        r.user_id: (r.n_convs, r.n_clicks, r.credit_micro_sum)
        for r in QUERIES["attribution_position"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (1, 1, 1_000_000),
        2: (1, 2, 1_000_000),
        3: (1, 3, 1_000_000),
        4: (1, 5, 400_000 + 3 * 66_666 + 400_000),
        # user 5 has no qualifying click -> no output row
    }


def test_attribution_decay_halves_per_day(tmp_path, spark):
    """r8: time-decay credit — weights 2^(6-age_days), integer floor
    against the per-conversion weight sum.  Ages 0/1/2 days give
    weights 64/32/16 (sum 112): credits 571428/285714/142857, summing
    to 999999 (floor loss stays in integer-land); a single
    6.5-day-old click still takes the full million."""
    import datetime

    from pyspark.sql import Row

    from telemetry_streaming_spark.plans.queries import QUERIES

    t0 = datetime.datetime(2024, 3, 10, 12, 0, 0)

    def click(eid, uid, days_before):
        return Row(event_id=eid, ts=t0 - datetime.timedelta(days=days_before),
                   user_id=uid, event_type="click", value=1.0, props="{}")

    rows = [
        click(1, 1, 0.25), click(2, 1, 1.25), click(3, 1, 2.25),
        click(9, 2, 6.5),
        Row(event_id=100, ts=t0, user_id=1, event_type="purchase",
            value=5.0, props="{}"),
        Row(event_id=101, ts=t0, user_id=2, event_type="purchase",
            value=5.0, props="{}"),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r.user_id: (r.n_convs, r.n_clicks, r.credit_micro_sum)
        for r in QUERIES["attribution_decay"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {1: (1, 3, 999_999), 2: (1, 1, 1_000_000)}
