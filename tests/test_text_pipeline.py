"""Behavioral tests for the training-data pipeline text operators:
PII scan/redaction, Gopher-style n-gram repetition, BPE-ish token
counting (functions/text.py, operators/repetition.py)."""

import pyspark.sql.functions as F


def _one(spark, text):
    return spark.createDataFrame([(1, text)], ["doc_id", "text"])


def test_redact_pii_all_types(spark):
    from telemetry_streaming_spark.functions.text import redact_pii

    row = _one(
        spark,
        "mail a.user+tag@sub.example.org or b@x.io, call 555-867-5309, "
        "server at 192.168.0.1 ok",
    ).select(redact_pii(F.col("text")).alias("r")).first()
    assert row.r == (
        "mail [EMAIL] or [EMAIL], call [PHONE], server at [IP] ok"
    )


def test_pii_counts(spark):
    from telemetry_streaming_spark.functions import text as T

    df = _one(
        spark,
        "a@b.co c@d.org phone 123-456-7890 and 10.0.0.1 plus 8.8.8.8",
    ).select(
        T.count_emails(F.col("text")).alias("e"),
        T.count_phones(F.col("text")).alias("p"),
        T.count_ipv4(F.col("text")).alias("i"),
    )
    r = df.first()
    assert (r.e, r.p, r.i) == (2, 1, 2)


def test_pii_clean_text_untouched(spark):
    from telemetry_streaming_spark.functions.text import redact_pii

    clean = "plain prose with numbers 12 345 and words dot com"
    r = _one(spark, clean).select(redact_pii(F.col("text")).alias("r")).first()
    assert r.r == clean


def test_ngram_repetition_counts(spark):
    from telemetry_streaming_spark.operators.repetition import ngram_repetition

    # 2-grams of "a b a b a b": [a b, b a, a b, b a, a b]
    r = ngram_repetition(_one(spark, "a b a b a b")).first()
    assert (r.n_grams, r.n_distinct, r.top_count) == (5, 2, 3)


def test_repetition_flags(spark):
    from telemetry_streaming_spark.operators.repetition import repetition_flags

    uniq = " ".join(f"w{i}" for i in range(40))  # 39 distinct 2-grams
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"), (2, uniq)], ["doc_id", "text"]
    )
    flags = {r.doc_id: r.flagged for r in repetition_flags(df).collect()}
    assert flags == {1: 1, 2: 0}


def test_repetition_boundary_exact(spark):
    from telemetry_streaming_spark.operators.repetition import repetition_flags

    # 21 tokens, all-distinct 2-grams except one repeated: craft
    # top_count*100 == 10*n_grams exactly -> flagged (>= semantics).
    # 20 2-grams with top_count 2: "x y" appears twice, 18 others
    # distinct.  10% of 20 = 2 == top_count.
    words = ["x", "y"] + [f"w{i}" for i in range(17)] + ["x", "y"]
    r = repetition_flags(_one(spark, " ".join(words))).first()
    assert r.n_grams == 20 and r.top_count == 2 and r.flagged == 1


def test_no_grams_no_row(spark):
    from telemetry_streaming_spark.operators.repetition import ngram_repetition

    assert ngram_repetition(_one(spark, "solo")).count() == 0


def test_bpe_token_count(spark):
    from telemetry_streaming_spark.functions.text import bpe_token_count

    cases = {
        "don't stop": 3,          # don | 't | ' stop'
        "hello world 123": 3,
        "a,b": 3,                 # a | , | b
        "x  y": 2,                # runs of space attach to next token
    }
    df = spark.createDataFrame(
        [(t, n) for t, n in cases.items()], ["text", "expect"]
    ).select(bpe_token_count(F.col("text")).alias("got"), "expect")
    for r in df.collect():
        assert r.got == r.expect
