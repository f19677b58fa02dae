

def test_hard_negatives_excludes_positives_and_ranks_by_dot(spark):
    """Planted geometry: the near-clone of each query must rank #1
    among negatives; the query itself and its labeled positive must
    never appear; ties break to the lower neighbor_id."""
    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.similarity import hard_negatives

    def vec(*xs):
        return [float(x) for x in xs]

    corpus = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=vec(1, 0, 0)),      # query 0
            Row(vec_id=1, embedding=vec(0.99, 0.1, 0)), # near-clone of 0
            Row(vec_id=2, embedding=vec(0, 1, 0)),      # labeled positive of 0
            Row(vec_id=3, embedding=vec(0.5, 0, 0)),    # weaker match
            Row(vec_id=4, embedding=vec(0.5, 0, 0)),    # tie with 3 -> lower id first
            Row(vec_id=5, embedding=vec(-1, 0, 0)),     # anti-correlated
        ]
    )
    queries = corpus.where("vec_id = 0").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    positives = spark.createDataFrame(
        [Row(query_id=0, pos_id=0), Row(query_id=0, pos_id=2)]
    )
    got = [
        (r["neighbor_id"], r["rank"])
        for r in hard_negatives(corpus, queries, positives, k=3)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(1, 1), (3, 2), (4, 3)]

    import pytest

    with pytest.raises(ValueError, match="positive"):
        hard_negatives(corpus, queries, positives, k=0)


def test_hard_negatives_drops_null_and_misdimensioned_vectors(spark):
    """r8 (r7 ADVICE): NULL-embedding / wrong-dimension corpus rows
    scored NULL yet still occupied ranks <= k when non-null candidates
    were scarce, diverging from the oracle's unnest join which drops
    them.  They must now be excluded BEFORE ranking — including a
    correctly-sized vector with a NULL element — and a NULL query_vec
    must produce no output rows for that query."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from telemetry_streaming_spark.operators.similarity import hard_negatives

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),          # the query itself
            (1, [0.9, 0.1, 0.0]),          # only clean candidate
            (2, None),                      # NULL embedding
            (3, [1.0, 0.0]),                # wrong dimension
            (4, [1.0, None, 0.0]),          # NULL element, right size
        ],
        schema,
    )
    queries = corpus.where("vec_id = 0").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    positives = spark.createDataFrame([Row(query_id=0, pos_id=0)])
    got = [
        (r["neighbor_id"], r["rank"])
        for r in hard_negatives(corpus, queries, positives, k=3).collect()
    ]
    assert got == [(1, 1)], got

    # NULL query vector: that query contributes nothing (not k NULLs)
    null_q = spark.createDataFrame(
        [(7, None)],
        T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField("query_vec", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    assert hard_negatives(corpus, null_q, positives, k=3).count() == 0

    # all-corrupt corpus: empty result with the contract schema
    empty = hard_negatives(
        corpus.where("vec_id = 2"), queries, positives, k=3
    )
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "query_id", "neighbor_id", "score_e8", "rank",
    ]


def test_rrf_fuse_hand_lists(spark):
    """late r8: two hand rankings — item 10 is rank 1 in list A and
    rank 3 in list B; item 20 only in A at rank 2; item 30 only in B
    at ranks 1.  rrf_e9 = sum(1e9 // (60 + rank)) exactly."""
    from pyspark.sql import Row

    from telemetry_streaming_spark.operators.similarity import rrf_fuse

    rankings = spark.createDataFrame(
        [
            Row(list_id=1, item_id=10, rank=1),
            Row(list_id=1, item_id=20, rank=2),
            Row(list_id=2, item_id=30, rank=1),
            Row(list_id=2, item_id=10, rank=3),
        ]
    )
    got = {
        r.item_id: (r.n_lists, r.best_rank, r.rrf_e9)
        for r in rrf_fuse(rankings).collect()
    }
    assert got == {
        10: (2, 1, 1_000_000_000 // 61 + 1_000_000_000 // 63),
        20: (1, 2, 1_000_000_000 // 62),
        30: (1, 1, 1_000_000_000 // 61),
    }
