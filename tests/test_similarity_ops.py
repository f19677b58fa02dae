

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
