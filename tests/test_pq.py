"""Product quantization (operators/pq.py).

Pins: the distributed trainer must produce codebooks IDENTICAL to a
pure-numpy Lloyd replica using the same seeding, scaled-integer sums,
and argmin tie-break; encoding must match the replica code-for-code
on the real embeddings table; ADC top-k must agree with a numpy ADC
and recall real L2 neighbors far better than chance.
"""

import numpy as np
import pytest

from telemetry_streaming_spark.operators.pq import pq_encode, pq_topk, pq_train

SF = "/root/testdata/sf0.001"


def _np_train(X, m, k, iters, scale=10_000):
    n, dim = X.shape
    d_sub = dim // m
    cbs = [X[:k, j * d_sub : (j + 1) * d_sub].copy() for j in range(m)]
    for _ in range(iters):
        sums = [np.zeros((k, d_sub)) for _ in range(m)]
        counts = [np.zeros(k, dtype=np.int64) for _ in range(m)]
        for j in range(m):
            sub = X[:, j * d_sub : (j + 1) * d_sub]
            d2 = ((sub[:, None, :] - cbs[j][None, :, :]) ** 2).sum(axis=2)
            code = d2.argmin(axis=1)
            q = np.floor(sub * scale + 0.5)
            for c in range(k):
                mask = code == c
                counts[j][c] = mask.sum()
                sums[j][c] = q[mask].sum(axis=0) / scale
        for j in range(m):
            for c in range(k):
                if counts[j][c] > 0:
                    cbs[j][c] = sums[j][c] / counts[j][c]
    return [cb.tolist() for cb in cbs]


def _np_codes(X, cbs):
    m = len(cbs)
    d_sub = len(cbs[0][0])
    out = []
    for x in X:
        cs = []
        for j in range(m):
            sub = x[j * d_sub : (j + 1) * d_sub]
            d2 = ((np.asarray(cbs[j]) - sub) ** 2).sum(axis=1)
            cs.append(int(d2.argmin()))
        out.append(cs)
    return out


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    rows = df.orderBy("vec_id").collect()
    X = np.asarray([list(r.embedding) for r in rows], dtype=np.float64)
    ids = [r.vec_id for r in rows]
    return df, X, ids


class TestPqTrain:
    def test_codebooks_match_numpy_replica(self, spark, emb):
        df, X, _ = emb
        got = pq_train(df, m=4, k=8, iters=3)
        want = _np_train(X, m=4, k=8, iters=3)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=0
        )  # scaled-integer sums -> bit-identical

    def test_guards(self, spark, emb):
        df, X, _ = emb
        with pytest.raises(ValueError, match="divisible"):
            pq_train(df, m=7)
        empty = df.where("vec_id < 0")
        with pytest.raises(ValueError, match="empty"):
            pq_train(empty, m=4)


class TestPqEncode:
    def test_codes_match_replica(self, spark, emb):
        df, X, ids = emb
        cbs = pq_train(df, m=4, k=8, iters=2)
        got = {
            r.vec_id: list(r.pq_codes)
            for r in pq_encode(df, cbs).select("vec_id", "pq_codes").collect()
        }
        want = dict(zip(ids, _np_codes(X, cbs)))
        assert got == want

    def test_null_and_missized_vectors_code_null(self, spark):
        cbs = [[[0.0, 0.0], [1.0, 1.0]]] * 2  # m=2, d_sub=2 -> dim 4
        df = spark.createDataFrame(
            [(1, [0.1, 0.2, 0.3, 0.4]), (2, None), (3, [0.1, 0.2])],
            "vec_id long, embedding array<double>",
        )
        got = {r.vec_id: r.pq_codes for r in pq_encode(df, cbs).collect()}
        assert got[1] is not None and got[2] is None and got[3] is None


class TestPqTopk:
    def test_adc_matches_numpy_and_recalls_true_neighbors(self, spark, emb):
        """m=16 on the structure-less synthetic embeddings (PQ's worst
        case) measures mean recall@10 ~0.58 over these queries — the
        floor asserts well above the 10/n = 0.02 chance level while
        staying robust to k-means drift."""
        m = 16
        df, X, ids = emb
        cbs = pq_train(df, m=m, k=16, iters=5)
        enc = pq_encode(df, cbs)
        codes = _np_codes(X, cbs)
        d_sub = X.shape[1] // m
        recalls = []
        for qi in (7, 42, 99, 201, 333):
            q = X[qi]
            rows = pq_topk(enc, q.tolist(), cbs, k=10).collect()
            assert len(rows) == 10
            # ADC distances equal the numpy ADC on the replica codes
            lut = np.asarray(
                [
                    [((np.asarray(c) - q[j * d_sub : (j + 1) * d_sub]) ** 2).sum()
                     for c in cbs[j]]
                    for j in range(m)
                ]
            )
            adc = {
                i: float(sum(lut[j, cj] for j, cj in enumerate(cs)))
                for i, cs in zip(ids, codes)
            }
            for r in rows:
                assert r.adc_dist == pytest.approx(adc[r.vec_id], rel=1e-12)
            true10 = set(
                np.asarray(ids)[np.argsort(((X - q) ** 2).sum(axis=1))[:10]].tolist()
            )
            recalls.append(len(true10 & {r.vec_id for r in rows}) / 10)
        assert sum(recalls) / len(recalls) >= 0.4, recalls

    def test_plan_is_lookup_plus_takeordered(self, spark, emb):
        import contextlib
        import io

        df, _, _ = emb
        cbs = pq_train(df, m=4, k=8, iters=1)
        enc = pq_encode(df, cbs)
        plan_df = pq_topk(enc, [0.0] * 64, cbs, k=5)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            plan_df.explain("formatted")
        txt = buf.getvalue()
        assert "TakeOrderedAndProject" in txt
        assert "Join" not in txt and "Window" not in txt


class TestPqStreaming:
    def test_encode_is_streaming_safe(self, spark, emb, tmp_path):
        """pq_encode is a stateless Arrow map — it must run unchanged
        on a streaming frame (append mode, no watermark) and emit the
        same codes the batch path assigns."""
        import json
        import os
        import uuid

        from telemetry_streaming_spark.streaming.core import drain, stop_quietly

        df, X, ids = emb
        cbs = pq_train(df, m=4, k=8, iters=1)
        batch_codes = {
            r.vec_id: list(r.pq_codes)
            for r in pq_encode(df, cbs).limit(50).collect()
        }

        src = str(tmp_path / "in")
        os.makedirs(src)
        sample = df.orderBy("vec_id").limit(5).collect()
        with open(os.path.join(src, "b1.jsonl"), "w") as f:
            for r in sample:
                f.write(json.dumps({"vec_id": r.vec_id, "embedding": list(r.embedding)}) + "\n")
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .json(src)
        )
        name = f"pqenc_{uuid.uuid4().hex[:8]}"
        q = (
            pq_encode(stream, cbs)
            .writeStream.queryName(name).format("memory").outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            drain(q)
            got = {
                r.vec_id: list(r.pq_codes)
                for r in spark.sql(f"SELECT vec_id, pq_codes FROM {name}").collect()
            }
        finally:
            stop_quietly(q)
        assert got == {r.vec_id: batch_codes[r.vec_id] for r in sample}


class TestPqDistortionStats:
    def test_matches_integer_replica_exactly(self, spark, emb):
        """The hash-checked companion query's cells must be BIT-exact
        against an integer replica of the seeded E-step: quantize,
        slice, argmin with lowest-code tie-break, sum."""
        from telemetry_streaming_spark.operators.pq import pq_distortion_stats

        df, X, _ = emb
        m, k, scale = 4, 8, 10_000
        d_sub = X.shape[1] // m
        Q = np.floor(X * scale + 0.5).astype(np.int64)
        seeds = Q[:k]
        want = {}
        for j in range(m):
            sub = Q[:, j * d_sub : (j + 1) * d_sub]
            cent = seeds[:, j * d_sub : (j + 1) * d_sub]
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            combined = d2 * k + np.arange(k)[None, :]
            best = combined.min(axis=1)
            want[j] = (
                len(best),
                int((best // k).sum()),
                int((best % k).sum()),
            )
        got = {
            r["subspace"]: (r["n_vectors"], r["distortion_q2"], r["code_sum"])
            for r in pq_distortion_stats(df, m=m, k=k, scale=scale).collect()
        }
        assert got == want

    def test_guards(self, spark):
        from telemetry_streaming_spark.operators.pq import pq_distortion_stats

        empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
        with pytest.raises(ValueError, match="empty input"):
            pq_distortion_stats(empty)
        few = spark.createDataFrame(
            [(i, [float(i)] * 4) for i in range(3)],
            "vec_id long, embedding array<float>",
        )
        with pytest.raises(ValueError, match="need >="):
            pq_distortion_stats(few, m=2, k=8)


class TestInt8QuantError:
    def test_matches_integer_replica(self, spark, emb):
        from telemetry_streaming_spark.operators.pq import int8_quant_error_stats

        df = spark.read.parquet(f"{SF}/embeddings.parquet")
        rows = df.orderBy("vec_id").collect()
        want = {}
        for r in rows:
            if r.embedding is None or not len(r.embedding):
                continue
            sq = mx = 0
            for x in r.embedding:
                qx = int(np.floor(float(x) * 10_000 + 0.5))
                q8 = max(-127, min(127, int(np.floor(float(x) * 127 + 0.5))))
                e = qx * 127 - q8 * 10_000
                sq += e * e
                mx = max(mx, abs(e))
            n, s, m = want.get(r.label, (0, 0, 0))
            want[r.label] = (n + 1, s + sq, max(m, mx))
        got = {
            r["label"]: (r["n_vectors"], r["sum_sq_err_q"], r["max_abs_err_q"])
            for r in int8_quant_error_stats(df).collect()
        }
        assert got == want

    def test_clamps_out_of_range_elements(self, spark):
        from pyspark.sql import Row

        from telemetry_streaming_spark.operators.pq import int8_quant_error_stats

        df = spark.createDataFrame(
            [Row(label=1, embedding=[2.0]), Row(label=1, embedding=None)],
            "label int, embedding array<float>",
        )
        (row,) = int8_quant_error_stats(df).collect()
        # qx = 20000, q8 clamps to 127: err = 20000*127 - 127*10000
        e = 20_000 * 127 - 127 * 10_000
        assert (row["n_vectors"], row["sum_sq_err_q"], row["max_abs_err_q"]) == (
            1, e * e, e,
        )
