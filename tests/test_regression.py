"""Distributed logistic regression (operators/regression.py).

The numpy-replica pin the r4 verdict asked for: the Spark IRLS fit
must match an independent in-memory IRLS on the identical rows to
~1e-6 per weight, recover known generating weights on synthetic data,
and the Newton-at-zero sufficient statistics must reproduce the first
IRLS step exactly.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from telemetry_streaming_spark.operators.regression import (
    fit_logistic,
    fit_quality_logit,
    logistic_sufficient_stats,
)


def _numpy_irls(X, y, max_iters=25, tol=1e-9, ridge=1e-6):
    """Reference IRLS — same math as fit_logistic, no Spark."""
    d = X.shape[1]
    w = np.zeros(d)
    for _ in range(max_iters):
        eta = X @ w
        p = 1.0 / (1.0 + np.exp(-eta))
        s = p * (1.0 - p)
        g = X.T @ (y - p) - ridge * w
        H = (X * s[:, None]).T @ X + ridge * np.eye(d)
        step = np.linalg.solve(H, g)
        w = w + step
        if np.abs(step).max() < tol:
            break
    return w


def _synth(n=2000, seed=7):
    """Separably-noisy synthetic data with known generating weights."""
    rng = np.random.default_rng(seed)
    X = np.column_stack(
        [np.ones(n), rng.uniform(0, 1, n), rng.uniform(0, 1, n)]
    )
    w_true = np.array([-1.0, 3.0, -2.0])
    p = 1.0 / (1.0 + np.exp(-(X @ w_true)))
    y = (rng.uniform(size=n) < p).astype(float)
    return X, y, w_true


class TestFitLogistic:
    def test_matches_numpy_replica(self, spark):
        X, y, _ = _synth()
        rows = [(float(a), float(b), float(lab)) for (_, a, b), lab in zip(X, y)]
        df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
        w_spark, iters = fit_logistic(df, ["x1", "x2"], "y")
        w_np = _numpy_irls(X, y)
        assert iters >= 2
        # Spark's partial-aggregate summation order differs from
        # numpy's; a converged convex optimum agrees far tighter than
        # this tolerance.
        np.testing.assert_allclose(w_spark, w_np, atol=1e-6)

    def test_recovers_generating_weights(self, spark):
        X, y, w_true = _synth(n=8000, seed=3)
        rows = [(float(a), float(b), float(lab)) for (_, a, b), lab in zip(X, y)]
        df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
        w, _ = fit_logistic(df, ["x1", "x2"], "y")
        # MLE at n=8000 lands within sampling noise of the truth
        np.testing.assert_allclose(w, w_true, atol=0.35)

    def test_separable_data_stays_finite(self, spark):
        # perfectly separable: unregularized MLE diverges; ridge must
        # keep the weights finite and the boundary correct
        rows = [(float(i), 1.0 if i > 10 else 0.0) for i in range(21)]
        df = spark.createDataFrame(rows, "x1 double, y double")
        w, _ = fit_logistic(df, ["x1"], "y", max_iters=50, ridge=1e-3)
        assert all(math.isfinite(v) for v in w)
        assert w[1] > 0  # boundary orientation
        # decision threshold sits between the classes
        thr = -w[0] / w[1]
        assert 10.0 < thr < 11.0

    def test_empty_input_raises(self, spark):
        df = spark.createDataFrame([], "x1 double, y double")
        with pytest.raises(ValueError, match="no rows"):
            fit_logistic(df, ["x1"], "y")

    def test_null_rows_dropped(self, spark):
        rows = [(0.0, 0.0), (1.0, 1.0), (None, 1.0), (0.5, None)]
        df = spark.createDataFrame(rows, "x1 double, y double")
        w, _ = fit_logistic(df, ["x1"], "y", max_iters=5)
        assert all(math.isfinite(v) for v in w)


class TestSufficientStats:
    def test_stats_reproduce_first_newton_step(self, spark):
        """The BIGINT moment sums must be exactly the w=0 gradient and
        Hessian (up to the exact scalars 1/quant and 1/4)."""
        X, y, _ = _synth(n=500, seed=11)
        quant = 1000
        rows = [(float(a), float(b), int(lab)) for (_, a, b), lab in zip(X, y)]
        df = spark.createDataFrame(rows, "f1 double, f2 double, y int")
        row = logistic_sufficient_stats(df, ["f1", "f2"], "y", quant=quant).collect()[0]

        # rebuild quantized design matrix in numpy
        Q = np.column_stack(
            [
                np.ones(len(rows)) * quant,  # bias quantizes to quant exactly
                np.floor(X[:, 1] * quant),
                np.floor(X[:, 2] * quant),
            ]
        )
        yv = y
        # gradient at w=0: X^T (y - 1/2); Hessian: X^T X / 4
        n, sy = row["n"], row["sy"]
        s1, s2 = row["s1"], row["s2"]
        s1y, s2y = row["s1y"], row["s2y"]
        assert n == len(rows) and sy == int(yv.sum())
        assert s1 == int(Q[:, 1].sum()) and s2 == int(Q[:, 2].sum())
        assert s1y == int((Q[:, 1] * yv).sum())
        assert s2y == int((Q[:, 2] * yv).sum())
        assert row["s1_1"] == int((Q[:, 1] ** 2).sum())
        assert row["s1_2"] == int((Q[:, 1] * Q[:, 2]).sum())
        assert row["s2_2"] == int((Q[:, 2] ** 2).sum())
        # first Newton step from the integer stats == numpy's first step
        # on the quantized features
        g = np.array(
            [sy - n / 2.0, s1y - s1 / 2.0, s2y - s2 / 2.0]
        )
        H = 0.25 * np.array(
            [
                [n * quant * quant, quant * s1, quant * s2],
                [quant * s1, row["s1_1"], row["s1_2"]],
                [quant * s2, row["s1_2"], row["s2_2"]],
            ]
        ) / (quant * quant)
        g_scaled = g * np.array([1.0, 1.0 / quant, 1.0 / quant])
        # hand-scale the bias row: q0 = quant, so divide its entries
        g_scaled[0] = sy - n / 2.0
        step = np.linalg.solve(H + 1e-9 * np.eye(3), g_scaled)
        w_np = _numpy_irls(
            np.column_stack([np.ones(n), Q[:, 1] / quant, Q[:, 2] / quant]),
            yv,
            max_iters=1,
            ridge=0.0,
        )
        np.testing.assert_allclose(step, w_np, rtol=1e-6, atol=1e-9)

    def test_single_plan_single_exchange(self, spark):
        """One hash aggregate to one row — no join, no window, no
        per-row Python."""
        import contextlib
        import io

        df = spark.createDataFrame([(0.5, 0.5, 1)], "f1 double, f2 double, y int")
        plan = logistic_sufficient_stats(df, ["f1", "f2"], "y")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            plan.explain("formatted")
        txt = buf.getvalue()
        assert "Join" not in txt and "Window" not in txt
        # the tree section names each node once as "Exchange (n)"
        assert txt.count("Exchange (") == 1


class TestFitQualityLogit:
    def test_trained_weights_deploy_into_scorer(self, spark):
        """End-to-end trainer-in-the-loop: fit on documents, plug the
        weights into quality_logit, and check the deployed scorer's
        decisions match driver-side sigmoid of the same features."""
        from telemetry_streaming_spark.functions.text import quality_logit

        docs = spark.createDataFrame(
            [
                (i,
                 ("good clean sentence with many readable words " * 6)
                 if i % 2 == 0
                 else ("@@!! ## %% ^^ &&" * 3),
                 "en" if i % 2 == 0 else "zz")
                for i in range(40)
            ],
            "doc_id long, text string, lang string",
        )
        weights, iters = fit_quality_logit(
            docs, F.col("lang") == "en", max_iters=30, ridge=1e-3
        )
        assert iters >= 1 and all(math.isfinite(w) for w in weights)
        scored = docs.select(
            "lang", quality_logit(F.col("text"), tuple(weights)).alias("logit")
        ).collect()
        # the trained boundary must separate the two synthetic classes
        for r in scored:
            if r.lang == "en":
                assert r.logit > 0, r
            else:
                assert r.logit < 0, r
