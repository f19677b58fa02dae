"""Hand-case pins for operators/experiment.py (the oracle parity test
covers the registry wiring; these pin the math on tiny known inputs)."""

import pytest
import math

from pyspark.sql import Row

from telemetry_streaming_spark.operators.experiment import (
    chi_square_cells,
    kaplan_meier,
)


def test_chi_square_cells_2x2_hand_case(spark):
    # Classic 2x2: rows A/B, cols x/y with counts 10/20/30/40.
    rows = (
        [Row(r="A", c="x")] * 10
        + [Row(r="A", c="y")] * 20
        + [Row(r="B", c="x")] * 30
        + [Row(r="B", c="y")] * 40
    )
    out = {
        (row["row_key"], row["col_key"]): row
        for row in chi_square_cells(spark.createDataFrame(rows), "r", "c").collect()
    }
    assert set(out) == {("A", "x"), ("A", "y"), ("B", "x"), ("B", "y")}
    n = 100
    margins = {"A": 30, "B": 70, "x": 40, "y": 60}
    obs = {("A", "x"): 10, ("A", "y"): 20, ("B", "x"): 30, ("B", "y"): 40}
    for (r, c), row in out.items():
        delta = obs[(r, c)] * n - margins[r] * margins[c]
        assert row["n_obs"] == obs[(r, c)]
        assert row["delta"] == delta
        expect = math.floor(
            float(delta) * float(delta) / float(n * margins[r] * margins[c]) * 1e6
        )
        assert row["chi2_micro"] == expect
    # Chi-squared of this table is 100*(10*40-20*30)^2/(30*70*40*60):
    total = sum(row["chi2_micro"] for row in out.values()) / 1e6
    exact = 100 * (10 * 40 - 20 * 30) ** 2 / (30 * 70 * 40 * 60)
    assert abs(total - exact) < 4e-6  # four per-cell floors


@pytest.mark.full  # r11: >=5s; fast-tier siblings cover this surface
def test_chi_square_cells_independent_table_has_zero_delta(spark):
    # Perfectly independent table: every delta is exactly 0.
    rows = []
    for r, rn in [("A", 1), ("B", 3)]:
        for c, cn in [("x", 2), ("y", 5)]:
            rows += [Row(r=r, c=c)] * (rn * cn)
    out = chi_square_cells(spark.createDataFrame(rows), "r", "c").collect()
    assert all(row["delta"] == 0 and row["chi2_micro"] == 0 for row in out)


def test_kaplan_meier_hand_case(spark):
    # durations: 1(d),1(c),2(d),2(d),3(c)  -> at-risk 5,3,1 at t=1,2,3
    df = spark.createDataFrame(
        [Row(duration=1, observed=1), Row(duration=1, observed=0),
         Row(duration=2, observed=1), Row(duration=2, observed=1),
         Row(duration=3, observed=0)]
    )
    out = {row["t"]: row for row in kaplan_meier(df).collect()}
    assert (out[1]["d"], out[1]["c"], out[1]["n_at_risk"]) == (1, 1, 5)
    assert (out[2]["d"], out[2]["c"], out[2]["n_at_risk"]) == (2, 0, 3)
    assert (out[3]["d"], out[3]["c"], out[3]["n_at_risk"]) == (0, 1, 1)


def test_kaplan_meier_at_risk_is_monotone_and_conserves_mass(spark):
    import random

    rng = random.Random(7)
    df = spark.createDataFrame(
        [Row(duration=rng.randint(0, 20), observed=rng.randint(0, 1)) for _ in range(200)]
    )
    rows = sorted(kaplan_meier(df).collect(), key=lambda r: r["t"])
    # first at-risk == population; at-risk decreases by exactly d+c each step
    assert rows[0]["n_at_risk"] == 200
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_at_risk"] == prev["n_at_risk"] - prev["d"] - prev["c"]
    assert rows[-1]["n_at_risk"] == rows[-1]["d"] + rows[-1]["c"]


class TestRankCorrStats:
    def test_matches_python_replica_with_ties(self, spark):
        """RANK() min-rank tie semantics, moment sums exact — and the
        derived rho equals scipy-free Pearson-over-ranks."""
        import random

        from pyspark.sql import Row

        from telemetry_streaming_spark.operators.experiment import rank_corr_stats

        rng = random.Random(13)
        rows = [
            ("g1", rng.randint(0, 20), rng.randint(0, 5))  # heavy ties
            for _ in range(200)
        ] + [("g2", i, -i) for i in range(50)]  # perfect anti-monotone
        df = spark.createDataFrame(
            [Row(g=g, x=float(x), y=float(y)) for g, x, y in rows]
        )

        def min_rank(vals):
            s = sorted(vals)
            first = {}
            for i, v in enumerate(s):
                first.setdefault(v, i + 1)
            return [first[v] for v in vals]

        want = {}
        for g in ("g1", "g2"):
            xs = [x for gg, x, _ in rows if gg == g]
            ys = [y for gg, _, y in rows if gg == g]
            rx, ry = min_rank(xs), min_rank(ys)
            want[g] = (
                len(rx),
                sum(rx), sum(ry),
                sum(r * r for r in rx), sum(r * r for r in ry),
                sum(a * b for a, b in zip(rx, ry)),
            )
        got = {
            r["g"]: (r["n"], r["sum_rx"], r["sum_ry"],
                     r["sum_rx2"], r["sum_ry2"], r["sum_rxy"])
            for r in rank_corr_stats(df, ["g"], "x", "y").collect()
        }
        assert got == want
        # rho from the g2 sufficient stats must be exactly -1
        n, sx, sy, sx2, sy2, sxy = got["g2"]
        num = n * sxy - sx * sy
        den = ((n * sx2 - sx * sx) * (n * sy2 - sy * sy)) ** 0.5
        assert abs(num / den + 1.0) < 1e-12

    def test_null_rows_excluded_and_validation(self, spark):
        from pyspark.sql import Row

        from telemetry_streaming_spark.operators.experiment import rank_corr_stats

        df = spark.createDataFrame(
            [Row(g="a", x=1.0, y=2.0), Row(g="a", x=None, y=3.0),
             Row(g="a", x=4.0, y=None)],
            "g string, x double, y double",
        )
        (row,) = rank_corr_stats(df, ["g"], "x", "y").collect()
        assert row["n"] == 1
        import pytest as _pytest

        with _pytest.raises(ValueError):
            rank_corr_stats(df, [], "x", "y")
