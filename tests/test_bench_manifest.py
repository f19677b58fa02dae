"""Bench-harness bookkeeping guards (no Spark session needed).

The bench artifacts are graded mechanically each round; a HEADLINE or
TREND name that drifts out of the registry, or a baseline that names a
query the registry no longer has, silently breaks the round-over-round
comparison.  Pin the set relationships here.
"""

import json
from pathlib import Path

import bench
from telemetry_streaming_spark.plans.queries import QUERIES

REPO_ROOT = Path(__file__).resolve().parents[1]


def test_headline_names_are_registered():
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"HEADLINE names not in registry: {missing}"


def test_headline_is_frozen():
    """r10 tiering contract (r9 verdict item 8): the headline set may
    never exceed HEADLINE_MAX — a new query displaces a floor-proven
    entry into HEADLINE_RETIRED instead of growing the gate metric."""
    assert len(bench.HEADLINE) <= bench.HEADLINE_MAX, (
        f"HEADLINE has {len(bench.HEADLINE)} entries, frozen at "
        f"{bench.HEADLINE_MAX} — retire a floor-proven sub-second "
        "entry into HEADLINE_RETIRED instead"
    )
    overlap = set(bench.HEADLINE) & set(bench.HEADLINE_RETIRED)
    assert not overlap, f"entries both headline and retired: {overlap}"
    missing = [n for n in bench.HEADLINE_RETIRED if n not in QUERIES]
    assert not missing, f"HEADLINE_RETIRED names not in registry: {missing}"


def test_trend_names_are_headline_and_oracle_backed():
    benched = set(bench.HEADLINE) | set(bench.HEADLINE_RETIRED)
    not_benched = [n for n in bench.TREND if n not in benched]
    assert not not_benched, (
        f"TREND names neither headline nor retired-smoke: {not_benched}"
    )
    # the FULL tier's falling-ratio rows are the public defense of the
    # gate metric — a FULL entry must stay in the timed headline set
    not_headline = [n for n in bench.TREND_FULL if n not in bench.HEADLINE]
    assert not not_headline, f"TREND_FULL names not in HEADLINE: {not_headline}"
    no_oracle = [n for n in bench.TREND if QUERIES[n].oracle is None]
    assert not no_oracle, f"TREND names without oracle: {no_oracle}"


def test_trend_tiers_are_disjoint_and_complete():
    """r8 (r7 verdict item 8), extended r9: TREND is split into a
    3-scale-point FULL tier, a proven-floor GRADUATED spot-check tier
    and a flat-sub-second SECONDS_PINNED tier; the union is the
    committed TREND surface, and no entry may sit in two tiers."""
    tiers = [
        set(bench.TREND_FULL),
        set(bench.TREND_GRADUATED),
        set(bench.TREND_SECONDS_PINNED),
    ]
    for i, a in enumerate(tiers):
        for b in tiers[i + 1:]:
            assert not (a & b), f"entries in two trend tiers: {a & b}"
    assert bench.TREND == (
        bench.TREND_FULL
        + bench.TREND_GRADUATED
        + list(bench.TREND_SECONDS_PINNED)
    )
    assert bench.GRADUATE_BOUND > 2, "graduation must stay above the 2x gate"
    # a seconds pin of 0 (or negative) would flag every run regressed
    assert all(p > 0 for p in bench.TREND_SECONDS_PINNED.values())


def test_baseline_names_are_registered():
    """BENCH_BASELINE.json (per-query idle medians, r6 verdict item 3)
    must only name registry queries, and must carry the sf and the
    idle-evidence markers it was recorded under."""
    path = REPO_ROOT / "BENCH_BASELINE.json"
    assert path.exists(), (
        "BENCH_BASELINE.json missing — record one with "
        "`python bench.py --refresh-baseline` on an idle machine"
    )
    base = json.loads(path.read_text())
    unknown = [n for n in base["queries"] if n not in QUERIES]
    assert not unknown, f"baseline names not in registry: {unknown}"
    assert base["sf"] > 0
    assert base.get("loadavg_1m_start") is not None
    assert base.get("recheck_spread") is not None
    assert all(v > 0 for v in base["queries"].values())


def test_output_markers_survive_tail_truncation():
    """The driver records only the TAIL of bench stdout; r7's committed
    artifact lost `value` and every honesty marker because the big
    baseline_delta dict serialized last (r7 verdict item 3).  Pin the
    serialized key order: per-query dicts first, markers + value last."""
    out = bench.assemble_output(
        timings={"q1": 1.0},
        sf=0.1,
        baseline_delta={"q1": 1.0},
        resampled=[],
        recheck={"query": "q1", "spread": 1.0},
        load_at_start=0.0,
        load_at_end=0.0,
        idle_gate_passed=True,
        contention=False,
    )
    serialized = json.dumps(out)
    markers = [
        "recheck",
        "loadavg_1m_start",
        "loadavg_1m_end",
        "idle_gate_passed",
        "contention_suspected",
        "value",
    ]
    bulk_end = max(
        serialized.index('"queries"'), serialized.index('"baseline_delta"')
    )
    for key in markers:
        assert serialized.rindex(f'"{key}"') > bulk_end, (
            f"marker {key!r} serializes before the per-query dicts — "
            "it would be truncated out of the committed artifact"
        )
    assert list(out)[-1] == "value", "`value` must be the final key"


def test_headline_covers_committed_baseline():
    """Every baseline query must still be benched — timed (HEADLINE)
    or count-only smoke (HEADLINE_RETIRED): a silent removal would
    stop tracking a query the baseline still grades.  Retired entries
    drop out of the baseline at its next --refresh-baseline."""
    path = REPO_ROOT / "BENCH_BASELINE.json"
    base = json.loads(path.read_text())
    benched = set(bench.HEADLINE) | set(bench.HEADLINE_RETIRED)
    dropped = [n for n in base["queries"] if n not in benched]
    assert not dropped, f"baseline queries no longer benched: {dropped}"
