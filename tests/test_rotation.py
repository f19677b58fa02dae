"""Window-rotation bookkeeping guard.

The driver hash-checks only the FIRST 50 entries of ``queries()`` each
round.  ``plans/queries.py`` front-loads never-checked queries via
``_FRONT_WINDOW``; that list is hand-edited, and a missed edit silently
wastes a round's driver check (r4 verdict, "Next round" item 2).  This
test makes the bookkeeping mechanical: every oracle-backed registry
query must either already have a hash-green row in some committed
``CORRECTNESS_r*.json`` or sit inside the current first-50 window.
Rows-only queries get the weaker requirement of having been driver-seen
(a rows-check row) or being in the window.
"""

import json
from pathlib import Path

import pytest

from telemetry_streaming_spark.plans.queries import (
    QUERIES,
    _FRONT_WINDOW,
    _QUEUED_NEXT_WINDOW,
)

REPO_ROOT = Path(__file__).resolve().parents[1]
WINDOW_SIZE = 50


def _correctness_rows():
    rows = {}
    # r* not r0*: round 10+ artifacts must keep counting
    for path in sorted(REPO_ROOT.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(path.read_text()).items():
            prev = rows.get(name, {})
            # keep the strongest result seen across rounds
            if row.get("hash_match") is True or not prev:
                rows[name] = row
    return rows


def test_correctness_artifacts_exist():
    assert list(REPO_ROOT.glob("CORRECTNESS_r*.json")), (
        "no committed CORRECTNESS artifacts found — "
        "run from the repo checkout"
    )


def test_front_window_names_are_registered():
    unknown = [n for n in _FRONT_WINDOW if n not in QUERIES]
    assert not unknown, f"_FRONT_WINDOW names not in registry: {unknown}"


def test_front_window_is_exactly_window_sized():
    """The driver checks the FIRST 50 registry entries; entry #51 of a
    hand-edited list silently misses every round (caught drifting to
    51 in r6)."""
    assert len(_FRONT_WINDOW) == WINDOW_SIZE, (
        f"_FRONT_WINDOW has {len(_FRONT_WINDOW)} entries, "
        f"must be exactly {WINDOW_SIZE}"
    )


def test_front_window_has_no_duplicates():
    dupes = {n for n in _FRONT_WINDOW if _FRONT_WINDOW.count(n) > 1}
    assert not dupes, f"duplicate _FRONT_WINDOW entries: {dupes}"


def test_window_is_registry_prefix():
    head = list(QUERIES)[: len(_FRONT_WINDOW)]
    assert head == list(_FRONT_WINDOW), (
        "registry order does not start with _FRONT_WINDOW — "
        "_reorder_registry() must run at import time"
    )


def test_every_oracle_backed_query_is_green_or_windowed():
    """Not green + not in window is a SILENT miss unless the query is
    consciously deferred via _QUEUED_NEXT_WINDOW (allowed only when
    the window is already saturated — see the anchor test below)."""
    rows = _correctness_rows()
    window = set(list(QUERIES)[:WINDOW_SIZE])
    queued = set(_QUEUED_NEXT_WINDOW)
    missed = []
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            continue
        row = rows.get(name)
        green = bool(row and row.get("hash_match") is True)
        if not green and name not in window and name not in queued:
            missed.append(name)
    assert not missed, (
        "oracle-backed queries with no hash-green driver row that are "
        f"outside the first-{WINDOW_SIZE} window (add them to "
        f"_FRONT_WINDOW, or to _QUEUED_NEXT_WINDOW if the window is "
        f"full): {missed}"
    )


def test_queue_only_used_when_window_is_saturated():
    """_QUEUED_NEXT_WINDOW exists for the one legitimate case — more
    never-checked queries than window slots.  If the window still has
    anchor slack (or stale queue entries are already green), queueing
    would just postpone a check for no reason; refuse it."""
    rows = _correctness_rows()
    if not _QUEUED_NEXT_WINDOW:
        return
    never_checked = [
        n
        for n, s in QUERIES.items()
        if not (rows.get(n) and rows[n].get("hash_match") is True)
        and (s.oracle is not None or n not in rows)
    ]
    assert len(never_checked) > WINDOW_SIZE, (
        f"window has slack ({len(never_checked)} never-checked <= "
        f"{WINDOW_SIZE} slots) — move queued entries into _FRONT_WINDOW: "
        f"{_QUEUED_NEXT_WINDOW}"
    )
    stale = [
        n
        for n in _QUEUED_NEXT_WINDOW
        if rows.get(n) and rows[n].get("hash_match") is True
    ]
    assert not stale, f"queued entries already hash-green: {stale}"


def test_every_rows_only_query_is_seen_or_windowed():
    rows = _correctness_rows()
    window = set(list(QUERIES)[:WINDOW_SIZE])
    missed = []
    for name, spec in QUERIES.items():
        if spec.oracle is not None:
            continue
        if name not in rows and name not in window:
            missed.append(name)
    assert not missed, (
        "rows-only queries never driver-checked and outside the window "
        f"(add them to _FRONT_WINDOW): {missed}"
    )


def test_window_anchors_are_already_green():
    """Anything in the window that HAS a green row is an anchor; anchors
    must not crowd out never-checked queries.  Equivalently: every
    never-checked oracle-backed query must appear BEFORE any anchor
    would need its slot — i.e. count(never-checked) <= WINDOW_SIZE."""
    rows = _correctness_rows()
    never_green = [
        n
        for n, s in QUERIES.items()
        if s.oracle is not None
        and not (rows.get(n) and rows[n].get("hash_match") is True)
    ]
    if len(never_green) > WINDOW_SIZE:
        pytest.fail(
            f"{len(never_green)} never-green oracle-backed queries exceed "
            f"the {WINDOW_SIZE}-slot window — split across rounds and "
            "front-load the oldest"
        )


def test_registry_counts_pinned():
    """Pin the registry size so prose counts (rotation.py docstring,
    README, SURVEY) cannot silently drift from the registry again
    (r7 ADVICE: docs said 198 while HEAD held 204).  Adding a query
    means updating this pin in the same commit."""
    oracle_backed = sum(1 for s in QUERIES.values() if s.oracle is not None)
    rows_only = sum(1 for s in QUERIES.values() if s.oracle is None)
    assert (len(QUERIES), oracle_backed, rows_only) == (235, 216, 19), (
        f"registry is {len(QUERIES)} queries ({oracle_backed} oracle-backed"
        f" + {rows_only} rows-only) — update this pin AND every prose count"
        " (plans/rotation.py docstring, README.md, SURVEY.md)"
    )


def test_front_window_matches_lru_computation():
    """r7+: the window is least-recently-checked-first, COMPUTED from
    the committed CORRECTNESS artifacts (r6 verdict item 1).  The
    committed _FRONT_WINDOW must equal the recomputation exactly —
    when a new round's artifact lands, this pin fails until the window
    is regenerated via `python -m telemetry_streaming_spark.plans.rotation`,
    so the standing regression sweep cannot be silently skipped."""
    from telemetry_streaming_spark.plans.rotation import (
        compute_front_window,
        load_check_history,
    )

    expected = compute_front_window(
        list(QUERIES), load_check_history(REPO_ROOT), WINDOW_SIZE
    )
    assert list(_FRONT_WINDOW) == expected, (
        "committed _FRONT_WINDOW is stale — regenerate with "
        "`python -m telemetry_streaming_spark.plans.rotation` "
        f"(first divergence at index "
        f"{next(i for i, (a, b) in enumerate(zip(_FRONT_WINDOW, expected)) if a != b) if _FRONT_WINDOW != expected and any(a != b for a, b in zip(_FRONT_WINDOW, expected)) else 'length'})"
    )


def test_lru_ordering_property():
    """The LRU contract itself: within the computed window, no query
    may have a strictly LATER last-confirmed round than any registry
    query left outside it (never-confirmed counts as round -1)."""
    from telemetry_streaming_spark.plans.rotation import load_check_history

    history = load_check_history(REPO_ROOT)

    def last_confirmed(name):
        return max(
            (rnd for rnd, ok in history.get(name, []) if ok), default=-1
        )

    window = list(QUERIES)[:WINDOW_SIZE]
    outside = [n for n in QUERIES if n not in set(window)]
    if not outside:
        return
    worst_in = max(last_confirmed(n) for n in window)
    best_out = min(last_confirmed(n) for n in outside)
    assert worst_in <= best_out, (
        f"window holds a query confirmed in round {worst_in} while one "
        f"confirmed in round {best_out} sits outside — not LRU"
    )
