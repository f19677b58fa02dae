"""Least-recently-checked-first computation of the driver window.

The driver's correctness harness hash-checks only the FIRST
``WINDOW_SIZE`` entries of ``queries()`` each round.  Through r6 the
window was hand-picked; with every registry query now driver-green at
least once (r6 verdict), the window's job changes from "get everything
checked once" to "a standing regression sweep" — and hand-picking 43
anchor slots every round is exactly the kind of bookkeeping that rots.

This module makes the window *computed* from the committed
``CORRECTNESS_r*.json`` artifacts, ordered least-recently-checked
first:

1. **Never-checked queries claim slots first** (a new query has no
   driver row at all), ordered by name for determinism.
2. Then ascending by the round of the query's most recent *successful*
   check (hash-green for oracle-backed queries; driver-seen for
   rows-only ones) — the least-recently-confirmed query is the one
   whose regression would stay hidden longest.
3. Ties broken by ascending total check count (a once-checked query
   outranks a twice-checked one from the same round), then by name.

With a 50-slot window, every registry query is re-confirmed at worst
every ceil(len(QUERIES)/50) rounds (5 rounds at the current 235-query
registry; ``tests/test_rotation.py`` pins the count so it cannot
silently drift from this note again).

The committed ``_FRONT_WINDOW`` in ``plans/queries.py`` stays an
explicit list (the driver must see a stable window for the whole
round, independent of when artifacts land), but it is *generated* by
``python -m telemetry_streaming_spark.plans.rotation`` and pinned by
``tests/test_rotation.py::test_front_window_matches_lru_computation``,
which recomputes it from the artifacts.  When a new CORRECTNESS
artifact is committed at round end, the pin fails loudly at the start
of the next round until the window is regenerated — rotation can no
longer be silently skipped.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

WINDOW_SIZE = 50

_ROUND_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")


def load_check_history(repo_root: Path) -> dict[str, list[tuple[int, bool]]]:
    """Per query: [(round, ok), ...] across all committed artifacts.

    ``ok`` means the check *confirmed* the query that round:
    hash_match is True (oracle-backed) or the row is a rows-only
    driver-seen row (hash_match is None with err == "no_oracle").
    A failed row (hash_match False, or an err other than no_oracle)
    is recorded as not-ok: it must NOT advance the query's
    last-confirmed round.
    """
    history: dict[str, list[tuple[int, bool]]] = {}
    for path in sorted(repo_root.glob("CORRECTNESS_r*.json")):
        m = _ROUND_RE.search(path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, row in json.loads(path.read_text()).items():
            ok = row.get("hash_match") is True or (
                row.get("hash_match") is None and row.get("err") == "no_oracle"
            )
            history.setdefault(name, []).append((rnd, ok))
    return history


def compute_front_window(
    query_names: list[str],
    history: dict[str, list[tuple[int, bool]]],
    window_size: int = WINDOW_SIZE,
) -> list[str]:
    """The next round's first-``window_size`` registry entries,
    least-recently-confirmed first (see module docstring for the
    ordering contract)."""

    def key(name: str):
        checks = history.get(name, [])
        confirmed = [rnd for rnd, ok in checks if ok]
        last = max(confirmed) if confirmed else -1  # never-confirmed first
        return (last, len(confirmed), name)

    ranked = sorted(query_names, key=key)
    return ranked[:window_size]


def render_front_window(window: list[str]) -> str:
    lines = ["_FRONT_WINDOW = ["]
    for i in range(0, len(window), 3):
        chunk = ", ".join(f'"{n}"' for n in window[i : i + 3])
        lines.append(f"    {chunk},")
    lines.append("]")
    return "\n".join(lines)


def main() -> None:  # pragma: no cover - exercised via the pin test
    import sys

    import telemetry_streaming_spark.plans.queries as q

    repo_root = Path(__file__).resolve().parents[2]
    window = compute_front_window(
        list(q.QUERIES), load_check_history(repo_root)
    )
    rendered = render_front_window(window)
    if "--write" in sys.argv:
        # Round-start ritual, one command: patch the committed
        # _FRONT_WINDOW literal in plans/queries.py in place so the
        # test_rotation.py pin goes green (r9 verdict, "Next round"
        # item 1: automate the regeneration that consumed the first
        # commit of rounds 7-9).
        path = repo_root / "telemetry_streaming_spark" / "plans" / "queries.py"
        src = path.read_text()
        start = src.index("_FRONT_WINDOW = [")
        end = src.index("]", start) + 1
        if src[start:end] == rendered:
            print(f"{path}: _FRONT_WINDOW already current")
        else:
            path.write_text(src[:start] + rendered + src[end:])
            print(f"{path}: _FRONT_WINDOW rewritten ({len(window)} entries)")
    else:
        print(rendered)


if __name__ == "__main__":
    main()
