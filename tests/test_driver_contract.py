"""Driver-contract self-check (VERDICT round-5 item #2).

Round 5 exposed a silent reporting gap: ``revenue_by_nation`` was
registered in ``queries()`` and green, but the driver's
CORRECTNESS_r05.json simply had no row for it — a real failure could
hide the same way. These tests make the contract self-verifying:

1. every ``queries()`` key has an ``oracle_sql()`` entry (or is in the
   documented rows-only set), and no oracle is orphaned;
2. every ``queries()`` key appears in the LATEST CORRECTNESS_r*.json,
   unless it is (a) a known driver drop pinned to that specific file,
   or (b) a query added after that file was recorded (listed here and
   pruned next round — a missing, unexplained key FAILS loudly);
3. every recorded row is fully green (rows+schema+hash, no err).
"""

from __future__ import annotations

import glob
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries intentionally registered WITHOUT an oracle_sql() entry (the
# driver records a weaker rows-only check for these). Currently none.
ROWS_ONLY: set[str] = set()

# Known driver-side reporting drops, pinned to the exact file they
# occurred in. revenue_by_nation: registered + judge-verified green in
# round 5 (VERDICT.md), but absent from the driver's file — 50 rows for
# 51 queries.
KNOWN_DRIVER_DROPS: dict[str, set[str]] = {
    "CORRECTNESS_r05.json": {"revenue_by_nation"},
}

# Queries added since the latest CORRECTNESS file was recorded. Prune
# entries once a CORRECTNESS file containing them lands; a stale entry
# here is harmless, a missing one fails the test — which is the point.
ADDED_SINCE: dict[str, set[str]] = {
    "CORRECTNESS_r05.json": {
        "pack_greedy_bucketed",
        "mix_to_budget",
        "cluster_survivors",
        "drop_repeated_spans",
        "pdf_extract",
        "pdf_layout",
        "pdf_links",
    },
}


def _latest_correctness():
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not files:
        pytest.skip("no CORRECTNESS file yet (round 1)")
    path = files[-1]
    with open(path) as f:
        return os.path.basename(path), json.load(f)


def _entry():
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    return entry


def test_every_query_has_oracle_or_is_documented_rows_only():
    entry = _entry()
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    missing = qs - oracles - ROWS_ONLY
    assert not missing, (
        f"queries with neither oracle_sql nor ROWS_ONLY listing: {sorted(missing)}"
    )
    orphans = oracles - qs
    assert not orphans, f"oracle_sql entries with no query: {sorted(orphans)}"


def test_latest_correctness_file_covers_every_registered_query():
    entry = _entry()
    name, rows = _latest_correctness()
    qs = set(entry.queries())
    recorded = set(rows)
    allowed_absent = KNOWN_DRIVER_DROPS.get(name, set()) | ADDED_SINCE.get(
        name, set()
    )
    unexplained = qs - recorded - allowed_absent
    assert not unexplained, (
        f"{name} is missing rows for registered queries {sorted(unexplained)} "
        "— either a driver drop (add to KNOWN_DRIVER_DROPS with evidence) or "
        "a new query (add to ADDED_SINCE until the next file lands); a "
        "silent gap is exactly what this test exists to catch"
    )
    stale = recorded - qs
    assert not stale, f"{name} has rows for unregistered queries {sorted(stale)}"


def test_latest_correctness_rows_all_green():
    _, rows = _latest_correctness()
    bad = {
        k: v
        for k, v in rows.items()
        if v.get("err")
        or not v.get("rows_match")
        or not v.get("schema_match")
        or (v.get("hash_match") is False)
    }
    assert not bad, f"non-green correctness rows: {bad}"


def test_ngram_jaccard_oracle_shingle_bound():
    """Soundness bound for the identical-set ngram_jaccard oracle.

    The oracle (``_ngram_jaccard_oracle``) equates "jaccard >= 0.999"
    with "identical distinct-shingle sets", valid only while every doc
    pair has |shingle union| < 1000 (distinct sets satisfy
    jaccard <= 1 - 1/|union|). Pin max per-doc distinct shingles well
    under 500 at every testdata SF so the union of any pair stays under
    1000; if testdata ever grows longer docs, this fails before the
    oracle can go quietly unsound.
    """
    import glob as _glob

    import duckdb

    for path in sorted(_glob.glob("/root/testdata/sf*/documents.parquet")):
        (mx,) = duckdb.sql(
            "SELECT coalesce(max(len(list_distinct("
            "CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')] "
            "ELSE [array_to_string(list_slice(ws, i, i+2), ' ') "
            "FOR i IN range(1, len(ws) - 1)] END))), 0) FROM ("
            "SELECT list_filter(string_split(trim(regexp_replace("
            "lower(text), '\\s+', ' ', 'g')), ' '), w -> len(w) > 0) AS ws "
            f"FROM read_parquet('{path}'))"
        ).fetchone()
        assert mx < 500, f"{path}: max distinct shingles {mx} >= 500"
