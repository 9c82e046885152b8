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

# The driver records at most this many rows per round. Round 6 settled
# the round-5 mystery: CORRECTNESS_r05/r06 both hold exactly 50 rows
# while the registry grew past 50, and the absent queries are precisely
# the LAST (len(queries) - 50) in registry order — the cap is positional
# (VERDICT.md round 6, "What's wrong" #3). Queries past position 50 must
# therefore be covered by the LOCAL oracle replica
# (tools/check_oracles.py) instead; test below enforces that the absent
# set is exactly the positional tail, never an interior drop.
DRIVER_ROW_CAP = 50

# Known driver-side reporting drops, pinned to the exact file they
# occurred in. revenue_by_nation: registered + judge-verified green in
# round 5 (VERDICT.md), but absent from the driver's file — 50 rows for
# 51 queries (the first sighting of the positional cap above).
KNOWN_DRIVER_DROPS: dict[str, set[str]] = {
    "CORRECTNESS_r05.json": {"revenue_by_nation"},
}

# Queries added since the latest CORRECTNESS file was recorded. Prune
# entries once a CORRECTNESS file containing them lands; a stale entry
# here is harmless, a missing one fails the test — which is the point.
ADDED_SINCE: dict[str, set[str]] = {}

# Driver rows whose VALUE-HASH diverges from the local oracle replica
# while rows_match and schema_match are still true. mix_to_budget in
# r06: driver hash_match=false, but the judge's own rerun of
# tools/check_oracles.py on sf0.01 was fully green (313/313, schema ok,
# hash ok — VERDICT.md round 6, "What's wrong" #1). Leading suspect:
# DuckDB renders the oracle's window `sum(tokens)` as HUGEINT while
# Spark's cum_tokens is BIGINT, and the driver's hasher renders the two
# differently. The VERDICT's suggested fix (cast the oracle ::BIGINT)
# was barred in the round-7 optimization round: oracle SQL text is
# fingerprint-frozen there and any edit is graded as a regression, so
# the divergence is pinned with its evidence instead of hidden. The pin
# applies to ANY correctness file while (and ONLY while) the oracle
# still carries the un-cast HUGEINT-producing window sum — the
# cause-guard in test_latest_correctness_rows_all_green invalidates the
# pin the moment a build round lands the cast, forcing cleanup. The
# test still requires rows_match and schema_match for pinned rows.
KNOWN_DRIVER_HASH_DIVERGENCES: set[str] = {"mix_to_budget"}


def _hash_divergence_cause_present(entry, name: str) -> bool:
    """True while the documented root cause is still in the oracle text."""
    if name != "mix_to_budget":
        return False
    sql = entry.oracle_sql().get(name, "")
    return "sum(tokens) over" in sql.lower() and "::bigint" not in (
        sql.lower().split("sum(tokens) over")[1][:120]
    )


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
    qs_ordered = list(entry.queries())
    qs = set(qs_ordered)
    recorded = set(rows)
    allowed_absent = KNOWN_DRIVER_DROPS.get(name, set()) | ADDED_SINCE.get(
        name, set()
    )
    # Positional driver cap: the tail past DRIVER_ROW_CAP is expected to
    # be absent from the driver file — but ONLY the exact tail. An
    # interior query missing while a tail query is present would mean a
    # real drop and must fail.
    capped_tail = set(qs_ordered[DRIVER_ROW_CAP:])
    unexplained = qs - recorded - allowed_absent - capped_tail
    assert not unexplained, (
        f"{name} is missing rows for registered queries {sorted(unexplained)} "
        "— either a driver drop (add to KNOWN_DRIVER_DROPS with evidence) or "
        "a new query (add to ADDED_SINCE until the next file lands); a "
        "silent gap is exactly what this test exists to catch"
    )
    recorded_from_tail = capped_tail & recorded
    assert not recorded_from_tail or len(recorded) > DRIVER_ROW_CAP, (
        f"{name} records tail queries {sorted(recorded_from_tail)} while "
        "interior queries are absent — that is a real drop, not the cap"
    )
    stale = recorded - qs
    assert not stale, f"{name} has rows for unregistered queries {sorted(stale)}"


def test_latest_correctness_rows_all_green():
    entry = _entry()
    name, rows = _latest_correctness()
    hash_divergent = {
        k
        for k in KNOWN_DRIVER_HASH_DIVERGENCES
        if _hash_divergence_cause_present(entry, k)
    }
    bad = {
        k: v
        for k, v in rows.items()
        if v.get("err")
        or not v.get("rows_match")
        or not v.get("schema_match")
        or (v.get("hash_match") is False and k not in hash_divergent)
    }
    assert not bad, f"non-green correctness rows: {bad}"
    # Pinned divergences may relax ONLY the value hash; rows and schema
    # must still match. (A pinned row absent from the file — e.g. pushed
    # past the 50-row driver cap — has nothing to check here.)
    for k in hash_divergent:
        if k not in rows:
            continue
        assert rows[k].get("rows_match") and rows[k].get("schema_match"), (
            f"{k} pinned as hash-divergent but rows/schema also mismatch: "
            f"{rows[k]}"
        )
    stale = KNOWN_DRIVER_HASH_DIVERGENCES - hash_divergent
    assert not stale, (
        f"hash-divergence pins whose root cause is gone from the oracle "
        f"(remove them): {sorted(stale)}"
    )


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
