"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at a given sf against its ``oracle_sql()``
via DuckDB and reports row-count / schema / order-insensitive value-hash
agreement. Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def value_hash(rows, columns):
    cols = sorted(columns)
    digests = []
    for row in rows:
        d = row if isinstance(row, dict) else row.asDict()
        key = "|".join(_norm(d[c]) for c in cols)
        digests.append(key)
    digests.sort()
    return hashlib.sha256("\n".join(digests).encode()).hexdigest()[:16]


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entry
    from sparkhtml.spark.session import get_spark

    spark = get_spark(app_name="oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            o = con.sql(oracles[name])
            ocols = [c.lower() for c in o.columns]
            orows = [dict(zip(o.columns, r)) for r in o.fetchall()]
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error {exc}")
            failures += 1
            continue
        ok_count = len(srows) == len(orows)
        ok_schema = sorted(c.lower() for c in scols) == sorted(ocols)
        sh = value_hash(srows, scols)
        oh = value_hash(orows, o.columns)
        ok_hash = sh == oh
        status = "OK  " if (ok_count and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status}  {name}: rows {len(srows)}/{len(orows)} "
            f"schema={'ok' if ok_schema else f'{sorted(scols)}!={sorted(ocols)}'} "
            f"hash={'ok' if ok_hash else f'{sh}!={oh}'}"
        )
        if not ok_hash and ok_count and ok_schema:
            sset = {tuple(_norm(r.asDict()[c]) for c in sorted(scols)) for r in srows}
            oset = {tuple(_norm(r[c]) for c in sorted(o.columns)) for r in orows}
            for x in list(sset - oset)[:2]:
                print(f"      spark-only: {x}")
            for x in list(oset - sset)[:2]:
                print(f"      oracle-only: {x}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
