#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB (same parquet tables registered as views),
then compares row count, sorted column names, and an order-insensitive
canonical value hash.  Usage:

    python tools/check_correctness.py [--sf DIR] [--only name1,name2] [-v]
"""

from __future__ import annotations

import argparse
import datetime as dt
import hashlib
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, (dt.datetime,)):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_digest(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest(), lines


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from astro_spark import get_session

    spark = get_session("correctness")
    queries = entry.queries()
    oracles = entry.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    results = {}
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            results[name] = {"status": "SPARK_ERROR", "error": str(exc)[:500]}
            failed.append(name)
            print(f"✗ {name}: SPARK_ERROR {str(exc)[:200]}")
            continue
        if name not in oracles:
            results[name] = {"status": "ROWS_ONLY", "rows": len(srows)}
            print(f"~ {name}: rows-only ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c for c in rel.columns]
            orows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            results[name] = {"status": "ORACLE_ERROR", "error": str(exc)[:500]}
            failed.append(name)
            print(f"✗ {name}: ORACLE_ERROR {str(exc)[:200]}")
            continue

        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sh, slines = frame_digest(scols, srows)
            oh, olines = frame_digest(ocols, orows)
            if sh != oh:
                problems.append("value-hash mismatch")
                if args.verbose:
                    sset, oset = set(slines), set(olines)
                    print("  spark-only:", sorted(sset - oset)[:5])
                    print("  oracle-only:", sorted(oset - sset)[:5])
        if problems:
            results[name] = {"status": "MISMATCH", "detail": problems, "rows": len(srows)}
            failed.append(name)
            print(f"✗ {name}: {problems} [{time.time()-t0:.1f}s]")
        else:
            results[name] = {"status": "MATCH", "rows": len(srows)}
            print(f"✓ {name}: {len(srows)} rows match [{time.time()-t0:.1f}s]")

    n_match = sum(1 for r in results.values() if r["status"] == "MATCH")
    print(
        f"\n{n_match}/{len(results)} hash-match, "
        f"{sum(1 for r in results.values() if r['status']=='ROWS_ONLY')} rows-only, "
        f"{len(failed)} failed"
    )
    snap = Path("CORRECTNESS_local.json")
    if only and snap.exists():
        # A filtered run refreshes only its entries — never shrink the
        # full snapshot down to the filter set.
        merged = json.loads(snap.read_text())
        merged.update(results)
        results = merged
    snap.write_text(json.dumps(results, indent=2))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
