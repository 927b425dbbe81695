#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB (same parquet tables registered as views),
then compares row count, sorted column names, and an order-insensitive
canonical value hash.

Driver-faithful fetch path (round 5): both sides are materialized as
pandas frames (``sdf.toPandas()`` / ``rel.fetchdf()``) before hashing,
because that is what the driver does.  This surfaces representation
divergences that native-Python ``fetchall()`` masks — most importantly
DuckDB HUGEINT (int128, the type of ``SUM(BIGINT)``) degrading to
float64 through Arrow/pandas, while Spark's SUM stays int64.  The old
checker's ``float == int(float)`` canonical collapse is gone for the
same reason: the driver distinguishes 3.18e11 (float64) from
318325627163 (int64), so we must too.

Usage:

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
    """Canonical string for one cell of a *pandas* frame.

    Faithful to the driver: ints and floats canonicalize differently
    (no integral-float collapse), floats print full ``repr`` precision
    (no rounding — queries are required to be bit-identical across
    engines), NaN/NaT/None all mean null.
    """
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "∅"
        return repr(f)
    if isinstance(v, pd.Timestamp):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        # driver-observed: DATE and midnight-TIMESTAMP hash as equal
        # (q3/q_recursive_spine driver-green in r01/r02 with Spark DATE
        # vs DuckDB TIMESTAMP outputs) — canon dates as midnight
        return v.isoformat() + " 00:00:00"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(canon(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    # pandas NA scalar (nullable dtypes)
    try:
        import pandas as pd  # noqa: F811

        if v is pd.NA:
            return "∅"
    except Exception:  # noqa: BLE001
        pass
    return str(v)


def pdf_digest(pdf):
    """Order-insensitive hash of a pandas frame, columns sorted by name."""
    cols = sorted(pdf.columns)
    lines = sorted(
        "|".join(canon(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
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
            spdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            results[name] = {"status": "SPARK_ERROR", "error": str(exc)[:500]}
            failed.append(name)
            print(f"✗ {name}: SPARK_ERROR {str(exc)[:200]}")
            continue
        if name not in oracles:
            results[name] = {"status": "ROWS_ONLY", "rows": len(spdf)}
            print(f"~ {name}: rows-only ({len(spdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            opdf = con.sql(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            results[name] = {"status": "ORACLE_ERROR", "error": str(exc)[:500]}
            failed.append(name)
            print(f"✗ {name}: ORACLE_ERROR {str(exc)[:200]}")
            continue

        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rowcount spark={len(spdf)} oracle={len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(
                f"columns spark={sorted(spdf.columns)} oracle={sorted(opdf.columns)}"
            )
        if not problems:
            sh, slines = pdf_digest(spdf)
            oh, olines = pdf_digest(opdf)
            if sh != oh:
                problems.append("value-hash mismatch")
                if args.verbose:
                    sset, oset = set(slines), set(olines)
                    print("  spark-only:", sorted(sset - oset)[:5])
                    print("  oracle-only:", sorted(oset - sset)[:5])
        if problems:
            results[name] = {"status": "MISMATCH", "detail": problems, "rows": len(spdf)}
            failed.append(name)
            print(f"✗ {name}: {problems} [{time.time()-t0:.1f}s]")
        else:
            results[name] = {"status": "MATCH", "rows": len(spdf)}
            print(f"✓ {name}: {len(spdf)} rows match [{time.time()-t0:.1f}s]")

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
