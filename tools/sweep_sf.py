#!/usr/bin/env python
"""100x design sweep: time driver-registry queries at two REAL
scale-factor directories (default sf0.001 -> sf0.1, a 100x data ratio)
and report wall-ratio next to data-ratio per query.

The brief grades 100x DESIGN: a mechanism whose wall-clock grows no
faster than the data is shuffle/partition-shaped correctly; one that
outgrows the data has a superlinear plan (all-pairs candidates, a
corpus-wide sort, a rebuilt-per-call index).  Both endpoints are
driver-generated testdata, so the workload shape (dup structure,
embedding clusters, key skew) is the generator's own at each SF —
unlike tools/scale_bench.py, which replicates sf0.1 synthetically to
reach 10x upward.

At sf0.001 fixed per-query overhead (session, streaming-drain setup,
saveAsTable round-trips) dominates several entries, so healthy ratios
sit far BELOW the data ratio; the signal to act on is any ratio
APPROACHING or exceeding it.

Usage:
    python tools/sweep_sf.py [--base /root/testdata/sf0.001]
                             [--big /root/testdata/sf0.1]
                             [--only name1,name2] [--runs 1]

Prints one JSON line per query {"query", "base_sec", "big_sec",
"ratio"} plus a closing summary.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: the headline scale MECHANISMS (VERDICT r8 #4): storage-layout joins,
#: COW write path, MV resume, persisted-index ingest screens, LUT PQ,
#: banded pair scans
DEFAULT_QUERIES = [
    "op_bucketed_join",
    "op_bucketed_screen",
    "op_merge_cow_scope",
    "op_merge_update",
    "op_mv_incremental",
    "st_containment_indexed",
    "st_minhash_indexed",
    "st_ahash_screen",
    "st_screen_self_dedup",
    "s_pq_topk",
    "s_ivf_pq_topk",
    "dd_containment",
    "dd_minhash_lsh",
    "dd_minhash_prebuilt",
    "dd_simhash",
    "op_hamming_plan",
    "st_bloom_self",
    "st_bloom_strict",
    "op_merge_sql",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument("--big", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from astro_spark import get_session
    from astro_spark.testdata import read_table

    spark = get_session("sweep_sf")
    qs = entry.queries()
    names = args.only.split(",") if args.only else DEFAULT_QUERIES

    # warm both parquet footer caches + the JVM before any timing
    read_table(spark, args.base, "lineitem").count()
    read_table(spark, args.big, "lineitem").count()

    def timed(name: str, sf_dir: str) -> float:
        runs = []
        for _ in range(args.runs):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            runs.append(time.time() - t0)
        runs.sort()
        return runs[len(runs) // 2]

    results = []
    for name in names:
        if name not in qs:
            print(f'{{"query": "{name}", "skipped": "not registered"}}')
            continue
        b = timed(name, args.base)
        g = timed(name, args.big)
        r = {
            "query": name,
            "base_sec": round(b, 2),
            "big_sec": round(g, 2),
            "ratio": round(g / b, 2) if b > 0 else None,
        }
        results.append(r)
        print(json.dumps(r), flush=True)

    ok = [r for r in results if r["ratio"] is not None]
    print(
        json.dumps(
            {
                "summary": "sweep_sf",
                "base": args.base,
                "big": args.big,
                "n": len(ok),
                "max_ratio": max((r["ratio"] for r in ok), default=None),
                "sum_base": round(sum(r["base_sec"] for r in ok), 2),
                "sum_big": round(sum(r["big_sec"] for r in ok), 2),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
