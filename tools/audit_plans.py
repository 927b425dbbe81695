#!/usr/bin/env python
"""Plan auditor: executed-plan shape for every driver query.

Usage:
    python tools/audit_plans.py [--sf DIR] [--only name1,name2] [--full name]

Prints per query: Exchange / join-strategy / codegen counts, flagging
the shapes that regress at scale (BroadcastNestedLoopJoin, CartesianProduct,
missing pushed filters on scans).  ``--full`` dumps the formatted plan of
one query for eyeball review.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FLAGS = ("BroadcastNestedLoopJoin", "CartesianProduct")
COUNTS = (
    "Exchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "WholeStageCodegen",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--full", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from astro_spark import get_session

    spark = get_session("plan-audit")
    qs = entry.queries()
    names = args.only.split(",") if args.only else list(qs)

    if args.full:
        df = qs[args.full](spark, args.sf)
        df.explain("formatted")
        spark.stop()
        return

    flagged = []
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # streaming queries have no static plan pre-run
            print(f"{name}: (no static plan: {type(exc).__name__})")
            continue
        counts = {k: plan.count(k) for k in COUNTS}
        line = " ".join(f"{k.replace('Join', 'J')}={v}" for k, v in counts.items() if v)
        bad = [f for f in FLAGS if counts.get(f)]
        mark = " ⚠ " + ",".join(bad) if bad else ""
        print(f"{name}: {line or 'map-only'}{mark}")
        if bad:
            flagged.append(name)
    print(f"\n{len(flagged)} flagged: {flagged}" if flagged else "\nno flagged plans")
    spark.stop()


if __name__ == "__main__":
    main()
