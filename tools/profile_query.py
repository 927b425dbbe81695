#!/usr/bin/env python
"""Per-query profiler for the optimization rounds.

For each named query: runs it N times (bench methodology: construct +
count), reports per-run wall seconds split into CONSTRUCT (Python builds
the DataFrame — driver-side plan assembly, fixture commits, py4j) and
EXECUTE (the .count()), and pulls the Spark REST API to attribute time
to individual jobs (named via setJobDescription where the code does so).

Usage:
    python tools/profile_query.py q1_pricing_summary dd_semantic [--runs 3]
        [--sf /root/testdata/sf0.1] [--explain plans/r14] [--jobs]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def rest_jobs(spark, since_ms: int) -> list[dict]:
    try:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs") as r:
            jobs = json.load(r)
    except Exception as e:  # pragma: no cover
        print(f"  [rest api unavailable: {e}]", file=sys.stderr)
        return []
    out = []
    for j in jobs:
        t = j.get("submissionTime")
        if not t:
            continue
        # e.g. 2026-08-17T08:00:00.000GMT
        import datetime as dt

        ts = dt.datetime.strptime(t.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        if ts.timestamp() * 1000 >= since_ms:
            out.append(j)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir to write <name>_before.txt")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--jobs", action="store_true", help="print per-job REST breakdown")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from astro_spark import get_session
    from astro_spark.testdata import read_table

    spark = get_session("profile")
    qs = entry.queries()
    # same warm-up as bench.py
    read_table(spark, args.sf, "lineitem").count()

    for name in args.names:
        if name not in qs:
            print(f"{name}: NOT IN REGISTRY", file=sys.stderr)
            continue
        runs = []
        for i in range(args.runs):
            t_start_ms = int(time.time() * 1000)
            t0 = time.time()
            df = qs[name](spark, args.sf)
            t1 = time.time()
            n = df.count()
            t2 = time.time()
            runs.append((round(t2 - t0, 3), round(t1 - t0, 3), round(t2 - t1, 3)))
            if args.jobs and i == args.runs - 1:
                jobs = rest_jobs(spark, t_start_ms)
                for j in sorted(jobs, key=lambda j: j["jobId"]):
                    dur = "?"
                    if j.get("submissionTime") and j.get("completionTime"):
                        import datetime as dt

                        p = lambda s: dt.datetime.strptime(
                            s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
                        )
                        dur = round(
                            (
                                p(j["completionTime"]) - p(j["submissionTime"])
                            ).total_seconds(),
                            3,
                        )
                    print(
                        f"    job {j['jobId']:>4} {dur:>7}s tasks={j.get('numTasks'):>4} "
                        f"{(j.get('description') or j.get('name') or '')[:110]}",
                        file=sys.stderr,
                    )
            if args.explain and i == 0:
                os.makedirs(args.explain, exist_ok=True)
                p = Path(args.explain) / f"{name}_{args.suffix}.txt"
                jvm = spark._jvm
                jmode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
                with open(p, "w") as f:
                    f.write(df._jdf.queryExecution().explainString(jmode))
        tot = sorted(r[0] for r in runs)[len(runs) // 2]
        print(
            f"{name}: median {tot}s  runs[(total,construct,execute)]={runs} ({n} rows)"
        )


if __name__ == "__main__":
    main()
