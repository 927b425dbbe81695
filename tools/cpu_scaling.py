#!/usr/bin/env python
"""Core-count scaling probe (r15, VERDICT r14 #7).

The driver's 8-vs-32-core suite ratio is ~1.0 because the sf0.1 suite
is construct/fixture-bound, so the local bench cannot demonstrate
parallel speedup.  This probe measures the EXECUTE phase of a
compute-heavy subset on the 10x-replicated dataset (built by
scale_bench.py) at the given core count — run it twice with
SPARK_GRAFT_CPUS=32 and =8 and compare the printed per-query execute
seconds.  Construct time is reported but excluded from the scaling
claim (it is driver-side by nature and core-count independent).

Usage:
    python tools/scale_bench.py --factor 10 --skip-bench   # build data
    SPARK_GRAFT_CPUS=32 python tools/cpu_scaling.py [--sf DIR]
    SPARK_GRAFT_CPUS=8  python tools/cpu_scaling.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = ["dd_semantic_np", "s_gram_matrix", "t_dsir", "dd_simhash"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/astro_sfscale")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from astro_spark import get_session
    from astro_spark.testdata import read_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count()))
    spark = get_session("cpu-scaling")
    qs = entry.queries()
    read_table(spark, args.sf, "lineitem").count()

    out = {"cpus": cpus, "sf_dir": args.sf, "queries": {}}
    for name in QUERIES:
        runs = []
        for _ in range(args.runs):
            t0 = time.time()
            df = qs[name](spark, args.sf)
            t1 = time.time()
            df.count()
            t2 = time.time()
            runs.append((round(t2 - t1, 3), round(t1 - t0, 3)))
        runs.sort()
        ex, co = runs[len(runs) // 2]
        out["queries"][name] = {"execute_sec": ex, "construct_sec": co}
        print(f"  {name}: execute median {ex}s (construct {co}s) "
              f"runs={runs}", file=sys.stderr)
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
