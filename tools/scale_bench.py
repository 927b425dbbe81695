#!/usr/bin/env python
"""Scale-up self-bench: replicate the sf0.1 testdata by an integer
factor (default 10 ≈ "sf1") and time the most expensive bench queries
at both scales, reporting the wall-clock ratio next to the data ratio.

Purpose (VERDICT r5 item 4): the 2x perf gate is graded at sf0.1 where
session overhead dominates; a 10x scale-up run catches superlinear
surprises (skewed SemDeDup cells, star-CC round growth, KMV distinct
explosion) before the driver does.  A healthy linear operator shows a
wall ratio well UNDER the data ratio at this size (fixed overhead
amortizes); a ratio >> factor means superlinear work.

Replication preserves workload SHAPE instead of inflating it:

- each replica gets remapped ids (doc_id/vec_id/event_id/l_orderkey
  offsets) so keys stay unique;
- document tokens get a per-replica suffix (replica 0 keeps the
  original text), so shingle/minhash/simhash content is DISJOINT
  across replicas — duplicate pairs scale linearly like a real 10x
  corpus, not quadratically like a naive copy;
- embeddings get a small deterministic per-replica, per-dimension
  perturbation for the same reason (near-dup structure per replica
  matches sf0.1).

The unscaled dimension tables are copied as-is (the timed queries only
scan documents/embeddings/lineitem/events).

Usage:
    python tools/scale_bench.py [--factor 10] [--out /tmp/astro_sfscale]
                                [--only name1,name2] [--skip-build]

Prints one JSON line per query:
    {"query": ..., "base_sec": ..., "scaled_sec": ..., "ratio": ...}
and a closing summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE_SF = "/root/testdata/sf0.1"

#: the top-expensive BENCH_r05 queries (minus dd_semantic: the exact
#: per-cell O(|cell|^2) baseline is by-contract quadratic and
#: bench-excluded at scale — dd_semantic_np, its Arrow throughput twin,
#: stands in) plus the heaviest relational/merge rows as linear controls
DEFAULT_QUERIES = [
    "dd_semantic_np",
    "s_recall_report",
    "st_bloom_screen",
    "op_check_outliers",
    "dd_clusters_star",
    "s_knn_graph_probe",
    "s_knn_graph_auto",
    "dd_simhash",
    "st_kmv_distinct",
    "dd_minhash_incr",
    "dd_quality_rep",
    "q1_pricing_summary",
    "op_merge_update",
]

def _s_knn_graph_auto(spark, sf_dir):
    """Sweep-only twin of s_knn_graph_probe with ``n_cells="auto"``:
    the same pruned pipeline but the cell count resolves to
    ⌈n/DEFAULT_CELL_SIZE⌉ (8 at sf0.1, ~79 at 10×), pinning that the
    cells-∝-n scaling contract executes itself — the caller writes no
    arithmetic and the 10× ratio stays sublinear (round-6 sweep: fixed
    8 cells → 20.7×; manual 80 cells → 5.8×; this entry reproduces the
    latter out of the box)."""
    from astro_spark.functions import similarity
    from astro_spark.testdata import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    return similarity.knn_graph(emb, k=5, nprobe=2, n_cells="auto", np_score=True)


#: sweep-only pseudo-queries (not in the driver registry: k-means
#: training is data-dependent, so no SQL oracle — the correctness of
#: knn_graph itself is pinned by the registry twins and TestKnnGraph)
EXTRA_QUERIES = {"s_knn_graph_auto": _s_knn_graph_auto}

SCALED = {"documents", "embeddings", "lineitem", "events"}
COPIED = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
]

ID_OFFSET = 10_000_000


def build_scaled(spark, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from astro_spark.testdata import read_table

    os.makedirs(out_dir, exist_ok=True)
    for name in COPIED:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(BASE_SF, f"{name}.parquet"), dst)

    def _write(df, name):
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))

    docs = read_table(spark, BASE_SF, "documents")
    parts = []
    for i in range(factor):
        p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * ID_OFFSET))
        if i:
            # token-suffix the text: replica corpora are shingle-disjoint
            p = p.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"$1r{i}")
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    _write(out.repartition(8 * factor), "documents")

    emb = read_table(spark, BASE_SF, "embeddings")
    parts = []
    for i in range(factor):
        p = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * ID_OFFSET))
        if i:
            p = p.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, j: (
                        x
                        + (
                            ((F.lit(i * 31) + j) % 7 - F.lit(3)).cast("float")
                            * F.lit(0.01)
                        )
                    ).cast("float"),
                ),
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    _write(out.repartition(4 * factor), "embeddings")

    li = read_table(spark, BASE_SF, "lineitem")
    out = li
    for i in range(1, factor):
        out = out.unionByName(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * ID_OFFSET))
        )
    _write(out.repartition(8 * factor), "lineitem")

    ev = read_table(spark, BASE_SF, "events")
    out = ev
    for i in range(1, factor):
        out = out.unionByName(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * ID_OFFSET))
            .withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000))
        )
    _write(out.repartition(8 * factor), "events")


def time_query(fn, spark, sf_dir: str) -> tuple[float, int]:
    t0 = time.time()
    n = fn(spark, sf_dir).count()
    return round(time.time() - t0, 3), n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/astro_sfscale")
    ap.add_argument("--only", default=None)
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from astro_spark import get_session
    from astro_spark.testdata import read_table

    spark = get_session("scale-bench")
    if not args.skip_build:
        t0 = time.time()
        build_scaled(spark, args.out, args.factor)
        print(f"built factor-{args.factor} set in {time.time()-t0:.1f}s",
              file=sys.stderr)

    qs = entry.queries()
    names = args.only.split(",") if args.only else DEFAULT_QUERIES
    # warm-up both directions
    read_table(spark, BASE_SF, "lineitem").count()
    read_table(spark, args.out, "lineitem").count()

    results = []
    for name in names:
        fn = qs.get(name) or EXTRA_QUERIES[name]
        base_sec, base_n = time_query(fn, spark, BASE_SF)
        scaled_sec, scaled_n = time_query(fn, spark, args.out)
        ratio = round(scaled_sec / base_sec, 2) if base_sec else None
        rec = {
            "query": name,
            "base_sec": base_sec,
            "scaled_sec": scaled_sec,
            "ratio": ratio,
            "base_rows": base_n,
            "scaled_rows": scaled_n,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    worst = max(results, key=lambda r: r["ratio"] or 0)
    print(
        json.dumps(
            {
                "factor": args.factor,
                "n_queries": len(results),
                "worst_ratio": worst["ratio"],
                "worst_query": worst["query"],
                "sum_base": round(sum(r["base_sec"] for r in results), 1),
                "sum_scaled": round(sum(r["scaled_sec"] for r in results), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
