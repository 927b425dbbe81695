#!/usr/bin/env python
"""Partitioned-table file-count sweep (VERDICT r13 next #3).

Round 13 measured partition pruning at 4,000 files (40 of 4,000
scanned); this sweep pushes the same claim to 100,000 files — the
10⁵-file shape of a year of daily ingest into a 100-partition table —
and records what a 10⁶-file table would cost by the measured slope.

The claim being tested: with the checkpointed log, a partition-scoped
read prices as

    plan  =  one manifest JSON  +  one columnar checkpoint scan
             +  O(selected-partition files)  [the pruned file list]

so PLAN-CONSTRUCTION cost grows only with the checkpoint read (~100
bytes/file, columnar), while FIRST-BYTE (pruned .count()) stays
O(selected partition) regardless of total file count.  If the
checkpoint read bends upward faster than linear, the manifest needs
per-partition sharding — that's the decision this sweep informs.

Method: the Hive estate is synthesized driver-side with pyarrow (one
tiny file per (partition, i) — building 100k files through Spark write
jobs would measure the writer, not the log) and adopted with
``tt_convert``, which records partition stats FROM PATHS and never
scans data — exactly the 100 TB adoption path.  Then per size:

- convert_sec      adoption commit (checkpoint write included)
- plan_sec         tt_read(where="p = 7") DataFrame construction only
- first_byte_sec   pruned .count() (job over the selected partition)
- files_scanned    len(pruned.inputFiles()) — must be n/100
- plan_full_sec    unpruned tt_read() construction (checkpoint floor)
- append_sec       one 1-row tt_append (per-commit log tax at size)

Usage:
    python tools/tt_partition_sweep.py [--files 4000,40000,100000]
                                       [--partitions 100] [--repeat 3]

Prints one JSON line per size plus a closing summary with the 1e6
projection.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synthesize_estate(root: str, n_files: int, n_parts: int) -> None:
    """One tiny parquet per (partition, i), Hive layout — pyarrow
    driver-side, ~0.2 ms/file; Spark never touches the write."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    per = n_files // n_parts
    for p in range(n_parts):
        d = Path(root) / f"p={p}"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(per):
            k = p * per + i
            pq.write_table(
                pa.table({"k": pa.array([k], pa.int64()),
                          "v": pa.array([k * 2], pa.int64())}),
                str(d / f"f_{i:05d}.parquet"),
            )


def timeit(fn, repeat: int) -> float:
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", default="4000,40000,100000")
    ap.add_argument("--partitions", type=int, default=100)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()
    sizes = [int(x) for x in args.files.split(",")]

    import astro_spark as a

    spark = a.get_session("tt_partition_sweep")
    work = tempfile.mkdtemp(prefix="astro_ttps_")
    rows = []
    for n in sizes:
        root = f"{work}/t_{n}"
        t0 = time.perf_counter()
        synthesize_estate(root, n, args.partitions)
        synth_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        a.tt_convert(spark, root)
        convert_sec = time.perf_counter() - t0
        plan_sec = timeit(
            lambda: a.tt_read(spark, root, where="p = 7"), args.repeat
        )
        pruned = a.tt_read(spark, root, where="p = 7")
        files_scanned = len(pruned.inputFiles())
        first_byte_sec = timeit(lambda: pruned.count(), 1)
        plan_full_sec = timeit(lambda: a.tt_read(spark, root), args.repeat)
        append_sec = timeit(
            lambda: a.tt_append(
                spark,
                spark.createDataFrame(
                    [(10_000_000, 1, 7)], "k long, v long, p int"
                ),
                root,
            ),
            args.repeat,
        )
        row = {
            "files": n,
            "partitions": args.partitions,
            "synth_sec": round(synth_sec, 2),
            "convert_sec": round(convert_sec, 2),
            "plan_sec": round(plan_sec, 4),
            "first_byte_sec": round(first_byte_sec, 4),
            "files_scanned": files_scanned,
            "plan_full_sec": round(plan_full_sec, 4),
            "append_sec": round(append_sec, 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    lo, hi = rows[0], rows[-1]
    if hi["files"] == lo["files"]:  # single-size smoke run
        print(json.dumps({"summary": rows[0]}), flush=True)
        spark.stop()
        return
    ratio = hi["files"] / lo["files"]
    # linear 1e6 projection from the two end points (plan cost is
    # dominated by the checkpoint read, which is O(files) bytes)
    slope = (hi["plan_sec"] - lo["plan_sec"]) / (hi["files"] - lo["files"])
    proj_1e6 = lo["plan_sec"] + slope * (1_000_000 - lo["files"])
    summary = {
        "file_ratio": ratio,
        "plan_ratio": round(hi["plan_sec"] / max(lo["plan_sec"], 1e-9), 2),
        "first_byte_ratio": round(
            hi["first_byte_sec"] / max(lo["first_byte_sec"], 1e-9), 2
        ),
        "append_ratio": round(
            hi["append_sec"] / max(lo["append_sec"], 1e-9), 2
        ),
        "plan_projection_1e6_sec": round(proj_1e6, 2),
        "shard_manifest_needed": bool(proj_1e6 > 30),
    }
    print(json.dumps({"summary": summary}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
