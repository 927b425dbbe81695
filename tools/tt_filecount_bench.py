#!/usr/bin/env python
"""File-count scaling sweep for the versioned-log manifest (VERDICT r10
what's-wrong #1 / next-round #3).

The growth ceiling being tested is the LOG, not the data: a long-lived
100 TB table holds 10^5-10^6 data files across thousands of commits.
Pre-checkpoint, every commit rewrote the COMPLETE file list as JSON and
``tt_history`` parsed every one — O(versions x files) driver-side JSON.
With the checkpointed log (``spark.astro.tt.inlineFilesMax``), a commit
writes O(delta) JSON against a parquet checkpoint base, and history
reads headers only.

This sweep builds versioned tables with 10x/100x more FILES (same tiny
rows — file count is the variable), then times, at each size and for
BOTH log representations (inline-forced vs checkpointed):

- append_sec      one small tt_append (the per-commit log tax)
- resolve_sec     tt_read(version) DataFrame construction — manifest +
                  checkpoint resolution only (no job run); the parquet
                  source's own O(files) listing is priced separately by
                  count_sec as a floor reference
- history_sec     tt_history over ~12 commits
- count_sec       .count() of the head version (scan floor, O(files))

Healthy result: checkpointed append_sec and history_sec stay ~flat as
file count grows 100x, while inline-forced append_sec grows ~linearly;
resolve_sec grows no faster than the checkpoint read (columnar,
O(files) bytes but ~100 bytes/file).

Usage:
    python tools/tt_filecount_bench.py [--files 50,500,5000] [--repeat 3]

Prints one JSON line per (files, form) plus a closing summary line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build(spark, root: str, n_files: int, inline_max: int) -> None:
    import astro_spark as a

    spark.conf.set("spark.astro.tt.inlineFilesMax", str(inline_max))
    df = spark.range(n_files * 4).selectExpr(
        "id AS k", "id * 2 AS v"
    ).repartitionByRange(n_files, "k")
    a.tt_create(spark, df, root, stats_cols=["k"])
    # a short history so history_sec measures more than one manifest
    for i in range(10):
        a.tt_append(
            spark,
            spark.createDataFrame([(10_000_000 + i, i)], "k long, v long"),
            root,
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
    ap.add_argument("--files", default="50,500,5000")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()
    sizes = [int(x) for x in args.files.split(",")]

    import astro_spark as a

    spark = a.get_session("tt_filecount_bench")
    work = tempfile.mkdtemp(prefix="astro_ttfc_")
    rows = []
    try:
        for n in sizes:
            for form, inline_max in (
                ("inline", 10**9),   # pre-checkpoint behavior, forced
                ("checkpoint", 200),  # snapshot in parquet, O(delta) JSON
            ):
                root = f"{work}/t_{form}_{n}"
                build(spark, root, n, inline_max)
                append_sec = timeit(
                    lambda: a.tt_append(
                        spark,
                        spark.createDataFrame([(1, 1)], "k long, v long"),
                        root,
                    ),
                    args.repeat,
                )
                resolve_sec = timeit(
                    lambda: a.tt_read(spark, root, 0), args.repeat
                )
                history_sec = timeit(
                    lambda: a.tt_history(spark, root).count(), args.repeat
                )
                count_sec = timeit(
                    lambda: a.tt_read(spark, root).count(), 1
                )
                # VERDICT r10 #8: data skipping — a manifest-pruned read
                # of a fixed key range must stay FLAT as total file
                # count grows (the pruned set is ~constant); and
                # constraint-checked appends must cost O(batch), not
                # O(table)
                skip_sec = timeit(
                    lambda: a.tt_read(
                        spark, root, skip_by={"k": (0, 3)}
                    ).count(),
                    args.repeat,
                )
                # CDF cost must track CHURN (the 10 one-file appends),
                # not total file count
                changes_sec = timeit(
                    lambda: a.tt_changes(spark, root, 0).count(),
                    args.repeat,
                )
                a.tt_add_constraint(spark, root, "k_nonneg", "k >= 0")
                append_checked_sec = timeit(
                    lambda: a.tt_append(
                        spark,
                        spark.createDataFrame([(2, 2)], "k long, v long"),
                        root,
                    ),
                    args.repeat,
                )
                row = {
                    "files": n,
                    "form": form,
                    "append_sec": round(append_sec, 4),
                    "resolve_sec": round(resolve_sec, 4),
                    "history_sec": round(history_sec, 4),
                    "count_sec": round(count_sec, 4),
                    "skip_sec": round(skip_sec, 4),
                    "changes_sec": round(changes_sec, 4),
                    "append_checked_sec": round(append_checked_sec, 4),
                }
                rows.append(row)
                print(json.dumps(row), flush=True)
        base = {(r["files"], r["form"]): r for r in rows}
        lo, hi = sizes[0], sizes[-1]
        summary = {
            "file_ratio": hi / lo,
            "ckpt_append_ratio": round(
                base[(hi, "checkpoint")]["append_sec"]
                / base[(lo, "checkpoint")]["append_sec"],
                2,
            ),
            "inline_append_ratio": round(
                base[(hi, "inline")]["append_sec"]
                / base[(lo, "inline")]["append_sec"],
                2,
            ),
            "ckpt_history_ratio": round(
                base[(hi, "checkpoint")]["history_sec"]
                / base[(lo, "checkpoint")]["history_sec"],
                2,
            ),
            "ckpt_resolve_ratio": round(
                base[(hi, "checkpoint")]["resolve_sec"]
                / base[(lo, "checkpoint")]["resolve_sec"],
                2,
            ),
            "ckpt_skip_ratio": round(
                base[(hi, "checkpoint")]["skip_sec"]
                / base[(lo, "checkpoint")]["skip_sec"],
                2,
            ),
            "ckpt_changes_ratio": round(
                base[(hi, "checkpoint")]["changes_sec"]
                / base[(lo, "checkpoint")]["changes_sec"],
                2,
            ),
            "ckpt_append_checked_ratio": round(
                base[(hi, "checkpoint")]["append_checked_sec"]
                / base[(lo, "checkpoint")]["append_checked_sec"],
                2,
            ),
        }
        print(json.dumps({"summary": summary}), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
