#!/usr/bin/env python
"""Plan auditor: executed-plan shape for every driver query.

Usage:
    python tools/audit_plans.py [--sf DIR] [--only name1,name2] [--full name]

Prints per query: Exchange / join-strategy / codegen counts, flagging
the shapes that regress at scale (CartesianProduct, and
BroadcastNestedLoopJoin whose build side is NOT provably ≤1 row) and
missing pushed filters on scans.  ``--full`` dumps the formatted plan
of one query for eyeball review.

BNLJ adjudication (VERDICT r11 #2): the engine folds 1-row claim/total
relations into results via ``crossJoin(F.broadcast(<1-row agg>))`` —
a BNLJ against a guaranteed-single-row build side is a constant-fold,
not a scale risk, and 16 of them used to drown real flags in noise.
``bnlj_verdicts`` walks the physical tree: a BNLJ is BENIGN iff its
build side (descending through exchange/project/codegen wrappers) is a
global aggregate (no grouping → exactly 1 row), a ≤1-row
LocalTableScan, or a reuse of such an exchange.  Everything else flags
loudly.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

COUNTS = (
    "Exchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "WholeStageCodegen",
)

# nodes that pass their child's cardinality through unchanged (or only
# reduce it), for the purpose of proving "≤ 1 row"
_PASSTHROUGH = (
    "BroadcastExchangeExec",
    "ShuffleExchangeExec",
    "ProjectExec",
    "FilterExec",
    "WholeStageCodegenExec",
    "InputAdapter",
    "ColumnarToRowExec",
    "RowToColumnarExec",
    "AQEShuffleReadExec",
    "CoalesceExec",
    "SortExec",
)
# NOTE: AQE query-stage nodes are NOT passthrough — they hide their
# subtree behind .plan(), not .children(), and are handled explicitly.


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _unwrap_adaptive(plan):
    """AdaptiveSparkPlanExec hides the physical tree behind accessors."""
    if _cls(plan) == "AdaptiveSparkPlanExec":
        try:
            return plan.executedPlan()
        except Exception:
            try:
                return plan.initialPlan()
            except Exception:
                return plan
    return plan


def _walk(node):
    yield node
    name = _cls(node)
    # descend into wrapped stages/reuses so BNLJs inside AQE query
    # stages and reused subtrees are still found
    for attr in ("plan", "child"):
        if name in ("BroadcastQueryStageExec", "ShuffleQueryStageExec",
                    "ReusedExchangeExec", "ReusedSubqueryExec"):
            try:
                yield from _walk(_unwrap_adaptive(getattr(node, attr)()))
                return
            except Exception:
                pass
    for c in _children(node):
        yield from _walk(_unwrap_adaptive(c))


def _at_most_one_row(node) -> bool:
    """True iff this physical subtree provably produces ≤ 1 row."""
    name = _cls(node)
    if name in _PASSTHROUGH:
        kids = _children(node)
        if len(kids) == 1:
            return _at_most_one_row(_unwrap_adaptive(kids[0]))
        return False
    if name in ("BroadcastQueryStageExec", "ShuffleQueryStageExec",
                "ReusedExchangeExec", "ReusedSubqueryExec"):
        try:
            return _at_most_one_row(_unwrap_adaptive(node.plan()))
        except Exception:
            try:
                return _at_most_one_row(_unwrap_adaptive(node.child()))
            except Exception:
                return False
    if name in ("HashAggregateExec", "SortAggregateExec",
                "ObjectHashAggregateExec"):
        try:
            # FINAL global aggregate: no grouping keys → exactly 1 row.
            # (The partial stage below it also matches — same guarantee.)
            return node.groupingExpressions().isEmpty()
        except Exception:
            return False
    if name == "LocalTableScanExec":
        try:
            return node.rows().size() <= 1
        except Exception:
            return False
    if name == "BroadcastNestedLoopJoinExec":
        # a CROSS of two provably-≤1-row sides is itself ≤1 row — the
        # shape `tot.crossJoin(broadcast(quarts))` where both are global
        # aggregates (r14: check_outliers' rank-selection stats frame)
        kids = _children(node)
        if len(kids) == 2:
            return all(
                _at_most_one_row(_unwrap_adaptive(k)) for k in kids
            )
        return False
    if name == "RangeExec":
        try:
            # spark.range(1).select(F.lit(...)) — the engine's canonical
            # PROVABLE 1-row literal relation (a createDataFrame literal
            # plans as RDDScanExec, whose row count is opaque)
            return int(str(node.numElements())) <= 1
        except Exception:
            return False
    return False


_BOUNDED_LIMIT = 4096


def _bounded_rows(node) -> bool:
    """True iff this subtree provably produces ≤ _BOUNDED_LIMIT rows —
    the 'broadcast a small query/claim relation against a streamed
    corpus' design (brute-force ANN baselines, PQ ADC) where a BNLJ is
    the INTENDED plan: per-row work is bounded by the broadcast side,
    so the scan stays linear in the corpus."""
    name = _cls(node)
    if _at_most_one_row(node):
        return True
    if name in _PASSTHROUGH:
        kids = _children(node)
        return len(kids) == 1 and _bounded_rows(_unwrap_adaptive(kids[0]))
    if name in ("BroadcastQueryStageExec", "ShuffleQueryStageExec",
                "ReusedExchangeExec", "ReusedSubqueryExec"):
        for attr in ("plan", "child"):
            try:
                return _bounded_rows(_unwrap_adaptive(getattr(node, attr)()))
            except Exception:
                continue
        return False
    if name == "GlobalLimitExec":
        # NOT LocalLimitExec: a local limit caps rows PER PARTITION, so
        # it proves nothing about the relation's total size
        try:
            return int(node.limit()) <= _BOUNDED_LIMIT
        except Exception:
            return False
    if name == "RangeExec":
        try:
            return int(str(node.numElements())) <= _BOUNDED_LIMIT
        except Exception:
            return False
    if name == "LocalTableScanExec":
        try:
            return node.rows().size() <= _BOUNDED_LIMIT
        except Exception:
            return False
    return False


def bnlj_verdicts(df) -> list[tuple[str, bool]]:
    """[(description, benign)] for every BroadcastNestedLoopJoin in the
    executed plan — benign iff the BUILD side provably yields ≤1 row
    (the crossJoin(F.broadcast(<claim relation>)) constant-fold)."""
    plan = _unwrap_adaptive(df._jdf.queryExecution().executedPlan())
    out: list[tuple[str, bool]] = []
    for node in _walk(plan):
        if _cls(node) != "BroadcastNestedLoopJoinExec":
            continue
        kids = _children(node)
        try:
            side = node.buildSide().toString()
        except Exception:
            side = "BuildRight"
        build = kids[1] if side == "BuildRight" and len(kids) > 1 else kids[0]
        build = _unwrap_adaptive(build)
        if _at_most_one_row(build):
            out.append((f"BNLJ[{side}]", "1row"))
        elif _bounded_rows(build):
            out.append((f"BNLJ[{side}]", "bounded"))
        else:
            out.append((f"BNLJ[{side}]", False))
    return out


def audit(df) -> dict:
    """Counts + adjudicated flags for one DataFrame's executed plan."""
    plan_str = df._jdf.queryExecution().executedPlan().toString()
    counts = {k: plan_str.count(k) for k in COUNTS}
    bad: list[str] = []
    if plan_str.count("CartesianProduct"):
        bad.append("CartesianProduct")
    verdicts = bnlj_verdicts(df)
    rogue = [d for d, v in verdicts if not v]
    if rogue:
        bad.append(f"BroadcastNestedLoopJoin×{len(rogue)}")
    n_benign = sum(1 for _d, v in verdicts if v == "1row")
    n_bounded = sum(1 for _d, v in verdicts if v == "bounded")
    return {
        "counts": counts,
        "bad": bad,
        "benign_bnlj": n_benign,
        "bounded_bnlj": n_bounded,
    }


# Queries whose BNLJ is the DOCUMENTED design and whose build side's
# bound lives in a caller contract the physical plan cannot prove —
# printed as "intentional", never ⚠, with the adjudication inline so a
# NEW rogue BNLJ in these queries still raises the count and flags.
INTENTIONAL_BNLJ = {
    "dd_embedding_cosine": (
        1,
        "exact O(n²) cosine baseline — bench-excluded by design; "
        "s_lsh_pairs is the scale path (functions/dedup.py)",
    ),
    "dd_embedding_cosine_np": (
        1,
        "same exact baseline, numpy kernel",
    ),
    "s_ivf_pq_topk": (
        1,
        "broadcast cell-centroid relation: ≤ n_cells rows by the IVF "
        "contract, built by a grouped agg the plan can't bound",
    ),
    "s_recall_report": (
        1,
        "same centroid relation, inside the recall grader",
    ),
}


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
            a = audit(df)
        except Exception as exc:  # streaming queries have no static plan pre-run
            print(f"{name}: (no static plan: {type(exc).__name__})")
            continue
        line = " ".join(
            f"{k.replace('Join', 'J')}={v}" for k, v in a["counts"].items() if v
        )
        if a["benign_bnlj"]:
            line += f" [benign-1row-BNLJ={a['benign_bnlj']}]"
        if a["bounded_bnlj"]:
            line += f" [bounded-broadcast-BNLJ={a['bounded_bnlj']}]"
        bad = list(a["bad"])
        n_rogue = sum(
            1 for b in bad if b.startswith("BroadcastNestedLoopJoin")
        )
        if n_rogue and name in INTENTIONAL_BNLJ:
            allowed, reason = INTENTIONAL_BNLJ[name]
            rogue_count = int(
                next(
                    b for b in bad if b.startswith("BroadcastNestedLoopJoin")
                ).split("×")[1]
            )
            if rogue_count <= allowed:
                bad = [
                    b for b in bad
                    if not b.startswith("BroadcastNestedLoopJoin")
                ]
                line += f" [intentional-BNLJ: {reason}]"
        mark = " ⚠ " + ",".join(bad) if bad else ""
        print(f"{name}: {line or 'map-only'}{mark}")
        if bad:
            flagged.append(name)
    print(f"\n{len(flagged)} flagged: {flagged}" if flagged else "\nno flagged plans")
    spark.stop()


if __name__ == "__main__":
    main()
