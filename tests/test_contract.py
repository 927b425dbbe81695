"""Driver-contract wiring guards (no Spark session needed).

The per-round driver checks the FIRST ~50 ``queries()`` entries against
their ``oracle_sql()`` twins; these tests pin the invariants that keep
that contract honest across rotations and new-query additions.
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_query_has_an_oracle():
    """The ⊙ invariant COVERAGE.md claims: every queries() entry has a
    DuckDB oracle (none silently downgraded to the rows-only check)."""
    q = entry.queries()
    o = entry.oracle_sql()
    missing = [n for n in q if n not in o]
    assert missing == [], missing
    stale = [n for n in o if n not in q]
    assert stale == [], stale


def _latest_driver_round() -> dict[str, int]:
    """Latest round each query got a driver row, from the r-file union —
    capped at the rounds the CURRENT rotation was computed from.

    The rotation is built at round N from CORRECTNESS_r1..r{N-1}; the
    driver then publishes CORRECTNESS_r{N}.json AFTER the final commit,
    which makes the rotation head the FRESHEST cohort and flipped this
    check red in the committed round-7 tree (VERDICT r7 #1).  Ignoring
    r-files ≥ ``_ROTATION_BUILT_FOR_ROUND`` keeps the tree green at
    rest while still forcing a re-rotation whenever the constant is
    bumped at round start."""
    import json
    import re
    from pathlib import Path

    horizon = getattr(entry, "_ROTATION_BUILT_FOR_ROUND", 10**9)
    latest: dict[str, int] = {}
    for p in Path(".").glob("CORRECTNESS_r*.json"):
        r = int(re.search(r"r(\d+)", p.name).group(1))
        if r >= horizon:
            continue
        for k in json.loads(p.read_text()):
            latest[k] = max(latest.get(k, 0), r)
    return latest


def test_rotation_order_is_applied():
    """queries() must serve the _DRIVER_PRIORITY order so the 50-query
    driver cap lands on the intended entries: never-checked queries
    first, then the stalest cohort — computed from the CORRECTNESS_r*
    union, not hardcoded, so the check survives every rotation."""
    q = list(entry.queries())
    prio = [n for n in entry._DRIVER_PRIORITY if n in set(q)]
    assert q[: len(prio)] == prio
    latest = _latest_driver_round()
    if not latest:  # round 1: no driver rows exist yet
        return
    # greedy-by-staleness: after the never-checked queries (pinned by
    # the head-50 test below), the window must be spent on the stalest
    # checked queries — no query inside head-50 may be FRESHER than one
    # left outside (ties may straddle the boundary when a cohort
    # doesn't fit, e.g. 8 never-checked + 47 r03-stale > 50 slots)
    head, tail = q[:50], q[50:]
    head_rounds = [latest[n] for n in head if n in latest]
    tail_rounds = [latest[n] for n in tail if n in latest]
    if head_rounds and tail_rounds:
        assert max(head_rounds) <= min(tail_rounds), (
            max(head_rounds),
            min(tail_rounds),
        )


def test_oracle_sql_is_nonempty_select():
    """Each oracle is a non-empty SQL string (catches a generator
    returning None/'' after a refactor)."""
    bad = [
        n
        for n, sql in entry.oracle_sql().items()
        if not isinstance(sql, str) or "select" not in sql.lower()
    ]
    assert bad == [], bad


def test_head_50_covers_every_never_driver_checked_query():
    """The driver caps each round at ~50 queries: the rotation must put
    EVERY query that has never had a driver row inside the head-50, or
    it can wait rounds for its first verification."""
    import json
    from pathlib import Path

    checked: set[str] = set()
    for p in Path(".").glob("CORRECTNESS_r*.json"):
        checked |= set(json.loads(p.read_text()))
    if not checked:  # round 1: no driver rows exist yet
        return
    q = list(entry.queries())
    never = [n for n in q if n not in checked]
    assert set(never) <= set(q[:50]), sorted(set(never) - set(q[:50]))


def test_plan_auditor_bnlj_adjudication(spark):
    """tools/audit_plans.py (VERDICT r11 #2): a REAL unbounded
    BroadcastNestedLoopJoin must flag loudly, while the engine's
    claim-fold pattern — crossJoin(F.broadcast(<1-row global agg>)) —
    is whitelisted (build side provably ≤1 row), so real regressions
    no longer drown in constant-fold noise."""
    import importlib.util
    from pathlib import Path

    from pyspark.sql import functions as F

    spec = importlib.util.spec_from_file_location(
        "audit_plans", Path(__file__).resolve().parent.parent / "tools" / "audit_plans.py"
    )
    ap = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ap)

    big = spark.range(100).withColumnRenamed("id", "a")
    # claim-fold: benign, not flagged
    folded = big.crossJoin(F.broadcast(big.agg(F.count(F.lit(1)).alias("n"))))
    res = ap.audit(folded)
    assert res["bad"] == [] and res["benign_bnlj"] == 1
    # a provably-BOUNDED build (Range(50) ≤ the 4096 bound) is noted,
    # not flagged — the designed broadcast-query-scan shape
    small = spark.range(50).withColumnRenamed("id", "b")
    noted = big.join(F.broadcast(small), big.a > small.b)
    res = ap.audit(noted)
    assert res["bad"] == [] and res["bounded_bnlj"] == 1, res
    # planted rogue: build side whose row count the plan CANNOT bound
    # (an RDD-backed relation) in a non-equi join -> flags loudly
    opaque = spark.createDataFrame([(i,) for i in range(50)], "b long")
    rogue = big.join(F.broadcast(opaque), big.a > opaque.b)
    res = ap.audit(rogue)
    assert any("BroadcastNestedLoopJoin" in b for b in res["bad"]), res
    # a multi-row grouped aggregate build side is NOT a claim-fold
    grouped = big.crossJoin(
        F.broadcast(big.groupBy((F.col("a") % 3).alias("g")).count())
    )
    assert ap.audit(grouped)["bad"], "grouped-agg build side must flag"
