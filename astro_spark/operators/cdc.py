"""APPLY CHANGES INTO analog: a CDC row feed (insert/update rows plus
DELETE tombstones) applied to a target table with last-change-wins per
key.

Reference scope: the reference's ``merge`` supports only
ignore/update/exception conflict handling
(``python-sdk/src/astro/sql/operators/merge.py:16-200``) — no delete
clause — but real CDC feeds (Debezium, DMS, Delta CDF) carry deletes,
so the tombstone-aware applier ships here as a first-class operator
(the Delta Live Tables "APPLY CHANGES INTO" surface re-expressed on
plain parquet).

Semantics:
- ``changes`` holds ``key_cols`` + ``op_col`` ∈ {'I','U','D'} + the
  target's data columns (+ optional ``seq_col``);
- per key only the LATEST change applies — ``seq_col`` descending with
  a deterministic (seq, op) tie-break; without ``seq_col`` the feed
  must carry at most one change per key (raises otherwise: silently
  picking one would corrupt the target);
- latest op D → the key's row is deleted; latest I/U → upserted
  (insert-or-update, the ``merge`` update path); keys absent from the
  target delete to a no-op, exactly the idempotent-replay contract.

Physical story: upserts commit through ``merge``'s scale machinery
(partition-scoped dynamic overwrite / file-scoped copy-on-write —
O(touched files), not table size); deletes commit through
``delete_rows``'s file-scoped COW when the tombstone key set is small
enough to push down as literals, else an anti-join staged swap (the
documented last resort).  Re-applying the same change set is a no-op
(upsert and delete are both idempotent) — pinned in tests.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..table import Table
from .dml import delete_rows
from .merge import _swap_table, merge

#: tombstone key sets up to this size delete via a pushed-down literal
#: predicate (file-scoped COW); larger sets take the anti-join swap
DELETE_PUSHDOWN_CAP = 10_000


def apply_changes(
    spark: SparkSession,
    target_table: Table,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
) -> dict:
    """Apply a CDC change set to ``target_table``.

    Returns ``{"upserted": int, "deleted": int}`` — the latest-change
    counts applied (deleted counts tombstone KEYS, present in the
    target or not).
    """
    from pyspark.sql.window import Window

    data_cols = [
        c for c in changes.columns if c not in (op_col, seq_col)
    ]
    if seq_col is not None:
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(seq_col).desc(), F.col(op_col).desc()
        )
        latest = (
            changes.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", seq_col)
        )
    else:
        dups = (
            changes.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        if dups:
            raise ValueError(
                "apply_changes: multiple changes share a key but no "
                "seq_col was given — ordering would be arbitrary"
            )
        latest = changes

    upserts = latest.where(F.col(op_col) != "D").select(*data_cols)
    tombstones = latest.where(F.col(op_col) == "D").select(*key_cols).distinct()

    n_up = upserts.count()
    if n_up:
        src = Table(f"_tmp_cdc_up_{uuid.uuid4().hex[:8]}")
        upserts.createOrReplaceTempView(src.name)
        merge(spark, src, target_table, key_cols, if_conflicts="update")

    keys = [r for r in tombstones.limit(DELETE_PUSHDOWN_CAP + 1).collect()]
    n_del = len(keys)
    if 0 < n_del <= DELETE_PUSHDOWN_CAP:
        if len(key_cols) == 1:
            cond = F.col(key_cols[0]).isin([r[0] for r in keys])
        else:
            cond = F.lit(False)
            for r in keys:
                row_eq = F.lit(True)
                for k in key_cols:
                    row_eq = row_eq & (F.col(k) == F.lit(r[k]))
                cond = cond | row_eq
        delete_rows(spark, target_table, cond)
    elif n_del:
        # tombstone set too large to push down: anti-join staged swap
        n_del = tombstones.count()
        tgt = spark.table(target_table.qualified_name)
        _swap_table(
            spark, tgt.join(tombstones, on=key_cols, how="left_anti"), target_table
        )
    spark.catalog.refreshTable(target_table.qualified_name)
    return {"upserted": n_up, "deleted": n_del}
