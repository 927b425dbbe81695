"""As-of join — the canonical "operator Spark lacks" (SURVEY §2.4
extension path (a): a composition of existing DataFrame ops).

For each left row, attach the value of the LATEST right row with the
same key and ``right.ts < left.ts`` (strictly earlier — an equal-time
right row is not yet visible, the market-data convention).

Construction: tag both inputs, UNION them, and run one window pass per
key ordered by (ts, side, tie) carrying the last seen right value
forward (``last_value IGNORE NULLS``).  Cost is ONE shuffle on the key
and a per-key sort — linear in |L|+|R|, against the naive
join-then-max-per-left-row form whose intermediate is O(|L|·|R|) per
key.  This is the layout that survives 100 TB tick/event tables; skewed
keys shard the sort but never expand rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    value_col: str,
    tie_col: str | None = None,
    output_col: str = "asof_value",
) -> DataFrame:
    """Return ``left`` plus ``output_col`` = value of the latest strictly
    earlier right row sharing ``on``; null when no such row exists.

    ``tie_col`` breaks ordering ties among right rows with equal ts
    (latest wins); required for determinism if right ts values repeat.
    """
    lcols = left.columns
    tie = tie_col or ts_col

    l_tagged = left.select(
        *lcols,
        F.lit(0).alias("__side"),
        F.lit(None).cast(right.schema[value_col].dataType).alias("__rv"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(ts_col),
        *(
            [F.col(tie_col).alias("__tie")]
            if tie_col
            else [F.col(ts_col).alias("__tie")]
        ),
        F.lit(1).alias("__side"),
        F.col(value_col).alias("__rv"),
    )
    l_full = l_tagged.withColumn("__tie", F.col(tie))
    missing = [c for c in lcols if c not in (on, ts_col, "__tie")]
    r_full = r_tagged.select(
        on,
        ts_col,
        "__tie",
        "__side",
        "__rv",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in missing],
    )
    unioned = l_full.select(r_full.columns).unionByName(r_full)

    # order: earlier ts first; at equal ts LEFT (side 0) sorts BEFORE the
    # right row so it cannot see an equal-time right value (strict <)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        output_col, F.last(F.col("__rv"), ignorenulls=True).over(w)
    )
    return carried.where(F.col("__side") == 0).select(*lcols, output_col)
