"""Per-key time-series smoothing and anomaly screening.

EWMA is a sequential recurrence — the canonical "needs a loop" shape —
but per key it is just a LEFT FOLD over the time-ordered values, which
both Spark (``aggregate``) and any SQL engine with list folds replay
with an identical float-operation sequence: deterministic, exact-oracle
friendly, no UDF.

Scale notes: one groupBy(key) shuffle; each key's history is collected
into an in-memory array, so this targets bounded per-key histories
(sessions, per-day slices, sensor windows) — for unbounded keys, pass
``window_days`` to pre-bucket time so each fold sees one window's
events, or use the streaming screens.  The fold itself is O(|history|)
with O(1) state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewma_anomalies(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha_x100: int = 25,
    threshold_cents: int = 20000,
    window_days: int | None = None,
) -> DataFrame:
    """Per-key EWMA anomaly screen: order each key's values by time,
    smooth with ``ewma' = α·v + (1-α)·ewma`` (α = alpha_x100/100, both
    engines compute the same double), and count points whose absolute
    deviation from the RUNNING smoothed level exceeds
    ``threshold_cents`` — the classic "spike vs trend" alarm.

    Values are cents-scaled to integers before the fold, so every float
    in the recurrence derives from exact integers through an identical
    operation sequence — bit-deterministic and SQL-replayable.  The
    first observation seeds the level and is never an anomaly.

    Returns (key, n_events, n_anomalies, ewma_r4) with the final level
    rounded to 4 decimals (in cents).

    ``window_days`` is the unbounded-key guard: when set, time is
    pre-bucketed into ``window_days``-sized epochs and the fold runs per
    (key, window) — each fold's collected history is bounded by one
    window's events regardless of how long the key lives, so the
    collect-to-array never grows with total key history.  The output
    gains a ``win_start`` date column (the window's first day).  For
    data confined to a single window the per-window fold is the full
    fold (pinned by ``test_ewma_windowed_equals_full_in_window``).
    """
    v_cents = f"CAST(FLOOR({value_col} * 100 + 0.5) AS BIGINT)"
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("ts"), F.expr(v_cents).alias("v")
            )
        )
    )
    alpha = F.lit(alpha_x100) / F.lit(100.0)
    # the accumulator is a 2-slot double array [ewma, n_anom], not a
    # struct: it folds identically here, and DuckDB 1.0's list_reduce
    # mis-evaluates mixed-type STRUCT accumulators on some real-data
    # sequences (verified: struct form silently dropped an increment the
    # array form and a pure-Python replay both count) — the array form
    # is the shape both engines execute correctly
    folded = F.aggregate(
        F.col("__arr"),
        F.array(F.lit(None).cast("double"), F.lit(0.0)),
        lambda acc, x: F.array(
            F.when(acc[0].isNull(), x["v"].cast("double")).otherwise(
                alpha * x["v"] + (F.lit(1.0) - alpha) * acc[0]
            ),
            acc[1]
            + F.when(
                acc[0].isNotNull()
                & (
                    F.abs(x["v"].cast("double") - acc[0])
                    > F.lit(float(threshold_cents))
                ),
                F.lit(1.0),
            ).otherwise(F.lit(0.0)),
        ),
    )
    if window_days is None:
        return (
            df.groupBy(F.col(key_col).alias("key"))
            .agg(arr.alias("__arr"), F.count(F.lit(1)).alias("n_events"))
            .select(
                "key",
                "n_events",
                folded[1].cast("long").alias("n_anomalies"),
                F.round(folded[0], 4).alias("ewma_r4"),
            )
        )
    win = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(86400 * window_days))
        .cast("long")
        .alias("__win")
    )
    return (
        df.groupBy(F.col(key_col).alias("key"), win)
        .agg(arr.alias("__arr"), F.count(F.lit(1)).alias("n_events"))
        .select(
            "key",
            F.to_date(
                F.timestamp_seconds(F.col("__win") * F.lit(86400 * window_days))
            ).alias("win_start"),
            "n_events",
            folded[1].cast("long").alias("n_anomalies"),
            F.round(folded[0], 4).alias("ewma_r4"),
        )
    )
