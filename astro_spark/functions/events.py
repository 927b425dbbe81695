"""Event-stream product analytics: ordered funnels and cohort
retention.

Both are staples of the query surface an analytics engine must carry
(the reference SDK runs them as raw-SQL transforms; here they are
first-class operators with exact SQL oracles).

Scale shapes:

- ``funnel``: one groupBy(user) shuffle; each user's step events are
  collected into a time-sorted array and folded (same bounded-history
  contract as ``timeseries.ewma_anomalies`` — per-user event counts
  are bounded in practice; pre-filter a time range for unbounded
  users).  The fold is a built-in ``aggregate`` — no UDF.
- ``cohort_retention``: distinct → groupBy(user) → join(user) →
  groupBy(cohort, offset).  The join keys are co-partitioned with the
  preceding aggregation, so AQE reuses the exchange; no collect, no
  crossJoin, scales linearly in events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Monday anchor for epoch-week numbering (shared with the oracle)
WEEK_EPOCH = "1970-01-05"


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_days: int | None = None,
    max_events_per_user: int | None = None,
) -> DataFrame:
    """Ordered conversion funnel: for each user, the furthest step
    reached by matching ``steps`` IN ORDER over the user's time-sorted
    events (a later step only counts after an earlier one — the
    classic "view → click → purchase" chain; unrelated events in
    between are ignored, ties on ts break by step index).

    Bounded-state guards (the ``timeseries.ewma_anomalies`` treatment
    — per-user event counts are bounded for humans but not for
    bot-grade hot users at 100 TB, and the per-user fold collects its
    step events into an array):

    - ``window_days``: time is pre-bucketed into ``window_days``-sized
      epochs and the fold runs per (user, window) — the CONVERSION
      WINDOW semantics most funnel products ship (steps must complete
      within one window); a user counts toward a step if any of their
      windows reached it, so each fold's array is bounded by one
      window's events no matter how long the user lives.
    - ``max_events_per_user``: only each user's (or each (user,
      window)'s) EARLIEST N step events by (ts, step) enter the fold —
      a sort-based row_number cut, spillable, never a growing array.

    For data confined to one window with users under the cap, the
    guarded funnel equals the unguarded one (pinned in TestFunnel).

    Returns one row per step: (step_idx, step, n_users) where n_users
    counts users whose furthest stage reached at least that step.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    si = F.when(F.col(type_col) == steps[0], F.lit(1))
    for i, s in enumerate(steps[1:], start=2):
        si = si.when(F.col(type_col) == s, F.lit(i))
    events = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        si.alias("si"),
    ).where(F.col("si").isNotNull())

    grp = ["u"]
    if window_days is not None:
        events = events.withColumn(
            "__win",
            F.floor(
                F.unix_timestamp(F.col("ts")) / F.lit(86400 * window_days)
            ).cast("long"),
        )
        grp = ["u", "__win"]
    if max_events_per_user is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy(*grp).orderBy("ts", "si")
        events = (
            events.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= max_events_per_user)
            .drop("__rn")
        )

    seq = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "si"))), lambda x: x["si"]
    )
    stage = F.aggregate(
        F.col("__seq"),
        F.lit(0),
        lambda acc, x: acc
        + F.when(x == acc + F.lit(1), F.lit(1)).otherwise(F.lit(0)),
    )
    per_fold = events.groupBy(*grp).agg(seq.alias("__seq")).select(
        "u", stage.alias("stage")
    )
    if window_days is not None:
        # a user's furthest stage across windows (the fold itself never
        # sees more than one window's events)
        per_user = per_fold.groupBy("u").agg(F.max("stage").alias("stage"))
    else:
        per_user = per_fold
    per_user = per_user.select("stage")
    counts = per_user.agg(
        *[
            F.sum((F.col("stage") >= i).cast("long")).alias(f"__n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("step_idx"),
                F.lit(s).alias("step"),
                F.coalesce(F.col(f"__n{i}"), F.lit(0).cast("long")).alias(
                    "n_users"
                ),
            )
            for i, s in enumerate(steps, start=1)
        ]
    )
    return counts.select(F.inline(rows))


def funnel_spark_sql(
    steps: list[str],
    table: str = "{{events}}",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """The funnel as a Spark-SQL SELECT for the ``transform`` /
    ``run_raw_sql`` shell — the reference's "user writes SQL" surface
    (SURVEY §2.4) reaching the same per-user ordered fold the
    ``funnel`` operator runs (identical rows, pinned in tests).

    ``table`` defaults to a ``{{events}}`` placeholder so the text
    drops straight into ``run_transform(spark, sql, {"events": t})``.
    """
    if not steps:
        raise ValueError("funnel_spark_sql needs at least one step")

    def q(s: str) -> str:
        return s.replace("'", "''")

    whens = " ".join(
        f"WHEN '{q(s)}' THEN {i}" for i, s in enumerate(steps, start=1)
    )
    in_list = ", ".join(f"'{q(s)}'" for s in steps)
    rows = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step_idx, '{q(s)}' AS step, "
        f"(SELECT CAST(COALESCE(SUM(IF(stage >= {i}, 1, 0)), 0) AS BIGINT) "
        f" FROM st) AS n_users"
        for i, s in enumerate(steps, start=1)
    )
    return f"""
WITH e AS (
  SELECT {user_col} AS u, {ts_col} AS ts,
         CASE {type_col} {whens} END AS si
  FROM {table} WHERE {type_col} IN ({in_list})
),
seqs AS (
  SELECT u, transform(array_sort(collect_list(struct(ts, si))), x -> x.si) AS seq
  FROM e GROUP BY u
),
st AS (
  SELECT aggregate(seq, 0, (acc, x) -> acc + IF(x = acc + 1, 1, 0)) AS stage
  FROM seqs
)
{rows}
"""


def cohort_retention_spark_sql(
    table: str = "{{events}}",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """Weekly cohort retention as a Spark-SQL SELECT for the
    ``transform`` shell — same rows as ``cohort_retention`` (pinned in
    tests); ``table`` defaults to a ``{{events}}`` placeholder."""
    wk = (
        f"CAST(FLOOR(datediff(CAST({ts_col} AS DATE), "
        f"DATE '{WEEK_EPOCH}') / 7.0) AS BIGINT)"
    )
    return f"""
WITH a AS (
  SELECT DISTINCT {user_col} AS u, {wk} AS wk FROM {table}
),
f AS (SELECT u, MIN(wk) AS cohort_wk FROM a GROUP BY u)
SELECT cohort_wk, (wk - cohort_wk) AS offset_wk,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM a JOIN f USING (u)
GROUP BY cohort_wk, (wk - cohort_wk)
"""


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    k: int = 20,
) -> DataFrame:
    """Top-k next-event transition counts — the behavioral bigram
    matrix ("after a view, what happens next?") product analytics and
    session-modeling features are built from.

    Per user the events sort by (ts, id) — ``id_col`` is the
    deterministic tie-break — and each event pairs with its successor
    (``lead`` over a sort-based window: spillable, no collected
    arrays).  Pairs then map-side-combine into (from, next) counts and
    a TakeOrderedAndProject keeps the top-k by (count DESC, from,
    next) — no global sort.

    Returns (from_type, next_type, n_transitions).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    nxt = df.select(user_col, ts_col, id_col, type_col).withColumn(
        "next_type", F.lead(type_col).over(w)
    )
    return (
        nxt.where(F.col("next_type").isNotNull())
        .groupBy(F.col(type_col).alias("from_type"), "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
        .orderBy(F.col("n_transitions").desc(), "from_type", "next_type")
        .limit(k)
    )


def epoch_week(ts_col):
    """Week number since WEEK_EPOCH (a Monday): floor(days / 7.0) —
    identical double arithmetic on the oracle side."""
    return F.floor(
        F.datediff(F.to_date(ts_col), F.to_date(F.lit(WEEK_EPOCH))) / F.lit(7.0)
    ).cast("long")


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: cohort = a user's first active epoch
    week; for every (cohort week, week offset ≥ 0) count the cohort's
    users active that week.

    Returns (cohort_wk, offset_wk, n_users); offset 0 rows give each
    cohort's size.
    """
    active = df.select(
        F.col(user_col).alias("u"), epoch_week(F.col(ts_col)).alias("wk")
    ).distinct()
    first = active.groupBy("u").agg(F.min("wk").alias("cohort_wk"))
    return (
        active.join(first, "u")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("offset_wk"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
