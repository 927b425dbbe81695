"""Skew-salting join: the explicit lever for hot join keys.

Where it fits in the skew toolbox (scale design, SURVEY §4):
- AQE skew-join (``spark.sql.adaptive.skewJoin``) splits oversized
  sort-merge partitions at runtime — on by default in our sessions and
  the right first answer.
- ``broadcast()`` removes the shuffle entirely when one side is small.
- Salting is the remaining case: a shuffled join where a handful of
  keys dominate AND the build side is too big to broadcast.  Splitting
  each hot left key across ``n_salts`` sub-partitions trades an
  ``n_salts``× replication of the matching RIGHT rows for an
  ``n_salts``× reduction of the hottest task.

Mechanics: the left side gets a deterministic salt in ``[0, n_salts)``
(hash of the whole row, so any distribution works — correctness never
depends on it); the right side is replicated once per salt value via an
``explode`` of a literal range (no driver loop, no data skew on the
replicate itself).  Joining on (key, salt) then equals the plain key
join row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__astro_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left ⋈ right`` on ``on`` with left-side key salting.

    Result equals ``left.join(right, on, how)`` (same rows, same
    columns).  ``how`` supports inner and left joins — the flavors where
    salting is sound without post-aggregation (right/full would need a
    de-dup of replicated unmatched right rows).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    salted_left = left.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    salted_right = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted_left.join(salted_right, on=[*keys, _SALT], how=how)
    return joined.drop(_SALT)


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
    scale: int = 1000,
) -> DataFrame:
    """Join-key skew diagnostic: the ``top_k`` hottest keys with their
    row counts and BIGINT floor parts-per-``scale`` of the relation —
    the number you read BEFORE choosing ``salted_join`` / AQE skew
    handling (one hot key at 30% of a 100 TB shuffle is the whole
    job's straggler).

    One groupBy(key) with map-side partial aggregation, then a
    TakeOrderedAndProject top-k and a 1-row total broadcast — nothing
    unbounded crosses the exchange.

    Returns (key, n_rows, share_pmille) ordered hottest-first with a
    deterministic (count desc, key asc) tie-break and a ``rank``
    column.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").cast("long").alias("__total"))
    top = (
        counts.orderBy(F.col("n_rows").desc(), F.col("key").asc())
        .limit(top_k)
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc())
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "rank",
            "key",
            "n_rows",
            F.expr(f"({scale} * n_rows) DIV __total").cast("long").alias(
                "share_pmille"
            ),
        )
    )


def join_explosion_report(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Pre-join fan-out gauge: for an inner equi-join on ``key_col``,
    the per-key row counts on BOTH sides and their product — the rows
    that key will EMIT — top-k by product, plus the total predicted
    output size.  The number you read BEFORE launching a join that
    might be a many-to-many explosion (a single key at n_left·n_right
    = 10¹⁰ pairs is a job-killer no AQE setting fixes; the fix is
    upstream dedup or a semi-join rewrite).

    Cost: one map-side-combined groupBy per side, an equi-join of the
    two COUNT tables (|distinct keys| rows — never the data), a
    TakeOrderedAndProject top-k, and a 1-row total broadcast.  Nothing
    unbounded crosses an exchange; the report is O(distinct keys) no
    matter the join's output size.

    Returns (rank, key, n_left, n_right, n_pairs, total_pairs) ordered
    by predicted fan-out with a deterministic (pairs desc, key asc)
    tie-break.
    """
    from pyspark.sql.window import Window

    lc = left.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_left")
    )
    rc = right.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_right")
    )
    j = lc.join(rc, "key").select(
        "key",
        "n_left",
        "n_right",
        (F.col("n_left") * F.col("n_right")).cast("long").alias("n_pairs"),
    )
    total = j.agg(F.sum("n_pairs").cast("long").alias("total_pairs"))
    top = j.orderBy(F.col("n_pairs").desc(), F.col("key").asc()).limit(top_k)
    w = Window.orderBy(F.col("n_pairs").desc(), F.col("key").asc())
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "key", "n_left", "n_right", "n_pairs", "total_pairs")
    )
