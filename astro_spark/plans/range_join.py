"""Binned range join: points ⋈ intervals without a nested-loop plan.

Spark executes ``p.join(i, (i.lo <= p.x) & (p.x < i.hi))`` as a
broadcast-nested-loop (fine only when one side is tiny).  The scale
form bins the domain: a point joins its bin, an interval replicates
into every bin it overlaps (``sequence`` explode — typically 1-3 rows
for well-chosen ``bin_size``), and the bin equi-join + exact residual
filter replaces the O(|P|·|I|) loop with a shuffle join whose width is
the true overlap density.  Pick ``bin_size`` near the median interval
length: smaller bins → more interval replicas; larger bins → more
false candidates for the residual filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__astro_bin"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: str | None = None,
    bin_size: float = 1000.0,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to interval rows with
    ``start <= point < end`` (+ optional equi-key ``on``).

    Returns all columns of both inputs (point columns first).
    """
    if how != "inner":
        raise ValueError("range_join currently supports inner joins")
    p = points.withColumn(
        _BIN, F.floor(F.col(point_col) / F.lit(bin_size)).cast("long")
    )
    i = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bin_size)).cast("long"),
                # end is exclusive: the bin of the largest contained value
                F.floor(
                    (F.col(end_col) - F.lit(1e-9)) / F.lit(bin_size)
                ).cast("long"),
            )
        ),
    )
    keys = [_BIN] if on is None else [on, _BIN]
    joined = p.join(i, on=keys, how="inner").where(
        (F.col(start_col) <= F.col(point_col)) & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop(_BIN)
