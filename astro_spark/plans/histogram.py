"""Fixed-width-histogram quantile estimation.

Exact percentiles (``percentile`` / ``percentile_approx``) need either a
full sort or a mergeable digest; the fixed-width histogram is the
bounded-state estimator whose arithmetic a SQL oracle can replay
exactly: two scans (min/max, then bin counts) and a shuffle of at most
``n_bins`` rows regardless of table size.  Estimates are integer
upper-bin-bound values — deterministic, no floating quantile
interpolation.

At 100 TB: both scans are map-side partial aggregations; the histogram
(<= n_bins rows) and the quantile thresholds ride as 1-row/odd-row
broadcasts, so no stage ever shuffles data proportional to the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def histogram_quantiles(
    df: DataFrame,
    col: str,
    quantiles: tuple[int, ...] = (50, 90, 99),
    n_bins: int = 1024,
) -> DataFrame:
    """Estimate integer-percent quantiles of ``col`` (a numeric column,
    scaled to BIGINT cents internally) from an ``n_bins`` fixed-width
    histogram.

    Returns (quantile BIGINT, est_x100 BIGINT): the upper bound of the
    first bin whose cumulative count reaches ceil(q*N/100), in cents.
    Estimation error is bounded by one bin width.
    """
    cents = F.floor(F.col(col) * 100 + F.lit(0.5)).cast("long")
    base = df.select(cents.alias("v"))
    bounds = base.agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = base.crossJoin(F.broadcast(bounds)).select(
        "lo",
        "hi",
        "n",
        F.least(
            F.lit(n_bins - 1),
            F.expr(f"(v - lo) * {n_bins} div (hi - lo + 1)"),
        ).alias("bin"),
    )
    hist = binned.groupBy("lo", "hi", "n", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy("lo").orderBy("bin").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    # Project(Range(n)) rather than createDataFrame: identical rows, but
    # the plan PROVES the relation is |quantiles| rows, so the plan
    # auditor can statically whitelist the broadcast fold (an
    # RDDScanExec's row count is opaque to the physical tree).
    qarr = F.array(*[F.lit(int(q)) for q in quantiles])
    qdf = F.broadcast(
        df.sparkSession.range(len(quantiles)).select(
            F.element_at(qarr, (F.col("id") + 1).cast("int"))
            .cast("long")
            .alias("quantile")
        )
    )
    return (
        cum.crossJoin(qdf)
        .where(F.col("cum") >= F.expr("(quantile * n + 99) div 100"))
        .groupBy("quantile")
        .agg(F.min(F.expr(f"lo + (bin + 1) * (hi - lo + 1) div {n_bins}")).alias("est_x100"))
        .orderBy("quantile")
    )
