"""Z-order (Morton-curve) multi-dimensional clustering key.

``cluster_by`` gives one-dimensional file-range locality; Z-ordering
interleaves the bits of several fixed-point-scaled columns so that
files cover compact HYPER-rectangles — selective scans on ANY of the
clustered dimensions prune row groups, the lever behind
Delta/Databricks ``OPTIMIZE ZORDER BY`` re-expressed with built-in
column functions (no UDF, no engine fork).

At 100 TB: one extra min/max aggregate scan (map-side partial) rides a
1-row broadcast into the write's range partitioner; the bit
interleaving is a pure projection inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int | None = None,
    key_col: str = "__zorder",
) -> DataFrame:
    """Attach the Morton key: each column fixed-point-scaled to
    ``bits`` bits against its global min/max, bits interleaved
    column-major (bit b of column i lands at position b*d + i)."""
    d = len(cols)
    if d < 1:
        raise ValueError("zorder needs at least one column")
    bits = bits or min(16, 62 // d)
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    bounds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(bounds))
    scaled = []
    for c in cols:
        lo = F.col(f"__lo_{c}").cast("double")
        hi = F.col(f"__hi_{c}").cast("double")
        span = F.greatest(hi - lo, F.lit(1e-12))
        scaled.append(
            F.floor(
                (F.col(c).cast("double") - lo) * F.lit((1 << bits) - 1) / span
            ).cast("long")
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, sc in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(sc, b).bitwiseAND(F.lit(1)), b * d + i
            )
    drop = [f"__lo_{c}" for c in cols] + [f"__hi_{c}" for c in cols]
    return out.withColumn(key_col, z).drop(*drop)
