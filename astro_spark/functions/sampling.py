"""Deterministic dataset splitting and sampling for training pipelines.

Beyond-reference: every large-scale training-data pipeline needs
reproducible train/val/test assignment that (a) never changes when the
data is re-read or re-partitioned, (b) is computable on any engine that
sees the same ids.  Random ``df.randomSplit`` fails both — so splits
here are HASH-based: bucket = poly_hash(str(id)) mod n_buckets, with
label ranges from cumulative weights.

Scale notes: assignment is a map-only projection (no shuffle, no seed
state); the same id lands in the same split on every run, engine, and
cluster size — the property that makes dataset versioning and
incremental refreshes sound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import char_poly_hash


def split_bucket(id_col: Column | str, n_buckets: int = 100) -> Column:
    """Stable bucket in [0, n_buckets): 31-bit poly hash of str(id)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return char_poly_hash(c.cast("string")) % F.lit(n_buckets)


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    n_buckets: int = 100,
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named fraction.

    ``weights`` maps label → fraction (must sum to ≤ 1; remainder goes
    to the last label).  Buckets are allocated by cumulative ranges in
    insertion order, e.g. ``{"train": .8, "val": .1, "test": .1}`` →
    buckets [0,80) / [80,90) / [90,100).
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = split_bucket(id_col, n_buckets)
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for label, w in weights.items():
        acc += w
        bounds.append((label, round(acc * n_buckets)))

    expr = None
    for label, hi in bounds:
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    expr = expr.otherwise(F.lit(bounds[-1][0]))
    return df.withColumn("split", expr)
