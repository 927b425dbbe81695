"""Fuzzy record linkage: blocking-key join + integer edit-distance verify.

The Fellegi-Sunter blocking pattern the reference's users hand-write in
SQL (entity dedup across feeds, catalog reconciliation): a cheap
BLOCKING key turns the O(n·m) all-pairs comparison into per-block
candidate sets joined with an ordinary shuffle equi-join, then an exact
``levenshtein`` verifies each candidate.  Everything is JVM-side and
integer-exact, so results replay in any engine with a standard edit
distance (DuckDB hash-matches).

Scale notes: cost is Σ|block_l|·|block_r| — pick blocks like a token,
a phonetic code, or a prefix so blocks stay small; a near-constant
block is the LSH hot-bucket pathology and deserves the same cap
treatment (filter oversized blocks upstream).  The join shuffles on the
block key only; no side is broadcast or replicated.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    block: Callable[[Column], Column],
    max_distance: int = 3,
    left_id: str | None = None,
    right_id: str | None = None,
) -> DataFrame:
    """Candidate pairs whose ``levenshtein(left_col, right_col)`` is at
    most ``max_distance``, compared only within equal blocking-key
    values.

    ``block`` is a function Column→Column applied to each side's compare
    column (e.g. ``lambda c: F.element_at(F.split(c, " "), -1)`` blocks
    on the last word).  Returns (left_id, right_id, left_val, right_val,
    distance); id columns default to the compare columns.
    """
    lid = left_id or left_col
    rid = right_id or right_col
    l_ = left.select(
        F.col(lid).alias("left_id"), F.col(left_col).alias("left_val")
    ).withColumn("__block", block(F.col("left_val")))
    r_ = right.select(
        F.col(rid).alias("right_id"), F.col(right_col).alias("right_val")
    ).withColumn("__block", block(F.col("right_val")))
    return (
        l_.join(r_, on="__block")
        .where(F.col("left_id") != F.col("right_id"))
        .withColumn(
            "distance", F.levenshtein(F.col("left_val"), F.col("right_val"))
        )
        .where(F.col("distance") <= max_distance)
        .select("left_id", "right_id", "left_val", "right_val", "distance")
    )


def fuzzy_dedup_names(
    df: DataFrame,
    name_col: str,
    max_distance: int = 3,
) -> DataFrame:
    """Self-linkage over DISTINCT values of a name column, blocked on
    the last whitespace token (the head noun for "adj noun" names):
    which names are probably the same entity.  Returns unordered pairs
    (name_a, name_b, distance) with name_a < name_b."""
    names = df.select(F.col(name_col).alias("name")).distinct()
    pairs = fuzzy_join(
        names,
        names,
        "name",
        "name",
        lambda c: F.element_at(F.split(c, " "), -1),
        max_distance=max_distance,
    )
    return (
        pairs.where(F.col("left_id") < F.col("right_id"))
        .select(
            F.col("left_id").alias("name_a"),
            F.col("right_id").alias("name_b"),
            "distance",
        )
    )
