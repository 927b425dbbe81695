"""SCD Type-2 merge: history-preserving upsert.

The reference's ``merge`` overwrites matched rows (state-only).  Real
warehouse pipelines usually need the Kimball Type-2 variant — close the
old version, insert the new one, keep full history — so it ships here
as a first-class operator.

Semantics (per conflict key, against the CURRENT rows — valid_to NULL):
- source row with different attributes → current row closed
  (valid_to = effective_date) + new current row (valid_from = effective_date);
- unseen key → new current row;
- identical attributes or key absent from source → untouched.

Plan shape: ONE full-outer join between the current slice and the
source produces all three projections (kept / closed / opened); history
rows pass through untouched.  The result commits via the same staged
swap as ``merge`` — on a Delta/Iceberg cluster the plan half drops into
a native row-level ``MERGE INTO`` with the identical join, and a target
partitioned on ``valid_to IS NULL`` confines the rewrite to the current
partition (history is immutable by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from astro_spark.table import Table

from .merge import _swap_table


def scd2_merge(
    spark: SparkSession,
    target_table: Table,
    source: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_date: str,
) -> None:
    """Apply a snapshot ``source`` (key_cols + attr_cols) to a Type-2
    target (key_cols + attr_cols + valid_from + valid_to)."""
    tgt = spark.table(target_table.qualified_name)
    hist = tgt.filter(F.col("valid_to").isNotNull())
    cur = tgt.filter(F.col("valid_to").isNull())

    t = cur.select(
        *key_cols,
        *[F.col(a).alias(f"__t_{a}") for a in attr_cols],
        "valid_from",
        F.lit(True).alias("__t_present"),
    )
    s = source.select(
        *key_cols,
        *[F.col(a).alias(f"__s_{a}") for a in attr_cols],
        F.lit(True).alias("__s_present"),
    )
    j = t.join(s, on=key_cols, how="full_outer")

    same = F.lit(True)
    for a in attr_cols:
        same = same & F.col(f"__t_{a}").eqNullSafe(F.col(f"__s_{a}"))
    t_present = F.col("__t_present").isNotNull()
    s_present = F.col("__s_present").isNotNull()
    changed = t_present & s_present & ~same

    def _rows(attr_side: str, valid_from, valid_to, cond) -> DataFrame:
        return j.where(cond).select(
            *key_cols,
            *[F.col(f"__{attr_side}_{a}").alias(a) for a in attr_cols],
            valid_from.alias("valid_from"),
            valid_to.alias("valid_to"),
        )

    kept = _rows(
        "t",
        F.col("valid_from"),
        F.lit(None).cast("string"),
        t_present & (~s_present | same),
    )
    closed = _rows("t", F.col("valid_from"), F.lit(effective_date), changed)
    opened = _rows(
        "s",
        F.lit(effective_date),
        F.lit(None).cast("string"),
        s_present & (~t_present | changed),
    )
    result = hist.select(kept.columns).unionByName(kept).unionByName(closed).unionByName(opened)
    _swap_table(spark, result, target_table)


def check_scd2(
    dim: DataFrame,
    key_cols: list[str],
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Data-quality gate for the Type-2 invariant ``scd2_enrich``
    assumes: per business key, validity intervals must be
    NON-OVERLAPPING (half-open ``[valid_from, valid_to)``, NULL
    ``valid_to`` = open).  Run it on dims maintained outside
    ``scd2_merge`` before point-in-time joins — the check the
    ``scd2_enrich`` docstring prescribes.

    Plan shape: an equi-self-join on the business key with the
    interval test as a residual — versions per key are bounded (one
    per change), so the pair scan per key is tiny; totals join as a
    1-row broadcast scalar.  Each unordered pair is counted once via a
    strict (valid_from, valid_to) struct ordering; EXACT duplicate
    versions (which the strict ordering skips) surface separately as
    ``n_dup_versions``.

    Returns ONE row (n_keys, n_versions, n_dup_versions,
    n_overlap_pairs) — healthy means the last two are 0.
    """
    inf = F.to_date(F.lit("9999-12-31"))
    vt_inf = F.coalesce(F.col(valid_to_col), inf)
    a = dim.select(
        *key_cols, F.col(valid_from_col).alias("af"), vt_inf.alias("at")
    )
    b = dim.select(
        *[F.col(c).alias(f"b_{c}") for c in key_cols],
        F.col(valid_from_col).alias("bf"),
        vt_inf.alias("bt"),
    )
    cond = F.lit(True)
    for c in key_cols:
        cond = cond & (a[c] == b[f"b_{c}"])
    pair_lt = F.struct(F.col("af"), F.col("at")) < F.struct(
        F.col("bf"), F.col("bt")
    )
    overlap = (F.col("af") < F.col("bt")) & (F.col("bf") < F.col("at"))
    pairs = (
        a.join(b, cond)
        .where(pair_lt & overlap)
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap_pairs"))
    )
    stats = dim.agg(
        F.countDistinct(*key_cols).cast("long").alias("n_keys"),
        F.count(F.lit(1)).cast("long").alias("n_versions"),
        (
            F.count(F.lit(1))
            - F.countDistinct(
                F.struct(*key_cols, F.col(valid_from_col), vt_inf)
            )
        )
        .cast("long")
        .alias("n_dup_versions"),
    )
    return stats.crossJoin(F.broadcast(pairs))


def scd2_enrich(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    ts_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    dim_prefix: str | None = None,
) -> DataFrame:
    """Point-in-time enrichment against a Type-2 dimension: each fact
    row joins the dim VERSION that was valid at its event time
    (``valid_from <= ts < valid_to``; a NULL ``valid_to`` means the
    open current version) — the lookup every warehouse does against
    the history ``scd2_merge`` maintains, without leaking future
    attribute values into past facts.

    PRECONDITION: per business key the dim's validity intervals must
    be non-overlapping (the invariant ``scd2_merge`` maintains —
    exactly one version valid at any instant).  Overlapping intervals
    would match a fact to multiple versions and duplicate it; this is
    NOT checked here because the check costs a self-join — run it as a
    data-quality gate (``check_table``) on dims from other writers.

    Dim attribute columns that collide with fact column names would
    produce duplicate output names; pass ``dim_prefix`` to alias them
    (``f"{dim_prefix}{col}"``) — colliding without a prefix raises.

    Plan shape: an EQUI-join on the business key with the interval
    test as a residual filter — shuffle on the key only, never a range
    cross product; versions per key are bounded (one per change), so
    the residual scan per fact is a handful of rows.  Facts whose
    timestamp predates every version drop out (inner join), matching
    warehouse semantics.

    Returns the fact columns plus the dim's attribute columns.
    """
    interval = (F.col(ts_col) >= F.col(valid_from_col)) & (
        F.col(valid_to_col).isNull() | (F.col(ts_col) < F.col(valid_to_col))
    )
    on = [facts[k] == dim[k] for k in key_cols]
    joined = facts.join(dim, on, "inner").where(interval)
    dim_attrs = [
        c
        for c in dim.columns
        if c not in key_cols and c not in (valid_from_col, valid_to_col)
    ]
    colliding = [c for c in dim_attrs if c in facts.columns]
    if colliding and dim_prefix is None:
        raise ValueError(
            f"scd2_enrich: dim attribute column(s) {colliding} collide "
            f"with fact column names — pass dim_prefix to alias them"
        )
    prefix = dim_prefix or ""
    return joined.select(
        *[facts[c] for c in facts.columns],
        *[dim[c].alias(f"{prefix}{c}") for c in dim_attrs],
    )
