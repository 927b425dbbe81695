"""Bounded-state cardinality sketches.

KMV (k-minimum-values, Bar-Yossef et al. 2002) is the classic
mergeable distinct-count estimator: hash every value, keep only the k
smallest distinct hashes, and estimate |D| ≈ (k-1) · R / h_(k) where
h_(k) is the k-th smallest hash and R the hash range.  Unlike
HyperLogLog it is exactly replayable in any SQL engine (ORDER BY hash
LIMIT k), which makes it oracle-checkable bit-for-bit — and like HLL
the state is k values no matter the corpus size.

Scale shape: one DISTINCT shuffle on the 62-bit hash, then Spark's
``TakeOrderedAndProject`` (per-partition top-k, merge of k·partitions
rows) — never a global sort, never more than k rows past the exchange.
At 100 TB this is THE way to count distinct tokens/urls/ngrams without
a full COUNT(DISTINCT) shuffle of the raw values: the hash DISTINCT
can also be replaced by a per-partition top-k pre-aggregation when the
value space is too large to distinct (not needed at fixture scale).

Reference scope note: the reference SDK (astro python-sdk) has no
sketching surface; this extends the engine for LLM-corpus accounting
(vocabulary growth, url dedup budgeting) per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .constants import P31
from .text import fingerprint62

#: default number of minimum hash values kept
KMV_K = 256

#: hash range of fingerprint62: h1 * (P31+1) + h2 with h1,h2 < P31 —
#: uniform over [0, 2^62) for hashing purposes; 2^62 is exactly
#: representable as a double so both engines divide the same numbers
KMV_RANGE = float((P31 + 1)) * float(P31 + 1)


def kmv_distinct(
    df: DataFrame,
    col: Column | str = "text",
    k: int = KMV_K,
) -> DataFrame:
    """K-minimum-values distinct estimate of ``col``.

    Returns ONE row ``(k_used, kth_min_hash, est_distinct)``:

    - fewer than k distinct hashes seen → the estimate IS the exact
      distinct count (k_used, as a double for a stable schema);
    - otherwise ``est = (k-1) · R / h_(k)`` rounded to 4dp, computed
      with the identical double operation order as the SQL oracle.
    """
    c = F.col(col) if isinstance(col, str) else col
    mins = (
        df.where(c.isNotNull())
        .select(fingerprint62(c).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )
    agg = mins.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("hv").alias("kth_min_hash"),
    )
    return kmv_estimate(agg, k)


def kmv_estimate(agg: DataFrame, k: int) -> DataFrame:
    """Attach ``est_distinct`` to a (k_used, kth_min_hash) frame — the
    shared estimate arithmetic for the batch sketch and the streaming
    min-merge (identical double operation order in both and in the SQL
    oracle)."""
    est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(k - 1))
            * (F.lit(KMV_RANGE) / F.col("kth_min_hash").cast("double")),
            4,
        )
    )
    return agg.select(
        "k_used", "kth_min_hash", est.alias("est_distinct")
    )


def shingle_tokens(
    df: DataFrame, text_col: str = "text", shingle: int = 1
) -> DataFrame:
    """One ``tok`` row per whitespace token (``shingle=1``) or per
    space-joined ``shingle``-word shingle — the shared exploded form
    for the batch sketch and the streaming min-merge."""
    from .text import tokens

    tok_arr = tokens(F.col(text_col))
    if shingle <= 1:
        vals = tok_arr
    else:
        # i-th shingle = tokens[i..i+n-1] joined by one space; mirrors
        # the oracle's list_transform over range(1, len-n+1).  The
        # short-text guard matters: Spark's sequence(1, 0) counts DOWN,
        # it is not empty like DuckDB's range.
        vals = F.when(
            F.size(tok_arr) >= shingle,
            F.transform(
                F.sequence(F.lit(1), F.size(tok_arr) - (shingle - 1)),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at(tok_arr, i + F.lit(j)) for j in range(shingle)],
                ),
            ),
        ).otherwise(F.expr("CAST(array() AS array<string>)"))
    return df.select(F.explode(vals).alias("tok")).where(F.col("tok") != "")


def kmv_token_report(
    df: DataFrame,
    text_col: str = "text",
    k: int = KMV_K,
    shingle: int = 1,
) -> DataFrame:
    """Corpus vocabulary accounting: KMV estimate of distinct
    whitespace tokens (``shingle=1``) or distinct ``shingle``-word
    shingles next to the exact count and the relative error — the
    recall-report pattern (grade the sketch against ground truth in
    the same job).  Shingle cardinality is what sizes a MinHash/LSH
    dedup index, the question a 100 TB corpus actually asks.

    The exact COUNT(DISTINCT) exists for grading; a real 100 TB run
    drops it and keeps only the bounded KMV side.

    Returns one row (k_used, kth_min_hash, est_distinct,
    exact_distinct, err_pct).
    """
    toks = shingle_tokens(df, text_col, shingle)
    est = kmv_distinct(toks, "tok", k=k)
    exact = toks.agg(
        F.countDistinct("tok").cast("long").alias("exact_distinct")
    )
    # 1-row × 1-row join: broadcast scalar, the documented bounded shape
    out = est.crossJoin(F.broadcast(exact))
    err = F.round(
        F.lit(100.0)
        * F.abs(F.col("est_distinct") - F.col("exact_distinct").cast("double"))
        / F.col("exact_distinct").cast("double"),
        2,
    )
    return out.select(
        "k_used",
        "kth_min_hash",
        "est_distinct",
        "exact_distinct",
        err.alias("err_pct"),
    )
