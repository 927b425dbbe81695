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
from pyspark.sql.window import Window

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


def assign_shards(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic shard + in-shard position for dataloader export.

    shard = poly_hash(str(id)) mod n_shards (stable across runs/engines/
    partitionings, like ``hash_split``); ``pos`` is the row's rank inside
    its shard ordered by (hash, id) — a reproducible read order that is
    decorrelated from ingest order (the "global shuffle" a training run
    needs, without a random seed).  One shuffle on ``shard``; write with
    ``partitionBy("shard")`` so each training worker streams one
    directory in ``pos`` order.
    """
    h = char_poly_hash(F.col(id_col).cast("string"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard").orderBy("shard_hash", id_col)
    return (
        df.withColumn("shard_hash", h)
        .withColumn("shard", (F.col("shard_hash") % F.lit(n_shards)).cast("long"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("shard_hash")
    )


def stratified_sample(
    df: DataFrame,
    group_col: str = "source",
    n_per_group: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sample: keep the ``n_per_group`` rows
    with the smallest (poly_hash(id), id) per group.

    Hash order is uniform-pseudorandom but reproducible — re-running on
    re-partitioned (or re-sharded) data selects the SAME rows, which
    seeded ``sampleBy`` does not guarantee.  One window shuffle on the
    group key; skewed groups shard across tasks only if you pre-salt —
    for bounded ``n_per_group`` the per-task heap is tiny either way.
    """
    from pyspark.sql.window import Window

    h = char_poly_hash(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy("sample_hash", id_col)
    return (
        df.withColumn("sample_hash", h)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= n_per_group)
        .drop("sample_hash")
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    file_format: str = "parquet",
) -> None:
    """Materialize a training-ready sharded corpus: assign deterministic
    shards, then write ``shard=K/`` directories with rows stored in
    ``pos`` order inside each shard's file.

    ``repartition(shard)`` + ``sortWithinPartitions(pos)`` makes each
    shard exactly one task's output (one file per shard directory, rows
    in read order), so a training worker streams its shard
    sequentially with zero shuffling at read time.  At 100 TB raise
    ``n_shards`` to (workers × files-per-worker) — shard count, not
    data size, fixes the write parallelism.
    """
    sharded = assign_shards(df, n_shards=n_shards, id_col=id_col)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(file_format)
        .save(path)
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> DataFrame:
    """Token-budget sequence packing: lay documents end-to-end in
    ``id_col`` order and cut the stream every ``budget`` tokens —
    the offset-based packing used by LLM dataloaders (each doc gets the
    pack containing its start offset, plus its offset inside that pack).

    Scale shape: a global cumulative sum is a single-partition window in
    naive form, so this uses the classic **two-phase prefix sum** —
    per-bucket cumsum (window partitioned by an arithmetic id-range
    bucket, shuffle only within buckets) plus an exclusive prefix of
    per-bucket totals (n_buckets rows, broadcast back).  The driver
    never sees row-level data; only the n_buckets-row totals table is
    singly-windowed.  At 100 TB raise ``n_buckets`` to taskcount-scale.

    Returns (doc_id, n_tokens, pack_id, pack_offset) — integer-exact
    (``div``/``%`` on BIGINT, no doubles), so the DuckDB oracle matches
    bit-for-bit.
    """
    from pyspark.sql.window import Window

    from .text import token_count

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    # phase 1: arithmetic range bucket (order-preserving across buckets)
    max_id = toks.agg(F.max("doc_id")).first()[0] or 0
    width = max(1, (int(max_id) + n_buckets) // n_buckets)
    bucketed = toks.withColumn("bucket", (F.col("doc_id") / width).cast("long"))
    w_in = Window.partitionBy("bucket").orderBy("doc_id")
    local = bucketed.withColumn("cum_in", F.sum("n_tokens").over(w_in))
    # phase 2: exclusive prefix over per-bucket totals (tiny: n_buckets rows)
    w_tot = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        bucketed.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("tot"))
        .withColumn("bucket_off", F.coalesce(F.sum("tot").over(w_tot), F.lit(0)))
        .select("bucket", "bucket_off")
    )
    cum = local.join(F.broadcast(offsets), "bucket").withColumn(
        "cum_excl", F.col("bucket_off") + F.col("cum_in") - F.col("n_tokens")
    )
    return cum.select(
        "doc_id",
        "n_tokens",
        F.expr(f"cum_excl div {int(budget)}").alias("pack_id"),
        (F.col("cum_excl") % F.lit(int(budget))).alias("pack_offset"),
    )


def temperature_mix(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based domain mixture reweighting (T=2, i.e. weights
    proportional to sqrt of domain size) — the standard LLM-corpus move
    that upweights small domains and downweights dominant ones.

    Per-domain keep threshold is computed in pure BIGINT arithmetic
    (floor(sqrt(n)*1e6) weights, integer div), and membership is the
    deterministic id-hash bucket — so the resample is reproducible on
    any engine and the DuckDB oracle matches exactly (no float sum
    across domains, whose order would be engine-specific).

    Scale shape: one groupBy(source) over the corpus (map-side
    partials), a one-row totals broadcast, a tiny per-source threshold
    table broadcast back — the corpus itself is scanned twice and never
    shuffled beyond the two aggregations.  Downsampling only (threshold
    capped at 1); true upsampling of tiny domains needs an explode-by-k
    pass, deliberately out of scope here.

    Returns (source, n_before, n_after).
    """
    from .text import char_poly_hash

    from pyspark.sql.window import Window

    counts = (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(F.count(F.lit(1)).alias("n_s"))
        .withColumn(
            "w_int", F.floor(F.sqrt(F.col("n_s")) * F.lit(1000000.0)).cast("long")
        )
    )
    # grand totals via a window over the per-domain table (tiny:
    # #domains rows — a single-partition window here is free, and it
    # avoids a cross join showing up as a nested-loop node)
    w_all = Window.partitionBy(F.lit(1))
    thr = (
        counts.withColumn("w_total", F.sum("w_int").over(w_all))
        .withColumn("m_total", F.sum("n_s").over(w_all))
        .withColumn(
            "thr",
            F.least(
                F.expr("(10000 * m_total * w_int) div (w_total * n_s)"),
                F.lit(10000).cast("long"),
            ),
        )
        .select("source", "thr")
    )
    bucketed = df.select(
        F.col(source_col).alias("source"),
        (char_poly_hash(F.col(id_col).cast("string")) % F.lit(10000)).alias("b"),
    )
    return (
        bucketed.join(F.broadcast(thr), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_before"),
            F.sum(F.when(F.col("b") < F.col("thr"), 1).otherwise(0))
            .cast("long")
            .alias("n_after"),
        )
    )

# --------------------------------------------------------------------------
# DSIR-style importance weighting (target-domain data selection)
# --------------------------------------------------------------------------
def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = None,
    scale: int = None,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023),
    hashed-unigram variant: score every raw doc by how target-like its
    token distribution is.

    Model: tokens hash into ``n_buckets`` features; each bucket gets an
    add-one-smoothed probability under the target corpus and under the
    raw corpus; a doc's score is the sum over its token occurrences of
    the integer-scaled likelihood ratio
    ``w(b) = scale * p_target(b) / p_raw(b)`` (rational BIGINT
    arithmetic — no log/exp — so both engines agree bit-for-bit).
    ``keep`` marks docs whose mean token ratio exceeds 1 (score >
    scale * n_tokens): the deterministic selection rule standing in for
    DSIR's Gumbel resampling.

    Plan shape: the two bucket-count tables aggregate to <= n_buckets
    rows each and join into one broadcast weight table; the raw corpus
    is then scanned ONCE more (explode tokens → broadcast-join weights
    → one groupBy(doc)).  Nothing but bucket ids and per-doc sums ever
    shuffles, so this runs at corpus scale with two passes.  Int64
    headroom: counts enter products as (count+1)·(total+B)·scale — at
    trillions of tokens pre-divide the totals (weights are ratios) or
    compute the <=n_buckets weight table in floating point; per-doc
    sums stay exact either way.

    Returns (id, n_tokens, dsir_score, keep).
    """
    from .constants import DSIR_BUCKETS, DSIR_SCALE
    from .text import tokens

    n_buckets = n_buckets or DSIR_BUCKETS
    scale = scale or DSIR_SCALE

    from .similarity import spread_narrow_input

    # widen narrow scans before the token explodes (guide §2.5); bucket
    # counts and integer weight sums are partition-order independent
    t_toks = spread_narrow_input(target.select(F.col(text_col))).select(
        F.explode(tokens(F.col(text_col))).alias("tok")
    ).select((char_poly_hash(F.col("tok")) % F.lit(n_buckets)).alias("bucket"))
    r_toks = spread_narrow_input(raw.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select(id_col, (char_poly_hash(F.col("tok")) % F.lit(n_buckets)).alias("bucket"))

    t_cnt = t_toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("t_cnt"))
    r_cnt = r_toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("r_cnt"))
    # full-outer so corpus totals are exact even when the target is not a
    # subset of raw; the single-partition window runs over <= n_buckets
    # rows (no scalar cross-join, no nested-loop join in the plan)
    tot_w = Window.partitionBy()
    weights = (
        r_cnt.join(t_cnt, on="bucket", how="full")
        .withColumn("r_tot", F.sum(F.coalesce(F.col("r_cnt"), F.lit(0))).over(tot_w))
        .withColumn("t_tot", F.sum(F.coalesce(F.col("t_cnt"), F.lit(0))).over(tot_w))
        .where(F.col("r_cnt").isNotNull())
        .select(
            "bucket",
            F.expr(
                f"(CAST({scale} AS BIGINT) * (coalesce(t_cnt, 0) + 1) * (r_tot + {n_buckets})) "
                f"DIV ((r_cnt + 1) * (t_tot + {n_buckets}))"
            ).alias("w"),
        )
    )
    return (
        r_toks.join(F.broadcast(weights), on="bucket")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("w").alias("dsir_score"))
        .withColumn("keep", F.col("dsir_score") > F.col("n_tokens") * F.lit(scale))
    )


def sample_exact_n(
    df: DataFrame, n: int, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic EXACT-size sample: the ``n`` rows with the smallest
    (id-hash, id) key — reservoir-sampling semantics without randomness,
    so the sample is reproducible on any engine, partitioning, or run
    (``df.sample`` guarantees neither size nor stability).

    The hash order is uncorrelated with any data column, so the sample
    is unbiased for analytics (eval-set carving, spot-check QA).
    Compiles to TakeOrderedAndProject: each partition keeps its local
    top-n, the driver merges — no global sort, no full shuffle.
    Returns the sampled rows with a ``sample_rank`` column (1..n).
    """
    key = char_poly_hash(F.col(id_col).cast("string"))
    picked = df.withColumn("__k", key).orderBy("__k", id_col).limit(n)
    w = Window.orderBy("__k", id_col)  # n rows only — tiny window
    return (
        picked.withColumn("sample_rank", F.row_number().over(w))
        .drop("__k")
    )


def sample_exact_n_by(
    df: DataFrame, group_col: str, n: int, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic EXACT-size sample PER GROUP: each ``group_col``
    value's ``n`` rows with the smallest (id-hash, id) key — the
    stratified eval-set carve ("100 docs from every language/domain")
    with ``sample_exact_n``'s reproducibility guarantees.

    One per-group row_number window over (hash, id) — a sort-based
    shuffle on the group key, spillable, no collected arrays; groups
    smaller than ``n`` contribute all their rows.  Returns the sampled
    rows with ``sample_rank`` (1..n within each group).
    """
    key = char_poly_hash(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(key, id_col)
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= n)
    )


def weighted_sample_n(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted priority sample of exactly ``n`` rows:
    rank by ``hash(id) / weight`` ascending — a larger weight shrinks a
    row's key, making it proportionally likelier to land in the top-n
    (A-Res-style priority sampling with a reproducible pseudo-uniform
    hash in place of randomness, so the sample is stable across runs,
    engines, and partitionings — what quality-weighted corpus carving
    needs for reproducibility).

    The key is ONE IEEE double division of exact integers — bit-equal
    in any engine, so the oracle replays it.  Rows with weight ≤ 0 are
    excluded.  Compiles to TakeOrderedAndProject (per-partition top-n,
    no global sort).  Returns the rows with ``sample_rank`` (1..n).
    """
    key = char_poly_hash(F.col(id_col).cast("string")).cast("double") / F.col(
        weight_col
    ).cast("double")
    picked = (
        df.where(F.col(weight_col) > 0)
        .withColumn("__k", key)
        .orderBy("__k", id_col)
        .limit(n)
    )
    w = Window.orderBy("__k", id_col)  # n rows only — tiny window
    return (
        picked.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .drop("__k")
    )


def budget_select(
    df: DataFrame,
    budget_tokens: int,
    score_col: str,
    token_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget corpus selection: walk the corpus in (score DESC,
    id ASC) order and keep documents until the cumulative token count
    crosses ``budget_tokens`` — "take the best N tokens", the
    budget-constrained variant of quality filtering every training-mix
    spec ends with.  The first document that crosses the line is kept
    (the budget is a lower bound on selected tokens), then selection
    stops.

    Scale shape — two-phase prefix sum, NO global single-partition
    window (the ``pack_sequences`` pattern): ``score_col`` must be a
    bounded-cardinality integer (a pmille score: ≤1001 distinct
    values).  Per-score token totals aggregate map-side; their running
    offsets compute in a ≤1001-row window and broadcast back; each
    row's global cumulative sum is then its score-bucket offset plus a
    window partitioned BY score — every shuffle is on the score or a
    broadcast.

    Returns the selected rows plus ``cum_tokens`` (inclusive).
    """
    per_score = df.groupBy(score_col).agg(
        F.sum(token_col).cast("long").alias("__bucket_tokens")
    )
    w_off = (
        Window.orderBy(F.col(score_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_score.select(
        score_col,
        F.coalesce(F.sum("__bucket_tokens").over(w_off), F.lit(0))
        .cast("long")
        .alias("__off"),
    )
    w_in = Window.partitionBy(score_col).orderBy(F.col(id_col).asc())
    return (
        df.join(F.broadcast(offsets), score_col)
        .withColumn(
            "cum_tokens",
            (F.col("__off") + F.sum(token_col).over(w_in)).cast("long"),
        )
        .where(F.col("cum_tokens") - F.col(token_col) < budget_tokens)
        .drop("__off")
    )


# --------------------------------------------------------------------------
# distribution drift (corpus-snapshot comparison gate)
# --------------------------------------------------------------------------
def percentile_filter(
    df: DataFrame,
    score_col: str,
    q_pmille: int = 500,
    group_col: str | None = None,
) -> DataFrame:
    """Keep the rows at or above the ``q_pmille``-th per-mille
    percentile of ``score_col`` — per ``group_col`` when given (the
    per-domain/per-language quality carve every training-mix spec
    applies: "top half of each language by quality").

    EXACT by integer arithmetic, no approx-percentile: ``score_col``
    must be a bounded-cardinality integer (a pmille score, ≤1001
    distinct values — the ``budget_select`` contract), so the
    per-group score histogram is tiny.  The threshold is the smallest
    score whose cumulative count reaches ``ceil(q·n/1000)``; rows with
    ``score >= threshold`` are kept, ties included (so the kept
    fraction is ≥ (1000-q)/1000).

    Scale shape: one map-side-combined groupBy((group), score), a
    per-group window over ≤1001 histogram rows, and an equi-join of
    the per-group threshold table back to the data (plain join — AQE
    broadcasts it when groups are few); no global sort, no
    per-row window.

    Returns the input rows (all columns) that pass.
    """
    from pyspark.sql.window import Window

    grp = [group_col] if group_col else []
    hist = df.groupBy(*grp, score_col).agg(F.count(F.lit(1)).alias("__c"))
    w = (
        Window.partitionBy(*grp).orderBy(score_col)
        if grp
        else Window.orderBy(score_col)
    )
    wt = Window.partitionBy(*grp) if grp else Window.partitionBy()
    cum = hist.withColumn("__cum", F.sum("__c").over(w)).withColumn(
        "__tot", F.sum("__c").over(wt)
    )
    # BIGINT ceil-division — a double divide would lose exactness past
    # 2^53 at extreme totals
    need = F.expr(f"(CAST({q_pmille} AS BIGINT) * __tot + 999) DIV 1000")
    thr = (
        cum.where(F.col("__cum") >= need)
        .groupBy(*grp)
        .agg(F.min(score_col).alias("__thr"))
    )
    if grp:
        joined = df.join(thr, on=grp)
    else:
        joined = df.crossJoin(F.broadcast(thr))
    return joined.where(F.col(score_col) >= F.col("__thr")).drop("__thr")


def distribution_drift(
    ref: DataFrame | None,
    cand: DataFrame,
    bin_col: Column | str,
    scale: int = 10**6,
    ref_counts: DataFrame | None = None,
) -> DataFrame:
    """Per-bin distribution drift between a reference corpus snapshot
    and a candidate snapshot — the "did the pipeline change the data?"
    gate before a training run.

    Chi-square-style, but entirely BIGINT: per-bin proportions are
    floor-scaled to ``scale`` parts (``p = cnt*scale DIV total``) and
    the contribution is ``(p_cand - p_ref)² DIV max(p_ref, 1)`` —
    exact, order-independent, engine-agnostic (no float sums that vary
    with partition order).  Sum ``contrib`` over bins for the
    corpus-level drift number; read the top bins directly — they
    localize WHERE the distribution moved.  Cost: two map-side-partial
    groupBys + a ≤|bins|-row full-outer join; the totals window runs
    over the tiny bin table only, so there is no scalar cross-join in
    the plan.

    Pass ``ref_counts`` — a precomputed/persisted (bin, n_ref) relation
    — instead of ``ref`` to amortize the reference histogram across many
    comparisons (the streaming monitor does this once per drain).
    """
    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    if ref_counts is not None:
        r = ref_counts
    else:
        r = ref.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias("n_ref")
        )
    c = cand.select(b.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_cand")
    )
    tot_w = Window.partitionBy()
    j = (
        r.join(c, on="bin", how="full")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cand", F.lit(0)).alias("n_cand"),
        )
        .withColumn("ref_tot", F.greatest(F.sum("n_ref").over(tot_w), F.lit(1)))
        .withColumn("cand_tot", F.greatest(F.sum("n_cand").over(tot_w), F.lit(1)))
    )
    return (
        j.select(
            "bin",
            "n_ref",
            "n_cand",
            F.expr(f"(n_ref * CAST({scale} AS BIGINT)) DIV ref_tot").alias("p_ref_e6"),
            F.expr(f"(n_cand * CAST({scale} AS BIGINT)) DIV cand_tot").alias(
                "p_cand_e6"
            ),
        )
        .withColumn(
            "contrib",
            F.expr(
                "((p_cand_e6 - p_ref_e6) * (p_cand_e6 - p_ref_e6)) "
                "DIV greatest(p_ref_e6, 1)"
            ),
        )
    )


def grouped_drift(
    ref: DataFrame,
    cand: DataFrame,
    group_col: Column | str,
    bin_col: Column | str,
    scale: int = 10**6,
) -> DataFrame:
    """Per-SLICE distribution drift: ``distribution_drift`` computed
    independently inside each group (language, source, time bucket) —
    global drift can hide a slice that moved violently while the
    aggregate stayed put.  Same pure-BIGINT arithmetic; proportions are
    per-group (the totals window partitions by group, still ≤ |groups|×
    |bins| rows).  Returns (grp, bin, n_ref, n_cand, p_ref_e6,
    p_cand_e6, contrib)."""
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    r = ref.select(g.alias("grp"), b.alias("bin")).groupBy("grp", "bin").agg(
        F.count(F.lit(1)).alias("n_ref")
    )
    c = cand.select(g.alias("grp"), b.alias("bin")).groupBy("grp", "bin").agg(
        F.count(F.lit(1)).alias("n_cand")
    )
    tot_w = Window.partitionBy("grp")
    j = (
        r.join(c, on=["grp", "bin"], how="full")
        .select(
            "grp",
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cand", F.lit(0)).alias("n_cand"),
        )
        .withColumn("ref_tot", F.greatest(F.sum("n_ref").over(tot_w), F.lit(1)))
        .withColumn("cand_tot", F.greatest(F.sum("n_cand").over(tot_w), F.lit(1)))
    )
    return (
        j.select(
            "grp",
            "bin",
            "n_ref",
            "n_cand",
            F.expr(f"(n_ref * CAST({scale} AS BIGINT)) DIV ref_tot").alias("p_ref_e6"),
            F.expr(f"(n_cand * CAST({scale} AS BIGINT)) DIV cand_tot").alias(
                "p_cand_e6"
            ),
        )
        .withColumn(
            "contrib",
            F.expr(
                "((p_cand_e6 - p_ref_e6) * (p_cand_e6 - p_ref_e6)) "
                "DIV greatest(p_ref_e6, 1)"
            ),
        )
    )
