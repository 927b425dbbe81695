"""Embedding similarity search: brute-force cosine top-k (baseline) and
random-hyperplane LSH bucketing (scale path).

Scale notes:
- ``cosine`` is a zip_with + left-fold over array<double> — built-in
  higher-order functions, JVM-side, no UDF.  The fold order is fixed
  (left-to-right) so results are bit-identical across engines/runs.
- brute-force top-k broadcasts the (small) query set against the corpus:
  one broadcast-nested-loop + a per-query window rank.  Exact, O(n·q).
- the LSH path buckets vectors by the sign pattern of N_HYPERPLANES dot
  products (map-only projection).  Same-bucket candidates then get exact
  cosine — the standard "ANN via LSH" layout whose cost is O(n + collisions)
  instead of O(n²); at 100 TB the bucket id also serves as a partition key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .constants import COSINE_DUP_THRESHOLD, HYPERPLANES


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def spread_narrow_input(df: DataFrame) -> DataFrame:
    """Widen a narrow input before a heavy per-row projection or a
    row-multiplying explode (guide §2.5 input skew: repartition right
    after the read).  The local testdata parquet files are single
    row-group, so every scan starts as ONE task and heavy expression
    chains run single-threaded until the first shuffle.  Repartition to
    the session's parallelism ONLY when the input is narrower than it —
    at real scale inputs are wider and this is a no-op, so no constant
    is tuned for local mode."""
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    if nparts < par:
        return df.repartition(par)
    return df


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of element products (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _with_norm(df: DataFrame, vec: str) -> DataFrame:
    """Attach ``__n<vec>`` = norm(vec) as a per-ROW column before a join
    whose score divides by it: the score expression then reads the two
    norms instead of re-folding them per candidate PAIR — n+m norm folds
    instead of 2·n·m for an n×m candidate table (guide §1.2: cut
    per-task work the optimizer cannot hoist across a join).  Values are
    bit-identical: norm() of the same array is the same double wherever
    it is evaluated, and the division consumes identical operand values
    in the same order.  Measured r14 (noop sink, 2000×25 brute-topk):
    2.3 s -> 1.6 s."""
    return df.withColumn(f"__n{vec}", norm(F.col(vec)))


def _cos_pre(cv: str, qv: str) -> Column:
    """``cosine(cv, qv)`` reading the ``_with_norm`` columns."""
    return dot(F.col(cv), F.col(qv)) / (F.col(f"__n{cv}") * F.col(f"__n{qv}"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cos_sim, rank); excludes self-matches;
    cos_sim rounded to 4dp; ties broken by neighbor_id (deterministic).
    The query side is broadcast — corpus is never shuffled.
    """
    c = _with_norm(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
        ),
        "cv",
    )
    q = _with_norm(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        ),
        "qv",
    )
    joined = c.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(_cos_pre("cv", "qv"), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def partitioned_topk(
    corpus: DataFrame,
    queries: DataFrame,
    partition_col: str = "label",
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: search only within the query's partition (cluster).

    The partition column plays the role of an IVF cell assignment (here a
    pre-assigned cluster id; swap in k-means assignments in production).
    At 100 TB the corpus is laid out partitioned-by-cell so each query
    touches one partition — the equi-join on the cell id IS the pruning.
    Returns (query_id, neighbor_id, cos_sim, rank).
    """
    c = _with_norm(
        corpus.select(
            F.col(partition_col).alias("part"),
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("cv"),
        ),
        "cv",
    )
    q = _with_norm(
        queries.select(
            F.col(partition_col).alias("part"),
            F.col(id_col).alias("query_id"),
            as_double(F.col(vec_col)).alias("qv"),
        ),
        "qv",
    )
    joined = c.join(F.broadcast(q), on="part").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(_cos_pre("cv", "qv"), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank")
        )
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    nprobe: int = 2,
) -> DataFrame:
    """Hard-negative mining for contrastive training: each query's
    top-k most-similar corpus vectors whose ``label_col`` DIFFERS from
    the query's — the near-misses a retrieval/embedding model learns
    the most from (similar by cosine, wrong by label).

    Two execution paths:

    - ``centroids=None`` (default): exact brute force, same shape as
      ``brute_force_topk`` (broadcast query side, corpus never
      shuffled, per-query window top-k) with the label-mismatch
      predicate fused into the join.  Right for a bounded query set;
      O(corpus × queries) when queries are corpus-scale.
    - ``centroids=[...]``: the 100 TB path — IVF cell pruning exactly
      as ``knn_graph`` does it.  The corpus is cell-assigned (map-only
      broadcast argmax), each query explodes its ``nprobe`` nearest
      cells, and an ordinary SHUFFLE equi-join on ``cell`` (the probe
      side is deliberately NOT broadcast) scores only ~nprobe/n_cells
      of the corpus per query — so mining negatives for a FULL
      training set (queries = corpus) stays linear × nprobe instead of
      quadratic.  ``nprobe = len(centroids)`` provably recovers the
      brute-force result (every corpus row is a candidate exactly
      once; pinned in TestSimilarity), so recall is tunable with the
      usual IVF dial.

    Label mismatch subsumes self-exclusion (self always shares its own
    label).  Returns (query_id, query_label, neighbor_id,
    neighbor_label, cos_sim, rank).
    """
    if centroids is not None:
        c = _with_norm(
            ivf_assign(corpus, centroids, vec_col=vec_col).select(
                "cell",
                F.col(id_col).alias("neighbor_id"),
                F.col(label_col).alias("neighbor_label"),
                as_double(F.col(vec_col)).alias("cv"),
            ),
            "cv",
        )
        q = _with_norm(
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(label_col).alias("query_label"),
                as_double(F.col(vec_col)).alias("qv"),
            ),
            "qv",
        ).withColumn(
            "cell",
            F.explode(
                F.transform(
                    F.slice(
                        F.reverse(
                            F.array_sort(_centroid_sims("qv", centroids))
                        ),
                        1,
                        nprobe,
                    ),
                    lambda s: s["i"],
                )
            ),
        )
        joined = c.join(q, on="cell").where(
            F.col("neighbor_label") != F.col("query_label")
        )
    else:
        c = _with_norm(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(label_col).alias("neighbor_label"),
                as_double(F.col(vec_col)).alias("cv"),
            ),
            "cv",
        )
        q = _with_norm(
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(label_col).alias("query_label"),
                as_double(F.col(vec_col)).alias("qv"),
            ),
            "qv",
        )
        joined = c.crossJoin(F.broadcast(q)).where(
            F.col("neighbor_label") != F.col("query_label")
        )
    scored = joined.select(
        "query_id",
        "query_label",
        "neighbor_id",
        "neighbor_label",
        F.round(_cos_pre("cv", "qv"), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            "cos_sim",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def hyperplane_bucket(vec: str) -> Column:
    """LSH bucket id: bit i = 1 iff dot(vec, plane_i) > 0.

    ``vec`` is a SQL fragment; one ``F.expr`` parse replaces ~500 py4j
    literal round-trips (see ``_centroid_sims``).  The expression tree —
    left-nested additions of CASE×power-of-two terms over the same dot
    folds — is unchanged, so bucket ids are bit-identical."""
    acc = "cast(0 as bigint)"
    for i, plane in enumerate(HYPERPLANES):
        bit = (
            f"(CASE WHEN {_dot_sql(vec, _vec_sql(plane))} > 0 "
            f"THEN cast(1 as bigint) ELSE cast(0 as bigint) END)"
        )
        acc = f"({acc} + {bit} * cast({2 ** i} as bigint))"
    return F.expr(acc)


def lsh_bucket_table(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, bucket) assignment — the IVF/LSH partitioning step."""
    return df.select(
        F.col(id_col).alias("id"),
        hyperplane_bucket(_as_double_sql(vec_col)).alias("bucket"),
    )


def lsh_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = COSINE_DUP_THRESHOLD,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: same LSH bucket AND cosine ≥ t.

    Returns (id_a, id_b, cos_sim), id_a < id_b, rounded to 4dp.  The
    bucket equi-join keeps candidate generation linear in corpus size.

    ``max_bucket_size`` (default off) is the web-scale hot-bucket guard:
    a degenerate bucket — e.g. a mass of near-zero or boilerplate
    embeddings all on the same side of every hyperplane — turns the
    self-join into O(n²) pairs.  With the cap set, oversized buckets are
    dropped from candidate generation (audit them with
    ``lsh_bucket_table`` + a groupBy count).  Pinned by
    ``test_lsh_hot_bucket_cap``.
    """
    base = _with_norm(
        df.select(
            F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
        ).withColumn("bucket", hyperplane_bucket("v")),
        "v",
    )
    if max_bucket_size is not None:
        wb = Window.partitionBy("bucket")
        base = (
            base.withColumn("__bsz", F.count(F.lit(1)).over(wb))
            .where(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    l, r = base.alias("l"), base.alias("r")
    cand = l.join(
        r,
        on=[F.col("l.bucket") == F.col("r.bucket"), F.col("l.id") < F.col("r.id")],
    ).select(
        F.col("l.id").alias("id_a"),
        F.col("r.id").alias("id_b"),
        F.round(
            dot(F.col("l.v"), F.col("r.v"))
            / (F.col("l.__nv") * F.col("r.__nv")),
            4,
        ).alias("cos_sim"),
    )
    return cand.where(F.col("cos_sim") >= F.lit(threshold)).select(
        "id_a", "id_b", "cos_sim"
    )


def label_centroids(
    df: DataFrame,
    partition_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-partition mean embedding in long format
    (label, dim_idx, centroid) — the IVF cell-training step.

    Elementwise means are computed over micro-unit integers
    (floor(x·1e6 + .5)) so the sum is associative — shuffle-order
    independent and bit-identical to the DuckDB oracle.  posexplode →
    groupBy(label, dim) is one shuffle of (label, dim, long) triples;
    at corpus scale add a coarse repartition on label first so the
    partial aggregation combines locally.
    """
    exploded = df.select(
        F.col(partition_col).alias("label"),
        F.posexplode(as_double(F.col(vec_col))).alias("dim_idx", "x"),
    )
    return exploded.groupBy("label", "dim_idx").agg(
        (
            F.sum(F.floor(F.col("x") * scale + F.lit(0.5)).cast("long")).cast("double")
            / scale
            / F.count(F.lit(1))
        ).alias("centroid_raw")
    ).select(
        "label",
        F.col("dim_idx").cast("long").alias("dim_idx"),
        F.round(F.col("centroid_raw"), 6).alias("centroid"),
    )


def brute_force_topk_np(
    corpus: DataFrame,
    queries_pdf,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized brute-force top-k: numpy matmul inside mapInPandas.

    The performance twin of ``brute_force_topk`` (which stays the
    bit-exact oracle-checked baseline): queries arrive as a small pandas
    frame captured in the closure (broadcast to every task), each corpus
    partition scores its rows against ALL queries with one matmul, emits
    its partition-local top-k per query, and a final per-query window
    keeps the global top-k — the classic local-topk→merge layout whose
    shuffle carries only ``partitions × queries × k`` rows.

    Ties and float summation follow numpy (pairwise) order, so ranks can
    differ from the exact baseline at 4dp boundaries — use for speed,
    not for oracle comparisons.
    """
    import numpy as np
    import pandas as pd

    q_ids = queries_pdf[id_col].to_numpy()
    q_mat = np.stack(queries_pdf[vec_col].to_list()).astype("float64")
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def _score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.stack(pdf[vec_col].to_list()).astype("float64")
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ q_norm.T  # (rows, queries)
            top = min(k + 1, len(ids))  # +1 to survive self-match removal
            part = np.argpartition(-sims, top - 1, axis=0)[:top]
            out = {"query_id": [], "neighbor_id": [], "cos_sim": []}
            for qi in range(len(q_ids)):
                for ri in part[:, qi]:
                    if ids[ri] == q_ids[qi]:
                        continue
                    out["query_id"].append(q_ids[qi])
                    out["neighbor_id"].append(ids[ri])
                    out["cos_sim"].append(round(float(sims[ri, qi]), 4))
            yield pd.DataFrame(out)

    local = corpus.mapInPandas(
        _score, "query_id long, neighbor_id long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


# --------------------------------------------------------------------------
# trained IVF (inverted-file) index: Lloyd's k-means over DataFrame ops
# --------------------------------------------------------------------------


def _q(name: str) -> str:
    """Backtick-quote a column name for a SQL fragment."""
    return "`" + name.replace("`", "``") + "`"


def _vec_sql(c: list[float]) -> str:
    """SQL double-array literal.  ``repr`` round-trips IEEE doubles, so
    the parsed literal is bit-identical to ``F.lit(float(v))``."""
    return "array(" + ",".join(repr(float(v)) + "D" for v in c) + ")"


def _dot_sql(a: str, b: str) -> str:
    """SQL twin of ``dot`` — same left-to-right fold, same lambdas."""
    return f"aggregate(zip_with({a},{b},(x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"


def _cos_sql(a: str, b: str) -> str:
    return f"({_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)})))"


def _as_double_sql(name: str) -> str:
    """SQL twin of ``as_double(F.col(name))``."""
    return f"transform({_q(name)}, x -> cast(x as double))"


def _centroid_sims(vec: str, centroids: list[list[float]]) -> Column:
    """Array of (cos_sim, cell_idx) structs, one per centroid.

    ``vec`` is a SQL fragment (column name or expression).  The whole
    expression is rendered as ONE SQL string and parsed JVM-side: the
    former per-element ``F.lit``/lambda construction cost ~2.3 s of
    driver py4j round-trips PER CALL (8 centroids × 64 dims, profiled
    r14) — two orders of magnitude more than the parse.  Values are
    bit-identical (same fold order, same literals)."""
    items = ", ".join(
        f"named_struct('s', {_cos_sql(vec, _vec_sql(c))}, 'i', {i})"
        for i, c in enumerate(centroids)
    )
    return F.expr(f"array({items})")


#: target vectors per IVF cell when ``n_cells="auto"`` — holds per-probe
#: candidate work constant as the corpus grows (the cells-∝-n contract)
DEFAULT_CELL_SIZE = 256


def resolve_n_cells(
    corpus: DataFrame,
    n_cells: int | str,
    target_cell_size: int = DEFAULT_CELL_SIZE,
) -> int:
    """Resolve ``n_cells="auto"`` to ``⌈n / target_cell_size⌉``.

    The round-6 scale sweep proved a FIXED cell count makes kNN-graph
    candidate pairs quadratic in the corpus (n²·nprobe/n_cells; 20.7×
    wall at 10× data).  Auto sizing holds |cell| ≈ ``target_cell_size``
    so candidates per vector stay constant and the sweep goes sublinear
    out of the box — the documented remedy made self-executing.  The
    count is one metadata-cheap job; at 100 TB train on a sample and
    size cells from the FULL corpus count.
    """
    if n_cells != "auto":
        return int(n_cells)
    n = corpus.count()
    return max(1, -(-n // int(target_cell_size)))


def ivf_train(
    corpus: DataFrame,
    n_cells: int | str = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 5,
    target_cell_size: int = DEFAULT_CELL_SIZE,
) -> list[list[float]]:
    """Train IVF cell centroids with Lloyd's k-means, expressed as
    DataFrame ops (assign = broadcast argmax-cosine projection; update =
    one groupBy with per-dimension means).

    ``n_cells="auto"`` trains ``⌈n / target_cell_size⌉`` cells
    (``resolve_n_cells``) so the index keeps the cells-∝-n scaling
    contract without the caller doing the arithmetic.

    Deterministic init: the ``n_cells`` vectors with the smallest ids.
    Only ``n_cells × dim`` floats ever reach the driver per iteration —
    the corpus itself is scanned map-side, so the loop is
    ``iterations`` scans + ``iterations`` tiny shuffles at any scale.
    For 100 TB practice, train on a sampled slice (``corpus.sample``)
    and assign the full corpus once with ``ivf_assign``.
    """
    n_cells = resolve_n_cells(corpus, n_cells, target_cell_size)
    seed_rows = (
        corpus.select(id_col, as_double(F.col(vec_col)).alias("v"))
        .orderBy(id_col)
        .limit(n_cells)
        .collect()
    )
    centroids = [list(r["v"]) for r in seed_rows]
    dim = len(centroids[0])
    for _ in range(iterations):
        assigned = ivf_assign(corpus, centroids, vec_col=vec_col)
        stats = assigned.groupBy("cell").agg(
            *[
                F.expr(f"avg(cast({_q(vec_col)}[{i}] as double))").alias(f"c{i}")
                for i in range(dim)
            ]
        )
        for r in stats.collect():
            centroids[r["cell"]] = [float(r[f"c{i}"]) for i in range(dim)]
        # cells that lost every member keep their previous centroid
    return centroids


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Attach the nearest-centroid (max cosine) cell id — a map-only
    projection; the centroid table rides along in the plan (broadcast)."""
    sims = _centroid_sims(_as_double_sql(vec_col), centroids)
    return df.withColumn(out_col, F.array_max(sims)["i"])


def cell_balance(
    df: DataFrame,
    centroids: list[list[float]] | None = None,
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """IVF index-health report: vectors per cell and each cell's share
    of the corpus — the skew gauge that tells you when to retrain
    (``ivf_train``) or raise ``n_cells`` (SemDeDup/IVF probe cost is
    Σ|cell|², so one bloated cell dominates everything).

    Map-only assignment + one groupBy(cell); the corpus total joins
    back as a 1-row broadcast scalar (the documented bounded shape).
    Share is BIGINT floor parts-per-``scale`` — engine-exact.
    ``centroids=None`` uses the seeded SEMDEDUP_CENTROIDS so the
    oracle replays the assignment.

    Returns (cell, n_vecs, share_pmille).
    """
    from .constants import SEMDEDUP_CENTROIDS

    if centroids is None:
        centroids = SEMDEDUP_CENTROIDS
    counts = (
        ivf_assign(df, centroids, vec_col=vec_col)
        .groupBy(F.col("cell").cast("long").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )
    total = counts.agg(F.sum("n_vecs").cast("long").alias("__total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "cell",
        "n_vecs",
        F.expr(f"({scale} * n_vecs) DIV __total").cast("long").alias(
            "share_pmille"
        ),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int | str = 16,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via a trained IVF index: assign the corpus to
    cells, probe each query's ``nprobe`` nearest cells, exact-score only
    those candidates.

    The cell equi-join replaces the brute-force cross join — per query
    the scan shrinks by ~``n_cells / nprobe``; recall is tunable with
    ``nprobe`` (= ``n_cells`` recovers exact search).  At 100 TB, write
    the corpus partitioned by ``cell`` so a probe prunes at the file
    level.  Returns (query_id, neighbor_id, cos_sim, rank).
    """
    if centroids is None:
        centroids = ivf_train(corpus, n_cells, id_col, vec_col)
    c = _with_norm(
        ivf_assign(corpus, centroids, vec_col=vec_col).select(
            "cell",
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("cv"),
        ),
        "cv",
    )
    probes = _with_norm(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        ),
        "qv",
    ).withColumn(
        "cell",
        F.explode(
            F.transform(
                F.slice(
                    F.reverse(F.array_sort(_centroid_sims("qv", centroids))),
                    1,
                    nprobe,
                ),
                lambda s: s["i"],
            )
        ),
    )
    joined = c.join(F.broadcast(probes), on="cell").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(_cos_pre("cv", "qv"), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank")
        )
    )


def knn_graph(
    corpus: DataFrame,
    k: int = 5,
    n_cells: int | str = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    np_score: bool = False,
) -> DataFrame:
    """All-corpus k-nearest-neighbor GRAPH (every vector's top-k cosine
    neighbors) with IVF cell pruning.

    ``ivf_topk`` broadcasts its query set — right for a handful of
    probes, wrong when every corpus vector is a query.  Here both sides
    shuffle on ``cell``: the probe side explodes each vector's
    ``nprobe`` nearest cells and equi-joins the cell-assigned corpus,
    so the candidate set per vector is ~``nprobe / n_cells`` of the
    corpus and the join is an ordinary shuffle join that scales
    horizontally (no side is ever replicated whole).  A (src, neighbor)
    pair appears at most once because a neighbor lives in exactly one
    cell.  ``nprobe = n_cells`` recovers the exact kNN graph (pinned in
    tests against ``brute_force_topk``).

    SCALING CONTRACT: candidate pairs = n² · nprobe / n_cells, so with
    a FIXED cell count the graph is quadratic in the corpus — grow
    ``n_cells`` ∝ n to hold |cell| (and per-vector candidates)
    constant, train on a sample (``ivf_train(corpus.sample(...))``),
    keep ``nprobe`` small, and pre-partition the corpus by cell
    (``ivf_write_index``) so probes prune at the file level.
    ``n_cells="auto"`` executes the contract for you: it trains
    ``⌈n/DEFAULT_CELL_SIZE⌉`` cells (``resolve_n_cells``), so the same
    call stays sublinear as the corpus grows.  Measured at a 10× corpus
    (PERF.md round-6 scale sweep): fixed 8 cells → 20.7× wall; cells
    scaled 8 → 80 → 5.8× wall (sublinear); round-7 sweep pins "auto"
    reproducing the sublinear shape with no caller arithmetic.
    Training-pipeline uses: SemDeDup neighbor audits, kNN-graph
    clustering, coreset selection.

    ``np_score=True`` computes the candidate cosines per cell inside
    Arrow-batched ``applyInPandas`` with the SAME float evaluation
    order as the expression fold (dimension-ascending accumulation, the
    ``pq_encode_np`` trick; rounding stays Spark-side so HALF_UP
    matches) — bit-identical results at BLAS-class speed.  Only the
    cell's vectors cross the Arrow boundary (O(n·nprobe) rows), never
    the joined pair table.

    Returns (src_id, neighbor_id, cos_sim, rank).
    """
    if centroids is None:
        centroids = ivf_train(corpus, n_cells, id_col, vec_col)
    cells = _with_norm(
        ivf_assign(corpus, centroids, vec_col=vec_col).select(
            "cell",
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("cv"),
        ),
        "cv",
    )
    probes = _with_norm(
        corpus.select(
            F.col(id_col).alias("src_id"), as_double(F.col(vec_col)).alias("qv")
        ),
        "qv",
    ).withColumn(
        "cell",
        F.explode(
            F.transform(
                F.slice(
                    F.reverse(F.array_sort(_centroid_sims("qv", centroids))),
                    1,
                    nprobe,
                ),
                lambda s: s["i"],
            )
        ),
    )
    if np_score:
        scored = _cell_scores_np(cells, probes).select(
            "src_id", "neighbor_id", F.round("sim", 4).alias("cos_sim")
        )
    else:
        joined = cells.join(probes, on="cell").where(
            F.col("neighbor_id") != F.col("src_id")
        )
        scored = joined.select(
            "src_id",
            "neighbor_id",
            F.round(_cos_pre("cv", "qv"), 4).alias("cos_sim"),
        )
    w = Window.partitionBy("src_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "src_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank")
        )
    )


def _cell_scores_np(cells: DataFrame, probes: DataFrame) -> DataFrame:
    """Per-cell candidate scoring for knn_graph's numpy path: corpus and
    probe rows of one cell meet inside applyInPandas; only O(cell size)
    vectors cross Arrow, the scored pair rows come back columnar.

    Float evaluation order matches the expression fold exactly —
    dot/norm sums accumulate dimension-ascending, norms multiply before
    the divide — so every emitted double is bit-identical to
    ``cosine(cv, qv)`` (rounding is applied by the CALLER in Spark to
    keep HALF_UP semantics).

    Output id types are derived from the INPUT id columns (not
    hardcoded long), so string/int ids work on the numpy path exactly
    as they do on the expression path."""
    import pandas as pd

    src_t = probes.schema["src_id"].dataType.simpleString()
    nbr_t = cells.schema["neighbor_id"].dataType.simpleString()
    _pd_dtype = {
        "tinyint": "int8", "smallint": "int16", "int": "int32",
        "bigint": "int64", "float": "float32", "double": "float64",
    }
    src_pd = _pd_dtype.get(src_t, "object")
    nbr_pd = _pd_dtype.get(nbr_t, "object")

    tagged = cells.select(
        "cell", F.col("neighbor_id").alias("id"), F.col("cv").alias("v"),
        F.lit(0).alias("side"),
    ).unionByName(
        probes.select(
            "cell", F.col("src_id").alias("id"), F.col("qv").alias("v"),
            F.lit(1).alias("side"),
        )
    )

    def _score(key, pdf):
        import numpy as np

        l_ = pdf[pdf["side"] == 0]
        r_ = pdf[pdf["side"] == 1]
        empty = pd.DataFrame({"src_id": [], "neighbor_id": [], "sim": []}).astype(
            {"src_id": src_pd, "neighbor_id": nbr_pd, "sim": "float64"}
        )
        if l_.empty or r_.empty:
            return empty
        L = np.stack(l_["v"].map(lambda x: np.asarray(x, dtype=np.float64)).to_numpy())
        R = np.stack(r_["v"].map(lambda x: np.asarray(x, dtype=np.float64)).to_numpy())
        dim = L.shape[1]
        dots = np.zeros((R.shape[0], L.shape[0]))
        nl = np.zeros(L.shape[0])
        nr = np.zeros(R.shape[0])
        for i in range(dim):
            dots += R[:, i][:, None] * L[None, :, i]
            nl += L[:, i] * L[:, i]
            nr += R[:, i] * R[:, i]
        sims = dots / (np.sqrt(nl)[None, :] * np.sqrt(nr)[:, None])
        lid = l_["id"].to_numpy()
        rid = r_["id"].to_numpy()
        src = np.repeat(rid, len(lid))
        nbr = np.tile(lid, len(rid))
        keep = src != nbr
        return pd.DataFrame(
            {"src_id": src[keep], "neighbor_id": nbr[keep], "sim": sims.ravel()[keep]}
        )

    return tagged.groupBy("cell").applyInPandas(
        _score, f"src_id {src_t}, neighbor_id {nbr_t}, sim double"
    )


# --------------------------------------------------------------------------
# int8 scalar quantization (embedding compression for billion-vector ANN)
# --------------------------------------------------------------------------
def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = round(x_i * 127 /
    max|x|) — the standard compression step that cuts a float32 ANN
    index 4× (what a 100 TB embedding store actually serves from).

    Map-only projection, all built-in higher-order functions (no
    Python).  Returns (vec_id, amax, qsum, qnorm): the scale factor plus
    integer checksums of the quantized vector (sum and sum-of-squares) —
    BIGINT-exact, so the DuckDB oracle matches bit-for-bit without
    hashing an array column.  The quantized array itself is `qvec`
    in the intermediate select for pipeline use.
    """
    v = as_double(F.col(vec_col))
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    safe = F.greatest(amax, F.lit(1e-30))
    qvec = F.transform(v, lambda x: F.round(x * (F.lit(127.0) / safe)).cast("long"))
    out = df.select(
        F.col(id_col).alias("vec_id"),
        F.round(amax, 6).alias("amax"),
        qvec.alias("qvec"),
    )
    return out.select(
        "vec_id",
        "amax",
        F.aggregate("qvec", F.lit(0).cast("long"), lambda a, q: a + q).alias("qsum"),
        F.aggregate("qvec", F.lit(0).cast("long"), lambda a, q: a + q * q).alias(
            "qnorm"
        ),
    )


# --------------------------------------------------------------------------
# product quantization (PQ) — compressed-domain shortlist + exact re-rank
# --------------------------------------------------------------------------
def _sub_argmin_l2(sv: str, centroids: list[list[float]]) -> Column:
    """(squared-L2, code) argmin over a subspace codebook — deterministic
    tie-break on the lower code id via lexicographic struct min.

    ``sv`` is a SQL fragment; one parse replaces per-entry py4j literal
    construction (see ``_centroid_sims``) with bit-identical folds."""
    entries = ", ".join(
        "named_struct('d', aggregate(zip_with({sv},{lit},(a, b) -> (a - b) * (a - b)),"
        " 0.0D, (acc, x) -> acc + x), 'i', {i})".format(sv=sv, lit=_vec_sql(c), i=i)
        for i, c in enumerate(centroids)
    )
    return F.expr(f"array_min(array({entries})).i")


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train per-subspace PQ codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search") with Lloyd's k-means as
    DataFrame ops.

    One corpus scan per iteration trains ALL m subspaces: each row
    explodes to m (subspace, code, subvector) tuples, one groupBy
    computes per-(subspace, code) means, and only m × n_codes × (dim/m)
    floats reach the driver.  Deterministic init: the n_codes
    lowest-id vectors.  At 100 TB, train on corpus.sample(...) and
    encode the full corpus once (map-only).
    """
    seed = (
        corpus.select(id_col, as_double(F.col(vec_col)).alias("v"))
        .orderBy(id_col)
        .limit(n_codes)
        .collect()
    )
    dim = len(seed[0]["v"])
    if dim % m:
        raise ValueError(
            f"pq_train: embedding dim {dim} is not divisible by m={m} — the "
            f"trailing {dim % m} dimensions would be silently dropped from "
            f"codebooks and ADC scoring"
        )
    dsub = dim // m
    books = [
        [list(r["v"])[s * dsub : (s + 1) * dsub] for r in seed] for s in range(m)
    ]
    for _ in range(iterations):
        v = corpus.select(as_double(F.col(vec_col)).alias("v"))
        parts = []
        for s in range(m):
            sv = F.slice(F.col("v"), s * dsub + 1, dsub)
            parts.append(
                F.struct(
                    F.lit(s).alias("s"),
                    _sub_argmin_l2(
                        f"slice(v, {s * dsub + 1}, {dsub})", books[s]
                    ).alias("code"),
                    sv.alias("sv"),
                )
            )
        ex = v.select(F.explode(F.array(*parts)).alias("e")).select(
            "e.s", "e.code", "e.sv"
        )
        stats = ex.groupBy("s", "code").agg(
            *[F.avg(F.col("sv")[i]).alias(f"c{i}") for i in range(dsub)]
        )
        for r in stats.collect():
            books[r["s"]][r["code"]] = [float(r[f"c{i}"]) for i in range(dsub)]
    return books


def pq_encode(
    df: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only PQ encoding: each vector becomes m small codes.

    This is the 100 TB lever: the code table is dim/m × smaller than the
    raw embeddings (64 floats → 4 codes here), so the ANN scan reads a
    compact table and the raw vectors are touched only for the final
    re-rank shortlist.
    """
    m = len(books)
    dsub = len(books[0][0])
    _check_pq_dim(df, m, dsub, vec_col)
    v = _as_double_sql(vec_col)
    codes = F.array(
        *[
            _sub_argmin_l2(f"slice({v}, {s * dsub + 1}, {dsub})", books[s])
            for s in range(m)
        ]
    )
    return df.select(F.col(id_col), codes.alias("pq_codes"))


def _check_pq_dim(df: DataFrame, m: int, dsub: int, vec_col: str) -> None:
    """Fail fast when the embedding dim ≠ m×dsub: a longer vector would
    silently drop its trailing dims from codebooks and ADC scoring while
    the exact re-rank uses full vectors (silent accuracy loss).  One
    LIMIT-1 scan — negligible next to the encode pass it guards."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is not None and row["d"] != m * dsub:
        raise ValueError(
            f"pq_encode: embedding dim {row['d']} != m*dsub = {m}*{dsub} — "
            f"codebooks do not cover the vector"
        )


def _adc_exprs(books: list[list[list[float]]]) -> tuple[Column, Column]:
    """(approx dot, reconstructed squared norm) ADC expressions over
    columns ``qv`` (query vector) and ``pq_codes``: sum_s q_s ·
    books[s][code_s] — JVM-side fold; the classic per-query LUT is an
    engine micro-optimization of this same expression.  Shared by
    ``pq_topk`` and ``ivf_pq_topk`` so their scoring is expression-
    identical."""
    m = len(books)
    dsub = len(books[0][0])
    approx = "0.0D"
    recon_sq = "0.0D"
    for s in range(m):
        book_lit = "array(" + ",".join(_vec_sql(c) for c in books[s]) + ")"
        cent = (
            f"element_at({book_lit}, "
            f"cast(element_at(pq_codes, {s + 1}) + 1 as int))"
        )
        qs = f"slice(qv, {s * dsub + 1}, {dsub})"
        approx = (
            f"({approx} + aggregate(zip_with({qs},{cent},(a, b) -> a * b), "
            f"0.0D, (x, y) -> x + y))"
        )
        recon_sq = (
            f"({recon_sq} + aggregate({cent}, 0.0D, (x, c2) -> x + c2 * c2))"
        )
    return F.expr(approx), F.expr(recon_sq)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]] | None = None,
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    np_encode: bool = False,
    codes: DataFrame | None = None,
    np_adc: bool = False,
) -> DataFrame:
    """PQ-ADC shortlist + exact re-rank top-k (the production ANN shape:
    IVF-PQ minus the IVF cells, which ``ivf_topk`` already covers).
    ``np_adc=True`` swaps the shortlist phase for the Arrow LUT scorer
    (``pq_adc_shortlist_np``: map-side per-batch top-k, bit-identical
    scores, no corpus-wide window sort) — the 100 TB scan shape; falls
    back to the expression path past 1024 queries (the LUTs ride in
    the task closure).

    Phase 1 scores every corpus CODE row against the broadcast queries
    with the asymmetric distance (query subvector · reconstructed
    centroid), keeping ``shortlist`` candidates per query — the scan
    reads only (id, m codes).  Phase 2 joins the shortlist back to the
    raw vectors and exact-ranks the final k.  With an adequate
    shortlist the result EQUALS exact brute force (hash-checked against
    the brute-force oracle); recall/shortlist is the documented knob.
    Pass a precomputed ``codes`` (id, pq_codes) frame to skip the
    encode pass — the encode is the dominant corpus scan, and a caller
    grading several PQ variants (``recall_report``) should pay it once.
    """
    if books is None:
        books = pq_train(corpus, id_col=id_col, vec_col=vec_col)
    m = len(books)
    dsub = len(books[0][0])
    if codes is None:
        encode = pq_encode_np if np_encode else pq_encode
        codes = encode(corpus, books, id_col=id_col, vec_col=vec_col)
    q = _with_norm(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        ),
        "qv",
    )
    q_rows = q.limit(1025).collect() if np_adc else None
    if np_adc and len(q_rows) <= 1024:
        short = pq_adc_shortlist_np(
            codes,
            books,
            [(r["query_id"], list(r["qv"])) for r in q_rows],
            shortlist,
            id_col=id_col,
        )
    else:
        approx, recon_sq = _adc_exprs(books)
        scored = (
            codes.crossJoin(F.broadcast(q))
            .where(F.col(id_col) != F.col("query_id"))
            .select(
                "query_id",
                F.col(id_col).alias("neighbor_id"),
                (approx / F.sqrt(recon_sq)).alias("adc_score"),
            )
        )
        w_short = Window.partitionBy("query_id").orderBy(
            F.col("adc_score").desc(), F.col("neighbor_id").asc()
        )
        short = (
            scored.withColumn("r", F.row_number().over(w_short))
            .where(F.col("r") <= shortlist)
            .select("query_id", "neighbor_id")
        )
    # exact re-rank on the shortlist only
    c = _with_norm(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
        ),
        "cv",
    )
    exact = (
        short.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cos_pre("cv", "qv"), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cos_sim",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def centroid_arrays(
    corpus: DataFrame,
    partition_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(label, cv) cell-centroid arrays from ``label_centroids``'s long
    format — integer-scaled means rounded to 6dp, so both engines build
    bit-identical centroid vectors."""
    lc = label_centroids(corpus, partition_col, vec_col)
    return lc.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim_idx", "centroid"))),
            lambda s: s["centroid"],
        ).alias("cv")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    k: int = 5,
    nprobe: int = 2,
    shortlist: int = 50,
    partition_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    np_encode: bool = False,
    codes: DataFrame | None = None,
    np_adc: bool = False,
) -> DataFrame:
    """IVF-PQ ANN — the production composite (FAISS ``IVFPQ`` layout):
    coarse cell pruning THEN compact-code ADC scanning THEN exact
    re-rank.

    Phase 0 ranks cells per query by centroid cosine and keeps
    ``nprobe`` of them (the coarse quantizer; cells here are the
    pre-assigned ``partition_col``, swap in ``ivf_train`` assignments in
    production).  Phase 1 ADC-scores ONLY the probed cells' code rows —
    an equi-join on the cell id, so the scan cost is
    nprobe/n_cells × the PQ-only scan and the corpus is never
    broadcast.  Phase 2 exact-ranks the shortlist against raw vectors.
    At 100 TB: corpus laid out partitioned by cell, codes 16× smaller
    than vectors → each query touches nprobe partitions of a compact
    table.  Deterministic with seeded books + label cells, so the
    DuckDB oracle replays it value-for-value (``s_ivf_pq_topk``);
    recall vs nprobe is graded by ``s_recall_report``'s pattern."""
    cents = _with_norm(centroid_arrays(corpus, partition_col, vec_col), "cv")
    q = _with_norm(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        ),
        "qv",
    )
    cell = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "label", _cos_pre("cv", "qv").alias("cs")
    )
    w_cell = Window.partitionBy("query_id").orderBy(
        F.col("cs").desc(), F.col("label").asc()
    )
    probed = (
        cell.withColumn("r", F.row_number().over(w_cell))
        .where(F.col("r") <= nprobe)
        .select("query_id", "label")
    )

    if codes is None:
        encode = pq_encode_np if np_encode else pq_encode
        codes = encode(corpus, books, id_col=id_col, vec_col=vec_col)
    cand = corpus.select(
        F.col(partition_col).alias("label"), F.col(id_col).alias("neighbor_id")
    ).join(codes.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id")
    q_rows = q.limit(1025).collect() if np_adc else None
    if np_adc and len(q_rows) <= 1024:
        # probed cells already bound the candidates; the Arrow LUT
        # scorer replaces the deep codegen expression row-for-row
        rows = probed.join(cand, "label").where(
            F.col("neighbor_id") != F.col("query_id")
        )
        scored = _adc_score_rows_np(
            rows, books, [(r["query_id"], list(r["qv"])) for r in q_rows]
        )
    else:
        approx, recon_sq = _adc_exprs(books)
        scored = (
            probed.join(cand, "label")
            .join(F.broadcast(q), "query_id")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                (approx / F.sqrt(recon_sq)).alias("adc_score"),
            )
        )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    short = (
        scored.withColumn("r", F.row_number().over(w_short))
        .where(F.col("r") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    c = _with_norm(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
        ),
        "cv",
    )
    exact = short.join(c, "neighbor_id").join(F.broadcast(q), "query_id").select(
        "query_id",
        "neighbor_id",
        F.round(_cos_pre("cv", "qv"), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cos_sim",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def pq_encode_np(
    df: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched PQ encoding — the 100 TB encode pass.

    Same argmin-L2 arithmetic as ``pq_encode`` with the SAME float
    evaluation order (squared terms accumulated dimension-ascending into
    a running sum, ties to the lowest code), so the codes are
    bit-identical to the expression form — pinned in tests and proven by
    the s_pq_topk oracle hash-match.  ~10× faster than the 128-fold
    Catalyst expression tree at encode time.
    """
    import numpy as np
    import pandas as pd

    m = len(books)
    dsub = len(books[0][0])
    _check_pq_dim(df, m, dsub, vec_col)
    bks = [np.asarray(b, dtype=np.float64) for b in books]

    def _mapper(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            v = np.stack(
                pdf[vec_col].map(lambda x: np.asarray(x, dtype=np.float64)).to_numpy()
            )
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for s in range(m):
                sub = v[:, s * dsub : (s + 1) * dsub]
                d = np.zeros((len(pdf), bks[s].shape[0]))
                for j in range(dsub):
                    diff = sub[:, j][:, None] - bks[s][None, :, j]
                    d += diff * diff
                codes[:, s] = np.argmin(d, axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "pq_codes": list(codes)})

    return df.mapInPandas(_mapper, f"{id_col} long, pq_codes array<bigint>")


def _adc_luts(books, q_rows):
    """Per-query ADC lookup tables + per-(subspace, code) reconstructed
    squared norms, replaying ``_adc_exprs``'s EXACT float evaluation
    order (left-to-right folds starting at 0.0, in Python IEEE doubles
    = JVM doubles), so LUT-based scores are bit-identical to the
    expression form.  This is the classic PQ-ADC LUT: one m×n_codes
    table per query replaces the per-row dot products."""
    m = len(books)
    dsub = len(books[0][0])
    luts = {}
    for qid, qv in q_rows:
        lut = [[0.0] * len(books[s]) for s in range(m)]
        for s in range(m):
            qs = qv[s * dsub : (s + 1) * dsub]
            for c, cent in enumerate(books[s]):
                acc = 0.0
                for i in range(dsub):
                    acc = acc + qs[i] * cent[i]
                lut[s][c] = acc
        luts[qid] = lut
    recon = [[0.0] * len(books[s]) for s in range(m)]
    for s in range(m):
        for c, cent in enumerate(books[s]):
            r = 0.0
            for x in cent:
                r = r + x * x
            recon[s][c] = r
    return luts, recon


def pq_adc_shortlist_np(
    codes_df: DataFrame,
    books: list[list[list[float]]],
    q_rows: list[tuple],
    shortlist: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Map-side PQ-ADC shortlist: each Arrow batch scores its code rows
    against ALL queries via the per-query LUT (one add per subspace)
    and emits only its LOCAL top-``shortlist`` per query; a final tiny
    window over |queries| × shortlist × n_batches rows picks the global
    shortlist.

    This is the 100 TB candidate-generation shape: no corpus-sized
    crossJoin output, no full-corpus window sort — per-partition top-k
    then a bounded reduce (the TakeOrderedAndProject pattern,
    per-query).  Scores are bit-identical to the ``_adc_exprs``
    expression path (``_adc_luts`` replays its fold order; numpy
    elementwise adds keep the per-row IEEE sequence), and the global
    top-N is provably inside the union of per-batch top-Ns, so the
    selected ids equal the window-over-everything form — pinned by
    ``test_np_adc_shortlist_matches_expression_path``.
    Returns (query_id, neighbor_id) shortlist rows.
    """
    import numpy as np
    import pandas as pd

    luts, recon = _adc_luts(books, q_rows)
    m = len(books)
    np_luts = {qid: [np.asarray(l, dtype=np.float64) for l in lut]
               for qid, lut in luts.items()}
    np_recon = [np.asarray(r, dtype=np.float64) for r in recon]

    def _mapper(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.stack(
                pdf["pq_codes"].map(lambda x: np.asarray(x, dtype=np.int64))
            )
            ids = pdf[id_col].to_numpy()
            recon_vec = np.zeros(len(pdf))
            for s in range(m):
                recon_vec = recon_vec + np_recon[s][codes[:, s]]
            denom = np.sqrt(recon_vec)
            out_q, out_n, out_s = [], [], []
            for qid, lut in np_luts.items():
                approx = np.zeros(len(pdf))
                for s in range(m):
                    approx = approx + lut[s][codes[:, s]]
                adc = approx / denom
                mask = ids != qid
                cand_ids, cand_adc = ids[mask], adc[mask]
                if len(cand_ids) > shortlist:
                    # exact (score desc, id asc) order; stable lexsort
                    top = np.lexsort((cand_ids, -cand_adc))[:shortlist]
                else:
                    top = np.arange(len(cand_ids))
                out_q.extend([qid] * len(top))
                out_n.extend(cand_ids[top])
                out_s.extend(cand_adc[top])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "adc_score": out_s}
            )

    local = codes_df.mapInPandas(
        _mapper, "query_id long, neighbor_id long, adc_score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= shortlist)
        .select("query_id", "neighbor_id")
    )


def _adc_score_rows_np(
    df: DataFrame,
    books: list[list[list[float]]],
    q_rows: list[tuple],
) -> DataFrame:
    """Arrow LUT scorer for PRE-JOINED candidate rows (query_id,
    neighbor_id, pq_codes) — the IVF-PQ variant, where cell probing has
    already bounded the candidates so each row scores against ITS
    query's LUT.  Same bit-exact float order as ``_adc_exprs``.
    Returns the frame with ``adc_score`` added."""
    import numpy as np
    import pandas as pd

    luts, recon = _adc_luts(books, q_rows)
    m = len(books)
    np_luts = {qid: [np.asarray(l, dtype=np.float64) for l in lut]
               for qid, lut in luts.items()}
    np_recon = [np.asarray(r, dtype=np.float64) for r in recon]

    def _mapper(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.stack(
                pdf["pq_codes"].map(lambda x: np.asarray(x, dtype=np.int64))
            )
            recon_vec = np.zeros(len(pdf))
            for s in range(m):
                recon_vec = recon_vec + np_recon[s][codes[:, s]]
            approx = np.zeros(len(pdf))
            qids = pdf["query_id"].to_numpy()
            for qid in np.unique(qids):
                mask = qids == qid
                lut = np_luts[qid]
                part = np.zeros(mask.sum())
                for s in range(m):
                    part = part + lut[s][codes[mask, s]]
                approx[mask] = part
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "adc_score": approx / np.sqrt(recon_vec),
                }
            )

    return df.select("query_id", "neighbor_id", "pq_codes").mapInPandas(
        _mapper, "query_id long, neighbor_id long, adc_score double"
    )


# --------------------------------------------------------------------------
# persisted IVF index: build once, probe with file-level partition pruning
# --------------------------------------------------------------------------
def ivf_write_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize a trained IVF index on disk: the assigned corpus
    written ``partitionBy("cell")`` plus the centroid table under
    ``<path>/_centroids``.

    This is what makes IVF pay off at 100 TB: a probe of ``nprobe``
    cells becomes a scan of only those cells' DIRECTORIES — Spark's
    partition pruning skips every other file before a single byte is
    read (asserted via scan PartitionFilters in tests).  Build cost is
    one map-only assignment pass + one partitioned write; rebuilds are
    per-cell replaceable.
    """
    assigned = ivf_assign(corpus, centroids, vec_col=vec_col)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    spark = corpus.sparkSession
    # "_"-prefixed subdirectories are invisible to the data-file listing,
    # so the centroid table can live inside the index directory
    cent_rows = [(i, [float(v) for v in c]) for i, c in enumerate(centroids)]
    spark.createDataFrame(cent_rows, "cell int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(path.rstrip("/") + "/_centroids")


def ivf_append_index(
    batch: DataFrame,
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Incrementally add vectors to a persisted IVF index: assign the
    batch against the STORED centroids (no retraining) and append into
    the matching ``cell=`` partition directories.

    This is the index-maintenance path for a continuously-ingesting
    corpus — build cost O(|batch|), existing cell files untouched, and
    probes keep pruning at the file level.  Centroids drift as the
    corpus grows; rebuild with ``ivf_train`` + ``ivf_write_index`` when
    recall degrades (``recall_report`` is the gauge), exactly like a
    FAISS index re-train.  New cells never appear (assignment is argmax
    over the stored centroid table), so the partition layout is stable.
    """
    spark = batch.sparkSession
    centroids = ivf_read_centroids(spark, path)
    assigned = ivf_assign(batch, centroids, vec_col=vec_col)
    assigned.write.mode("append").partitionBy("cell").parquet(path)


def ivf_read_centroids(spark, path: str) -> list[list[float]]:
    rows = (
        spark.read.parquet(path.rstrip("/") + "/_centroids")
        .orderBy("cell")
        .collect()
    )
    return [list(r.centroid) for r in rows]


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k against a PERSISTED IVF index: probe each
    query's ``nprobe`` nearest cells and scan only those partitions.

    The probed-cell filter is a plain equi-join on the partition column,
    so Catalyst pushes it into the scan as a PartitionFilter (dynamic
    partition pruning when the probe set is a runtime relation) — the
    index directory's other cells are never opened.  Results equal
    ``ivf_topk`` with the same centroids (pinned in tests).
    """
    centroids = ivf_read_centroids(spark, path)
    corpus = spark.read.parquet(path)
    c = _with_norm(
        corpus.select(
            "cell",
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("cv"),
        ),
        "cv",
    )
    probes = _with_norm(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        ),
        "qv",
    ).withColumn(
        "cell",
        F.explode(
            F.transform(
                F.slice(
                    F.reverse(F.array_sort(_centroid_sims("qv", centroids))),
                    1,
                    nprobe,
                ),
                lambda s: s["i"],
            )
        ),
    )
    joined = c.join(F.broadcast(probes), on="cell").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(_cos_pre("cv", "qv"), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank")
        )
    )


def hard_negatives_indexed(
    spark,
    path: str,
    queries: DataFrame,
    nprobe: int = 2,
    k: int = 5,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining against a PERSISTED IVF index
    (``ivf_write_index`` keeps every corpus column, so the label rides
    in the index): probe each query's ``nprobe`` nearest cells, scan
    ONLY those ``cell=`` partition directories (PartitionFilters at
    the file level), and keep the top-k label-mismatched neighbors —
    ``hard_negatives(centroids=...)`` with the assignment pass already
    paid at index-build time.  Equals the in-memory IVF path with the
    same centroids (pinned in tests).
    """
    centroids = ivf_read_centroids(spark, path)
    c = _with_norm(
        spark.read.parquet(path).select(
            "cell",
            F.col(id_col).alias("neighbor_id"),
            F.col(label_col).alias("neighbor_label"),
            as_double(F.col(vec_col)).alias("cv"),
        ),
        "cv",
    )
    q = _with_norm(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(label_col).alias("query_label"),
            as_double(F.col(vec_col)).alias("qv"),
        ),
        "qv",
    ).withColumn(
        "cell",
        F.explode(
            F.transform(
                F.slice(
                    F.reverse(F.array_sort(_centroid_sims("qv", centroids))),
                    1,
                    nprobe,
                ),
                lambda s: s["i"],
            )
        ),
    )
    joined = c.join(q, on="cell").where(
        F.col("neighbor_label") != F.col("query_label")
    )
    scored = joined.select(
        "query_id",
        "query_label",
        "neighbor_id",
        "neighbor_label",
        F.round(_cos_pre("cv", "qv"), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            "cos_sim",
            F.col("rank").cast("long").alias("rank"),
        )
    )
