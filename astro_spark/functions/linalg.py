"""Distributed dense linear algebra over embedding columns: Gram /
covariance matrices and PCA.

Beyond-reference surface (the reference — an Airflow ELT SDK — has no
vector math; this layer serves the training-data pipeline the engine
targets: whitening, dimensionality reduction before ANN, drift
detection through spectral summaries).

Scale story (the classic tall-skinny pattern): a corpus of n vectors of
dimension d has an n×d design matrix that never materializes anywhere —
only the d×d Gram matrix G = Σ xᵀx is ever reduced, and d is small
(10²–10³) while n is huge (10⁹⁺ at 100 TB).  Two physical paths:

- ``gram_matrix``: pure JVM — posexplode the vector once (n·d rows),
  multiply each element against the whole vector with ``transform``,
  posexplode again, and groupBy (i, j).  Partial aggregation combines
  map-side, so the single shuffle carries only d² groups per task.
  Exact and oracle-reproducible; the n·d² intermediate row count makes
  it the small-d path (d ≤ a few hundred).
- ``gram_matrix_np``: Arrow ``mapInPandas`` computes one d×d partial
  Gram per batch with one BLAS ``X.T @ X`` call, then d² tiny rows
  reduce.  Same single-shuffle shape with the n·d² blow-up replaced by
  (#batches)·d² — the 100 TB path for any d.

PCA then eigendecomposes the d×d Gram ON THE DRIVER (numpy ``eigh`` on
a d×d symmetric matrix is microseconds; nothing corpus-sized ever
leaves the executors) and projection back onto the corpus is a map-only
broadcast product — the standard big-data PCA factorization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import as_double, spread_narrow_input


def _vec(df: DataFrame, vec_col: str):
    return as_double(F.col(vec_col))


def _dim_and_means(df: DataFrame, vec_col: str) -> tuple[int, list[float]]:
    """(d, column means) in two bounded actions; clear error on empty
    input (a bare ``.first()["d"]`` raised an opaque TypeError —
    ADVICE r7)."""
    row = df.select(F.size(_vec(df, vec_col)).alias("d")).first()
    if row is None:
        raise ValueError(f"empty input: no rows with a {vec_col!r} vector")
    d = row["d"]
    means = df.agg(
        *[F.avg(_vec(df, vec_col)[i]).alias(f"m{i}") for i in range(d)]
    ).first()
    return d, [float(means[i]) for i in range(d)]


def gram_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    center: bool = False,
    scale: int | None = None,
    dim_means: tuple[int, list[float]] | None = None,
) -> DataFrame:
    """d×d Gram matrix ``G[i][j] = Σ_rows v[i]·v[j]`` as (i, j, g) rows.

    ``center=True`` subtracts the column means first (G becomes n·cov);
    pass precomputed ``dim_means=(d, means)`` to skip the two stats
    passes when the caller already has them (``pca_train`` does).
    Pure built-in functions; ONE shuffle of d² groups (partials combine
    map-side).  With ``scale`` set, every product is quantized to
    micro-unit integers (``floor(p·scale + .5)``) before the sum — an
    associative, shuffle-order-independent long sum that the DuckDB
    oracle reproduces bit-for-bit (the ``label_centroids`` portability
    contract), emitted as ``round(sum/scale, 6)``.
    """
    v = _vec(df, vec_col)
    if center:
        d, means = dim_means if dim_means is not None else _dim_and_means(
            df, vec_col
        )
        v = F.array(*[_vec(df, vec_col)[i] - F.lit(float(means[i])) for i in range(d)])
    # the double posexplode multiplies rows n·d² — widen a narrow scan
    # first so the generate stage parallelizes (guide §2.5; quantized
    # sums are integer-associative, so the result is partition-order
    # independent; the unquantized double sum never had a guaranteed
    # order to begin with)
    prods = (
        spread_narrow_input(df)
        .select(v.alias("v"))
        .select(F.posexplode("v").alias("i", "x"), F.col("v"))
        .select(
            "i",
            F.posexplode(F.transform("v", lambda y: F.col("x") * y)).alias(
                "j", "p"
            ),
        )
    )
    if scale is not None:
        return prods.groupBy("i", "j").agg(
            F.round(
                F.sum(
                    F.floor(F.col("p") * scale + F.lit(0.5)).cast("long")
                ).cast("double")
                / scale,
                6,
            ).alias("g")
        )
    return prods.groupBy("i", "j").agg(F.sum("p").alias("g"))


def gram_matrix_long(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Quantized Gram PARTIAL as raw long sums (i, j, s) — the additive
    form: partials from any split of the corpus sum to exactly the full
    corpus's values (integer associativity), which is what lets a
    streaming drain maintain a Gram/covariance state table through the
    generic ``aggregate_mv_stream`` sums-of-sums contract.  Read the
    matrix back as ``round(s / scale, 6)`` (= ``gram_matrix(scale=)``).
    """
    v = _vec(df, vec_col)
    return (
        spread_narrow_input(df)  # see gram_matrix: parallelize the n·d² generate
        .select(v.alias("v"))
        .select(F.posexplode("v").alias("i", "x"), F.col("v"))
        .select(
            "i",
            F.posexplode(F.transform("v", lambda y: F.col("x") * y)).alias(
                "j", "p"
            ),
        )
        .groupBy("i", "j")
        .agg(
            F.sum(F.floor(F.col("p") * scale + F.lit(0.5)).cast("long")).alias(
                "s"
            )
        )
    )


def gram_matrix_np(
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow twin of ``gram_matrix``: one BLAS ``X.T @ X`` per record
    batch, d² partial rows per batch, one d²-group reduce.  The 100 TB
    path (no n·d² row blow-up; identical result up to float order)."""
    import pandas as pd

    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    schema = StructType(
        [
            StructField("i", IntegerType()),
            StructField("j", IntegerType()),
            StructField("g", DoubleType()),
        ]
    )

    def partial(batches):
        import numpy as np

        acc = None
        for pdf in batches:
            x = np.asarray(
                [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
            )
            if x.size == 0:
                continue
            g = x.T @ x
            acc = g if acc is None else acc + g
        if acc is not None:
            d = acc.shape[0]
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "g": acc.ravel()}
            )

    return (
        df.select(vec_col)
        .mapInPandas(partial, schema)
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
    )


def pca_train(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
) -> dict:
    """Top-``k`` principal components from the centered Gram matrix.

    Distributed part: one ``gram_matrix(center=True)`` pass (d² rows to
    the driver) — the (d, means) stats computed here are THREADED into
    it, not recomputed (three full corpus passes saved; ADVICE r7).
    Driver part: numpy ``eigh`` on the d×d symmetric matrix.  Returns
    ``{"components": k×d, "explained_variance": k, "mean": d}``
    (components sign-canonicalized: largest-|coeff| entry positive, so
    results are deterministic up to float noise).
    """
    import numpy as np

    d, means_l = _dim_and_means(df, vec_col)
    n = df.count()
    mean = np.array(means_l)
    g = np.zeros((d, d))
    for r in gram_matrix(
        df, vec_col, center=True, dim_means=(d, means_l)
    ).collect():
        g[r["i"], r["j"]] = r["g"]
    evals, evecs = np.linalg.eigh(g / max(n - 1, 1))
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k×d
    for c in comps:  # canonical sign: peak coefficient positive
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return {
        "components": comps.tolist(),
        "explained_variance": evals[order].tolist(),
        "mean": mean.tolist(),
    }


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pc",
) -> DataFrame:
    """Map-only projection ``(v - mean) @ componentsᵀ`` (the k×d model
    travels inside the plan as literals — broadcast-free, no shuffle)."""
    mean = model["mean"]
    comps = model["components"]
    centered = F.array(
        *[
            _vec(df, vec_col)[i] - F.lit(float(mean[i]))
            for i in range(len(mean))
        ]
    )
    projs = [
        F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(x)) for x in comp]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for comp in comps
    ]
    return df.withColumn(out_col, F.array(*projs))


def gram_state_long(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Full second-moment state as ONE additive (i, j, s) frame:

    - ``(i, j, s)`` with ``i, j ≥ 0`` — quantized Gram long sums;
    - ``(i, -1, s)`` — per-dimension quantized value sums (→ mean);
    - ``(-1, -1, n)`` — row count.

    Everything is an integer sum, so state from any corpus split adds
    to the full-corpus state exactly — drained through
    ``aggregate_mv_stream`` this maintains all the sufficient
    statistics of PCA incrementally, and ``pca_from_state`` refreshes
    components from the ≤(d²+d+1)-row state without rescanning the
    corpus (incremental PCA, exact — not the approximate streaming-PCA
    update).
    """
    v = _vec(df, vec_col)
    gram = gram_matrix_long(df, vec_col, scale)
    sums = (
        df.select(F.posexplode(v).alias("i", "x"))
        .groupBy("i")
        .agg(
            F.sum(F.floor(F.col("x") * scale + F.lit(0.5)).cast("long")).alias(
                "s"
            )
        )
        .select("i", F.lit(-1).alias("j"), "s")
    )
    cnt = df.agg(F.count(F.lit(1)).alias("s")).select(
        F.lit(-1).alias("i"), F.lit(-1).alias("j"), "s"
    )
    return gram.unionByName(sums).unionByName(cnt)


def pca_from_state(
    state_rows,
    k: int,
    scale: int = 1_000_000,
) -> dict:
    """Principal components from a ``gram_state_long`` state (rows or
    a DataFrame): covariance = (G/scale² − n·mean·meanᵀ·(1/scale²…))
    assembled driver-side from the ≤(d²+d+1)-row state, then the same
    ``eigh`` + sign canonicalization as ``pca_train``.  Quantization
    means the result matches ``pca_train`` to ~1/scale, not bit-for-bit
    — pinned with that tolerance in tests.
    """
    import numpy as np

    if hasattr(state_rows, "collect"):
        state_rows = state_rows.collect()
    n = None
    sums = {}
    gram = {}
    for r in state_rows:
        i, j, s = r["i"], r["j"], r["s"]
        if i == -1 and j == -1:
            n = int(s)
        elif j == -1:
            sums[i] = int(s)
        else:
            gram[(i, j)] = int(s)
    if not n:
        raise ValueError("pca_from_state: empty state (no count row)")
    d = max(sums) + 1
    g = np.zeros((d, d))
    for (i, j), s in gram.items():
        g[i, j] = s / scale
    mean = np.array([sums[i] / scale / n for i in range(d)])
    cov = (g - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return {
        "components": comps.tolist(),
        "explained_variance": evals[order].tolist(),
        "mean": mean.tolist(),
    }
