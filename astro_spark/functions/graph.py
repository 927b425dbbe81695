"""Graph analytics over pair/edge relations — DataFrame-native, exact.

The dedup family emits EDGES (near-dup pairs, similarity pairs); the
pipeline steps that consume them need per-node graph signals beyond
connected components (``dedup.dup_clusters``): a centrality score to
pick the canonical document of a cluster ("the page everything copies"
rather than "the lowest id"), or to down-weight hub-like boilerplate.

Everything here is fixed-point INTEGER arithmetic: BIGINT sums are
order-independent, so results are bit-identical under any partitioning
and replayable by any engine — float PageRank would differ in the last
ulp between runs (partition-order float sums) and break exact oracle
checks.

Scale notes: one key-shuffle join + one groupBy per iteration, working
set = nodes with ≥1 edge (the duplicate subgraph, a tiny fraction of a
deduped corpus); iteration count is a small constant, not data-driven.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_SCALE = 10**12  # total rank mass, split exactly between nodes


def pagerank(
    pairs: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Undirected PageRank over a pair relation, in exact integer
    fixed-point: rank mass starts at ``PAGERANK_SCALE DIV n`` per node
    and each round every node keeps ``(100-damping_pct)%`` of the
    uniform share plus ``damping_pct%`` of the floor-divided mass its
    neighbors push along their edges:

        r'(v) = (100-d)·(S DIV n) DIV 100
              + d·Σ_{u~v} (r(u) DIV deg(u)) DIV 100

    All operations are BIGINT (floor division, integer sums), so the
    result is independent of partitioning and row order — unlike float
    PageRank — and an oracle can replay it exactly with unrolled SQL.
    Mass lost to floor rounding is not redistributed (ranking order is
    what matters, not the exact sum).

    Input: (id_a, id_b) edges, e.g. ``minhash_lsh_pairs`` output.  The
    graph is symmetrized internally; self-loops and duplicate edges are
    dropped.  Returns (node, rank) with rank in PAGERANK_SCALE units.
    """
    e = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).where(F.col("src") != F.col("dst"))
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    nodes = edges.select(F.col("src").alias("node")).distinct()
    # n and the uniform share are scalars of a tiny aggregate — the only
    # driver-side values in the loop
    n = nodes.count()
    share = PAGERANK_SCALE // max(n, 1)
    base = ((100 - damping_pct) * share) // 100

    # The loop builds ONE lazy plan (iterations is a small constant, so
    # the lineage is 5 join+agg stages deep — a normal plan size).  A
    # per-iteration eager localCheckpoint here cost one driver-blocking
    # job per round (profiled r14: ~0.15-0.3 s each locally, a full
    # scheduling barrier each on a cluster) and bought nothing: only
    # ``edges`` is reused across rounds, and it is already checkpointed.
    ranks = nodes.withColumn("rank", F.lit(share).cast("long"))
    for _ in range(iterations):
        contrib = (
            ranks.join(deg, ranks["node"] == deg["src"])
            .select(
                F.col("node").alias("u"),
                F.expr("rank DIV deg").alias("push"),
            )
            .join(edges, F.col("u") == edges["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("push").alias("inflow"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            F.expr(
                f"CAST({base} AS BIGINT) + "
                f"({damping_pct} * coalesce(inflow, 0)) DIV 100"
            ).alias("rank"),
        )
    return ranks


def cluster_canonical_by_rank(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
    iterations: int = 5,
) -> DataFrame:
    """Pick each duplicate cluster's canonical document by PageRank
    centrality (highest rank, node id as tie-break) instead of min-id:
    the most-connected variant is usually the origin everything else
    copies.  Composition: components from ``dedup.dup_clusters`` +
    ranks from ``pagerank`` + one per-cluster argmax window.

    Returns (doc_id, cluster_id, canonical_id).
    """
    from pyspark.sql.window import Window

    from .dedup import dup_clusters

    clusters = dup_clusters(pairs, all_ids, id_col=id_col)
    ranks = pagerank(pairs, iterations=iterations)
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("rank").desc(), F.col(id_col).asc()
    )
    ranked = (
        clusters.join(ranks, clusters[id_col] == ranks["node"], "left")
        .select(id_col, "cluster_id", F.coalesce("rank", F.lit(0)).alias("rank"))
        .withColumn("canonical_id", F.first(id_col).over(w))
    )
    return ranked.select(id_col, "cluster_id", "canonical_id")


def components_star(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — the O(log n)-round scale path beside ``dedup.
    dup_clusters``'s O(diameter) label propagation (equal outputs,
    pinned in tests; prefer this on long-chain graphs where diameter
    ≫ log n).

    Each round is two neighborhood-min passes over the edge relation:

    - large-star: every node points its LARGER neighbors at its
      neighborhood minimum — (v, m(u)) for v ∈ Γ(u), v > u,
      m(u) = min(Γ(u) ∪ {u});
    - small-star: every node and its smaller-or-equal neighbors link
      to that minimum — (v, m(u)) for v ∈ Γ(u) ∪ {u}, v ≤ u.

    Both emit strictly-decreasing parent links, so the edge relation
    contracts toward stars rooted at component minima; convergence is
    detected by an unchanged (count, BIGINT edge-checksum) pair — one
    tiny aggregate per round, no self-join diff.  Per round: two
    groupBy(node) shuffles; lineage localCheckpoint-truncated.

    Returns (id_col, cluster_id) for EVERY input id (singletons
    cluster with themselves) — the ``dup_clusters`` contract.
    """
    e = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")).where(
        F.col("id_a") != F.col("id_b")
    )
    edges = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )

    def _neigh_min(ed: DataFrame) -> DataFrame:
        # m(u) = min(Γ(u) ∪ {u}) per node, over the symmetric relation
        return ed.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )

    def _large_star(ed: DataFrame) -> DataFrame:
        m = _neigh_min(ed)
        return (
            ed.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )

    def _small_star(ed: DataFrame) -> DataFrame:
        m = _neigh_min(ed)
        to_min = ed.where(F.col("v") <= F.col("u")).join(m, "u").select(
            F.col("v").alias("a"), F.col("m").alias("b")
        )
        self_link = m.select(F.col("u").alias("a"), F.col("m").alias("b"))
        return (
            to_min.union(self_link)
            .where(F.col("a") != F.col("b"))
            .distinct()
        )

    def _sig(ed: DataFrame):
        row = ed.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("a") * F.lit(1_000_003) + F.col("b")).cast("decimal(38,0)")
            ).alias("s"),
        ).collect()[0]
        return (row["n"], row["s"])

    def _symmetric(ed: DataFrame) -> DataFrame:
        # both orientations from ONE pass over ed (r14, guide §1.2): the
        # former union of ed with its column-swapped SELF inlined the
        # whole upstream plan twice — each round evaluated large-star's
        # groupBy+join TWICE (once per union branch).  explode(array(
        # (a,b),(b,a))) reads each row once; same rows, then distinct.
        return (
            ed.select(
                F.explode(
                    F.array(
                        F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                        F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
                    )
                ).alias("e")
            )
            .select("e.u", "e.v")
            .distinct()
        )

    cur = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    prev_sig = None
    converged = False
    for _ in range(max_iterations):
        sym = _symmetric(cur)
        ls = _large_star(sym)
        cur = _small_star(_symmetric(ls)).localCheckpoint()
        sig = _sig(cur)
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # labels from a non-converged edge relation can be wrong with no
        # other signal — O(log n) rounds suffice in theory, so hitting
        # the cap means the cap is too low for this graph
        import warnings

        warnings.warn(
            f"components_star: (count, checksum) signature did not "
            f"stabilize within max_iterations={max_iterations}; labels "
            f"may be incorrect — raise max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )

    # converged: every edge links a node to its component minimum
    labels = (
        cur.select(F.col("a").alias("node"), F.col("b").alias("label"))
        .union(cur.select(F.col("b").alias("node"), F.col("b").alias("label")))
        .groupBy("node")
        .agg(F.min("label").alias("cluster_id"))
    )
    return (
        all_ids.select(F.col(id_col))
        .join(labels, all_ids[id_col] == labels["node"], "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )
