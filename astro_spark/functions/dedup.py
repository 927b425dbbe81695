"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

These are the beyond-reference LLM-training-data operators (BASELINE.json
north star).  Design-for-scale notes per operator:

- exact_dedup: one hash-shuffle on the text hash (group by a 62-bit
  fingerprint, not the full text, so shuffle rows are tiny; the full text
  comparison happens only within a fingerprint bucket).
- minhash_lsh_pairs: shingle→signature is a map-only projection (built-in
  higher-order functions, no UDF); candidate generation shuffles ONLY
  (band_id, band_hash, doc_id) tuples — the classic MinHash/LSH layout
  that scales linearly with corpus size instead of O(n²) all-pairs.
- simhash_pairs: 62-bit simhash per doc (map-only), then banding on
  bit-chunks (pigeonhole: pairs within hamming ≤ k share a chunk when
  k < chunks) → candidate join, exact hamming verify.
- ngram_jaccard_pairs: exact Jaccard via inverted-index join (explode
  shingles, join on shingle hash, count shared) — no approximation, one
  shuffle on shingle hash; skew-guarded by dropping ultra-common shingles
  (document-frequency cap) when requested.
- embedding near-dup: see similarity.py (hyperplane LSH).

All arithmetic is portable to the DuckDB oracle (see constants.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .constants import (
    CONTAINMENT_THRESHOLD,
    COSINE_DUP_THRESHOLD,
    LSH_BANDS,
    MINHASH_COEFFS,
    MINHASH_JACCARD_THRESHOLD,
    MINHASH_K,
    MULT1,
    MULT2,
    NGRAM_JACCARD_THRESHOLD,
    P31,
    SHINGLE_K,
    SIMHASH_CHUNKS,
    SIMHASH_MAX_HAMMING,
)
from .text import (
    _char_poly_hash_sql,
    _frag,
    _tokens_sql,
    char_poly_hash,
    fingerprint62,
    tokens,
)


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest id per distinct text.

    Groups on the 62-bit fingerprint + text (fingerprint prunes the
    shuffle comparison; text guards against collisions) and keeps
    min(id) — deterministic representative selection.
    """
    return (
        df.select(F.col(id_col), F.col(text_col), fingerprint62(text_col).alias("__fp"))
        .groupBy("__fp", text_col)
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .select(id_col, text_col, "dup_count")
    )


# --------------------------------------------------------------------------
# shingles + minhash
# --------------------------------------------------------------------------
def _shingle_sql(frag: str, k: int = SHINGLE_K) -> str:
    """SQL fragment of ``shingle_hash_array`` over fragment ``frag`` —
    same let-binding shape, same folds, bit-identical values."""
    tok_hashes = (
        f"transform({_tokens_sql(frag)}, "
        f"t -> {_char_poly_hash_sql('t', MULT1)})"
    )
    shingles = (
        "array_sort(array_distinct(transform("
        f"sequence(1, greatest(size(th) - {k - 1}, 1)), "
        f"i -> aggregate(slice(th, i, {k}), cast(0 as bigint), "
        f"(acc, h) -> (acc * {MULT2} + h) % {P31}))))"
    )
    return f"element_at(transform(array({tok_hashes}), th -> {shingles}), 1)"


def shingle_hash_array(text: Column | str, k: int = SHINGLE_K) -> Column:
    """Distinct, sorted hashes of the k-word shingles of ``text``.

    Two-level hashing: each token is char-poly-hashed ONCE (mod P31,
    mult MULT1), then a shingle hash folds its k token-hashes with MULT2.
    This is ~10× cheaper than hashing every shingle's characters (each
    char would otherwise be hashed k times) while staying exactly
    reproducible in the DuckDB oracle (oracles.shingle_hashes).

    A ``str`` input renders as ONE SQL parse (see ``text._frag``) — the
    Python-built twin costs ~2.5 s of py4j per construction and every
    minhash/containment query pays it; values are bit-identical.
    """
    frag = _frag(text) if isinstance(text, str) else None
    if frag is not None:
        return F.expr(_shingle_sql(frag, k))
    toks = tokens(text)
    tok_hashes = F.transform(toks, lambda t: char_poly_hash(t, MULT1))

    def _shingles(th: Column) -> Column:
        idx = F.sequence(
            F.lit(1), F.greatest(F.size(th) - F.lit(k - 1), F.lit(1))
        )
        return F.array_sort(
            F.array_distinct(
                F.transform(
                    idx,
                    lambda i: F.aggregate(
                        F.slice(th, i, k),
                        F.lit(0).cast("long"),
                        lambda acc, h: (acc * F.lit(MULT2) + h) % F.lit(P31),
                    ),
                )
            )
        )

    # let-binding trick: evaluate tok_hashes ONCE by passing it through a
    # single-element transform — Catalyst re-evaluates free subexpressions
    # inside lambda bodies on every iteration, but a lambda VARIABLE is
    # bound once
    return F.element_at(
        F.transform(F.array(tok_hashes), _shingles), 1
    )


def minhash_signature(shingle_hashes: Column | str) -> Column:
    """K-element MinHash signature: min_i over shingles of (a_i*x+b_i)%P.

    ``str`` input → one SQL parse for all K=32 permutations instead of
    ~200 py4j calls (bit-identical; see ``shingle_hash_array``)."""
    frag = _frag(shingle_hashes) if isinstance(shingle_hashes, str) else None
    if frag is not None:
        items = ",".join(
            f"array_min(transform({frag}, x -> (x * {a} + {b}) % {P31}))"
            for a, b in MINHASH_COEFFS
        )
        return F.expr(f"array({items})")
    sig = [
        F.array_min(
            F.transform(
                shingle_hashes,
                lambda x: (x * F.lit(a) + F.lit(b)) % F.lit(P31),
            )
        )
        for a, b in MINHASH_COEFFS
    ]
    return F.array(*sig)


def _band_hash(sig: Column | str, band: int, rows: int) -> Column:
    """Combine one band's signature rows into a single 31-bit hash."""
    frag = _frag(sig) if isinstance(sig, str) else None
    if frag is not None:
        acc = "cast(0 as bigint)"
        for r in range(rows):
            acc = (
                f"((({acc} * {MULT1}) + "
                f"element_at({frag}, {band * rows + r + 1})) % {P31})"
            )
        return F.expr(acc)
    acc = F.lit(0).cast("long")
    for r in range(rows):
        acc = (acc * F.lit(MULT1) + F.element_at(sig, band * rows + r + 1)) % F.lit(P31)
    return acc


def _spread(df: DataFrame) -> DataFrame:
    """Widen a narrow input before a heavy per-row projection (guide
    §2.5 input skew; profiled r14: 1.7-4.4 s single-task stages under
    the dedup heavies on single-row-group inputs).  Canonical helper:
    ``similarity.spread_narrow_input``."""
    from .similarity import spread_narrow_input

    return spread_narrow_input(df)


def _materialize_and_release(result: DataFrame, *bases: DataFrame) -> DataFrame:
    """Eagerly compute ``result`` while the persisted shingle/signature
    bases are live, then release the bases.

    The pair scans persist a corpus-sized base that 2–3 plan branches
    re-read (sizes + both sides of the self-join); leaving it cached
    after the call leaks the BIGGEST intermediate of the whole dedup
    until LRU eviction — in a long-lived ingest session those bases
    accumulate (ADVICE/VERDICT r7).  ``localCheckpoint`` runs the plan
    once NOW (every base consumer hits the cache), keeps only the
    OUTPUT-sized blocks (above-threshold pairs ≪ corpus), truncates
    lineage so nothing references the base afterwards, and the
    ContextCleaner frees the result blocks when the caller drops the
    frame.  On clusters with dynamic allocation prefer landing pairs in
    a table (localCheckpoint blocks die with their executor); local /
    static-executor runs — this engine's bench + streaming drains — are
    safe.
    """
    try:
        return result.localCheckpoint(eager=True)
    finally:
        for b in bases:
            b.unpersist()


def minhash_lsh_pairs(
    df: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = MINHASH_JACCARD_THRESHOLD,
    max_bucket_size: int | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact
    Jaccard over shingle sets.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 4.

    ``max_bucket_size`` (default off, exactness first) guards the
    web-scale pathology: a near-constant band — boilerplate pages,
    empty docs — puts O(n) members in ONE (band, hash) bucket and the
    self-join emits O(n²) candidate pairs from it.  With the cap set,
    buckets larger than the cap are dropped from candidate generation
    (their members usually co-occur in other, smaller bands; exact-dup
    floods belong to ``exact_dup_groups`` anyway).  Pinned by
    ``test_lsh_hot_bucket_cap``.

    ``signatures``: a PREBUILT (id, sh, band, bh) banding relation —
    what ``build_minhash_index`` persists — skips the shingle +
    signature pass AND the per-call eager-materialize trade entirely
    (the ``codes=`` pattern from ``pq_topk``): repeat callers — ingest
    sessions re-running the pair scan per drain, threshold sweeps —
    pay the corpus base ONCE at build time instead of one
    localCheckpoint per call (VERDICT r8 #5 watch-list).  The result is
    lazy over the caller's relation; pass exactly one of ``df`` /
    ``signatures`` (both or neither is a contract error).
    """
    if (df is None) == (signatures is None):
        raise ValueError(
            "minhash_lsh_pairs: pass exactly one of df= or signatures= "
            "(got both or neither)"
        )
    rows = MINHASH_K // LSH_BANDS
    if signatures is not None:
        base = None
        bands = signatures.select("id", "sh", "band", "bh")
    else:
        # materialize the signature table once: it is referenced by every
        # band AND by the verify join (3+ consumers); at scale this would
        # be a persisted table / shuffle-reused stage, locally a memory
        # cache
        base = (
            _spread(df)
            .select(
                F.col(id_col).alias("id"),
                shingle_hash_array(text_col).alias("sh"),
            )
            .withColumn("sig", minhash_signature("sh"))
            .persist()
        )

        bands = base.select(
            "id",
            "sh",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"), _band_hash("sig", b, rows).alias("bh")
                        )
                        for b in range(LSH_BANDS)
                    ]
                )
            ).alias("bk"),
        ).select("id", "sh", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))

    if max_bucket_size is not None:
        # same shuffle key as the self-join, so the window adds no extra
        # exchange shape at scale
        wb = Window.partitionBy("band", "bh")
        bands = (
            bands.withColumn("__bsz", F.count(F.lit(1)).over(wb))
            .where(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )

    left = bands.alias("l")
    right = bands.alias("r")
    cand = (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bh") == F.col("r.bh"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    out = (
        cand.withColumn("jaccard", F.round(inter / union, 4))
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )
    if base is None:
        return out  # lazy over the caller's persisted banding relation
    return _materialize_and_release(out, base)


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------
def simhash_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash) — 62-bit SimHash over whitespace tokens, weight = tf.

    bit_j(doc) = 1 iff Σ_tokens tf · (±1 from bit_j(h(token))) > 0, with
    h(token) = two 31-bit poly hashes concatenated.

    Implemented as explode → (id, token) tf counts → 62 conditional sums
    in ONE groupBy (map-side partial aggregation) — 62 tiny agg columns
    keep the Catalyst tree linear instead of nesting 62 array-aggregates,
    and the whole thing is two key-shuffles regardless of corpus size.
    """
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    tf = tok.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    h1 = char_poly_hash(F.col("tok"), MULT1)
    h2 = char_poly_hash(F.col("tok"), MULT2)
    hashed = tf.withColumn("h", h1 * F.lit(P31 + 1) + h2)
    # the 62 conditional sums and the 62-term bit fold render as SQL —
    # one parse instead of ~600 py4j calls (bit-identical; integer
    # arithmetic, same CASE/shift shapes)
    weights = [
        F.expr(
            f"sum(CASE WHEN (shiftright(h, {j}) & 1) = 1 "
            f"THEN tf ELSE -tf END)"
        ).alias(f"w{j}")
        for j in range(62)
    ]
    agg = hashed.groupBy("id").agg(*weights)
    sim = None
    for j in range(62):
        bit = (
            f"(CASE WHEN w{j} > 0 THEN cast({2 ** j} as bigint) "
            f"ELSE cast(0 as bigint) END)"
        )
        sim = bit if sim is None else f"({sim} + {bit})"
    return agg.select("id", F.expr(sim).alias("simhash"))


def hash_hamming_pairs(
    sig: DataFrame,
    id_col: str = "id",
    hash_col: str = "sh",
    max_hamming: int = SIMHASH_MAX_HAMMING,
    bits: int = 62,
    n_chunks: int = SIMHASH_CHUNKS,
    materialize: bool = True,
) -> DataFrame:
    """Generic banded hamming join over ANY ≤62-bit signature relation
    (id, hash): pairs share ≥1 of ``n_chunks`` bit-chunks AND hamming ≤
    ``max_hamming`` — the chunk-banding machinery behind
    ``simhash_pairs``, factored out so every 62-bit signature family
    (SimHash text, perceptual image aHash, any future audio
    fingerprint) gets the same linear candidate generation instead of
    an all-pairs join.

    Pigeonhole soundness requires ``n_chunks > max_hamming`` (else a
    pair could differ in every chunk and never band together) —
    enforced.  62-bit ceiling keeps the arithmetic in non-negative
    signed-long territory (bit 63 would flip the sign and break the
    shiftright/compare logic).  Returns (id_a, id_b, hamming) with
    id_a < id_b; eager, base released (the pair-scan persist contract).
    ``materialize=False`` returns the LAZY plan (no base persist, no
    checkpoint) for callers that need to inspect or re-execute it —
    the plan-property probes do (``containment_incremental_pairs``
    pattern).
    """
    if n_chunks <= max_hamming:
        raise ValueError(
            f"hash_hamming_pairs: n_chunks={n_chunks} must exceed "
            f"max_hamming={max_hamming} (pigeonhole soundness)"
        )
    if bits > 62:
        raise ValueError("hash_hamming_pairs: bits must be ≤ 62 (sign bit)")
    chunk_bits = bits // n_chunks + (1 if bits % n_chunks else 0)
    base = sig.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("sh")
    )
    if materialize:
        base = base.persist()
    chunks = base.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("sh"), c * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("ch"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select("id", "sh", F.col("ck.chunk").alias("chunk"), F.col("ck.ch").alias("ch"))

    l, r = chunks.alias("l"), chunks.alias("r")
    # hamming-filter and project BEFORE the pair-dedup exchange (r15,
    # guide §2.3 shuffle fewer bytes): hamming is a function of the pair
    # (identical from whichever chunk banded it), so candidates failing
    # the threshold die map-side and the dropDuplicates shuffle carries
    # (id_a, id_b, hamming) instead of two extra signature longs per
    # surviving candidate — same pair set, same values.
    hamming = F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh")))
    out = (
        l.join(
            r,
            on=[
                F.col("l.chunk") == F.col("r.chunk"),
                F.col("l.ch") == F.col("r.ch"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            hamming.cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= F.lit(max_hamming))
        .dropDuplicates(["id_a", "id_b"])
    )
    if not materialize:
        return out
    return _materialize_and_release(out, base)


def hash_hamming_incremental_pairs(
    batch_sigs: DataFrame,
    corpus_sigs: DataFrame,
    id_col: str = "id",
    hash_col: str = "sh",
    max_hamming: int = SIMHASH_MAX_HAMMING,
    bits: int = 62,
    n_chunks: int = SIMHASH_CHUNKS,
) -> DataFrame:
    """Ingest-time banded hamming screen: which BATCH signatures sit
    within ``max_hamming`` of an EXISTING corpus signature — the
    batch-vs-corpus form of ``hash_hamming_pairs`` (never
    |batch| × |corpus|: both sides chunk-band, candidates come from
    bucket co-occurrence, pigeonhole keeps it exact for
    max_hamming < n_chunks).  Works for ANY ≤62-bit signature family —
    text SimHash, image aHash, audio fingerprints — making perceptual
    screening a first-class member of the incremental screen family
    (exact anti-join / Bloom / MinHash / containment / this).
    Returns (batch_id, corpus_id, hamming).
    """
    if n_chunks <= max_hamming:
        raise ValueError(
            f"hash_hamming_incremental_pairs: n_chunks={n_chunks} must "
            f"exceed max_hamming={max_hamming} (pigeonhole soundness)"
        )
    if bits > 62:
        raise ValueError(
            "hash_hamming_incremental_pairs: bits must be ≤ 62 (sign bit)"
        )
    chunk_bits = bits // n_chunks + (1 if bits % n_chunks else 0)

    def banded(df, side):
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(hash_col).alias(f"{side}_sh"),
        ).select(
            f"{side}_id",
            f"{side}_sh",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("chunk"),
                            F.shiftright(F.col(f"{side}_sh"), c * chunk_bits)
                            .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                            .alias("ch"),
                        )
                        for c in range(n_chunks)
                    ]
                )
            ).alias("ck"),
        ).select(
            f"{side}_id", f"{side}_sh",
            F.col("ck.chunk").alias("chunk"), F.col("ck.ch").alias("ch"),
        )

    # hamming-filter and project before the pair-dedup exchange (r15,
    # guide §2.3 — same rewrite as hash_hamming_pairs: identical pair
    # set, fewer shuffle bytes and rows)
    hamming = F.bit_count(F.col("batch_sh").bitwiseXOR(F.col("corpus_sh")))
    return (
        banded(batch_sigs, "batch")
        .join(banded(corpus_sigs, "corpus"), on=["chunk", "ch"])
        .select(
            "batch_id", "corpus_id", hamming.cast("long").alias("hamming")
        )
        .where(F.col("hamming") <= F.lit(max_hamming))
        .dropDuplicates(["batch_id", "corpus_id"])
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = SIMHASH_MAX_HAMMING,
) -> DataFrame:
    """Near-dup pairs: share ≥1 of SIMHASH_CHUNKS bit-chunks AND hamming ≤ k.

    Banding on chunks keeps the join linear; the hamming verify is exact.
    Returns (id_a, id_b, hamming), id_a < id_b.  (Thin wrapper over the
    generic ``hash_hamming_pairs`` — same plan, oracle-pinned.)
    """
    return hash_hamming_pairs(
        simhash_table(df, text_col, id_col),
        id_col="id",
        hash_col="simhash",
        max_hamming=max_hamming,
        bits=62,
        n_chunks=SIMHASH_CHUNKS,
    )


# --------------------------------------------------------------------------
# exact n-gram jaccard via inverted index
# --------------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = NGRAM_JACCARD_THRESHOLD,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """EXACT Jaccard-similar pairs over k-word shingle sets.

    Inverted-index join: explode shingle hashes, self-join on hash,
    count shared shingles per pair, jaccard = shared/(|A|+|B|-shared).
    ``max_shingle_df`` drops shingles appearing in more than N docs
    (skew guard for 100 TB corpora; off by default for exactness).
    Returns (id_a, id_b, jaccard) with id_a < id_b, rounded to 4.
    """
    # shingle table feeds both the inverted index and the size lookup —
    # persist so the char-level hashing runs once
    base = _spread(df).select(
        F.col(id_col).alias("id"), shingle_hash_array(text_col).alias("sh")
    ).persist()
    sizes = base.select("id", F.size("sh").alias("n"))
    inv = base.select("id", F.explode("sh").alias("h"))
    if max_shingle_df is not None:
        doc_freq = inv.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
        inv = inv.join(doc_freq.where(F.col("df") <= max_shingle_df), "h")
    l, r = inv.alias("l"), inv.alias("r")
    shared = (
        l.join(r, on=[F.col("l.h") == F.col("r.h"), F.col("l.id") < F.col("r.id")])
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        shared.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")), 4),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )
    return _materialize_and_release(out, base)


# --------------------------------------------------------------------------
# embedding-cosine near-dup (exact baseline; LSH scale path in similarity.py)
# --------------------------------------------------------------------------
def cosine_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = COSINE_DUP_THRESHOLD,
) -> DataFrame:
    """EXACT embedding-cosine near-duplicate pairs (brute-force baseline).

    Vectors are unit-normalized once (map-only), so each pair costs a
    single dot product instead of three folds.  The self-join is the
    exact O(n²) baseline — at corpus scale use
    ``similarity.lsh_cosine_pairs`` (same threshold, bucketed candidate
    generation) and keep this as the verification oracle on samples.
    Returns (id_a, id_b, cos_sim) with id_a < id_b, rounded to 4dp.
    """
    from .similarity import as_double, dot, norm

    base = df.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    unit = base.select(
        "id", F.transform("v", lambda x: x / F.col("nrm")).alias("u")
    )
    l, r = unit.alias("l"), unit.alias("r")
    pairs = l.join(
        F.broadcast(r), on=F.col("l.id") < F.col("r.id")
    ).select(
        F.col("l.id").alias("id_a"),
        F.col("r.id").alias("id_b"),
        F.round(dot(F.col("l.u"), F.col("r.u")), 4).alias("cos_sim"),
    )
    return pairs.where(F.col("cos_sim") >= F.lit(threshold))


# --------------------------------------------------------------------------
# incremental dedup (new batch vs already-ingested corpus)
# --------------------------------------------------------------------------
def incremental_exact_dedup(
    new_df: DataFrame,
    seen_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep rows of ``new_df`` whose text is NOT already in ``seen_df``,
    then exact-dedup within the survivors.

    The production shape of dedup: each ingest batch checks against the
    corpus fingerprint table instead of re-deduping the world.  The
    anti-join runs on the 62-bit fingerprint (tiny shuffle rows; at
    100 TB the seen-side is a fingerprint-only table, orders of
    magnitude smaller than the corpus).
    """
    seen_fp = seen_df.select(
        fingerprint62(text_col).alias("__fp"),
        F.col(text_col).alias("__seen_text"),
    )
    new_fp = new_df.select(
        F.col(id_col),
        F.col(text_col),
        fingerprint62(text_col).alias("__fp"),
    )
    # fingerprint match + text equality guard (collision safety), anti
    fresh = new_fp.join(
        seen_fp,
        on=[
            new_fp["__fp"] == seen_fp["__fp"],
            new_fp[text_col] == seen_fp["__seen_text"],
        ],
        how="left_anti",
    )
    return exact_dedup(fresh.select(id_col, text_col), text_col=text_col, id_col=id_col)


# --------------------------------------------------------------------------
# benchmark decontamination (train corpus vs eval-set n-grams)
# --------------------------------------------------------------------------
def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_shared: int = 3,
) -> DataFrame:
    """Flag training docs sharing >= ``min_shared`` distinct k-word
    shingles with the benchmark (eval) corpus — GPT-3/Gopher-style
    n-gram-overlap decontamination.

    Scale shape: the benchmark shingle set is tiny relative to the
    training corpus (eval suites are MBs; the corpus is TBs), so it is
    deduped and **broadcast**; the train side is a map-side hash
    semi-join per shingle — the full corpus never shuffles.  Only the
    *hit* rows (shared shingles) reach the one groupBy(doc_id), whose
    input is bounded by |benchmark n-grams| x df, not corpus size.

    Beyond-reference capability (the reference SDK has no
    decontamination operator).  Returns (doc_id, shared_shingles) for
    flagged docs; shingle sets are distinct per doc, so the join count
    is exactly the distinct-shared-shingle count.
    """
    bench = benchmark.select(
        F.explode(shingle_hash_array(text_col)).alias("h")
    ).distinct()
    inv = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingle_hash_array(text_col)).alias("h"),
    )
    return (
        inv.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
        .where(F.col("shared_shingles") >= F.lit(min_shared))
    )


# --------------------------------------------------------------------------
# connected-components clustering over near-dup pairs
# --------------------------------------------------------------------------
def dup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 50,
) -> DataFrame:
    """Assign every document its near-dup CLUSTER id: the minimum doc id
    reachable through the pair graph (connected components).

    Pair-producing operators (minhash/simhash/jaccard/cosine) emit edges;
    the pipeline step they feed is "pick one canonical doc per duplicate
    GROUP", which needs components, not pairs (A~B, B~C must collapse to
    one cluster even when A~C was never emitted).  Canonical docs are the
    rows where ``cluster_id == doc_id``.

    Algorithm: iterative min-label propagation over ONLY the nodes that
    appear in a pair (singletons can't change label — they rejoin as
    themselves at the end, so the loop's working set is the duplicate
    subgraph, typically a tiny fraction of the corpus).  Each round every
    node takes the min of its own and its neighbors' labels; converges in
    O(graph diameter) rounds (near-dup components are shallow: variants
    of one origin).  One key-shuffle join + groupBy per round; lineage is
    truncated with localCheckpoint so plan depth stays constant.
    Convergence is detected by the label SUM (labels only ever decrease,
    so an unchanged sum means a fixpoint) — one cheap aggregate instead
    of a self-join diff per round.

    Returns (doc_id, cluster_id) for EVERY input id (singletons cluster
    with themselves).
    """
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()

    # working set: nodes with at least one edge
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    def _label_sum(lbl: DataFrame):
        return lbl.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0][0]

    prev_sum = _label_sum(labels)
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:  # labels decrease monotonically -> fixpoint
            break
        prev_sum = cur_sum

    # singletons (no edges) keep their own id
    singles = all_ids.select(F.col(id_col).alias("node")).join(
        labels.select("node"), on="node", how="left_anti"
    )
    return labels.unionByName(
        singles.withColumn("label", F.col("node"))
    ).select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))


def cosine_dup_pairs_np(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = COSINE_DUP_THRESHOLD,
    n_blocks: int = 8,
) -> DataFrame:
    """EXACT cosine all-pairs, block-matrix form — the wall-clock scale
    twin of ``cosine_dup_pairs``.

    Same O(n²) pair space, but organized as (n_blocks choose 2)+n_blocks
    BLOCK pairs, each computed as one numpy matmul inside Arrow-batched
    ``applyInPandas`` instead of a per-pair expression fold.  Data
    movement is O(n·n_blocks) (each row joins ~n_blocks+1 block-pair
    groups); FLOPs are unchanged but run at BLAS speed.  The fold-based
    ``cosine_dup_pairs`` stays the DuckDB-oracle-checked baseline (numpy
    pairwise summation is not reproducible in SQL; ties at the threshold
    could differ in the last ulp) — pytest pins pair-set equality of the
    two on the test corpus.

    Returns (id_a, id_b, cos_sim) with id_a < id_b, rounded to 4dp.
    """
    import pandas as pd

    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
    )
    pair_rows = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    pair_df = spark.createDataFrame(pair_rows, "bl int, br int")
    left = base.join(pair_df, base["blk"] == pair_df["bl"]).select(
        "id", "v", "bl", "br", F.lit(0).alias("side")
    )
    right = base.join(pair_df, base["blk"] == pair_df["br"]).select(
        "id", "v", "bl", "br", F.lit(1).alias("side")
    )
    tagged = left.unionByName(right)

    def _block(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        l_ = pdf[pdf["side"] == 0]
        r_ = pdf[pdf["side"] == 1]
        if l_.empty or r_.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos_sim": "float64"}
            )
        lm = np.stack(l_["v"].to_numpy())
        rm = np.stack(r_["v"].to_numpy())
        lm = lm / np.linalg.norm(lm, axis=1, keepdims=True)
        rm = rm / np.linalg.norm(rm, axis=1, keepdims=True)
        sims = lm @ rm.T
        lid = l_["id"].to_numpy()
        rid = r_["id"].to_numpy()
        ia, ib = np.nonzero(np.round(sims, 4) >= threshold)
        id_l, id_r = lid[ia], rid[ib]
        if pdf["bl"].iat[0] == pdf["br"].iat[0]:
            # both sides hold the same rows: each pair appears in both
            # orientations — keep one
            keep = id_l < id_r
            id_a, id_b = id_l[keep], id_r[keep]
            cs = np.round(sims[ia, ib], 4)[keep]
        else:
            # distinct blocks: every pair appears exactly once, in
            # arbitrary id order — normalize the orientation
            keep = id_l != id_r
            id_a = np.minimum(id_l, id_r)[keep]
            id_b = np.maximum(id_l, id_r)[keep]
            cs = np.round(sims[ia, ib], 4)[keep]
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cos_sim": cs})

    return (
        tagged.groupBy("bl", "br")
        .applyInPandas(_block, schema="id_a long, id_b long, cos_sim double")
    )


# --------------------------------------------------------------------------
# span-level exact dedup (ExactSubstr-lite)
# --------------------------------------------------------------------------
def span_hash_array(text: Column | str, w: int = None) -> Column:
    """Hashes of the NON-overlapping w-token windows of ``text``.

    Two-level hashing as in shingle_hash_array (token char-hash with
    MULT1, window fold with MULT2) so the shuffle carries one BIGINT per
    window instead of the window text.  Trailing partial windows are
    dropped (both here and in the oracle).
    """
    from .constants import SPAN_W

    w = w or SPAN_W
    frag = _frag(text) if isinstance(text, str) else None
    if frag is not None:
        tok_hashes = (
            f"transform({_tokens_sql(frag)}, "
            f"t -> {_char_poly_hash_sql('t', MULT1)})"
        )
        spans = (
            f"CASE WHEN cast(floor(size(th) / {w}) as int) >= 1 THEN "
            f"transform(sequence(1, cast(floor(size(th) / {w}) as int)), "
            f"i -> aggregate(slice(th, (i - 1) * {w} + 1, {w}), "
            f"cast(0 as bigint), (acc, h) -> (acc * {MULT2} + h) % {P31})) "
            f"ELSE cast(array() as array<bigint>) END"
        )
        return F.expr(
            f"element_at(transform(array({tok_hashes}), th -> {spans}), 1)"
        )
    toks = tokens(text)
    tok_hashes = F.transform(toks, lambda t: char_poly_hash(t, MULT1))

    def _spans(th: Column) -> Column:
        n = F.floor(F.size(th) / F.lit(w)).cast("int")
        idx = F.sequence(F.lit(1), n)
        return F.when(n >= F.lit(1), F.transform(
            idx,
            lambda i: F.aggregate(
                F.slice(th, (i - F.lit(1)) * F.lit(w) + F.lit(1), w),
                F.lit(0).cast("long"),
                lambda acc, h: (acc * F.lit(MULT2) + h) % F.lit(P31),
            ),
        )).otherwise(F.array().cast("array<bigint>"))

    # let-binding: evaluate tok_hashes once (see shingle_hash_array)
    return F.element_at(F.transform(F.array(tok_hashes), _spans), 1)


def exact_span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = None,
    min_docs: int = None,
) -> DataFrame:
    """Per-document counts of exact w-token spans shared across documents.

    ExactSubstr dedup (Lee et al. 2022) simplified to fixed non-overlapping
    windows: a span is *duplicated* when its hash occurs in >= min_docs
    distinct documents.  Returns (id, n_spans, n_dup_spans) per document.

    Scale design: explode is map-only (one BIGINT per window); one shuffle
    to count distinct docs per span hash; the span->dup-set join is a hash
    join on the span hash (AQE broadcasts when the dup set is small, which
    it is for mostly-clean corpora); one shuffle back to per-doc counts.
    Linear in total token count — the same layout at 100 TB, where the
    dup-span side stays tiny relative to the corpus.
    """
    from .constants import SPAN_MIN_DOCS, SPAN_W

    w = w or SPAN_W
    min_docs = min_docs or SPAN_MIN_DOCS
    per_doc = df.select(
        F.col(id_col), span_hash_array(text_col, w).alias("__spans")
    )
    exploded = per_doc.select(id_col, F.explode("__spans").alias("__h"))
    shared = (
        exploded.groupBy("__h")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__h")
    )
    dup_counts = (
        exploded.join(shared, "__h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_spans"))
    )
    return (
        per_doc.select(id_col, F.size("__spans").cast("long").alias("n_spans"))
        .join(dup_counts, id_col, "left")
        .select(
            id_col,
            "n_spans",
            F.coalesce("n_dup_spans", F.lit(0).cast("long")).alias("n_dup_spans"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = None,
    min_docs: int = None,
) -> DataFrame:
    """ExactSubstr REMOVAL (the write path of ``exact_span_dedup``):
    rewrite each document with every duplicated w-token window excised,
    keeping the one copy in the lowest-id document that contains it
    (keep-first — Lee et al. 2022 keep one occurrence).

    Returns (id, clean_text, n_tokens_removed).  ``clean_text`` is
    whitespace-normalized (single spaces) — the reconstruction joins the
    kept tokens.  Trailing partial windows are never removed (they were
    never hashed).

    Scale design: same linear layout as the finder — window hashes are
    one BIGINT each, the dup set (span hash → keeper doc) is tiny for
    mostly-clean corpora and AQE broadcasts it, and the per-doc bad-
    window sets ride one groupBy.  The rebuild is a map-only
    higher-order filter over the token array — no Python, no second
    text shuffle.
    """
    from .constants import SPAN_MIN_DOCS, SPAN_W

    w = w or SPAN_W
    min_docs = min_docs or SPAN_MIN_DOCS
    spans = df.select(
        F.col(id_col), span_hash_array(text_col, w).alias("__spans")
    )
    win = spans.select(id_col, F.posexplode("__spans").alias("__i", "__h"))
    dup = (
        win.groupBy("__h")
        .agg(
            F.count_distinct(id_col).alias("__nd"),
            F.min(id_col).alias("__keeper"),
        )
        .where(F.col("__nd") >= min_docs)
        .select("__h", "__keeper")
    )
    bad = (
        win.join(dup, "__h")
        .where(F.col(id_col) != F.col("__keeper"))
        .groupBy(id_col)
        .agg(F.collect_set("__i").alias("__bad"))
    )
    toks = tokens(F.col(text_col))
    badc = F.coalesce(F.col("__bad"), F.array().cast("array<int>"))
    kept = F.filter(
        toks,
        lambda t, j: ~F.array_contains(badc, (j / F.lit(w)).cast("int")),
    )
    return (
        df.join(bad, id_col, "left")
        .select(
            F.col(id_col),
            F.array_join(kept, " ").alias("clean_text"),
            (F.size(toks) - F.size(kept)).cast("long").alias("n_tokens_removed"),
        )
    )


def minhash_jaccard_estimates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = MINHASH_JACCARD_THRESHOLD,
) -> DataFrame:
    """For every LSH candidate pair: the signature-based Jaccard
    ESTIMATE (matching minhash components / K) next to the exact
    shingle-set Jaccard — the estimator-accuracy report that sizes K
    for a target corpus.

    At 100 TB this is the cheap path: the estimate needs only the two
    K-element signatures already materialized for banding (no shingle
    sets shuffled), while the exact column here exists to grade it.
    Returns (id_a, id_b, est_x10000, jaccard) for exact-verified pairs.
    """
    pairs = minhash_lsh_pairs(df, text_col, id_col, threshold)
    sigs = df.select(
        F.col(id_col).alias("sid"),
        minhash_signature(shingle_hash_array(text_col)).alias("sig"),
    )
    matches = F.aggregate(
        F.zip_with(
            F.col("sig_a"),
            F.col("sig_b"),
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("long"),
        lambda acc, m: acc + m,
    )
    est = (matches * F.lit(10000)).cast("long") - (
        (matches * F.lit(10000)) % F.lit(MINHASH_K)
    )
    est = (est / F.lit(MINHASH_K)).cast("long")
    return (
        pairs.join(sigs.select(F.col("sid"), F.col("sig").alias("sig_a")), pairs.id_a == F.col("sid"))
        .drop("sid")
        .join(sigs.select(F.col("sid"), F.col("sig").alias("sig_b")), pairs.id_b == F.col("sid"))
        .drop("sid")
        .select(
            "id_a",
            "id_b",
            est.alias("est_x10000"),
            "jaccard",
        )
    )

# --------------------------------------------------------------------------
# SemDeDup: semantic (embedding-cluster) deduplication
# --------------------------------------------------------------------------
def semantic_dup_pairs(
    df: DataFrame,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = None,
    max_cell_rows: int | None = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): near-duplicate pairs found by
    clustering embeddings and comparing cosines ONLY within a cluster.

    The k-means cell assignment (``similarity.ivf_assign``, map-only
    broadcast argmax) turns the O(n²) all-pairs cosine into a
    per-cell self-join: the shuffle key is the cell id, and pair cost
    is Σ|cell|² — bounded by the clustering, never the corpus.  At
    100 TB: train centroids on a sample (``similarity.ivf_train``),
    raise ``n_cells`` until the largest cell fits an executor, and
    write the corpus partitioned by cell so the self-join is
    co-located.  Pass ``centroids=None`` to use the seeded
    ``SEMDEDUP_CENTROIDS`` (deterministic, oracle-replayable).

    ``max_cell_rows`` ENFORCES the "largest cell fits an executor"
    knob instead of documenting it (round 14, VERDICT r13 #6 — the
    SemDeDup mirror of the LSH hot-bucket cap): cells whose row count
    exceeds the cap are routed through the blocked-matmul path (the
    ``semantic_dup_pairs_np`` / ``cosine_dup_pairs_np`` shape, sliced
    into ~cap-sized sub-blocks), so ONE degenerate centroid can no
    longer materialize an |cell|²-row join partition; every other cell
    keeps the expression self-join that the DuckDB oracle replays
    bit-exactly.  One count() per cell decides the routing (cell ids
    are already driver-bounded: len(centroids)).  ``None`` disables
    the guard.

    Returns (cell, id_a, id_b, cos_sim) with id_a < id_b and
    cos_sim >= threshold, rounded to 4dp.
    """
    from .constants import SEMDEDUP_CENTROIDS, SEMDEDUP_THRESHOLD
    from .similarity import as_double, dot, ivf_assign, norm

    if centroids is None:
        centroids = SEMDEDUP_CENTROIDS
    if threshold is None:
        threshold = SEMDEDUP_THRESHOLD
    assigned = ivf_assign(df, centroids, vec_col=vec_col, out_col="cell")
    base = assigned.select(
        "cell", F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    # Materialize (cell, id, v, nrm) ONCE before the self-join (guide
    # §1.2/§5): without the barrier, CollapseProject inlines the 64-term
    # norm fold INTO the per-element division lambda below (the fold
    # re-evaluates per element — 64× per row, interpreted), and the
    # self-join evaluates the whole assign+norm chain once per side.
    # Profiled r14 (sf0.1, 2000×64): the broadcast build alone ran 4.4 s
    # on ONE task; with the repartition (parallelism for the tiny
    # single-file local scan — skipped when the input is already wider
    # than the cluster) + eager localCheckpoint, assign/norm compute one
    # parallel pass and the division reads nrm as a plain column.
    # Values are bit-identical: same expressions, evaluated once.
    # CONTRACT (ADVICE r14): this function is EAGER — the (cell,id,v,nrm)
    # relation materializes at call time via localCheckpoint, which also
    # truncates lineage (an executor loss after this point fails the job
    # instead of recomputing; re-invoke on failure).  The barrier is the
    # measured 5.6× win (r14 batch 2) and hot-cell routing below needs
    # the materialized counts anyway.
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        narrow = df.rdd.getNumPartitions() < par
    except Exception:
        narrow = False
    if narrow:
        base = base.repartition(par, "cell", "id")
    base = base.localCheckpoint(eager=True)
    unit = base.select(
        "cell", "id", F.transform("v", lambda x: x / F.col("nrm")).alias("u")
    )
    hot_counts: dict = {}
    if max_cell_rows is not None:
        hot_counts = {
            r["cell"]: r["__n"]
            for r in unit.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > max_cell_rows)
            .collect()
        }
    if hot_counts:
        unit = unit.where(~F.col("cell").isin(*hot_counts))
    l, r = unit.alias("l"), unit.alias("r")
    pairs = l.join(
        r, on=[F.col("l.cell") == F.col("r.cell"), F.col("l.id") < F.col("r.id")]
    ).select(
        F.col("l.cell").alias("cell"),
        F.col("l.id").alias("id_a"),
        F.col("r.id").alias("id_b"),
        F.round(dot(F.col("l.u"), F.col("r.u")), 4).alias("cos_sim"),
    )
    pairs = pairs.where(F.col("cos_sim") >= F.lit(threshold))
    if not hot_counts:
        return pairs
    hot = base.where(F.col("cell").isin(*hot_counts)).select("cell", "id", "v")
    blocked = _blocked_cell_pairs(hot, hot_counts, threshold, max_cell_rows)
    return pairs.unionByName(
        blocked.select(
            F.col("cell").cast(dict(pairs.dtypes)["cell"]).alias("cell"),
            "id_a",
            "id_b",
            "cos_sim",
        )
    )


def _blocked_cell_pairs(
    hot: DataFrame, hot_counts: dict, threshold: float, max_cell_rows: int
) -> DataFrame:
    """Pairs within OVERSIZED cells, block-matrix form: each hot cell's
    rows hash into ``ceil(n / cap)`` sub-blocks and every block PAIR
    computes as one numpy matmul in Arrow-batched ``applyInPandas`` —
    per-task memory is O(cap²) sims over ≤2·cap rows regardless of the
    cell's true size (``cosine_dup_pairs_np``'s organization, scoped to
    a cell).  Input: (cell, id, v) rows of the hot cells only."""
    import math

    import pandas as pd

    spark = hot.sparkSession
    nb_rows = [
        (int(c), int(math.ceil(n / max_cell_rows)))
        for c, n in hot_counts.items()
    ]
    pair_rows = [
        (c, i, j) for c, nb in nb_rows for i in range(nb) for j in range(i, nb)
    ]
    nb_df = spark.createDataFrame(nb_rows, "cell int, nb int")
    pair_df = spark.createDataFrame(pair_rows, "cell int, bl int, br int")
    tagged = hot.join(F.broadcast(nb_df), "cell").withColumn(
        "blk", F.pmod(F.hash("id"), F.col("nb"))
    )
    left = tagged.join(
        F.broadcast(pair_df),
        on=[tagged["cell"] == pair_df["cell"], tagged["blk"] == pair_df["bl"]],
    ).select(tagged["cell"], "id", "v", "bl", "br", F.lit(0).alias("side"))
    right = tagged.join(
        F.broadcast(pair_df),
        on=[tagged["cell"] == pair_df["cell"], tagged["blk"] == pair_df["br"]],
    ).select(tagged["cell"], "id", "v", "bl", "br", F.lit(1).alias("side"))

    def _block(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        l_ = pdf[pdf["side"] == 0]
        r_ = pdf[pdf["side"] == 1]
        if l_.empty or r_.empty:
            return pd.DataFrame(
                {"cell": [], "id_a": [], "id_b": [], "cos_sim": []}
            ).astype(
                {
                    "cell": "int64",
                    "id_a": "int64",
                    "id_b": "int64",
                    "cos_sim": "float64",
                }
            )
        lm = np.stack(l_["v"].to_numpy())
        rm = np.stack(r_["v"].to_numpy())
        lm = lm / np.linalg.norm(lm, axis=1, keepdims=True)
        rm = rm / np.linalg.norm(rm, axis=1, keepdims=True)
        sims = np.round(lm @ rm.T, 4)
        lid = l_["id"].to_numpy()
        rid = r_["id"].to_numpy()
        ia, ib = np.nonzero(sims >= threshold)
        id_l, id_r = lid[ia], rid[ib]
        if pdf["bl"].iat[0] == pdf["br"].iat[0]:
            keep = id_l < id_r
            id_a, id_b = id_l[keep], id_r[keep]
        else:
            keep = id_l != id_r
            id_a = np.minimum(id_l, id_r)[keep]
            id_b = np.maximum(id_l, id_r)[keep]
        return pd.DataFrame(
            {
                "cell": np.full(len(id_a), int(pdf["cell"].iat[0]), dtype="int64"),
                "id_a": id_a,
                "id_b": id_b,
                "cos_sim": sims[ia, ib][keep],
            }
        )

    return (
        left.unionByName(right)
        .groupBy("cell", "bl", "br")
        .applyInPandas(
            _block, schema="cell long, id_a long, id_b long, cos_sim double"
        )
    )


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = None,
) -> DataFrame:
    """Keep-first semantic dedup: drop every row that has a
    within-cluster near-duplicate with a smaller id (the SemDeDup
    pruning rule with min-id as the deterministic representative).

    The drop set is the distinct ``id_b`` side of
    ``semantic_dup_pairs`` — tiny relative to the corpus — so the
    final anti-join broadcasts under AQE.
    """
    dropped = semantic_dup_pairs(df, centroids, id_col, vec_col, threshold).select(
        F.col("id_b").alias(id_col)
    ).distinct()
    return df.join(dropped, on=id_col, how="left_anti")


# --------------------------------------------------------------------------
# Bloom-filter membership dedup (bounded-state incremental dedup)
# --------------------------------------------------------------------------
def bloom_bit_positions(fp: Column, m: int = None, k: int = None) -> Column:
    """Array of the ``k`` bit positions the 62-bit fingerprint sets in an
    ``m``-bit Bloom filter: pos_i = ((a_i * (fp mod P31) + b_i) mod P31)
    mod m.  The mod-P31 reduction first keeps every product inside int64
    in both engines (DuckDB raises on BIGINT overflow)."""
    from .constants import BLOOM_COEFFS, BLOOM_K, BLOOM_M

    m = m or BLOOM_M
    k = k or BLOOM_K
    h = fp % F.lit(P31)
    return F.array(
        *[
            ((F.lit(a) * h + F.lit(b)) % F.lit(P31) % F.lit(m)).alias(f"p{i}")
            for i, (a, b) in enumerate(BLOOM_COEFFS[:k])
        ]
    )


def bloom_build(
    corpus: DataFrame,
    text_col: str = "text",
    m: int = None,
    k: int = None,
) -> DataFrame:
    """Build the corpus Bloom filter as its DISTINCT set-bit relation —
    a single-column (``bit``) DataFrame with at most ``m`` rows.

    This is THE bounded-state membership structure for incremental
    dedup at scale: the corpus is scanned once map-side (explode of k
    ints per doc), and the filter state is <= m tiny rows no matter how
    many trillions of documents fed it — persist it as the
    "seen-corpus" table and broadcast it to every future ingest batch.
    Size m for the target false-positive rate:
    fpr ≈ (1 - e^(-k·n/m))^k.
    """
    return (
        corpus.select(
            F.explode(
                bloom_bit_positions(fingerprint62(text_col), m, k)
            ).alias("bit")
        )
        .distinct()
    )


def bloom_membership(
    batch: DataFrame,
    bloom: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m: int = None,
    k: int = None,
) -> DataFrame:
    """Probe each batch doc against the Bloom set-bit relation:
    ``maybe_dup`` is true iff EVERY one of its k bit positions is set
    (classic Bloom semantics — no false negatives, tunable false
    positives).

    Plan shape: explode the batch's distinct positions (<= k rows per
    doc), hash-join the broadcast filter, one groupBy(doc) counting
    hits vs probes.  The batch never joins the corpus itself — the
    filter stands in for it, which is the whole point at 100 TB.
    Returns (id, n_bits, n_hits, maybe_dup).
    """
    probes = batch.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                bloom_bit_positions(fingerprint62(text_col), m, k)
            )
        ).alias("bit"),
    )
    hits = probes.join(
        F.broadcast(bloom.withColumn("__hit", F.lit(1))), on="bit", how="left"
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bits"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hits"),
        )
        .withColumn("maybe_dup", F.col("n_hits") == F.col("n_bits"))
    )


def bloom_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m: int = None,
    k: int = None,
) -> DataFrame:
    """Incremental dedup through the Bloom filter: keep batch rows whose
    fingerprint is definitely NOT in the corpus (maybe_dup false).

    Compared with ``incremental_exact_dedup`` this trades a bounded
    false-positive rate (docs wrongly dropped) for never shuffling or
    joining the corpus fingerprint table — the production screen in
    front of the exact check.
    """
    flags = bloom_membership(batch, bloom_build(corpus, text_col, m, k),
                             text_col, id_col, m, k)
    fresh = flags.where(~F.col("maybe_dup")).select(id_col)
    return batch.join(fresh, on=id_col, how="left_semi")


def semantic_dup_pairs_np(
    df: DataFrame,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = None,
) -> DataFrame:
    """SemDeDup pairs, per-cell blocked-matmul form — the wall-clock
    twin of ``semantic_dup_pairs`` (same relationship as
    ``cosine_dup_pairs_np`` to the fold baseline).

    The cell assignment stays a JVM-side broadcast argmax; each cell's
    pair block then computes as ONE numpy matmul inside Arrow-batched
    ``applyInPandas``.  Shuffle is one hash-partition on the cell id —
    the cell-size bound that makes the self-join tractable is exactly
    the bound that makes the matmul fit an executor.  The fold-based
    ``semantic_dup_pairs`` stays the oracle-checked baseline; pytest
    pins pair-set equality on the test corpus.

    Returns (cell, id_a, id_b, cos_sim) with id_a < id_b, 4dp.
    """
    import pandas as pd

    from .constants import SEMDEDUP_CENTROIDS, SEMDEDUP_THRESHOLD
    from .similarity import ivf_assign

    if centroids is None:
        centroids = SEMDEDUP_CENTROIDS
    if threshold is None:
        threshold = SEMDEDUP_THRESHOLD
    assigned = ivf_assign(df, centroids, vec_col=vec_col, out_col="cell").select(
        "cell", F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )

    def _cell(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(pdf) < 2:
            return pd.DataFrame({"cell": [], "id_a": [], "id_b": [], "cos_sim": []}).astype(
                {"cell": "int64", "id_a": "int64", "id_b": "int64", "cos_sim": "float64"}
            )
        m = np.stack(pdf["v"].to_numpy())
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(m @ m.T, 4)
        ids = pdf["id"].to_numpy()
        ia, ib = np.nonzero(sims >= threshold)
        keep = ids[ia] < ids[ib]
        return pd.DataFrame(
            {
                "cell": np.full(int(keep.sum()), int(pdf["cell"].iat[0]), dtype="int64"),
                "id_a": ids[ia][keep],
                "id_b": ids[ib][keep],
                "cos_sim": sims[ia, ib][keep],
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        _cell, schema="cell long, id_a long, id_b long, cos_sim double"
    )


def cluster_representatives(
    df: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware canonical document per near-dup cluster: instead of
    blindly keeping the minimum id, keep the member with the MOST tokens
    (ties break to the smaller id) — the "pick the best copy" step real
    dedup pipelines run between clustering and deletion.

    Composition: near-dup pairs (MinHash+LSH by default) → connected
    components (``dup_clusters``) → one windowed argmax per cluster.
    The window partitions on cluster_id, whose groups are near-dup
    clusters — naturally tiny — so the extra cost over clustering is one
    key-shuffle.  Returns (cluster_id, rep_doc_id, cluster_size,
    rep_tokens), one row per cluster.
    """
    from .text import token_count

    if pairs is None:
        pairs = minhash_lsh_pairs(df, text_col, id_col)
    clusters = dup_clusters(pairs, df.select(id_col), id_col)
    scored = df.select(
        F.col(id_col), token_count(F.col(text_col)).cast("long").alias("__q")
    )
    joined = clusters.join(scored, on=id_col)
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("__q").desc(), F.col(id_col).asc()
    )
    cw = Window.partitionBy("cluster_id")
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(cw))
        .where(F.col("__rn") == 1)
        .select(
            "cluster_id",
            F.col(id_col).alias("rep_doc_id"),
            "cluster_size",
            F.col("__q").alias("rep_tokens"),
        )
    )


def _banded(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, sh, band, bh) banding relation for a corpus — the persisted
    layout an incremental dedup service keeps per ingested corpus."""
    rows = MINHASH_K // LSH_BANDS
    base = _spread(df).select(
        F.col(id_col).alias("id"),
        shingle_hash_array(text_col).alias("sh"),
    ).withColumn("sig", minhash_signature("sh"))
    return base.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_hash("sig", b, rows).alias("bh"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("id", "sh", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))


def minhash_incremental_pairs(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = MINHASH_JACCARD_THRESHOLD,
    corpus_banded: DataFrame | None = None,
) -> DataFrame:
    """NEAR-dup screen for an ingest batch against an existing corpus:
    MinHash banding candidates between (batch x corpus) only, verified
    with exact Jaccard — the near-dup member of the incremental triple
    (exact fingerprint anti-join / Bloom screen / this).

    The corpus side is its banding relation (``_banded``) — at scale a
    PERSISTED (band, bh, id, sh) table maintained per ingest, so each
    new batch bands map-only and joins the table on (band, bh) without
    ever re-scanning corpus text.  Candidate cost is bounded by bucket
    co-occurrence, never |batch| x |corpus|.

    Returns (batch_id, corpus_id, jaccard >= threshold, 4dp).
    """
    b = _banded(batch, text_col, id_col).alias("b")
    c = (
        corpus_banded
        if corpus_banded is not None
        else _banded(corpus, text_col, id_col)
    ).alias("c")
    cand = (
        b.join(c, on=[F.col("b.band") == F.col("c.band"), F.col("b.bh") == F.col("c.bh")])
        .select(
            F.col("b.id").alias("batch_id"),
            F.col("c.id").alias("corpus_id"),
            F.col("b.sh").alias("sh_b"),
            F.col("c.sh").alias("sh_c"),
        )
        .dropDuplicates(["batch_id", "corpus_id"])
    )
    inter = F.size(F.array_intersect(F.col("sh_b"), F.col("sh_c")))
    union = F.size(F.col("sh_b")) + F.size(F.col("sh_c")) - inter
    return (
        cand.withColumn("jaccard", F.round(inter / union, 4))
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("batch_id", "corpus_id", "jaccard")
    )


# --------------------------------------------------------------------------
# cross-source duplication matrix (which sources copy each other)
# --------------------------------------------------------------------------
def novelty_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_df: int = 1,
    scale: int = 1000,
) -> DataFrame:
    """Per-document n-gram novelty: the share of a doc's distinct
    word-shingles that are RARE corpus-wide (document frequency ≤
    ``rare_df``) — the diversity-selection complement of dedup: dedup
    removes what repeats, novelty ranks what doesn't, the signal data
    curation uses to up-sample unusual material.

    All-BIGINT: ``novelty_pmille = (scale · n_rare) DIV n_shingles`` —
    engine-exact floor division, no float aggregation.  Shapes: one
    shingle explode, one groupBy(shingle) for document frequencies, one
    join back on the shingle hash, one groupBy(doc).  Every relation is
    linear in total shingle instances; a pathologically hot shingle
    only widens its own join group (same caveat and treatment as the
    n-gram Jaccard index's ``max_shingle_df`` guard).

    Returns (id, n_shingles, n_rare, novelty_pmille).
    """
    sh = df.select(
        F.col(id_col),
        F.explode(shingle_hash_array(text_col)).alias("sh"),
    )
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("dfq"))
    per_doc = (
        sh.join(dfreq, "sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("dfq") <= rare_df).cast("long")).alias("n_rare"),
        )
    )
    return per_doc.select(
        id_col,
        "n_shingles",
        "n_rare",
        F.expr(f"({scale} * n_rare) DIV greatest(n_shingles, 1)")
        .cast("long")
        .alias("novelty_pmille"),
    )


def cross_source_matrix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    threshold: float = MINHASH_JACCARD_THRESHOLD,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate contamination matrix between corpus sources: for
    every unordered source pair, how many verified near-dup document
    pairs cross it and their mean Jaccard.

    The practical question behind it: which feeds are mirroring each
    other (crawl A re-serving crawl B, a dataset bundling another), so
    which source should be dropped or down-weighted before training.

    Composition, not new machinery: ``minhash_lsh_pairs`` finds the
    pairs (banded shuffle, exact-Jaccard verify); two key-joins attach
    each side's source; a ≤|sources|² groupBy aggregates.  The mean is
    BIGINT-exact — jaccard is already rounded to 4 decimals, so summing
    ``jaccard*10⁴`` as BIGINT is order-independent and the single final
    division is bit-stable.  Pass a precomputed/persisted ``pairs``
    relation to reuse an existing dedup run at scale.
    """
    if pairs is None:
        pairs = minhash_lsh_pairs(df, text_col, id_col, threshold=threshold)
    src = df.select(F.col(id_col).alias("id"), F.col(source_col).alias("src"))
    j = (
        pairs.join(src.withColumnsRenamed({"id": "id_a", "src": "src_a"}), "id_a")
        .join(src.withColumnsRenamed({"id": "id_b", "src": "src_b"}), "id_b")
        .select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
            F.round(F.col("jaccard") * 10000).cast("long").alias("j4"),
        )
    )
    return j.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (
            F.sum("j4").cast("double") / (F.count(F.lit(1)) * 10000).cast("double")
        ).alias("avg_jaccard"),
    )


def pair_threshold_sweep(
    pairs: DataFrame,
    sim_col: str = "jaccard",
    bin_width_x100: int = 5,
) -> DataFrame:
    """Similarity histogram + reverse-cumulative pair counts over a
    verified pair relation — the knee curve a user reads to pick the
    dedup threshold ("how many more pairs does lowering it 0.05 buy?").

    All-integer: similarities (already rounded to 4dp) bucket into
    ``bin_width_x100``-wide percent bins, counts are BIGINT, and the
    cumulative sum runs over the ≤(100/width)-row histogram — a single
    bounded window after one groupBy, so the sweep costs one pass over
    the pairs regardless of corpus size.

    Returns (threshold_x100, n_pairs, n_pairs_at_or_above), ascending
    thresholds.
    """
    b = F.expr(f"CAST(round({sim_col} * 100) AS BIGINT) DIV {bin_width_x100}")
    h = pairs.groupBy(b.alias("bin")).agg(F.count(F.lit(1)).alias("n_pairs"))
    w = (
        Window.orderBy(F.col("bin").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        h.withColumn("n_pairs_at_or_above", F.sum("n_pairs").over(w))
        .select(
            (F.col("bin") * bin_width_x100).alias("threshold_x100"),
            "n_pairs",
            "n_pairs_at_or_above",
        )
    )


def containment_pairs(
    df: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = CONTAINMENT_THRESHOLD,
    max_shingle_df: int | None = None,
    inverted: DataFrame | None = None,
) -> DataFrame:
    """EXACT shingle-containment pairs: ``|A∩B| / |A|`` — the
    asymmetric cousin of Jaccard that catches a document WRAPPING
    another (boilerplate around a quoted article, a post embedding an
    earlier post) where symmetric Jaccard stays low because the
    container is much larger.

    Same inverted-index shape as ``ngram_jaccard_pairs`` (explode
    shingles, self-join on hash, count shared per DIRECTED pair), so
    the same scale story: shuffle on shingle hash, never all-pairs;
    ``max_shingle_df`` is the boilerplate-shingle skew guard.  Returns
    (id_a, id_b, containment) where id_a ≠ id_b and ``containment`` is
    the fraction of A's shingles found in B, rounded to 4.

    ``inverted``: a PREBUILT (cid, h) inverted-index relation — what
    ``build_containment_index`` persists — skips the tokenize + shingle
    explode AND the per-call eager-materialize trade entirely (the
    ``signatures=`` pattern from ``minhash_lsh_pairs``): repeat callers
    — threshold sweeps, per-drain pair scans — pay the corpus shingle
    pass ONCE at build time.  Shingle counts (both per-doc sizes and
    per-pair shared counts) are DISTINCT-counted so at-least-once index
    maintenance (a re-appended batch) never changes any containment
    score.  The result is lazy over the caller's relation; pass exactly
    one of ``df`` / ``inverted``.
    """
    if (df is None) == (inverted is None):
        raise ValueError(
            "containment_pairs: pass exactly one of df= or inverted= "
            "(got both or neither)"
        )
    if inverted is not None:
        # Dedup the index relation ONCE, then count with plain count(1)
        # (r14, guide §2.3 aggregate before you shuffle): the former
        # countDistinct-per-pair aggregate has no map-side partial
        # phase, so the full candidate blow-up of the h-self-join
        # shuffled raw; after .distinct() every (id, h) is unique, so
        # each shared shingle contributes exactly one join row per
        # DIRECTED pair and count(1) ≡ countDistinct(h) — the same
        # at-least-once idempotence, paid as one bounded index shuffle
        # instead of an unshrunk candidate shuffle.
        # r15 (VERDICT r14 #8): partition the index by h FIRST, then
        # dedup — hash(h) co-locates every (id, h) duplicate, so the
        # dropDuplicates aggregate needs no exchange of its own AND the
        # h-self-join below reuses the same partitioning: the plan pays
        # ONE full-index exchange where distinct()-then-join paid two
        # (hash(id,h) for the dedup, hash(h) for the join).
        inv = (
            inverted.select(F.col("cid").alias("id"), "h")
            .repartition("h")
            .dropDuplicates(["id", "h"])
        )
        sizes = inv.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
        return _containment_pairs_from_inv(
            inv, sizes, threshold, max_shingle_df, distinct_shared=False
        )
    base = _shingle_base(df, text_col, id_col).persist()
    out = _containment_pairs_from_base(base, threshold, max_shingle_df)
    return _materialize_and_release(out, base)


def _shingle_base(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, sh) shingle-hash-array base shared by the containment scans."""
    return _spread(df).select(
        F.col(id_col).alias("id"), shingle_hash_array(text_col).alias("sh")
    )


def _containment_pairs_from_base(
    base: DataFrame,
    threshold: float,
    max_shingle_df: int | None,
) -> DataFrame:
    """Directed containment pairs from an (id, sh) base — split out so
    ``containment_dedup`` can reuse ONE persisted base for both the
    size lookup and the pair scan instead of shingling the corpus twice
    (VERDICT r7 #2)."""
    sizes = base.select("id", F.size("sh").alias("n"))
    inv = base.select("id", F.explode("sh").alias("h"))
    return _containment_pairs_from_inv(inv, sizes, threshold, max_shingle_df)


def _containment_pairs_from_inv(
    inv: DataFrame,
    sizes: DataFrame,
    threshold: float,
    max_shingle_df: int | None,
    distinct_shared: bool = False,
) -> DataFrame:
    """Directed containment pairs from an exploded (id, h) inverted
    relation + (id, n) sizes.  ``distinct_shared`` counts DISTINCT
    shared shingles per pair — identical values on an exactly-built
    index (shingle arrays are distinct per doc), but idempotent when
    the relation carries at-least-once duplicate rows (the persisted
    ``inverted=`` path)."""
    if max_shingle_df is not None:
        doc_freq = inv.groupBy("h").agg(
            F.countDistinct("id").alias("df")
            if distinct_shared
            else F.count(F.lit(1)).alias("df")
        )
        inv = inv.join(doc_freq.where(F.col("df") <= max_shingle_df), "h")
    l, r = inv.alias("l"), inv.alias("r")
    grouped = l.join(
        r, on=[F.col("l.h") == F.col("r.h"), F.col("l.id") != F.col("r.id")]
    ).groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
    shared = (
        grouped.agg(F.countDistinct(F.col("l.h")).alias("shared"))
        if distinct_shared
        else grouped.agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(
            sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"),
            "id_a",
        )
        .withColumn(
            "containment", F.round(F.col("shared") / F.col("n_a"), 4)
        )
        .where(F.col("containment") >= F.lit(threshold))
        .select("id_a", "id_b", "containment")
    )


def containment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = CONTAINMENT_THRESHOLD,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Drop documents mostly CONTAINED in another document, keeping the
    container — the dedup action on top of ``containment_pairs`` (a
    quoted article dies, the page that wraps it survives).

    A doc A drops when some B holds ≥``threshold`` of A's shingles and
    B is strictly larger (shingle count; id ascending breaks exact
    ties, so mutual 100% containment keeps exactly one).  Same
    inverted-index shuffle shape as the pair scan; the drop set comes
    back as one broadcast-friendly anti-join.  ONE persisted shingle
    base feeds both the size lookup and the pair scan (the corpus is
    shingled once per call).
    """
    base = _shingle_base(df, text_col, id_col).persist()
    sizes = base.select("id", F.size("sh").alias("n"))
    pairs = _containment_pairs_from_base(base, threshold, max_shingle_df)
    ranked = (
        pairs.join(
            sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"),
            "id_b",
        )
        .where(
            (F.col("n_b") > F.col("n_a"))
            | ((F.col("n_b") == F.col("n_a")) & (F.col("id_b") < F.col("id_a")))
        )
    )
    dropped = _materialize_and_release(
        ranked.select(F.col("id_a").alias(id_col)).distinct(), base
    )
    return df.join(dropped, on=id_col, how="left_anti")


def build_minhash_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the corpus MinHash BANDING relation (id, sh, band,
    bh) on disk — the near-dup sibling of ``build_containment_index``.

    ``minhash_screen_stream`` used to recompute this from corpus text at
    every drain start (one full shingle+signature pass per ingest
    session); built once, drains hash-join the stored relation on
    (band, bh) — no text scan, no re-signing — and
    ``update_minhash_index`` appends accepted batches' bandings so the
    index tracks the corpus.  At cluster scale write it bucketed on
    (band, bh) to pre-co-locate the screen join."""
    _banded(corpus, text_col, id_col).write.mode("overwrite").parquet(path)


def update_minhash_index(
    batch: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append a screened/accepted batch's banding rows to a persisted
    MinHash index — O(|batch|), existing files untouched."""
    _banded(batch, text_col, id_col).write.mode("append").parquet(path)


def build_containment_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the corpus (cid, shingle-hash) inverted index on
    disk — the containment analog of ``ivf_write_index``.

    Rebuilding this index was the per-drain cost of
    ``containment_screen_stream``: every ingest session re-scanned and
    re-shingled the WHOLE corpus text (VERDICT r7 #6).  Built once,
    each drain reads back only the two integer-ish columns (no text
    scan, no shingling), and ``update_containment_index`` appends the
    accepted batches' shingles so the index tracks the corpus without
    ever rebuilding.  At cluster scale write it as a table bucketed on
    ``h`` to pre-co-locate the screen join's shuffle key; the plain
    parquet layout here mirrors the IVF index directory contract.
    """
    corpus.select(
        F.col(id_col).alias("cid"),
        F.explode(shingle_hash_array(text_col)).alias("h"),
    ).write.mode("overwrite").parquet(path)


def update_containment_index(
    batch: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append a screened/accepted batch's shingles to a persisted
    containment index — O(|batch|) maintenance, existing files
    untouched (the ``ivf_append_index`` pattern)."""
    batch.select(
        F.col(id_col).alias("cid"),
        F.explode(shingle_hash_array(text_col)).alias("h"),
    ).write.mode("append").parquet(path)


def build_containment_index_table(
    corpus: DataFrame,
    table_name: str,
    buckets: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Bucketed-TABLE form of ``build_containment_index``: the (cid, h)
    inverted index saved ``bucketBy(buckets, "h").sortBy("h")`` — the
    cluster-scale layout the path-form docstring promises.

    Every ingest screen joins the index on ``h``; with the index
    bucketed on that key Spark reads its buckets as the join's
    partitioning and the CORPUS-SIZED side of the join needs NO
    Exchange — only the small batch side shuffles to the bucket count.
    Driver-verified by ``op_bucketed_screen`` (bucketed screen plan has
    strictly fewer Exchanges than the plain-table screen, identical
    results).  Maintain with plain ``INSERT INTO`` appends (Spark
    bucket-writes each append); pass ``spark.table(table_name)`` as
    ``corpus_inverted`` to the screens.
    """
    corpus.select(
        F.col(id_col).alias("cid"),
        F.explode(shingle_hash_array(text_col)).alias("h"),
    ).write.format("parquet").bucketBy(buckets, "h").sortBy("h").mode(
        "overwrite"
    ).saveAsTable(table_name)


def containment_incremental_pairs(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = CONTAINMENT_THRESHOLD,
    corpus_inverted: DataFrame | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Ingest-time containment screen: which BATCH docs are mostly
    contained in an EXISTING corpus doc (quotes, mirrors, re-posts of
    already-held content) — the containment member of the incremental
    screen family (exact anti-join / Bloom / MinHash / this).
    ``materialize=False`` returns the LAZY plan (no batch-base persist,
    no checkpoint) for callers that need to inspect or re-execute it —
    the plan-property probes do.

    The corpus side is its (id, shingle-hash) inverted index —
    ``corpus_inverted`` at scale is a PERSISTED table maintained per
    ingest, so each batch explodes map-only and joins it on the hash
    without re-scanning corpus text; candidate cost is bounded by
    shingle co-occurrence, never |batch| × |corpus|.  Returns
    (batch_id, corpus_id, containment = shared/|batch shingles| ≥
    threshold, 4dp).
    """
    b_base = batch.select(
        F.col(id_col).alias("bid"),
        shingle_hash_array(text_col).alias("sh"),
    )
    if materialize:
        b_base = b_base.persist()
    b_sizes = b_base.select("bid", F.size("sh").alias("n_b"))
    b_inv = b_base.select("bid", F.explode("sh").alias("h"))
    c_inv = (
        corpus_inverted
        if corpus_inverted is not None
        else corpus.select(
            F.col(id_col).alias("cid"),
            F.explode(shingle_hash_array(text_col)).alias("h"),
        )
    )
    shared = (
        b_inv.join(c_inv, on="h")
        .groupBy("bid", "cid")
        # count DISTINCT matched shingles, not join rows: a duplicate
        # (cid, h) row in a maintained inverted index (e.g. a
        # crash-resumed self_screen batch re-appending its accepted
        # shingles) must not inflate the containment score — distinct-h
        # makes the screen idempotent under at-least-once index
        # maintenance; identical result on a duplicate-free index
        .agg(F.count_distinct("h").alias("shared"))
    )
    out = (
        shared.join(b_sizes, "bid")
        .withColumn("containment", F.round(F.col("shared") / F.col("n_b"), 4))
        .where(F.col("containment") >= F.lit(threshold))
        .select(
            F.col("bid").alias("batch_id"),
            F.col("cid").alias("corpus_id"),
            "containment",
        )
    )
    if not materialize:
        return out
    # release the batch base per call — a streaming drain invokes this
    # once per micro-batch, and unbalanced persists accumulated for the
    # whole drain (ADVICE r7); the caller-owned corpus_inverted persist
    # stays the caller's to manage
    return _materialize_and_release(out, b_base)
