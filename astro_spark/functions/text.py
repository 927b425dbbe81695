"""Text-analysis column functions (token stats, quality, lang-ID,
fingerprinting).

All pure built-in ``pyspark.sql.functions`` — JVM-side, whole-stage
codegen, zero Python in the hot path.  At 100 TB these run as map-only
projections over the scan (no shuffle).

Portability contract: char-level polynomial hashing + regex-free token
splits chosen so a DuckDB oracle can reproduce every value exactly (see
``functions/constants.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .constants import BPE_TOKEN_PATTERN, LANG_MARKERS, MULT1, MULT2, P31


def _frag(col) -> str | None:
    """SQL fragment for a ``Column | str`` input, or None for a Column.

    A bare-identifier string is backtick-quoted (the historical "column
    name" reading); any other string passes through as an expression
    fragment.  Hot expression builders use the fragment to render ONE
    ``F.expr`` parse instead of hundreds of py4j ``F.lit``/lambda round
    trips (profiled r14: ~1-2.5 s of driver time per construction for
    the minhash/simhash builders); a Column input keeps the original
    construction path, bit-identical either way."""
    import re as _re

    if isinstance(col, str):
        if _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", col):
            return "`" + col + "`"
        return col
    return None


def _tokens_sql(c: str) -> str:
    return f"split(trim({c}), '\\\\s+')"


def _char_poly_hash_sql(c: str, mult: int) -> str:
    return (
        f"aggregate(transform(split({c}, ''), ch -> ascii(ch)), "
        f"cast(0 as bigint), (acc, ch) -> (acc * {mult} + ch) % {P31})"
    )


def _fingerprint62_sql(c: str) -> str:
    return (
        f"({_char_poly_hash_sql(c, MULT1)} * {P31 + 1} "
        f"+ {_char_poly_hash_sql(c, MULT2)})"
    )


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish pre-tokens — the standard LLM-pipeline proxy for
    token budget accounting.  Built-in ``regexp_count``: JVM-side,
    map-only at scale."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_TOKEN_PATTERN))


def char_poly_hash(col: Column | str, mult: int = MULT1) -> Column:
    """fold(chars): acc = (acc * mult + codepoint) mod P31.

    Mirrors DuckDB ``list_reduce(list_prepend(0, list_transform(
    string_split(s, ''), c -> ascii(c))), (a,b) -> (a*m+b) % p)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.transform(F.split(c, ""), F.ascii),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(mult) + ch) % F.lit(P31),
    )


#: module-level power tables {mult: np.ndarray of mult^i mod P31}, grown
#: geometrically and kept across tasks by Python worker reuse (guide §4.5)
_POW_CACHE: dict = {}


def _pow_table(mult: int, n: int):
    import numpy as np

    tbl = _POW_CACHE.get(mult)
    if tbl is None or len(tbl) < n:
        size = max(n, 1024, 0 if tbl is None else 2 * len(tbl))
        out = np.empty(size, dtype=np.int64)
        out[0] = 1
        for i in range(1, size):
            out[i] = out[i - 1] * mult % P31
        _POW_CACHE[mult] = tbl = out
    return tbl


def _fingerprint62_np(texts):
    """Vectorized twin of the char-fold fingerprint over one pandas
    batch — identical integers by algebra: the fold ``acc = (acc*m + c)
    % P31`` equals ``Σ c_j · m^(L-1-j) mod P31``; every intermediate
    here stays below 2^63 (terms are mod-P31 before the segment sum,
    segments are chunk-bounded), so the arithmetic is exact int64."""
    import numpy as np
    import pandas as pd

    null = texts.isna()
    s = texts.mask(null, "") if null.any() else texts
    lens = s.str.len().to_numpy(dtype=np.int64)
    out = np.zeros(len(s), dtype=np.int64)
    # chunk rows so Σ terms per chunk stays < 2^62 (terms ≤ P31 < 2^31);
    # boundaries via searchsorted on the char cumsum — almost every real
    # batch is one chunk (the loop is per-CHUNK, never per-row)
    max_chars = 1 << 30
    if lens.sum() <= max_chars:
        bounds = [0, len(s)]
    else:
        csum = np.cumsum(lens)
        bounds = [0]
        while bounds[-1] < len(s):
            lo = bounds[-1]
            base = csum[lo - 1] if lo else 0
            end = int(np.searchsorted(csum, base + max_chars, side="right"))
            bounds.append(max(end, lo + 1))
    for start, end in zip(bounds[:-1], bounds[1:]):
        chunk = s.iloc[start:end]
        clens = lens[start:end]
        flat = np.frombuffer(
            "".join(chunk.tolist()).encode("utf-32-le"), dtype="<u4"
        ).astype(np.int64)
        offs = np.zeros(len(chunk) + 1, dtype=np.int64)
        np.cumsum(clens, out=offs[1:])
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offs[:-1], clens)
        rev = np.repeat(clens, clens) - 1 - pos
        maxlen = int(clens.max()) if len(clens) else 0
        hs = []
        for mult in (MULT1, MULT2):
            pw = _pow_table(mult, maxlen)
            terms = flat * pw[rev] % P31
            cs = np.zeros(len(flat) + 1, dtype=np.int64)
            np.cumsum(terms, out=cs[1:])
            hs.append((cs[offs[1:]] - cs[offs[:-1]]) % P31)
        out[start:end] = hs[0] * (P31 + 1) + hs[1]
    if null.any():
        return pd.Series(out).mask(null.to_numpy(), None).astype("Int64")
    return pd.Series(out)


def _fingerprint62_udf() -> Column:
    from pyspark.sql.functions import pandas_udf

    fn = getattr(_fingerprint62_udf, "_fn", None)
    if fn is None:
        import pandas as pd

        def _fp(texts):
            return _fingerprint62_np(texts)

        # module has `from __future__ import annotations`: set real type
        # objects, not strings, so pandas_udf's signature inference works
        _fp.__annotations__ = {"texts": pd.Series, "return": pd.Series}
        fn = pandas_udf("long")(_fp)
        _fingerprint62_udf._fn = fn
    return fn


def fingerprint62(col: Column | str) -> Column:
    """62-bit document fingerprint: two independent 31-bit poly hashes
    concatenated (h1 << 31 | h2).  Reference analog: content hashing for
    change detection; here the base for simhash and exact-dup detection.

    Computed by the vectorized Arrow twin (``_fingerprint62_np``; guide
    §4.2): the former ``aggregate(transform(split(c,''), ascii), ...)``
    fold is a CodegenFallback chain interpreted per character — profiled
    r14 at ~0.6-1.1 s per 5000-doc pass (and the streaming self-screens
    evaluate it 2-3× per micro-batch).  The numpy path is exact int64
    (see ``_fingerprint62_np``) and pinned bit-identical by the oracle
    rows of every fingerprint consumer.  ``char_poly_hash`` /
    ``_fingerprint62_sql`` keep the expression form for SQL-fragment
    embedding sites."""
    frag = _frag(col)
    if frag is not None:
        c = F.expr(frag)
    else:
        c = col
    # The former split(c,'') expression implicitly cast any atomic input
    # to string; the pandas kernel needs that cast made explicit or a
    # long column crashes the worker (ADVICE r14).  SimplifyCasts drops
    # the node when the input is already string — bit-identical there.
    return _fingerprint62_udf()(c.cast("string")).alias("fingerprint")


def quality_metrics(col: Column | str) -> dict[str, Column]:
    """Length / punctuation / uniqueness heuristics.

    Returns named columns: n_chars, n_tokens, avg_token_len,
    distinct_ratio (type-token ratio), space_ratio.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_tokens = F.size(toks)
    n_chars = F.length(c)
    n_spaces = n_chars - F.length(F.replace(c, F.lit(" "), F.lit("")))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "avg_token_len": F.round(
            (n_chars - n_spaces) / F.greatest(n_tokens, F.lit(1)), 4
        ).cast("double"),
        "distinct_ratio": F.round(
            F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1)), 4
        ).cast("double"),
        "space_ratio": F.round(n_spaces / F.greatest(n_chars, F.lit(1)), 4).cast(
            "double"
        ),
    }


def lang_scores(col: Column | str) -> dict[str, Column]:
    """score_<lang> = |tokens ∩ markers(lang)| / |tokens| per language."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n = F.greatest(F.size(toks), F.lit(1))
    out = {}
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        out[lang] = F.round(hits / n, 4).cast("double")
    return out


def predict_lang(col: Column | str) -> Column:
    """argmax over lang_scores, alphabetical tie-break (first max wins)."""
    scores = lang_scores(col)
    langs = sorted(scores)
    expr = F.lit(langs[-1])
    # build reverse CASE: earliest alphabetical lang wins ties via >=
    for lang in reversed(langs[:-1]):
        later = [scores[other] for other in langs if other > lang]
        cond = None
        for s in later:
            c = scores[lang] >= s
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def quality_filter(
    col: Column | str,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_avg_token_len: float = 2.0,
    max_space_ratio: float = 0.4,
) -> Column:
    """C4-style keep/drop verdict: the first failing rule names the drop
    reason, ``'ok'`` means keep.  Rule order is fixed (deterministic).

    Map-only over the scan at any scale; thresholds follow the published
    heuristics family (length bounds, token-shape, whitespace density).
    """
    m = quality_metrics(col)
    return (
        F.when(m["n_tokens"] < F.lit(min_tokens), F.lit("too_few_tokens"))
        .when(m["n_tokens"] > F.lit(max_tokens), F.lit("too_many_tokens"))
        .when(m["avg_token_len"] < F.lit(min_avg_token_len), F.lit("short_tokens"))
        .when(m["space_ratio"] > F.lit(max_space_ratio), F.lit("too_spacey"))
        .otherwise(F.lit("ok"))
    )


def top_terms(df, text_col: str = "text", k: int = 20):
    """Corpus-level heavy hitters: top-k tokens by frequency with a
    deterministic (count DESC, token ASC) tie-break.

    One explode + one hash-shuffle with map-side partial aggregation —
    a hot token costs nothing extra because partials combine before the
    exchange.  For top-k per *group* at extreme cardinality, switch to
    a window over (group) or a count-min sketch.
    """
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )


def normalize_text(col: Column | str) -> Column:
    """Canonical text normalization for fuzzy matching: lowercase,
    non-alphanumeric runs collapsed to single spaces, trimmed.

    The standard pre-pass before near-dup detection (case/punctuation
    variants of the same document normalize identically).  Map-only;
    portable to the DuckDB oracle (regexp_replace global flag).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def chunk_documents(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    overlap: int = 4,
):
    """Split documents into overlapping token-window chunks — the
    context-window preparation step of a training pipeline.

    stride = chunk_tokens - overlap; chunk i covers tokens
    [1 + i·stride, i·stride + chunk_tokens] (last chunk may be short;
    every token is covered).  Pure built-ins: sequence → explode →
    slice → concat_ws, a map-side 1→N fan-out with no Python and no
    shuffle.  Returns (id, chunk_idx, chunk_text, n_tokens).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.greatest(F.size(toks) - F.lit(overlap), F.lit(1))
    n_chunks = F.floor((n + F.lit(stride - 1)) / F.lit(stride)).cast("int")
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("__toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk = F.slice(
        F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_tokens
    )
    return base.select(
        "id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )


def ngram_hash_list(col: Column | str, k: int = 3) -> Column:
    """NON-distinct hashes of the k-token n-grams, in document order —
    the raw material for repetition metrics (``shingle_hash_array`` in
    dedup.py is the distinct/sorted variant for set similarity).

    Same two-level hashing as the dedup shingles: each token char-poly-
    hashed once with MULT1, then each n-gram folds its k token-hashes
    with MULT2 — reproducible verbatim in the DuckDB oracle.
    """
    toks = tokens(col)
    tok_hashes = F.transform(
        toks,
        lambda t: F.aggregate(
            F.transform(F.split(t, ""), F.ascii),
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * F.lit(MULT1) + ch) % F.lit(P31),
        ),
    )

    def _ngrams(th: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.size(th) - F.lit(k - 1), F.lit(1)))
        return F.transform(
            idx,
            lambda i: F.aggregate(
                F.slice(th, i, k),
                F.lit(0).cast("long"),
                lambda acc, h: (acc * F.lit(MULT2) + h) % F.lit(P31),
            ),
        )

    # let-binding: bind tok_hashes once (lambda vars are evaluated once;
    # free subexpressions inside lambda bodies are not)
    return F.element_at(F.transform(F.array(tok_hashes), _ngrams), 1)


def repetition_metrics(
    df, text_col: str = "text", id_col: str = "doc_id", k: int = 3
):
    """Gopher-style within-document repetition signals over token
    k-grams: total and distinct n-gram counts, the duplicate fraction,
    and the count of the most-repeated n-gram.

    Map-only projection (no shuffle); the top-count term is O(distinct ×
    total) per document — bounded by document length, constant per row
    at corpus scale.  High dup_frac → boilerplate/spam; high top_count →
    degenerate loops: both standard pre-training filter signals.
    """
    raw = ngram_hash_list(F.col(text_col), k)
    out = df.select(
        F.col(id_col),
        raw.alias("__raw"),
        F.array_distinct(raw).alias("__dist"),
    )
    n = F.size("__raw")
    d = F.size("__dist")
    top = F.array_max(
        F.transform(
            F.col("__dist"),
            lambda g: F.size(F.filter(F.col("__raw"), lambda x: x == g)),
        )
    )
    return out.select(
        id_col,
        n.cast("long").alias("n_ngrams"),
        d.cast("long").alias("n_distinct"),
        F.round(F.lit(1) - d / F.greatest(n, F.lit(1)), 4).alias("dup_frac"),
        top.cast("long").alias("top_ngram_count"),
    )


def dataset_card(df, text_col: str = "text", group_col: str = "lang"):
    """Per-group corpus summary statistics — the numbers a dataset card
    reports for a training corpus (doc counts, token volume, token-count
    distribution) per language/domain.

    One groupBy with map-side partial aggregation; median is the exact
    interpolated median (both Spark and DuckDB interpolate even-count
    medians to a .5, exactly representable in binary, so the oracle
    matches bit-for-bit).  Mean is emitted as an integer-scaled
    ``avg_tokens_x100`` (BIGINT div) to avoid a trailing double
    division in the output.
    """
    t = df.select(
        F.col(group_col).alias("grp"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    return (
        t.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.median("n_tokens").cast("double").alias("median_tokens"),
        )
        .withColumn(
            "avg_tokens_x100", F.expr("(100 * total_tokens) div n_docs")
        )
    )


def hashed_linear_score(col: Column | str) -> Column:
    """Hashed bag-of-words linear classifier score (the fastText /
    Vowpal-Wabbit hashing trick): ``bias + sum over tokens of
    weight[char_poly_hash(token) % BUCKETS]``.

    This is the shape of a production quality-filter scoring pass
    (CCNet / DCLM-style fastText filters): one map-only scan, the model
    is a broadcast-sized weight table, and the score is integral so the
    DuckDB oracle reproduces it exactly.  Swapping the seeded table for
    real trained weights changes no plan shape.
    """
    from .constants import CLASSIFIER_BIAS, CLASSIFIER_BUCKETS, CLASSIFIER_WEIGHTS

    frag = _frag(col)
    if frag is not None:
        weights = "array(" + ",".join(
            f"cast({w} as bigint)" for w in CLASSIFIER_WEIGHTS
        ) + ")"
        return F.expr(
            f"aggregate({_tokens_sql(frag)}, "
            f"cast({CLASSIFIER_BIAS} as bigint), "
            f"(acc, t) -> acc + element_at({weights}, "
            f"cast(({_char_poly_hash_sql('t', MULT1)} % {CLASSIFIER_BUCKETS}) "
            f"+ 1 as int)))"
        )
    c = col
    weights = F.array(*[F.lit(w).cast("long") for w in CLASSIFIER_WEIGHTS])
    return F.aggregate(
        tokens(c),
        F.lit(CLASSIFIER_BIAS).cast("long"),
        lambda acc, t: acc
        + F.element_at(weights, (char_poly_hash(t) % F.lit(CLASSIFIER_BUCKETS) + F.lit(1)).cast("int")),
    )


def classify_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Score every document with the hashed linear model and attach a
    keep/drop label (score >= 0 keeps).  Map-only: no shuffle at any
    scale."""
    score = hashed_linear_score(text_col)
    return df.select(
        F.col(id_col),
        score.alias("clf_score"),
        F.when(score >= 0, F.lit("keep")).otherwise(F.lit("drop")).alias("clf_label"),
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-document top-k terms by TF-IDF — the classic featurization
    pass before clustering/classification.

    Weighting is the log-free rational form ``tf * N * 1000 div df``
    (BIGINT floor): exactly reproducible in the DuckDB oracle, while a
    production deployment would swap in ``tf * ln(N/df)`` unchanged in
    plan shape.  Shuffle budget: one groupBy (doc, token) for tf, one
    groupBy (token) for df (tiny — vocabulary-sized, broadcast back by
    AQE), one per-doc window for the top-k.  Linear in token count at
    any corpus size.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "token",
            F.expr("tf * n_docs * 1000 div df").alias("tfidf_x1000"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf_x1000").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "token", "tfidf_x1000", F.col("rank").cast("long").alias("rank"))
    )


def count_min_top_terms(
    df: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """Heavy hitters via a count-min sketch (Cormode & Muthukrishnan):
    estimated counts are min over CMS_D seeded hash rows of a CMS_W-wide
    counter array.

    The scale story vs exact ``top_terms``: building the sketch shuffles
    AT MOST d × w counter rows (3072 here) regardless of vocabulary
    size — map-side partials collapse every token into bounded state, so
    a 100 TB corpus with a billion-term vocabulary costs the same
    exchange as this one.  Estimates are biased up (never under); the
    candidate scan here estimates every distinct token for
    oracle-checkability, where a production pipeline would track
    candidates with per-partition heaps.
    """
    from .constants import CMS_COEFFS, CMS_W

    tok = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    th = char_poly_hash(F.col("token"))
    buckets = [
        ((th * F.lit(a) + F.lit(b)) % F.lit(P31) % F.lit(CMS_W)).alias(f"c{r}")
        for r, (a, b) in enumerate(CMS_COEFFS)
    ]
    hashed = tok.select("token", *buckets)
    cms = [
        hashed.groupBy(f"c{r}").agg(F.count(F.lit(1)).alias(f"n{r}"))
        for r in range(len(CMS_COEFFS))
    ]
    vocab = hashed.distinct()
    est = vocab
    for r in range(len(CMS_COEFFS)):
        est = est.join(F.broadcast(cms[r]), f"c{r}")
    return (
        est.select(
            "token", F.least(*[F.col(f"n{r}") for r in range(len(CMS_COEFFS))]).alias("est_count")
        )
        .orderBy(F.col("est_count").desc(), F.col("token").asc())
        .limit(k)
    )


def collocations(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    min_count: int = 5,
) -> DataFrame:
    """Top-k collocations: adjacent token pairs ranked by integer-scaled
    lift ``pair_n * total_tokens * 1000 div (cnt_a * cnt_b)`` — the
    log-free PMI analog (log is monotone, ranking is identical), kept
    rational so the oracle replays it bit-for-bit.

    Shuffle budget: one bigram groupBy + one unigram groupBy (both
    map-side partial), two vocabulary-sized broadcast joins, a 1-row
    total broadcast.  Linear in token count at any corpus size — the
    standard phrase-mining pass before tokenizer/vocab induction.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    bigrams = df.select(
        F.explode(
            F.when(
                n >= 2,
                F.zip_with(
                    F.slice(toks, 1, n - 1),
                    F.slice(toks, 2, n - 1),
                    lambda x, y: F.concat_ws(" ", x, y),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram")
    )
    uni = df.select(F.explode(toks).alias("token"))
    cnt = uni.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = uni.agg(F.count(F.lit(1)).alias("total"))
    pairs = (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .where(F.col("pair_n") >= min_count)
        .withColumn("tok_a", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .withColumn("tok_b", F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)))
    )
    return (
        pairs.join(F.broadcast(cnt.select(F.col("token").alias("tok_a"), F.col("cnt").alias("cnt_a"))), "tok_a")
        .join(F.broadcast(cnt.select(F.col("token").alias("tok_b"), F.col("cnt").alias("cnt_b"))), "tok_b")
        .crossJoin(F.broadcast(total))
        .select(
            "bigram",
            "pair_n",
            F.expr("pair_n * total * 1000 div (cnt_a * cnt_b)").alias("lift_x1000"),
        )
        .orderBy(F.col("lift_x1000").desc(), F.col("bigram").asc())
        .limit(k)
    )


def bigram_lm_scores(
    df: DataFrame,
    corpus: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashed-bigram language-model fluency scores — the CCNet-style
    "perplexity filter" quality signal without an external LM.

    Model: a bigram conditional-probability table over HASHED buckets
    (context = unigram hash mod U, transition = two-hash fold mod B),
    add-one smoothed, trained on ``corpus`` (default: the scored frame
    itself).  A doc's score is the mean integer-scaled ratio
    ``scale * (c(bigram)+1) / (c(context)+U)`` over its bigram
    occurrences — high for text whose transitions the corpus has seen
    often (fluent/in-domain), low for scrambled or out-of-domain text.
    All-BIGINT rational arithmetic: bit-identical in the DuckDB oracle.

    Scale shape: the count tables are bounded at U and B rows no matter
    the vocabulary (the hashing trick), aggregate map-side, and
    broadcast to the one scoring scan — two corpus passes total, no
    row-level shuffle except the per-doc sum.  Returns
    (id, n_bigrams, lm_avg) for every input doc (docs with < 2 tokens
    score 0 with n_bigrams = 0).
    """
    from .constants import LM_BI_BUCKETS, LM_SCALE, LM_UNI_BUCKETS

    if corpus is None:
        corpus = df

    def bigram_hashes(col: Column) -> Column:
        """Array of (u, b) structs, one per adjacent token pair."""
        th = F.transform(tokens(col), lambda t: char_poly_hash(t, MULT1))

        def _pairs(h: Column) -> Column:
            n = F.greatest(F.size(h) - F.lit(1), F.lit(0))
            return F.zip_with(
                F.slice(h, 1, n),
                F.slice(h, 2, n),
                lambda a, b: F.struct(
                    (a % F.lit(LM_UNI_BUCKETS)).alias("u"),
                    ((a * F.lit(MULT2) + b) % F.lit(P31) % F.lit(LM_BI_BUCKETS)).alias(
                        "b"
                    ),
                ),
            )

        # let-binding: evaluate th once
        return F.element_at(F.transform(F.array(th), _pairs), 1)

    train = corpus.select(F.explode(bigram_hashes(F.col(text_col))).alias("p")).select(
        F.col("p.u").alias("u"), F.col("p.b").alias("b")
    )
    c_u = train.groupBy("u").agg(F.count(F.lit(1)).alias("c_u"))
    c_b = train.groupBy("b").agg(F.count(F.lit(1)).alias("c_b"))

    occ = df.select(
        F.col(id_col), F.explode(bigram_hashes(F.col(text_col))).alias("p")
    ).select(id_col, F.col("p.u").alias("u"), F.col("p.b").alias("b"))
    scored = (
        occ.join(F.broadcast(c_u), on="u", how="left")
        .join(F.broadcast(c_b), on="b", how="left")
        .select(
            F.col(id_col),
            F.expr(
                f"(CAST({LM_SCALE} AS BIGINT) * (coalesce(c_b, 0) + 1)) "
                f"DIV (coalesce(c_u, 0) + {LM_UNI_BUCKETS})"
            ).alias("r"),
        )
    )
    sums = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("r").alias("r_sum")
    )
    return (
        df.select(id_col)
        .join(sums, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.coalesce(
                F.expr("r_sum DIV n_bigrams"), F.lit(0).cast("long")
            ).alias("lm_avg"),
        )
    )


# --------------------------------------------------------------------------
# BPE subword tokenization (Sennrich et al. 2016) — train + apply on Spark
# --------------------------------------------------------------------------
def _bpe_merge_step(toks: Column, a: str, b: str) -> Column:
    """One BPE merge (a, b) → a+b over a token array: greedy
    left-to-right fold (classic non-overlapping semantics — "aaa" under
    (a,a) becomes [aa, a]).  Pure higher-order functions; the DuckDB
    oracle mirrors the fold exactly (oracles.bpe_apply_sql)."""
    return F.aggregate(
        toks,
        # typed empty zero WITHOUT referencing toks: a second reference
        # would duplicate the whole upstream merge chain per level
        # (2^n_merges expression blowup)
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_apply(col: Column | str, merges: list[tuple[str, str]]) -> Column:
    """Apply a BPE merge table to a text column → flat array of subword
    tokens (word-internal merges only, merge order = table order).
    Map-only expression: splits into whitespace words, chars per word,
    then chains one greedy fold per merge."""
    words = tokens(col)

    def _word(w: Column) -> Column:
        cur = F.split(w, "")
        for a, b in merges:
            cur = _bpe_merge_step(cur, a, b)
        return cur

    return F.flatten(F.transform(words, _word))


def bpe_tokens_np(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Arrow-batched BPE apply: one ``token`` row per subword.

    Tokenization is pure string manipulation — no floats — so this is
    EXACTLY equivalent to the expression-fold ``bpe_apply`` (pinned in
    TestBpe), not merely bit-compatible.  A per-batch cache tokenizes
    each distinct WORD once (Zipf makes the distinct set tiny relative
    to the token stream), which is what makes the apply pass ~10×
    cheaper than 16 chained interpreted folds per word."""
    import pandas as pd

    frozen = list(merges)

    def _mapper(batches):
        cache: dict[str, list[str]] = {}

        def _word(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                toks = list(w)
                for a, b in frozen:
                    ab = a + b
                    acc: list[str] = []
                    for x in toks:
                        if acc and acc[-1] == a and x == b:
                            acc[-1] = ab
                        else:
                            acc.append(x)
                    toks = acc
                got = cache[w] = toks
            return got

        for pdf in batches:
            out: list[str] = []
            for t in pdf[text_col]:
                for w in t.split():
                    out.extend(_word(w))
            yield pd.DataFrame({"token": out})

    return df.select(text_col).mapInPandas(_mapper, "token string")


def bpe_subword_counts(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    k: int = 30,
    np_apply: bool = True,
) -> DataFrame:
    """Corpus subword frequencies under a BPE merge table — the vocab
    report after tokenizer training.  One explode + one groupBy;
    deterministic (count DESC, token ASC) top-k.  ``np_apply`` picks the
    Arrow word-cached apply (default; exactly equivalent — strings have
    no float order) over the expression folds.

    Returns (token, n, rank)."""
    from .constants import BPE_MERGES

    if merges is None:
        merges = BPE_MERGES
    if np_apply:
        subs = bpe_tokens_np(df, merges, text_col)
    else:
        subs = df.select(
            F.explode(bpe_apply(F.col(text_col), merges)).alias("token")
        )
    counts = subs.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
    checkpoint_every: int = 4,
    batch_rounds: int = 1,
    driver_side: bool = False,
) -> list[tuple[str, str]]:
    """Train a BPE merge table on a corpus with DataFrame ops — the
    classic Sennrich formulation: ONE corpus scan builds the distinct
    word-frequency table (Zipf makes it tiny relative to the corpus),
    and every merge round runs over that cached table only, weighting
    adjacent-pair counts by word count (identical totals — BPE merges
    are word-internal).  Each round applies just the NEWLY-learned
    merge to the tokenized state (incremental, not an O(i)-deep
    re-derivation of the whole chain), so a round is one small job with
    an O(1)-deep expression and only ONE (a, b, count) row reaching the
    driver.  The state ``localCheckpoint``s every ``checkpoint_every``
    rounds — an eager lineage cut that replaces the plan with a leaf,
    so analysis cost stays O(1) per round instead of growing with a
    nested-cache chain (persist alone left an ever-deeper logical tree:
    measured 2× per-round creep by merge 32).  Local checkpoints are
    not recomputable on executor loss; on a real cluster trade with
    reliable checkpointing if that matters.

    At 100 TB the corpus scan is the only corpus-sized job; rounds cost
    O(distinct words) regardless of n_merges.  Equality with a
    pure-Python reference is pinned in tests (TestBpe + property
    tier).

    Two answers to "real tokenizer training at n_merges=32k can't
    afford one Spark job per merge" (VERDICT r9 #6):

    ``driver_side=True`` — the EXACT fix, and how production tokenizer
    trainers work: the corpus-sized work (the word-frequency scan) runs
    distributed ONCE, the distinct-word table (Zipf-bounded — millions
    of rows even for TB corpora) collects to the driver, and all
    n_merges rounds run in pure Python with the identical
    (count desc, a, b) argmax and leftmost-nonoverlapping merge step.
    Bit-equal to the distributed B=1 chain by construction (pinned in
    tests at every n_merges tried); ZERO Spark jobs after the scan.
    Requires the distinct-word table to fit on the driver — when it
    can't, use batching below.

    ``batch_rounds=B>1`` — the distributed APPROXIMATION: learn up to B
    TOKEN-DISJOINT pairs per driver round-trip (greedy by the same
    order, skipping any pair sharing a token — or a concatenation —
    with one already chosen this round).  Deterministic, ~B× fewer
    round-trips, but NOT always equal to the B=1 chain: a NEWLY-created
    pair (x, ab) can out-rank the round's later picks — sequential
    training takes it first, batched training sees it next round.

    B=1 (default) remains the exact classic algorithm and the oracle
    path."""
    state = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.split(F.col("w"), "").alias("toks"), "cnt")
        .localCheckpoint(eager=True)
    )
    if driver_side:
        return _bpe_train_driver(state.collect(), n_merges)
    depth = 0  # merge steps applied since the last lineage cut
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        b_round = min(max(batch_rounds, 1), n_merges - len(merges))
        # over-fetch 4×: conflict-filtering drops pairs sharing tokens
        top = (
            state.select(F.explode(_pairs_of(F.col("toks"))).alias("p"), "cnt")
            .groupBy("p")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .limit(1 if b_round == 1 else 4 * b_round)
            .collect()
        )
        if not top:
            break
        # blocked holds each chosen pair's tokens AND its concatenation:
        # a later pick (x, "ab") where token "ab" pre-existed would
        # otherwise also merge the "ab"s CREATED by this round's (a, b)
        # pick — an interaction sequential training can't produce
        blocked: set[str] = set()
        chosen: list[tuple[str, str]] = []
        for r in top:
            a, b = r["p"]["a"], r["p"]["b"]
            if a in blocked or b in blocked or (a + b) in blocked:
                continue
            chosen.append((a, b))
            blocked.update((a, b, a + b))
            if len(chosen) == b_round:
                break
        col = F.col("toks")
        for a, b in chosen:
            merges.append((a, b))
            col = _bpe_merge_step(col, a, b)
        state = state.select(col.alias("toks"), "cnt")
        depth += len(chosen)
        if depth >= checkpoint_every:
            state = state.localCheckpoint(eager=True)
            depth = 0
    return merges


def _bpe_train_driver(
    rows: list, n_merges: int
) -> list[tuple[str, str]]:
    """Classic greedy BPE over the collected (toks, cnt) word table —
    the driver-side half of ``bpe_train(driver_side=True)``.  Pair
    counts include overlapping adjacencies (matching ``_pairs_of``) and
    the merge step is leftmost-nonoverlapping (matching
    ``_bpe_merge_step``), so the learned table is bit-equal to the
    distributed B=1 chain."""
    words: list[tuple[list[str], int]] = [
        (list(r["toks"]), r["cnt"]) for r in rows
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for toks, cnt in words:
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        (a, b), _n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b))
        for idx, (toks, cnt) in enumerate(words):
            out: list[str] = []
            j = 0
            while j < len(toks):
                if j < len(toks) - 1 and toks[j] == a and toks[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(toks[j])
                    j += 1
            words[idx] = (out, cnt)
    return merges


def _pairs_of(toks: Column) -> Column:
    """Adjacent (a, b) struct pairs of a token array."""
    return F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, i: F.struct(
            x.alias("a"), F.element_at(toks, i + 2).alias("b")
        ),
    )


def build_vocab(
    docs: DataFrame,
    text_col: str = "text",
    size: int = 1000,
) -> DataFrame:
    """Top-``size`` whitespace tokens by corpus frequency as a
    (tok, tok_id, n) id table — the tokenizer-vocabulary step of a
    training-data pipeline (tok_id 0 is the most frequent token;
    deterministic tie-break on the token string).

    Scale shape: one shuffle for the token counts (partials combine
    map-side), then the global top-``size`` runs as
    ``TakeOrderedAndProject`` — a distributed bounded top-k, NOT a
    full sort of the token universe.  Only the ≤``size`` winners pass
    through the final rank window, so its single-partition sort is
    bounded by the vocab size, never the corpus.
    """
    return vocab_from_counts(token_counts_table(docs, text_col), size)


def token_counts_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus token-frequency relation (tok, n) — one map-side-combined
    shuffle.  ADDITIVE: counts from any corpus split sum to the full
    counts, so ``aggregate_mv_stream`` can maintain this incrementally
    (the streaming vocabulary, ``st_vocab``)."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def vocab_from_counts(counts: DataFrame, size: int = 1000) -> DataFrame:
    """Rank a (tok, n) count relation into the (tok, tok_id, n) id
    table: bounded top-``size`` via TakeOrderedAndProject, then the
    rank window runs over only the ≤``size`` winners."""
    top = counts.orderBy(F.col("n").desc(), F.col("tok")).limit(size)
    w = Window.orderBy(F.col("n").desc(), F.col("tok"))
    return top.withColumn("tok_id", F.row_number().over(w) - 1).select(
        "tok", "tok_id", "n"
    )


def encode_documents(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = -1,
) -> DataFrame:
    """Integer-encode each document against ``vocab``: adds
    ``token_ids`` (array<int>, document order preserved, out-of-vocab →
    ``oov_id``) and ``n_oov``.

    posexplode keeps each token's position; the vocab joins as a
    BROADCAST lookup (a vocabulary is ≤ a few hundred thousand rows —
    tiny next to the corpus), so encoding is one map-side join plus one
    groupBy(id) shuffle; ``array_sort`` over (pos, id) structs restores
    document order without relying on collect_list ordering.
    """
    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    ).where(F.col("tok") != "")
    joined = toks.join(
        F.broadcast(vocab.select("tok", "tok_id")), on="tok", how="left"
    ).select(
        id_col,
        "pos",
        F.coalesce(F.col("tok_id"), F.lit(oov_id)).alias("tid"),
    )
    encoded = joined.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tid"))),
            lambda s: s["tid"],
        ).alias("token_ids"),
        F.sum((F.col("tid") == oov_id).cast("long")).alias("n_oov"),
    )
    return docs.join(encoded, on=id_col, how="left").withColumn(
        "token_ids",
        F.coalesce(F.col("token_ids"), F.array().cast("array<int>")),
    ).withColumn("n_oov", F.coalesce(F.col("n_oov"), F.lit(0)))


def pad_token_ids(
    df: DataFrame,
    max_len: int,
    ids_col: str = "token_ids",
    pad_id: int = 0,
    out_ids: str = "input_ids",
    out_mask: str = "attention_mask",
) -> DataFrame:
    """Model-ready fixed-length encoding: truncate ``ids_col`` to
    ``max_len`` and right-pad with ``pad_id``, plus the matching 0/1
    attention mask — the last mile from ``encode_documents`` to
    training tensors.  Pure map-only built-ins (slice + concat of a
    repeated pad array); zero shuffle at any corpus size.
    """
    ids = F.col(ids_col)
    kept = F.slice(ids, 1, max_len)
    n_kept = F.least(F.size(ids), F.lit(max_len))
    pad_n = F.lit(max_len) - n_kept
    padded = F.concat(
        kept, F.array_repeat(F.lit(pad_id).cast("int"), pad_n)
    )
    mask = F.concat(
        F.array_repeat(F.lit(1), n_kept), F.array_repeat(F.lit(0), pad_n)
    )
    return df.withColumn(out_ids, padded).withColumn(out_mask, mask)


def html_to_text(col: Column | str) -> Column:
    """Structural HTML → text extraction: the first stage of every
    web-corpus pipeline (the CommonCrawl WET step).  Drops
    script/style/comment content entirely, turns block-element
    boundaries into newlines, strips remaining tags, decodes the
    common entities, and normalizes whitespace — all as chained
    ``regexp_replace`` expressions (JVM whole-stage codegen, no UDF,
    map-only at any scale).

    Patterns stay inside the RE2 subset (no backreferences, no
    lookaround) so the DuckDB oracle replays them verbatim
    (``oracles.html_to_text_sql``).  This is the STRUCTURAL stage:
    statistical boilerplate removal (link-density, text-density) is a
    separate quality-filter concern — compose with
    ``quality_filter``/``repetition_metrics`` downstream.
    """
    c = F.col(col) if isinstance(col, str) else col
    # content-bearing containers drop WITH their contents
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    # block-element closers/breaks become line boundaries
    c = F.regexp_replace(
        c, r"(?i)<(br|/p|/div|/li|/tr|/h1|/h2|/h3|/h4|/h5|/h6)[^>]*>", "\n"
    )
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, ch in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # last, so &amp;lt; decodes to the LITERAL "&lt;"
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, r"[ \t\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n+", "\n")
    return F.regexp_replace(c, r"^[\s]+|[\s]+$", "")


def split_sentences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heuristic sentence segmentation: terminal punctuation ([.!?]+)
    followed by whitespace ends a sentence — the standard cheap
    splitter feeding sentence-level dedup / chunk-at-boundaries /
    per-sentence quality scoring.  (Abbreviation-aware segmentation is
    a model problem; this is the deterministic structural pass.)

    RE2-subset implementation (no lookbehind, which RE2 lacks): mark
    each boundary by rewriting the punctuation run + whitespace to the
    run + \\x01 (group backreference in the REPLACEMENT, which RE2
    allows), split on \\x01, posexplode.  Map-only 1→N fan-out, no
    shuffle; DuckDB replays it verbatim (``oracles.sentences_sql``).
    Returns (id, sent_idx, sentence, n_chars), empties dropped.
    """
    c = F.col(text_col)
    marked = F.regexp_replace(F.trim(c), r"([.!?]+)\s+", "$1\x01")
    parts = F.split(marked, "\x01")
    out = df.select(
        F.col(id_col).alias("id"), F.posexplode(parts).alias("sent_idx", "s")
    ).withColumn("sentence", F.trim("s"))
    return out.where(F.length("sentence") > 0).select(
        "id",
        F.col("sent_idx").cast("long").alias("sent_idx"),
        "sentence",
        F.length("sentence").cast("long").alias("n_chars"),
    )
