"""DuckDB oracle-SQL generators for the portable text/dedup/similarity ops.

Each function returns a SQL string that reproduces — value-for-value — the
corresponding Spark implementation in ``text.py`` / ``dedup.py`` /
``similarity.py``.  Both sides are generated from ``constants.py``:
same primes, multipliers, MinHash coefficients, hyperplanes, marker
words, thresholds.  The fold order of every reduction is left-to-right
in both engines, so even float results are bit-identical.
"""

from __future__ import annotations

from .constants import (
    BPE_TOKEN_PATTERN,
    COSINE_DUP_THRESHOLD,
    EMBEDDING_DIM,
    HYPERPLANES,
    LANG_MARKERS,
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
    SPAN_MIN_DOCS,
    SPAN_W,
)

# --------------------------------------------------------------------------
# scalar building blocks
# --------------------------------------------------------------------------


def poly_hash(expr: str, mult: int = MULT1) -> str:
    """(fold chars: acc*mult + codepoint mod P31) — mirrors
    text.char_poly_hash."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform(string_split({expr}, ''), "
        f"c -> ascii(c)::BIGINT)), (a, b) -> (a * {mult} + b) % {P31})"
    )


def tokens(expr: str) -> str:
    return f"string_split_regex(trim({expr}), '\\s+')"


def fingerprint62(expr: str) -> str:
    return f"({poly_hash(expr, MULT1)} * {P31 + 1} + {poly_hash(expr, MULT2)})"


def shingle_hashes(toks: str, k: int = SHINGLE_K) -> str:
    """Distinct sorted hashes of k-word shingles — mirrors
    dedup.shingle_hash_array's two-level hashing (token char-hash with
    MULT1, then fold k token-hashes with MULT2)."""
    th = f"list_transform({toks}, t -> {poly_hash('t', MULT1)})"
    shingles = (
        f"list_transform(range(1, greatest(len({th}) - {k - 1}, 1) + 1), "
        f"i -> list_reduce(list_prepend(0::BIGINT, list_slice({th}, i, i + {k - 1})), "
        f"(a, b) -> (a * {MULT2} + b) % {P31}))"
    )
    return f"list_sort(list_distinct({shingles}))"


def dot(a: str, b: str, dim: int = EMBEDDING_DIM) -> str:
    """Left-to-right fold of products — mirrors similarity.dot."""
    prods = f"list_transform(range(1, {dim} + 1), i -> {a}[i] * {b}[i])"
    return f"list_reduce(list_prepend(0.0::DOUBLE, {prods}), (x, y) -> x + y)"


def cosine(a: str, b: str) -> str:
    return f"({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"


def plane_literal(i: int) -> str:
    vals = ", ".join(f"{v!r}::DOUBLE" for v in HYPERPLANES[i])
    return f"[{vals}]"


def hyperplane_bucket(vec: str) -> str:
    terms = []
    for i in range(len(HYPERPLANES)):
        terms.append(
            f"(CASE WHEN {dot(vec, plane_literal(i))} > 0 THEN {2**i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")::BIGINT"


# --------------------------------------------------------------------------
# text analysis oracles
# --------------------------------------------------------------------------


def quality_metrics_sql(table: str = "documents") -> str:
    return f"""
WITH t AS (
  SELECT doc_id, text,
         length(text) AS nc,
         length(text) - length(replace(text, ' ', '')) AS nsp,
         {tokens('text')} AS toks
  FROM {table}
)
SELECT doc_id,
       nc::BIGINT AS n_chars,
       len(toks)::BIGINT AS n_tokens,
       round((nc - nsp) / greatest(len(toks), 1), 4)::DOUBLE AS avg_token_len,
       round(len(list_distinct(toks)) / greatest(len(toks), 1), 4)::DOUBLE AS distinct_ratio,
       round(nsp / greatest(nc, 1), 4)::DOUBLE AS space_ratio
FROM t
"""


def _marker_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]) + "]"


def lang_score(lang: str, toks: str = "toks") -> str:
    return (
        f"round(len(list_filter({toks}, t -> list_contains({_marker_list(lang)}, t)))"
        f" / greatest(len({toks}), 1), 4)::DOUBLE"
    )


def predict_lang_case() -> str:
    """Nested CASE replicating text.predict_lang: earliest alphabetical
    language whose score >= every later language's score."""
    langs = sorted(LANG_MARKERS)
    branches = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"s_{lang} >= s_{other}" for other in langs[i + 1 :])
        branches.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(branches) + f" ELSE '{langs[-1]}' END"


def lang_id_sql(table: str = "documents") -> str:
    scores = ",\n         ".join(
        f"{lang_score(lang)} AS s_{lang}" for lang in sorted(LANG_MARKERS)
    )
    return f"""
WITH t AS (
  SELECT doc_id, {tokens('text')} AS toks FROM {table}
),
scored AS (
  SELECT doc_id,
         {scores}
  FROM t
)
SELECT {predict_lang_case()} AS pred_lang, count(*)::BIGINT AS n_docs
FROM scored GROUP BY 1
"""


def lang_id_confusion_sql(table: str = "documents") -> str:
    """Replays the lang-ID CONFUSION MATRIX: predicted language vs the
    fixture's ground-truth ``lang`` column — grades the n-gram heuristic
    the way recall_report grades the ANN paths."""
    scores = ",\n         ".join(
        f"{lang_score(lang)} AS s_{lang}" for lang in sorted(LANG_MARKERS)
    )
    return f"""
WITH t AS (
  SELECT doc_id, lang, {tokens('text')} AS toks FROM {table}
),
scored AS (
  SELECT doc_id, lang,
         {scores}
  FROM t
)
SELECT lang AS actual_lang, {predict_lang_case()} AS pred_lang,
       count(*)::BIGINT AS n_docs
FROM scored GROUP BY 1, 2
"""


def quality_filter_sql(
    table: str = "documents",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_avg_token_len: float = 2.0,
    max_space_ratio: float = 0.4,
) -> str:
    """Mirror of text.quality_filter over quality_metrics values."""
    return f"""
WITH t AS (
  SELECT length(text) AS nc,
         length(text) - length(replace(text, ' ', '')) AS nsp,
         {tokens('text')} AS toks
  FROM {table}
),
m AS (
  SELECT len(toks)::BIGINT AS n_tokens,
         round((nc - nsp) / greatest(len(toks), 1), 4)::DOUBLE AS avg_token_len,
         round(nsp / greatest(nc, 1), 4)::DOUBLE AS space_ratio
  FROM t
)
SELECT CASE WHEN n_tokens < {min_tokens} THEN 'too_few_tokens'
            WHEN n_tokens > {max_tokens} THEN 'too_many_tokens'
            WHEN avg_token_len < {min_avg_token_len} THEN 'short_tokens'
            WHEN space_ratio > {max_space_ratio} THEN 'too_spacey'
            ELSE 'ok' END AS verdict,
       COUNT(*)::BIGINT AS n_docs
FROM m GROUP BY 1
"""


def top_terms_sql(table: str = "documents", k: int = 20) -> str:
    return f"""
WITH tok AS (
  SELECT unnest({tokens('text')}) AS token FROM {table}
)
SELECT token, COUNT(*)::BIGINT AS n FROM tok
GROUP BY 1 ORDER BY n DESC, token ASC LIMIT {k}
"""


def fingerprint_sql(table: str = "documents") -> str:
    return f"SELECT doc_id, {fingerprint62('text')} AS fingerprint FROM {table}"



def token_counts_sql(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       len({tokens('text')})::BIGINT AS ws_tokens,
       len(regexp_extract_all(text, '{BPE_TOKEN_PATTERN}'))::BIGINT AS bpe_tokens
FROM {table}
"""


# --------------------------------------------------------------------------
# dedup oracles
# --------------------------------------------------------------------------


def exact_dedup_sql(table: str = "documents") -> str:
    return f"""
SELECT min(doc_id)::BIGINT AS doc_id, text, count(*)::BIGINT AS dup_count
FROM {table} GROUP BY text
"""


def minhash_pairs_sql(table: str = "documents") -> str:
    rows = MINHASH_K // LSH_BANDS
    sig_items = ", ".join(
        f"list_min(list_transform(sh, x -> (x * {a} + {b}) % {P31}))"
        for a, b in MINHASH_COEFFS
    )
    band_selects = []
    for band in range(LSH_BANDS):
        expr = "0::BIGINT"
        for r in range(rows):
            expr = f"(({expr}) * {MULT1} + sig[{band * rows + r + 1}]) % {P31}"
        band_selects.append(
            f"SELECT id, {band} AS band, {expr} AS bh FROM sig"
        )
    bands_union = " UNION ALL ".join(band_selects)
    return f"""
WITH base AS (
  SELECT doc_id AS id, {shingle_hashes(tokens('text'))} AS sh FROM {table}
),
sig AS (
  SELECT id, [{sig_items}] AS sig FROM base
),
bands AS ({bands_union}),
cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM bands l JOIN bands r ON l.band = r.band AND l.bh = r.bh AND l.id < r.id
),
verified AS (
  SELECT c.id_a, c.id_b,
         round(len(list_filter(a.sh, x -> list_contains(b.sh, x)))::DOUBLE
               / (len(a.sh) + len(b.sh) - len(list_filter(a.sh, x -> list_contains(b.sh, x)))),
               4) AS jaccard
  FROM cand c JOIN base a ON a.id = c.id_a JOIN base b ON b.id = c.id_b
)
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= {MINHASH_JACCARD_THRESHOLD}
"""


def simhash_pairs_sql(table: str = "documents") -> str:
    chunk_bits = 62 // SIMHASH_CHUNKS + 1  # 13 — mirrors dedup.simhash_pairs
    mask = (1 << chunk_bits) - 1
    chunk_selects = " UNION ALL ".join(
        f"SELECT id, sh, {c} AS chunk, (sh >> {c * chunk_bits}) & {mask} AS ch FROM sim"
        for c in range(SIMHASH_CHUNKS)
    )
    return f"""
WITH tok AS (
  SELECT doc_id AS id, unnest({tokens('text')}) AS tok FROM {table}
),
tf AS (
  SELECT id, tok, count(*)::BIGINT AS tf FROM tok GROUP BY id, tok
),
hashed AS (
  SELECT id, tf,
         ({poly_hash('tok', MULT1)} * {P31 + 1} + {poly_hash('tok', MULT2)}) AS h
  FROM tf
),
weights AS (
  SELECT id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN tf ELSE -tf END) AS w
  FROM hashed CROSS JOIN (SELECT unnest(range(62)) AS j) GROUP BY id, j
),
sim AS (
  SELECT id, sum(CASE WHEN w > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS sh
  FROM weights GROUP BY id
),
chunks AS ({chunk_selects}),
cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.sh AS sh_a, r.sh AS sh_b
  FROM chunks l JOIN chunks r ON l.chunk = r.chunk AND l.ch = r.ch AND l.id < r.id
)
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {SIMHASH_MAX_HAMMING}
"""


def cosine_dup_pairs_sql(
    table: str = "embeddings", threshold: float = COSINE_DUP_THRESHOLD
) -> str:
    """Exact all-pairs cosine near-dup — mirrors dedup.cosine_dup_pairs
    (unit-normalize once, then a single dot per pair)."""
    return f"""
WITH c AS (
  SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS v FROM {table}
),
n AS (SELECT id, v, sqrt({dot('v', 'v')}) AS nrm FROM c),
u AS (SELECT id, list_transform(v, x -> x / nrm) AS u FROM n),
pairs AS (
  SELECT l.id AS id_a, r.id AS id_b, round({dot('l.u', 'r.u')}, 4) AS cos_sim
  FROM u l JOIN u r ON l.id < r.id
)
SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= {threshold}
"""


def ngram_jaccard_sql(table: str = "documents") -> str:
    return f"""
WITH base AS (
  SELECT doc_id AS id, {shingle_hashes(tokens('text'))} AS sh FROM {table}
),
sizes AS (SELECT id, len(sh) AS n FROM base),
inv AS (SELECT id, unnest(sh) AS h FROM base),
shared AS (
  SELECT l.id AS id_a, r.id AS id_b, count(*)::BIGINT AS shared
  FROM inv l JOIN inv r ON l.h = r.h AND l.id < r.id
  GROUP BY l.id, r.id
)
SELECT s.id_a, s.id_b,
       round(s.shared::DOUBLE / (sa.n + sb.n - s.shared), 4) AS jaccard
FROM shared s JOIN sizes sa ON sa.id = s.id_a JOIN sizes sb ON sb.id = s.id_b
WHERE round(s.shared::DOUBLE / (sa.n + sb.n - s.shared), 4) >= {NGRAM_JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------------
# similarity oracles
# --------------------------------------------------------------------------


def brute_topk_sql(table: str = "embeddings", k: int = 5, max_query_id: int = 5) -> str:
    return f"""
WITH c AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM {table}
),
q AS (SELECT vec_id, v FROM c WHERE vec_id < {max_query_id}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({cosine('c.v', 'q.v')}, 4) AS cos_sim
  FROM c CROSS JOIN q WHERE c.vec_id != q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}
"""


def knn_graph_sql(table: str = "embeddings", k: int = 5) -> str:
    """Exact self-kNN graph — replays knn_graph with nprobe = n_cells
    (full probe), where the cell join degenerates to all candidate
    pairs.  Argument roles mirror the Spark side (corpus vector first)
    so the double folds are bit-identical."""
    return f"""
WITH c AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM {table}
),
scored AS (
  SELECT a.vec_id AS src_id, b.vec_id AS neighbor_id,
         round({cosine('b.v', 'a.v')}, 4) AS cos_sim
  FROM c a JOIN c b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT src_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY src_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT src_id, neighbor_id, cos_sim, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}
"""


def knn_graph_probe_sql(table: str = "embeddings", k: int = 5, nprobe: int = 2) -> str:
    """Replays knn_graph with the seeded SEMDEDUP centroids and a
    SELECTIVE probe — the scale path, replayed end-to-end: corpus-side
    argmax cell, probe-side top-``nprobe`` cells (ties → larger index,
    mirroring Spark's reverse(array_sort) over (s, i) structs), cell
    equi-join, exact cosine, per-source window top-k."""
    from .constants import SEMDEDUP_CENTROIDS

    cent_rows = ",\n    ".join(
        f"({i}, [{', '.join(repr(v) + '::DOUBLE' for v in c)}])"
        for i, c in enumerate(SEMDEDUP_CENTROIDS)
    )
    return f"""
WITH c AS (
  SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS v FROM {table}
),
cents(idx, cv) AS (
  VALUES {cent_rows}
),
sims AS (
  SELECT c.id, cents.idx, {cosine('c.v', 'cents.cv')} AS cs
  FROM c CROSS JOIN cents
),
cell AS (
  SELECT id, idx AS cell FROM (
    SELECT id, idx,
           row_number() OVER (PARTITION BY id ORDER BY cs DESC, idx DESC) AS r
    FROM sims
  ) WHERE r = 1
),
probes AS (
  SELECT id, idx AS cell FROM (
    SELECT id, idx,
           row_number() OVER (PARTITION BY id ORDER BY cs DESC, idx DESC) AS r
    FROM sims
  ) WHERE r <= {nprobe}
),
cand AS (
  SELECT p.id AS src_id, cl.id AS neighbor_id
  FROM probes p JOIN cell cl ON cl.cell = p.cell AND cl.id <> p.id
),
scored AS (
  SELECT cand.src_id, cand.neighbor_id,
         round({cosine('b.v', 'a.v')}, 4) AS cos_sim
  FROM cand
  JOIN c a ON a.id = cand.src_id
  JOIN c b ON b.id = cand.neighbor_id
),
ranked AS (
  SELECT src_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY src_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT src_id, neighbor_id, cos_sim, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}
"""


def partitioned_topk_sql(
    table: str = "embeddings", k: int = 3, max_query_id: int = 5
) -> str:
    return f"""
WITH c AS (
  SELECT label, vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM {table}
),
q AS (SELECT label, vec_id, v FROM c WHERE vec_id < {max_query_id}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({cosine('c.v', 'q.v')}, 4) AS cos_sim
  FROM c JOIN q ON c.label = q.label AND c.vec_id != q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}
"""


def lsh_buckets_sql(table: str = "embeddings") -> str:
    return f"""
WITH c AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM {table}
)
SELECT {hyperplane_bucket('v')} AS bucket, count(*)::BIGINT AS n_vectors
FROM c GROUP BY 1
"""


def lsh_cosine_pairs_sql(table: str = "embeddings") -> str:
    return f"""
WITH c AS (
  SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS v FROM {table}
),
b AS (SELECT id, v, {hyperplane_bucket('v')} AS bucket FROM c),
cand AS (
  SELECT l.id AS id_a, r.id AS id_b,
         round({cosine('l.v', 'r.v')}, 4) AS cos_sim
  FROM b l JOIN b r ON l.bucket = r.bucket AND l.id < r.id
)
SELECT id_a, id_b, cos_sim FROM cand WHERE cos_sim >= {COSINE_DUP_THRESHOLD}
"""


# --------------------------------------------------------------------------
# multimodal oracle (byte-level features over utf-8 payload)
# --------------------------------------------------------------------------


def multimodal_features_sql(table: str = "documents") -> str:
    # payload = utf-8 bytes of text; corpus is ASCII so byte==codepoint and
    # the char-level poly hash equals the byte-level one.
    return f"""
SELECT doc_id,
       'text/fake' AS media_type,
       octet_length(encode(text))::BIGINT AS n_bytes,
       ({poly_hash('text', MULT1)} * {P31 + 1} + {poly_hash('text', MULT2)}) AS content_hash
FROM {table}
"""


def multimodal_frames_sql(table: str = "documents", n_frames: int = 4) -> str:
    """Mirror of ``sample_frames`` + ``frame_features``: frame i of a
    length-L payload is bytes [i*L//n, (i+1)*L//n) — substring arithmetic
    on the (ASCII) text replicates the byte slicing exactly."""
    return f"""
WITH f AS (
  SELECT doc_id, i AS frame_idx,
         substring(text,
                   (i * length(text)) // {n_frames} + 1,
                   ((i + 1) * length(text)) // {n_frames}
                     - (i * length(text)) // {n_frames}) AS fr
  FROM {table}, (SELECT unnest(range({n_frames})) AS i)
)
SELECT doc_id, frame_idx::BIGINT AS frame_idx,
       length(fr)::BIGINT AS n_bytes,
       ({poly_hash('fr', MULT1)} * {P31 + 1} + {poly_hash('fr', MULT2)}) AS frame_hash
FROM f
"""


def drift_sql(
    table: str = "documents",
    ref_pred: str = "LENGTH(source) = 4",
    cand_pred: str = "LENGTH(source) > 4",
    bin_expr: str = "n_chars // 100",
    scale: int = 10**6,
) -> str:
    """Replays distribution_drift: floor-scaled BIGINT proportions and
    (p_cand - p_ref)^2 // max(p_ref, 1) contributions per bin."""
    return f"""
WITH r AS (
  SELECT {bin_expr} AS bin, COUNT(*) AS n_ref FROM {table}
  WHERE {ref_pred} GROUP BY 1
),
c AS (
  SELECT {bin_expr} AS bin, COUNT(*) AS n_cand FROM {table}
  WHERE {cand_pred} GROUP BY 1
),
j AS (
  SELECT COALESCE(r.bin, c.bin) AS bin,
         COALESCE(n_ref, 0)::BIGINT AS n_ref,
         COALESCE(n_cand, 0)::BIGINT AS n_cand
  FROM r FULL JOIN c ON r.bin = c.bin
),
t AS (
  SELECT bin, n_ref, n_cand,
         GREATEST(SUM(n_ref) OVER (), 1) AS ref_tot,
         GREATEST(SUM(n_cand) OVER (), 1) AS cand_tot
  FROM j
),
p AS (
  SELECT bin, n_ref, n_cand,
         ((n_ref * {scale}) // ref_tot)::BIGINT AS p_ref_e6,
         ((n_cand * {scale}) // cand_tot)::BIGINT AS p_cand_e6
  FROM t
)
SELECT bin::BIGINT AS bin, n_ref, n_cand, p_ref_e6, p_cand_e6,
       (((p_cand_e6 - p_ref_e6) * (p_cand_e6 - p_ref_e6))
        // GREATEST(p_ref_e6, 1))::BIGINT AS contrib
FROM p
"""


def ewma_anomalies_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha_x100: int = 25,
    threshold_cents: int = 20000,
) -> str:
    """Replays timeseries.ewma_anomalies: time-ordered per-key fold with
    a 2-slot double-array accumulator [ewma, n_anom] (the shape both
    engines execute correctly — DuckDB 1.0 mis-folds mixed-type struct
    accumulators on some sequences)."""
    a = alpha_x100
    return f"""
WITH vals AS (
  SELECT {key_col} AS key,
         list([CAST(FLOOR({value_col} * 100 + 0.5) AS BIGINT)::DOUBLE, 0.0::DOUBLE]
              ORDER BY {ts_col},
                       CAST(FLOOR({value_col} * 100 + 0.5) AS BIGINT)) AS arr,
         COUNT(*) AS n_events
  FROM {table} GROUP BY {key_col}
),
folded AS (
  SELECT key, n_events,
         list_reduce(arr, (acc, x) -> [
            ({a} / 100.0) * x[1] + (1 - {a} / 100.0) * acc[1],
            acc[2] + CASE WHEN abs(x[1] - acc[1]) > {float(threshold_cents)}
                          THEN 1.0 ELSE 0.0 END
         ]) AS st
  FROM vals
)
SELECT key, n_events::BIGINT AS n_events,
       st[2]::BIGINT AS n_anomalies,
       round(st[1], 4) AS ewma_r4
FROM folded
"""


def ewma_anomalies_windowed_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha_x100: int = 25,
    threshold_cents: int = 20000,
    window_days: int = 7,
) -> str:
    """Replays timeseries.ewma_anomalies(window_days=...): the same
    fold per (key, epoch-window).  Window id floor(days / wd) matches
    Spark's floor(unix / (86400·wd)) by the nested-floor identity."""
    a = alpha_x100
    wd = window_days
    win = (
        f"CAST(floor(date_diff('day', DATE '1970-01-01', "
        f"CAST({ts_col} AS DATE)) / {wd}.0) AS BIGINT)"
    )
    return f"""
WITH vals AS (
  SELECT {key_col} AS key, {win} AS win,
         list([CAST(FLOOR({value_col} * 100 + 0.5) AS BIGINT)::DOUBLE, 0.0::DOUBLE]
              ORDER BY {ts_col},
                       CAST(FLOOR({value_col} * 100 + 0.5) AS BIGINT)) AS arr,
         COUNT(*) AS n_events
  FROM {table} GROUP BY {key_col}, {win}
),
folded AS (
  SELECT key, win, n_events,
         list_reduce(arr, (acc, x) -> [
            ({a} / 100.0) * x[1] + (1 - {a} / 100.0) * acc[1],
            acc[2] + CASE WHEN abs(x[1] - acc[1]) > {float(threshold_cents)}
                          THEN 1.0 ELSE 0.0 END
         ]) AS st
  FROM vals
)
SELECT key,
       CAST(DATE '1970-01-01' + (win * {wd})::INT AS DATE) AS win_start,
       n_events::BIGINT AS n_events,
       st[2]::BIGINT AS n_anomalies,
       round(st[1], 4) AS ewma_r4
FROM folded
"""


def grouped_drift_sql(
    table: str = "documents",
    group_col: str = "lang",
    ref_pred: str = "LENGTH(source) = 4",
    cand_pred: str = "LENGTH(source) > 4",
    bin_expr: str = "n_chars // 100",
    scale: int = 10**6,
) -> str:
    """Replays grouped_drift: the drift arithmetic with per-group totals
    (window partitioned by the slice column)."""
    return f"""
WITH r AS (
  SELECT {group_col} AS grp, {bin_expr} AS bin, COUNT(*) AS n_ref FROM {table}
  WHERE {ref_pred} GROUP BY 1, 2
),
c AS (
  SELECT {group_col} AS grp, {bin_expr} AS bin, COUNT(*) AS n_cand FROM {table}
  WHERE {cand_pred} GROUP BY 1, 2
),
j AS (
  SELECT COALESCE(r.grp, c.grp) AS grp, COALESCE(r.bin, c.bin) AS bin,
         COALESCE(n_ref, 0)::BIGINT AS n_ref,
         COALESCE(n_cand, 0)::BIGINT AS n_cand
  FROM r FULL JOIN c ON r.grp = c.grp AND r.bin = c.bin
),
t AS (
  SELECT grp, bin, n_ref, n_cand,
         GREATEST(SUM(n_ref) OVER (PARTITION BY grp), 1) AS ref_tot,
         GREATEST(SUM(n_cand) OVER (PARTITION BY grp), 1) AS cand_tot
  FROM j
),
p AS (
  SELECT grp, bin, n_ref, n_cand,
         ((n_ref * {scale}) // ref_tot)::BIGINT AS p_ref_e6,
         ((n_cand * {scale}) // cand_tot)::BIGINT AS p_cand_e6
  FROM t
)
SELECT grp, bin::BIGINT AS bin, n_ref, n_cand, p_ref_e6, p_cand_e6,
       (((p_cand_e6 - p_ref_e6) * (p_cand_e6 - p_ref_e6))
        // GREATEST(p_ref_e6, 1))::BIGINT AS contrib
FROM p
"""


def cross_source_sql(table: str = "documents") -> str:
    """Replays cross_source_matrix: the minhash pair oracle as a CTE,
    sources joined on both sides, unordered-pair canonicalization, and
    the BIGINT-exact mean (sum of jaccard*10^4 over count)."""
    return f"""
WITH pairs AS ({minhash_pairs_sql(table)})
SELECT CASE WHEN da.source <= db.source THEN da.source ELSE db.source END AS source_a,
       CASE WHEN da.source <= db.source THEN db.source ELSE da.source END AS source_b,
       COUNT(*) AS n_pairs,
       SUM(CAST(round(jaccard * 10000) AS BIGINT))::DOUBLE
         / (COUNT(*) * 10000)::DOUBLE AS avg_jaccard
FROM pairs
JOIN {table} da ON da.doc_id = pairs.id_a
JOIN {table} db ON db.doc_id = pairs.id_b
GROUP BY 1, 2
"""


def dup_clusters_sql(table: str = "documents") -> str:
    """Connected components over the minhash near-dup pairs: per-doc
    cluster id = min reachable doc id, via recursive transitive closure
    (mirrors dedup.dup_clusters' min-label-propagation fixpoint)."""
    pairs = minhash_pairs_sql(table)
    return f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  {pairs}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(root, node) AS (
  SELECT doc_id, doc_id FROM {table}
  UNION
  SELECT r.root, e.dst FROM reach r JOIN edges e ON r.node = e.src
)
SELECT root AS doc_id, CAST(MIN(node) AS BIGINT) AS cluster_id
FROM reach GROUP BY root
"""


def _bpe_merge_step_sql(cur: str, a: str, b: str) -> str:
    """One greedy left-to-right BPE merge over a VARCHAR[] expression —
    mirrors text._bpe_merge_step's fold element-for-element."""
    ab = a + b
    elems = f"list_transform({cur}, t -> [t])"
    return (
        f"list_reduce(list_prepend([]::VARCHAR[], {elems}), "
        f"(acc, x) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = '{a}' "
        f"AND x[1] = '{b}' "
        f"THEN list_append(list_slice(acc, 1, len(acc) - 1), '{ab}') "
        f"ELSE list_concat(acc, x) END)"
    )


def bpe_counts_sql(
    table: str = "documents", merges=None, k: int = 30
) -> str:
    """Replays bpe_subword_counts with the frozen BPE_MERGES: per-word
    char split, chained greedy merge folds, explode, count, top-k."""
    from .constants import BPE_MERGES

    if merges is None:
        merges = BPE_MERGES
    cur = "string_split(w, '')"
    for a, b in merges:
        cur = _bpe_merge_step_sql(cur, a, b)
    return f"""
WITH words AS (
  SELECT unnest({tokens('text')}) AS w FROM {table}
),
subs AS (
  SELECT unnest({cur}) AS token FROM words
),
counts AS (
  SELECT token, COUNT(*) AS n FROM subs GROUP BY token
),
ranked AS (
  SELECT token, n,
         row_number() OVER (ORDER BY n DESC, token ASC) AS rank
  FROM counts
)
SELECT token, n, rank::BIGINT AS rank FROM ranked WHERE rank <= {k}
"""


def threshold_sweep_sql(table: str = "documents", bin_width_x100: int = 5) -> str:
    """Replays pair_threshold_sweep over the minhash pair oracle: percent
    bins via BIGINT floor division, reverse-cumulative window."""
    return f"""
WITH pairs AS ({minhash_pairs_sql(table)}),
h AS (
  SELECT (CAST(round(jaccard * 100) AS BIGINT) // {bin_width_x100}) AS bin,
         COUNT(*) AS n_pairs
  FROM pairs GROUP BY 1
)
SELECT (bin * {bin_width_x100})::BIGINT AS threshold_x100,
       n_pairs,
       SUM(n_pairs) OVER (ORDER BY bin DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         AS n_pairs_at_or_above
FROM h
"""


def pagerank_sql(
    table: str = "documents",
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> str:
    """Replays graph.pagerank exactly: the fixed iteration count unrolls
    into chained CTEs, every operation BIGINT floor-division/sum."""
    pairs = minhash_pairs_sql(table)
    d = damping_pct
    iters = []
    prev = "r0"
    for i in range(1, iterations + 1):
        iters.append(
            f"""c{i} AS (
  SELECT e.dst AS node, SUM(r.rank // dg.deg) AS inflow
  FROM {prev} r
  JOIN deg dg ON dg.src = r.node
  JOIN edges e ON e.src = r.node
  GROUP BY e.dst
),
r{i} AS (
  SELECT n.node,
         ((100 - {d}) * (SELECT share FROM params)) // 100
         + ({d} * COALESCE(c.inflow, 0)) // 100 AS rank
  FROM nodes n LEFT JOIN c{i} c ON c.node = n.node
)"""
        )
        prev = f"r{i}"
    chain = ",\n".join(iters)
    return f"""
WITH pairs AS MATERIALIZED ({pairs}),
e0 AS (SELECT id_a AS src, id_b AS dst FROM pairs WHERE id_a <> id_b),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
  )
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
params AS (
  SELECT {scale} // GREATEST((SELECT COUNT(*) FROM nodes), 1) AS share
),
r0 AS (SELECT node, (SELECT share FROM params) AS rank FROM nodes),
{chain}
SELECT node::BIGINT AS node, rank::BIGINT AS rank FROM {prev}
"""


def decontaminate_sql(
    table: str = "documents", bench_mod: int = 20, min_shared: int = 3
) -> str:
    """Mirrors dedup.decontaminate with the fixture's deterministic
    benchmark split (doc_id % bench_mod == 0 is the eval set)."""
    sh = shingle_hashes(tokens("text"))
    return f"""
WITH bench AS (
  SELECT DISTINCT h FROM (
    SELECT unnest({sh}) AS h FROM {table} WHERE doc_id % {bench_mod} = 0
  )
),
inv AS (
  SELECT doc_id, unnest({sh}) AS h FROM {table} WHERE doc_id % {bench_mod} <> 0
)
SELECT i.doc_id, COUNT(*)::BIGINT AS shared_shingles
FROM inv i JOIN bench b ON i.h = b.h
GROUP BY i.doc_id
HAVING COUNT(*) >= {min_shared}
"""


def pack_sequences_sql(table: str = "documents", budget: int = 1024) -> str:
    """Mirrors sampling.pack_sequences: exclusive prefix sum of
    whitespace token counts in doc_id order, integer div/mod by the
    budget.  All-BIGINT output — bit-identical across engines."""
    return f"""
WITH t AS (
  SELECT doc_id, len({tokens('text')})::BIGINT AS n_tokens FROM {table}
),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
  FROM t
)
SELECT doc_id, n_tokens,
       (cum_excl // {budget})::BIGINT AS pack_id,
       (cum_excl % {budget})::BIGINT AS pack_offset
FROM c
"""


def quantize_int8_sql(table: str = "embeddings") -> str:
    """Mirrors similarity.quantize_int8: symmetric per-vector int8
    quantization with BIGINT checksum outputs (sum, sum-of-squares)."""
    return f"""
WITH c AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM {table}
),
m AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS amax
  FROM c
),
q AS (
  SELECT vec_id, round(amax, 6) AS amax,
         list_transform(v, x -> CAST(round(x * (127.0::DOUBLE / greatest(amax, 1e-30))) AS BIGINT)) AS qvec
  FROM m
)
SELECT vec_id, amax,
       list_reduce(list_prepend(0::BIGINT, qvec), (a, b) -> a + b) AS qsum,
       list_reduce(list_prepend(0::BIGINT, qvec), (a, b) -> a + b * b) AS qnorm
FROM q
"""


def temperature_mix_sql(table: str = "documents") -> str:
    """Mirrors sampling.temperature_mix: sqrt-weighted domain resample
    with all-BIGINT thresholds and id-hash bucket membership."""
    h = poly_hash("doc_id::VARCHAR")
    return f"""
WITH c AS (
  SELECT source, COUNT(*)::BIGINT AS n_s FROM {table} GROUP BY source
),
w AS (
  SELECT source, n_s,
         CAST(floor(sqrt(n_s) * 1000000.0) AS BIGINT) AS w_int
  FROM c
),
t AS (SELECT SUM(w_int)::BIGINT AS w_total, SUM(n_s)::BIGINT AS m_total FROM w),
thr AS (
  SELECT source, least((10000 * m_total * w_int) // (w_total * n_s), 10000) AS thr
  FROM w, t
),
b AS (
  SELECT d.source, thr.thr, ({h}) % 10000 AS b
  FROM {table} d JOIN thr ON d.source = thr.source
)
SELECT source, COUNT(*)::BIGINT AS n_before,
       SUM(CASE WHEN b < thr THEN 1 ELSE 0 END)::BIGINT AS n_after
FROM b GROUP BY source
"""


def dataset_card_sql(table: str = "documents", group_col: str = "lang") -> str:
    """Mirrors text.dataset_card: per-group token-count summary with
    integer-scaled mean and exact interpolated median."""
    return f"""
WITH t AS (
  SELECT {group_col} AS grp, len({tokens('text')})::BIGINT AS n_tokens FROM {table}
)
SELECT grp, COUNT(*)::BIGINT AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(n_tokens) AS min_tokens,
       MAX(n_tokens) AS max_tokens,
       CAST(median(n_tokens) AS DOUBLE) AS median_tokens,
       (100 * CAST(SUM(n_tokens) AS BIGINT)) // COUNT(*) AS avg_tokens_x100
FROM t GROUP BY grp
"""


def ngram_hash_list(toks: str, k: int = 3) -> str:
    """NON-distinct k-gram hashes in order — mirrors text.ngram_hash_list."""
    th = f"list_transform({toks}, t -> {poly_hash('t', MULT1)})"
    return (
        f"list_transform(range(1, greatest(len({th}) - {k - 1}, 1) + 1), "
        f"i -> list_reduce(list_prepend(0::BIGINT, list_slice({th}, i, i + {k - 1})), "
        f"(a, b) -> (a * {MULT2} + b) % {P31}))"
    )


def repetition_sql(table: str = "documents", k: int = 3) -> str:
    """Mirror of text.repetition_metrics (token k-gram repetition)."""
    return f"""
WITH t AS (
  SELECT doc_id, {ngram_hash_list(tokens('text'), k)} AS raw FROM {table}
),
d AS (
  SELECT doc_id, raw, list_distinct(raw) AS dist FROM t
)
SELECT doc_id,
       len(raw)::BIGINT AS n_ngrams,
       len(dist)::BIGINT AS n_distinct,
       round(1 - len(dist) / greatest(len(raw), 1), 4)::DOUBLE AS dup_frac,
       list_max(list_transform(dist, g -> len(list_filter(raw, x -> x = g))))::BIGINT
         AS top_ngram_count
FROM d
"""


def span_dedup_sql(
    table: str = "documents", w: int = SPAN_W, min_docs: int = SPAN_MIN_DOCS
) -> str:
    """Mirrors dedup.exact_span_dedup: non-overlapping w-token window
    hashes (token char-hash MULT1, window fold MULT2), a span is
    duplicated when >= min_docs distinct docs contain its hash."""
    th = f"list_transform({tokens('text')}, t -> {poly_hash('t', MULT1)})"
    spans = (
        f"list_transform(range(1, (len(th) // {w}) + 1), "
        f"i -> list_reduce(list_prepend(0::BIGINT, "
        f"list_slice(th, (i - 1) * {w} + 1, (i - 1) * {w} + {w})), "
        f"(a, b) -> (a * {MULT2} + b) % {P31}))"
    )
    return f"""
WITH tok AS (SELECT doc_id, {th} AS th FROM {table}),
per_doc AS (SELECT doc_id, {spans} AS spans FROM tok),
sp AS (SELECT doc_id, unnest(spans) AS h FROM per_doc),
shared AS (SELECT h FROM sp GROUP BY h HAVING COUNT(DISTINCT doc_id) >= {min_docs}),
dups AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_dup_spans
  FROM sp JOIN shared USING (h) GROUP BY doc_id
)
SELECT p.doc_id, len(p.spans)::BIGINT AS n_spans,
       COALESCE(d.n_dup_spans, 0)::BIGINT AS n_dup_spans
FROM per_doc p LEFT JOIN dups d USING (doc_id)
ORDER BY p.doc_id
"""


def span_removal_sql(
    table: str = "documents", w: int = SPAN_W, min_docs: int = SPAN_MIN_DOCS
) -> str:
    """Mirrors dedup.remove_duplicate_spans: duplicated w-token windows
    excised everywhere except the lowest-id document containing them;
    text rebuilt from the kept tokens (whitespace-normalized)."""
    th = f"list_transform({tokens('text')}, t -> {poly_hash('t', MULT1)})"
    spans = (
        f"list_transform(range(1, (len(th) // {w}) + 1), "
        f"i -> list_reduce(list_prepend(0::BIGINT, "
        f"list_slice(th, (i - 1) * {w} + 1, (i - 1) * {w} + {w})), "
        f"(a, b) -> (a * {MULT2} + b) % {P31}))"
    )
    return f"""
WITH tok AS (SELECT doc_id, {tokens('text')} AS toks, {th} AS th FROM {table}),
per_doc AS (SELECT doc_id, toks, {spans} AS spans FROM tok),
sp AS (
  SELECT doc_id, unnest(spans) AS h,
         unnest(range(1, len(spans) + 1)) - 1 AS wi
  FROM per_doc
),
dup AS (
  SELECT h, min(doc_id) AS keeper FROM sp
  GROUP BY h HAVING COUNT(DISTINCT doc_id) >= {min_docs}
),
bad AS (
  SELECT sp.doc_id, list(sp.wi) AS bad
  FROM sp JOIN dup USING (h) WHERE sp.doc_id != dup.keeper
  GROUP BY sp.doc_id
),
clean AS (
  SELECT p.doc_id,
         list_transform(
           list_filter(range(1, len(p.toks) + 1),
                       j -> NOT list_contains(COALESCE(b.bad, []::BIGINT[]),
                                              (j - 1) // {w})),
           j -> p.toks[j]) AS kept,
         len(p.toks) AS n
  FROM per_doc p LEFT JOIN bad b USING (doc_id)
)
SELECT doc_id,
       COALESCE(array_to_string(kept, ' '), '') AS clean_text,
       (n - len(kept))::BIGINT AS n_tokens_removed
FROM clean
"""


def classify_quality_sql(table: str = "documents") -> str:
    """Mirrors text.classify_quality: hashed-BoW linear score with the
    shared seeded weight table."""
    from .constants import CLASSIFIER_BIAS, CLASSIFIER_BUCKETS, CLASSIFIER_WEIGHTS

    wlist = "[" + ", ".join(f"{w}::BIGINT" for w in CLASSIFIER_WEIGHTS) + "]"
    score = (
        f"list_reduce(list_prepend({CLASSIFIER_BIAS}::BIGINT, "
        f"list_transform({tokens('text')}, "
        f"t -> {wlist}[({poly_hash('t', MULT1)} % {CLASSIFIER_BUCKETS})::INT + 1])), "
        f"(a, b) -> a + b)"
    )
    return f"""
SELECT doc_id, {score} AS clf_score,
       CASE WHEN {score} >= 0 THEN 'keep' ELSE 'drop' END AS clf_label
FROM {table}
"""


def binary_ingest_sql(table: str = "documents", max_doc_id: int = 200) -> str:
    """Mirrors the binaryFile-source ingest fixture: payload = utf-8 text
    bytes of docs below max_doc_id, media type from the .bin extension."""
    return f"""
SELECT doc_id,
       'application/bin' AS media_type,
       octet_length(encode(text))::BIGINT AS n_bytes,
       ({poly_hash('text', MULT1)} * {P31 + 1} + {poly_hash('text', MULT2)}) AS content_hash
FROM {table} WHERE doc_id < {max_doc_id}
ORDER BY doc_id
"""


def _pq_sub_dists(s: int, dsub: int) -> str:
    """List of squared-L2 distances from subvector s to each code of
    PQ_BOOKS[s], fold order identical to similarity._sub_argmin_l2."""
    from .constants import PQ_BOOKS

    dists = []
    for cent in PQ_BOOKS[s]:
        lit = "[" + ", ".join(f"{x!r}::DOUBLE" for x in cent) + "]"
        terms = (
            f"list_transform(range(1, {dsub} + 1), "
            f"j -> (v[{s * dsub} + j] - {lit}[j]) * (v[{s * dsub} + j] - {lit}[j]))"
        )
        dists.append(
            f"list_reduce(list_prepend(0.0::DOUBLE, {terms}), (a, b) -> a + b)"
        )
    return "[" + ", ".join(dists) + "]"


def _pq_enc_cols() -> list[str]:
    """``k0..k{m-1}`` argmin-L2 code columns over a vector column ``v``
    — mirrors similarity.pq_encode with the seeded PQ_BOOKS."""
    from .constants import PQ_BOOKS, PQ_M

    dsub = len(PQ_BOOKS[0][0])
    cols = []
    for s in range(PQ_M):
        ds = _pq_sub_dists(s, dsub)
        cols.append(f"(list_position({ds}, list_min({ds})) - 1) AS k{s}")
    return cols


def _pq_adc_strs() -> tuple[str, str]:
    """(approx-dot, reconstructed-squared-norm) ADC SQL over code
    columns ``e.k{s}`` and query vector ``q.v`` — mirrors
    similarity._adc_exprs fold-for-fold."""
    from .constants import PQ_BOOKS, PQ_M

    dsub = len(PQ_BOOKS[0][0])
    approx = "0.0::DOUBLE"
    recon = "0.0::DOUBLE"
    for s in range(PQ_M):
        book = (
            "["
            + ", ".join(
                "[" + ", ".join(f"{x!r}::DOUBLE" for x in cent) + "]"
                for cent in PQ_BOOKS[s]
            )
            + "]"
        )
        cent = f"({book}[e.k{s} + 1])"
        dot_s = (
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range(1, {dsub} + 1), j -> q.v[{s * dsub} + j] * {cent}[j])), "
            f"(a, b) -> a + b)"
        )
        sq_s = (
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform({cent}, x -> x * x)), (a, b) -> a + b)"
        )
        approx = f"({approx} + {dot_s})"
        recon = f"({recon} + {sq_s})"
    return approx, recon


def pq_topk_sql(
    table: str = "embeddings",
    k: int = 5,
    max_query_id: int = 5,
    shortlist: int | None = None,
) -> str:
    """Mirrors similarity.pq_topk with the seeded PQ_BOOKS: encode each
    corpus vector to per-subspace argmin-L2 codes, ADC-score against the
    queries, shortlist by (adc DESC, id ASC), exact-cosine re-rank."""
    from .constants import PQ_SHORTLIST

    if shortlist is None:
        shortlist = PQ_SHORTLIST
    enc_cols = _pq_enc_cols()
    approx, recon = _pq_adc_strs()
    return f"""
WITH c AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM {table}
),
q AS (SELECT vec_id, v FROM c WHERE vec_id < {max_query_id}),
enc AS (SELECT vec_id, {", ".join(enc_cols)} FROM c),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         {approx} / sqrt({recon}) AS adc
  FROM enc e CROSS JOIN q WHERE e.vec_id != q.vec_id
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc DESC, neighbor_id ASC) AS r
    FROM scored
  ) WHERE r <= {shortlist}
),
exact AS (
  SELECT s.query_id, s.neighbor_id,
         round({cosine('c.v', 'q.v')}, 4) AS cos_sim
  FROM short s
  JOIN c ON c.vec_id = s.neighbor_id
  JOIN q ON q.vec_id = s.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM exact
)
SELECT query_id, neighbor_id, cos_sim, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}
"""


def ivf_pq_topk_sql(
    table: str = "embeddings",
    k: int = 5,
    max_query_id: int = 5,
    nprobe: int = 2,
    shortlist: int = 50,
) -> str:
    """Mirrors similarity.ivf_pq_topk: integer-scaled label centroids →
    per-query top-``nprobe`` cells by centroid cosine → ADC scoring of
    only the probed cells' code rows → exact re-rank of the shortlist."""
    from .constants import EMBEDDING_DIM

    enc_cols = _pq_enc_cols()
    approx, recon = _pq_adc_strs()
    return f"""
WITH c AS (
  SELECT label, vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM {table}
),
q AS (SELECT vec_id, v FROM c WHERE vec_id < {max_query_id}),
cent_long AS (
  SELECT label, i - 1 AS dim_idx,
         round(CAST(SUM(CAST(FLOOR(v[i] * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1000000 / COUNT(*), 6) AS centroid
  FROM c, (SELECT unnest(range(1, {EMBEDDING_DIM} + 1)) AS i)
  GROUP BY label, i
),
cents AS (
  SELECT label, list(centroid ORDER BY dim_idx) AS cv FROM cent_long GROUP BY label
),
cell AS (
  SELECT q.vec_id AS query_id, cents.label, {cosine('cents.cv', 'q.v')} AS cs
  FROM q CROSS JOIN cents
),
probed AS (
  SELECT query_id, label FROM (
    SELECT query_id, label,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cs DESC, label ASC) AS r
    FROM cell
  ) WHERE r <= {nprobe}
),
enc AS (SELECT label, vec_id, {", ".join(enc_cols)} FROM c),
scored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id, {approx} / sqrt({recon}) AS adc
  FROM probed p
  JOIN enc e ON e.label = p.label
  JOIN q ON q.vec_id = p.query_id
  WHERE e.vec_id != p.query_id
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc DESC, neighbor_id ASC) AS r
    FROM scored
  ) WHERE r <= {shortlist}
),
exact AS (
  SELECT s.query_id, s.neighbor_id,
         round({cosine('c.v', 'q.v')}, 4) AS cos_sim
  FROM short s
  JOIN c ON c.vec_id = s.neighbor_id
  JOIN q ON q.vec_id = s.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM exact
)
SELECT query_id, neighbor_id, cos_sim, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}
"""


def recall_report_sql(
    table: str = "embeddings",
    k: int = 5,
    max_query_id: int = 5,
    pq_shortlist: int = 10,
) -> str:
    """Recall@k report of the approximate ANN paths against exact brute
    force — mirrors the Spark ``s_recall_report`` query by composing the
    three already-exact oracle pipelines (brute, PQ with a deliberately
    tight shortlist, label-partitioned IVF) and counting overlaps."""
    exact = brute_topk_sql(table, k=k, max_query_id=max_query_id)
    pq = pq_topk_sql(table, k=k, max_query_id=max_query_id, shortlist=pq_shortlist)
    ivf = partitioned_topk_sql(table, k=k, max_query_id=max_query_id)
    ivfpq = ivf_pq_topk_sql(
        table, k=k, max_query_id=max_query_id, nprobe=2, shortlist=pq_shortlist
    )
    return f"""
WITH exact_r AS ({exact}),
pq_r AS ({pq}),
ivf_r AS ({ivf}),
ivfpq_r AS ({ivfpq}),
qids AS (SELECT DISTINCT query_id FROM exact_r),
methods AS (
  SELECT 'pq' AS method, query_id, neighbor_id FROM pq_r
  UNION ALL
  SELECT 'ivf_label' AS method, query_id, neighbor_id FROM ivf_r
  UNION ALL
  SELECT 'ivf_pq' AS method, query_id, neighbor_id FROM ivfpq_r
),
hits AS (
  SELECT m.method, m.query_id, COUNT(*)::BIGINT AS n_hits
  FROM methods m JOIN exact_r e
    ON e.query_id = m.query_id AND e.neighbor_id = m.neighbor_id
  GROUP BY 1, 2
)
SELECT mq.method, mq.query_id,
       COALESCE(h.n_hits, 0)::BIGINT AS n_hits,
       round(COALESCE(h.n_hits, 0) / {k}.0, 4)::DOUBLE AS recall_at_k
FROM (SELECT m, query_id FROM (VALUES ('pq'), ('ivf_label'), ('ivf_pq')) v(m)
      CROSS JOIN qids) mq(method, query_id)
LEFT JOIN hits h ON h.method = mq.method AND h.query_id = mq.query_id
"""


def tfidf_top_terms_sql(table: str = "documents", k: int = 3) -> str:
    """Mirrors text.tfidf_top_terms: log-free rational idf, BIGINT
    floor-scaled, deterministic (score DESC, token ASC) top-k."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({tokens('text')}) AS token FROM {table}
),
tf AS (SELECT doc_id, token, COUNT(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT token, COUNT(*)::BIGINT AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM {table}),
scored AS (
  SELECT tf.doc_id, tf.token, (tf.tf * n.n_docs * 1000) // dfreq.df AS tfidf_x1000
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, token, tfidf_x1000,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf_x1000 DESC, token ASC) AS rank
  FROM scored
)
SELECT doc_id, token, tfidf_x1000, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}
"""


def count_min_top_terms_sql(table: str = "documents", k: int = 20) -> str:
    """Mirrors text.count_min_top_terms: d seeded hash rows over w
    counters, estimate = least of the d counters."""
    from .constants import CMS_COEFFS, CMS_W

    th = poly_hash("token", MULT1)
    cols = ", ".join(
        f"(({th} * {a} + {b}) % {P31}) % {CMS_W} AS c{r}"
        for r, (a, b) in enumerate(CMS_COEFFS)
    )
    cms_ctes = ",\n".join(
        f"cms{r} AS (SELECT c{r}, COUNT(*)::BIGINT AS n{r} FROM b GROUP BY 1)"
        for r in range(len(CMS_COEFFS))
    )
    joins = " ".join(f"JOIN cms{r} USING (c{r})" for r in range(len(CMS_COEFFS)))
    least = ", ".join(f"n{r}" for r in range(len(CMS_COEFFS)))
    return f"""
WITH tok AS (SELECT unnest({tokens('text')}) AS token FROM {table}),
b AS (SELECT token, {cols} FROM tok),
{cms_ctes},
vocab AS (SELECT DISTINCT * FROM b)
SELECT token, least({least})::BIGINT AS est_count
FROM vocab {joins}
ORDER BY est_count DESC, token ASC LIMIT {k}
"""


def minhash_estimates_sql(table: str = "documents") -> str:
    """Mirrors dedup.minhash_jaccard_estimates: signature component
    match fraction (integer x10000) next to exact Jaccard for every
    verified pair."""
    pairs = minhash_pairs_sql(table)
    sig_items = ", ".join(
        f"list_min(list_transform({shingle_hashes(tokens('text'))}, "
        f"x -> (x * {a} + {b}) % {P31}))"
        for a, b in MINHASH_COEFFS
    )
    return f"""
WITH pairs AS ({pairs}),
sigs AS (SELECT doc_id AS sid, [{sig_items}] AS sig FROM {table})
SELECT p.id_a, p.id_b,
       (len(list_filter(range(1, {MINHASH_K} + 1),
                        i -> a.sig[i] = b.sig[i])) * 10000) // {MINHASH_K}
         AS est_x10000,
       p.jaccard
FROM pairs p
JOIN sigs a ON a.sid = p.id_a
JOIN sigs b ON b.sid = p.id_b
"""


def collocations_sql(table: str = "documents", k: int = 20, min_count: int = 5) -> str:
    """Mirrors text.collocations: adjacent-pair lift, integer-scaled."""
    toks = tokens("text")
    return f"""
WITH t AS (SELECT {toks} AS toks FROM {table}),
bi AS (
  SELECT unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t
),
uni AS (SELECT unnest(toks) AS token FROM t),
cnt AS (SELECT token, COUNT(*)::BIGINT AS cnt FROM uni GROUP BY 1),
total AS (SELECT COUNT(*)::BIGINT AS total FROM uni),
pairs AS (
  SELECT bigram, COUNT(*)::BIGINT AS pair_n,
         string_split(bigram, ' ')[1] AS tok_a,
         string_split(bigram, ' ')[2] AS tok_b
  FROM bi GROUP BY 1 HAVING COUNT(*) >= {min_count}
)
SELECT p.bigram, p.pair_n,
       (p.pair_n * total.total * 1000) // (a.cnt * b.cnt) AS lift_x1000
FROM pairs p
JOIN cnt a ON a.token = p.tok_a
JOIN cnt b ON b.token = p.tok_b
CROSS JOIN total
ORDER BY lift_x1000 DESC, bigram ASC LIMIT {k}
"""

# --------------------------------------------------------------------------
# SemDeDup / Bloom / DSIR oracles
# --------------------------------------------------------------------------


def semantic_dup_pairs_sql(table: str = "embeddings") -> str:
    """Mirrors dedup.semantic_dup_pairs with the seeded SEMDEDUP
    centroids: argmax-cosine cell assignment (ties -> larger index,
    matching Spark's struct array_max), then unit-dot pairs within a
    cell."""
    from .constants import SEMDEDUP_CENTROIDS, SEMDEDUP_THRESHOLD

    cent_rows = ",\n    ".join(
        f"({i}, [{', '.join(repr(v) + '::DOUBLE' for v in c)}])"
        for i, c in enumerate(SEMDEDUP_CENTROIDS)
    )
    return f"""
WITH c AS (
  SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS v FROM {table}
),
cents(idx, cv) AS (
  VALUES {cent_rows}
),
sims AS (
  SELECT c.id, cents.idx, {cosine('c.v', 'cents.cv')} AS cs
  FROM c CROSS JOIN cents
),
cell AS (
  SELECT id, idx AS cell FROM (
    SELECT id, idx,
           row_number() OVER (PARTITION BY id ORDER BY cs DESC, idx DESC) AS r
    FROM sims
  ) WHERE r = 1
),
n AS (SELECT id, v, sqrt({dot('v', 'v')}) AS nrm FROM c),
u AS (
  SELECT n.id, cell.cell, list_transform(n.v, x -> x / n.nrm) AS u
  FROM n JOIN cell ON cell.id = n.id
),
pairs AS (
  SELECT l.cell, l.id AS id_a, r.id AS id_b,
         round({dot('l.u', 'r.u')}, 4) AS cos_sim
  FROM u l JOIN u r ON l.cell = r.cell AND l.id < r.id
)
SELECT cell::BIGINT AS cell, id_a, id_b, cos_sim
FROM pairs WHERE cos_sim >= {SEMDEDUP_THRESHOLD}
"""


def semantic_screen_sql(table: str = "embeddings") -> str:
    """Mirrors ``streaming.semantic_screen_stream`` over the standard
    odd-vs-even split: odd vec_ids (the staged batch stream) screened
    against the even-id corpus index — same seeded-centroid cell
    assignment and unit-dot cosine as ``semantic_dup_pairs_sql``, but
    the asymmetric batch→corpus orientation (every qualifying pair,
    both id orders possible)."""
    from .constants import SEMDEDUP_CENTROIDS, SEMDEDUP_THRESHOLD

    cent_rows = ",\n    ".join(
        f"({i}, [{', '.join(repr(v) + '::DOUBLE' for v in c)}])"
        for i, c in enumerate(SEMDEDUP_CENTROIDS)
    )
    return f"""
WITH c AS (
  SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS v FROM {table}
),
cents(idx, cv) AS (
  VALUES {cent_rows}
),
sims AS (
  SELECT c.id, cents.idx, {cosine('c.v', 'cents.cv')} AS cs
  FROM c CROSS JOIN cents
),
cell AS (
  SELECT id, idx AS cell FROM (
    SELECT id, idx,
           row_number() OVER (PARTITION BY id ORDER BY cs DESC, idx DESC) AS r
    FROM sims
  ) WHERE r = 1
),
n AS (SELECT id, v, sqrt({dot('v', 'v')}) AS nrm FROM c),
u AS (
  SELECT n.id, cell.cell, list_transform(n.v, x -> x / n.nrm) AS u
  FROM n JOIN cell ON cell.id = n.id
)
SELECT b.id AS batch_id, k.id AS corpus_id,
       round({dot('b.u', 'k.u')}, 4) AS cos_sim
FROM u b JOIN u k ON b.cell = k.cell
WHERE b.id % 2 = 1 AND k.id % 2 = 0
  AND round({dot('b.u', 'k.u')}, 4) >= {SEMDEDUP_THRESHOLD}
"""


def _bloom_positions(fp_expr: str, m: int | None = None) -> list[str]:
    from .constants import BLOOM_COEFFS, BLOOM_M

    m = m or BLOOM_M
    h = f"(({fp_expr}) % {P31})"
    return [
        f"((({a} * {h} + {b}) % {P31}) % {m})" for a, b in BLOOM_COEFFS
    ]


def bloom_membership_sql(table: str = "documents", m: int | None = None) -> str:
    """Mirrors the dd_bloom query: Bloom filter built from the even
    doc_ids, probed by the odd ones (scale-independent split); is_dup
    is the exact fingerprint-membership ground truth graded next to
    maybe_dup.  ``m`` overrides the mask size (the big-mask broadcast
    screen's oracle replays the same positions mod its larger m)."""
    fp = fingerprint62("text")
    pos = ", ".join(_bloom_positions("fp", m))
    return f"""
WITH corpus AS (
  SELECT {fp} AS fp FROM {table} WHERE doc_id % 2 = 0
),
batch AS (
  SELECT doc_id, {fp} AS fp FROM {table} WHERE doc_id % 2 = 1
),
bloom AS (
  SELECT DISTINCT bit FROM (SELECT unnest([{pos}]) AS bit FROM corpus)
),
probes AS (
  SELECT doc_id, unnest(list_distinct([{pos}])) AS bit FROM batch
),
agg AS (
  SELECT p.doc_id, count(*)::BIGINT AS n_bits,
         sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
  FROM probes p LEFT JOIN bloom b ON b.bit = p.bit
  GROUP BY p.doc_id
)
SELECT a.doc_id, a.n_bits, a.n_hits,
       a.n_hits = a.n_bits AS maybe_dup,
       EXISTS (SELECT 1 FROM corpus c WHERE c.fp = batch.fp) AS is_dup
FROM agg a JOIN batch ON batch.doc_id = a.doc_id
"""


def dsir_scores_sql(
    table: str = "documents", target_lang: str = "en"
) -> str:
    """Mirrors sampling.dsir_scores with target = docs of one language:
    hashed-unigram buckets, add-one-smoothed integer-scaled likelihood
    ratios, per-doc BIGINT score sums."""
    from .constants import DSIR_BUCKETS, DSIR_SCALE

    bucket = f"({poly_hash('tok')} % {DSIR_BUCKETS})"
    return f"""
WITH r_toks AS (
  SELECT doc_id, {bucket} AS bucket
  FROM (SELECT doc_id, unnest({tokens('text')}) AS tok FROM {table})
),
t_toks AS (
  SELECT {bucket} AS bucket
  FROM (SELECT unnest({tokens('text')}) AS tok FROM {table}
        WHERE lang = '{target_lang}')
),
r_cnt AS (SELECT bucket, count(*)::BIGINT AS r_cnt FROM r_toks GROUP BY bucket),
t_cnt AS (SELECT bucket, count(*)::BIGINT AS t_cnt FROM t_toks GROUP BY bucket),
tot AS (
  SELECT (SELECT sum(r_cnt)::BIGINT FROM r_cnt) AS r_tot,
         (SELECT sum(t_cnt)::BIGINT FROM t_cnt) AS t_tot
),
w AS (
  SELECT r_cnt.bucket,
         ({DSIR_SCALE}::BIGINT * (coalesce(t_cnt.t_cnt, 0) + 1)
          * (tot.r_tot + {DSIR_BUCKETS}))
         // ((r_cnt.r_cnt + 1) * (tot.t_tot + {DSIR_BUCKETS})) AS w
  FROM r_cnt LEFT JOIN t_cnt ON t_cnt.bucket = r_cnt.bucket CROSS JOIN tot
)
SELECT r_toks.doc_id, count(*)::BIGINT AS n_tokens,
       sum(w.w)::BIGINT AS dsir_score,
       sum(w.w) > count(*) * {DSIR_SCALE} AS keep
FROM r_toks JOIN w ON w.bucket = r_toks.bucket
GROUP BY r_toks.doc_id
"""


def cluster_representatives_sql(table: str = "documents") -> str:
    """Mirrors dedup.cluster_representatives: clusters from the
    recursive-closure oracle, then per-cluster argmax by (token count
    DESC, doc_id ASC)."""
    clusters = dup_clusters_sql(table)
    return f"""
WITH clusters AS MATERIALIZED (
  {clusters}
),
scored AS (
  SELECT c.doc_id, c.cluster_id,
         len({tokens("d.text")})::BIGINT AS q
  FROM clusters c JOIN {table} d ON d.doc_id = c.doc_id
),
ranked AS (
  SELECT cluster_id, doc_id, q,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY q DESC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM scored
)
SELECT cluster_id, doc_id AS rep_doc_id,
       cluster_size::BIGINT AS cluster_size, q AS rep_tokens
FROM ranked WHERE rn = 1
"""


def bigram_lm_sql(table: str = "documents") -> str:
    """Mirrors text.bigram_lm_scores (self-trained): hashed bigram
    conditional counts, add-one smoothing, per-doc mean integer-scaled
    ratio."""
    from .constants import LM_BI_BUCKETS, LM_SCALE, LM_UNI_BUCKETS

    th = f"list_transform({tokens('text')}, t -> {poly_hash('t', MULT1)})"
    return f"""
WITH h AS (
  SELECT doc_id, {th} AS th FROM {table}
),
occ AS (
  SELECT doc_id,
         th[i] % {LM_UNI_BUCKETS} AS u,
         (th[i] * {MULT2} + th[i + 1]) % {P31} % {LM_BI_BUCKETS} AS b
  FROM h, LATERAL (SELECT unnest(range(1, greatest(len(th), 1))) AS i)
),
c_u AS (SELECT u, count(*)::BIGINT AS c_u FROM occ GROUP BY u),
c_b AS (SELECT b, count(*)::BIGINT AS c_b FROM occ GROUP BY b),
scored AS (
  SELECT occ.doc_id,
         ({LM_SCALE}::BIGINT * (coalesce(c_b.c_b, 0) + 1))
         // (coalesce(c_u.c_u, 0) + {LM_UNI_BUCKETS}) AS r
  FROM occ
  LEFT JOIN c_u ON c_u.u = occ.u
  LEFT JOIN c_b ON c_b.b = occ.b
),
sums AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(r)::BIGINT AS r_sum
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(s.n_bigrams, 0)::BIGINT AS n_bigrams,
       coalesce(s.r_sum // s.n_bigrams, 0)::BIGINT AS lm_avg
FROM {table} d LEFT JOIN sums s ON s.doc_id = d.doc_id
"""


def minhash_incremental_sql(table: str = "documents") -> str:
    """Mirrors dedup.minhash_incremental_pairs with the even/odd split:
    odd doc_ids (batch) band-join even doc_ids (corpus), exact-Jaccard
    verified."""
    rows = MINHASH_K // LSH_BANDS
    sig_items = ", ".join(
        f"list_min(list_transform(sh, x -> (x * {a} + {b}) % {P31}))"
        for a, b in MINHASH_COEFFS
    )
    band_selects = []
    for band in range(LSH_BANDS):
        expr = "0::BIGINT"
        for r in range(rows):
            expr = f"(({expr}) * {MULT1} + sig[{band * rows + r + 1}]) % {P31}"
        band_selects.append(f"SELECT id, {band} AS band, {expr} AS bh FROM sig")
    bands_union = " UNION ALL ".join(band_selects)
    return f"""
WITH base AS (
  SELECT doc_id AS id, {shingle_hashes(tokens('text'))} AS sh FROM {table}
),
sig AS (
  SELECT id, [{sig_items}] AS sig FROM base
),
bands AS ({bands_union}),
cand AS (
  SELECT DISTINCT b.id AS batch_id, c.id AS corpus_id
  FROM bands b JOIN bands c ON b.band = c.band AND b.bh = c.bh
  WHERE b.id % 2 = 1 AND c.id % 2 = 0
),
verified AS (
  SELECT cd.batch_id, cd.corpus_id,
         round(len(list_filter(a.sh, x -> list_contains(b.sh, x)))::DOUBLE
               / (len(a.sh) + len(b.sh) - len(list_filter(a.sh, x -> list_contains(b.sh, x)))),
               4) AS jaccard
  FROM cand cd JOIN base a ON a.id = cd.batch_id JOIN base b ON b.id = cd.corpus_id
)
SELECT batch_id, corpus_id, jaccard FROM verified
WHERE jaccard >= {MINHASH_JACCARD_THRESHOLD}
"""


def sample_exact_n_sql(table: str = "documents", n: int = 100) -> str:
    """Mirrors sampling.sample_exact_n on (doc_id, lang)."""
    key = poly_hash("doc_id::VARCHAR")
    return f"""
SELECT doc_id, lang, row_number() OVER (ORDER BY {key}, doc_id) AS sample_rank
FROM {table}
ORDER BY {key}, doc_id
LIMIT {n}
"""


def sample_exact_n_by_sql(
    table: str = "documents", group_col: str = "lang", n: int = 20
) -> str:
    """Mirrors sampling.sample_exact_n_by on (doc_id, group_col)."""
    key = poly_hash("doc_id::VARCHAR")
    return f"""
SELECT doc_id, {group_col}, sample_rank FROM (
  SELECT doc_id, {group_col},
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY {key}, doc_id) AS sample_rank
  FROM {table}
) WHERE sample_rank <= {n}
"""


# --------------------------------------------------------------------------
# round-5 additions: KMV sketch, funnels, cohorts, PII stats
# --------------------------------------------------------------------------


def kmv_token_report_sql(
    table: str = "documents", k: int = 256, shingle: int = 1
) -> str:
    """Mirrors sketches.kmv_token_report: k smallest distinct 62-bit
    token (or two-level word-shingle) fingerprints → (k-1)·R/h_(k)
    with the identical double operation order (R = 2^62 = (P31+1)^2,
    exactly representable)."""
    R = float(P31 + 1) * float(P31 + 1)
    t = tokens("text")
    if shingle <= 1:
        hv_rel = f"""
  SELECT {fingerprint62('tok')} AS hv FROM (
    SELECT unnest(t) AS tok FROM (SELECT {t} AS t FROM {table})
  ) WHERE tok <> ''"""
    else:
        # two-level: token char-hashes once per multiplier, then two
        # independent k-token folds, each scattered by the seeded
        # universal affine map, combined into 62 bits — mirrors
        # sketches.shingle_fingerprints exactly
        from .constants import KMV_COEFFS

        (a1, b1), (a2, b2) = KMV_COEFFS
        fold1 = (
            f"list_reduce(list_prepend(0::BIGINT, list_slice(th1, i, i + {shingle - 1})), "
            f"(a, b) -> (a * {MULT2} + b) % {P31})"
        )
        fold2 = (
            f"list_reduce(list_prepend(0::BIGINT, list_slice(th2, i, i + {shingle - 1})), "
            f"(a, b) -> (a * {MULT1} + b) % {P31})"
        )
        hv_rel = f"""
  SELECT unnest(list_transform(
           range(1, greatest(len(th1) - {shingle - 1}, 0) + 1),
           i -> ((({fold1}) * {a1} + {b1}) % {P31}) * {P31 + 1}
                + ((({fold2}) * {a2} + {b2}) % {P31}))) AS hv
  FROM (
    SELECT list_transform(t, tok -> {poly_hash('tok', MULT1)}) AS th1,
           list_transform(t, tok -> {poly_hash('tok', MULT2)}) AS th2
    FROM (SELECT {t} AS t FROM {table})
  )"""
    return f"""
WITH tk AS ({hv_rel}
),
hs AS (
  SELECT DISTINCT hv FROM tk
),
km AS (SELECT hv FROM hs ORDER BY hv LIMIT {k}),
agg AS (
  SELECT COUNT(*)::BIGINT AS k_used, MAX(hv)::BIGINT AS kth_min_hash FROM km
),
ex AS (SELECT COUNT(DISTINCT hv)::BIGINT AS exact_distinct FROM tk)
SELECT k_used, kth_min_hash,
       CASE WHEN k_used < {k} THEN k_used::DOUBLE
            ELSE round({float(k - 1)} * ({R!r} / kth_min_hash::DOUBLE), 4)
       END AS est_distinct,
       exact_distinct,
       round(100.0 * abs((CASE WHEN k_used < {k} THEN k_used::DOUBLE
                   ELSE round({float(k - 1)} * ({R!r} / kth_min_hash::DOUBLE), 4)
              END) - exact_distinct::DOUBLE) / exact_distinct::DOUBLE, 2) AS err_pct
FROM agg, ex
"""


def kmv_by_group_sql(
    table: str = "documents",
    group_col: str = "source",
    k: int = 64,
    shingle: int = 3,
) -> str:
    """Mirrors sketches.kmv_distinct_by: per-group k smallest distinct
    62-bit shingle fingerprints → per-group (k-1)·R/h_(k) with the
    identical double arithmetic (the grouped kmv_token_report_sql)."""
    R = float(P31 + 1) * float(P31 + 1)
    t = tokens("text")
    if shingle <= 1:
        hv_rel = f"""
  SELECT g, {fingerprint62('tok')} AS hv FROM (
    SELECT g, unnest(t) AS tok
    FROM (SELECT {group_col} AS g, {t} AS t FROM {table})
  ) WHERE tok <> ''"""
    else:
        from .constants import KMV_COEFFS

        (a1, b1), (a2, b2) = KMV_COEFFS
        fold1 = (
            f"list_reduce(list_prepend(0::BIGINT, list_slice(th1, i, i + {shingle - 1})), "
            f"(a, b) -> (a * {MULT2} + b) % {P31})"
        )
        fold2 = (
            f"list_reduce(list_prepend(0::BIGINT, list_slice(th2, i, i + {shingle - 1})), "
            f"(a, b) -> (a * {MULT1} + b) % {P31})"
        )
        hv_rel = f"""
  SELECT g, unnest(list_transform(
           range(1, greatest(len(th1) - {shingle - 1}, 0) + 1),
           i -> ((({fold1}) * {a1} + {b1}) % {P31}) * {P31 + 1}
                + ((({fold2}) * {a2} + {b2}) % {P31}))) AS hv
  FROM (
    SELECT {group_col} AS g,
           list_transform(t, tok -> {poly_hash('tok', MULT1)}) AS th1,
           list_transform(t, tok -> {poly_hash('tok', MULT2)}) AS th2
    FROM (SELECT {group_col}, {t} AS t FROM {table})
  )"""
    return f"""
WITH tk AS ({hv_rel}
),
hs AS (SELECT DISTINCT g, hv FROM tk),
km AS (
  SELECT g, hv FROM (
    SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv) AS rn FROM hs
  ) WHERE rn <= {k}
),
agg AS (
  SELECT g, COUNT(*)::BIGINT AS k_used, MAX(hv)::BIGINT AS kth_min_hash
  FROM km GROUP BY g
)
SELECT g AS {group_col}, k_used, kth_min_hash,
       CASE WHEN k_used < {k} THEN k_used::DOUBLE
            ELSE round({float(k - 1)} * ({R!r} / kth_min_hash::DOUBLE), 4)
       END AS est_distinct
FROM agg
"""


def _sq(s: str) -> str:
    """Escape a value for interpolation into a single-quoted SQL
    literal (step names, regex patterns): '' is the quote escape in
    both DuckDB and Spark SQL."""
    return s.replace("'", "''")


def funnel_sql(
    steps: list[str],
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """Mirrors events.funnel: per-user (ts, step)-sorted fold to the
    furthest in-order stage, then per-step reached-user counts."""
    whens = " ".join(
        f"WHEN '{_sq(s)}' THEN {i}" for i, s in enumerate(steps, start=1)
    )
    in_list = ", ".join(f"'{_sq(s)}'" for s in steps)
    rows = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS step_idx, '{_sq(s)}' AS step, "
        f"(SELECT COALESCE(SUM(CASE WHEN stage >= {i} THEN 1 ELSE 0 END), 0)::BIGINT "
        f" FROM st) AS n_users"
        for i, s in enumerate(steps, start=1)
    )
    return f"""
WITH e AS (
  SELECT {user_col} AS u, {ts_col} AS ts,
         CASE {type_col} {whens} END AS si
  FROM {table} WHERE {type_col} IN ({in_list})
),
seqs AS (
  SELECT u, list(si ORDER BY ts, si) AS seq FROM e GROUP BY u
),
st AS (
  SELECT u, list_reduce(list_prepend(0, seq),
            (acc, x) -> acc + CASE WHEN x = acc + 1 THEN 1 ELSE 0 END) AS stage
  FROM seqs
)
{rows}
"""


def funnel_windowed_sql(
    steps: list[str],
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_days: int = 7,
    max_events_per_user: int | None = None,
) -> str:
    """Replays events.funnel(window_days=..., max_events_per_user=...):
    the same fold per (user, epoch-window) with an optional earliest-N
    row_number cut; a user reaches a step if any window did.  Window id
    floor(days / wd) matches Spark's floor(unix / (86400·wd)) by the
    nested-floor identity (the ewma_anomalies_windowed_sql pattern)."""
    whens = " ".join(
        f"WHEN '{_sq(s)}' THEN {i}" for i, s in enumerate(steps, start=1)
    )
    in_list = ", ".join(f"'{_sq(s)}'" for s in steps)
    win = (
        f"CAST(floor(date_diff('day', DATE '1970-01-01', "
        f"CAST({ts_col} AS DATE)) / {window_days}.0) AS BIGINT)"
    )
    cap_rel = "e"
    if max_events_per_user is not None:
        cap_rel = "capped"
    rows = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS step_idx, '{_sq(s)}' AS step, "
        f"(SELECT COALESCE(SUM(CASE WHEN stage >= {i} THEN 1 ELSE 0 END), 0)::BIGINT "
        f" FROM st) AS n_users"
        for i, s in enumerate(steps, start=1)
    )
    capped_cte = (
        f""",
capped AS (
  SELECT u, win, ts, si FROM (
    SELECT u, win, ts, si,
           row_number() OVER (PARTITION BY u, win ORDER BY ts, si) AS rn
    FROM e
  ) WHERE rn <= {max_events_per_user}
)"""
        if max_events_per_user is not None
        else ""
    )
    return f"""
WITH e AS (
  SELECT {user_col} AS u, {ts_col} AS ts, {win} AS win,
         CASE {type_col} {whens} END AS si
  FROM {table} WHERE {type_col} IN ({in_list})
){capped_cte},
seqs AS (
  SELECT u, win, list(si ORDER BY ts, si) AS seq FROM {cap_rel} GROUP BY u, win
),
st AS (
  SELECT u, MAX(list_reduce(list_prepend(0, seq),
            (acc, x) -> acc + CASE WHEN x = acc + 1 THEN 1 ELSE 0 END)) AS stage
  FROM seqs GROUP BY u
)
{rows}
"""


def cohort_retention_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """Mirrors events.cohort_retention: epoch week = floor(days since
    1970-01-05 / 7.0); cohort = per-user min week."""
    wk = (
        f"CAST(floor(date_diff('day', DATE '1970-01-05', "
        f"CAST({ts_col} AS DATE)) / 7.0) AS BIGINT)"
    )
    return f"""
WITH a AS (
  SELECT DISTINCT {user_col} AS u, {wk} AS wk FROM {table}
),
f AS (SELECT u, MIN(wk) AS cohort_wk FROM a GROUP BY u)
SELECT cohort_wk, (wk - cohort_wk) AS offset_wk, COUNT(*)::BIGINT AS n_users
FROM a JOIN f USING (u)
GROUP BY cohort_wk, (wk - cohort_wk)
"""


#: the synthetic-PII injection used by the t_pii_stats driver query —
#: shared text so Spark (functions/privacy.py patterns) and this oracle
#: scan the same strings.  Mixed hit-rates (every doc gets one of each
#: kind; every 3rd doc a second e-mail, every 5th a second IPv4) keep
#: the per-source counts discriminating.
PII_INJECT_DUCK = (
    "text || ' contact user' || doc_id || '@mail.example.com or https://site'"
    " || (doc_id % 7) || '.example.org/p/' || doc_id"
    " || ' ip 10.' || (doc_id % 200) || '.0.' || (doc_id % 250)"
    " || ' tel +01-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')"
    " || CASE WHEN doc_id % 3 = 0 THEN ' cc admin@corp.example.net' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' via 192.168.0.' || (doc_id % 100) ELSE '' END"
)


def pii_stats_sql(table: str = "documents") -> str:
    """Mirrors the t_pii_stats driver query: inject deterministic PII
    spans, count per kind with the shared RE2/Java-safe patterns
    (privacy.PII_PATTERNS), chain-redact in the same order, and roll up
    per source."""
    from .privacy import PII_PATTERNS

    pats = list(PII_PATTERNS.items())
    redacted = "inj"
    for kind, pat in pats:
        redacted = (
            f"regexp_replace({redacted}, '{_sq(pat)}', "
            f"'[{_sq(kind.upper())}]', 'g')"
        )
    counts = ", ".join(
        f"SUM(len(regexp_extract_all(inj, '{_sq(pat)}')))::BIGINT AS n_{kind}"
        for kind, pat in pats
    )
    return f"""
WITH d AS (
  SELECT source, {PII_INJECT_DUCK} AS inj FROM {table}
)
SELECT source, COUNT(*)::BIGINT AS n_docs, {counts},
       SUM(length({redacted}))::BIGINT AS redacted_chars
FROM d
GROUP BY source
"""


def novelty_scores_sql(
    table: str = "documents", rare_df: int = 1, scale: int = 1000
) -> str:
    """Mirrors dedup.novelty_scores: distinct per-doc shingle hashes →
    corpus document frequencies → BIGINT floor-share of rare shingles."""
    return f"""
WITH s AS (
  SELECT doc_id, unnest({shingle_hashes(tokens('text'))}) AS sh FROM {table}
),
d AS (SELECT sh, COUNT(*) AS dfq FROM s GROUP BY sh),
p AS (
  SELECT s.doc_id,
         COUNT(*) AS n_shingles,
         SUM(CASE WHEN d.dfq <= {rare_df} THEN 1 ELSE 0 END) AS n_rare
  FROM s JOIN d USING (sh)
  GROUP BY s.doc_id
)
SELECT doc_id,
       CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(n_rare AS BIGINT) AS n_rare,
       CAST(({scale} * n_rare) // greatest(n_shingles, 1) AS BIGINT) AS novelty_pmille
FROM p
"""


def cell_balance_sql(table: str = "embeddings", scale: int = 1000) -> str:
    """Mirrors similarity.cell_balance with the seeded SEMDEDUP
    centroids: argmax-cosine assignment (ties -> larger index, matching
    Spark's struct array_max), per-cell counts, BIGINT floor shares."""
    from .constants import SEMDEDUP_CENTROIDS

    cent_rows = ",\n    ".join(
        f"({i}, [{', '.join(repr(v) + '::DOUBLE' for v in c)}])"
        for i, c in enumerate(SEMDEDUP_CENTROIDS)
    )
    return f"""
WITH c AS (
  SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS v FROM {table}
),
cents(idx, cv) AS (
  VALUES {cent_rows}
),
sims AS (
  SELECT c.id, cents.idx, {cosine('c.v', 'cents.cv')} AS cs
  FROM c CROSS JOIN cents
),
cell AS (
  SELECT id, idx AS cell FROM (
    SELECT id, idx,
           row_number() OVER (PARTITION BY id ORDER BY cs DESC, idx DESC) AS r
    FROM sims
  ) WHERE r = 1
),
counts AS (
  SELECT CAST(cell AS BIGINT) AS cell, COUNT(*) AS n_vecs FROM cell GROUP BY cell
),
tot AS (SELECT SUM(n_vecs) AS total FROM counts)
SELECT cell,
       CAST(n_vecs AS BIGINT) AS n_vecs,
       CAST(({scale} * n_vecs) // total AS BIGINT) AS share_pmille
FROM counts, tot
"""


def weighted_sample_n_sql(
    table: str = "documents",
    n: int = 100,
    weight_col: str = "n_chars",
    cols: str = "doc_id, lang, n_chars",
) -> str:
    """Mirrors sampling.weighted_sample_n: priority = hash/weight, one
    IEEE double division of exact integers."""
    key = poly_hash("doc_id::VARCHAR")
    return f"""
SELECT {cols},
       row_number() OVER (ORDER BY ({key})::DOUBLE / {weight_col}::DOUBLE, doc_id) AS sample_rank
FROM {table}
WHERE {weight_col} > 0
ORDER BY ({key})::DOUBLE / {weight_col}::DOUBLE, doc_id
LIMIT {n}
"""


def hard_negatives_ivf_sql(
    table: str = "embeddings", k: int = 5, max_query_id: int = 5, nprobe: int = 2
) -> str:
    """Mirrors similarity.hard_negatives(centroids=SEMDEDUP_CENTROIDS):
    the IVF cell-pruned scale path replayed end-to-end — corpus-side
    argmax cell, query-side top-``nprobe`` cells (ties → larger index,
    matching Spark's reverse(array_sort) over (s, i) structs), cell
    equi-join with the label-mismatch predicate, exact cosine,
    per-query window top-k."""
    from .constants import SEMDEDUP_CENTROIDS

    cent_rows = ",\n    ".join(
        f"({i}, [{', '.join(repr(v) + '::DOUBLE' for v in c)}])"
        for i, c in enumerate(SEMDEDUP_CENTROIDS)
    )
    return f"""
WITH c AS (
  SELECT vec_id AS id, label, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM {table}
),
cents(idx, cv) AS (
  VALUES {cent_rows}
),
sims AS (
  SELECT c.id, cents.idx, {cosine('c.v', 'cents.cv')} AS cs
  FROM c CROSS JOIN cents
),
cell AS (
  SELECT id, idx AS cell FROM (
    SELECT id, idx,
           row_number() OVER (PARTITION BY id ORDER BY cs DESC, idx DESC) AS r
    FROM sims
  ) WHERE r = 1
),
probes AS (
  SELECT id, idx AS cell FROM (
    SELECT id, idx,
           row_number() OVER (PARTITION BY id ORDER BY cs DESC, idx DESC) AS r
    FROM sims
  ) WHERE r <= {nprobe} AND id < {max_query_id}
),
scored AS (
  SELECT p.id AS query_id, a.label AS query_label,
         cl.id AS neighbor_id, b.label AS neighbor_label,
         round({cosine('b.v', 'a.v')}, 4) AS cos_sim
  FROM probes p
  JOIN cell cl ON cl.cell = p.cell
  JOIN c a ON a.id = p.id
  JOIN c b ON b.id = cl.id
  WHERE b.label != a.label
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, query_label, neighbor_id, neighbor_label, cos_sim,
       rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}
"""


def hard_negatives_sql(
    table: str = "embeddings", k: int = 5, max_query_id: int = 5
) -> str:
    """Mirrors similarity.hard_negatives: brute top-k with the
    label-mismatch predicate in place of the self-exclusion."""
    return f"""
WITH c AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v FROM {table}
),
q AS (SELECT vec_id, label, v FROM c WHERE vec_id < {max_query_id}),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
         c.vec_id AS neighbor_id, c.label AS neighbor_label,
         round({cosine('c.v', 'q.v')}, 4) AS cos_sim
  FROM c CROSS JOIN q WHERE c.label != q.label
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, query_label, neighbor_id, neighbor_label, cos_sim,
       rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}
"""


def containment_sql(table: str = "documents") -> str:
    from .constants import CONTAINMENT_THRESHOLD

    return f"""
WITH base AS (
  SELECT doc_id AS id, {shingle_hashes(tokens('text'))} AS sh FROM {table}
),
sizes AS (SELECT id, len(sh) AS n FROM base),
inv AS (SELECT id, unnest(sh) AS h FROM base),
shared AS (
  SELECT l.id AS id_a, r.id AS id_b, count(*)::BIGINT AS shared
  FROM inv l JOIN inv r ON l.h = r.h AND l.id != r.id
  GROUP BY l.id, r.id
)
SELECT s.id_a, s.id_b,
       round(s.shared::DOUBLE / sa.n, 4) AS containment
FROM shared s JOIN sizes sa ON sa.id = s.id_a
WHERE round(s.shared::DOUBLE / sa.n, 4) >= {CONTAINMENT_THRESHOLD}
"""


def containment_dedup_sql(table: str = "documents") -> str:
    from .constants import CONTAINMENT_THRESHOLD

    return f"""
WITH base AS (
  SELECT doc_id AS id, {shingle_hashes(tokens('text'))} AS sh FROM {table}
),
sizes AS (SELECT id, len(sh) AS n FROM base),
inv AS (SELECT id, unnest(sh) AS h FROM base),
shared AS (
  SELECT l.id AS id_a, r.id AS id_b, count(*)::BIGINT AS shared
  FROM inv l JOIN inv r ON l.h = r.h AND l.id != r.id
  GROUP BY l.id, r.id
),
pairs AS (
  SELECT s.id_a, s.id_b,
         round(s.shared::DOUBLE / sa.n, 4) AS c, sa.n AS n_a, sb.n AS n_b
  FROM shared s
  JOIN sizes sa ON sa.id = s.id_a
  JOIN sizes sb ON sb.id = s.id_b
),
dropped AS (
  SELECT DISTINCT id_a FROM pairs
  WHERE c >= {CONTAINMENT_THRESHOLD}
    AND (n_b > n_a OR (n_b = n_a AND id_b < id_a))
)
SELECT d.doc_id, d.n_chars
FROM {table} d
WHERE d.doc_id NOT IN (SELECT id_a FROM dropped)
"""


def containment_incremental_sql(
    table: str = "documents", batch_pred: str = "doc_id % 7 = 0"
) -> str:
    from .constants import CONTAINMENT_THRESHOLD

    return f"""
WITH b AS (
  SELECT doc_id AS bid, {shingle_hashes(tokens('text'))} AS sh
  FROM {table} WHERE {batch_pred}
),
c AS (
  SELECT doc_id AS cid, {shingle_hashes(tokens('text'))} AS sh
  FROM {table} WHERE NOT ({batch_pred})
),
b_sizes AS (SELECT bid, len(sh) AS n_b FROM b),
b_inv AS (SELECT bid, unnest(sh) AS h FROM b),
c_inv AS (SELECT cid, unnest(sh) AS h FROM c),
shared AS (
  SELECT bid, cid, count(*)::BIGINT AS shared
  FROM b_inv JOIN c_inv USING (h) GROUP BY bid, cid
)
SELECT s.bid AS batch_id, s.cid AS corpus_id,
       round(s.shared::DOUBLE / z.n_b, 4) AS containment
FROM shared s JOIN b_sizes z USING (bid)
WHERE round(s.shared::DOUBLE / z.n_b, 4) >= {CONTAINMENT_THRESHOLD}
"""

def containment_self_screen_sql(table: str = "documents") -> str:
    """Batch-order replay of the self-screening containment drain
    (``containment_screen_stream(self_screen=True)``): file 1 (batch
    docs with even doc_id) screens against the corpus index; its
    ACCEPTED docs join the index; file 2 (odd batch docs plus exact
    re-posts of file 1 at doc_id + 1000000) then screens against
    corpus + accepted-file-1 — the re-posts are catchable ONLY through
    the within-drain index append."""
    from .constants import CONTAINMENT_THRESHOLD

    sh = shingle_hashes(tokens("text"))
    return f"""
WITH f1 AS (
  SELECT doc_id AS bid, {sh} AS sh
  FROM {table} WHERE doc_id % 7 = 0 AND doc_id % 2 = 0
),
f2 AS (
  SELECT doc_id AS bid, {sh} AS sh
  FROM {table} WHERE doc_id % 7 = 0 AND doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 1000000 AS bid, {sh} AS sh
  FROM {table} WHERE doc_id % 7 = 0 AND doc_id % 2 = 0
),
c AS (
  SELECT doc_id AS cid, {sh} AS sh
  FROM {table} WHERE doc_id % 7 != 0
),
p1 AS (
  SELECT bi.bid, ci.cid,
         round(count(*)::DOUBLE / any_value(z.n_b), 4) AS containment
  FROM (SELECT bid, unnest(sh) AS h FROM f1) bi
  JOIN (SELECT cid, unnest(sh) AS h FROM c) ci USING (h)
  JOIN (SELECT bid, len(sh) AS n_b FROM f1) z ON z.bid = bi.bid
  GROUP BY bi.bid, ci.cid
  HAVING round(count(*)::DOUBLE / any_value(z.n_b), 4)
         >= {CONTAINMENT_THRESHOLD}
),
c2 AS (
  SELECT cid, sh FROM c
  UNION ALL
  SELECT bid AS cid, sh FROM f1
  WHERE bid NOT IN (SELECT DISTINCT bid FROM p1)
),
p2 AS (
  SELECT bi.bid, ci.cid,
         round(count(*)::DOUBLE / any_value(z.n_b), 4) AS containment
  FROM (SELECT bid, unnest(sh) AS h FROM f2) bi
  JOIN (SELECT cid, unnest(sh) AS h FROM c2) ci USING (h)
  JOIN (SELECT bid, len(sh) AS n_b FROM f2) z ON z.bid = bi.bid
  GROUP BY bi.bid, ci.cid
  HAVING round(count(*)::DOUBLE / any_value(z.n_b), 4)
         >= {CONTAINMENT_THRESHOLD}
),
u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
SELECT bid AS batch_id, cid AS corpus_id, containment FROM u
"""

def bloom_self_screen_sql(table: str = "documents") -> str:
    """Batch-order replay of the self-screening Bloom drain
    (``bloom_screen_stream(self_screen=True)``): file 1 (doc_id%4=1)
    probes the even-doc corpus filter; its ACCEPTED docs' bits fold
    into the mask; file 2 (doc_id%4=3 plus exact copies of file 1 at
    doc_id + 1000000) probes the widened mask — the copies are
    flaggable ONLY through the within-drain bit fold."""
    fp = fingerprint62("text")
    pos = ", ".join(_bloom_positions("fp"))
    return f"""
WITH corpus AS (
  SELECT {fp} AS fp FROM {table} WHERE doc_id % 2 = 0
),
f1 AS (
  SELECT doc_id, {fp} AS fp FROM {table} WHERE doc_id % 4 = 1
),
f2 AS (
  SELECT doc_id, {fp} AS fp FROM {table} WHERE doc_id % 4 = 3
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, {fp} AS fp
  FROM {table} WHERE doc_id % 4 = 1
),
bloom1 AS (
  SELECT DISTINCT bit FROM (SELECT unnest([{pos}]) AS bit FROM corpus)
),
p1 AS (
  SELECT doc_id, unnest(list_distinct([{pos}])) AS bit FROM f1
),
a1 AS (
  SELECT p.doc_id,
         count(*)::BIGINT AS n_bits,
         sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
  FROM p1 p LEFT JOIN bloom1 b ON b.bit = p.bit
  GROUP BY p.doc_id
),
r1 AS (SELECT doc_id, n_hits = n_bits AS maybe_dup FROM a1),
acc1 AS (
  SELECT f1.fp FROM f1 JOIN r1 USING (doc_id) WHERE NOT r1.maybe_dup
),
bloom2 AS (
  SELECT bit FROM bloom1
  UNION
  SELECT DISTINCT bit FROM (SELECT unnest([{pos}]) AS bit FROM acc1)
),
p2 AS (
  SELECT doc_id, unnest(list_distinct([{pos}])) AS bit FROM f2
),
a2 AS (
  SELECT p.doc_id,
         count(*)::BIGINT AS n_bits,
         sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
  FROM p2 p LEFT JOIN bloom2 b ON b.bit = p.bit
  GROUP BY p.doc_id
),
r2 AS (SELECT doc_id, n_hits = n_bits AS maybe_dup FROM a2)
SELECT doc_id, maybe_dup FROM r1
UNION ALL
SELECT doc_id, maybe_dup FROM r2
"""

def bloom_self_strict_sql(table: str = "documents") -> str:
    """``bloom_self_screen_sql`` with ``within_batch=True``: inside
    each file a doc is also flagged when an identical fingerprint
    appears at a lower doc_id (keep-first-by-id), and only first
    occurrences of novel fingerprints fold into the mask."""
    fp = fingerprint62("text")
    pos = ", ".join(_bloom_positions("fp"))
    return f"""
WITH corpus AS (
  SELECT {fp} AS fp FROM {table} WHERE doc_id % 2 = 0
),
f1 AS (
  SELECT doc_id, {fp} AS fp,
         row_number() OVER (PARTITION BY {fp} ORDER BY doc_id) AS rn
  FROM {table} WHERE doc_id % 4 = 1
),
f2_raw AS (
  SELECT doc_id, {fp} AS fp FROM {table} WHERE doc_id % 4 = 3
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, {fp} AS fp
  FROM {table} WHERE doc_id % 4 = 1
),
f2 AS (
  SELECT doc_id, fp,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM f2_raw
),
bloom1 AS (
  SELECT DISTINCT bit FROM (SELECT unnest([{pos}]) AS bit FROM corpus)
),
p1 AS (
  SELECT doc_id, unnest(list_distinct([{pos}])) AS bit FROM f1
),
h1 AS (
  SELECT p.doc_id,
         count(*) = sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)
           AS hit
  FROM p1 p LEFT JOIN bloom1 b ON b.bit = p.bit
  GROUP BY p.doc_id
),
r1 AS (
  SELECT f1.doc_id, (h1.hit OR f1.rn > 1) AS maybe_dup
  FROM f1 JOIN h1 ON h1.doc_id = f1.doc_id
),
acc1 AS (
  SELECT f1.fp FROM f1 JOIN h1 ON h1.doc_id = f1.doc_id
  WHERE NOT h1.hit AND f1.rn = 1
),
bloom2 AS (
  SELECT bit FROM bloom1
  UNION
  SELECT DISTINCT bit FROM (SELECT unnest([{pos}]) AS bit FROM acc1)
),
p2 AS (
  SELECT doc_id, unnest(list_distinct([{pos}])) AS bit FROM f2
),
h2 AS (
  SELECT p.doc_id,
         count(*) = sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)
           AS hit
  FROM p2 p LEFT JOIN bloom2 b ON b.bit = p.bit
  GROUP BY p.doc_id
),
r2 AS (
  SELECT f2.doc_id, (h2.hit OR f2.rn > 1) AS maybe_dup
  FROM f2 JOIN h2 ON h2.doc_id = f2.doc_id
)
SELECT doc_id, maybe_dup FROM r1
UNION ALL
SELECT doc_id, maybe_dup FROM r2
"""


def html_to_text_expr(expr: str) -> str:
    """DuckDB twin of ``text.html_to_text`` — the same RE2-subset
    regexp_replace chain (global flag; inline (?i)/(?s) modifiers),
    the same entity decode order (&amp; last), the same whitespace
    normalization."""
    c = f"regexp_replace({expr}, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    c = f"regexp_replace({c}, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    c = f"regexp_replace({c}, '(?s)<!--.*?-->', ' ', 'g')"
    c = (
        f"regexp_replace({c}, "
        "'(?i)<(br|/p|/div|/li|/tr|/h1|/h2|/h3|/h4|/h5|/h6)[^>]*>', "
        "chr(10), 'g')"
    )
    c = f"regexp_replace({c}, '<[^>]+>', ' ', 'g')"
    for ent, ch in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "''"),  # SQL-escaped single quote
        ("&amp;", "&"),
    ):
        c = f"replace({c}, '{ent}', '{ch}')"
    c = f"regexp_replace({c}, '[ \\t\\r]+', ' ', 'g')"
    c = f"regexp_replace({c}, ' ?\\n ?', chr(10), 'g')"
    c = f"regexp_replace({c}, '\\n+', chr(10), 'g')"
    return f"regexp_replace({c}, '^[\\s]+|[\\s]+$', '', 'g')"


def sentences_sql(table: str = "documents") -> str:
    """Mirror of text.split_sentences: the same boundary-mark regex
    (RE2 replacement backreference is \\1 in DuckDB, $1 in Spark),
    the same chr(1) split and position semantics."""
    return f"""
WITH marked AS (
  SELECT doc_id AS id,
         string_split(
           regexp_replace(trim(text), '([.!?]+)\\s+', '\\1' || chr(1), 'g'),
           chr(1)
         ) AS parts
  FROM {table}
),
expl AS (
  -- unnest + generate_subscripts zip positionally: unbounded, like
  -- text.split_sentences (a fixed position range would silently cap
  -- sentences per document)
  SELECT id,
         generate_subscripts(parts, 1) - 1 AS sent_idx,
         trim(unnest(parts)) AS sentence
  FROM marked
)
SELECT id, sent_idx::BIGINT AS sent_idx, sentence,
       LENGTH(sentence)::BIGINT AS n_chars
FROM expl WHERE LENGTH(sentence) > 0
"""
