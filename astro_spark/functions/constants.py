"""Shared constants for the portable (Spark ⇔ SQL oracle) text/dedup ops.

Every hash/LSH parameter lives here so the Spark implementation and the
DuckDB oracle SQL are generated from the SAME numbers — the correctness
gate hash-compares results, so both engines must agree bit-for-bit.

All hashing is char-level polynomial mod a 31-bit prime: small enough
that every intermediate (acc*MULT + codepoint) stays far below int64
overflow in both engines (DuckDB raises on BIGINT overflow rather than
wrapping, so 64-bit-wrapping hashes like xxhash64 are NOT portable).
"""

from __future__ import annotations

import random

P31 = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
MULT1 = 31
MULT2 = 37

# --- MinHash ---------------------------------------------------------------
MINHASH_K = 32  # signature length
LSH_BANDS = 8  # bands of r = K / BANDS = 4 rows
SHINGLE_K = 3  # words per shingle
MINHASH_JACCARD_THRESHOLD = 0.5

_rng = random.Random(42)
#: (a, b) pairs for h_i(x) = (a*x + b) mod P31
MINHASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, P31), _rng.randrange(0, P31)) for _ in range(MINHASH_K)
]

# --- SimHash ---------------------------------------------------------------
SIMHASH_BITS = 62  # two 31-bit poly hashes concatenated
# banding: pairs must share >= 1 chunk of ~13 bits.  Pigeonhole requires
# MAX_HAMMING < CHUNKS (k differing bits can ruin at most k chunks): with
# 4 chunks a hamming-4 pair could differ in every chunk and be missed.
SIMHASH_CHUNKS = 5
SIMHASH_MAX_HAMMING = 4

# --- N-gram jaccard --------------------------------------------------------
NGRAM_JACCARD_THRESHOLD = 0.30
CONTAINMENT_THRESHOLD = 0.60  # |A∩B|/|A| — "A is mostly inside B"

# --- Embedding LSH (random hyperplanes) ------------------------------------
N_HYPERPLANES = 8
EMBEDDING_DIM = 64
_rng_hp = random.Random(4242)
#: row-major planes, values rounded to 6 dp so SQL literals round-trip
HYPERPLANES: list[list[float]] = [
    [round(_rng_hp.gauss(0.0, 1.0), 6) for _ in range(EMBEDDING_DIM)]
    for _ in range(N_HYPERPLANES)
]
COSINE_DUP_THRESHOLD = 0.30

# BPE-ish pre-tokenizer pattern (GPT-style, RE2-safe): letter runs,
# 1-3-digit number chunks, single non-alnum marks.  Alternatives are
# disjoint at any position, so Java (Spark) leftmost-first and RE2
# (DuckDB) semantics agree exactly.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"

# --- Language-ID marker words ----------------------------------------------
# Real pipelines use per-language stopword lists; the synthetic corpus
# shares one vocabulary, so these are fixed marker sets — the operator
# semantics (score = |tokens ∩ markers| / |tokens|, argmax with
# alphabetical tie-break) are what is being exercised.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["table", "hash", "sort", "key", "vector"],
    "en": ["the", "a", "row", "scan", "fast"],
    "es": ["data", "query", "small", "slow", "stream"],
    "fr": ["window", "order", "value", "agg", "big"],
    "zh": ["merge", "spark", "batch", "join", "line"],
}

# --- Quality scoring -------------------------------------------------------
QUALITY_MIN_CHARS = 60
QUALITY_MIN_DISTINCT_RATIO = 0.35

# span-level exact dedup (Lee et al., "Deduplicating Training Data Makes
# Language Models Better" — ExactSubstr, simplified to fixed non-overlapping
# token windows so the result is SQL-oracle-checkable)
SPAN_W = 8  # tokens per non-overlapping span
SPAN_MIN_DOCS = 2  # span counts as duplicated when seen in >= this many docs

# hashed-bag-of-words linear classifier (fastText/Vowpal-Wabbit hashing
# trick: score = bias + sum over tokens of weight[token_hash % BUCKETS]).
# Weights are a fixed seeded table so Spark and the DuckDB oracle share it.
CLASSIFIER_BUCKETS = 64
CLASSIFIER_BIAS = -40
_rng_clf = random.Random(7)
CLASSIFIER_WEIGHTS: list[int] = [
    _rng_clf.randint(-5, 5) for _ in range(CLASSIFIER_BUCKETS)
]

# product quantization (Jégou et al.): M subspaces × K codes fixed seeded
# codebooks, shared by the Spark pipeline and the DuckDB oracle so the
# whole encode→ADC→re-rank pipeline is hash-checkable.  pq_train()
# produces data-trained books for real deployments (recall pinned in
# tests); the seeded books exist so correctness doesn't depend on recall.
PQ_M = 8  # subspaces (64-dim / 8 = 8 dims each)
PQ_CODES = 16  # centroids per subspace
PQ_SHORTLIST = 50
_rng_pq = random.Random(1717)
PQ_BOOKS: list[list[list[float]]] = [
    [
        [round(_rng_pq.uniform(-0.4, 0.4), 6) for _ in range(64 // PQ_M)]
        for _ in range(PQ_CODES)
    ]
    for _ in range(PQ_M)
]

# KMV cardinality sketch: the two-level shingle folds produce
# structured values (short-word char hashes are small), which skews the
# minimum-order statistics the estimator depends on; a seeded universal
# affine map (a·h + b) mod P31 per 31-bit half scatters them uniformly.
# a·h < 2^62 stays inside BIGINT in both engines.
_rng_kmv = random.Random(2718)
KMV_COEFFS: list[tuple[int, int]] = [
    (_rng_kmv.randrange(1, P31), _rng_kmv.randrange(0, P31)) for _ in range(2)
]

# count-min sketch (Cormode & Muthukrishnan): d seeded hash rows x w
# counters.  Shared by Spark and the DuckDB oracle.
CMS_W = 1024
CMS_D = 3
_rng_cms = random.Random(99)
CMS_COEFFS: list[tuple[int, int]] = [
    (_rng_cms.randrange(1, P31), _rng_cms.randrange(0, P31)) for _ in range(CMS_D)
]

# --- SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication") ---------------------------------
# Seeded cell centroids so the driver query's cluster assignment is
# replayable in the oracle; semantic_dedup() also accepts data-trained
# centroids from similarity.ivf_train for real deployments.
SEMDEDUP_CELLS = 8
SEMDEDUP_THRESHOLD = 0.30  # within-cell cosine above which docs are near-dups
_rng_sd = random.Random(555)
SEMDEDUP_CENTROIDS: list[list[float]] = [
    [round(_rng_sd.gauss(0.0, 0.25), 6) for _ in range(EMBEDDING_DIM)]
    for _ in range(SEMDEDUP_CELLS)
]

# --- Bloom-filter membership (Bloom 1970) -----------------------------------
# k seeded pairwise-independent hash rows over the 62-bit fingerprint,
# reduced mod P31 first so every product stays inside int64 in both
# engines.  m bits; the "filter" is materialized as the DISTINCT set-bit
# relation (<= m tiny rows) and broadcast.
BLOOM_M = 32768  # bits
BLOOM_K = 4  # hash functions
# Above this mask size the streaming screen ships the bitmask as a
# broadcast numpy array probed in an Arrow stage instead of compiling
# it into the plan as an F.array literal: a petabyte-corpus FPR needs
# m ≈ 10^10 bits, and a 10^8-element literal array blows plan
# serialization long before that (VERDICT r9 #2).  2^20 bits = 16k
# long literals, comfortably inside plan-size limits.
BLOOM_LITERAL_MAX_BITS = 1 << 20
_rng_bloom = random.Random(31337)
BLOOM_COEFFS: list[tuple[int, int]] = [
    (_rng_bloom.randrange(1, P31), _rng_bloom.randrange(0, P31))
    for _ in range(BLOOM_K)
]

# --- DSIR-style importance weighting (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling") ----------------------------
# Hashed-unigram bucket model; weights are integer-scaled rational ratios
# (no log/exp) so the per-doc scores are BIGINT-exact in both engines.
DSIR_BUCKETS = 256
DSIR_SCALE = 1_000_000

# --- hashed bigram LM (CCNet-style perplexity quality filter) ---------------
# Conditional-probability model over HASHED token buckets so the count
# tables are bounded (broadcastable) no matter the vocabulary: unigram
# context buckets U and bigram buckets B.  Scores are integer-scaled
# rational ratios — BIGINT-exact in both engines.
LM_UNI_BUCKETS = 4096
LM_BI_BUCKETS = 65536
LM_SCALE = 1_000_000

# --- BPE subword tokenization (Sennrich et al. 2016) ------------------------
# 16 merges TRAINED on the sf0.01 documents fixture with bpe_train's exact
# greedy arithmetic, then frozen (the PQ_BOOKS pattern: the driver query
# runs the seeded table so the DuckDB oracle replays the whole apply
# pipeline; training determinism is pinned in pytest against a pure-Python
# reference).  Merges apply in order, greedy left-to-right within a word.
BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"), ("m", "er"),
    ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"), ("j", "o"), ("jo", "in"),
    ("a", "s"), ("as", "h"), ("h", "ash"), ("r", "ow"),
]
