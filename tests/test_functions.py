"""Tests for the LLM-pipeline function layer + plan-shape assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_spark.functions import dedup, multimodal, similarity, text
from astro_spark.functions.constants import MINHASH_K
from astro_spark.testdata import read_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").persist()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").persist()


class TestText:
    def test_char_poly_hash_known_value(self, spark):
        # h("abc") = ((0*31+97)*31+98)*31+99 = 96354 — pinned so the oracle
        # contract (functions/oracles.py) can never drift silently
        df = spark.createDataFrame([("abc",)], ["t"])
        assert df.select(text.char_poly_hash("t").alias("h")).collect()[0].h == 96354

    def test_token_count(self, spark):
        df = spark.createDataFrame([("  a  b   c ",)], ["t"])
        assert df.select(text.token_count("t").alias("n")).collect()[0].n == 3

    def test_bpe_token_count(self, spark):
        # "ab 12345 x-y." → [ab][123][45][x][-][y][.] = 7 pre-tokens
        df = spark.createDataFrame([("ab 12345 x-y.",)], ["t"])
        assert df.select(text.bpe_token_count("t").alias("n")).collect()[0].n == 7

    def test_quality_metrics_ranges(self, docs):
        m = text.quality_metrics(F.col("text"))
        row = docs.select(*[v.alias(k) for k, v in m.items()]).agg(
            F.min("distinct_ratio"), F.max("distinct_ratio"), F.min("n_tokens")
        ).collect()[0]
        assert 0 <= row[0] <= row[1] <= 1 and row[2] > 0

    def test_collocations_finds_planted_phrase(self, spark):
        """A phrase whose words only ever co-occur tops the lift
        ranking; frequent-but-independent pairs rank below."""
        df = spark.createDataFrame(
            [(i, "alpha beta common filler common filler") for i in range(5)]
            + [(100 + i, "common filler other words") for i in range(5)],
            ["doc_id", "text"],
        )
        out = text.collocations(df, k=3, min_count=3).collect()
        assert out[0].bigram == "alpha beta"

    def test_minhash_estimates_close_to_exact(self, docs):
        """Signature estimate within 0.25 of exact Jaccard for every
        verified pair (K=32 signatures)."""
        rows = dedup.minhash_jaccard_estimates(docs).collect()
        assert rows
        for r in rows:
            assert abs(r.est_x10000 / 10000 - r.jaccard) <= 0.25, r

    def test_count_min_never_underestimates(self, docs):
        """CMS property: every estimate >= the exact count, and the
        clear heavy hitter keeps rank 1."""
        exact = {r.token: r.n for r in text.top_terms(docs, k=20).collect()}
        est = {r.token: r.est_count
               for r in text.count_min_top_terms(docs, k=20).collect()}
        common = set(exact) & set(est)
        assert common and all(est[t] >= exact[t] for t in common)
        top_exact = max(exact, key=lambda t: (exact[t], t))
        assert est.get(top_exact, 0) >= exact[top_exact]

    def test_tfidf_rare_term_outranks_common(self, spark):
        """A token unique to one doc scores above tokens shared by all
        docs; ranks are dense 1..k with deterministic tie-break."""
        df = spark.createDataFrame(
            [(1, "common words here rareword"), (2, "common words here"),
             (3, "common words here")],
            ["doc_id", "text"],
        )
        out = text.tfidf_top_terms(df, k=2).collect()
        top1 = {r.doc_id: r.token for r in out if r.rank == 1}
        assert top1[1] == "rareword"
        # doc 2/3 all-tied terms break alphabetically
        assert top1[2] == "common" and top1[3] == "common"

    def test_classify_quality_deterministic_and_map_only(self, docs):
        """Hashed-BoW classifier: stable scores, labels follow the sign,
        and the plan has NO shuffle (pure map over the scan)."""
        out = text.classify_quality(docs)
        rows = {r.doc_id: (r.clf_score, r.clf_label) for r in out.collect()}
        assert rows == {r.doc_id: (r.clf_score, r.clf_label) for r in out.collect()}
        assert all((s >= 0) == (lb == "keep") for s, lb in rows.values())
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_predict_lang_deterministic(self, docs):
        p1 = {r.doc_id: r.l for r in docs.select("doc_id", text.predict_lang(F.col("text")).alias("l")).collect()}
        p2 = {r.doc_id: r.l for r in docs.select("doc_id", text.predict_lang(F.col("text")).alias("l")).collect()}
        assert p1 == p2 and set(p1.values()) <= {"de", "en", "es", "fr", "zh"}


class TestDedup:
    def test_normalize_text_variants_collapse(self, spark):
        df = spark.createDataFrame(
            [("Hello,  World!",), ("hello world",), ("HELLO--WORLD",), ("other",)],
            ["text"],
        )
        out = df.select(text.normalize_text("text").alias("n")).collect()
        vals = [r.n for r in out]
        assert vals[:3] == ["hello world"] * 3 and vals[3] == "other"

    def test_repetition_metrics_detect_loops(self, spark):
        """A degenerate looping doc shows high dup_frac / top count; a
        non-repeating doc shows zero duplication."""
        df = spark.createDataFrame(
            [
                (1, "spam ham eggs " * 10),          # trigram loop
                (2, "one two three four five six"),  # all distinct
            ],
            ["doc_id", "text"],
        )
        from astro_spark.functions.text import repetition_metrics

        got = {r.doc_id: r for r in repetition_metrics(df).collect()}
        assert got[1].n_ngrams == 28 and got[1].n_distinct == 3
        assert got[1].dup_frac > 0.85 and got[1].top_ngram_count == 10
        assert got[2].dup_frac == 0.0 and got[2].top_ngram_count == 1

    def test_quality_filter_reasons(self, spark):
        rows = [("one two",), ("aa bb cc dd ee ff",), ("longwords absolutely wonderful tremendous frankly",)]
        df = spark.createDataFrame(rows, ["text"])
        out = [
            r.v
            for r in df.select(
                text.quality_filter(F.col("text"), min_tokens=3, min_avg_token_len=3.0).alias("v")
            ).collect()
        ]
        assert out == ["too_few_tokens", "short_tokens", "ok"]

    def test_top_terms_deterministic_tiebreak(self, spark):
        df = spark.createDataFrame([("b a",), ("a b",), ("c",)], ["text"])
        out = text.top_terms(df, k=2).collect()
        assert [(r.token, r.n) for r in out] == [("a", 2), ("b", 2)]

    def test_hash_split_deterministic_and_complete(self, docs):
        from astro_spark.functions.sampling import hash_split

        a = hash_split(docs, "doc_id")
        b = hash_split(docs.repartition(13), "doc_id")
        ca = {r.split: r.n_docs for r in a.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs")).collect()}
        cb = {r.split: r.n_docs for r in b.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs")).collect()}
        assert ca == cb  # partitioning never changes assignment
        assert sum(ca.values()) == docs.count()
        assert set(ca) <= {"train", "val", "test"}
        assert ca["train"] > ca.get("val", 0)  # rough proportionality

    def test_assign_shards_stable_and_dense(self, docs):
        from astro_spark.functions.sampling import assign_shards

        a = assign_shards(docs, n_shards=4)
        b = assign_shards(docs.repartition(13), n_shards=4)
        assert sorted(map(tuple, a.select("doc_id", "shard", "pos").collect())) == \
            sorted(map(tuple, b.select("doc_id", "shard", "pos").collect()))
        # positions are dense 1..n within every shard
        per = a.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
        ).collect()
        assert all(r.mn == 1 and r.mx == r.n for r in per)
        assert sum(r.n for r in per) == docs.count()

    def test_stratified_sample_exact_n_and_stable(self, docs):
        from astro_spark.functions.sampling import stratified_sample

        out = stratified_sample(docs, "source", n_per_group=3)
        per = {r.source: r.n for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
        sizes = {r.source: r.n for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert all(n == min(3, sizes[s]) for s, n in per.items())
        again = stratified_sample(docs.repartition(7), "source", n_per_group=3)
        assert sorted(r.doc_id for r in out.collect()) == sorted(
            r.doc_id for r in again.collect()
        )

    def test_export_training_shards_layout_and_order(self, docs, tmp_path):
        import glob
        import os

        from astro_spark.functions.sampling import assign_shards, export_training_shards

        out = str(tmp_path / "shards")
        export_training_shards(docs, out, n_shards=4)
        dirs = sorted(os.path.basename(d) for d in glob.glob(out + "/shard=*"))
        assert dirs == [f"shard={i}" for i in range(4)]
        spark = docs.sparkSession
        # each shard directory holds exactly one data file, rows in pos order
        expect = {
            r.shard: [x.doc_id for x in sorted(
                assign_shards(docs, n_shards=4).where(F.col("shard") == r.shard).collect(),
                key=lambda x: x.pos,
            )]
            for r in assign_shards(docs, n_shards=4).select("shard").distinct().collect()
        }
        for i in range(4):
            files = glob.glob(f"{out}/shard={i}/*.parquet")
            assert len(files) == 1
            got = [r.doc_id for r in spark.read.parquet(files[0]).collect()]
            assert got == expect[i]

    def test_decontaminate_flags_only_overlapping_docs(self, spark):
        """Doc sharing >= min_shared 3-word shingles with the benchmark
        is flagged with the exact distinct-shingle overlap count; a
        disjoint doc is not."""
        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
        )
        train = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "totally different words here nothing shared whatsoever"),
            ],
            ["doc_id", "text"],
        )
        out = {
            r.doc_id: r.shared_shingles
            for r in dedup.decontaminate(train, bench, min_shared=3).collect()
        }
        # bench has 3 shingles (5 words, k=3); doc 1 contains all 3
        assert out == {1: 3}

    def test_pack_sequences_contiguous_token_layout(self, spark):
        """Offset packing: doc i has i+1 tokens; pack/offset must equal
        div/mod of the exclusive prefix sum, across bucket boundaries."""
        from astro_spark.functions.sampling import pack_sequences

        df = spark.createDataFrame(
            [(i, " ".join(["w"] * (i + 1))) for i in range(10)], ["doc_id", "text"]
        )
        out = {
            r.doc_id: r for r in pack_sequences(df, budget=7, n_buckets=3).collect()
        }
        cum = 0
        for i in range(10):
            assert out[i].n_tokens == i + 1
            assert out[i].pack_id == cum // 7
            assert out[i].pack_offset == cum % 7
            cum += i + 1

    def test_dataset_card_summary_stats(self, spark):
        """Known corpus: 3 en docs with 1/2/4 tokens, 1 fr doc with 3 —
        every stat is hand-computable, median interpolates to 2.0."""
        df = spark.createDataFrame(
            [
                (1, "a", "en"),
                (2, "a b", "en"),
                (3, "a b c d", "en"),
                (4, "x y z", "fr"),
            ],
            ["doc_id", "text", "lang"],
        )
        out = {r.grp: r for r in text.dataset_card(df).collect()}
        en = out["en"]
        assert (en.n_docs, en.total_tokens, en.min_tokens, en.max_tokens) == (3, 7, 1, 4)
        assert en.median_tokens == 2.0
        assert en.avg_tokens_x100 == 700 // 3
        assert out["fr"].median_tokens == 3.0

    def test_quantize_int8_checksums(self, spark):
        """Known vector: amax=2 → scale 63.5 → q=[64,-127,32] (HALF_UP
        away from zero), so qsum/qnorm are fixed integers."""
        df = spark.createDataFrame([(1, [1.0, -2.0, 0.5])], ["vec_id", "embedding"])
        r = similarity.quantize_int8(df).collect()[0]
        assert r.qsum == 64 - 127 + 32
        assert r.qnorm == 64**2 + 127**2 + 32**2
        assert abs(r.amax - 2.0) < 1e-9

    def test_temperature_mix_downweights_dominant_domain(self, spark):
        """sqrt weighting: the tiny domain keeps everything (threshold
        caps at 1), the dominant domain is downsampled."""
        from astro_spark.functions.sampling import temperature_mix

        # long ids: short id strings poly-hash below every threshold
        rows = [(10_000_019 * (i + 1), "big") for i in range(100)] + [
            (7_777_777 + i, "small") for i in range(4)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        out = {r.source: r for r in temperature_mix(df).collect()}
        assert out["small"].n_after == out["small"].n_before == 4
        assert 0 < out["big"].n_after < out["big"].n_before == 100

    def test_incremental_dedup_excludes_seen(self, spark):
        rows = [(1, "alpha"), (2, "beta")]
        seen = spark.createDataFrame(rows, ["doc_id", "text"])
        new = spark.createDataFrame(
            [(10, "alpha"), (11, "gamma"), (12, "gamma")], ["doc_id", "text"]
        )
        out = dedup.incremental_exact_dedup(new, seen).collect()
        assert len(out) == 1 and out[0].text == "gamma"
        assert out[0].doc_id == 11 and out[0].dup_count == 2

    def test_span_dedup_counts_shared_windows(self, spark):
        """Two docs sharing one exact 8-token window each report 1 dup
        span; an unrelated doc reports 0.  Short docs (<8 tokens) have 0
        spans."""
        shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
        df = spark.createDataFrame(
            [
                (1, shared + " filler one two three four five six"),
                (2, shared + " other words here pad pad pad pad pad"),
                (3, "totally different content with eight brand new tokens"),
                (4, "short doc"),
            ],
            ["doc_id", "text"],
        )
        out = {r.doc_id: (r.n_spans, r.n_dup_spans)
               for r in dedup.exact_span_dedup(df).collect()}
        assert out[1] == (1, 1) and out[2] == (2, 1)
        assert out[3] == (1, 0) and out[4] == (0, 0)

    def test_span_dedup_plan_single_explode_scan(self, docs):
        """Plan shape: no cartesian/BNLJ — span join is a hash join."""
        plan = dedup.exact_span_dedup(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_exact_dedup_no_dups_identity(self, docs):
        out = dedup.exact_dedup(docs)
        assert out.count() == docs.count()
        assert out.agg(F.max("dup_count")).collect()[0][0] == 1

    def test_exact_dedup_finds_injected_dup(self, spark, docs):
        dup = docs.limit(1).withColumn("doc_id", F.col("doc_id") + 100000)
        out = dedup.exact_dedup(docs.unionByName(dup))
        assert out.count() == docs.count()
        assert out.agg(F.max("dup_count")).collect()[0][0] == 2

    def test_minhash_signature_length(self, docs):
        sig = docs.limit(2).select(
            dedup.minhash_signature(
                dedup.shingle_hash_array(F.col("text"))
            ).alias("sig")
        ).collect()
        assert all(len(r.sig) == MINHASH_K for r in sig)

    def test_minhash_pairs_symmetric_threshold(self, docs):
        pairs = dedup.minhash_lsh_pairs(docs).collect()
        assert all(r.id_a < r.id_b and r.jaccard >= 0.5 for r in pairs)
        assert len(pairs) > 0  # corpus contains near-dups

    def test_minhash_pairs_prebuilt_signatures_identical(
        self, docs, tmp_path
    ):
        """signatures= (the persisted build_minhash_index relation)
        returns the identical pair set without re-shingling or the
        per-call eager-materialize trade — the codes= pattern for
        repeat callers (VERDICT r8 #5)."""
        idx = str(tmp_path / "lsh_idx")
        dedup.build_minhash_index(docs, idx)
        spark = docs.sparkSession
        prebuilt = {
            (r.id_a, r.id_b, r.jaccard)
            for r in dedup.minhash_lsh_pairs(
                None, signatures=spark.read.parquet(idx)
            ).collect()
        }
        direct = {
            (r.id_a, r.id_b, r.jaccard)
            for r in dedup.minhash_lsh_pairs(docs).collect()
        }
        assert prebuilt == direct and len(prebuilt) > 0

    def test_containment_pairs_prebuilt_inverted_identical(
        self, docs, tmp_path
    ):
        """inverted= (the persisted build_containment_index relation)
        returns the identical directed pair set without re-shingling —
        and stays value-identical when the index carries at-least-once
        duplicate rows (DISTINCT-counted sizes and shared counts)."""
        idx = str(tmp_path / "cont_idx")
        dedup.build_containment_index(docs, idx)
        spark = docs.sparkSession
        direct = {
            (r.id_a, r.id_b, r.containment)
            for r in dedup.containment_pairs(docs).collect()
        }
        prebuilt = {
            (r.id_a, r.id_b, r.containment)
            for r in dedup.containment_pairs(
                None, inverted=spark.read.parquet(idx)
            ).collect()
        }
        assert prebuilt == direct and len(direct) > 0
        # a re-appended batch (duplicate rows) must not move any score
        dedup.update_containment_index(docs.limit(20), idx)
        dup_rows = {
            (r.id_a, r.id_b, r.containment)
            for r in dedup.containment_pairs(
                None, inverted=spark.read.parquet(idx)
            ).collect()
        }
        assert dup_rows == direct

    def test_containment_pairs_df_inverted_contract(self, docs):
        with pytest.raises(ValueError, match="exactly one"):
            dedup.containment_pairs(None)
        with pytest.raises(ValueError, match="exactly one"):
            dedup.containment_pairs(docs, inverted=docs)

    def test_minhash_pairs_df_signatures_contract(self, docs):
        """Both-or-neither of df/signatures is a clear contract error,
        not an opaque AttributeError downstream (ADVICE r9)."""
        with pytest.raises(ValueError, match="exactly one"):
            dedup.minhash_lsh_pairs(None)
        with pytest.raises(ValueError, match="exactly one"):
            dedup.minhash_lsh_pairs(docs, signatures=docs)

    def test_simhash_near_identical_texts(self, spark):
        rows = [(1, "the quick brown fox jumps over the lazy dog again and again"),
                (2, "the quick brown fox jumps over the lazy dog again and again!"),
                (3, "completely different content about spark shuffles and joins")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        sims = {r.id: r.simhash for r in dedup.simhash_table(df).collect()}
        h12 = bin(sims[1] ^ sims[2]).count("1")
        h13 = bin(sims[1] ^ sims[3]).count("1")
        assert h12 < h13

    def test_simhash_banding_recall_complete(self, docs):
        """Pigeonhole soundness: banding must find EVERY pair with
        hamming <= SIMHASH_MAX_HAMMING (requires MAX_HAMMING < CHUNKS —
        at 4 chunks a hamming-4 pair could differ in all 4 and be missed)."""
        from astro_spark.functions.constants import (
            SIMHASH_CHUNKS,
            SIMHASH_MAX_HAMMING,
        )

        assert SIMHASH_MAX_HAMMING < SIMHASH_CHUNKS
        table = dedup.simhash_table(docs).withColumnRenamed("simhash", "sh")
        l, r = table.alias("l"), table.alias("r")
        brute = (
            l.join(r, F.col("l.id") < F.col("r.id"))
            .where(
                F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh")))
                <= SIMHASH_MAX_HAMMING
            )
            .count()
        )
        assert dedup.simhash_pairs(docs).count() == brute

    def test_cosine_np_blocked_equals_fold_exact(self, emb):
        """The block-matmul exact twin must emit the identical pair set
        as the fold-based oracle-checked baseline."""
        fold = {(r.id_a, r.id_b) for r in dedup.cosine_dup_pairs(emb).collect()}
        blocked = {
            (r.id_a, r.id_b) for r in dedup.cosine_dup_pairs_np(emb).collect()
        }
        assert blocked == fold and len(fold) > 0

    def test_dup_clusters_transitive(self, spark):
        """A~B and B~C must land in ONE cluster even with no A~C edge;
        disconnected docs stay singletons with their own id."""
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 9)], ["id_a", "id_b"]
        )
        ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 5, 7, 9]], ["doc_id"])
        got = {
            r.doc_id: r.cluster_id
            for r in dedup.dup_clusters(pairs, ids).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 5: 5, 7: 7, 9: 7}

    def test_dup_clusters_chain_diameter(self, spark):
        """Label propagation converges past a long chain (diameter > 2)."""
        chain = [(i, i + 1) for i in range(1, 8)]
        pairs = spark.createDataFrame(chain, ["id_a", "id_b"])
        ids = spark.createDataFrame([(i,) for i in range(1, 9)], ["doc_id"])
        got = {r.doc_id: r.cluster_id for r in dedup.dup_clusters(pairs, ids).collect()}
        assert set(got.values()) == {1}

    def test_ngram_jaccard_exactness(self, spark):
        rows = [(1, "a b c d e"), (2, "a b c d x"), (3, "p q r s t")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        pairs = {(r.id_a, r.id_b): r.jaccard for r in
                 dedup.ngram_jaccard_pairs(df, threshold=0.1).collect()}
        # shingles(1): {abc,bcd,cde}, shingles(2): {abc,bcd,cdx} → J = 2/4
        assert pairs == {(1, 2): 0.5}


class TestSpanRemoval:
    def test_remove_duplicate_spans_keep_first(self, spark):
        """Duplicated windows are excised everywhere except the lowest-id
        keeper; partial trailing windows survive; a fully-duplicated doc
        collapses to empty text."""
        df = spark.createDataFrame(
            [
                (1, "a b c d x y z"),          # w0=abcd (keeper), partial xyz
                (2, "a b c d p q r s"),        # w0=abcd (dup), w1=pqrs (keeper)
                (3, "p q r s a b c d"),        # both windows duplicated
            ],
            ["doc_id", "text"],
        )
        out = {
            r.doc_id: (r.clean_text, r.n_tokens_removed)
            for r in dedup.remove_duplicate_spans(df, w=4, min_docs=2).collect()
        }
        assert out[1] == ("a b c d x y z", 0)
        assert out[2] == ("p q r s", 4)
        assert out[3] == ("", 8)


class TestHotBucketCap:
    def test_lsh_hot_bucket_cap(self, spark):
        """A boilerplate flood puts O(n) docs in one LSH bucket → O(n²)
        candidate pairs; max_bucket_size drops the hot bucket while
        smaller buckets still pair (both MinHash-LSH and cosine-LSH)."""
        boiler = "the quick brown fox jumps over the lazy dog again and again"
        near_a = "completely different document about distributed query engines"
        near_b = "completely different document about distributed query engine"
        docs = spark.createDataFrame(
            [(i, boiler) for i in range(20)]
            + [(100, near_a), (101, near_b)],
            ["doc_id", "text"],
        )
        uncapped = dedup.minhash_lsh_pairs(docs).collect()
        assert len(uncapped) > 100  # the flood dominates
        capped = {
            (r.id_a, r.id_b)
            for r in dedup.minhash_lsh_pairs(docs, max_bucket_size=5).collect()
        }
        assert capped == {(100, 101)}

        dim = 64
        hot = [1.0] + [0.0] * (dim - 1)          # bucket 5 (deterministic)
        p1 = [-1.0, 0.5] + [0.0] * (dim - 2)     # bucket 242
        p2 = [-1.0, 0.52] + [0.0] * (dim - 2)    # bucket 242
        vecs = spark.createDataFrame(
            [(i, hot) for i in range(10)] + [(100, p1), (101, p2)],
            "vec_id long, embedding array<double>",
        )
        assert len(similarity.lsh_cosine_pairs(vecs).collect()) > 40
        capped_pairs = {
            (r.id_a, r.id_b)
            for r in similarity.lsh_cosine_pairs(
                vecs, max_bucket_size=5
            ).collect()
        }
        assert capped_pairs == {(100, 101)}


class TestSimilarity:
    def test_pq_train_beats_seeded_books(self, spark, emb):
        """Lloyd's-trained codebooks quantize the corpus with lower
        squared error than the seeded random books — pins that pq_train
        actually learns from data."""
        from astro_spark.functions.constants import PQ_BOOKS

        def _sqerr(books):
            m, dsub = len(books), len(books[0][0])
            enc = similarity.pq_encode(emb, books)
            joined = enc.join(emb, "vec_id").select(
                similarity.as_double(F.col("embedding")).alias("v"), "pq_codes"
            )
            err = F.lit(0.0)
            for s in range(m):
                book_lit = F.array(
                    *[F.array(*[F.lit(float(x)) for x in c]) for c in books[s]]
                )
                cent = F.element_at(
                    book_lit, F.element_at(F.col("pq_codes"), s + 1) + F.lit(1)
                )
                sv = F.slice(F.col("v"), s * dsub + 1, dsub)
                err = err + F.aggregate(
                    F.zip_with(sv, cent, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda x, y: x + y,
                )
            return joined.agg(F.sum(err)).collect()[0][0]

        trained = similarity.pq_train(emb, m=8, n_codes=16, iterations=2)
        assert _sqerr(trained) < _sqerr(PQ_BOOKS)

    def test_hard_negatives_full_probe_equals_brute_force(self, spark, emb):
        """IVF-pruned hard-negative mining with nprobe = n_cells is
        provably the brute-force result (every corpus row is a
        candidate exactly once), independent of centroid quality —
        the knn_graph equality contract applied to the miner."""
        from astro_spark.functions.constants import SEMDEDUP_CENTROIDS

        q = emb.where("vec_id < 5")
        brute = {
            (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
            for r in similarity.hard_negatives(emb, q, k=5).collect()
        }
        full_probe = {
            (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
            for r in similarity.hard_negatives(
                emb, q, k=5,
                centroids=SEMDEDUP_CENTROIDS,
                nprobe=len(SEMDEDUP_CENTROIDS),
            ).collect()
        }
        assert full_probe == brute

    def test_hard_negatives_indexed_equals_in_memory_ivf(self, spark, emb, tmp_path):
        """Mining against the persisted index (label stored in the cell
        files) returns exactly the in-memory IVF miner's rows."""
        from astro_spark.functions.constants import SEMDEDUP_CENTROIDS

        idx = str(tmp_path / "idx")
        similarity.ivf_write_index(emb, SEMDEDUP_CENTROIDS, idx)
        q = emb.where("vec_id < 5")
        key = lambda r: (r.query_id, r.rank, r.neighbor_id, r.cos_sim,
                         r.query_label, r.neighbor_label)
        mem = sorted(map(key, similarity.hard_negatives(
            emb, q, k=5, centroids=SEMDEDUP_CENTROIDS, nprobe=2).collect()))
        idx_rows = sorted(map(key, similarity.hard_negatives_indexed(
            spark, idx, q, nprobe=2, k=5).collect()))
        assert idx_rows == mem

    def test_hard_negatives_ivf_never_crosses_labels_and_prunes(self, spark, emb):
        """nprobe < n_cells returns only label-mismatched neighbors and
        a subset of the brute-force candidate space (recall ≤ 1 but
        nothing invented)."""
        from astro_spark.functions.constants import SEMDEDUP_CENTROIDS

        q = emb.where("vec_id < 5")
        got = similarity.hard_negatives(
            emb, q, k=5, centroids=SEMDEDUP_CENTROIDS, nprobe=2
        ).collect()
        assert got and all(r.query_label != r.neighbor_label for r in got)
        brute_pairs = {
            (r.query_id, r.neighbor_id)
            for r in similarity.hard_negatives(emb, q, k=10_000).collect()
        }
        assert {(r.query_id, r.neighbor_id) for r in got} <= brute_pairs

    def test_pq_indivisible_dim_raises(self, spark, emb):
        """dim % m != 0 would silently drop trailing dims from codebooks
        and ADC scoring — both train and encode fail fast instead."""
        from astro_spark.functions.constants import PQ_BOOKS

        with pytest.raises(ValueError, match="not divisible"):
            similarity.pq_train(emb, m=7)
        # books sized for a different dim than the corpus
        short = [b[:1] for b in PQ_BOOKS]  # same m/dsub, fine
        bad_books = [[c[:-1] for c in b] for b in PQ_BOOKS]  # dsub-1
        with pytest.raises(ValueError, match="do not cover"):
            similarity.pq_encode(emb, bad_books).collect()
        with pytest.raises(ValueError, match="do not cover"):
            similarity.pq_encode_np(emb, bad_books).collect()
        assert similarity.pq_encode(emb, short).count() > 0

    def test_pq_encode_np_bit_identical(self, spark, emb):
        """The Arrow/numpy encoder reproduces the Catalyst expression
        encoder code-for-code (same float accumulation order)."""
        from astro_spark.functions.constants import PQ_BOOKS

        expr = {r.vec_id: list(r.pq_codes)
                for r in similarity.pq_encode(emb, PQ_BOOKS).collect()}
        np_ = {r.vec_id: list(r.pq_codes)
               for r in similarity.pq_encode_np(emb, PQ_BOOKS).collect()}
        assert expr == np_

    def test_pq_topk_trained_recall(self, spark, emb):
        """Trained-book PQ shortlist+re-rank recovers most of the exact
        top-5 even on near-random embeddings."""
        q = emb.where("vec_id < 5")
        exact = {
            (r.query_id, r.neighbor_id)
            for r in similarity.brute_force_topk(emb, q, k=5).collect()
        }
        books = similarity.pq_train(emb, m=8, n_codes=16, iterations=2)
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.pq_topk(emb, q, books=books, k=5, shortlist=100).collect()
        }
        assert len(got & exact) / len(exact) >= 0.5

    def test_precomputed_codes_kwarg_is_equivalent(self, spark, emb):
        """pq_topk/ivf_pq_topk with a caller-supplied ``codes`` frame
        return exactly the per-call-encode result — the share-the-
        encode-pass lever for callers grading several PQ variants
        (VERDICT r8 #3)."""
        from astro_spark.functions.constants import PQ_BOOKS

        q = emb.where("vec_id < 5")
        codes = similarity.pq_encode_np(emb, PQ_BOOKS)
        for fn, kw in [
            (similarity.pq_topk, dict(shortlist=10)),
            (similarity.ivf_pq_topk, dict(shortlist=10, nprobe=2)),
        ]:
            base = {
                tuple(r)
                for r in fn(
                    emb, q, books=PQ_BOOKS, k=5, np_encode=True, **kw
                ).collect()
            }
            shared = {
                tuple(r)
                for r in fn(
                    emb, q, books=PQ_BOOKS, k=5, codes=codes, **kw
                ).collect()
            }
            assert shared == base

    def test_np_adc_shortlist_matches_expression_path(self, spark, emb):
        """The Arrow LUT ADC scorer (np_adc=True: map-side per-batch
        top-k, no corpus-wide window) returns EXACTLY the expression
        path's rows — _adc_luts replays the fold order bit-for-bit, and
        the global top-N is inside the union of per-batch top-Ns."""
        from astro_spark.functions.constants import PQ_BOOKS

        q = emb.where("vec_id < 5")
        for fn, kw in [
            (similarity.pq_topk, dict(shortlist=10)),
            (similarity.ivf_pq_topk, dict(shortlist=10, nprobe=2)),
        ]:
            base = sorted(
                tuple(r)
                for r in fn(
                    emb, q, books=PQ_BOOKS, k=5, np_encode=True, **kw
                ).collect()
            )
            np_ = sorted(
                tuple(r)
                for r in fn(
                    emb, q, books=PQ_BOOKS, k=5, np_encode=True,
                    np_adc=True, **kw
                ).collect()
            )
            assert np_ == base

    def test_ivf_pq_full_probe_full_shortlist_equals_brute(self, spark, emb):
        """With nprobe = n_cells and an unbounded shortlist, IVF-PQ's
        exact re-rank sees every candidate exactly once → the result
        EQUALS brute force (cell pruning and ADC only ever shrink the
        candidate set, never re-score survivors)."""
        from astro_spark.functions.constants import PQ_BOOKS

        q = emb.where("vec_id < 5")
        n_cells = emb.select("label").distinct().count()
        exact = {
            (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
            for r in similarity.brute_force_topk(emb, q, k=5).collect()
        }
        got = {
            (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
            for r in similarity.ivf_pq_topk(
                emb, q, books=PQ_BOOKS, k=5, nprobe=n_cells, shortlist=10**9
            ).collect()
        }
        assert got == exact
        # partial probe: still k rows per query, subset quality graded
        # by the recall-report pattern
        part = similarity.ivf_pq_topk(emb, q, books=PQ_BOOKS, k=5, nprobe=1)
        counts = {r.query_id: r.n for r in part.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        assert all(v == 5 for v in counts.values())

    def test_ivf_pq_composes_with_trained_cells(self, spark, emb):
        """The IVF-PQ composite works with the TRAINED coarse quantizer
        (ivf_train + ivf_assign cells), not just pre-assigned labels —
        and full probe + full shortlist still equals brute force."""
        from astro_spark.functions.constants import PQ_BOOKS

        cents = similarity.ivf_train(emb, n_cells=8, iterations=2)
        assigned = similarity.ivf_assign(emb, cents).persist()
        q = assigned.where("vec_id < 3")
        got = {
            (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
            for r in similarity.ivf_pq_topk(
                assigned, q, books=PQ_BOOKS, k=5, nprobe=8,
                shortlist=10**9, partition_col="cell",
            ).collect()
        }
        exact = {
            (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
            for r in similarity.brute_force_topk(emb, emb.where("vec_id < 3"),
                                                 k=5).collect()
        }
        assert got == exact
        assigned.unpersist()

    def test_cosine_dup_pairs_exact_superset_of_lsh(self, emb):
        # exact all-pairs must contain every LSH pair (same threshold);
        # same-bucket is a candidate filter, never a score changer
        exact = {
            (r.id_a, r.id_b) for r in dedup.cosine_dup_pairs(emb).collect()
        }
        lsh = {
            (r.id_a, r.id_b) for r in similarity.lsh_cosine_pairs(emb).collect()
        }
        assert lsh <= exact and len(exact) > 0

    def test_cosine_self_is_one(self, emb):
        row = emb.limit(1).select(
            F.round(
                similarity.cosine(
                    similarity.as_double(F.col("embedding")),
                    similarity.as_double(F.col("embedding")),
                ),
                6,
            ).alias("c")
        ).collect()[0]
        assert row.c == 1.0

    def test_topk_shape(self, emb):
        out = similarity.brute_force_topk(emb, emb.where("vec_id < 3"), k=4)
        rows = out.collect()
        assert len(rows) == 12
        assert all(1 <= r.rank <= 4 and r.query_id != r.neighbor_id for r in rows)

    def test_label_centroids_shape_and_mean(self, spark):
        df = spark.createDataFrame(
            [(0, [1.0, 3.0]), (0, [3.0, 5.0]), (1, [10.0, 10.0])],
            "label int, embedding array<double>",
        )
        out = {(r.label, r.dim_idx): r.centroid
               for r in similarity.label_centroids(df).collect()}
        assert out[(0, 0)] == 2.0 and out[(0, 1)] == 4.0
        assert out[(1, 0)] == 10.0

    def test_np_topk_matches_exact(self, emb):
        qpdf = emb.where("vec_id < 5").toPandas()
        exact = {
            (r.query_id, r.neighbor_id)
            for r in similarity.brute_force_topk(emb, emb.where("vec_id < 5")).collect()
        }
        fast = {
            (r.query_id, r.neighbor_id)
            for r in similarity.brute_force_topk_np(emb, qpdf).collect()
        }
        # numpy pairwise summation can flip 4dp boundary ties — allow 1
        assert len(exact & fast) >= len(exact) - 1

    def test_lsh_buckets_cover_all(self, emb):
        buckets = similarity.lsh_bucket_table(emb)
        assert buckets.count() == emb.count()
        assert buckets.agg(F.count_distinct("bucket")).collect()[0][0] > 1

    def test_broadcast_in_topk_plan(self, emb):
        """Scale assertion: the query side must broadcast (no corpus shuffle)."""
        plan = similarity.brute_force_topk(emb, emb.where("vec_id < 3"))._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan

    def test_ivf_assign_covers_all_cells_used(self, emb):
        cents = similarity.ivf_train(emb, n_cells=8, iterations=2)
        assigned = similarity.ivf_assign(emb, cents)
        assert assigned.count() == emb.count()
        cells = {r.cell for r in assigned.select("cell").distinct().collect()}
        assert cells <= set(range(8)) and len(cells) > 1

    def test_ivf_topk_recall_vs_exact(self, emb):
        """Probing 2/8 cells must recover most true neighbors; probing
        all cells recovers exact search."""
        queries = emb.where("vec_id < 10")
        exact = {
            (r.query_id, r.neighbor_id)
            for r in similarity.brute_force_topk(emb, queries, k=5).collect()
        }
        cents = similarity.ivf_train(emb, n_cells=8, iterations=3)
        approx = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivf_topk(
                emb, queries, nprobe=2, k=5, centroids=cents
            ).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.6, f"recall {recall:.2f}"
        full = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivf_topk(
                emb, queries, nprobe=8, k=5, centroids=cents
            ).collect()
        }
        assert full == exact


class TestKnnGraph:
    def test_full_probe_equals_brute_force_self_knn(self, emb):
        """nprobe = n_cells makes the cell-pruned self-join graph exact:
        row-for-row equal to brute-force top-k with the corpus as its
        own query set, independent of k-means training noise."""
        cents = similarity.ivf_train(emb, n_cells=8, iterations=2)
        graph = {
            (r.src_id, r.neighbor_id, r.cos_sim, r.rank)
            for r in similarity.knn_graph(
                emb, k=3, nprobe=8, centroids=cents
            ).collect()
        }
        brute = {
            (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
            for r in similarity.brute_force_topk(emb, emb, k=3).collect()
        }
        assert graph == brute

    def test_selective_probe_recall(self, emb):
        """nprobe=3 of 8 cells keeps most true neighbors while scoring
        only ~3/8 of the candidate pairs.  (The graph case is harder
        than the query-set case — EVERY vector is a query, including
        the cell-boundary ones, so recall at a given nprobe sits below
        ivf_topk's on the same corpus: 2/8 probes measured ~0.51 here.)"""
        cents = similarity.ivf_train(emb, n_cells=8, iterations=3)
        exact = {
            (r.src_id, r.neighbor_id)
            for r in similarity.knn_graph(emb, k=3, nprobe=8, centroids=cents).collect()
        }
        approx = {
            (r.src_id, r.neighbor_id)
            for r in similarity.knn_graph(emb, k=3, nprobe=3, centroids=cents).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.6, f"recall {recall:.2f}"

    def test_np_scorer_is_bit_identical_to_fold(self, emb):
        """The per-cell numpy scorer (dimension-ascending accumulation,
        Spark-side rounding) reproduces the expression fold's doubles
        BIT-FOR-BIT — full rows equal, selective and full probe."""
        from astro_spark.functions.constants import SEMDEDUP_CENTROIDS

        for nprobe in (2, 8):
            fold = set(
                map(
                    tuple,
                    similarity.knn_graph(
                        emb, k=3, nprobe=nprobe, centroids=SEMDEDUP_CENTROIDS
                    ).collect(),
                )
            )
            np_ = set(
                map(
                    tuple,
                    similarity.knn_graph(
                        emb,
                        k=3,
                        nprobe=nprobe,
                        centroids=SEMDEDUP_CENTROIDS,
                        np_score=True,
                    ).collect(),
                )
            )
            assert fold == np_, nprobe

    def test_auto_cell_sizing(self, emb):
        """n_cells='auto' resolves to ceil(n/target) and flows through
        ivf_train/knn_graph — the cells-∝-n contract self-executes."""
        from astro_spark.functions.similarity import resolve_n_cells

        n = emb.count()
        assert resolve_n_cells(emb, "auto", 50) == -(-n // 50)
        assert resolve_n_cells(emb, "auto", 10 ** 9) == 1
        assert resolve_n_cells(emb, 8, 50) == 8
        target = max(1, n // 6)
        cents = similarity.ivf_train(
            emb, n_cells="auto", iterations=1, target_cell_size=target
        )
        assert len(cents) == -(-n // target)
        out = similarity.knn_graph(
            emb, k=3, n_cells="auto", nprobe=len(cents), centroids=cents
        )
        # full probe over the auto-trained cells is still a valid graph
        per_src = out.groupBy("src_id").count().agg(F.max("count")).collect()[0][0]
        assert per_src == 3

    def test_plan_has_no_replicated_side(self, emb):
        """The probe side must reach the cell join as a plain equi-join
        input (shuffle or small-table broadcast chosen by AQE) — never a
        nested-loop replication of the corpus against itself."""
        cents = similarity.ivf_train(emb, n_cells=4, iterations=1)
        plan = (
            similarity.knn_graph(emb, k=3, nprobe=2, centroids=cents)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestChunking:
    def test_chunks_cover_all_tokens_with_overlap(self, spark):
        words = " ".join(f"w{i}" for i in range(10))
        df = spark.createDataFrame([(1, words)], ["doc_id", "text"])
        out = sorted(
            text.chunk_documents(df, chunk_tokens=4, overlap=1).collect(),
            key=lambda r: r.chunk_idx,
        )
        # stride 3 over 10 tokens → chunks at 0,3,6 → 3 chunks
        assert [r.chunk_idx for r in out] == [0, 1, 2]
        assert out[0].chunk_text == "w0 w1 w2 w3"
        assert out[1].chunk_text == "w3 w4 w5 w6"
        assert out[2].chunk_text == "w6 w7 w8 w9"
        assert all(r.n_tokens == 4 for r in out)

    def test_short_doc_single_chunk(self, spark):
        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        out = text.chunk_documents(df, chunk_tokens=8, overlap=2).collect()
        assert len(out) == 1 and out[0].chunk_text == "a b" and out[0].n_tokens == 2


class TestPrivacy:
    def test_pseudonymize_stable_and_salted(self, spark):
        from astro_spark.functions import privacy

        df = spark.createDataFrame([(7,), (7,), (8,)], ["uid"])
        a1 = [r.p for r in df.select(privacy.pseudonymize("uid", "s1").alias("p")).collect()]
        a2 = [r.p for r in df.select(privacy.pseudonymize("uid", "s2").alias("p")).collect()]
        assert a1[0] == a1[1] != a1[2]     # stable within salt
        assert a1[0] != a2[0]              # unlinkable across salts
        assert len(a1[0]) == 64            # sha-256 hex

    def test_redact_emails(self, spark):
        from astro_spark.functions import privacy

        df = spark.createDataFrame([("mail me at jo.doe+x@example.org now",)], ["t"])
        out = df.select(privacy.redact("t").alias("r")).collect()[0].r
        assert out == "mail me at [REDACTED] now"


class TestMultimodal:
    def test_read_binary_files_parses_ids_and_prunes_glob(self, spark, tmp_path):
        """binaryFile-source ingest: ids parsed from filenames, payload
        bytes intact, and pathGlobFilter excludes non-matching files."""
        (tmp_path / "doc_7.bin").write_bytes(b"hello")
        (tmp_path / "doc_9.bin").write_bytes(b"world!!")
        (tmp_path / "ignore.txt").write_bytes(b"nope")
        out = multimodal.read_binary_files(spark, str(tmp_path), glob="*.bin")
        rows = {r.doc_id: (r.media_type, bytes(r.payload)) for r in out.collect()}
        assert rows == {
            7: ("application/bin", b"hello"),
            9: ("application/bin", b"world!!"),
        }

    def test_feature_extraction_schema_and_values(self, docs):
        out = multimodal.extract_features(multimodal.attach_binary_payload(docs))
        assert out.columns == ["doc_id", "media_type", "n_bytes", "content_hash"]
        joined = out.join(docs, "doc_id").where(F.col("n_bytes") != F.col("n_chars"))
        assert joined.count() == 0  # ascii corpus: bytes == chars

    def test_sample_frames_fanout(self, docs):
        media = multimodal.attach_binary_payload(docs.limit(10))
        frames = multimodal.sample_frames(media, n_frames=4)
        rows = frames.collect()
        assert len(rows) == 40
        # frames reassemble to the original payload (contiguous split)
        by_doc = {}
        for r in sorted(rows, key=lambda r: (r.doc_id, r.frame_idx)):
            by_doc.setdefault(r.doc_id, b"")
            by_doc[r.doc_id] += bytes(r.frame)
        originals = {r.doc_id: bytes(r.payload) for r in media.collect()}
        assert by_doc == originals

    def test_resize_fixed_size_output(self, docs):
        media = multimodal.attach_binary_payload(docs.limit(5))
        out = multimodal.resize_media(media, width=4, height=4).collect()
        assert all(len(bytes(r.payload)) == 16 for r in out)
        assert all(r.width == 4 and r.height == 4 for r in out)
        # deterministic: same input → same bytes
        again = multimodal.resize_media(media, width=4, height=4).collect()
        assert {(r.doc_id, bytes(r.payload)) for r in out} == {
            (r.doc_id, bytes(r.payload)) for r in again
        }

    def test_image_ahash_twin_close_unrelated_far(self, spark):
        """Perceptual aHash: a re-encode with 6 perturbed bytes keeps
        hamming ≤ 4 (near-dup twin), an unrelated image lands far; PNG
        and BMP encodings of the SAME pixels hash identically (codec-
        independent signature)."""
        from astro_spark.functions import media_codecs as mc
        from astro_spark.functions.dedup import hash_hamming_pairs
        from astro_spark.functions.multimodal import image_ahash

        w, h = 8, 8
        base = bytes(((7 * 1009 + i) ** 2) % 1000003 % 256 for i in range(w * h * 3))
        twin = bytearray(base)
        for i in range(3):  # one gray pixel shifts by ~13
            twin[i] = (twin[i] + 40) % 256
        other = bytes(((9 * 1009 + i) ** 2) % 1000003 % 256 for i in range(w * h * 3))
        rows = [
            (1, "image/png", mc.encode_png(base, w, h, 3)),
            (2, "image/bmp", mc.encode_bmp(base, w, h)),  # same pixels
            (3, "image/png", mc.encode_png(bytes(twin), w, h, 3)),
            (4, "image/png", mc.encode_png(other, w, h, 3)),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, media_type string, payload binary"
        )
        sigs = {r.id: r.ahash for r in image_ahash(df).collect()}
        assert sigs[1] == sigs[2]  # codec-independent
        ham_twin = bin(sigs[1] ^ sigs[3]).count("1")
        ham_other = bin(sigs[1] ^ sigs[4]).count("1")
        assert ham_twin <= 4 < ham_other
        pairs = {
            (r.id_a, r.id_b)
            for r in hash_hamming_pairs(
                image_ahash(df), id_col="id", hash_col="ahash", max_hamming=4
            ).collect()
        }
        assert (1, 2) in pairs and (1, 3) in pairs and (1, 4) not in pairs

    def test_audio_fingerprint_twin_close_gain_invariant(self, spark):
        """Energy-envelope fingerprint: a head-edited twin stays within
        hamming 4; an integer gain (×2) leaves the signature IDENTICAL
        (all windows scale together); an unrelated clip lands far."""
        import array

        from astro_spark.functions import media_codecs as mc
        from astro_spark.functions.multimodal import audio_fingerprint

        def clip(seed, n=160):
            return [
                ((seed * 1013 + i) ** 2) % 1000003 % 65536 - 32768
                for i in range(n)
            ]

        base = clip(7)
        twin = list(base)
        for i in range(20):
            twin[i] = (twin[i] + 32768 + 500) % 65536 - 32768
        gain = [max(-32768, min(32767, s * 2 // 3)) for s in base]  # 2/3 gain
        other = clip(9)
        rows = [
            (1, "audio/wav", mc.encode_wav(array.array("h", base).tobytes())),
            (2, "audio/wav", mc.encode_wav(array.array("h", twin).tobytes())),
            (3, "audio/wav", mc.encode_wav(array.array("h", gain).tobytes())),
            (4, "audio/wav", mc.encode_wav(array.array("h", other).tobytes())),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, media_type string, payload binary"
        )
        sigs = {r.id: r.afp for r in audio_fingerprint(df).collect()}
        assert bin(sigs[1] ^ sigs[2]).count("1") <= 4
        assert bin(sigs[1] ^ sigs[3]).count("1") <= 4  # gain-robust
        assert bin(sigs[1] ^ sigs[4]).count("1") > 10

    def test_hash_hamming_pairs_pigeonhole_guard(self, spark):
        import pytest as _pytest

        from astro_spark.functions.dedup import hash_hamming_pairs

        df = spark.createDataFrame([(1, 3)], "id long, sh long")
        with _pytest.raises(ValueError, match="pigeonhole"):
            hash_hamming_pairs(df, max_hamming=5, n_chunks=5)

    def test_hash_hamming_guards_match_between_batch_and_incremental(
        self, spark
    ):
        """The incremental screen enforces the SAME 62-bit ceiling as
        its batch sibling (ADVICE r9): a 63-bit signature must raise in
        both paths, not silently band wrong in one of them."""
        import pytest as _pytest

        from astro_spark.functions.dedup import (
            hash_hamming_incremental_pairs,
            hash_hamming_pairs,
        )

        df = spark.createDataFrame([(1, 3)], "id long, sh long")
        with _pytest.raises(ValueError, match="62"):
            hash_hamming_pairs(df, bits=63)
        with _pytest.raises(ValueError, match="62"):
            hash_hamming_incremental_pairs(df, df, bits=63)

    def test_audio_fingerprint_empty_pcm_raises_clearly(self, spark):
        """A valid-but-empty WAV (zero samples) raises a clear
        ValueError instead of crashing the Arrow task with an opaque
        ZeroDivisionError (ADVICE r9)."""
        from astro_spark.functions import media_codecs as mc
        from astro_spark.functions.multimodal import audio_fingerprint

        df = spark.createDataFrame(
            [(1, "audio/wav", mc.encode_wav(b""))],
            "doc_id long, media_type string, payload binary",
        )
        with pytest.raises(Exception, match="empty PCM"):
            audio_fingerprint(df).collect()

    def test_decode_unknown_type_raises(self):
        # video genuinely needs ffmpeg — still gated
        with pytest.raises(NotImplementedError):
            multimodal.decode_media(b"\x00\x00\x00\x18ftypmp42", "video/mp4")

    def test_decode_malformed_png_raises(self):
        with pytest.raises(ValueError, match="PNG"):
            multimodal.decode_media(b"x", "image/png")


class TestMediaCodecs:
    """From-scratch stdlib PNG/BMP/WAV codecs (de-stubbed decode_media)."""

    def _pix(self, n, seed=7):
        return bytes((seed * 31 + i * 13) % 256 for i in range(n))

    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_png_roundtrip_all_color_types(self, channels):
        from astro_spark.functions import media_codecs as mc

        # height 11 > 5 so the encoder's row%5 filter cycle exercises
        # EVERY unfilter path (None/Sub/Up/Average/Paeth) at least twice
        w, h = 9, 11
        pixels = self._pix(w * h * channels, seed=channels)
        png = mc.encode_png(pixels, w, h, channels)
        d = mc.decode_png(png)
        assert (d["width"], d["height"], d["channels"]) == (w, h, channels)
        assert d["pixels"] == pixels

    def test_png_palette_decode(self):
        """Color type 3 (palette) expands through PLTE to RGB."""
        import struct
        import zlib

        from astro_spark.functions import media_codecs as mc

        w, h = 4, 3
        palette = bytes(range(48))  # 16 RGB entries
        idx = bytes([(x + y) % 16 for y in range(h) for x in range(w)])
        raw = b"".join(b"\x00" + idx[y * w : (y + 1) * w] for y in range(h))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + mc._png_chunk(b"IHDR", ihdr)
            + mc._png_chunk(b"PLTE", palette)
            + mc._png_chunk(b"IDAT", zlib.compress(raw))
            + mc._png_chunk(b"IEND", b"")
        )
        d = mc.decode_png(png)
        assert d["channels"] == 3 and d["width"] == w
        expect = b"".join(
            palette[i * 3 : i * 3 + 3] for i in idx
        )
        assert d["pixels"] == expect

    def test_bmp_roundtrip_with_row_padding(self):
        from astro_spark.functions import media_codecs as mc

        # width 3 → 9-byte rows padded to 12: exercises the pad path
        w, h = 3, 5
        pixels = self._pix(w * h * 3, seed=3)
        bmp = mc.encode_bmp(pixels, w, h)
        d = mc.decode_bmp(bmp)
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        assert d["pixels"] == pixels

    def test_wav_roundtrip(self):
        import array

        from astro_spark.functions import media_codecs as mc

        samples = array.array(
            "h", [((i * 257) % 65536) - 32768 for i in range(50)]
        )
        wav = mc.encode_wav(samples.tobytes(), sample_rate=8000)
        d = mc.decode_wav(wav)
        assert (d["channels"], d["sample_rate"], d["n_samples"]) == (1, 8000, 50)
        assert array.array("h", d["pcm"]) == samples

    def test_decode_media_dispatch(self):
        from astro_spark.functions import jpeg_codec as jc
        from astro_spark.functions import media_codecs as mc

        png = mc.encode_png(self._pix(12), 4, 3, 1)
        bmp = mc.encode_bmp(self._pix(36), 4, 3)
        wav = mc.encode_wav(b"\x00\x01" * 10)
        jpg = jc.encode_jpeg(self._pix(48), 4, 4, 3)
        assert multimodal.decode_media(png, "image/png")["kind"] == "image"
        assert multimodal.decode_media(bmp, "image/bmp")["channels"] == 3
        assert multimodal.decode_media(wav, "audio/wav")["n_samples"] == 10
        d = multimodal.decode_media(jpg, "image/jpeg")
        assert (d["width"], d["height"], d["channels"]) == (4, 4, 3)

    def test_decode_features_distributed(self, spark):
        """decode_features decodes REAL PNG and WAV payloads inside
        mapInPandas workers; sums/dims verified against the generators."""
        import array

        from astro_spark.functions import media_codecs as mc

        rows = []
        for doc_id in range(20):
            if doc_id % 2 == 0:
                w, h = doc_id % 7 + 1, doc_id % 5 + 1
                pix = bytes((doc_id * 31 + i) % 256 for i in range(w * h))
                rows.append((doc_id, "image/png", mc.encode_png(pix, w, h, 1)))
            else:
                n = doc_id % 50 + 10
                pcm = array.array(
                    "h", [((doc_id * 7 + i * 13) % 65536) - 32768 for i in range(n)]
                )
                rows.append((doc_id, "audio/wav", mc.encode_wav(pcm.tobytes())))
        df = spark.createDataFrame(
            rows, "doc_id long, media_type string, payload binary"
        ).repartition(4)
        got = {r.doc_id: r for r in multimodal.decode_features(df).collect()}
        assert len(got) == 20
        for doc_id in range(20):
            r = got[doc_id]
            if doc_id % 2 == 0:
                w, h = doc_id % 7 + 1, doc_id % 5 + 1
                assert (r.kind, r.width, r.height, r.channels) == ("image", w, h, 1)
                assert r.payload_sum == sum(
                    (doc_id * 31 + i) % 256 for i in range(w * h)
                )
            else:
                n = doc_id % 50 + 10
                assert (r.kind, r.sample_rate, r.n_samples) == ("audio", 16000, n)
                assert r.payload_sum == sum(
                    ((doc_id * 7 + i * 13) % 65536) - 32768 for i in range(n)
                )


class TestJpegCodec:
    """From-scratch baseline JPEG (ITU-T T.81) — the last image gate."""

    def _gradient(self, w, h, ch):
        return bytes(
            ((x * 5 + c * 11) if c != 1 else (y * 7)) % 256
            for y in range(h)
            for x in range(w)
            for c in range(ch)
        )

    def _mae(self, a: bytes, b: bytes) -> float:
        import numpy as np

        x = np.frombuffer(a, np.uint8).astype(int)
        y = np.frombuffer(b, np.uint8).astype(int)
        return float(np.abs(x - y).mean())

    def test_flat_block_roundtrips_exactly(self):
        """A uniform image is pure DC — the DCT/quant/Huffman chain must
        reproduce it bit-exactly at any quality (a strong transform-math
        check that needs no external decoder)."""
        from astro_spark.functions import jpeg_codec as jc

        for val, q in [(128, 50), (37, 85), (200, 95)]:
            pix = bytes([val]) * (16 * 16 * 3)
            d = jc.decode_jpeg(jc.encode_jpeg(pix, 16, 16, 3, quality=q))
            assert self._mae(pix, d["pixels"]) <= 1.0
            assert (d["width"], d["height"], d["channels"]) == (16, 16, 3)

    def test_rgb_444_roundtrip_close(self):
        from astro_spark.functions import jpeg_codec as jc

        # non-multiple-of-8 dims exercise edge padding + cropping
        w, h = 37, 23
        pix = self._gradient(w, h, 3)
        d = jc.decode_jpeg(jc.encode_jpeg(pix, w, h, 3, quality=90))
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        assert self._mae(pix, d["pixels"]) < 4.0

    def test_420_subsampling_roundtrip(self):
        """4:2:0 encoding exercises multi-block MCUs and the decoder's
        chroma upsampling."""
        from astro_spark.functions import jpeg_codec as jc

        w, h = 33, 18
        pix = self._gradient(w, h, 3)
        d = jc.decode_jpeg(jc.encode_jpeg(pix, w, h, 3, quality=90, subsample=True))
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        assert self._mae(pix, d["pixels"]) < 8.0

    def test_grayscale_and_restart_markers(self):
        from astro_spark.functions import jpeg_codec as jc

        w, h = 24, 17
        pix = bytes((x * 3 + y * 2) % 256 for y in range(h) for x in range(w))
        data = jc.encode_jpeg(pix, w, h, 1, quality=90, restart_interval=2)
        assert b"\xff\xdd" in data  # DRI present
        d = jc.decode_jpeg(data)
        assert (d["width"], d["height"], d["channels"]) == (w, h, 1)
        assert self._mae(pix, d["pixels"]) < 2.5

    def test_decode_is_deterministic(self):
        from astro_spark.functions import jpeg_codec as jc

        data = jc.encode_jpeg(self._gradient(19, 13, 3), 19, 13, 3)
        assert jc.decode_jpeg(data)["pixels"] == jc.decode_jpeg(data)["pixels"]

    def test_non_baseline_rejected(self):
        from astro_spark.functions import jpeg_codec as jc

        data = bytearray(jc.encode_jpeg(self._gradient(8, 8, 3), 8, 8, 3))
        i = bytes(data).find(b"\xff\xc0")
        data[i + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
        with pytest.raises(ValueError, match="non-baseline"):
            jc.decode_jpeg(bytes(data))

    def test_truncated_stream_raises(self):
        from astro_spark.functions import jpeg_codec as jc

        data = jc.encode_jpeg(self._gradient(16, 16, 3), 16, 16, 3)
        with pytest.raises(ValueError):
            jc.decode_jpeg(data[: len(data) // 2])


class TestPlanShape:
    """Scale-oriented plan assertions (.explain contract)."""

    def test_filter_pushdown_reaches_parquet(self, spark, sf_dir):
        df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
            "l_quantity > 45"
        ).select("l_orderkey")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan

    def test_column_pruning(self, spark, sf_dir):
        df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ReadSchema: struct<l_orderkey:bigint>" in plan

    def test_small_dim_join_broadcasts(self, spark, sf_dir):
        nation = read_table(spark, sf_dir, "nation")
        supplier = read_table(spark, sf_dir, "supplier")
        plan = (
            supplier.join(nation, supplier.s_nationkey == nation.n_nationkey)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan


class TestSemanticDedup:
    def test_pairs_subset_of_exact_allpairs(self, emb):
        """Within-cell pairs are exactly the exact all-pairs dups whose two
        sides land in the same cell — no pair invented, none misscored."""
        sem = {
            (r.id_a, r.id_b, r.cos_sim)
            for r in dedup.semantic_dup_pairs(emb).collect()
        }
        exact = {
            (r.id_a, r.id_b, r.cos_sim)
            for r in dedup.cosine_dup_pairs(emb).collect()
        }
        assert sem <= exact
        from astro_spark.functions.constants import SEMDEDUP_CENTROIDS

        cells = {
            r.vec_id: r.cell
            for r in similarity.ivf_assign(emb, SEMDEDUP_CENTROIDS)
            .select("vec_id", "cell")
            .collect()
        }
        same_cell_exact = {p for p in exact if cells[p[0]] == cells[p[1]]}
        assert sem == same_cell_exact

    def test_semantic_dedup_keep_first(self, emb):
        pairs = dedup.semantic_dup_pairs(emb).collect()
        dropped = {r.id_b for r in pairs}
        kept = {r.vec_id for r in dedup.semantic_dedup(emb).collect()}
        all_ids = {r.vec_id for r in emb.select("vec_id").collect()}
        assert kept == all_ids - dropped

    def test_trained_centroids_accepted(self, spark, emb):
        cents = similarity.ivf_train(emb, n_cells=4, iterations=2)
        out = dedup.semantic_dup_pairs(emb, centroids=cents)
        assert out.columns == ["cell", "id_a", "id_b", "cos_sim"]
        assert out.count() >= 0


class TestBloomDedup:
    def test_no_false_negatives(self, spark, docs):
        """Bloom guarantee: every exact duplicate is flagged maybe_dup."""
        corpus = docs.where("doc_id % 2 = 0")
        batch = docs.where("doc_id % 2 = 1")
        flags = dedup.bloom_membership(batch, dedup.bloom_build(corpus))
        exact_fps = {
            r.fp
            for r in corpus.select(
                dedup.fingerprint62(F.col("text")).alias("fp")
            ).collect()
        }
        batch_fps = {
            r.doc_id: r.fp
            for r in batch.select(
                "doc_id", dedup.fingerprint62(F.col("text")).alias("fp")
            ).collect()
        }
        for r in flags.collect():
            if batch_fps[r.doc_id] in exact_fps:
                assert r.maybe_dup, f"false negative on doc {r.doc_id}"

    def test_filter_state_bounded(self, docs):
        from astro_spark.functions.constants import BLOOM_M

        bloom = dedup.bloom_build(docs)
        n = bloom.count()
        assert 0 < n <= BLOOM_M
        assert bloom.columns == ["bit"]

    def test_bloom_dedup_subset_of_exact(self, docs):
        """Bloom dedup only ever drops MORE than exact dedup (false
        positives drop fresh docs, never the reverse)."""
        corpus = docs.where("doc_id % 2 = 0")
        batch = docs.where("doc_id % 2 = 1")
        bloom_kept = {
            r.doc_id for r in dedup.bloom_dedup(batch, corpus).collect()
        }
        exact_kept = {
            r.doc_id
            for r in batch.join(
                corpus.select("text").distinct(), on="text", how="left_anti"
            ).collect()
        }
        assert bloom_kept <= exact_kept


class TestDsir:
    def test_scores_favor_target_language(self, spark, docs):
        """Mean DSIR score of English docs (the target domain) must beat
        the mean of the rest — the whole point of importance weighting."""
        from astro_spark.functions.sampling import dsir_scores

        scores = dsir_scores(docs, docs.where("lang = 'en'"))
        joined = scores.join(docs.select("doc_id", "lang"), "doc_id")
        rows = joined.select(
            "lang", (F.col("dsir_score") / F.col("n_tokens")).alias("avg_w")
        ).collect()
        en = [r.avg_w for r in rows if r.lang == "en"]
        rest = [r.avg_w for r in rows if r.lang != "en"]
        assert sum(en) / len(en) > sum(rest) / len(rest)

    def test_every_raw_doc_scored_exactly_once(self, docs):
        from astro_spark.functions.sampling import dsir_scores

        scores = dsir_scores(docs, docs.where("lang = 'en'"))
        assert scores.count() == docs.count()
        assert scores.select("doc_id").distinct().count() == docs.count()

    def test_scores_are_bigint_exact(self, docs):
        from astro_spark.functions.sampling import dsir_scores

        schema = {f.name: f.dataType.simpleString() for f in dsir_scores(
            docs, docs.where("lang = 'en'")
        ).schema.fields}
        assert schema["dsir_score"] == "bigint"
        assert schema["n_tokens"] == "bigint"
        assert schema["keep"] == "boolean"

    def test_semantic_np_twin_pair_set_equal(self, emb):
        fold = {
            (r.cell, r.id_a, r.id_b)
            for r in dedup.semantic_dup_pairs(emb).collect()
        }
        np_ = {
            (r.cell, r.id_a, r.id_b)
            for r in dedup.semantic_dup_pairs_np(emb).collect()
        }
        assert fold == np_

    def test_semantic_hot_cell_cap_routes_blocked(self, spark, emb):
        """Round-14 (VERDICT r13 #6): an oversized cell must be routed
        through the blocked-matmul path (per-task memory bounded by the
        cap) while producing the SAME pair set as the uncapped
        expression self-join — the SemDeDup mirror of the LSH
        hot-bucket cap."""
        baseline = {
            (r.cell, r.id_a, r.id_b)
            for r in dedup.semantic_dup_pairs(
                emb, max_cell_rows=None
            ).collect()
        }
        capped_df = dedup.semantic_dup_pairs(emb, max_cell_rows=5)
        capped = {
            (r.cell, r.id_a, r.id_b) for r in capped_df.collect()
        }
        assert capped == baseline
        # the blocked path is IN the executed plan
        plan = capped_df._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapGroupsInPandas" in plan
        # a cap larger than every cell leaves the pure-join plan alone
        loose_df = dedup.semantic_dup_pairs(emb, max_cell_rows=10**9)
        loose_plan = (
            loose_df._jdf.queryExecution().executedPlan().toString()
        )
        assert "FlatMapGroupsInPandas" not in loose_plan


class TestBigramLm:
    def test_fluent_text_outscores_scrambled(self, spark):
        """Docs whose transitions the corpus has seen often score above a
        scrambled doc over the same vocabulary — the perplexity-filter
        signal."""
        rows = [(i, "alpha beta gamma delta") for i in range(20)]
        rows.append((100, "delta alpha gamma beta"))
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r.doc_id: r.lm_avg for r in text.bigram_lm_scores(df).collect()}
        assert got[0] > got[100]
        assert all(got[i] == got[0] for i in range(20))

    def test_every_doc_scored_including_short(self, spark):
        df = spark.createDataFrame(
            [(1, "one two three"), (2, "single"), (3, "")], ["doc_id", "text"]
        )
        got = {r.doc_id: (r.n_bigrams, r.lm_avg) for r in text.bigram_lm_scores(df).collect()}
        assert set(got) == {1, 2, 3}
        assert got[1][0] == 2 and got[2] == (0, 0) and got[3][0] <= 1

    def test_external_corpus_training(self, spark, docs):
        """Scoring a frame against a DIFFERENT training corpus uses that
        corpus's transition counts."""
        target = docs.where("doc_id < 10")
        out = text.bigram_lm_scores(target, corpus=docs)
        assert out.count() == target.count()


class TestNewOpPlanShapes:
    """Executed-plan pins: the scale-critical join strategies of the
    round-4 operators, asserted not assumed."""

    def test_bigram_lm_count_joins_broadcast(self, docs):
        plan = (
            text.bigram_lm_scores(docs)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan  # bounded count tables ride broadcast

    def test_bloom_membership_probe_is_broadcast(self, docs):
        corpus = docs.where("doc_id % 2 = 0")
        batch = docs.where("doc_id % 2 = 1")
        out = dedup.bloom_membership(batch, dedup.bloom_build(corpus))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # the <=m-row filter relation
        assert "BroadcastNestedLoopJoin" not in plan

    def test_semantic_pairs_no_nested_loop(self, emb):
        plan = (
            dedup.semantic_dup_pairs(emb)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the cell equi-join must never degrade to a nested-loop product
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_dsir_weight_join_broadcast(self, docs):
        from astro_spark.functions.sampling import dsir_scores

        plan = (
            dsir_scores(docs, docs.where("lang = 'en'"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan


class TestIvfIndexPersistence:
    def test_indexed_probe_equals_in_memory_and_prunes_partitions(
        self, spark, emb, tmp_path
    ):
        """Persisted-index probes return exactly the in-memory ivf_topk
        result AND the scan carries a partition filter on cell — the
        file-level pruning that makes IVF pay at scale."""
        cents = similarity.ivf_train(emb, n_cells=4, iterations=2)
        path = str(tmp_path / "ivf_index")
        similarity.ivf_write_index(emb, cents, path)

        queries = emb.where("vec_id < 5")
        indexed = similarity.ivf_topk_indexed(spark, path, queries, nprobe=2, k=3)
        in_mem = similarity.ivf_topk(emb, queries, nprobe=2, k=3, centroids=cents)
        assert sorted(map(tuple, indexed.collect())) == sorted(
            map(tuple, in_mem.collect())
        )

        plan = indexed._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "dynamicpruning" in plan, plan[:2000]

    def test_centroids_roundtrip(self, spark, emb, tmp_path):
        cents = similarity.ivf_train(emb, n_cells=3, iterations=1)
        path = str(tmp_path / "ivf_index2")
        similarity.ivf_write_index(emb, cents, path)
        assert similarity.ivf_read_centroids(spark, path) == cents

    def test_append_leaves_existing_files_untouched_and_equals_rebuild(
        self, spark, emb, tmp_path
    ):
        """Incremental ivf_append_index: the base index's data files keep
        their paths (append, not rewrite), and probing the appended
        index equals probing an index built from the full corpus in one
        shot (same stored centroids → same assignment)."""
        import os as _os

        cents = similarity.ivf_train(emb, n_cells=4, iterations=1)
        grown = str(tmp_path / "ivf_grow")
        similarity.ivf_write_index(emb.where("vec_id % 2 = 0"), cents, grown)

        def _files(p):
            out = []
            for root, _d, fs in _os.walk(p):
                if "_centroids" in root:
                    continue
                out += [
                    _os.path.join(root, f) for f in fs if f.endswith(".parquet")
                ]
            return sorted(out)

        before = _files(grown)
        similarity.ivf_append_index(emb.where("vec_id % 2 = 1"), grown)
        after = _files(grown)
        assert set(before) <= set(after) and len(after) > len(before)

        full = str(tmp_path / "ivf_full")
        similarity.ivf_write_index(emb, cents, full)
        q = emb.where("vec_id < 5")
        a = sorted(map(tuple, similarity.ivf_topk_indexed(spark, grown, q, nprobe=2, k=3).collect()))
        b = sorted(map(tuple, similarity.ivf_topk_indexed(spark, full, q, nprobe=2, k=3).collect()))
        assert a == b


class TestMinhashIncremental:
    def test_equals_cross_subset_of_full_pairs(self, docs):
        """Batch-vs-corpus incremental pairs are exactly the odd-even
        cross slice of the full self-join pairs (same bands, same
        verification)."""
        full = dedup.minhash_lsh_pairs(docs).collect()
        cross = set()
        for r in full:
            if r.id_a % 2 != r.id_b % 2:
                odd = r.id_a if r.id_a % 2 == 1 else r.id_b
                even = r.id_b if odd == r.id_a else r.id_a
                cross.add((odd, even, r.jaccard))
        incr = {
            (r.batch_id, r.corpus_id, r.jaccard)
            for r in dedup.minhash_incremental_pairs(
                docs.where("doc_id % 2 = 1"), docs.where("doc_id % 2 = 0")
            ).collect()
        }
        assert incr == cross


class TestSampleExactN:
    def test_exact_size_stable_and_ranked(self, docs):
        from astro_spark.functions.sampling import sample_exact_n

        a = sample_exact_n(docs.select("doc_id", "lang"), 17)
        b = sample_exact_n(docs.select("doc_id", "lang").repartition(9), 17)
        ra = sorted((r.doc_id, r.sample_rank) for r in a.collect())
        rb = sorted((r.doc_id, r.sample_rank) for r in b.collect())
        assert ra == rb and len(ra) == 17
        assert sorted(r[1] for r in ra) == list(range(1, 18))

    def test_take_ordered_plan(self, docs):
        from astro_spark.functions.sampling import sample_exact_n

        picked = docs.select("doc_id").withColumn(
            "__k", text.char_poly_hash(F.col("doc_id").cast("string"))
        ).orderBy("__k", "doc_id").limit(10)
        plan = picked._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan  # no global sort


class TestSampleExactNBy:
    def test_per_group_sizes_and_consistency(self, spark, docs):
        """Each group yields min(n, group size) rows, and a group's
        sample IS sample_exact_n run on that group alone (same hash
        order ⇒ same rows and ranks)."""
        from astro_spark.functions.sampling import (
            sample_exact_n,
            sample_exact_n_by,
        )

        d = docs.select("doc_id", "lang")
        by = sample_exact_n_by(d, "lang", 7).collect()
        sizes = {}
        for r in by:
            sizes[r.lang] = sizes.get(r.lang, 0) + 1
        group_counts = {r.lang: r.n for r in d.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        assert sizes == {g: min(7, n) for g, n in group_counts.items()}
        lang0 = by[0].lang
        want = {
            (r.doc_id, r.sample_rank)
            for r in sample_exact_n(d.where(F.col("lang") == lang0), 7).collect()
        }
        got = {(r.doc_id, r.sample_rank) for r in by if r.lang == lang0}
        assert got == want


class TestDistributionDrift:
    def test_identical_snapshots_have_zero_drift(self, spark):
        from astro_spark.functions.sampling import distribution_drift

        df = spark.createDataFrame(
            [(i, i % 4) for i in range(40)], ["id", "b"]
        )
        rows = distribution_drift(df, df, "b").collect()
        assert len(rows) == 4
        assert all(r.contrib == 0 for r in rows)
        assert all(r.p_ref_e6 == r.p_cand_e6 == 250000 for r in rows)

    def test_moved_mass_localizes_to_its_bins(self, spark):
        """Shift 50% of the mass from bin 0 to bin 1: exact integer
        contributions land on exactly those two bins."""
        from astro_spark.functions.sampling import distribution_drift

        ref = spark.createDataFrame(
            [(i, 0) for i in range(10)] + [(i, 2) for i in range(10)],
            ["id", "b"],
        )
        cand = spark.createDataFrame(
            [(i, 1) for i in range(10)] + [(i, 2) for i in range(10)],
            ["id", "b"],
        )
        got = {r.bin: r for r in distribution_drift(ref, cand, "b").collect()}
        # bin 0: p_ref .5 -> p_cand 0 : (0-500000)^2 / 500000 = 500000
        assert got[0].contrib == 500000
        # bin 1: p_ref 0 -> p_cand .5 : (500000-0)^2 / max(0,1) huge
        assert got[1].contrib == 500000 * 500000
        assert got[2].contrib == 0


class TestCrossSourceMatrix:
    def test_matrix_counts_cross_source_pairs(self, spark):
        """Two sources sharing a near-identical doc produce one
        cross-source cell; in-source dup pairs land on the diagonal."""
        base = "the quick brown fox jumps over the lazy dog " * 6
        df = spark.createDataFrame(
            [
                (1, base, "feedA"),
                (2, base + "extra", "feedB"),   # near-dup of 1, crosses sources
                (3, base + "extra", "feedB"),   # exact dup of 2, in-source
                (4, "completely different words entirely here now", "feedA"),
            ],
            ["doc_id", "text", "source"],
        )
        from astro_spark.functions.dedup import cross_source_matrix

        got = {
            (r.source_a, r.source_b): r for r in cross_source_matrix(df).collect()
        }
        assert got[("feedA", "feedB")].n_pairs == 2  # 1-2 and 1-3
        assert got[("feedB", "feedB")].n_pairs == 1  # 2-3
        assert got[("feedB", "feedB")].avg_jaccard == 1.0
        assert ("feedA", "feedA") not in got


class TestPagerank:
    def test_path_graph_one_iteration_exact_values(self, spark):
        """Hand-computed fixed-point arithmetic on the path 1-2-3:
        share = 1e12//3, push = rank DIV deg, base = 15%·share DIV 100."""
        from astro_spark.functions.graph import pagerank

        pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
        got = {r.node: r.rank for r in pagerank(pairs, iterations=1).collect()}
        assert got == {1: 191666666665, 2: 616666666665, 3: 191666666665}

    def test_star_center_dominates_and_partitioning_is_irrelevant(self, spark):
        """The hub of a star out-ranks every leaf, and a different input
        partitioning yields bit-identical ranks (integer sums are
        order-independent — the property float PageRank lacks)."""
        from astro_spark.functions.graph import pagerank

        pairs = spark.createDataFrame(
            [(0, i) for i in range(1, 8)], ["id_a", "id_b"]
        )
        a = {r.node: r.rank for r in pagerank(pairs).collect()}
        b = {r.node: r.rank for r in pagerank(pairs.repartition(7)).collect()}
        assert a == b
        assert all(a[0] > a[i] for i in range(1, 8))

    def test_canonical_by_rank_picks_most_connected(self, spark):
        """In a cluster {1,2,3,4} where 3 touches everyone, the
        canonical doc is 3 (not min-id 1); singletons self-canonize."""
        from astro_spark.functions.graph import cluster_canonical_by_rank

        pairs = spark.createDataFrame(
            [(1, 3), (2, 3), (3, 4)], ["id_a", "id_b"]
        )
        ids = spark.createDataFrame([(i,) for i in range(1, 6)], ["doc_id"])
        got = {
            r.doc_id: (r.cluster_id, r.canonical_id)
            for r in cluster_canonical_by_rank(pairs, ids).collect()
        }
        assert {got[i] for i in (1, 2, 3, 4)} == {(1, 3)}
        assert got[5] == (5, 5)


class TestThresholdSweep:
    def test_exact_bins_and_cumulative(self, spark):
        from astro_spark.functions.dedup import pair_threshold_sweep

        pairs = spark.createDataFrame(
            [(1, 2, 1.0), (3, 4, 0.97), (5, 6, 0.61), (7, 8, 0.60), (9, 10, 0.42)],
            ["id_a", "id_b", "jaccard"],
        )
        got = {
            r.threshold_x100: (r.n_pairs, r.n_pairs_at_or_above)
            for r in pair_threshold_sweep(pairs).collect()
        }
        # bins: 100//5=20, 97//5=19, 61//5 and 60//5 =12, 42//5=8
        assert got == {100: (1, 1), 95: (1, 2), 60: (2, 4), 40: (1, 5)}


class TestBpe:
    def test_train_matches_pure_python_reference(self, spark):
        """Spark BPE training (corpus-wide pair counts, deterministic
        argmax) equals the classic greedy algorithm step-for-step."""
        corpus = ["the merger hashes rows the hash", "join the rows hash rows"]
        df = spark.createDataFrame(list(enumerate(corpus)), ["doc_id", "text"])
        got = text.bpe_train(df, n_merges=6)
        assert got == [
            ("h", "e"), ("a", "s"), ("h", "as"),
            ("o", "w"), ("ow", "s"), ("r", "ows"),
        ]

    def test_driver_side_training_bit_equals_distributed(self, spark):
        """driver_side=True (collect the Zipf-bounded word table once,
        train all rounds in Python — zero Spark jobs per merge) learns
        the exact merge table of the distributed B=1 chain."""
        corpus = ["the merger hashes rows the hash", "join the rows hash rows"]
        df = spark.createDataFrame(list(enumerate(corpus)), ["doc_id", "text"])
        for n in (4, 8, 12):
            seq = text.bpe_train(df, n_merges=n)
            assert text.bpe_train(df, n_merges=n, driver_side=True) == seq, n

    def test_batched_rounds_deterministic_approximation(self, spark):
        """batch_rounds>1 (token-disjoint top-B per driver round-trip)
        is a DETERMINISTIC approximation: repeat runs are identical,
        the first pick of every round matches what sequential training
        would choose at that state, and the round-1 head of the batch
        equals the sequential chain's prefix until picks interact.
        (Full equality with B=1 does NOT hold in general — a merge's
        newly-created pairs can out-rank the batch's later picks; the
        docstring documents this and driver_side=True is the exact
        path.)"""
        corpus = ["the merger hashes rows the hash", "join the rows hash rows"]
        df = spark.createDataFrame(list(enumerate(corpus)), ["doc_id", "text"])
        seq = text.bpe_train(df, n_merges=8)
        for B in (2, 4):
            one = text.bpe_train(df, n_merges=8, batch_rounds=B)
            two = text.bpe_train(df, n_merges=8, batch_rounds=B)
            assert one == two and len(one) == 8, B
            assert one[0] == seq[0], B  # round-1 argmax always agrees

    def test_apply_greedy_nonoverlapping(self, spark):
        """Classic BPE semantics: (a,a) over 'aaa' merges leftmost-first
        to [aa, a]; merges never cross word boundaries."""
        df = spark.createDataFrame([(1, "aaa aa a")], ["doc_id", "text"])
        out = df.select(
            text.bpe_apply("text", [("a", "a")]).alias("s")
        ).collect()[0].s
        assert out == ["aa", "a", "aa", "a"]

    def test_np_apply_exactly_equals_expression_folds(self, docs):
        """The Arrow word-cached apply and the chained expression folds
        produce the same vocabulary report row-for-row (strings — exact
        equality, no float caveats)."""
        a = sorted(map(tuple, text.bpe_subword_counts(docs, np_apply=False).collect()))
        b = sorted(map(tuple, text.bpe_subword_counts(docs, np_apply=True).collect()))
        assert a == b

    def test_frozen_merges_produce_real_subwords(self, spark):
        """The shipped merge table segments fixture-vocabulary words into
        the learned subwords."""
        from astro_spark.functions.constants import BPE_MERGES

        df = spark.createDataFrame([(1, "join hash rows merger")], ["doc_id", "text"])
        out = df.select(
            text.bpe_apply("text", BPE_MERGES).alias("s")
        ).collect()[0].s
        assert "join" in out and "hash" in out
        assert out == ["join", "hash", "row", "s", "mer", "g", "er"]


class TestFuzzyJoin:
    def test_blocking_and_distance_filter(self, spark):
        """Only same-block candidates are compared (no cross-block pair
        even at distance 1), and the distance threshold is exact."""
        from astro_spark.plans.fuzzy import fuzzy_dedup_names

        df = spark.createDataFrame(
            [(1, "red plate"), (2, "hot plate"), (3, "red plates"),
             (4, "red ring")],
            ["id", "p_name"],
        )
        got = {
            (r.name_a, r.name_b): r.distance
            for r in fuzzy_dedup_names(df, "p_name").collect()
        }
        assert got[("hot plate", "red plate")] == 3
        # 'red plates' blocks on 'plates' — never compared with 'plate's
        assert not any("red plates" in k for k in got)
        # 'red ring' blocks on 'ring' — no partner
        assert not any("red ring" in k for k in got)

    def test_fuzzy_join_two_relations(self, spark):
        from pyspark.sql import functions as F_

        from astro_spark.plans.fuzzy import fuzzy_join

        a = spark.createDataFrame([(1, "acme corp")], ["id", "n"])
        b = spark.createDataFrame([(9, "acme core"), (10, "zzzz corp")], ["id", "n"])
        got = fuzzy_join(
            a, b, "n", "n",
            lambda c: F_.substring(c, 1, 2),  # block on 2-char prefix
            max_distance=2, left_id="id", right_id="id",
        ).collect()
        assert len(got) == 1
        assert (got[0].left_id, got[0].right_id, got[0].distance) == (1, 9, 1)


class TestEwmaAnomalies:
    def test_matches_pure_python_recurrence(self, spark):
        """Per-key EWMA fold equals the sequential reference, anomaly
        counting included (pre-update residual vs running level; the
        seed observation is never an anomaly)."""
        import datetime as dt

        from astro_spark.functions.timeseries import ewma_anomalies

        base = dt.datetime(2024, 1, 1)
        series = {
            1: [100.0, 102.0, 350.0, 101.0],   # one spike at threshold 200
            2: [50.0, 51.0, 52.0],             # quiet
        }
        rows = [
            (k, base + dt.timedelta(minutes=i), v)
            for k, vs in series.items()
            for i, v in enumerate(vs)
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        got = {
            r.key: (r.n_events, r.n_anomalies, r.ewma_r4)
            for r in ewma_anomalies(df, threshold_cents=20000).collect()
        }

        def ref(vs):
            e = None
            n = 0
            for v in vs:
                c = round(v * 100)
                if e is None:
                    e = float(c)
                else:
                    if abs(c - e) > 20000.0:
                        n += 1
                    e = 0.25 * c + 0.75 * e
            return n, round(e, 4)

        for k, vs in series.items():
            n, e = ref(vs)
            assert got[k] == (len(vs), n, e), k
        assert got[1][1] == 1 and got[2][1] == 0

    def test_ewma_windowed_equals_full_in_window(self, spark):
        """The unbounded-key guard: for data confined to a single time
        window, the per-(key, window) fold IS the full fold — and data
        spanning windows folds independently per bucket (each fold's
        state is bounded by one window's events)."""
        import datetime as dt

        from astro_spark.functions.timeseries import ewma_anomalies

        base = dt.datetime(2024, 1, 1)
        rows = [
            (k, base + dt.timedelta(minutes=7 * i + k), float(40 + (i * 37) % 300))
            for k in range(1, 6)
            for i in range(20)
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        # all rows fall inside one 7-day bucket → windowed == full
        full = {
            r.key: (r.n_events, r.n_anomalies, r.ewma_r4)
            for r in ewma_anomalies(df, threshold_cents=10000).collect()
        }
        win = ewma_anomalies(df, threshold_cents=10000, window_days=7).collect()
        assert {r.key: (r.n_events, r.n_anomalies, r.ewma_r4) for r in win} == full
        assert len({r.win_start for r in win}) == 1

        # spread the same series across two buckets → two independent
        # folds per key whose event counts partition the full history
        rows2 = [
            (k, base + dt.timedelta(days=0 if i < 10 else 30, minutes=i), v)
            for (k, _, v), i in zip(rows, [i for _ in range(1, 6) for i in range(20)])
        ]
        df2 = spark.createDataFrame(rows2, "user_id long, ts timestamp, value double")
        win2 = ewma_anomalies(df2, threshold_cents=10000, window_days=7).collect()
        per_key = {}
        for r in win2:
            per_key.setdefault(r.key, []).append(r)
        for k, parts in per_key.items():
            assert len(parts) == 2, k
            assert sum(p.n_events for p in parts) == 20


class TestKmvSketch:
    def test_below_k_is_exact(self, spark):
        """Fewer distinct values than k → the estimate IS the exact
        count (a sketch must not approximate what it saw in full)."""
        from astro_spark.functions.sketches import kmv_distinct

        df = spark.createDataFrame(
            [(f"w{i % 40}",) for i in range(500)], "v string"
        )
        row = kmv_distinct(df, "v", k=256).collect()[0]
        assert row.k_used == 40
        assert row.est_distinct == 40.0

    def test_estimate_within_tolerance(self, spark, sf_dir):
        """Above k, the KMV estimate lands within the theoretical
        ~1/sqrt(k) relative-error band (k=256 → ~6%; allow 4 sigma).
        3-word shingles: the fixture vocabulary itself is tiny."""
        from astro_spark.functions.sketches import kmv_token_report
        from astro_spark.testdata import read_table

        row = kmv_token_report(
            read_table(spark, sf_dir, "documents"), shingle=3
        ).collect()[0]
        assert row.k_used == 256
        assert row.exact_distinct > 256
        assert row.err_pct < 25.0, row

    def test_kmv_distinct_on_long_column(self, spark):
        """ADVICE r15: the fingerprint's pandas kernel needs string
        input — a bigint column must keep the old implicit-cast
        contract (split(c,'') cast any atomic type), not crash the
        Python worker, and match the explicitly-cast run exactly."""
        from astro_spark.functions.sketches import kmv_distinct

        rows = [(i % 37,) for i in range(400)]
        got = kmv_distinct(
            spark.createDataFrame(rows, "v long"), "v", k=64
        ).collect()[0]
        want = kmv_distinct(
            spark.createDataFrame(rows, "v long").selectExpr(
                "CAST(v AS STRING) AS v"
            ),
            "v",
            k=64,
        ).collect()[0]
        assert got == want
        assert got.k_used == 37

    def test_merge_free_determinism(self, spark):
        """Partitioning must not affect the result (the k smallest
        distinct hashes are a set property, not a scan order)."""
        from astro_spark.functions.sketches import kmv_distinct

        rows = [(f"tok{i}",) for i in range(3000)]
        a_ = kmv_distinct(
            spark.createDataFrame(rows, "v string").repartition(1), "v"
        ).collect()[0]
        b_ = kmv_distinct(
            spark.createDataFrame(rows, "v string").repartition(13), "v"
        ).collect()[0]
        assert a_ == b_

    def test_grouped_sketch_equals_per_group_runs(self, spark, sf_dir):
        """kmv_distinct_by over all groups in one job equals running
        the single sketch per filtered group."""
        from astro_spark.functions.sketches import (
            kmv_distinct_by,
            kmv_token_report,
        )
        from astro_spark.testdata import read_table

        docs = read_table(spark, sf_dir, "documents")
        got = {
            r.lang: (r.k_used, r.kth_min_hash, r.est_distinct)
            for r in kmv_distinct_by(
                docs, "lang", shingle=3, k=64
            ).collect()
        }
        for lang in got:
            row = kmv_token_report(
                docs.where(F.col("lang") == lang), shingle=3, k=64
            ).collect()[0]
            assert got[lang] == (row.k_used, row.kth_min_hash, row.est_distinct)

    def test_event_transitions_small_fixture(self, spark):
        """Next-event bigram counts match the hand-computed matrix with
        deterministic (ts, id) ordering."""
        import datetime as dt

        from astro_spark.functions.events import event_transitions

        base = dt.datetime(2024, 1, 1)
        rows = [
            (1, 1, base, "view"),
            (2, 1, base + dt.timedelta(minutes=1), "click"),
            (3, 1, base + dt.timedelta(minutes=2), "view"),
            (4, 2, base, "view"),
            (5, 2, base + dt.timedelta(minutes=1), "click"),
            # same-ts tie inside user 3: event_id breaks it -> a then b
            (6, 3, base, "a"),
            (7, 3, base, "b"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        got = {
            (r.from_type, r.next_type): r.n_transitions
            for r in event_transitions(df).collect()
        }
        assert got == {
            ("view", "click"): 2,
            ("click", "view"): 1,
            ("a", "b"): 1,
        }

    def test_pre_aggregate_equals_distinct_path(self, spark, sf_dir):
        """The per-partition top-k pre-aggregation (no DISTINCT shuffle
        of raw hashes) must produce the identical sketch — on a
        many-partition token stream, below-k inputs, and the shingle
        report the driver checks."""
        from astro_spark.functions.sketches import kmv_distinct, kmv_token_report
        from astro_spark.testdata import read_table

        rows = [(f"tok{i % 1500}",) for i in range(6000)]
        df = spark.createDataFrame(rows, "v string").repartition(17)
        assert (
            kmv_distinct(df, "v", k=256, pre_aggregate=True).collect()
            == kmv_distinct(df, "v", k=256).collect()
        )
        small = spark.createDataFrame(rows[:40], "v string").repartition(7)
        assert (
            kmv_distinct(small, "v", k=256, pre_aggregate=True).collect()
            == kmv_distinct(small, "v", k=256).collect()
        )
        docs = read_table(spark, sf_dir, "documents")
        assert (
            kmv_token_report(docs, shingle=3, pre_aggregate=True).collect()
            == kmv_token_report(docs, shingle=3).collect()
        )


class TestFunnel:
    def test_matches_pure_python_fold(self, spark):
        """Furthest in-order stage per user equals the sequential
        reference; out-of-order later steps don't count."""
        import datetime as dt

        from astro_spark.functions.events import funnel

        base = dt.datetime(2024, 1, 1)
        # user: [(minute, type)]
        data = {
            1: [(0, "view"), (1, "click"), (2, "purchase")],   # full funnel
            2: [(0, "click"), (1, "view"), (2, "click")],      # view then click
            3: [(0, "purchase"), (1, "view")],                 # only view
            4: [(0, "error")],                                 # no steps
            5: [(0, "view"), (1, "purchase")],                 # skips click
        }
        rows = [
            (u, base + dt.timedelta(minutes=m), t)
            for u, evs in data.items()
            for m, t in evs
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
        got = {
            (r.step_idx, r.step): r.n_users
            for r in funnel(df, ["view", "click", "purchase"]).collect()
        }
        # reached step1: users 1,2,3,5 = 4; step2: 1,2 = 2; step3: 1 = 1
        assert got == {
            (1, "view"): 4,
            (2, "click"): 2,
            (3, "purchase"): 1,
        }

    def test_empty_input_gives_zero_rows_per_step(self, spark):
        from astro_spark.functions.events import funnel

        df = spark.createDataFrame(
            [], "user_id long, ts timestamp, event_type string"
        )
        got = funnel(df, ["view", "click"]).collect()
        assert [(r.step_idx, r.n_users) for r in got] == [(1, 0), (2, 0)]

    def test_windowed_equals_full_when_data_fits_one_window(self, spark):
        """With all events inside one epoch window and users under the
        cap, the guarded funnel IS the unguarded funnel — the
        ewma-windowed equality contract applied here."""
        import datetime as dt

        from astro_spark.functions.events import funnel

        base = dt.datetime(2024, 1, 1)
        data = {
            1: [(0, "view"), (1, "click"), (2, "purchase")],
            2: [(0, "click"), (1, "view"), (2, "click")],
            3: [(0, "purchase"), (1, "view")],
            5: [(0, "view"), (1, "purchase")],
        }
        rows = [
            (u, base + dt.timedelta(minutes=m), t)
            for u, evs in data.items()
            for m, t in evs
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        )
        steps = ["view", "click", "purchase"]
        full = {(r.step_idx, r.n_users) for r in funnel(df, steps).collect()}
        guarded = {
            (r.step_idx, r.n_users)
            for r in funnel(
                df, steps, window_days=365, max_events_per_user=100
            ).collect()
        }
        assert guarded == full

    def test_window_boundary_splits_the_chain(self, spark):
        """A chain straddling two windows does not convert: steps must
        complete within one conversion window."""
        import datetime as dt

        from astro_spark.functions.events import funnel

        # window_days=1: view on day0, click+purchase on day1 → the
        # day-1 fold starts at 'click' (stage 0), day-0 fold stops at 1
        rows = [
            (1, dt.datetime(2024, 1, 1, 23, 0), "view"),
            (1, dt.datetime(2024, 1, 2, 1, 0), "click"),
            (1, dt.datetime(2024, 1, 2, 2, 0), "purchase"),
            (2, dt.datetime(2024, 1, 3, 1, 0), "view"),
            (2, dt.datetime(2024, 1, 3, 2, 0), "click"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        )
        got = {
            (r.step_idx): r.n_users
            for r in funnel(
                df, ["view", "click", "purchase"], window_days=1
            ).collect()
        }
        assert got == {1: 2, 2: 1, 3: 0}

    def test_event_cap_truncates_late_steps(self, spark):
        """max_events_per_user keeps only the EARLIEST N step events:
        a conversion arriving after the cap is not counted."""
        import datetime as dt

        from astro_spark.functions.events import funnel

        rows = [
            (1, dt.datetime(2024, 1, 1, 0, m), "view") for m in range(5)
        ] + [(1, dt.datetime(2024, 1, 1, 1, 0), "click")]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        )
        capped = {
            r.step_idx: r.n_users
            for r in funnel(
                df, ["view", "click"], max_events_per_user=3
            ).collect()
        }
        assert capped == {1: 1, 2: 0}
        uncapped = {
            r.step_idx: r.n_users
            for r in funnel(df, ["view", "click"]).collect()
        }
        assert uncapped == {1: 1, 2: 1}

    def test_funnel_sql_escapes_quoted_step_names(self):
        """A step name containing a single quote must not break the
        oracle SQL (ADVICE r5: '' escaping on interpolation)."""
        import duckdb

        from astro_spark.functions.oracles import funnel_sql

        sql = funnel_sql(["add'l view", "buy"])
        assert "add''l view" in sql and "add'l view'" not in sql.replace("''", "")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM (VALUES "
            "(1, TIMESTAMP '2024-01-01 00:00:00', 'add''l view'), "
            "(1, TIMESTAMP '2024-01-01 00:01:00', 'buy')"
            ") t(user_id, ts, event_type)"
        )
        rows = con.execute(sql).fetchall()
        assert [(r[0], r[2]) for r in sorted(rows)] == [(1, 1), (2, 1)]


class TestCohortRetention:
    def test_small_fixture(self, spark):
        """Cohorts partition users by first week; offsets count only
        weeks the user was actually active."""
        import datetime as dt

        from astro_spark.functions.events import cohort_retention

        def ts(day):
            return dt.datetime(2024, 1, 1) + dt.timedelta(days=day)

        rows = [
            # user 1: weeks w, w+1
            (1, ts(0)), (1, ts(7)),
            # user 2: weeks w, w+2 (gap week)
            (2, ts(1)), (2, ts(15)),
            # user 3: joins week w+1 only
            (3, ts(8)),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            (r.cohort_wk, r.offset_wk): r.n_users
            for r in cohort_retention(df).collect()
        }
        w = min(c for c, _ in got)
        assert got == {
            (w, 0): 2,       # users 1,2
            (w, 1): 1,       # user 1
            (w, 2): 1,       # user 2
            (w + 1, 0): 1,   # user 3
        }


class TestPiiStats:
    def test_counts_and_redaction(self, spark):
        """Span counts match hand-counted fixtures and chain-redaction
        removes every counted span."""
        from astro_spark.functions.privacy import pii_stats, redact_all

        rows = [
            (1, "mail a@b.com and c@d.org see https://x.io/a at 10.0.0.1"),
            (2, "call +49-123-4567 twice +49-123-4567"),
            (3, "clean text only"),
        ]
        df = spark.createDataFrame(rows, "id long, body string")
        stats = pii_stats("body")
        got = {
            r.id: (r.n_email, r.n_url, r.n_ipv4, r.n_phone)
            for r in df.select("id", *[c.alias(n) for n, c in stats.items()]).collect()
        }
        assert got[1] == (2, 1, 1, 0)
        assert got[2] == (0, 0, 0, 2)
        assert got[3] == (0, 0, 0, 0)
        red = {
            r.id: r.red
            for r in df.select("id", redact_all("body").alias("red")).collect()
        }
        assert red[1] == "mail [EMAIL] and [EMAIL] see [URL] at [IPV4]"
        assert red[2] == "call [PHONE] twice [PHONE]"
        assert red[3] == "clean text only"


class TestNoveltyScores:
    def test_matches_hand_count(self, spark):
        """Rare = shingles appearing in exactly one doc; duplicated docs
        share every shingle, unique docs own theirs."""
        from astro_spark.functions.dedup import novelty_scores

        rows = [
            (1, "alpha beta gamma delta"),       # shares all with doc 2
            (2, "alpha beta gamma delta"),
            (3, "unique words entirely here"),   # all shingles rare
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_shingles, r.n_rare, r.novelty_pmille)
            for r in novelty_scores(df).collect()
        }
        # 4 tokens, k=3 -> 2 shingles per doc
        assert got[1] == (2, 0, 0)
        assert got[2] == (2, 0, 0)
        assert got[3] == (2, 2, 1000)

    def test_all_bigint_floor_share(self, spark):
        """A doc with a mix of shared and unique shingles gets the
        floor(1000*rare/total) share."""
        from astro_spark.functions.dedup import novelty_scores

        rows = [
            (1, "a b c d e"),   # shingles: abc bcd cde (3)
            (2, "a b c x y"),   # shares abc; bcx cxy unique
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in novelty_scores(df).collect()}
        assert got[1].n_shingles == 3 and got[1].n_rare == 2
        assert got[1].novelty_pmille == 666  # floor(2000/3)


class TestCellBalance:
    def test_counts_sum_to_corpus(self, spark, sf_dir):
        from astro_spark.functions.similarity import cell_balance
        from astro_spark.testdata import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        rows = cell_balance(emb).collect()
        assert sum(r.n_vecs for r in rows) == emb.count()
        assert all(0 <= r.share_pmille <= 1000 for r in rows)
        # floor shares under-sum to at most 1000
        assert sum(r.share_pmille for r in rows) <= 1000

    def test_matches_assignment(self, spark, sf_dir):
        """Per-cell counts equal a direct groupBy over ivf_assign."""
        from astro_spark.functions.constants import SEMDEDUP_CENTROIDS
        from astro_spark.functions.similarity import cell_balance, ivf_assign
        from astro_spark.testdata import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        direct = {
            r.cell: r.n
            for r in ivf_assign(emb, SEMDEDUP_CENTROIDS)
            .groupBy("cell")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        got = {r.cell: r.n_vecs for r in cell_balance(emb).collect()}
        assert got == direct


class TestComponentsStar:
    def test_equals_label_propagation_on_random_graphs(self, spark):
        """Alternating star CC must equal dup_clusters (min-label
        propagation) on random graphs, including long chains where the
        star algorithm's O(log n) rounds matter."""
        import random

        from astro_spark.functions.dedup import dup_clusters
        from astro_spark.functions.graph import components_star

        from tests._budget import trials

        rng = random.Random(12345)
        for trial in range(trials(1, 3)):
            n = 60
            ids = list(range(n))
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(40)
            ]
            # plus one long chain to stress diameter
            chain_lo = 100
            edges += [(chain_lo + i, chain_lo + i + 1) for i in range(25)]
            ids += [chain_lo + i for i in range(26)]
            pairs = spark.createDataFrame(edges, "id_a long, id_b long")
            all_ids = spark.createDataFrame([(i,) for i in ids], "doc_id long")
            want = {
                r.doc_id: r.cluster_id
                for r in dup_clusters(pairs, all_ids).collect()
            }
            got = {
                r.doc_id: r.cluster_id
                for r in components_star(pairs, all_ids).collect()
            }
            assert got == want, f"trial {trial}"

    def test_chain_converges_fast(self, spark):
        """A 64-node path collapses to one cluster rooted at its min."""
        from astro_spark.functions.graph import components_star

        edges = [(i, i + 1) for i in range(63)]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        all_ids = spark.createDataFrame([(i,) for i in range(64)], "doc_id long")
        got = components_star(pairs, all_ids).collect()
        assert all(r.cluster_id == 0 for r in got)

    def test_warns_when_iteration_cap_exits_before_convergence(self, spark):
        """Exhausting max_iterations without the signature stabilizing
        must WARN — silent non-converged labels are wrong clusters with
        no signal (ADVICE r5)."""
        import warnings

        from astro_spark.functions.graph import components_star

        edges = [(i, i + 1) for i in range(31)]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        all_ids = spark.createDataFrame([(i,) for i in range(32)], "doc_id long")
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            components_star(pairs, all_ids, max_iterations=1)
        assert any(
            issubclass(w.category, RuntimeWarning)
            and "max_iterations" in str(w.message)
            for w in caught
        )


class TestWeightedSampleN:
    def test_deterministic_and_weight_biased(self, spark):
        """Same sample on any partitioning; heavier rows
        over-represented vs the unweighted sample."""
        from astro_spark.functions.sampling import (
            sample_exact_n,
            weighted_sample_n,
        )

        rows = [(i, 1000.0 if i % 10 == 0 else 1.0) for i in range(1000)]
        df1 = spark.createDataFrame(rows, "doc_id long, w double").repartition(1)
        df2 = spark.createDataFrame(rows, "doc_id long, w double").repartition(7)
        s1 = [(r.doc_id, r.sample_rank) for r in weighted_sample_n(df1, 50, "w").collect()]
        s2 = [(r.doc_id, r.sample_rank) for r in weighted_sample_n(df2, 50, "w").collect()]
        assert sorted(s1) == sorted(s2)
        heavy = sum(1 for d, _ in s1 if d % 10 == 0)
        # 100 of 1000 rows carry 1000x weight: they should dominate the
        # top-50 (uniform would give ~5)
        assert heavy > 30, heavy
        base = sample_exact_n(df1, 50)
        heavy_base = sum(1 for r in base.collect() if r.doc_id % 10 == 0)
        assert heavy_base < heavy

    def test_nonpositive_weights_excluded(self, spark):
        from astro_spark.functions.sampling import weighted_sample_n

        rows = [(1, 0.0), (2, -3.0), (3, 2.0)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        got = weighted_sample_n(df, 10, "w").collect()
        assert [r.doc_id for r in got] == [3]


class TestNewOpPlanShapes:
    def test_kmv_take_ordered(self, spark, sf_dir):
        """The KMV top-k must compile to TakeOrderedAndProject — per
        partition top-k, never a global sort."""
        from astro_spark.functions.sketches import shingle_fingerprints
        from astro_spark.testdata import read_table

        docs = read_table(spark, sf_dir, "documents")
        mins = (
            shingle_fingerprints(docs, "text", 3)
            .distinct()
            .orderBy("hv")
            .limit(256)
        )
        plan = mins._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan

    def test_weighted_sample_take_ordered(self, spark, sf_dir):
        from astro_spark.functions.sampling import weighted_sample_n
        from astro_spark.testdata import read_table

        docs = read_table(spark, sf_dir, "documents").select(
            "doc_id", "n_chars"
        )
        # the pick itself (before the tiny rank window) is TakeOrdered
        from astro_spark.functions.text import char_poly_hash

        key = char_poly_hash(F.col("doc_id").cast("string")).cast(
            "double"
        ) / F.col("n_chars").cast("double")
        picked = (
            docs.where(F.col("n_chars") > 0)
            .withColumn("__k", key)
            .orderBy("__k", "doc_id")
            .limit(100)
        )
        plan = picked._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan

    def test_funnel_no_nested_loop_join(self, spark, sf_dir):
        """The funnel plan is agg-only: no BroadcastNestedLoopJoin, no
        CartesianProduct anywhere."""
        from astro_spark.functions.events import funnel
        from astro_spark.testdata import read_table

        ev = read_table(spark, sf_dir, "events")
        plan = (
            funnel(ev, ["view", "click", "purchase"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestBudgetSelect:
    def test_two_phase_equals_global_walk(self, spark):
        """The bucketed prefix sum equals a sequential best-first walk,
        including the boundary doc that crosses the budget."""
        from astro_spark.functions.sampling import budget_select

        rows = [
            (i, (i * 7) % 5, 10 + (i % 3)) for i in range(100)
        ]  # (doc_id, score in 0..4, tokens 10..12)
        df = spark.createDataFrame(rows, "doc_id long, score long, n_tokens long")
        budget = 300
        got = sorted(
            (r.doc_id, r.cum_tokens)
            for r in budget_select(df, budget, "score", "n_tokens").collect()
        )
        cum = 0
        want = []
        for did, sc, nt in sorted(rows, key=lambda t: (-t[1], t[0])):
            if cum >= budget:
                break
            cum += nt
            want.append((did, cum))
        assert got == sorted(want)
        # the budget is a lower bound: last selected doc crosses it
        assert max(c for _, c in got) >= budget


# ---------------------------------------------------------------- linalg


class TestLinalg:
    def _emb(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def test_gram_matrix_matches_numpy(self, spark, sf_dir):
        import numpy as np

        from astro_spark.functions import linalg

        emb = self._emb(spark, sf_dir)
        rows = linalg.gram_matrix(emb).collect()
        x = np.array(
            [np.asarray(r[0], dtype="float64") for r in emb.select("embedding").collect()]
        )
        expected = x.T @ x
        d = expected.shape[0]
        assert len(rows) == d * d
        got = np.zeros((d, d))
        for r in rows:
            got[r["i"], r["j"]] = r["g"]
        assert np.allclose(got, expected, rtol=1e-9, atol=1e-9)

    def test_gram_matrix_np_twin_matches(self, spark, sf_dir):
        import numpy as np

        from astro_spark.functions import linalg

        emb = self._emb(spark, sf_dir).repartition(4)
        jvm = {(r["i"], r["j"]): r["g"] for r in linalg.gram_matrix(emb).collect()}
        arrow = {
            (r["i"], r["j"]): r["g"] for r in linalg.gram_matrix_np(emb).collect()
        }
        assert set(jvm) == set(arrow)
        for k in jvm:
            assert abs(jvm[k] - arrow[k]) < 1e-6

    def test_gram_matrix_quantized_is_order_independent(self, spark, sf_dir):
        from astro_spark.functions import linalg

        emb = self._emb(spark, sf_dir)
        a = sorted(
            (r["i"], r["j"], r["g"])
            for r in linalg.gram_matrix(emb, scale=1_000_000).collect()
        )
        b = sorted(
            (r["i"], r["j"], r["g"])
            for r in linalg.gram_matrix(
                emb.repartition(7), scale=1_000_000
            ).collect()
        )
        assert a == b

    def test_pca_matches_numpy(self, spark, sf_dir):
        import numpy as np

        from astro_spark.functions import linalg

        emb = self._emb(spark, sf_dir)
        model = linalg.pca_train(emb, k=4)
        x = np.array(
            [np.asarray(r[0], dtype="float64") for r in emb.select("embedding").collect()]
        )
        xc = x - x.mean(axis=0)
        cov = (xc.T @ xc) / (x.shape[0] - 1)
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1][:4]
        np.testing.assert_allclose(
            model["explained_variance"], evals[order], rtol=1e-6, atol=1e-9
        )
        for got, exp in zip(np.array(model["components"]), evecs[:, order].T):
            if exp[np.argmax(np.abs(exp))] < 0:
                exp = -exp
            np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-8)

    def test_pca_train_empty_input_raises_clearly(self, spark):
        """An empty corpus raises ValueError('empty input'), not an
        opaque TypeError from .first()['d'] (ADVICE r8)."""
        import pytest

        from astro_spark.functions import linalg

        empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="empty input"):
            linalg.pca_train(empty, k=2)

    def test_pca_project_reduces_dim_and_centers(self, spark, sf_dir):
        import numpy as np

        from astro_spark.functions import linalg

        emb = self._emb(spark, sf_dir)
        model = linalg.pca_train(emb, k=2)
        out = linalg.pca_project(emb, model).select("vec_id", "pc").collect()
        assert all(len(r["pc"]) == 2 for r in out)
        # projections of centered data have ~zero mean per component
        arr = np.array([r["pc"] for r in out])
        np.testing.assert_allclose(arr.mean(axis=0), 0.0, atol=1e-6)


# ----------------------------------------------------------- vocab encode


class TestVocabEncode:
    def test_build_vocab_ranks_by_frequency_then_token(self, spark):
        from astro_spark.functions import text as T

        docs = spark.createDataFrame(
            [(1, "b b a a c"), (2, "b z")], ["doc_id", "text"]
        )
        vocab = {r["tok"]: r["tok_id"] for r in T.build_vocab(docs, size=3).collect()}
        # b:3, a:2, c:1/z:1 -> tie broken by token string asc
        assert vocab == {"b": 0, "a": 1, "c": 2}

    def test_encode_documents_preserves_order_and_flags_oov(self, spark):
        from astro_spark.functions import text as T

        docs = spark.createDataFrame(
            [(1, "b a q b"), (2, ""), (3, "q q")], ["doc_id", "text"]
        )
        vocab = T.build_vocab(docs, size=2)  # b:0 (2x), q:1 (hmm q:3x)
        enc = {
            r["doc_id"]: (list(r["token_ids"]), r["n_oov"])
            for r in T.encode_documents(docs, vocab).collect()
        }
        ranked = {r["tok"]: r["tok_id"] for r in vocab.collect()}
        ids1 = [ranked.get(t, -1) for t in "b a q b".split()]
        assert enc[1] == (ids1, sum(1 for i in ids1 if i == -1))
        assert enc[2] == ([], 0)
        assert enc[3][1] == (0 if "q" in ranked else 2)

class TestGramAdditivity:
    def test_gram_long_partials_are_exactly_additive(self, spark, sf_dir):
        """Integer quantization makes gram partials additive: any split
        of the corpus sums to the full corpus values bit-for-bit — the
        property the streaming Gram MV (st_gram) rests on."""
        from astro_spark.functions import linalg

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        full = {
            (r["i"], r["j"]): r["s"]
            for r in linalg.gram_matrix_long(emb).collect()
        }
        a_part = {
            (r["i"], r["j"]): r["s"]
            for r in linalg.gram_matrix_long(
                emb.where("vec_id % 2 = 0")
            ).collect()
        }
        b_part = {
            (r["i"], r["j"]): r["s"]
            for r in linalg.gram_matrix_long(
                emb.where("vec_id % 2 = 1")
            ).collect()
        }
        assert full == {
            k: a_part.get(k, 0) + b_part.get(k, 0) for k in full
        }

    def test_incremental_pca_from_state_matches_batch(self, spark, sf_dir):
        """PCA refreshed from the additive sufficient-statistics state
        (Gram + per-dim sums + count) matches full-corpus pca_train to
        quantization tolerance — and state merged from two corpus
        slices equals one-shot state, so the refresh needs no corpus
        rescan (the incremental-PCA contract behind st_gram)."""
        import numpy as np

        from astro_spark.functions import linalg

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        merged = {}
        for pred in ("vec_id % 2 = 0", "vec_id % 2 = 1"):
            for r in linalg.gram_state_long(emb.where(pred)).collect():
                k = (r["i"], r["j"])
                merged[k] = merged.get(k, 0) + r["s"]
        one_shot = {
            (r["i"], r["j"]): r["s"]
            for r in linalg.gram_state_long(emb).collect()
        }
        assert merged == one_shot
        inc = linalg.pca_from_state(
            [{"i": i, "j": j, "s": s} for (i, j), s in merged.items()], k=3
        )
        batch = linalg.pca_train(emb, k=3)
        np.testing.assert_allclose(
            inc["explained_variance"], batch["explained_variance"],
            rtol=1e-4, atol=1e-7,
        )
        np.testing.assert_allclose(inc["mean"], batch["mean"], atol=1e-6)
        for a_c, b_c in zip(inc["components"], batch["components"]):
            np.testing.assert_allclose(a_c, b_c, rtol=1e-3, atol=1e-4)


class TestContainment:
    def test_wrapped_doc_is_caught_directionally(self, spark):
        """A short doc fully quoted inside a much larger one: containment
        A→B is 1.0 while B→A (and symmetric Jaccard) stays low."""
        from astro_spark.functions import dedup

        quoted = "alpha beta gamma delta epsilon zeta eta theta"
        filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
        docs = spark.createDataFrame(
            [(1, quoted), (2, f"{filler} {quoted} {filler}")],
            ["doc_id", "text"],
        )
        pairs = {
            (r.id_a, r.id_b): r.containment
            for r in dedup.containment_pairs(docs, threshold=0.0).collect()
        }
        assert pairs[(1, 2)] == 1.0
        assert pairs[(2, 1)] < 0.1
        # symmetric jaccard would miss this pair at its threshold
        jac = dedup.ngram_jaccard_pairs(docs).collect()
        assert jac == []

    def test_threshold_filters(self, spark):
        from astro_spark.functions import dedup

        docs = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d e f g h i j k l m n o p")],
            ["doc_id", "text"],
        )
        out = dedup.containment_pairs(docs, threshold=0.9).collect()
        assert {(r.id_a, r.id_b) for r in out} == {(1, 2)}


    def test_containment_dedup_shingles_corpus_once(self, spark, monkeypatch):
        """containment_dedup builds exactly ONE shingle base (persisted,
        shared by the size lookup and the pair scan) — the corpus was
        shingled twice per call when it delegated to containment_pairs
        (VERDICT r8 #2)."""
        from astro_spark.functions import dedup

        calls = []
        orig = dedup._shingle_base

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(dedup, "_shingle_base", spy)
        docs = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d e f g h i j k l m n o p")],
            ["doc_id", "text"],
        )
        assert dedup.containment_dedup(docs, threshold=0.5).count() >= 1
        assert len(calls) == 1

    def test_containment_dedup_keeps_container_and_breaks_ties(self, spark):
        from astro_spark.functions import dedup

        quoted = "alpha beta gamma delta epsilon zeta eta theta"
        filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
        docs = spark.createDataFrame(
            [
                (1, quoted),                          # contained -> drops
                (2, f"{filler} {quoted} {filler}"),    # container -> kept
                (5, "one two three four five six"),    # exact dup, higher id
                (4, "one two three four five six"),    # exact dup, lower id
            ],
            ["doc_id", "text"],
        )
        kept = {
            r.doc_id for r in dedup.containment_dedup(docs, threshold=0.8).collect()
        }
        assert kept == {2, 4}

    def test_containment_bounds_jaccard(self, spark, sf_dir):
        """For every directed pair, containment(A→B) ≥ jaccard(A,B):
        the denominator shrinks from |A∪B| to |A|."""
        from astro_spark.functions import dedup

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
        jac = {
            frozenset((r.id_a, r.id_b)): r.jaccard
            for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0).collect()
        }
        cont = {
            (r.id_a, r.id_b): r.containment
            for r in dedup.containment_pairs(docs, threshold=0.0).collect()
        }
        assert jac and cont
        for (a, b), c in cont.items():
            j = jac.get(frozenset((a, b)))
            assert j is not None and c >= j - 1e-9, (a, b, c, j)

    def test_containment_screen_robust_to_duplicate_index_rows(self, spark):
        """The screen counts DISTINCT matched shingles: a duplicated
        (cid, h) inverted-index relation (an at-least-once re-appended
        self_screen batch) yields the IDENTICAL containment scores."""
        from astro_spark.functions import dedup
        from astro_spark.functions.dedup import shingle_hash_array

        quoted = "alpha beta gamma delta epsilon zeta eta theta"
        filler = " ".join(f"w{i} x{i}" for i in range(30))
        corpus = spark.createDataFrame(
            [(100, f"{filler} {quoted} {filler}")], ["doc_id", "text"]
        )
        batch = spark.createDataFrame([(1, quoted)], ["doc_id", "text"])
        inv = corpus.select(
            F.col("doc_id").alias("cid"),
            F.explode(shingle_hash_array(F.col("text"))).alias("h"),
        )
        clean = {
            (r.batch_id, r.corpus_id, r.containment)
            for r in dedup.containment_incremental_pairs(
                batch, None, threshold=0.5, corpus_inverted=inv
            ).collect()
        }
        doubled = {
            (r.batch_id, r.corpus_id, r.containment)
            for r in dedup.containment_incremental_pairs(
                batch, None, threshold=0.5,
                corpus_inverted=inv.unionAll(inv),
            ).collect()
        }
        assert clean == doubled == {(1, 100, 1.0)}

    def test_containment_pairs_prebuilt_robust_to_duplicate_index_rows(
        self, spark
    ):
        """Same at-least-once contract for the full-pairs prebuilt path
        (r14: the per-pair countDistinct became an upfront index
        .distinct() + plain count — scores must still ignore duplicated
        (cid, h) rows)."""
        from astro_spark.functions import dedup
        from astro_spark.functions.dedup import shingle_hash_array

        quoted = "alpha beta gamma delta epsilon zeta eta theta"
        filler = " ".join(f"w{i} x{i}" for i in range(30))
        docs = spark.createDataFrame(
            [(1, quoted), (100, f"{filler} {quoted} {filler}")],
            ["doc_id", "text"],
        )
        inv = docs.select(
            F.col("doc_id").alias("cid"),
            F.explode(shingle_hash_array(F.col("text"))).alias("h"),
        )
        clean = {
            (r.id_a, r.id_b, r.containment)
            for r in dedup.containment_pairs(
                None, threshold=0.5, inverted=inv
            ).collect()
        }
        doubled = {
            (r.id_a, r.id_b, r.containment)
            for r in dedup.containment_pairs(
                None, threshold=0.5, inverted=inv.unionAll(inv)
            ).collect()
        }
        assert clean == doubled and (1, 100, 1.0) in clean

class TestPadTokenIds:
    def test_truncates_pads_and_masks(self, spark):
        from astro_spark.functions import text as T

        df = spark.createDataFrame(
            [(1, [5, 6, 7]), (2, [1]), (3, [])],
            "doc_id long, token_ids array<int>",
        )
        out = {
            r.doc_id: (list(r.input_ids), list(r.attention_mask))
            for r in T.pad_token_ids(df, max_len=2).collect()
        }
        assert out == {
            1: ([5, 6], [1, 1]),          # truncated
            2: ([1, 0], [1, 0]),          # padded
            3: ([0, 0], [0, 0]),          # empty doc -> all pad
        }


class TestContainmentIncremental:
    def test_batch_screen_matches_cross_slice_of_full_pairs(self, spark):
        """The incremental screen equals the (batch -> corpus) slice of
        the full containment_pairs self-join."""
        from astro_spark.functions import dedup

        quoted = "alpha beta gamma delta epsilon zeta eta theta"
        filler = " ".join(f"w{i} x{i}" for i in range(30))
        docs = spark.createDataFrame(
            [
                (1, quoted),
                (2, f"{filler} {quoted} {filler}"),
                (3, "unrelated content entirely " * 5),
                (7, quoted + " iota kappa"),
            ],
            ["doc_id", "text"],
        )
        batch = docs.where("doc_id in (1, 7)")
        corpus = docs.where("doc_id in (2, 3)")
        incr = {
            (r.batch_id, r.corpus_id): r.containment
            for r in dedup.containment_incremental_pairs(
                batch, corpus, threshold=0.5
            ).collect()
        }
        full = {
            (r.id_a, r.id_b): r.containment
            for r in dedup.containment_pairs(docs, threshold=0.5).collect()
            if r.id_a in (1, 7) and r.id_b in (2, 3)
        }
        assert incr == full
        assert (1, 2) in incr and incr[(1, 2)] == 1.0

    def test_persisted_inverted_index_path(self, spark):
        """Passing the pre-built corpus inverted index (the persisted
        at-scale shape) gives identical results."""
        from pyspark.sql import functions as F

        from astro_spark.functions import dedup
        from astro_spark.functions.dedup import shingle_hash_array

        docs = spark.createDataFrame(
            [(1, "a b c d e f g h"), (2, "x y z " * 10 + "a b c d e f g h")],
            ["doc_id", "text"],
        )
        batch, corpus = docs.where("doc_id = 1"), docs.where("doc_id = 2")
        inv = corpus.select(
            F.col("doc_id").alias("cid"),
            F.explode(shingle_hash_array(F.col("text"))).alias("h"),
        )
        direct = sorted(
            (r.batch_id, r.corpus_id, r.containment)
            for r in dedup.containment_incremental_pairs(
                batch, corpus, threshold=0.5
            ).collect()
        )
        via_index = sorted(
            (r.batch_id, r.corpus_id, r.containment)
            for r in dedup.containment_incremental_pairs(
                batch, corpus, threshold=0.5, corpus_inverted=inv
            ).collect()
        )
        assert direct == via_index and direct[0][2] == 1.0


class TestHtmlToText:
    def test_strips_structure_decodes_entities_normalizes_ws(self, spark):
        """Script/style/comments drop with content, block closers become
        newlines, entities decode (&amp; last so double-encoding stays
        literal), whitespace collapses."""
        html = (
            '<html><head><style>.x{a:b}</style>'
            '<script>var q = 1 < 2 && "x";</script></head>'
            "<body><h1>Title A</h1><p>Hello &amp; goodbye &lt;tag&gt; "
            "&quot;q&quot; &#39;s&nbsp;end &amp;lt;literal&amp;gt;</p>"
            "<div>line<br>break</div><ul><li>one</li><li>two</li></ul>"
            "<!-- hidden --></body></html>"
        )
        df = spark.createDataFrame([(1, html), (2, "plain"), (3, "")], ["i", "h"])
        got = {
            r.i: r.t
            for r in df.select("i", text.html_to_text("h").alias("t")).collect()
        }
        assert got[1] == (
            "Title A\nHello & goodbye <tag> \"q\" 's end &lt;literal&gt;"
            "\nline\nbreak\none\ntwo"
        )
        assert got[2] == "plain" and got[3] == ""

    def test_split_sentences_boundaries_and_gaps(self, spark):
        """Terminal-punctuation runs split; non-terminal text is one
        sentence; empties drop but position indexes stay stable."""
        df = spark.createDataFrame(
            [(1, "A one. B two!  C three?"), (2, "no end"), (3, "")],
            ["doc_id", "text"],
        )
        got = {
            (r.id, r.sent_idx, r.sentence)
            for r in text.split_sentences(df).collect()
        }
        assert got == {
            (1, 0, "A one."), (1, 1, "B two!"), (1, 2, "C three?"),
            (2, 0, "no end"),
        }
