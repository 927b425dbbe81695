"""End-to-end training-data pipeline: the library's operators composed
the way a 100 TB corpus build actually chains them —

    load → normalize → exact-dedup → near-dup canonicalization →
    quality score → per-group percentile carve → stratified sample →
    sequence packing → export → re-read

Every stage is one of the oracle-checked operators; this test pins that
they COMPOSE (schemas line up, invariants survive each hand-off), which
no per-operator test shows.  Runs at sf0.001 in one Spark session.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import astro_spark as a
from astro_spark.testdata import read_table


def test_training_data_pipeline_end_to_end(spark, sf_dir, tmp_path):
    from astro_spark.functions.dedup import (
        dup_clusters,
        exact_dedup,
        minhash_lsh_pairs,
    )
    from astro_spark.functions.sampling import (
        pack_sequences,
        percentile_filter,
        sample_exact_n_by,
    )
    from astro_spark.functions.text import normalize_text, token_count

    docs = read_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. normalize, then EXACT dedup on the normalized text
    #    (exact_dedup keeps the representative's id/text/dup_count —
    #    attributes rejoin by id)
    norm = docs.withColumn("text", normalize_text(F.col("text")))
    uniq = exact_dedup(norm, text_col="text", id_col="doc_id").join(
        norm.select("doc_id", "lang"), "doc_id"
    )
    n_uniq = uniq.count()
    assert 0 < n_uniq <= n_raw

    # 2. near-dup canonicalization: MinHash/LSH pairs → connected
    #    clusters → keep each cluster's min-id representative
    pairs = minhash_lsh_pairs(uniq)
    clusters = dup_clusters(pairs, uniq.select("doc_id"), id_col="doc_id")
    keep = clusters.where(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    canon = uniq.join(keep, "doc_id")
    n_canon = canon.count()
    assert 0 < n_canon <= n_uniq

    # 3. quality score (type-token ratio pmille) + per-lang median carve
    scored = canon.withColumn(
        "score",
        F.expr(
            "CAST((1000 * size(array_distinct(split(trim(text), '\\\\s+')))) "
            "DIV size(split(trim(text), '\\\\s+')) AS BIGINT)"
        ),
    )
    carved = percentile_filter(scored, "score", q_pmille=500, group_col="lang")
    n_carved = carved.count()
    assert 0 < n_carved <= n_canon
    # every lang's carve is non-empty (ties keep at least the threshold row)
    langs_all = {r.lang for r in canon.select("lang").distinct().collect()}
    langs_kept = {r.lang for r in carved.select("lang").distinct().collect()}
    assert langs_kept == langs_all

    # 4. stratified eval carve: exact 5 per language (or the whole group)
    eval_set = sample_exact_n_by(carved, "lang", 5, id_col="doc_id")
    sizes = {
        r.lang: r.n
        for r in eval_set.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(n <= 5 for n in sizes.values()) and sizes

    # 5. training split = carved minus eval ids; offset-pack the token
    #    stream into 512-token packs (docs keep id order; each doc gets
    #    the pack holding its start offset)
    train = carved.join(eval_set.select("doc_id"), "doc_id", "left_anti")
    packed = pack_sequences(train, budget=512)
    assert packed.count() == train.count()  # every doc placed exactly once
    assert packed.where(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= 512)
    ).count() == 0
    # the packing is the prefix-sum of token counts: total tokens agree
    total_tokens = train.select(
        F.sum(token_count(F.col("text")).cast("long")).alias("t")
    ).collect()[0].t
    assert packed.agg(F.sum("n_tokens")).collect()[0][0] == total_tokens

    # 6. export the packed manifest through the operator layer, re-read
    t = a.Table("pipeline_manifest", temp=False)
    a.load_file(  # noqa: F841 — exercised for the shell path
        spark,
        f"{sf_dir}/documents.parquet",
        output_table=a.Table("pipeline_docs_raw", temp=False),
    )
    out_dir = str(tmp_path / "manifest")
    from astro_spark.operators.load_file import save_dataframe_as_table

    save_dataframe_as_table(packed, t)
    a.export_to_file(spark, spark.table(t.name), f"{out_dir}/packed.parquet")
    reread = spark.read.parquet(f"{out_dir}/packed.parquet")
    assert reread.count() == packed.count()
    assert set(reread.columns) == set(packed.columns)
