"""Property tests for the training-data prep operators
(queries/training.py) — the invariants that make them safe to run on a
real corpus, beyond the oracle's value parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_etl_pipeline_spark.catalog import load_table
from dynamic_etl_pipeline_spark.queries import QUERIES


def test_split_is_total_and_content_stable(spark, sf_dir):
    split = QUERIES["doc_stable_split"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    # total: every doc assigned exactly once
    assert split.count() == docs.count()
    assert split.select("doc_id").distinct().count() == docs.count()
    # stable: re-evaluating under a different partitioning agrees
    again = (
        QUERIES["doc_stable_split"](spark, sf_dir).repartition(13)
        .withColumnRenamed("split", "split2").select("doc_id", "split2")
    )
    joined = split.join(again, "doc_id")
    assert joined.filter(F.col("split") != F.col("split2")).count() == 0
    # all three splits nonempty at fixture scale
    got = {r["split"] for r in split.select("split").distinct().collect()}
    assert got == {"train", "val", "test"}


def test_chunks_cover_every_token_in_order(spark, sf_dir):
    chunks = QUERIES["doc_chunk_windows"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    # stride 30 / window 40: dropping the 10-token overlap from every
    # chunk after the first must reconstruct the document exactly
    rebuilt = (
        chunks.withColumn(
            "body",
            F.when(F.col("chunk_id") == 0, F.split("chunk_text", " ")).otherwise(
                F.expr("slice(split(chunk_text, ' '), 11, 30)")
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_id", "body"))),
                    lambda s: s["body"],
                )
            ).alias("rebuilt")
        )
    )
    mismatch = (
        docs.join(rebuilt, "doc_id")
        .filter(F.col("rebuilt") != F.split("text", " "))
        .count()
    )
    assert mismatch == 0


def test_mixture_respects_rates_and_copies(spark, sf_dir):
    mix = QUERIES["corpus_mixture_weighted"](spark, sf_dir).cache()
    # src0 rows come in pairs (2x upsample), all others single
    per_copy = mix.groupBy("doc_id", "source").agg(F.count("*").alias("n"))
    assert per_copy.filter(
        (F.col("source") == "src0") & (F.col("n") != 2)
    ).count() == 0
    assert per_copy.filter(
        (F.col("source") != "src0") & (F.col("n") != 1)
    ).count() == 0
    # downsampled sources keep roughly their configured fraction
    docs = load_table(spark, sf_dir, "documents")
    kept = dict(
        per_copy.groupBy("source").count().collect()
    )
    totals = dict(docs.groupBy("source").count().collect())
    lowband = [s for s in totals if s not in
               {"src0", "src1", "src2", "src3", "src4",
                "src5", "src6", "src7", "src8", "src9"}]
    kept_low = sum(kept.get(s, 0) for s in lowband)
    total_low = sum(totals[s] for s in lowband)
    assert 0.1 < kept_low / total_low < 0.45  # target 4/16 = 0.25
    mix.unpersist()


def test_shards_are_dense_rankings(spark, sf_dir):
    shards = QUERIES["corpus_shuffle_shards"](spark, sf_dir).cache()
    docs = load_table(spark, sf_dir, "documents")
    assert shards.count() == docs.count()
    # positions within each shard are exactly 1..n (dense, no gaps)
    bad = (
        shards.groupBy("shard")
        .agg(F.count("*").alias("n"), F.max("pos").alias("mx"),
             F.min("pos").alias("mn"),
             F.countDistinct("pos").alias("nd"))
        .filter(~((F.col("mx") == F.col("n")) & (F.col("mn") == 1)
                  & (F.col("nd") == F.col("n"))))
        .count()
    )
    assert bad == 0
    shards.unpersist()


def test_packing_conserves_tokens_and_fills_bins(spark, sf_dir):
    packed = QUERIES["corpus_pack_sequences"](spark, sf_dir).cache()
    docs = load_table(spark, sf_dir, "documents")
    # conservation: each doc's contributions sum to its token count
    per_doc = packed.groupBy("doc_id").agg(
        F.sum("tokens_in_bin").alias("packed")
    )
    sizes = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    diff = per_doc.join(sizes, "doc_id").filter(
        F.col("packed") != F.col("n_tokens")
    )
    assert diff.count() == 0
    assert per_doc.count() == docs.count()
    # every bin except the highest-numbered holds exactly 512 tokens
    per_bin = packed.groupBy("bin_id").agg(F.sum("tokens_in_bin").alias("t"))
    max_bin = per_bin.agg(F.max("bin_id")).first()[0]
    short = per_bin.filter((F.col("bin_id") < max_bin) & (F.col("t") != 512))
    assert short.count() == 0
    packed.unpersist()


def test_decontaminate_flags_only_test_split_docs(spark, sf_dir):
    flagged = QUERIES["corpus_decontaminate"](spark, sf_dir)
    split = QUERIES["doc_stable_split"](spark, sf_dir)
    joined = flagged.join(split, "doc_id")
    assert joined.filter(F.col("split") != "test").count() == 0
    # scores are positive counts
    assert flagged.filter(F.col("n_shared_shingles") <= 0).count() == 0


def test_dsir_weights_separate_target_domain(spark, sf_dir):
    """Importance weights must rank the target ('en') slice above the
    rest on average — the whole point of DSIR selection."""
    from pyspark.sql import functions as F

    from dynamic_etl_pipeline_spark.queries import QUERIES

    w = QUERIES["corpus_dsir_weights"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    rows = (
        w.join(docs, "doc_id")
        .groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("log_weight").alias("avg_lw"))
        .collect()
    )
    avg = {r["is_en"]: r["avg_lw"] for r in rows}
    assert avg[True] > avg[False]


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    """A-ES with weight=n_chars must oversample long docs: the sampled
    mean length exceeds the corpus mean, and reruns are identical."""
    from pyspark.sql import functions as F

    from dynamic_etl_pipeline_spark.queries import QUERIES

    s = QUERIES["corpus_weighted_sample"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = s.agg(F.avg("weight")).first()[0]
    assert sample_mean > corpus_mean
    ids1 = [r["doc_id"] for r in s.collect()]
    ids2 = [r["doc_id"] for r in QUERIES["corpus_weighted_sample"](
        spark, sf_dir).collect()]
    assert ids1 == ids2


def test_cms_estimate_upper_bounds_truth(spark, sf_dir):
    """Count-min can only overcount: estimate >= true for every word."""
    from dynamic_etl_pipeline_spark.queries import QUERIES

    rows = QUERIES["word_count_min_sketch"](spark, sf_dir).collect()
    assert rows
    assert all(r["cms_estimate"] >= r["true_count"] for r in rows)


def test_bpe_pairs_match_python_reference(spark, sf_dir):
    """Spark pair counts == a straightforward Python BPE count on the
    same corpus (top rows compared)."""
    import collections

    from dynamic_etl_pipeline_spark.queries import QUERIES

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    freq = collections.Counter()
    for r in docs:
        for w in r["text"].split(" "):
            if len(w) >= 2:
                freq[w] += 1
    pairs = collections.Counter()
    for w, f_ in freq.items():
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] += f_
    got = QUERIES["bpe_merge_pairs"](spark, sf_dir).collect()
    for r in got:
        assert pairs[(r["left_sym"], r["right_sym"])] == r["pair_count"]
    # the argmax merge agrees
    top = got[0]
    assert pairs[(top["left_sym"], top["right_sym"])] == max(pairs.values())
