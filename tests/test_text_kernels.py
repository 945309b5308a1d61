"""r10: the winnowing fingerprint's Arrow kernel must be bit-identical
to the retained HOF expression form (split+ascii char codes, mod-space
polynomial fold, window min, distinct) — same contract as the kmeans
Arrow assignment kernel's parity pin. Driven over the real documents
fixture AND a synthetic frame with hostile content: non-ASCII, an
astral-plane (non-BMP) character, boundary lengths at exactly
k + w - 1, and repeated text (identical fingerprint sets)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_etl_pipeline_spark.queries.text import doc_winnow_fingerprint


def _rows(df):
    return sorted((r["doc_id"], r["fp"]) for r in df.collect())


def test_winnow_arrow_kernel_matches_hof_on_fixture(spark, sf_dir):
    a = doc_winnow_fingerprint(spark, sf_dir, arrow=True)
    h = doc_winnow_fingerprint(spark, sf_dir, arrow=False)
    assert _rows(a) == _rows(h)


def test_winnow_arrow_kernel_matches_hof_on_hostile_text(spark, tmp_path):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "café déjà-vu naïve façade ü ö ß"),      # non-ASCII BMP
        (3, "emoji \U0001f600 inside \U0001f680 text"),  # astral plane
        (4, "abcdefgh"),                               # exactly k + w - 1
        (5, "aaaaaaaaaaaaaaaaaaaa"),                   # degenerate repeat
        (6, "the quick brown fox jumps over the lazy dog"),  # dup of 1
    ]
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .withColumn("n_chars", F.length("text")) \
        .coalesce(1).write.parquet(p)
    # load_table reads f"{sf_dir}/documents.parquet"
    sf = str(tmp_path)
    a = doc_winnow_fingerprint(spark, sf, arrow=True)
    h = doc_winnow_fingerprint(spark, sf, arrow=False)
    ra, rh = _rows(a), _rows(h)
    assert ra == rh
    # dup docs share the full fingerprint set (the winnow guarantee)
    fp1 = {fp for d, fp in ra if d == 1}
    fp6 = {fp for d, fp in ra if d == 6}
    assert fp1 and fp1 == fp6
