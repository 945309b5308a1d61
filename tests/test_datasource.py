"""Spark 4 Python Data Source: the reference's charset-detected text
format as a first-class `spark.read.format("etl_text")` source
(ingest/datasource.py). Partitioning is per-file; decoding runs
executor-side through the same cascade as readers.read_txt.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamic_etl_pipeline_spark.ingest.datasource import register
from dynamic_etl_pipeline_spark.ingest.readers import read_txt


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    register(spark)


def test_etl_text_source_reads_lines(spark, fixtures_dir):
    df = spark.read.format("etl_text").load(str(fixtures_dir / "notes.txt"))
    rows = df.orderBy("line_no").collect()
    assert len(rows) == 5  # 8 physical lines, 3 blank (app.py:219 filter)
    assert rows[0]["content"].startswith("Meeting notes")
    # line_no is the PHYSICAL file line index (blank lines counted)
    assert [r["line_no"] for r in rows] == [0, 2, 3, 5, 7]


def test_etl_text_source_charset_fallback(spark, fixtures_dir):
    df = spark.read.format("etl_text").load(
        str(fixtures_dir / "notes_latin1.txt")
    )
    contents = [r["content"] for r in df.orderBy("line_no").collect()]
    assert contents[0].startswith("Café résumé")
    assert any("münchen" in c for c in contents)


def test_etl_text_source_matches_read_txt_contents(spark, fixtures_dir):
    """Same decode cascade -> same content multiset as the binaryFile
    reader path."""
    via_source = spark.read.format("etl_text").load(
        str(fixtures_dir / "notes_latin1.txt")
    )
    via_reader = read_txt(spark, str(fixtures_dir / "notes_latin1.txt"))
    assert sorted(r["content"] for r in via_source.collect()) == \
        sorted(r["content"] for r in via_reader.collect())


def test_etl_text_source_directory_is_per_file_parallel(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"f{i}.txt").write_text(f"alpha {i}\n\nbeta {i}\n")
    df = spark.read.format("etl_text").load(str(tmp_path))
    assert df.count() == 6  # blanks dropped
    # one input partition per file
    assert df.rdd.getNumPartitions() == 3
    per_file = df.groupBy("path").count().collect()
    assert all(r["count"] == 2 for r in per_file)


def test_etl_text_source_keep_empty_option(spark, fixtures_dir):
    df = spark.read.format("etl_text").option("keepEmpty", "true").load(
        str(fixtures_dir / "notes.txt")
    )
    assert df.count() == 8
    assert df.filter(F.length(F.trim("content")) == 0).count() == 3


def test_etl_text_source_missing_path_errors(spark, tmp_path):
    with pytest.raises(Exception, match="no files match"):
        spark.read.format("etl_text").load(str(tmp_path / "nope-*.txt")).count()


def test_etl_text_stream_reads_files_as_microbatches(spark, tmp_path):
    """Streaming flavor: files appearing in a directory become
    micro-batches; a second availableNow run from the same checkpoint
    picks up only NEW files (offset = consumed file set)."""
    src = tmp_path / "incoming"
    src.mkdir()
    (src / "a.txt").write_text("one\n\ntwo\n")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("etl_text").load(str(src))
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return {
            (r["path"], r["line_no"], r["content"])
            for r in spark.read.parquet(out).collect()
        }

    got1 = drain()
    assert {c for _, _, c in got1} == {"one", "two"}

    (src / "b.txt").write_text("three\n")
    got2 = drain()
    assert {c for _, _, c in got2} == {"one", "two", "three"}
    # file a was NOT re-read: line counts stay 2 + 1
    assert len(got2) == 3
