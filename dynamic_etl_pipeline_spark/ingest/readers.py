"""Multi-format ingestion (SURVEY §2.1): the reference's six readers
(app.py:178-222) re-built Spark-first.

Structure for every non-native format: ``binaryFile`` scan (file
metadata pushdown: pathGlobFilter/modifiedAfter run *before* any
Python) -> Arrow-batched ``mapInPandas`` extraction -> relational ops.
Filters can't push through an opaque Python UDF, so file-level
filtering always happens at the scan (SURVEY §4).

PDF/DOCX parsing libraries (pypdf, python-docx) are optional: the Spark
plumbing (schema, batching, explode semantics) is identical either way,
and tests inject deterministic fake extractors. Without a library and
without an injected extractor, the reader raises at call time with a
clear message.

Record shapes mirror the reference exactly:
- CSV/JSON: one row per record, inferred columns (app.py:178-183)
- PDF: {path, page_no, content} one row per page (app.py:186-192)
- DOCX: {path, para_no, content} one row per non-empty paragraph (app.py:195-198)
- XML: one row per child of root: attributes map + _text (app.py:201-210)
- TXT: {path, line_no, content} one row per non-empty line with
  encoding-tolerant decode (app.py:213-222, 34-56)
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .encoding import decode_bytes
from ..materialize import materialize

BINARY_SCHEMA_HINT = "path string, content binary"


def _binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path).select("path", "content")


# --------------------------------------------------------------------------
# Native-format readers
# --------------------------------------------------------------------------

def read_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    """CSV with header + schema inference (reference: pd.read_csv ->
    dicts, app.py:178-179). Spark's inference keeps real types instead
    of the reference's all-string coercion; pass inferSchema=False for
    string-compat mode."""
    opts = {"header": True, "inferSchema": True, **options}
    return spark.read.options(**opts).csv(path)


def read_json(spark: SparkSession, path: str, **options) -> DataFrame:
    """JSON/JSONL (reference: json.load, app.py:182-183). multiLine
    handles whole-file arrays; default path handles JSONL."""
    df = spark.read.options(**options).json(path)
    if "_corrupt_record" in df.columns:
        # Line-mode parse tripped: likely a whole-file JSON array rather
        # than JSONL. Prefer the multiLine parse if it comes back clean.
        multi = spark.read.options(**{**options, "multiLine": True}).json(path)
        if "_corrupt_record" not in multi.columns:
            return multi
    return df


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC (columnar sibling of parquet, built into Spark): same
    vectorized reader, predicate pushdown, and column pruning as the
    parquet path — interchange format for Hive-era lakes."""
    return spark.read.orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro (row-oriented interchange). The spark-avro module is a
    separate jar not shipped in this environment; the reader degrades
    with a clear message instead of a classpath stack trace."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:
        # Only translate the missing-data-source failure; a real error
        # (bad path, corrupt file) must surface as itself, not as a
        # false "package missing" diagnosis.
        if "failed to find" in str(exc).lower() and "avro" in str(exc).lower():
            raise NotImplementedError(
                "Avro needs the spark-avro package "
                "(org.apache.spark:spark-avro); add it via spark.jars.packages"
            ) from exc
        raise


# --------------------------------------------------------------------------
# Text with encoding tolerance
# --------------------------------------------------------------------------

def read_txt(spark: SparkSession, path: str, encoding: str | None = None,
             keep_empty: bool = False) -> DataFrame:
    """One row per non-empty line (app.py:213-222).

    With a known encoding, uses the native ``spark.read.text`` (fully
    JVM, splittable, zero Python). With ``encoding=None``, routes
    through binaryFile + an Arrow-batched decode that mirrors
    safe_read_text's utf-8 -> detect -> ascii cascade (app.py:34-56).
    """
    if encoding is not None:
        from pyspark.sql import Window

        raw = spark.read.option("lineSep", "\n").option("encoding", encoding).text(path)
        w = Window.partitionBy("path").orderBy("read_order")
        df = (
            raw.select(
                F.input_file_name().alias("path"),
                F.monotonically_increasing_id().alias("read_order"),
                F.col("value").alias("content"),
            )
            .withColumn("line_no", F.row_number().over(w).cast("long") - 1)
            .select("path", "line_no", "content")
        )
    else:
        out_schema = T.StructType([
            T.StructField("path", T.StringType()),
            T.StructField("line_no", T.LongType()),
            T.StructField("content", T.StringType()),
        ])

        def decode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for p, raw in zip(pdf["path"], pdf["content"]):
                    for i, line in enumerate(decode_bytes(bytes(raw)).splitlines()):
                        rows.append((p, i, line))
                yield pd.DataFrame(rows, columns=["path", "line_no", "content"])

        df = _binary_files(spark, path).mapInPandas(decode_partition, out_schema)
    if not keep_empty:
        df = df.filter(F.length(F.trim("content")) > 0)
    return df


# --------------------------------------------------------------------------
# Document formats (pluggable extractors)
# --------------------------------------------------------------------------

def _default_pdf_extractor(raw: bytes) -> list[str]:
    """Page-by-page text, parity with app.py:184-191 (PyPDF2 reader).

    Uses pypdf/PyPDF2 when installed; otherwise the vendored pure-Python
    parser (``ingest/pdftext.py`` — public PDF format, stdlib only), so
    ``read_pdf`` runs end-to-end with no third-party dependency."""
    try:
        from io import BytesIO

        try:
            from pypdf import PdfReader  # type: ignore
        except ImportError:
            from PyPDF2 import PdfReader  # type: ignore
        return [page.extract_text() or "" for page in PdfReader(BytesIO(raw)).pages]
    except ImportError:
        from .pdftext import extract_pdf_pages

        return extract_pdf_pages(raw)


def _default_docx_extractor(raw: bytes) -> list[str]:
    """Paragraph texts, parity with app.py:194-197 (python-docx).

    Uses python-docx when installed; otherwise the vendored stdlib
    zipfile+ElementTree parser (``ingest/docxtext.py``)."""
    try:
        from io import BytesIO

        import docx  # type: ignore
        return [p.text for p in docx.Document(BytesIO(raw)).paragraphs]
    except ImportError:
        from .docxtext import extract_docx_paragraphs

        return extract_docx_paragraphs(raw)


def _chunked_reader(unit_col: str,
                    default_extractor: Callable[[bytes], list[str]]):
    """Build a binaryFile -> mapInPandas reader that explodes a file into
    text chunks (PDF pages / DOCX paragraphs). One shape, two formats."""

    def reader(spark: SparkSession, path: str,
               extractor: Callable[[bytes], list[str]] | None = None,
               glob: str | None = None, keep_empty: bool = False) -> DataFrame:
        extract = extractor or default_extractor
        out_schema = T.StructType([
            T.StructField("path", T.StringType()),
            T.StructField(unit_col, T.IntegerType()),
            T.StructField("content", T.StringType()),
        ])

        def explode_chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for p, raw in zip(pdf["path"], pdf["content"]):
                    for i, chunk in enumerate(extract(bytes(raw))):
                        rows.append((p, i, chunk))
                yield pd.DataFrame(rows, columns=["path", unit_col, "content"])

        df = _binary_files(spark, path, glob).mapInPandas(explode_chunks, out_schema)
        if not keep_empty:
            # Reference keeps all pages but only non-empty paragraphs
            # (app.py:189-192 vs 197); callers pass keep_empty=True for pages.
            df = df.filter(F.length(F.trim("content")) > 0)
        return df

    return reader


read_pdf = _chunked_reader("page_no", _default_pdf_extractor)
read_pdf.__doc__ = """PDF -> one row per page (app.py:186-192).
binaryFile scan -> Arrow-batched extraction -> {path, page_no, content}."""

read_docx = _chunked_reader("para_no", _default_docx_extractor)
read_docx.__doc__ = """DOCX -> one row per non-empty paragraph (app.py:195-198)."""


# --------------------------------------------------------------------------
# XML
# --------------------------------------------------------------------------

def read_xml(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """XML -> one row per child of the root element, with the child's
    attributes as a map plus its stripped text as _text (app.py:201-210).

    stdlib ElementTree inside an Arrow-batched mapInPandas (Spark 4's
    native `format("xml")` targets rowTag-homogeneous documents; the
    reference's attrs-of-any-child semantic needs the map form). Use
    ``promote_xml_attrs`` to lift map keys into real columns.
    """
    out_schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("child_no", T.IntegerType()),
        T.StructField("tag", T.StringType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("_text", T.StringType()),
    ])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        for pdf in batches:
            rows = []
            for p, raw in zip(pdf["path"], pdf["content"]):
                root = ET.fromstring(decode_bytes(bytes(raw)))
                for i, child in enumerate(root):
                    rows.append((
                        p, i, child.tag, dict(child.attrib),
                        (child.text or "").strip(),
                    ))
            yield pd.DataFrame(
                rows, columns=["path", "child_no", "tag", "attrs", "_text"]
            )

    return _binary_files(spark, path, glob).mapInPandas(parse, out_schema)


def promote_xml_attrs(df: DataFrame) -> DataFrame:
    """Lift the attrs map into top-level columns (reference parity:
    ``{**child.attrib, "_text": ...}``). Key discovery is one tiny
    aggregate over distinct map keys, then a static projection."""
    keys_row = df.select(
        F.array_distinct(F.flatten(F.collect_list(F.map_keys("attrs")))).alias("ks")
    ).first()
    keys = sorted(keys_row["ks"] or [])
    return df.select(
        "path", "child_no", "tag",
        *[F.col("attrs").getItem(k).alias(k) for k in keys],
        "_text",
    )


# --------------------------------------------------------------------------
# Dispatch
# --------------------------------------------------------------------------

_READERS: dict[str, Callable[..., DataFrame]] = {
    ".csv": read_csv,
    ".json": read_json,
    ".jsonl": read_json,
    ".parquet": read_parquet,
    ".orc": read_orc,
    ".avro": read_avro,
    ".pdf": read_pdf,
    ".docx": read_docx,
    ".xml": read_xml,
    ".txt": read_txt,
}


def read_any(spark: SparkSession, path: str, format: str | None = None,
             on_error: str = "raise", **kwargs) -> DataFrame:
    """Suffix-dispatched facade (reference app.py:298-315). ``format``
    overrides the suffix for extensionless paths (e.g. a directory of
    part files).

    ``on_error="record"`` reproduces the reference's ingest-failure
    fallback (app.py:220-222, 55-56): instead of raising, a failed read
    yields one record ``{"content": "", "_ingest_error": str(e)}`` so
    the pipeline keeps a queryable trace of the bad upload. The read is
    materialized eagerly in this mode (localCheckpoint) so lazy
    executor-side parse errors are caught too — the right trade for
    upload-sized batches, not for bulk scans (default stays "raise").
    """
    if on_error not in ("raise", "record"):
        raise ValueError(f"on_error must be raise|record, got {on_error!r}")
    suffix = f".{format.lstrip('.')}" if format else Path(path).suffix.lower()
    try:
        reader = _READERS[suffix]
    except KeyError as exc:
        raise ValueError(
            f"Unsupported file format: {suffix} (supported: {sorted(_READERS)})"
        ) from exc
    if on_error == "record":
        try:
            return reader(spark, path, **kwargs).transform(materialize)
        except Exception as exc:  # noqa: BLE001 - fallback is the contract
            return spark.createDataFrame(
                [("", str(exc)[:500])],
                "content string, _ingest_error string",
            )
    return reader(spark, path, **kwargs)
