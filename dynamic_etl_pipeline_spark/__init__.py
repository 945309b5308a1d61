"""dynamic-etl-pipeline-spark: a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference `ashnasiddiqui1/dynamic-etl-pipeline` (a single-process,
row-at-a-time dynamic ETL pipeline, see /root/reference/app.py), widened
to a full relational + LLM-data-pipeline surface:

- multi-format ingestion with dynamic schema inference, schema
  versioning/evolution and data-quality validation (the reference's
  core loop, app.py:296-366, re-built on DataFrames),
- a complete relational query surface (joins, aggregations, windows,
  set ops, rollup/cube/pivot, sorts/top-k) delegated to Catalyst,
- LLM-data-pipeline operators: exact/near dedup (MinHash-LSH, SimHash,
  n-gram Jaccard), embedding similarity search, text analysis,
  multimodal binary-column plumbing,
- Structured Streaming for event windowing.

Everything is DataFrame-first: logical plans are declared via the
DataFrame/SQL API and optimized by Catalyst/Tungsten; Python UDFs are
used only where a JVM builtin genuinely cannot express the semantics
(and then always Arrow-vectorized).
"""

__version__ = "0.1.0"

from .session import get_spark, tune  # noqa: F401
from .catalog import load_tables, register_views, TABLES  # noqa: F401
from .pipeline import ConcurrentWriteError, EtlPipeline, IngestReport  # noqa: F401
