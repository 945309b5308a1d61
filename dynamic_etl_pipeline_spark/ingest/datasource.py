"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource``) for
the reference's text-line format.

The reference ingests .txt by decoding with a charset-detection
cascade and emitting one record per non-empty line (safe_read_text
app.py:34-56, ingest_txt app.py:213-222). ``readers.read_txt`` covers
that via binaryFile + mapInPandas; this module exposes the SAME format
as a first-class source — ``spark.read.format("etl_text").load(path)``
— through Spark 4's Python Data Source API, which is the engine's
user-extensibility answer for formats no JVM reader speaks (§2.11).

Execution model: ``partitions()`` lists files driver-side (metadata
only); each file becomes one InputPartition, and ``read`` runs ON THE
EXECUTORS — so a directory of N files decodes N-way parallel, and at
100 TB parallelism tracks file count exactly like binaryFile. The
decode cascade is shared with readers.read_txt (ingest/encoding.py),
so both paths stay byte-identical.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class EtlTextDataSource(DataSource):
    """``format("etl_text")``: one row per non-empty text line with
    charset-detected decoding.

    Options:
      - ``path`` (or ``.load(path)``): file, directory, or glob
      - ``keepEmpty``: "true" to keep blank lines (default drops them,
        matching app.py:219's ``if line.strip()``)
    """

    @classmethod
    def name(cls) -> str:
        return "etl_text"

    def schema(self) -> str:
        return "path string, line_no bigint, content string"

    def reader(self, schema) -> "EtlTextReader":
        return EtlTextReader(self.options)

    def simpleStreamReader(self, schema) -> "EtlTextStreamReader":
        return EtlTextStreamReader(self.options)


class _FilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class EtlTextReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("etl_text requires a path (use .load(path))")
        self.path = path
        self.keep_empty = str(options.get("keepEmpty", "false")).lower() == "true"

    def partitions(self):
        """One partition per file: driver lists metadata, executors do
        all decoding. Globs and directories both expand here."""
        import glob
        from pathlib import Path

        p = Path(self.path)
        if p.is_dir():
            files = sorted(str(f) for f in p.rglob("*") if f.is_file())
        elif p.exists():
            files = [str(p)]
        else:
            files = sorted(glob.glob(self.path))
        if not files:
            raise FileNotFoundError(f"etl_text: no files match {self.path}")
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition):
        # Executor-side: decode one file with the shared cascade and
        # emit (path, line_no, content) rows.
        from .encoding import decode_bytes

        with open(partition.file_path, "rb") as fh:
            text = decode_bytes(fh.read())
        for i, line in enumerate(text.splitlines()):
            if self.keep_empty or line.strip():
                yield (partition.file_path, i, line)


class EtlTextStreamReader(SimpleDataSourceStreamReader):
    """``spark.readStream.format("etl_text")``: tail a directory of
    text files as micro-batches — the reference's one-shot upload loop
    (app.py:296) turned into a continuous source.

    Offsets are the sorted list of consumed file names, so replays of a
    committed batch re-read exactly the same files (the contract the
    engine's exactly-once sinks build on). New files are discovered by
    set difference per trigger; decoding reuses the same cascade as the
    batch reader.

    Scale note: the Simple reader API decodes on the DRIVER by design —
    right for tailing control/config/upload feeds (this format's actual
    role); a bulk firehose belongs on the partitioned batch reader above
    or the engine's parquet file source (SCALING.md).
    """

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("etl_text requires a path (use .load(path))")
        self.path = path
        self.keep_empty = str(options.get("keepEmpty", "false")).lower() == "true"

    def _list_files(self) -> list[str]:
        from pathlib import Path

        p = Path(self.path)
        if p.is_dir():
            return sorted(str(f) for f in p.rglob("*") if f.is_file())
        import glob

        return sorted(glob.glob(self.path))

    def _read_file(self, file_path: str):
        from .encoding import decode_bytes

        with open(file_path, "rb") as fh:
            text = decode_bytes(fh.read())
        for i, line in enumerate(text.splitlines()):
            if self.keep_empty or line.strip():
                yield (file_path, i, line)

    def initialOffset(self) -> dict:
        return {"files": []}

    def read(self, start: dict):
        seen = set(start.get("files", []))
        files = self._list_files()
        new = [f for f in files if f not in seen]
        rows = [row for f in new for row in self._read_file(f)]
        return iter(rows), {"files": sorted(seen | set(new))}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay of a committed batch: exactly the files
        # added between the two offsets
        seen = set(start.get("files", []))
        rows = [
            row
            for f in end.get("files", [])
            if f not in seen
            for row in self._read_file(f)
        ]
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # offsets are self-describing; nothing external to ack


def register(spark) -> None:
    """Idempotently register the source on a session:
    ``register(spark); spark.read.format("etl_text").load(path)``."""
    spark.dataSource.register(EtlTextDataSource)
