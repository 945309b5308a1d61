"""Regressions for the round-1 advisor findings (ADVICE.md):

- doc_winnow_fingerprint / corpus_decontaminate crashed on documents
  shorter than one shingle/window (Spark `sequence(1, n)` is DESCENDING
  for n < 1, so the downstream slice(…, 0, …) threw at runtime, while
  the DuckDB oracle's range()/generate_series() just emit no rows);
- simhash64 crashed on NULL/empty text while the MinHash kernel
  null-guards;
- salted_join silently produced wrong results for build-side-preserving
  join types (each unmatched build row replicated per salt).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dynamic_etl_pipeline_spark.operators.dedup import simhash64, simhash_pairs
from dynamic_etl_pipeline_spark.operators.skew import salted_join
from dynamic_etl_pipeline_spark.queries.text import doc_winnow_fingerprint
from dynamic_etl_pipeline_spark.queries.training import corpus_decontaminate

_DOC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])


@pytest.fixture(scope="module")
def short_doc_dir(spark, tmp_path_factory):
    """A documents table containing every degenerate length class."""
    rows = [
        (1, "hi"),                      # shorter than one k-gram
        (2, ""),                        # empty
        (3, None),                      # NULL
        (4, "seven77"),                 # exactly k+w-2: still no window
        (5, "one two three four"),      # < 5 tokens: no 5-gram shingle
        (6, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (7, "alpha beta gamma delta epsilon different tail tokens here now"),
    ]
    d = tmp_path_factory.mktemp("shortdocs")
    spark.createDataFrame(rows, _DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    return str(d)


def test_winnow_fingerprint_survives_short_docs(spark, short_doc_dir):
    out = doc_winnow_fingerprint(spark, short_doc_dir).collect()
    got_ids = {r["doc_id"] for r in out}
    # degenerate docs contribute nothing (matching the oracle), long docs do
    assert got_ids.issubset({5, 6, 7}) and {6, 7} <= got_ids
    assert all(r["fp"] is not None for r in out)


def test_decontaminate_survives_short_docs(spark, short_doc_dir):
    # must not throw; docs with < 5 tokens contribute no shingles
    out = corpus_decontaminate(spark, short_doc_dir).collect()
    assert all(r["doc_id"] not in {1, 2, 3, 4, 5} for r in out)


def test_simhash_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "the quick brown fox"),
         (5, "the quick brown fox")],
        _DOC_SCHEMA,
    )
    fps = df.select("doc_id", simhash64("text").alias("fp")).collect()
    by_id = {r["doc_id"]: r["fp"] for r in fps}
    assert by_id[1] is None and by_id[2] is None
    assert by_id[4] == by_id[5] is not None
    # pair mining skips the null-fingerprint docs instead of crashing
    pairs = simhash_pairs(df, "doc_id", "text", max_hamming=0).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(4, 5)}


def test_salted_join_rejects_build_preserving_types(spark):
    left = spark.createDataFrame([("a", 1)], ["k", "v"])
    right = spark.createDataFrame([("a", 1.0), ("b", 2.0)], ["k", "w"])
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, "k", how=how)
    # probe-preserving types still work
    assert salted_join(left, right, "k", how="left_anti").count() == 0


def test_cdc_chunks_reassemble_exactly(spark, sf_dir):
    from dynamic_etl_pipeline_spark.queries.text import doc_cdc_chunks

    chunks = doc_cdc_chunks(spark, sf_dir)
    per_doc = {
        r["doc_id"]: r["total"]
        for r in chunks.groupBy("doc_id")
        .agg(F.sum("chunk_len").alias("total")).collect()
    }
    docs = {
        r["doc_id"]: len(r["text"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 100 AND length(text) >= 5").collect()
    }
    assert per_doc == docs  # chunks partition every doc exactly


def test_cdc_edit_locality(spark, tmp_path):
    """An insertion must invalidate only the chunks overlapping the
    edit — the property that makes CDC robust where fixed blocks
    are not."""
    from dynamic_etl_pipeline_spark.queries.text import doc_cdc_chunks

    import random

    # non-repeating text: repeated phrases would collapse the md5 sets
    # and hide (or fake) locality
    rng = random.Random(7)
    base = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                for _ in range(rng.randint(3, 9)))
        for _ in range(120)
    )
    edited = base[:250] + "XYZ" + base[250:]
    spark.createDataFrame(
        [(1, base), (2, edited)], ["doc_id", "text"]
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = doc_cdc_chunks(spark, str(tmp_path)).collect()
    a = [r["chunk_md5"] for r in rows if r["doc_id"] == 1]
    b = [r["chunk_md5"] for r in rows if r["doc_id"] == 2]
    # every chunk except the edited one (and at most its neighbor)
    # survives the insertion; boundaries re-synchronize after the edit
    assert len(a) > 4
    assert len(set(a) - set(b)) <= 2 and len(set(b) - set(a)) <= 2


def test_minhash_kernel_short_final_doc(spark):
    """A 1-2-token doc at the END of an Arrow batch used to push the
    boundary-cross indices past the gram array (IndexError)."""
    from dynamic_etl_pipeline_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(1, "a reasonably long document with many words in it"),
         (2, "tiny")],
        ["doc_id", "text"],
    ).coalesce(1)
    sigs = {r["doc_id"] for r in
            minhash_signatures(df, "doc_id", "text", udf_partitions=1).collect()}
    assert sigs == {1}  # short doc has no shingles -> dropped, no crash


def test_merge_null_keys_classified_by_presence(spark):
    from dynamic_etl_pipeline_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(None, "t-null"), (1, "t1")], "k int, v string")
    source = spark.createDataFrame([(None, "s-null"), (1, "s1")], "k int, v string")
    # NULL keys never equi-match: target NULL-key row is carried, source
    # NULL-key row inserts WITH ITS OWN values
    key = lambda t: (t[0] is not None, t[0] or 0, t[1])
    got = sorted(((r["k"], r["v"]) for r in
                  merge_upsert(target, source, ["k"]).collect()), key=key)
    assert got == [(None, "s-null"), (None, "t-null"), (1, "s1")]
    # insert=False must still carry the NULL-key target row
    kept = sorted(((r["k"], r["v"]) for r in
                   merge_upsert(target, source, ["k"], insert=False).collect()),
                  key=key)
    assert kept == [(None, "t-null"), (1, "s1")]


def test_upsert_swap_crash_recovery(spark, tmp_path):
    import shutil
    from pathlib import Path

    from dynamic_etl_pipeline_spark.pipeline import EtlPipeline

    store_dir = str(tmp_path / "crash_store")
    pipe = EtlPipeline(spark, store_dir)
    pipe.upsert(df=spark.createDataFrame([("k1", "v1")], ["rec_id", "content"]),
                keys=["rec_id"])
    records = Path(pipe.records_path)

    # (a) crash between the two renames: store moved to .old, committed
    # staging present -> recovery must roll FORWARD to the staging state
    tmp = records.with_name("records.upserting")
    shutil.copytree(records, tmp)  # committed merge result (has _SUCCESS)
    records.rename(records.with_name("records.old"))
    assert {r["rec_id"] for r in pipe.records().collect()} == {"k1"}
    assert records.exists() and not tmp.exists()

    # (b) crash mid-staging-write: uncommitted staging + store renamed
    # away -> recovery must roll BACK to the old store
    tmp.mkdir()
    (tmp / "part-0.parquet").write_bytes(b"garbage")  # no _SUCCESS
    records.rename(records.with_name("records.old"))
    assert {r["rec_id"] for r in pipe.records().collect()} == {"k1"}
    assert not tmp.exists() and not records.with_name("records.old").exists()


# ---------------------------------------------------------------------------
# Round-2 advisor findings (ADVICE.md r2)
# ---------------------------------------------------------------------------

def test_window_ignore_nulls_null_event_type(spark, tmp_path):
    """NULL event_type must KEEP its value (oracle CASE semantics), not
    be blanked by inverted 3VL in when(type != 'error', value)."""
    import shutil

    from dynamic_etl_pipeline_spark.queries import QUERIES

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "sfnull")
    shutil.copytree(src, d)
    # inject NULL event_type rows with known values
    ev = spark.read.parquet(f"{src}/events.parquet")
    ev = ev.withColumn(
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("event_type")
        ),
    )
    ev.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")

    got = QUERIES["window_ignore_nulls"](spark, d)
    null_rows = (
        spark.read.parquet(f"{d}/events.parquet")
        .filter(F.col("event_type").isNull())
        .select("event_id", "value")
    )
    joined = got.join(null_rows, "event_id").collect()
    assert joined, "fixture injection produced no NULL event_type rows"
    for r in joined:
        assert r["val"] == r["value"], (
            f"event {r['event_id']}: NULL event_type blanked the value"
        )


def test_unpivot_include_nulls_matches_union_all(spark, sf_dir):
    """sql_unpivot_facade must keep NULL measures like the oracle's
    UNION ALL does (UNPIVOT excludes them by default)."""
    from dynamic_etl_pipeline_spark.catalog import load_table
    from dynamic_etl_pipeline_spark.queries import QUERIES

    n_orders = load_table(spark, sf_dir, "orders").count()
    out = QUERIES["sql_unpivot_facade"](spark, sf_dir)
    # every order yields exactly two rows regardless of measure nullity
    assert out.count() == 2 * n_orders
    # and a synthetic NULL measure survives the rotation
    spark.createDataFrame(
        [(1, 10.0, None)], "o_orderkey long, total_price double, acct_balance double"
    ).createOrReplaceTempView("null_measure_probe")
    rows = spark.sql(
        """SELECT metric, val FROM null_measure_probe
           UNPIVOT INCLUDE NULLS (val FOR metric IN (total_price, acct_balance))"""
    ).collect()
    assert {(r["metric"], r["val"]) for r in rows} == {
        ("total_price", 10.0), ("acct_balance", None)
    }


def test_upsert_crash_before_archive_rolls_forward(spark, tmp_path):
    """Crash AFTER the staging _SUCCESS but BEFORE the store->archive
    rename: store still present + committed staging. Recovery must
    complete the swap (archive a generation, promote staging) — the
    commit point is the _SUCCESS marker, not the first rename."""
    import shutil
    from pathlib import Path

    from dynamic_etl_pipeline_spark.pipeline import EtlPipeline

    store_dir = str(tmp_path / "crash_fwd_store")
    pipe = EtlPipeline(spark, store_dir)
    pipe.upsert(df=spark.createDataFrame([("k1", "v1")], ["rec_id", "content"]),
                keys=["rec_id"])
    pipe.upsert(df=spark.createDataFrame([("k1", "v2"), ("k2", "v2")],
                                         ["rec_id", "content"]),
                keys=["rec_id"])
    records = Path(pipe.records_path)
    n_gens_before = len(pipe.history())

    # simulate: committed staging alongside a still-present store
    tmp = records.with_name("records.upserting")
    shutil.copytree(records, tmp)
    got = {r["rec_id"] for r in pipe.records().collect()}
    assert got == {"k1", "k2"}
    assert not tmp.exists()
    # the displaced store was archived, not discarded
    assert len(pipe.history()) == n_gens_before + 1


def test_dedup_index_bad_band_config_valueerror(spark, tmp_path):
    """apply_dedup_index_batch must reject invalid band configs with
    ValueError even under python -O (was a bare assert)."""
    from dynamic_etl_pipeline_spark.streaming.sinks import apply_dedup_index_batch

    df = spark.createDataFrame([(1, "some text")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="divisible"):
        apply_dedup_index_batch(df, 0, str(tmp_path / "idx"),
                                num_perm=64, bands=13)


def test_session_paths_all_null_session_is_null_path(spark, tmp_path):
    """Round-3 ADVICE: a session whose first <=3 events ALL have NULL
    event_type must land in the NULL path group (string_agg semantics),
    not '' (bare concat_ws) — and partial-NULL paths skip NULLs."""
    import duckdb

    from dynamic_etl_pipeline_spark.queries import ORACLES, QUERIES

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # user A: one session, all-NULL types; user B: partial-NULL session
    ev = ev.withColumn(
        "event_type",
        F.when(F.col("user_id") == 1, F.lit(None))
        .when(
            (F.col("user_id") == 2) & (F.col("event_id") % 2 == 0),
            F.lit(None),
        )
        .otherwise(F.col("event_type")),
    )
    d = str(tmp_path / "sfnullpath")
    import shutil

    shutil.copytree("/root/testdata/sf0.001", d)
    ev.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")

    got = {
        r["path"]: r["n_sessions"]
        for r in QUERIES["events_session_paths"](spark, d).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    want = {
        row[0]: row[1]
        for row in con.execute(ORACLES["events_session_paths"]).fetchall()
    }
    assert None in want, "injection produced no all-NULL session"
    assert got == want


# --- round-4 advisor findings (ADVICE.md r4) ---


def test_cli_store_after_subcommand(tmp_path, spark):
    """ADVICE r4: the docstring advertises `ingest FILE [--store DIR]`
    but --store only existed on the root parser, so the trailing form
    raised 'unrecognized arguments'. Both placements must parse."""
    import contextlib
    import io
    import json

    from dynamic_etl_pipeline_spark.__main__ import main

    f = tmp_path / "t.csv"
    f.write_text("a,b\n1,x\n2,y\n")
    store = str(tmp_path / "trailing_store")
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(["ingest", str(f), "--store", store])
    assert rc == 0
    assert json.loads(out.getvalue().strip().splitlines()[-1])["stored"] == 2
    # and the store really landed at the trailing --store path
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        main(["records", "--latest", "2", "--store", store])
    rows = [json.loads(x) for x in out.getvalue().strip().splitlines()]
    assert {r["b"] for r in rows} == {"x", "y"}


def test_max_ts_footer_handles_directory_and_missing_column(spark, tmp_path):
    """ADVICE r4: _max_ts_from_footer raised on Spark's directory-style
    parquet and on frames without a ts column, defeating the documented
    Spark-action fallback. Directory layouts now glob part files; bad
    inputs return None instead of raising."""
    import datetime as dt

    from dynamic_etl_pipeline_spark.queries.streaming import (
        _max_ts_from_footer,
    )

    # Spark-written directory: must NOT raise. (Spark's writer omits
    # min/max stats for this timestamp column, so None -> the caller's
    # Spark-action fallback — the advisor's exact scenario.)
    d = str(tmp_path / "ev.parquet")
    rows = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i))
            for i in range(10)]
    spark.createDataFrame(rows, "id long, ts timestamp").repartition(
        3
    ).write.mode("overwrite").parquet(d)
    got = _max_ts_from_footer(d)  # no exception is the contract
    if got is not None:
        assert got.replace(tzinfo=None) == dt.datetime(2024, 1, 1, 9)

    # pyarrow-written multi-file directory (stats present, like the
    # driver fixtures): the glob must aggregate the max across parts
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdir = tmp_path / "pa_ev.parquet"
    pdir.mkdir()
    for i, hrs in enumerate([[1, 5], [9, 3]]):
        tbl = pa.table({
            "id": list(range(len(hrs))),
            "ts": [dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)
                   for h in hrs],
        })
        pq.write_table(tbl, str(pdir / f"part-{i}.parquet"))
    got = _max_ts_from_footer(str(pdir))
    assert got is not None and got.replace(tzinfo=None) == dt.datetime(
        2024, 1, 1, 9
    )

    no_ts = str(tmp_path / "nots.parquet")
    spark.createDataFrame([(1,)], "id long").write.mode(
        "overwrite"
    ).parquet(no_ts)
    assert _max_ts_from_footer(no_ts) is None  # no ts column -> fallback
    assert _max_ts_from_footer(str(tmp_path / "missing.parquet")) is None


def test_diff_pads_drift_columns_with_native_dtype(spark, tmp_path):
    """ADVICE r4: schema-drift pad columns were NULL cast to STRING
    regardless of the column's real dtype, so exceptAll compared typed
    values via string coercion. The pad now uses the dtype of the side
    that has the column."""
    import csv

    from dynamic_etl_pipeline_spark.pipeline import EtlPipeline

    f1 = tmp_path / "v1.csv"
    with open(f1, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["rec_id", "name"])
        w.writerows([[1, "a"], [2, "b"]])
    f2 = tmp_path / "v2.csv"
    with open(f2, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["rec_id", "name", "num"])
        w.writerows([[2, "b2", 7], [3, "c", 9]])

    pipe = EtlPipeline(spark, str(tmp_path / "store"))
    pipe.ingest(str(f1))
    pipe.upsert(str(f2), keys=["rec_id"])

    out = pipe.diff(1)
    dts = dict(out.dtypes)
    assert dts["num"] != "string"  # native dtype, not a string pad
    changes = {(r["rec_id"], r["num"], r["change"])
               for r in out.select("rec_id", "num", "change").collect()}
    assert (3, 9, "added") in changes
    assert (2, None, "removed") in changes


def test_bnlj_condition_found_beyond_three_lines():
    """ADVICE r5: the plan inspector must parse the whole BNLJ detail
    block, not a 3-line window — a condition further down is not a
    cross join."""
    from dynamic_etl_pipeline_spark.plans.inspect import _nested_loops_in

    plan = """== Physical Plan ==
(1) Scan parquet
Output [2]: [a, b]
Location: file:/x
ReadSchema: struct<a:int>

(2) BroadcastNestedLoopJoin BuildRight, Inner
Left output [1]: [a]
Right output [1]: [b]
Arguments: BuildRight, Inner
Join condition: (_stop_nd > 3)

(3) Project
Output [1]: [a]
"""
    assert _nested_loops_in(plan) == 0  # _stop_nd gate, 4 lines down
    assert _nested_loops_in(plan.replace("_stop_nd", "other_col")) == 1
    assert _nested_loops_in(
        plan.replace("Join condition: (_stop_nd > 3)", "")) == 1
    assert _nested_loops_in(
        plan + "\n(4) CartesianProduct\n") == 1


def test_recursive_cte_scales_past_default_row_limit(spark, monkeypatch):
    """100x-corpus catch (round 6): Spark's recursive-CTE row guard
    (spark.sql.cteRecursionRowLimit, default 1M) killed
    sql_recursive_supplier_chain at 100k suppliers (~1.57M chain
    rows). The query function must raise the guard itself — the
    driver runs it on a vanilla session, so a session-builder conf
    would not survive. 120k synthetic suppliers ≈ 1.99M chain rows
    exceed the default; the depth bound (<= 64 halvings) keeps the
    level guard in force."""
    from dynamic_etl_pipeline_spark.queries import mutations

    old = spark.conf.get("spark.sql.cteRecursionRowLimit")
    spark.conf.set("spark.sql.cteRecursionRowLimit", 1_000_000)
    monkeypatch.setattr(
        mutations, "register_views",
        lambda s, d, names=None: s.range(1, 120_001)
        .selectExpr("id AS s_suppkey")
        .createOrReplaceTempView("supplier"),
    )
    try:
        out = mutations.sql_recursive_supplier_chain(spark, "ignored")
        from pyspark.sql import functions as F

        total = out.agg(F.sum("n_chain_rows").alias("t")).collect()[0]["t"]
        assert total > 1_000_000  # would have tripped the default guard
    finally:
        spark.conf.set("spark.sql.cteRecursionRowLimit", old)
        spark.catalog.dropTempView("supplier")


def test_recursive_cte_row_limit_not_leaked_to_caller_session(spark):
    """r6 advisor item: sql_recursive_supplier_chain must not disable
    the caller session's 1M-row recursion tripwire — the raised limit
    lives on a dedicated sub-session."""
    from dynamic_etl_pipeline_spark.queries import mutations

    before = spark.conf.get("spark.sql.cteRecursionRowLimit")
    out = mutations.sql_recursive_supplier_chain(
        spark, "/root/testdata/sf0.001"
    )
    assert out.limit(1).count() >= 0  # executes under the sub-session
    assert spark.conf.get("spark.sql.cteRecursionRowLimit") == before
    sub = mutations.sql_recursive_supplier_chain._sub_session
    assert sub is not spark
    assert sub.conf.get("spark.sql.cteRecursionRowLimit") == "2000000000"


def test_round_half_up_halfway_boundary_vs_duckdb(spark):
    """r6 advisor item: pin the documented rounding-divergence class.
    For doubles whose shortest repr ends exactly at a halfway digit
    but whose binary value is below the decimal halfway, Spark (and
    _round_half_up, its Python twin) round the shortest-repr HALF_UP
    while DuckDB rounds the binary double — one ulp apart at the
    target scale. The engine's contract is Spark == _round_half_up
    (asserted hard); the DuckDB side documents the divergence so a
    future corpus hitting it is diagnosed here first."""
    import duckdb

    from dynamic_etl_pipeline_spark.operators.knn import _round_half_up

    cases = [  # (value, digits) — found by halfway-scan, all diverge
        (22.54255, 4),
        (1.058755, 5),
        (0.26585, 4),
    ]
    con = duckdb.connect()
    for x, d in cases:
        py = _round_half_up(x, d)
        got = spark.sql(
            f"SELECT round(CAST({x!r} AS DOUBLE), {d}) AS r"
        ).collect()[0]["r"]
        assert got == py, f"Spark diverged from its Python twin on {x}"
        dd = con.execute(
            f"SELECT round(CAST({x!r} AS DOUBLE), {d})"
        ).fetchone()[0]
        assert dd != py, (
            f"DuckDB now agrees on {x}: the documented divergence class "
            "closed upstream — update _round_half_up's docstring"
        )
        assert abs(dd - py) <= 10 ** -d * 1.0000001


def test_empty_regex_split_has_no_trailing_empty(spark):
    """ADVICE r9: the winnowing/CDC char-array rewrite
    (queries/text.py:518,603) relies on Spark's split(text, '')
    returning EXACTLY length(text) elements — no trailing "" (whose
    ascii() is 0 and would append one bogus k-gram position per
    document, silently changing every fingerprint). Raw Java
    split("", -1) semantics WOULD yield that trailing element; pinned
    PySpark 4.1.2 does not. This test makes an engine/version change
    fail loudly instead of corrupting hashes."""
    rows = spark.createDataFrame(
        [("",), ("a",), ("ab",), ("hello world",), ("café ü",),
         ("trailing space ",), ("\n",), ("a" * 300,)],
        ["text"],
    ).select(
        F.length("text").alias("n"),
        F.size(F.split("text", "")).alias("k"),
        F.expr("transform(split(text, ''), c -> ascii(c))").alias("codes"),
    ).collect()
    for r in rows:
        # empty string: split returns [""] (size 1) but the winnow path
        # filters length(text) >= k beforehand, so only the invariant
        # for non-empty text is load-bearing
        if r["n"] == 0:
            continue
        assert r["k"] == r["n"], (r["n"], r["k"])
        assert 0 not in r["codes"], "trailing empty element leaked"


# ---- round-10 ADVICE items ------------------------------------------------


def test_stateful_floor_tool_accepts_both_flag_forms():
    """ADVICE r10: usage documented '--runs N' but only '--runs=N'
    parsed — a bare '--runs N' raised IndexError and N was consumed as
    the positional sf_dir. Both forms must now parse identically."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from bench_stateful_floor import parse_args

    eq = parse_args(["/tmp/x", "--runs=5", "--batch-sizes=1,2"])
    sp = parse_args(["/tmp/x", "--runs", "5", "--batch-sizes", "1,2"])
    assert eq == sp == ("/tmp/x", 5, [1, 2])
    # defaults + positional-only still work
    assert parse_args([])[1:] == (2, [10_000, 100_000])
    import pytest

    with pytest.raises(SystemExit):
        parse_args(["--runs"])  # dangling flag: loud, not IndexError


def test_group_cardinality_error_names_real_trip_point(spark):
    """ADVICE r10: the error message understated the bound (trip point
    is max_groups*1.1, message said max_groups). It must now name the
    headroom-adjusted threshold."""
    import pytest

    from dynamic_etl_pipeline_spark.operators.twolevel import (
        GroupCardinalityError,
        two_level_quantiles,
    )

    df = spark.range(400).select(
        F.col("id").alias("gk"),
        (F.col("id") % 50).cast("double").alias("v"),
    )
    with pytest.raises(GroupCardinalityError) as exc:
        two_level_quantiles(
            df, "v", lambda c: F.floor(c / 10).cast("long"), [0.5],
            part_cols=["gk"], max_groups=100,
        )
    msg = str(exc.value)
    assert "max_groups=100" in msg
    assert "110" in msg and "headroom" in msg


def test_winnow_codepoint_dtype_is_explicit_little_endian():
    """ADVICE r11: the winnow kernel decodes text.encode('utf-32-le')
    with an EXPLICITLY little-endian dtype ('<u4'), not native-order
    np.uint32 — a native view on a big-endian host would silently
    misread every code point. The decode must equal [ord(c) for c in
    text] regardless of host byte order (which this asserts on the
    only host we have; the source pin below keeps the dtype honest)."""
    import inspect

    import numpy as np

    from dynamic_etl_pipeline_spark.queries import text as text_mod

    s = "aé中\U0001f600z"  # ascii, latin-1, CJK, astral
    codes = np.frombuffer(s.encode("utf-32-le"), dtype="<u4").astype(
        np.int64
    )
    assert codes.tolist() == [ord(c) for c in s]
    src = inspect.getsource(text_mod)
    assert 'dtype="<u4"' in src
    assert "dtype=np.uint32" not in src


def test_kmeans_fit_drops_element_null_vectors(spark):
    """ADVICE r11: a vector with a NULL ELEMENT used to reach the
    update step as a cluster_id=None group, and the new_mu rebuild's
    mu[None] raised an opaque TypeError mid-iteration (on both
    assignment paths once the Arrow NULL-parity landed). The fit now
    excludes element-null vectors up front — same semantics as the
    whole-vector null filter — and the run completes with the dense
    rows only."""
    from dynamic_etl_pipeline_spark.operators.knn import kmeans_exact_fit

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [None, 2.0]), (2, [9.0, 8.0]),
         (3, None), (4, [3.0, None]), (5, [2.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    assigned, mu = kmeans_exact_fit(df, n_centroids=2, iters=2)
    rows = {r["vec_id"]: r["cluster_id"] for r in assigned.collect()}
    assert set(rows) == {0, 2, 5}          # 1, 3, 4 dropped up front
    assert all(c is not None for c in rows.values())
    assert len(mu) == 2


def test_kmeans_assign_arrow_nonfinite_documented_divergence(spark):
    """ADVICE r11: for genuine NaN/+-inf elements the two assignment
    paths intentionally diverge — HOF's all-NaN/all-inf distance row
    lands on cluster 0 (Spark's NaN-largest ordering plus
    array_position's NaN=NaN), the Arrow kernel masks any non-finite
    element to NULL. Unreachable from in-repo callers (qd is cast from
    floor-quantized BIGINTs), but the docstring now states the
    divergence and this test pins it so it cannot drift silently."""
    from dynamic_etl_pipeline_spark.operators.knn import _kmeans_exact_assign

    inf, nan = float("inf"), float("nan")
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [inf, 2.0]), (2, [nan, 2.0]),
         (3, [-inf, 1.0])],
        "vec_id int, qd array<double>",
    )
    mu = [[0.0, 0.0], [4.0, 5.0]]
    hof = {r["vec_id"]: r["cluster_id"]
           for r in _kmeans_exact_assign(df, mu, arrow=False).collect()}
    arw = {r["vec_id"]: r["cluster_id"]
           for r in _kmeans_exact_assign(df, mu, arrow=True).collect()}
    assert hof == {0: 0, 1: 0, 2: 0, 3: 0}
    assert arw == {0: 0, 1: None, 2: None, 3: None}
