"""Keyed-mutation and modern-SQL surface: MERGE/upsert, SCD2 dimension
maintenance, recursive CTEs, LATERAL joins.

The reference only ever appends (app.py:133-141); maintaining state
keyed by a business key needs MERGE semantics (operators/merge.py).
Recursive CTE and LATERAL are Spark 4 SQL features the facade exposes
verbatim — both have native DuckDB twins, so these are exact-oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from ..operators.merge import merge_upsert, scd2_apply
from .registry import query


@query("merge_orders_upsert", oracle="""
WITH updates AS (
  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1000 AS o_totalprice
  FROM orders WHERE o_orderkey % 100 = 0
), inserts AS (
  SELECT o_orderkey + 100000000 AS o_orderkey, 'N' AS o_orderstatus,
         o_totalprice FROM orders WHERE o_orderkey % 100 = 1
), src AS (
  SELECT * FROM updates UNION ALL SELECT * FROM inserts
), tgt AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE o_orderkey % 100 <> 50
)
SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
       CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
            ELSE t.o_orderstatus END AS o_orderstatus,
       CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
            ELSE t.o_totalprice END AS o_totalprice
FROM tgt t FULL JOIN src s ON t.o_orderkey = s.o_orderkey
""")
def merge_orders_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI MERGE as one full-outer join (operators/merge.py): a change
    batch of updates (status flip + reprice), inserts (new keys), and
    deletes applied to the orders table in a single shuffle on the
    merge key."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
    )
    inserts = o.filter(F.col("o_orderkey") % 100 == 1).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
    )
    deletes = o.filter(F.col("o_orderkey") % 100 == 50).select("o_orderkey")
    return merge_upsert(
        o, updates.unionByName(inserts), ["o_orderkey"],
        update_cols=["o_orderstatus", "o_totalprice"], deletes=deletes,
    )


@query("scd2_customer_segments", oracle="""
WITH dim AS (
  SELECT c_custkey, c_mktsegment, 1 AS version, TRUE AS is_current
  FROM customer
), ch AS (
  SELECT c_custkey, 'SEGMENT-V2' AS c_mktsegment
  FROM customer WHERE c_custkey % 10 = 3
  UNION ALL
  SELECT c_custkey, c_mktsegment          -- no-op changes: same value
  FROM customer WHERE c_custkey % 10 = 4
  UNION ALL
  SELECT c_custkey + 900000000, 'SEGMENT-FRESH'
  FROM customer WHERE c_custkey % 10 = 5
), changed AS (
  SELECT ch.c_custkey, ch.c_mktsegment FROM ch
  LEFT JOIN dim ON dim.c_custkey = ch.c_custkey AND dim.is_current
  WHERE dim.c_custkey IS NULL
     OR dim.c_mktsegment IS DISTINCT FROM ch.c_mktsegment
)
SELECT d.c_custkey, d.c_mktsegment, d.version,
       CASE WHEN c.c_custkey IS NOT NULL THEN FALSE
            ELSE d.is_current END AS is_current
FROM dim d LEFT JOIN changed c USING (c_custkey)
UNION ALL
SELECT c_custkey, c_mktsegment, 2 AS version, TRUE AS is_current
FROM changed
""")
def scd2_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 on the customer segment: real
    changes close the current row and append version 2; no-op change
    rows (same value) and untouched keys pass through; brand-new keys
    insert as current. History is never rewritten."""
    c = load_table(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey", "c_mktsegment",
        F.lit(1).alias("version"), F.lit(True).alias("is_current"),
    )
    changes = (
        c.filter(F.col("c_custkey") % 10 == 3)
        .select("c_custkey", F.lit("SEGMENT-V2").alias("c_mktsegment"))
        .unionByName(
            c.filter(F.col("c_custkey") % 10 == 4)
            .select("c_custkey", "c_mktsegment")
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 10 == 5).select(
                (F.col("c_custkey") + 900000000).alias("c_custkey"),
                F.lit("SEGMENT-FRESH").alias("c_mktsegment"),
            )
        )
    )
    return scd2_apply(
        dim, changes, keys=["c_custkey"], tracked_cols=["c_mktsegment"],
        batch_version=2,
    )


_RECURSIVE_SPARK = """
WITH RECURSIVE chain (suppkey, ancestor, depth) AS (
  SELECT s_suppkey, s_suppkey, 0 FROM supplier
  UNION ALL
  SELECT suppkey, ancestor DIV 2, depth + 1 FROM chain WHERE ancestor > 1
)
SELECT suppkey, CAST(max(depth) AS INT) AS depth_to_root,
       CAST(count(*) AS BIGINT) AS n_chain_rows
FROM chain GROUP BY suppkey
"""


@query("sql_recursive_supplier_chain", oracle="""
WITH RECURSIVE chain (suppkey, ancestor, depth) AS (
  SELECT s_suppkey, s_suppkey, 0 FROM supplier
  UNION ALL
  SELECT suppkey, ancestor // 2, depth + 1 FROM chain WHERE ancestor > 1
)
SELECT suppkey, CAST(max(depth) AS INT) AS depth_to_root,
       CAST(count(*) AS BIGINT) AS n_chain_rows
FROM chain GROUP BY suppkey
""")
def sql_recursive_supplier_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE vs DuckDB's): walk each
    supplier's ancestor chain in the implicit binary tree key/2 until
    the root — an iterative fixpoint the ENGINE drives (each recursion
    step is a distributed join/union, no driver loop). The only SQL
    dialect difference is integer division spelling (DIV vs //).

    Scale note: Spark guards recursive CTEs with a TOTAL-row safety
    limit (spark.sql.cteRecursionRowLimit, default 1M) — an
    interactive-mistake tripwire, not a semantic bound, and the first
    thing the 100x corpus run broke (100k suppliers x ~16 levels =
    1.57M chain rows). This recursion provably terminates (the
    ancestor halves every level, so depth <= 64 << the 100-level
    limit, which stays in force as the real runaway guard) and its
    row count is linear in |supplier| x key width, so the row guard
    is raised — but only on a dedicated newSession() (its own
    SQLConf over the shared SparkContext), so the 1M-row
    interactive tripwire stays armed for every other query on the
    caller's session (r6 advisor item). The sub-session is cached
    per context because the returned DataFrame executes lazily
    under the sub-session's conf — a try/finally restore here would
    re-arm the guard before the driver ever collects."""
    sub = getattr(sql_recursive_supplier_chain, "_sub_session", None)
    if sub is None or sub.sparkContext is not spark.sparkContext:
        sub = spark.newSession()
        sub.conf.set("spark.sql.cteRecursionRowLimit", 2_000_000_000)
        sql_recursive_supplier_chain._sub_session = sub
    register_views(sub, sf_dir, ["supplier"])  # the only table referenced
    return sub.sql(_RECURSIVE_SPARK)


_LATERAL_SQL = """
SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
WHERE c.c_custkey % 10 = 7
"""


@query("sql_lateral_top2_orders", oracle=_LATERAL_SQL)
def sql_lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT (the
    top-2-orders-per-customer shape): identical SQL text runs on both
    engines. Catalyst decorrelates this into a window/top-k plan rather
    than per-row re-execution."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_LATERAL_SQL)
