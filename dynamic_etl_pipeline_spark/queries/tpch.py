"""TPC-H-style decision-support battery adapted to the fixture star
schema (FIXTURES.md §A: no partsupp table, no commit/receipt dates, so
q2/q11/q12/q16/q20 shapes are out of scope and date-lag predicates use
``o_orderdate + INTERVAL`` instead of commitdate).

The reference has no query language at all (SURVEY.md §2.3-2.7 — its
only SQL is point SELECTs at app.py:144-173); this battery is tier-[D]
surface that exercises the decision-support shapes the simpler
relational module doesn't:

- correlated EXISTS / NOT EXISTS (q4, q21, q22) — expressed as
  left-semi / left-anti joins, which is exactly how Catalyst
  decorrelates them; the semi/anti build side stays a shuffle-hash or
  sort-merge join on the correlation key, so no nested-loop blowup at
  100 TB;
- IN (grouped-HAVING subquery) (q18) — an inner join against a
  pre-aggregated key set;
- scalar subqueries against aggregates (q15 max, q17 per-group avg,
  q22 global avg) — decorrelated to broadcast-joined one-row (or
  per-key) aggregate frames;
- conditional-aggregate ratios (q8 market share, q14 promo share);
- disjunctive multi-column join predicates (q19) — planned as one
  equi-join on partkey with the OR-bracket as a post-join filter.

Float parity with the DuckDB oracle follows _helpers.dsum/davg: exact
DECIMAL accumulation cast back to double on both engines (order-
independent, hence partition-count-independent — see that module's
docstring for the 100 TB argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ._helpers import davg, dsum, ntz
from .registry import query


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    return [load_table(spark, sf_dir, n) for n in names]


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# q4: order-priority checking — correlated EXISTS -> left-semi join
# --------------------------------------------------------------------------

@query("q4_order_priority", oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
""")
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in a quarter with at least one line shipped >30 days after
    order date, counted by priority. The EXISTS is a left-semi join:
    equi on orderkey (the shuffle key) with the date lag as the join
    residual — never a per-row subquery execution."""
    o, li = load_tables(spark, sf_dir, "orders", "lineitem")
    window = o.filter(
        (F.col("o_orderdate") >= ntz("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < ntz("1996-10-01 00:00:00"))
    )
    late = (
        F.col("l_orderkey") == F.col("o_orderkey")
    ) & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    return (
        window.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# q6: revenue-change forecast — tight scan-side predicate battery
# --------------------------------------------------------------------------

@query("q6_forecast_revenue", oracle="""
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(27,6))) AS DOUBLE)
       AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
""")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single global aggregate behind three scan predicates — all three
    reach the parquet reader (range pushdown on shipdate/discount/
    quantity min-max stats), so the scan skips row groups wholesale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= ntz("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < ntz("1998-01-01 00:00:00"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"))
    )


# --------------------------------------------------------------------------
# q7: volume shipping between two nations
# --------------------------------------------------------------------------

@query("q7_volume_shipping", oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(CAST(volume AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
""")
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume by year. supplier/nation are broadcast
    (bounded dims), so the only shuffles are lineitem⋈orders⋈customer on
    their natural keys plus the final tiny group-by. Filtering each
    nation dim to the two names *before* the join shrinks the fact rows
    at the earliest broadcast stage."""
    li, su, na, o, cu = load_tables(
        spark, sf_dir, "lineitem", "supplier", "nation", "orders", "customer"
    )
    n1 = na.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = na.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(su), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nk") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cu, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nk") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(_revenue(), 6).alias("revenue"))
    )


# --------------------------------------------------------------------------
# q8: national market share — conditional-aggregate ratio
# --------------------------------------------------------------------------

@query("q8_market_share", oracle="""
SELECT o_year,
       round(CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END
                           AS DECIMAL(27,6))) AS DOUBLE)
             / CAST(sum(CAST(volume AS DECIMAL(27,6))) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n2.n_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
""")
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's share of PROMO-part revenue sold into ASIA, by order
    year: sum(CASE)/sum — both sums in one grouped aggregate, one
    shuffle on the 7-value year key. Six of the seven joins broadcast
    (part/supplier/nation/nation/region are bounded dims)."""
    li, pa, su, na, o, cu, re = load_tables(
        spark, sf_dir,
        "lineitem", "part", "supplier", "nation", "orders", "customer", "region",
    )
    n1 = na.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = na.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    volume = _revenue()
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(pa.filter(F.col("p_type") == "PROMO")),
                F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(su), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nk") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cu, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nk") == F.col("c_nationkey"))
        .join(F.broadcast(re.filter(F.col("r_name") == "ASIA")),
              F.col("r_regionkey") == F.col("c_rk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(dsum(nation_vol, 6) / dsum(volume, 6), 6).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# q9: product-type profit (adapted: retail-cost margin, no partsupp)
# --------------------------------------------------------------------------

@query("q9_product_profit", oracle="""
SELECT nation, o_year,
       CAST(sum(CAST(amount AS DECIMAL(27,6))) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount)
           - 0.4 * p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  WHERE p_type = 'STANDARD'
) profit
GROUP BY nation, o_year
""")
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin on STANDARD parts by supplier nation and order year. The
    fixture schema has no partsupp/supplycost, so cost is modeled as
    0.4 x retail price (the adapted expression keeps <=4 decimal digits
    exact, so the scale-6 decimal accumulation stays rounding-free)."""
    li, pa, su, na, o = load_tables(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders"
    )
    amount = _revenue() - F.lit(0.4) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(pa.filter(F.col("p_type") == "STANDARD")),
                F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(su), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(na), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(amount, 6).alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# q10: returned-item reporting — top 20 customers by refund exposure
# --------------------------------------------------------------------------

@query("q10_returned_items", oracle="""
SELECT c_custkey, c_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
            AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-10-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who returned the most revenue in a quarter. The final
    ORDER BY+LIMIT plans as TakeOrderedAndProject (per-partition top-20
    + driver merge); revenue is an exact decimal sum so the sort key is
    engine-portable, with custkey as total-order tie-break."""
    cu, o, li, na = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    return (
        cu.join(
            o.filter(
                (F.col("o_orderdate") >= ntz("1997-10-01 00:00:00"))
                & (F.col("o_orderdate") < ntz("1998-01-01 00:00:00"))
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(li.filter(F.col("l_returnflag") == "R"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(na), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_revenue(), 6).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# q11: above-average suppliers — HAVING vs a scalar aggregate-of-aggregate
# --------------------------------------------------------------------------

@query("q11_concentrated_suppliers", oracle="""
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
              AS DOUBLE) AS supp_revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey, supp_revenue
FROM rev
WHERE supp_revenue > (SELECT CAST(sum(CAST(supp_revenue AS DECIMAL(27,6)))
                                  AS DOUBLE) / count(*) * 1.02
                      FROM rev)
""")
def q11_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose revenue exceeds 102% of the mean — the TPC-H q11
    shape (HAVING compared against an aggregate OF the aggregate)
    without partsupp. The revenue frame is computed once and reused on
    both sides of the comparison: Catalyst can't share it across the
    scalar subquery boundary automatically in the DataFrame form, so
    the aggregate-of-aggregate broadcasts as a one-row frame over the
    100-row (bounded: one row per supplier) revenue set."""
    li, = load_tables(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_suppkey")
        .agg(dsum(_revenue(), 6).alias("supp_revenue"))
    )
    cutoff = rev.agg(
        (dsum("supp_revenue", 6) / F.count("*") * F.lit(1.02)).alias("cut")
    )
    return (
        rev.crossJoin(F.broadcast(cutoff))
        .filter(F.col("supp_revenue") > F.col("cut"))
        .select("l_suppkey", "supp_revenue")
    )


# --------------------------------------------------------------------------
# q13: customer order-count distribution — outer join preserving zeros
# --------------------------------------------------------------------------

@query("q13_customer_distribution", oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""")
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of non-urgent order counts per customer, zeros
    included — the left outer join (with the priority predicate as a
    join condition, NOT a post-filter, or zero-order customers vanish)
    feeds two cascaded tiny-key aggregations."""
    cu, o = load_tables(spark, sf_dir, "customer", "orders")
    joined = cu.join(
        o,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "1-URGENT"),
        "left_outer",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# --------------------------------------------------------------------------
# q14: promo revenue share — conditional aggregate over one join
# --------------------------------------------------------------------------

@query("q14_promo_revenue", oracle="""
SELECT round(
  100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE)
        / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
               AS DOUBLE), 6) AS promo_revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1998-03-01'
  AND l_shipdate < TIMESTAMP '1998-04-01'
""")
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent of one month's revenue from PROMO parts: broadcast-join
    part, one global two-sum aggregate (no shuffle beyond the single-
    row final combine)."""
    li, pa = load_tables(spark, sf_dir, "lineitem", "part")
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= ntz("1998-03-01 00:00:00"))
            & (F.col("l_shipdate") < ntz("1998-04-01 00:00:00"))
        )
        .join(F.broadcast(pa), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(F.lit(100.0) * dsum(promo, 6) / dsum(_revenue(), 6), 6)
            .alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------------
# q15: top supplier — scalar MAX subquery over an aggregate frame
# --------------------------------------------------------------------------

@query("q15_top_supplier", oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""")
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum quarterly revenue. The scalar MAX
    subquery becomes a broadcast cross-join of a one-row aggregate
    against the 100-row revenue frame; equality on the exact-decimal
    revenue is engine-portable (dsum is order-independent)."""
    li, su = load_tables(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= ntz("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < ntz("1997-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(_revenue(), 6).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        F.broadcast(su)
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# q16: supplier diversity per part bucket — NOT IN subquery via spark.sql
# --------------------------------------------------------------------------

_Q16_SQL = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_size IN (1, 10, 20, 30, 40)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
GROUP BY p_brand, p_size
"""


@query("q16_supplier_diversity", oracle=_Q16_SQL)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, size) bucket excluding a
    blocklist — run through the engine's SQL facade (``spark.sql`` over
    registered fixture views; the one battery entry exercising that
    entry path end to end, same ANSI text on both engines).

    The NOT IN subquery is the null-aware anti-join shape: Spark plans
    a broadcast null-aware anti join (the blocklist is a bounded dim),
    which degrades to correct-but-broadcast-only — exactly why NOT IN
    on an unbounded, nullable key should be rewritten to NOT EXISTS
    (q21/q22's left-anti) at 100 TB. Keeping one of each shape in the
    battery documents the trade."""
    from ..catalog import register_views

    register_views(spark, sf_dir, ["part", "lineitem", "supplier"])
    return spark.sql(_Q16_SQL)


# --------------------------------------------------------------------------
# q17: small-quantity revenue — correlated per-part AVG subquery
# --------------------------------------------------------------------------

@query("q17_small_quantity_revenue", oracle="""
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) / 7.0,
             6) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
""")
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue locked in sub-20%-of-average-quantity orders for one
    brand. The correlated per-part AVG decorrelates into a grouped
    aggregate over lineitem joined back on partkey — two shuffles on
    the same key (AQE merges them back-to-back), never a re-scan per
    outer row. avg(integer-valued quantities) is exact in double, so
    the 0.2x threshold compares identically on both engines."""
    li, pa = load_tables(spark, sf_dir, "lineitem", "part")
    thresholds = (
        li.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        li.join(F.broadcast(pa.filter(F.col("p_brand") == "Brand#1")),
                F.col("p_partkey") == F.col("l_partkey"))
        .join(thresholds, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(dsum("l_extendedprice") / F.lit(7.0), 6).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# q18: large-volume customers — IN (grouped HAVING) subquery
# --------------------------------------------------------------------------

@query("q18_large_volume_customer", oracle="""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""")
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose orders total >250 units. The IN-subquery is a
    left-semi join against the pre-aggregated orderkey set; quantity
    sums are integer-valued doubles (exact), so HAVING compares
    identically on both engines."""
    cu, o, li = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        cu.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# q19: discounted revenue — disjunctive bracket predicates
# --------------------------------------------------------------------------

@query("q19_bracket_revenue", oracle="""
SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
            AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
""")
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under three OR'd (brand, size, quantity) brackets. The
    join stays an equi-join on partkey (broadcast — part is bounded);
    the disjunction is a post-join filter, and Catalyst additionally
    pushes the derivable per-side disjunctions (brand/size onto part,
    quantity onto lineitem) down to each scan."""
    li, pa = load_tables(spark, sf_dir, "lineitem", "part")
    bracket = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(F.broadcast(pa), F.col("p_partkey") == F.col("l_partkey"))
        .filter(bracket)
        .agg(dsum(_revenue(), 6).alias("revenue"))
    )


# --------------------------------------------------------------------------
# q21: suppliers who kept multi-supplier orders waiting
#      (EXISTS + NOT EXISTS with inequality correlation)
# --------------------------------------------------------------------------

@query("q21_waiting_suppliers", oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""")
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For finished orders shipped >60 days late, find the supplier who
    shipped strictly last among multiple suppliers (the one everyone
    waited on; adapted from TPC-H q21's receiptdate/commitdate to the
    fixture's shipdate/orderdate). EXISTS/NOT EXISTS become left-semi /
    left-anti joins, both equi on orderkey with the supplier/date
    inequalities as residuals — one shuffle key throughout, so the
    three lineitem passes co-partition and AQE reuses the exchange."""
    su, li, o = load_tables(spark, sf_dir, "supplier", "lineitem", "orders")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("y_orderkey"),
        F.col("l_suppkey").alias("y_suppkey"),
        F.col("l_shipdate").alias("y_shipdate"),
    )
    late = (
        l1.join(o.filter(F.col("o_orderstatus") == "F"),
                F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    multi = late.join(
        l2,
        (F.col("x_orderkey") == F.col("l_orderkey"))
        & (F.col("x_suppkey") != F.col("l_suppkey")),
        "left_semi",
    )
    sole_last = multi.join(
        l3,
        (F.col("y_orderkey") == F.col("l_orderkey"))
        & (F.col("y_suppkey") != F.col("l_suppkey"))
        & (F.col("y_shipdate") > F.col("l_shipdate")),
        "left_anti",
    )
    return (
        sole_last.join(F.broadcast(su), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q22: dormant high-balance customers — NOT EXISTS + global scalar AVG
# --------------------------------------------------------------------------

@query("q22_dormant_customers", oracle="""
SELECT c_mktsegment, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(27,4))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(27,4))) AS DOUBLE)
                          / count(c_acctbal)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
""")
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no orders since 2000, by
    segment (adapted from TPC-H q22's phone-prefix grouping to the
    fixture's mktsegment; the classic no-orders-ever predicate is empty
    here since nearly every fixture customer has orders). The scalar
    AVG broadcasts as a one-row frame; NOT EXISTS is a left-anti join
    with the date predicate pushed into the orders scan. The average
    uses exact decimal sum / count so the cutoff is engine-portable."""
    cu, o = load_tables(spark, sf_dir, "customer", "orders")
    cutoff = cu.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    recent = o.filter(F.col("o_orderdate") >= ntz("2000-01-01 00:00:00"))
    return (
        cu.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# q2 / q12 / q20 — the shapes FIXTURES.md scoped out for lack of
# partsupp and commit/receipt dates. Closed here by SYNTHESIZING those
# columns deterministically from existing ones (the doc_pii_redact
# convention: identical expressions on both engines, so the oracle
# stays exact):
#   partsupp      = DISTINCT (l_partkey, l_suppkey) observed in lineitem
#   ps_supplycost = integer cents from p_retailprice scaled by an
#                   md5-bucket of the (part, supp) pair  [exact ints]
#   ps_availqty   = md5-bucket arithmetic in [1, 1000]
#   l_commitdate  = l_shipdate + (l_partkey % 20 - 5) days
#   l_receiptdate = l_shipdate + (l_suppkey % 10 + 1) days
#   l_shipmode    = 5-way pick by (l_orderkey + l_linenumber) % 5
# --------------------------------------------------------------------------

def _hx(e: str, i: int) -> str:
    """Value of the i-th hex digit of md5(e) — portable Spark/DuckDB."""
    return f"(instr('0123456789abcdef', substr(md5({e}), {i}, 1)) - 1)"


_PS_KEY = ("concat(cast(ps_partkey as string), '-', "
           "cast(ps_suppkey as string))")
_PS_B = f"({_hx(_PS_KEY, 1)} * 16 + {_hx(_PS_KEY, 2)})"

_PARTSUPP_SQL = f"""
  SELECT ps_partkey, ps_suppkey,
         CAST(floor(p_retailprice * 100) AS BIGINT)
           * (50 + {_PS_B} % 50) AS ps_supplycost_cents,
         CAST(1 + ({_PS_B} * 7 + ps_suppkey) % 1000 AS INT) AS ps_availqty
  FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem) ps
  JOIN part ON p_partkey = ps_partkey
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized partsupp frame (Spark twin of _PARTSUPP_SQL).

    One distinct over (partkey, suppkey) + a broadcast join to part;
    the cost/qty columns are pure md5/int arithmetic, so the synthesis
    is deterministic under any partitioning — both engines and every
    rerun see the identical partsupp relation."""
    li, part = load_tables(spark, sf_dir, "lineitem", "part")
    pairs = (
        li.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        ).distinct()
    )
    return (
        pairs.join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            F.col("p_partkey") == F.col("ps_partkey"),
        )
        .select(
            "ps_partkey", "ps_suppkey",
            (
                F.expr("CAST(floor(p_retailprice * 100) AS BIGINT)")
                * (50 + F.expr(_PS_B) % 50)
            ).alias("ps_supplycost_cents"),
            (1 + (F.expr(_PS_B) * 7 + F.col("ps_suppkey")) % 1000)
            .cast("int").alias("ps_availqty"),
        )
    )


@query("q2_min_cost_supplier", oracle=f"""
WITH partsupp AS ({_PARTSUPP_SQL}),
eligible AS (
  SELECT ps_partkey, ps_suppkey, ps_supplycost_cents,
         s_acctbal, s_name, n_name
  FROM partsupp
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'ASIA'
),
best AS (
  SELECT ps_partkey, min(ps_supplycost_cents) AS min_cost
  FROM eligible GROUP BY ps_partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost_cents
FROM eligible
JOIN best ON best.ps_partkey = eligible.ps_partkey
         AND ps_supplycost_cents = min_cost
JOIN part ON p_partkey = eligible.ps_partkey
WHERE p_size = 15 AND p_type = 'STANDARD'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""")
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape: for every qualifying part, the supplier(s)
    offering the REGIONAL minimum supply cost — correlated scalar-MIN
    subquery decorrelated to a per-part aggregate joined back (exactly
    Catalyst's own decorrelation), then dimension filters and top-100.

    Scale: the eligible frame shuffles once on ps_partkey for the min;
    the join back is on the same key (no extra exchange under AQE);
    part/supplier/nation/region dimensions broadcast. The top-100 is
    TakeOrderedAndProject — no global sort."""
    part, supplier, nation, region = load_tables(
        spark, sf_dir, "part", "supplier", "nation", "region"
    )
    eligible = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("ps_partkey", "ps_suppkey", "ps_supplycost_cents",
                "s_acctbal", "s_name", "n_name")
    )
    best = eligible.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_cents").alias("min_cost")
    )
    return (
        eligible.join(
            best.withColumnRenamed("ps_partkey", "_bpk"),
            (F.col("_bpk") == F.col("ps_partkey"))
            & (F.col("ps_supplycost_cents") == F.col("min_cost")),
        )
        .join(
            F.broadcast(
                part.filter((F.col("p_size") == 15)
                            & (F.col("p_type") == "STANDARD"))
            ),
            F.col("p_partkey") == F.col("ps_partkey"),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                "ps_supplycost_cents")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_L_COMMIT = "l_shipdate + INTERVAL 1 DAY * (l_partkey % 20 - 5)"
_L_RECEIPT = "l_shipdate + INTERVAL 1 DAY * (l_suppkey % 10 + 1)"
# element_at / list subscripts are 1-based on both engines, but the
# array-literal spelling differs
_L_MODE_IDX = "CAST((l_orderkey + l_linenumber) % 5 AS INT) + 1"
_L_SHIPMODE_SPARK = ("element_at(array('MAIL', 'SHIP', 'AIR', 'TRUCK', "
                     f"'RAIL'), {_L_MODE_IDX})")
_L_SHIPMODE_DUCK = f"(['MAIL', 'SHIP', 'AIR', 'TRUCK', 'RAIL'])[{_L_MODE_IDX}]"


@query("q12_shipmode_priority", oracle=f"""
WITH l AS (
  SELECT o_orderpriority,
         {_L_SHIPMODE_DUCK} AS l_shipmode,
         {_L_COMMIT} AS l_commitdate,
         {_L_RECEIPT} AS l_receiptdate,
         l_shipdate
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
)
SELECT l_shipmode,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM l
WHERE l_shipmode IN ('MAIL', 'SHIP')
  AND l_commitdate < l_receiptdate
  AND l_shipdate < l_commitdate
  AND l_receiptdate >= TIMESTAMP '1996-01-01'
  AND l_receiptdate < TIMESTAMP '1997-01-01'
GROUP BY l_shipmode
ORDER BY l_shipmode
""")
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape: late-shipment risk by ship mode — were
    high-priority orders entrusted to slow modes? Commit/receipt dates
    and ship mode are synthesized per the module-header convention.

    Scale: one equi-join lineitem-orders on the order key + one
    2-group aggregate; every synthesized column is map-side arithmetic
    that AQE/codegen fold into the scan stage, and the IN-filter on
    ship mode halves the join probe before it happens."""
    li, orders = load_tables(spark, sf_dir, "lineitem", "orders")
    l = li.select(
        "l_orderkey",
        F.expr(_L_SHIPMODE_SPARK).alias("l_shipmode"),
        F.expr(_L_COMMIT).alias("l_commitdate"),
        F.expr(_L_RECEIPT).alias("l_receiptdate"),
        "l_shipdate",
    ).filter(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate") < F.col("l_commitdate"))
        & (F.col("l_receiptdate") >= ntz("1996-01-01 00:00:00"))
        & (F.col("l_receiptdate") < ntz("1997-01-01 00:00:00"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )


@query("q20_excess_stock_suppliers", oracle=f"""
WITH partsupp AS ({_PARTSUPP_SQL}),
shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(l_quantity) AS BIGINT) AS qty_1996
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
excess AS (
  SELECT DISTINCT ps_suppkey
  FROM partsupp
  JOIN part ON p_partkey = ps_partkey
  JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  WHERE p_name LIKE '%widget%'
    AND ps_availqty > qty_1996 / 2.0
)
SELECT s_name, s_acctbal
FROM supplier
JOIN excess ON ps_suppkey = s_suppkey
ORDER BY s_name
""")
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape: suppliers holding excess stock of a named part
    family — availqty above half of what they actually shipped in the
    year (nested IN-subquery chain flattened to joins + a semi join,
    Catalyst's own plan for it).

    Scale: shipped is a partial-agg groupBy on (part, supp) — the same
    key the partsupp join needs, so AQE reuses the partitioning; part
    filters broadcast; the final DISTINCT-suppkey set is tiny and the
    supplier join is a broadcast semi join."""
    part, supplier = load_tables(spark, sf_dir, "part", "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= ntz("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ntz("1997-01-01 00:00:00"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("qty_1996"))
    )
    excess = (
        _partsupp(spark, sf_dir)
        .join(
            F.broadcast(part.filter(F.col("p_name").like("%widget%"))),
            F.col("p_partkey") == F.col("ps_partkey"),
        )
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("qty_1996") / 2.0)
        .select("ps_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            F.broadcast(excess), F.col("ps_suppkey") == F.col("s_suppkey")
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
