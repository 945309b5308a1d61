"""Scalar function batteries (SURVEY §2.8): string, date/time, math,
regex, and array/higher-order functions — all JVM builtins inside
whole-stage codegen (no Python in the hot path anywhere here).

These generalize the reference's hard-coded scalar usage (strip/split/
lower/str-coercion at app.py:197-261, regexes at app.py:236-240) into
the full library surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


@query("string_funcs", oracle="""
SELECT p_partkey,
       upper(p_type) AS type_upper,
       lower(p_brand) AS brand_lower,
       substring(p_name, 1, 8) AS name_prefix,
       CAST(length(p_name) AS INT) AS name_len,
       concat_ws('|', p_brand, p_type) AS brand_type,
       replace(p_name, ' ', '_') AS name_snake,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       split_part(p_name, ' ', 1) AS first_word,
       reverse(p_brand) AS brand_rev,
       CAST(contains(p_type, 'ECO') AS BOOLEAN) AS is_eco
FROM part
""")
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace("p_name", F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split_part("p_name", F.lit(" "), F.lit(1)).alias("first_word"),
        F.reverse("p_brand").alias("brand_rev"),
        F.contains("p_type", F.lit("ECO")).alias("is_eco"),
    )


@query("date_funcs", oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(month(o_orderdate) AS INT) AS o_month,
       CAST(day(o_orderdate) AS INT) AS o_day,
       CAST(quarter(o_orderdate) AS INT) AS o_quarter,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS o_dow,
       CAST(weekofyear(o_orderdate) AS INT) AS o_week,
       date_trunc('month', o_orderdate) AS month_start,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INT)
         AS days_to_1999,
       strftime(o_orderdate, '%Y-%m') AS order_month,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
FROM orders
""")
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery. DuckDB parity notes: Spark dayofweek is
    1=Sunday vs DuckDB 0=Sunday (+1 in the oracle); epoch of an NTZ
    timestamp is interpreted in the UTC session timezone on both sides."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("int").alias("o_year"),
        F.month(d).cast("int").alias("o_month"),
        F.dayofmonth(d).cast("int").alias("o_day"),
        F.quarter(d).cast("int").alias("o_quarter"),
        F.dayofweek(d).cast("int").alias("o_dow"),
        F.weekofyear(d).cast("int").alias("o_week"),
        F.date_trunc("month", d).cast("timestamp_ntz").alias("month_start"),
        # string-typed: Spark DATE surfaces as datetime.date but DuckDB DATE
        # surfaces as a timestamp in pandas, which breaks the value hash
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.to_date(F.lit("1999-01-01")), d).cast("int").alias("days_to_1999"),
        F.date_format(d, "yyyy-MM").alias("order_month"),
        F.unix_timestamp(d.cast("timestamp")).alias("epoch_s"),
    )


@query("math_funcs", oracle="""
SELECT l_orderkey, l_linenumber,
       sqrt(l_quantity) AS qty_sqrt,
       pow(l_quantity, 2) AS qty_sq,
       abs(l_tax - 0.04) AS tax_dev,
       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
       CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil7,
       round(ln(l_extendedprice), 6) AS price_ln,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
FROM lineitem
""")
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery. sqrt is IEEE-exact on both engines; ln may differ in
    the last ulp between libm implementations, hence the round(6)."""
    li = load_table(spark, sf_dir, "lineitem")
    q, price = F.col("l_quantity"), F.col("l_extendedprice")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.sqrt(q).alias("qty_sqrt"),
        F.pow(q, 2).alias("qty_sq"),
        F.abs(F.col("l_tax") - 0.04).alias("tax_dev"),
        F.floor(price / 1000).cast("bigint").alias("price_k_floor"),
        F.ceil(q / 7).cast("bigint").alias("qty_ceil7"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod7"),
    )


@query("regex_funcs", oracle="""
SELECT c_custkey,
       regexp_extract(c_name, '([0-9]+)', 1) AS cust_num,
       CAST(len(regexp_extract_all(c_name, '[0-9]')) AS INT) AS n_digits,
       regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
       CAST(regexp_matches(c_name, '^Customer#[0-9]{9}$') AS BOOLEAN) AS name_ok
FROM customer
""")
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex battery (generalizes the reference's extraction regexes,
    app.py:236-240). Note DuckDB regexp_replace needs the 'g' flag to
    match Spark's replace-all default."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("cust_num"),
        F.size(F.regexp_extract_all("c_name", F.lit(r"[0-9]"), 0)).cast("int").alias("n_digits"),
        F.regexp_replace("c_name", r"[0-9]+", "#").alias("name_masked"),
        F.col("c_name").rlike(r"^Customer#[0-9]{9}$").alias("name_ok"),
    )


@query("array_funcs", oracle="""
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
SELECT doc_id,
       CAST(len(tokens) AS INT) AS n_tokens,
       tokens[1] AS first_token,
       CAST(len(list_distinct(tokens)) AS INT) AS n_distinct,
       CAST(list_contains(tokens, 'spark') AS BOOLEAN) AS has_spark,
       array_to_string(list_sort(tokens)[1:3], ',') AS first3_sorted,
       CAST(len(list_filter(tokens, w -> length(w) > 5)) AS INT) AS n_long,
       CAST(list_aggregate(list_transform(tokens, w -> length(w)), 'sum') AS BIGINT)
         AS total_chars
FROM tk
""")
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order function battery (explode-free: transform /
    filter / aggregate run inside codegen, no shuffle, no Python)."""
    d = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(tokens).cast("int").alias("n_tokens"),
        F.element_at(tokens, 1).alias("first_token"),
        F.size(F.array_distinct(tokens)).cast("int").alias("n_distinct"),
        F.array_contains(tokens, "spark").alias("has_spark"),
        F.array_join(F.slice(F.sort_array(tokens), 1, 3), ",").alias("first3_sorted"),
        F.size(F.filter(tokens, lambda w: F.length(w) > 5)).cast("int").alias("n_long"),
        F.aggregate(
            tokens, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
        ).alias("total_chars"),
    )


@query("explode_posexplode", oracle="""
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
            WHERE doc_id < 20)
SELECT doc_id,
       CAST(unnest(range(0, len(tokens))) AS INT) AS pos,
       unnest(tokens) AS tok
FROM tk
""")
def explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array -> rows with position (0-based in Spark;
    DuckDB ordinality is 1-based, adjusted in the oracle)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
        .select("doc_id", F.col("pos").cast("int").alias("pos"), "tok")
    )


@query("map_funcs", oracle="""
SELECT event_id,
       list_sort(json_keys(props)) AS prop_keys,
       CAST(len(json_keys(props)) AS INT) AS n_props,
       CAST(props->>'$.k' AS INT) AS k_val
FROM events
""")
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column battery (SURVEY §2.8 map lib): JSON -> map,
    map_keys / size / element_at, deterministic via sorted key arrays."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.array_sort(F.map_keys(m)).alias("prop_keys"),
        F.size(m).alias("n_props"),
        F.element_at(m, "k").alias("k_val"),
    )
