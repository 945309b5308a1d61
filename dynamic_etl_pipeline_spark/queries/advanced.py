"""Remaining §2 surface: exact + approximate percentiles, approximate
distinct counts, SQL GROUPING SETS, and a bucketized range join.

Engine-NATIVE approx sketches (HLL, KLL/GK) are engine-specific —
Spark's and DuckDB's estimates differ by construction — so those
entries are rows-only (tagged baseline= in the registry) and
bounded-relative-error-vs-exact is asserted in tests/test_approx.py.
Round 7 adds PORTABLE twins built from deterministic md5-derived
order statistics / samples, whose every intermediate the DuckDB
oracle re-derives (the r6 playbook that converted the LSH family):

- agg_distinct_kmv        — KMV (k-minimum-values) distinct sketch
- agg_quantile_hash_sample — hash-Bernoulli sample + exact rank
- events_kmv_sketch_rollup — mergeable per-day KMV sketches, unioned

Everything else holds an exact oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.twolevel import two_level_quantiles
from ._helpers import spread
from .registry import query

# --- portable KMV distinct sketch (Bar-Yossef et al. 2002, "Counting
# distinct elements in a data stream") over a deterministic 48-bit
# md5-prefix hash. Both engines fold the SAME 12 hex digits, so the
# k-th order statistic — and therefore the estimate (k-1)*|H|/h_(k) —
# is an exact integer match, unlike HLL whose register layout is
# engine-private. 48 bits keeps (k-1)*|H| far inside BIGINT.
_KMV_K = 64
_KMV_HEX = 12
_KMV_SPACE = 16 ** _KMV_HEX  # 2^48


def _kmv_hash(c: Column) -> Column:
    """48-bit portable hash: first 12 hex digits of md5(str(value))."""
    return F.conv(
        F.substring(F.md5(c.cast("string").cast("binary")), 1, _KMV_HEX),
        16, 10,
    ).cast("long")


def _hex_fold(col: str, ndigits: int) -> str:
    """DuckDB expression folding ``ndigits`` hex chars of column
    ``col`` into a BIGINT — digit-for-digit the same value Spark's
    conv(substring(md5 ..), 16, 10) produces."""
    fold = f"instr('0123456789abcdef', substr({col}, 1, 1)) - 1"
    for k in range(2, ndigits + 1):
        fold = (f"({fold}) * 16 + "
                f"instr('0123456789abcdef', substr({col}, {k}, 1)) - 1")
    return fold


# Estimate arithmetic stays in exact integers on both engines:
# (k-1) * 2^48 as a literal, floor-divided by the k-th minimum hash
# (greatest(h,1) guards the measure-zero all-zero md5 prefix, which
# DuckDB would turn into a division error and Spark into NULL).
_KMV_NUM = (_KMV_K - 1) * _KMV_SPACE


def kmv_distinct(df: DataFrame, group_col: str, val_col: str,
                 shards: int = 64) -> DataFrame:
    """Per-group KMV distinct sketch + estimate (see agg_distinct_kmv).
    Returns (group_col, n_distinct, kth_min_hash, kmv_estimate) — the
    construction the fuzz suite re-derives in DuckDB on random frames
    (tests/test_portable_hash_fuzz.py).

    SKEW-SAFE two-level shape: a naive
    ``Window.partitionBy(group).orderBy(hash)`` sorts a group's ENTIRE
    distinct-hash set in one task — a hot group at 100 TB (billions of
    distinct keys under one l_returnflag) lands on one executor. Level
    1 therefore takes the k smallest per (group, hash mod shards) — no
    window partition ever exceeds ~distinct/shards rows — and level 2
    re-takes the k smallest of the <= shards*k survivors per group.
    Output is IDENTICAL to the flat construction (any globally-k-small
    hash is k-small within its own shard — the same merge-equals-
    resketch invariant events_kmv_sketch_rollup demonstrates across
    days), which is why the flat DuckDB oracle and the random-frame
    fuzz check this plan without modification. The exact group size
    ``nd`` comes from a two-level hash aggregate, not the window.

    NULL values are dropped up front (ADVICE r7: _kmv_hash maps NULL
    to a NULL hv, which Spark windows order FIRST and DuckDB LAST —
    the filter removes the divergence and matches COUNT(DISTINCT)'s
    null-skipping semantics; the oracle carries the same WHERE)."""
    dh = (
        df.filter(F.col(val_col).isNotNull())
        .select(group_col, _kmv_hash(F.col(val_col)).alias("hv"))
        .distinct()
    )
    nd = dh.groupBy(group_col).agg(F.count("*").alias("nd"))
    ws = Window.partitionBy(
        group_col, F.pmod(F.col("hv"), F.lit(shards))
    ).orderBy("hv")
    lvl1 = (
        dh.withColumn("_srn", F.row_number().over(ws))
        .filter(F.col("_srn") <= _KMV_K)
        .drop("_srn")
    )
    wo = Window.partitionBy(group_col).orderBy("hv")
    ranked = lvl1.select(
        group_col, "hv", F.row_number().over(wo).alias("rn")
    )
    k = F.lit(_KMV_K)
    return (
        ranked.join(nd, group_col)
        .filter(
            F.col("rn")
            == F.when(F.col("nd") < k, F.col("nd")).otherwise(k)
        )
        .select(
            group_col,
            F.col("nd").cast("bigint").alias("n_distinct"),
            F.col("hv").cast("bigint").alias("kth_min_hash"),
            F.when(F.col("nd") < k, F.col("nd"))
            .otherwise(
                F.expr(f"{_KMV_NUM} div greatest(hv, 1)")
            )
            .cast("bigint")
            .alias("kmv_estimate"),
        )
    )


def _kmv_oracle(src: str, group: str, val: str) -> str:
    """DuckDB oracle for :func:`kmv_distinct` over table ``src``."""
    return f"""
WITH hashed AS (
  SELECT {group}, md5(CAST({val} AS VARCHAR)) AS h FROM {src}
  WHERE {val} IS NOT NULL
), dh AS (
  SELECT DISTINCT {group}, {_hex_fold('h', _KMV_HEX)} AS hv FROM hashed
), ranked AS (
  SELECT {group}, hv,
         row_number() OVER (PARTITION BY {group} ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY {group}) AS nd
  FROM dh
)
SELECT {group},
       CAST(nd AS BIGINT) AS n_distinct,
       CAST(hv AS BIGINT) AS kth_min_hash,
       CAST(CASE WHEN nd < {_KMV_K} THEN nd
                 ELSE {_KMV_NUM} // greatest(hv, 1) END AS BIGINT)
         AS kmv_estimate
FROM ranked
WHERE rn = CASE WHEN nd < {_KMV_K} THEN nd ELSE {_KMV_K} END
"""


@query("agg_percentiles", oracle="""
SELECT o_orderpriority,
       round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 4) AS p50,
       round(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE), 4) AS p90,
       round(CAST(quantile_cont(o_totalprice, 0.99) AS DOUBLE), 4) AS p99
FROM orders
GROUP BY o_orderpriority
""")
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (== DuckDB
    ``quantile_cont``), r8: via the GROUPED two-level bucketed rank
    (operators/twolevel.two_level_quantiles, part_cols mode). Spark's
    native per-group ``percentile`` holds an O(distinct values in the
    group) value->count map in its merge state — data-sized for a hot
    group over a continuous measure at 100 TB. The two-level form's
    state never exceeds one (group, price-bucket) cell; the
    interpolated doubles are bit-identical to ``F.percentile``'s
    (fuzzed in tests/test_twolevel.py), so the oracle is unchanged.

    NULL-group note (ADVICE r8): grouped two_level_quantiles OMITS
    groups whose measure is all-NULL (percentile..GROUP BY would emit
    them with NULL quantiles) — fine here because o_totalprice is
    non-null in every TPC-H row; a nullable measure would need the
    plain grouped percentile row-set."""
    out = two_level_quantiles(
        load_table(spark, sf_dir, "orders"), "o_totalprice",
        lambda c: F.floor(c / F.lit(500.0)).cast("long"),
        [0.5, 0.9, 0.99],
        part_cols=["o_orderpriority"],
    )
    return out.select(
        "o_orderpriority",
        F.round(F.col("q0_all"), 4).alias("p50"),
        F.round(F.col("q1_all"), 4).alias("p90"),
        F.round(F.col("q2_all"), 4).alias("p99"),
    )


@query("agg_approx_distinct",
       baseline="engine-specific HLL++ estimate (rows-only by design); "
                "exact-oracled twin: agg_distinct_kmv")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++): the constant-memory path for
    COUNT(DISTINCT) at 100 TB — mergeable sketches, no
    distinct-expansion shuffle. Relative error vs exact is asserted in
    tests/test_approx.py."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        )
        .orderBy("l_returnflag")
    )


@query("agg_approx_quantile",
       baseline="engine-specific GK-sketch quantiles (rows-only by "
                "design); exact-oracled twin: agg_quantile_hash_sample")
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile: single-pass mergeable quantile sketch (the
    scale path the exact percentile query above can't take)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .agg(
            F.approx_percentile(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), 10000
            ).alias("price_quantiles")
        )
    )


@query("agg_distinct_kmv",
       oracle=_kmv_oracle("lineitem", "l_returnflag", "l_orderkey"))
def agg_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, the PORTABLE
    exact-oracled twin of agg_approx_distinct's engine-native HLL++:
    per group keep the k=64 smallest distinct 48-bit md5-prefix hashes;
    the k-th minimum h_(k) estimates |D| as (k-1)*|H|/h_(k) (Bar-Yossef
    et al. 2002). Every intermediate — the hash, the order statistic,
    the floor-divided estimate — is an exact integer both engines
    derive identically, so the oracle checks VALUES, not error bounds.

    Scale shape: same distinct-shuffle as exact countDistinct here
    (the top-k-per-group window); the 100-TB win is the sketch's
    mergeability — 64 bigints per group shard, merged by re-taking the
    64 smallest — which events_kmv_sketch_rollup demonstrates as a
    two-level rollup. Groups with fewer than k distinct values fall
    back to the exact count (the sketch is the complete hash set).
    Estimate accuracy vs exact distinct is additionally bounded in
    tests/test_approx.py; arbitrary-frame parity is fuzzed in
    tests/test_portable_hash_fuzz.py."""
    # Project to the two live columns BEFORE the spread shuffle (guide
    # §2.3: shuffle fewer bytes), then spread (r12 opt): the md5-prefix
    # hash otherwise runs on the single-row-group scan task. Measured
    # x0.77 at sf0.1 (2.07 -> 1.59 s best-of-4).
    return kmv_distinct(
        spread(
            load_table(spark, sf_dir, "lineitem")
            .select("l_returnflag", "l_orderkey")
        ),
        "l_returnflag", "l_orderkey",
    )


@query("agg_quantile_hash_sample", oracle="""
WITH keyed AS (
  SELECT l_extendedprice,
         substr(md5(CAST(l_orderkey AS VARCHAR) || '#'
                    || CAST(l_linenumber AS VARCHAR)), 1, 1)
           IN ('0', '1', '2', '3') AS samp
  FROM lineitem
)
SELECT count(*) AS n_total,
       CAST(count(*) FILTER (samp) AS BIGINT) AS n_sample,
       round(CAST(quantile_cont(CASE WHEN samp THEN l_extendedprice END,
                                0.5) AS DOUBLE), 4) AS p50_sample,
       round(CAST(quantile_cont(CASE WHEN samp THEN l_extendedprice END,
                                0.95) AS DOUBLE), 4) AS p95_sample,
       round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 4)
         AS p50_exact,
       round(CAST(quantile_cont(l_extendedprice, 0.95) AS DOUBLE), 4)
         AS p95_exact
FROM keyed
""")
def agg_quantile_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles by deterministic hash-Bernoulli sampling —
    the PORTABLE exact-oracled twin of agg_approx_quantile's
    engine-native GK sketch. Membership is a pure function of the row
    key (first md5 hex digit of orderkey#linenumber < '4', a fixed 25%
    rate), so the sample — and therefore the interpolated sample
    quantile — is identical in any engine, unlike seeded-RNG sampling
    or sketch internals. The exact full-data quantiles ride along so
    the sampling error is itself visible in the checked output.

    Scale shape (r8 — the r7 verdict's one un-guarded merge-state
    boundary, removed): Spark's exact ``percentile`` is a
    TypedImperativeAggregate whose final merge holds an O(distinct
    measure values) value->count map on ONE reducer — measured at
    149 s over 60M rows at the 100x corpus, and data-sized for a
    continuous measure at 100 TB. Both the exact AND the sampled
    quantiles are therefore computed by
    :func:`operators.twolevel.two_level_quantiles`: one map-side
    combined bucket-count scan (buckets = floor(price/100), ~1k
    buckets over the bounded TPC-H price domain), a prefix sum over
    the one-row-per-bucket frame, then a second scan restricted to
    the <=8 rank-bracketing buckets. No aggregate state anywhere
    exceeds one bucket; the interpolation reproduces
    ``F.percentile``'s doubles bit-for-bit (fuzzed in
    tests/test_twolevel.py), so the DuckDB oracle is unchanged. The
    sample channel (a pure function of the row key) shares both
    scans with the exact channel."""
    li = load_table(spark, sf_dir, "lineitem")
    samp = F.substring(
        F.md5(
            F.concat(
                F.col("l_orderkey").cast("string"),
                F.lit("#"),
                F.col("l_linenumber").cast("string"),
            ).cast("binary")
        ),
        1, 1,
    ).isin("0", "1", "2", "3")
    out = two_level_quantiles(
        li, "l_extendedprice",
        lambda c: F.floor(c / F.lit(100.0)).cast("long"),
        [0.5, 0.95],
        channels=(("all", None), ("samp", samp)),
    )
    return out.select(
        F.col("n_all").alias("n_total"),
        F.col("n_samp").alias("n_sample"),
        F.round(F.col("q0_samp"), 4).alias("p50_sample"),
        F.round(F.col("q1_samp"), 4).alias("p95_sample"),
        F.round(F.col("q0_all"), 4).alias("p50_exact"),
        F.round(F.col("q1_all"), 4).alias("p95_exact"),
    )


@query("grouping_sets_flag_status", oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""")
def grouping_sets_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through spark.sql (rollup/cube cousins are
    covered in queries/relational.py)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_gs"
    )
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)


@query("range_join_clicks_before_purchase", oracle="""
SELECT p.event_id AS purchase_id, count(c.event_id) AS n_clicks_1h
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL '1 hour'
 AND c.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
""")
def range_join_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join, bucketized: clicks within the hour before
    each purchase.

    A naive theta-join is a broadcast-nested-loop over |purchases| x
    |clicks|. Bucketizing ts to 1-hour grains turns it into an
    EQUI-join on (user_id, bucket) — each purchase probes its own and
    the previous grain, covering every candidate within the interval —
    then the exact range predicate filters residuals. Shuffle-hash
    scalable at any corpus size; candidate blowup is bounded at 2x.
    """
    ev = load_table(spark, sf_dir, "events")
    grain = F.floor(F.unix_timestamp(F.col("ts")) / 3600).cast("long")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
        grain.alias("c_bucket"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        # probe own + previous grain: covers every click in (p_ts-1h, p_ts)
        F.explode(F.array(grain, grain - 1)).alias("p_bucket"),
    )
    # range predicate lives IN the join so purchases with only
    # out-of-range bucket-mates still keep their left-outer null row
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_bucket") == F.col("c_bucket"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts"))
    )
    matched = purchases.join(clicks, cond, "left")
    # each click carries one bucket, so a (purchase, click) pair joins
    # at most once — plain count, no distinct shuffle needed; the two
    # probe rows of a clickless purchase merge to a single 0-count group
    return (
        matched.groupBy("purchase_id")
        .agg(F.count("click_id").alias("n_clicks_1h"))
    )


@query("udtf_doc_sentences", oracle="""
SELECT d.doc_id, trim(t.s) AS sentence,
       len(string_split_regex(trim(t.s), '\\s+')) AS n_words
FROM documents d, unnest(string_split(d.text, '.')) AS t(s)
WHERE trim(t.s) != ''
""")
def udtf_doc_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 lateral table function) splitting each
    document into sentences — the record-splitting source pattern
    (reference app.py:186-222) as a first-class operator."""
    from ..functions.udtfs import register_udtfs

    register_udtfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql("""
        SELECT d.doc_id, s.sentence, s.n_words
        FROM docs_udtf d, LATERAL split_sentences(d.text) s
    """)


@query("udaf_geo_mean_price", oracle="""
SELECT l_returnflag,
       round(exp(avg(ln(l_extendedprice))), 4) AS geo_mean_price,
       count(*) AS n
FROM lineitem
WHERE l_extendedprice > 0
GROUP BY l_returnflag
""")
def udaf_geo_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF (SURVEY §2.11): geometric mean per
    return flag. Arrow-batched per group; the log-domain math makes the
    result order-insensitive, so it holds an exact oracle."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG: `from __future__ import annotations` makes
    # type hints strings this module can't resolve for inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def geo_mean(v):
        return float(np.exp(np.log(v.to_numpy()).mean()))

    # pandas UDAFs can't share an agg() with built-in aggregates, so the
    # row count is a (trivial) pandas UDAF as well
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def n_rows(v):
        return len(v)

    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice") > 0)
        .groupBy("l_returnflag")
        .agg(
            F.round(geo_mean("l_extendedprice"), 4).alias("geo_mean_price"),
            n_rows("l_extendedprice").alias("n"),
        )
    )


@query("grouped_map_user_zscores", oracle="""
WITH stats AS (
  SELECT event_id, user_id, value,
         avg(value) OVER (PARTITION BY user_id) AS mu,
         stddev_samp(value) OVER (PARTITION BY user_id) AS sd,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events WHERE value IS NOT NULL
)
SELECT event_id, user_id, round(CAST((value - mu) / sd AS DOUBLE), 4) AS z
FROM stats WHERE n > 1 AND sd > 0
""")
def grouped_map_user_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (SURVEY §2.11): per-user z-score
    normalization — each user's partition arrives as one pandas frame.
    Expressible as a window too (that's the oracle); the pattern is the
    scaffold for per-group logic SQL can't state (model scoring,
    per-entity fitting)."""
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pdf.iloc[0:0][["event_id", "user_id"]].assign(z=0.0)
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        if not sd or sd != sd:
            return pdf.iloc[0:0][["event_id", "user_id"]].assign(z=0.0)
        out = pdf[["event_id", "user_id"]].copy()
        out["z"] = ((pdf["value"] - mu) / sd).round(4)
        return out

    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(zscore, "event_id long, user_id long, z double")
    )


@query("agg_stats_battery", oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 6) AS sd_qty,
       round(var_samp(l_quantity), 6) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_qty_price,
       round(skewness(l_quantity), 4) AS skew_qty,
       round(kurtosis(l_quantity), 4) AS kurt_qty
FROM lineitem
GROUP BY l_returnflag
""")
def agg_stats_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate battery: stddev/variance/corr/covar/
    skewness/kurtosis per return flag (single-pass moment aggregates;
    partial+final merge like any hash agg). Higher moments round to 4:
    the engines use different numerically-stable one-pass updates and
    agree only to ~1e-6."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 4).alias("kurt_qty"),
    )


@query("agg_argmax", oracle="""
SELECT o_orderpriority,
       arg_max(o_orderkey, o_totalprice) AS biggest_order,
       round(max(o_totalprice), 2) AS biggest_price,
       arg_min(o_orderkey, o_totalprice) AS smallest_order,
       mode(o_orderstatus) AS common_status
FROM orders
GROUP BY o_orderpriority
""")
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by / mode: the keep-the-row-that-wins aggregates
    (one hash agg, no window + filter detour)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.round(F.max("o_totalprice"), 2).alias("biggest_price"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.mode("o_orderstatus").alias("common_status"),
    )


_SQL_FACADE_CTE = """
WITH yearly AS (
  SELECT n_name,
         year(o_orderdate) AS o_year,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(27,6))) AS DOUBLE) AS revenue
  FROM {customer} c
  JOIN {orders} o ON o.o_custkey = c.c_custkey
  JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
  JOIN {nation} n ON n.n_nationkey = c.c_nationkey
  GROUP BY n_name, year(o_orderdate)
), ranked AS (
  SELECT n_name, o_year, revenue,
         CAST(row_number() OVER (PARTITION BY o_year
                                 ORDER BY revenue DESC, n_name) AS INT) AS rk,
         round(revenue - lag(revenue) OVER (PARTITION BY n_name
                                            ORDER BY o_year), 4) AS yoy_delta
  FROM yearly
)
SELECT n_name, o_year, round(revenue, 4) AS revenue, rk, yoy_delta
FROM ranked
WHERE rk <= 3
"""


@query("sql_facade_nation_league", oracle=_SQL_FACADE_CTE.format(
    customer="customer", orders="orders", lineitem="lineitem", nation="nation"
))
def sql_facade_nation_league(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ANSI-SQL front door: one statement with chained CTEs,
    a 4-way join, grouped aggregation, and two window families
    (partitioned ranking + lag), executed verbatim via spark.sql over
    registered views — the oracle runs the IDENTICAL text on DuckDB,
    demonstrating that a reference user can bring plain SQL unchanged.
    Catalyst plans it exactly like the DataFrame twin (broadcast the
    nation dim, one shuffle per agg/window key)."""
    from ..catalog import load_table as _lt

    for t in ("customer", "orders", "lineitem", "nation"):
        _lt(spark, sf_dir, t).createOrReplaceTempView(f"{t}_sqlf")
    return spark.sql(_SQL_FACADE_CTE.format(
        customer="customer_sqlf", orders="orders_sqlf",
        lineitem="lineitem_sqlf", nation="nation_sqlf",
    ))


@query("agg_boolean_battery", oracle="""
SELECT o_orderpriority,
       CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_orderstatus = 'F') AS any_finished,
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
FROM orders GROUP BY o_orderpriority
""")
def agg_boolean_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate family (count_if / bool_and /
    bool_or) — all partial-aggregatable single-bit state, the cheapest
    aggregates in the engine."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@query("events_hll_sketch_rollup",
       baseline="engine-specific DataSketches HLL estimate (rows-only "
                "by design); exact-oracled twin: events_kmv_sketch_rollup")
def events_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    Spark 4 ``hll_sketch_agg`` / ``hll_union_agg``): build one
    user-distinct sketch PER DAY, then re-aggregate the day sketches to
    per-event-type totals with a sketch UNION — never touching raw rows
    again.

    This is the materialized-view pattern approx_count_distinct can't
    do: approx_count_distinct yields a number (not mergeable), while a
    stored sketch column supports any later rollup (day -> week ->
    all-time) at sketch-size cost. At 100 TB the daily sketch build is
    the only row-sized pass; every re-rollup moves ~KB per group.
    Error vs exact distinct is bounded in tests/test_approx.py; the
    day->union estimate equals re-sketching from scratch because HLL
    register merge is max-based (order- and partition-insensitive)."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(F.hll_sketch_agg("user_id").alias("day_sketch"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count("*").cast("int").alias("n_days"),
            F.hll_sketch_estimate(
                F.hll_union_agg("day_sketch")
            ).cast("bigint").alias("distinct_users_est"),
        )
        .orderBy("event_type")
    )


@query("events_kmv_sketch_rollup", oracle=f"""
WITH hashed AS (
  SELECT date_trunc('day', ts) AS day, event_type,
         md5(CAST(user_id AS VARCHAR)) AS h
  FROM events
), dh AS (
  SELECT DISTINCT day, event_type, {_hex_fold('h', _KMV_HEX)} AS hv
  FROM hashed
), daily AS (
  SELECT day, event_type, hv FROM (
    SELECT day, event_type, hv,
           row_number() OVER (PARTITION BY day, event_type ORDER BY hv)
             AS rn
    FROM dh)
  WHERE rn <= {_KMV_K}
), ndays AS (
  SELECT event_type, CAST(count(DISTINCT day) AS INT) AS n_days
  FROM daily GROUP BY event_type
), merged AS (
  SELECT DISTINCT event_type, hv FROM daily
), ranked AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY event_type) AS nd
  FROM merged
)
SELECT r.event_type, n.n_days,
       CAST(r.hv AS BIGINT) AS kth_min_hash,
       CAST(CASE WHEN r.nd < {_KMV_K} THEN r.nd
                 ELSE {_KMV_NUM} // greatest(r.hv, 1) END AS BIGINT)
         AS distinct_users_est
FROM ranked r JOIN ndays n USING (event_type)
WHERE r.rn = CASE WHEN r.nd < {_KMV_K} THEN r.nd ELSE {_KMV_K} END
""")
def events_kmv_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized-view sketch rollup of events_hll_sketch_rollup,
    rebuilt on PORTABLE KMV sketches so the whole two-level pipeline —
    per-day sketch build, day->event_type sketch UNION, final estimate
    — is value-exact against the DuckDB oracle (the r6 portable-hash
    playbook applied to the last rows-only sketch family).

    Merge correctness is the KMV invariant the plan leans on: the k
    smallest hashes of a union equal the k smallest over the per-part
    k-smallest sets (any globally-small hash is small within its own
    part), so the day->type rollup gives EXACTLY the estimate a from-
    scratch re-sketch would — the same order-insensitivity argument
    the HLL twin makes via max-based register merge, but provable in
    integers. At 100 TB: the raw rows are touched once (per-day
    build); every later rollup moves <=64 bigints per group, and the
    two-level window here is the skew-safe shape (no event_type
    partition ever sorts more than 64 x n_days rows)."""
    e = load_table(spark, sf_dir, "events")
    dh = (
        e.select(
            F.date_trunc("day", "ts").alias("day"),
            "event_type",
            _kmv_hash(F.col("user_id")).alias("hv"),
        )
        .distinct()
    )
    # shard pre-pass (r7, same shape as kmv_distinct): a hot (day,
    # type) cell at corpus scale would otherwise sort its whole
    # distinct-user hash set in one window task; the pmod shard bounds
    # every partition, and k-min of shard k-mins == k-min (merge
    # invariant), so the day sketch below is unchanged.
    wsh = Window.partitionBy(
        "day", "event_type", F.pmod(F.col("hv"), F.lit(64))
    ).orderBy("hv")
    pre = (
        dh.withColumn("_srn", F.row_number().over(wsh))
        .filter(F.col("_srn") <= _KMV_K)
        .drop("_srn")
    )
    wd = Window.partitionBy("day", "event_type").orderBy("hv")
    daily = (
        pre.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= _KMV_K)
        .select("day", "event_type", "hv")
    )
    ndays = (
        daily.select("event_type", "day")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").cast("int").alias("n_days"))
    )
    merged = daily.select("event_type", "hv").distinct()
    wo = Window.partitionBy("event_type").orderBy("hv")
    wp = Window.partitionBy("event_type")
    ranked = merged.select(
        "event_type", "hv",
        F.row_number().over(wo).alias("rn"),
        F.count("*").over(wp).alias("nd"),
    )
    k = F.lit(_KMV_K)
    return (
        ranked.filter(
            F.col("rn")
            == F.when(F.col("nd") < k, F.col("nd")).otherwise(k)
        )
        .join(F.broadcast(ndays), "event_type")
        .select(
            "event_type",
            "n_days",
            F.col("hv").cast("bigint").alias("kth_min_hash"),
            F.when(F.col("nd") < k, F.col("nd"))
            .otherwise(F.expr(f"{_KMV_NUM} div greatest(hv, 1)"))
            .cast("bigint")
            .alias("distinct_users_est"),
        )
    )


def _kmv_overlap_oracle(src: str, group: str, val: str) -> str:
    """DuckDB oracle for :func:`kmv_overlap` over table ``src``
    (templated so the random-frame fuzz can inject a view)."""
    return f"""
WITH hashed AS (
  SELECT {group}, md5(CAST({val} AS VARCHAR)) AS h FROM {src}
  WHERE {val} IS NOT NULL
), dh AS (
  SELECT DISTINCT {group}, {_hex_fold('h', _KMV_HEX)} AS hv FROM hashed
), sk AS (
  SELECT {group}, hv FROM (
    SELECT {group}, hv,
           row_number() OVER (PARTITION BY {group} ORDER BY hv) AS rn
    FROM dh) WHERE rn <= {_KMV_K}
), tp AS (
  SELECT a.{group} AS type_a, b.{group} AS type_b
  FROM (SELECT DISTINCT {group} FROM sk) a
  JOIN (SELECT DISTINCT {group} FROM sk) b
    ON a.{group} < b.{group}
), kept AS (
  SELECT tp.type_a, tp.type_b, s.hv
  FROM tp JOIN sk s ON s.{group} = tp.type_a
  UNION ALL
  SELECT tp.type_a, tp.type_b, s.hv
  FROM tp JOIN sk s ON s.{group} = tp.type_b
), uk AS (
  SELECT type_a, type_b, hv, count(*) AS m
  FROM kept GROUP BY 1, 2, 3
), ranked AS (
  SELECT type_a, type_b, hv, m,
         row_number() OVER (PARTITION BY type_a, type_b ORDER BY hv)
           AS rn,
         count(*) OVER (PARTITION BY type_a, type_b) AS n_uk
  FROM uk
), theta AS (
  SELECT type_a, type_b, hv AS theta, n_uk FROM ranked
  WHERE rn = CASE WHEN n_uk < {_KMV_K} THEN n_uk ELSE {_KMV_K} END
), agg AS (
  SELECT r.type_a, r.type_b,
         max(t.theta) AS theta_hash,
         max(t.n_uk) AS n_union_kept,
         sum(CASE WHEN r.m = 2
                   AND (t.n_uk < {_KMV_K} OR r.hv < t.theta)
                  THEN 1 ELSE 0 END) AS common_cnt
  FROM ranked r JOIN theta t USING (type_a, type_b)
  GROUP BY 1, 2
), ex AS (
  SELECT a.{group} AS type_a, b.{group} AS type_b,
         count(*) AS exact_inter
  FROM (SELECT DISTINCT {group}, {val} FROM {src}
        WHERE {val} IS NOT NULL) a
  JOIN (SELECT DISTINCT {group}, {val} FROM {src}
        WHERE {val} IS NOT NULL) b
    ON a.{val} = b.{val} AND a.{group} < b.{group}
  GROUP BY 1, 2
)
SELECT agg.type_a, agg.type_b,
       CAST(n_union_kept AS BIGINT) AS n_union_kept,
       CAST(theta_hash AS BIGINT) AS theta_hash,
       CAST(common_cnt AS BIGINT) AS common_in_sketch,
       CAST(CASE WHEN n_union_kept < {_KMV_K} THEN common_cnt
                 ELSE common_cnt * {_KMV_SPACE}
                      // greatest(theta_hash, 1) END AS BIGINT)
         AS inter_est,
       CAST(CASE WHEN n_union_kept < {_KMV_K} THEN n_union_kept
                 ELSE {_KMV_NUM} // greatest(theta_hash, 1) END AS BIGINT)
         AS union_est,
       CAST(coalesce(ex.exact_inter, 0) AS BIGINT) AS exact_inter
FROM agg LEFT JOIN ex USING (type_a, type_b)
"""


@query("events_kmv_type_overlap",
       oracle=_kmv_overlap_oracle("events", "event_type", "user_id"))
def events_kmv_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta-sketch SET OPERATIONS: estimate the distinct-user
    INTERSECTION (and union) of every event-type pair from the 64-hash
    sketches alone — the capability mergeable distinct sketches exist
    for and HLL can only approach via error-amplifying
    inclusion-exclusion. Estimator (Beyer et al. 2007 / theta-sketch
    combine rule): theta = k-th smallest hash of the two kept sets'
    union; any true-intersection element hashing below theta is
    provably in BOTH kept sets (theta <= each sketch's own k-th min),
    so the common-below-theta count is exactly computable from the
    sketches and |A inter B| ~= common * |H| / theta — all integers,
    re-derived bit-for-bit by the oracle. When the union keeps fewer
    than k hashes both sketches are complete and the estimates
    degenerate to exact counts. The exact per-pair intersection rides
    along so the estimator error is checked output (accuracy bound in
    tests/test_approx.py).

    At 100 TB: the pairwise stage touches only |types|^2 x k sketch
    rows — corpus-sized data is read once to build the per-type
    sketches (same shard-decomposed two-level shape as kmv_distinct);
    comparing two CORPORA for audience/dedup overlap moves kilobytes,
    not rows (the ``check=False`` production mode; the registered
    query keeps the exact ride-along ON because the estimator error is
    part of the CHECKED output)."""
    return kmv_overlap(
        load_table(spark, sf_dir, "events"), "event_type", "user_id"
    )


def kmv_overlap(df: DataFrame, group_col: str, val_col: str,
                check: bool = True) -> DataFrame:
    """Theta-sketch pairwise overlap over any (group, value) frame —
    the construction events_kmv_type_overlap registers; fuzzed on
    random frames in tests/test_portable_hash_fuzz.py.

    ``check=False`` (the production mode at scale) drops the
    ``exact_inter`` ride-along column and with it the only
    corpus-sized structure in the pairwise stage: the ride-along joins
    the full distinct (group, value) frame per pair — linear and fine
    at fixture scale, but at 100 TB it re-reads the data the sketch
    stage exists to avoid. With ``check=False`` everything after the
    one sketch-building scan touches only |groups|^2 x k sketch rows
    (plan-pinned in tests/test_plans.py). NULL values are dropped up
    front on both engine and oracle (ADVICE r7 — NULLs order
    differently under Spark and DuckDB windows)."""
    nn = df.filter(F.col(val_col).isNotNull())
    dh = (
        nn.select(group_col, _kmv_hash(F.col(val_col)).alias("hv"))
        .distinct()
    )
    du = nn.select(group_col, val_col).distinct() if check else None
    return _kmv_overlap_from_hashes(dh, du, group_col, val_col)


def _kmv_overlap_from_hashes(dh: DataFrame, du: DataFrame | None,
                             group_col: str, val_col: str) -> DataFrame:
    wsh = Window.partitionBy(
        group_col, F.pmod(F.col("hv"), F.lit(64))
    ).orderBy("hv")
    pre = (
        dh.withColumn("_srn", F.row_number().over(wsh))
        .filter(F.col("_srn") <= _KMV_K)
        .drop("_srn")
    )
    wt = Window.partitionBy(group_col).orderBy("hv")
    sk = (
        pre.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= _KMV_K)
        .select(group_col, "hv")
    )
    # Materialize the (tiny, <= |groups| x k rows) sketch ONCE: the
    # pairwise stage references sk from 6 plan branches (types, tp x2,
    # kept x2, ...) whose per-branch column pruning gives each branch
    # a DIFFERENT canonicalized scan, so exchange reuse does NOT
    # collapse them — measured 13 real corpus scans per execution at
    # sf0.01 without this. With the checkpoint the corpus is read
    # once (the "corpus read once" contract the docstring claims);
    # lazy so the returned frame stays unexecuted until the caller
    # acts. materialize() keeps it cluster-safe.
    from ..materialize import materialize

    sk = materialize(sk, eager=False)
    types = sk.select(group_col).distinct()
    tp = (
        types.select(F.col(group_col).alias("type_a"))
        .crossJoin(
            F.broadcast(types.select(F.col(group_col).alias("type_b")))
        )
        .filter(F.col("type_a") < F.col("type_b"))
    )
    kept = (
        tp.join(sk, sk[group_col] == tp["type_a"])
        .select("type_a", "type_b", "hv")
        .unionAll(
            tp.join(sk, sk[group_col] == tp["type_b"])
            .select("type_a", "type_b", "hv")
        )
    )
    uk = kept.groupBy("type_a", "type_b", "hv").agg(
        F.count("*").alias("m")
    )
    wu = Window.partitionBy("type_a", "type_b").orderBy("hv")
    wp = Window.partitionBy("type_a", "type_b")
    ranked = uk.select(
        "type_a", "type_b", "hv", "m",
        F.row_number().over(wu).alias("rn"),
        F.count("*").over(wp).alias("n_uk"),
    )
    k = F.lit(_KMV_K)
    theta = (
        ranked.filter(
            F.col("rn")
            == F.when(F.col("n_uk") < k, F.col("n_uk")).otherwise(k)
        )
        .select(
            "type_a", "type_b",
            F.col("hv").alias("theta"), F.col("n_uk").alias("_nu"),
        )
    )
    agg = (
        ranked.join(theta, ["type_a", "type_b"])
        .groupBy("type_a", "type_b")
        .agg(
            F.max("theta").alias("theta_hash"),
            F.max("_nu").alias("n_union_kept"),
            F.sum(
                F.when(
                    (F.col("m") == 2)
                    & ((F.col("_nu") < k) | (F.col("hv") < F.col("theta"))),
                    1,
                ).otherwise(0)
            ).alias("common_cnt"),
        )
    )
    nu, th, cc = (
        F.col("n_union_kept"), F.col("theta_hash"), F.col("common_cnt")
    )
    cols = [
        F.col("type_a"), F.col("type_b"),
        nu.cast("bigint").alias("n_union_kept"),
        th.cast("bigint").alias("theta_hash"),
        cc.cast("bigint").alias("common_in_sketch"),
        F.when(nu < k, cc)
        .otherwise(
            F.expr(
                f"common_cnt * {_KMV_SPACE} div greatest(theta_hash, 1)"
            )
        )
        .cast("bigint")
        .alias("inter_est"),
        F.when(nu < k, nu)
        .otherwise(
            F.expr(f"{_KMV_NUM} div greatest(theta_hash, 1)")
        )
        .cast("bigint")
        .alias("union_est"),
    ]
    if du is None:  # production mode: sketch rows only past the scan
        return agg.select(*cols)
    ex = (
        du.select(F.col(group_col).alias("type_a"), val_col)
        .join(
            du.select(F.col(group_col).alias("type_b"), val_col),
            val_col,
        )
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("exact_inter"))
    )
    return (
        agg.join(ex, ["type_a", "type_b"], "left")
        .select(
            *cols,
            F.coalesce(F.col("exact_inter"), F.lit(0))
            .cast("bigint")
            .alias("exact_inter"),
        )
    )


@query("rollup_grouping_id", oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicator columns: the standard way to tell a real
    NULL group from a rollup subtotal row (rollup/cube values are
    covered elsewhere; this pins the indicator semantics)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")
    )


@query("scalar_try_funcs", oracle="""
SELECT o_orderkey,
       TRY_CAST(o_orderpriority AS INTEGER) AS prio_int,
       TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
       round(o_totalprice / NULLIF(o_custkey % 3, 0), 6) AS risky_ratio,
       CAST(TRY_CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date
FROM orders
""")
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe try_* family: Spark 4 runs ANSI mode ON, so a bad cast
    or division by zero in a 10-billion-row job is a runtime ERROR
    unless handled — try_cast/try_divide are the per-expression opt-out
    that yields NULL instead of killing the job ('1-URGENT' -> NULL,
    x/0 -> NULL). The oracle mirrors with TRY_CAST and NULLIF."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("prio_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
        F.round(
            F.try_divide("o_totalprice", F.col("o_custkey") % 3), 6
        ).alias("risky_ratio"),
        F.col("o_orderdate").try_cast("date").cast("timestamp_ntz")
        .alias("order_date"),
    )


@query("udtf_session_summary", oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS seq
  FROM flagged
), sess AS (
  SELECT user_id, seq, count(*) AS n FROM numbered GROUP BY 1, 2
)
SELECT user_id, CAST(count(*) AS INT) AS n_sessions,
       CAST(max(n) AS INT) AS longest_session,
       CAST(sum(n) AS INT) AS n_events
FROM sess GROUP BY user_id
""")
def udtf_session_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned TABLE-argument UDTF (Spark 4 §2.11 surface): the
    engine shuffles events by user and streams each user's rows in ts
    order through a stateful Python session-walker that emits one
    summary row per user from terminate(). Exact against the
    lag/cumsum sessionization SQL — the same per-key custom
    aggregation, two very different execution surfaces."""
    from ..functions.udtfs import register_udtfs

    register_udtfs(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_ss")
    return spark.sql("""
        SELECT * FROM session_summary(
            TABLE(events_ss) PARTITION BY user_id ORDER BY (ts, event_id))
    """)


@query("sql_pivot_facade", oracle="""
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
FROM orders
GROUP BY 1
""")
def sql_pivot_facade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT clause (the DataFrame pivot() is covered by
    pivot_status_by_year): Spark rewrites the clause to the same
    conditional-aggregation plan the oracle states directly, so the
    pivot adds zero execution cost over a grouped CASE battery."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_pv")
    return spark.sql("""
        SELECT * FROM (
            SELECT CAST(year(o_orderdate) AS INT) AS order_year,
                   o_orderstatus
            FROM orders_pv
        )
        PIVOT (count(*) FOR o_orderstatus IN ('F' AS n_f, 'O' AS n_o,
                                              'P' AS n_p))
    """)


@query("sql_unpivot_facade", oracle="""
SELECT o_orderkey, 'total_price' AS metric, o_totalprice AS val
FROM orders
UNION ALL
SELECT o_orderkey, 'acct_balance' AS metric, c_acctbal AS val
FROM orders JOIN customer ON o_custkey = c_custkey
""")
def sql_unpivot_facade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL UNPIVOT clause (DataFrame melt is covered by
    unpivot_flag_measures): wide measure columns rotate to (metric,
    val) rows without the UNION-of-scans the oracle spells out —
    Spark's Expand operator emits both rows in one pass over the
    join. INCLUDE NULLS: UNPIVOT drops NULL measures by default, the
    oracle's UNION ALL keeps them — the equivalence must not depend
    on the fixture's columns happening to be non-null."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_up")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("cust_up")
    return spark.sql("""
        SELECT o_orderkey, metric, val FROM (
            SELECT o_orderkey, o_totalprice AS total_price,
                   c_acctbal AS acct_balance
            FROM orders_up JOIN cust_up ON o_custkey = c_custkey
        )
        UNPIVOT INCLUDE NULLS (val FOR metric IN (total_price, acct_balance))
    """)
