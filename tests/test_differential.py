"""Differential predicate fuzzing (SQLancer-style): random WHERE
clauses — written in the SQL subset both dialects share — run against
the SAME parquet through Spark and DuckDB, comparing matched-row count
and an order-insensitive key checksum. The oracle gate checks 192
hand-written queries; this checks the predicate/comparison/null
semantics LATTICE between them (AND/OR/NOT nesting, BETWEEN, IN, LIKE,
IS NULL, modulo arithmetic, date comparisons) on inputs nobody
hand-picked.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

SEEDS = list(range(24))


def _predicate(rng: random.Random, depth: int = 0) -> str:
    """A random predicate over the orders table, valid in Spark SQL and
    DuckDB alike."""
    atoms = [
        lambda: f"o_totalprice {rng.choice(['<', '>', '<=', '>='])} "
                f"{rng.uniform(1000, 400000):.2f}",
        lambda: f"o_orderkey % {rng.randint(2, 13)} = {rng.randint(0, 1)}",
        lambda: f"o_custkey % {rng.randint(2, 7)} "
                f"{rng.choice(['=', '<>'])} {rng.randint(0, 2)}",
        lambda: f"o_orderstatus = '{rng.choice(['F', 'O', 'P'])}'",
        lambda: f"o_orderstatus IN ({', '.join(repr(s) for s in rng.sample(['F', 'O', 'P'], rng.randint(1, 3)))})",
        lambda: f"o_orderpriority LIKE '%{rng.choice(['URGENT', 'HIGH', 'LOW', 'MEDIUM', 'NOT'])}%'",
        lambda: f"o_orderdate {rng.choice(['<', '>='])} "
                f"TIMESTAMP '{rng.randint(1995, 2001)}-0{rng.randint(1, 9)}-01 00:00:00'",
        lambda: f"o_totalprice BETWEEN {rng.uniform(0, 150000):.2f} "
                f"AND {rng.uniform(150000, 500000):.2f}",
        lambda: "o_orderpriority IS NOT NULL",
    ]
    if depth >= 2 or rng.random() < 0.4:
        return rng.choice(atoms)()
    op = rng.choice(["AND", "OR"])
    left = _predicate(rng, depth + 1)
    right = _predicate(rng, depth + 1)
    neg = "NOT " if rng.random() < 0.2 else ""
    return f"{neg}(({left}) {op} ({right}))"


@pytest.fixture(scope="module")
def duck(sf_dir, tmp_path_factory):
    con = duckdb.connect()
    # bounded memory + spill dir: the suite runs next to a 32-thread
    # Spark JVM, and DuckDB's default limit (80% of RAM) assumes it
    # owns the host — heavy oracles (unrolled IVF/PQ chains) abort
    # with allocator OOMs under concurrent pressure instead of
    # spilling (same hardening as tools/check_oracle.py)
    con.execute("SET memory_limit='8GB'")
    con.execute(
        f"SET temp_directory='{tmp_path_factory.mktemp('duck_spill')}'"
    )
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    yield con
    con.close()


@pytest.fixture(scope="module", autouse=True)
def orders_view(spark, sf_dir):
    from dynamic_etl_pipeline_spark.catalog import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_diff")


@pytest.mark.parametrize("seed", SEEDS)
def test_random_predicates_agree_with_duckdb(spark, duck, seed):
    rng = random.Random(seed)
    pred = _predicate(rng)
    body = (
        "SELECT count(*) AS n, "
        "coalesce(sum(o_orderkey * o_orderkey % 97), 0) AS checksum "
        "FROM {table} WHERE " + pred
    )
    s_row = spark.sql(body.format(table="orders_diff")).collect()[0]
    d_n, d_sum = duck.execute(body.format(table="orders")).fetchone()
    assert s_row["n"] == d_n, pred
    assert int(s_row["checksum"]) == int(d_sum), pred


@pytest.fixture(scope="module", autouse=True)
def customer_views(spark, sf_dir, duck):
    from dynamic_etl_pipeline_spark.catalog import load_table

    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_diff")
    duck.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    )


@pytest.mark.parametrize("seed", range(12))
def test_random_join_aggregates_agree_with_duckdb(spark, duck, seed):
    """Random filtered join + group-by: the aggregate lattice (grouped
    counts and exact decimal sums over a join) must agree."""
    rng = random.Random(1000 + seed)
    pred = _predicate(rng)
    group = rng.choice(
        ["o_orderstatus", "c_mktsegment", "o_orderpriority",
         "year(o_orderdate)"]
    )
    body = (
        "SELECT {g} AS g, count(*) AS n, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS s "
        "FROM {o} JOIN {c} ON o_custkey = c_custkey "
        "WHERE " + pred + " GROUP BY 1"
    ).replace("{g}", group)
    s_rows = {
        (str(r["g"]), r["n"], round(r["s"], 4))
        for r in spark.sql(
            body.format(o="orders_diff", c="customer_diff")
        ).collect()
    }
    d_rows = {
        (str(g), n, round(s, 4))
        for g, n, s in duck.execute(
            body.format(o="orders", c="customer")
        ).fetchall()
    }
    assert s_rows == d_rows, (group, pred)


@pytest.mark.parametrize("seed", range(8))
def test_random_window_topk_agree_with_duckdb(spark, duck, seed):
    """Random ranked-window top-k: partition key, ranking function, and
    k drawn at random; the surviving orderkey set must agree (ordering
    made total with a rounded measure + unique tie-break)."""
    rng = random.Random(2000 + seed)
    part = rng.choice(["o_orderstatus", "o_orderpriority",
                       "o_custkey % 10", "year(o_orderdate)"])
    fn = rng.choice(["row_number()", "rank()", "dense_rank()"])
    k = rng.randint(1, 20)
    direction = rng.choice(["ASC", "DESC"])
    body = (
        "SELECT o_orderkey FROM ("
        "  SELECT o_orderkey, {fn} OVER ("
        "    PARTITION BY {p} ORDER BY round(o_totalprice, 4) {d}, o_orderkey"
        "  ) AS rn FROM {t}"
        ") WHERE rn <= {k}"
    ).replace("{fn}", fn).replace("{p}", part).replace(
        "{d}", direction).replace("{k}", str(k))
    s_keys = {r["o_orderkey"]
              for r in spark.sql(body.format(t="orders_diff")).collect()}
    d_keys = {r[0] for r in duck.execute(body.format(t="orders")).fetchall()}
    assert s_keys == d_keys, (part, fn, k, direction)


@pytest.mark.parametrize("seed", range(8))
def test_random_set_operations_agree_with_duckdb(spark, duck, seed):
    """Random INTERSECT/EXCEPT/UNION between two predicate-filtered key
    sets — bag-vs-set and null semantics of the set operators on inputs
    nobody hand-picked."""
    rng = random.Random(3000 + seed)
    p1, p2 = _predicate(rng), _predicate(rng)
    op = rng.choice(["INTERSECT", "EXCEPT", "UNION", "UNION ALL"])
    body = (
        "SELECT count(*) AS n, coalesce(sum(k % 101), 0) AS checksum FROM ("
        "  SELECT o_orderkey AS k FROM {t} WHERE " + p1 +
        f"  {op} "
        "  SELECT o_custkey AS k FROM {t} WHERE " + p2 +
        ")"
    )
    s_row = spark.sql(body.format(t="orders_diff")).collect()[0]
    d_n, d_sum = duck.execute(body.format(t="orders")).fetchone()
    assert s_row["n"] == d_n, (op, p1, p2)
    assert int(s_row["checksum"]) == int(d_sum), (op, p1, p2)


@pytest.fixture(scope="module")
def null_tables(spark, duck, sf_dir, tmp_path_factory):
    """orders with NULLs injected into a measure, a filter column, and
    the date — the fixture itself is null-free, so three-valued-logic
    paths are otherwise only exercised by hand-written cases."""
    from dynamic_etl_pipeline_spark.catalog import load_table

    out = str(tmp_path_factory.mktemp("nullified") / "orders_nulls.parquet")
    (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_totalprice", F.when(
            F.col("o_orderkey") % 7 != 0, F.col("o_totalprice")))
        .withColumn("o_orderpriority", F.when(
            F.col("o_orderkey") % 11 != 0, F.col("o_orderpriority")))
        .withColumn("o_orderdate", F.when(
            F.col("o_orderkey") % 13 != 0, F.col("o_orderdate")))
        .coalesce(1).write.mode("overwrite").parquet(out)
    )
    spark.read.parquet(out).createOrReplaceTempView("orders_nulls_diff")
    duck.execute(
        f"CREATE VIEW orders_nulls AS SELECT * FROM read_parquet('{out}/*.parquet')"
    )
    return out


@pytest.mark.parametrize("seed", range(16))
def test_random_predicates_on_null_data_agree(spark, duck, null_tables, seed):
    """Three-valued logic under fuzz: the same random predicates over
    null-riddled columns must filter identically (NULL neither matches
    nor fails into NOT(...) branches differently across engines)."""
    rng = random.Random(4000 + seed)
    pred = _predicate(rng)
    body = (
        "SELECT count(*) AS n, "
        "coalesce(sum(o_orderkey % 89), 0) AS checksum, "
        "count(o_totalprice) AS n_price_nonnull "
        "FROM {t} WHERE " + pred
    )
    s = spark.sql(body.format(t="orders_nulls_diff")).collect()[0]
    d_n, d_sum, d_nn = duck.execute(body.format(t="orders_nulls")).fetchone()
    assert s["n"] == d_n, pred
    assert int(s["checksum"]) == int(d_sum), pred
    assert s["n_price_nonnull"] == d_nn, pred


@pytest.fixture(scope="module")
def null_key_table(spark, duck, sf_dir, tmp_path_factory):
    """orders with NULL join keys (every 5th custkey) — inner joins
    must drop them identically in both engines."""
    from dynamic_etl_pipeline_spark.catalog import load_table

    out = str(tmp_path_factory.mktemp("nullkeys") / "orders_nk.parquet")
    (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_custkey", F.when(
            F.col("o_orderkey") % 5 != 0, F.col("o_custkey")))
        .coalesce(1).write.mode("overwrite").parquet(out)
    )
    spark.read.parquet(out).createOrReplaceTempView("orders_nk_diff")
    duck.execute(
        f"CREATE VIEW orders_nk AS SELECT * FROM read_parquet('{out}/*.parquet')"
    )
    return out


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("how", ["JOIN", "LEFT JOIN"])
def test_random_null_key_joins_agree(spark, duck, null_key_table, seed, how):
    """NULL join keys under fuzz: inner joins must drop NULL-key rows,
    left joins must null-extend them — identically across engines."""
    rng = random.Random(5000 + seed)
    pred = _predicate(rng)
    body = (
        "SELECT count(*) AS n, count(c_mktsegment) AS n_matched "
        "FROM {o} " + how + " {c} ON o_custkey = c_custkey "
        "WHERE " + pred
    )
    s = spark.sql(body.format(o="orders_nk_diff", c="customer_diff")).collect()[0]
    d_n, d_m = duck.execute(body.format(o="orders_nk", c="customer")).fetchone()
    assert (s["n"], s["n_matched"]) == (d_n, d_m), (how, pred)


# ---------------------------------------------------------------------------
# Round-3 families (VERDICT r2 item 6): outer joins with NULL keys and
# random ON-clause extras; explicit window frame specs (ROWS/RANGE).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(50))
@pytest.mark.parametrize("how", ["LEFT JOIN", "FULL JOIN"])
def test_random_outer_joins_agree(spark, duck, null_key_table, how, seed):
    """Outer joins under fuzz, including FULL OUTER over NULL-key rows
    and random extra ON-clause conjuncts (ON-filter vs WHERE-filter
    semantics differ for outer joins — the classic divergence spot)."""
    rng = random.Random(6000 + seed)
    on_extra = rng.choice([
        "",
        f" AND o_totalprice > {rng.uniform(1000, 300000):.2f}",
        f" AND c_acctbal > {rng.uniform(-500, 5000):.2f}",
        f" AND o_orderkey % {rng.randint(2, 9)} = 0",
    ])
    where = rng.choice([
        "",
        "WHERE c_custkey IS NULL",
        "WHERE o_orderkey IS NULL OR o_orderkey % 3 = 0",
        f"WHERE coalesce(o_totalprice, 0) < {rng.uniform(0, 200000):.2f}",
    ])
    body = (
        "SELECT count(*) AS n, "
        "count(c_mktsegment) AS n_right, "
        "count(o_orderstatus) AS n_left, "
        "coalesce(sum(coalesce(o_orderkey, 0) % 97 "
        "             + coalesce(c_custkey, 0) % 89), 0) AS checksum "
        "FROM {o} " + how + " {c} ON o_custkey = c_custkey" + on_extra +
        " " + where
    )
    s = spark.sql(body.format(o="orders_nk_diff", c="customer_diff")).collect()[0]
    d = duck.execute(body.format(o="orders_nk", c="customer")).fetchone()
    assert (s["n"], s["n_right"], s["n_left"], int(s["checksum"])) == (
        d[0], d[1], d[2], int(d[3])
    ), (how, on_extra, where)


def _frame_spec(rng: random.Random) -> tuple[str, str]:
    """(order_clause, frame_clause) valid in Spark SQL and DuckDB."""
    mode = rng.choice(["ROWS", "RANGE"])
    if mode == "ROWS":
        # total order => deterministic ROWS frames
        direction = rng.choice(["ASC", "DESC"])
        nulls = rng.choice(["NULLS FIRST", "NULLS LAST"])
        order = f"ORDER BY o_totalprice {direction} {nulls}, o_orderkey"
        lo = rng.choice(["UNBOUNDED PRECEDING", "CURRENT ROW",
                         f"{rng.randint(1, 20)} PRECEDING"])
        hi = rng.choice(["UNBOUNDED FOLLOWING", "CURRENT ROW",
                         f"{rng.randint(1, 20)} FOLLOWING"])
        if lo == "CURRENT ROW" and hi == "CURRENT ROW":
            hi = "UNBOUNDED FOLLOWING"
    else:
        # RANGE: single numeric order key; value-based frames are
        # deterministic even under ties
        direction = rng.choice(["ASC", "DESC"])
        nulls = rng.choice(["NULLS FIRST", "NULLS LAST"])
        order = f"ORDER BY o_orderkey {direction} {nulls}"
        lo = rng.choice(["UNBOUNDED PRECEDING",
                         f"{rng.randint(1, 5000)} PRECEDING"])
        hi = rng.choice(["UNBOUNDED FOLLOWING", "CURRENT ROW",
                         f"{rng.randint(1, 5000)} FOLLOWING"])
    return order, f"{mode} BETWEEN {lo} AND {hi}"


@pytest.mark.parametrize("seed", range(60))
def test_random_window_frames_agree(spark, duck, seed):
    """Explicit ROWS/RANGE frame specs under fuzz: bounds, direction,
    and NULLS FIRST/LAST drawn at random; per-row frame aggregates
    must agree via an order-insensitive checksum (integer arithmetic
    only, so no float accumulation ambiguity)."""
    rng = random.Random(7000 + seed)
    part = rng.choice(["o_orderstatus", "o_orderpriority", "o_custkey % 7"])
    agg = rng.choice([
        "sum(o_orderkey % 97)", "count(*)",
        "min(o_orderkey)", "max(o_orderkey)",
    ])
    order, frame = _frame_spec(rng)
    body = (
        "SELECT count(*) AS n, coalesce(sum(w % 1009), 0) AS checksum FROM ("
        "  SELECT {agg} OVER (PARTITION BY {p} {ord} {frame}) AS w FROM {t}"
        ")"
    ).replace("{agg}", agg).replace("{p}", part).replace(
        "{ord}", order).replace("{frame}", frame)
    s = spark.sql(body.format(t="orders_diff")).collect()[0]
    d_n, d_sum = duck.execute(body.format(t="orders")).fetchone()
    assert (s["n"], int(s["checksum"])) == (d_n, int(d_sum)), (
        part, agg, order, frame)


@pytest.mark.parametrize("seed", range(40))
def test_random_window_frames_on_null_data_agree(spark, duck, null_tables, seed):
    """Frame specs over NULL-riddled ordering columns: NULL peer groups
    in RANGE frames and explicit NULLS FIRST/LAST placement in ROWS
    frames must aggregate identically."""
    rng = random.Random(8000 + seed)
    part = rng.choice(["o_orderstatus", "o_orderkey % 5"])
    agg = rng.choice(["count(o_totalprice)", "count(*)",
                      "sum(o_orderkey % 83)"])
    direction = rng.choice(["ASC", "DESC"])
    nulls = rng.choice(["NULLS FIRST", "NULLS LAST"])
    lo = rng.choice(["UNBOUNDED PRECEDING", f"{rng.randint(1, 10)} PRECEDING"])
    hi = rng.choice(["CURRENT ROW", "UNBOUNDED FOLLOWING",
                     f"{rng.randint(1, 10)} FOLLOWING"])
    body = (
        "SELECT count(*) AS n, coalesce(sum(w % 1009), 0) AS checksum FROM ("
        "  SELECT {agg} OVER ("
        "    PARTITION BY {p} "
        "    ORDER BY o_totalprice {d} {nu}, o_orderkey"
        "    ROWS BETWEEN {lo} AND {hi}) AS w FROM {t}"
        ")"
    ).replace("{agg}", agg).replace("{p}", part).replace(
        "{d}", direction).replace("{nu}", nulls).replace(
        "{lo}", lo).replace("{hi}", hi)
    s = spark.sql(body.format(t="orders_nulls_diff")).collect()[0]
    d_n, d_sum = duck.execute(body.format(t="orders_nulls")).fetchone()
    assert (s["n"], int(s["checksum"])) == (d_n, int(d_sum)), (
        part, agg, direction, nulls, lo, hi)


@pytest.mark.parametrize("seed", range(40))
def test_random_grouping_sets_agree(spark, duck, seed):
    """ROLLUP / CUBE / GROUPING SETS under fuzz: random grouping
    shapes, random predicate, grouping() markers to disambiguate
    generated NULLs from data NULLs — totals and subtotal lattice must
    agree via an order-insensitive checksum."""
    rng = random.Random(9000 + seed)
    cols = rng.sample(
        ["o_orderstatus", "o_orderpriority", "year(o_orderdate)"],
        rng.randint(2, 3),
    )
    shape = rng.choice(["ROLLUP", "CUBE", "SETS"])
    if shape == "SETS":
        subsets = ["(" + ", ".join(cols) + ")", "()"]
        if rng.random() < 0.7:
            subsets.append("(" + cols[0] + ")")
        grouping = f"GROUPING SETS ({', '.join(subsets)})"
    else:
        grouping = f"{shape} ({', '.join(cols)})"
    pred = _predicate(rng)
    gcols = ", ".join(cols)
    gmarks = " + ".join(f"grouping({c})" for c in cols)
    body = (
        "SELECT count(*) AS n, coalesce(sum(chk), 0) AS checksum FROM ("
        f"  SELECT {gmarks} AS gm, count(*) AS cnt,"
        "         (count(*) % 1009) * (1 + {gmarks2}) AS chk"
        f"  FROM {{t}} WHERE {pred}"
        f"  GROUP BY {grouping}"
        ")"
    ).replace("{gmarks2}", gmarks)
    s = spark.sql(body.format(t="orders_diff")).collect()[0]
    d_n, d_sum = duck.execute(body.format(t="orders")).fetchone()
    n_in = duck.execute(
        f"SELECT count(*) FROM orders WHERE {pred}").fetchone()[0]
    if n_in == 0:
        # documented engine divergence this fuzz family FOUND: over an
        # empty input, DuckDB (and PostgreSQL, per the SQL standard)
        # emit the global () grouping-set row, while Spark emits no
        # rows at all. Pin both behaviors so a change in either engine
        # shows up here.
        assert s["n"] == 0, (grouping, pred)
        assert d_n == 1 and int(d_sum) == 0, (grouping, pred)
        return
    assert (s["n"], int(s["checksum"])) == (d_n, int(d_sum)), (
        grouping, pred)


@pytest.mark.parametrize("seed", range(30))
def test_random_string_exprs_agree(spark, duck, seed):
    """String-function compositions (shared-subset semantics: positive
    indexes only — negative substr offsets legitimately differ across
    engines): per-row expression checksummed order-insensitively."""
    rng = random.Random(10_000 + seed)
    base = rng.choice(["o_orderpriority", "o_orderstatus",
                       "concat(o_orderstatus, '-', o_orderpriority)"])
    expr = base
    for _ in range(rng.randint(1, 3)):
        expr = rng.choice([
            f"upper({expr})",
            f"lower({expr})",
            f"trim({expr})",
            f"substr({expr}, {rng.randint(1, 4)}, {rng.randint(1, 6)})",
            f"replace({expr}, '{rng.choice(['1', 'U', 'o', '-'])}', "
            f"'{rng.choice(['', 'x', 'zz'])}')",
            f"reverse({expr})",
            f"lpad({expr}, {rng.randint(3, 12)}, '.')",
        ])
    body = (
        "SELECT count(DISTINCT v) AS nd, "
        "coalesce(sum(length(v)), 0) AS lensum, "
        "coalesce(sum(CASE WHEN instr(v, 'x') > 0 THEN 1 ELSE 0 END), 0) AS nx "
        f"FROM (SELECT {expr} AS v FROM {{t}})"
    )
    s = spark.sql(body.format(t="orders_diff")).collect()[0]
    d = duck.execute(body.format(t="orders")).fetchone()
    assert (s["nd"], int(s["lensum"]), int(s["nx"])) == (
        d[0], int(d[1]), int(d[2])), expr


@pytest.mark.parametrize("seed", range(30))
def test_random_date_exprs_agree(spark, duck, seed):
    """Date/time lattice: random date_trunc units, extract fields, and
    interval arithmetic over the orders dates."""
    rng = random.Random(11_000 + seed)
    unit = rng.choice(["year", "quarter", "month", "week", "day"])
    field = rng.choice(["year", "month", "day", "quarter"])
    d_field = s_field = field
    shift = rng.randint(0, 400)
    body_t = (
        "SELECT count(DISTINCT t) AS nd, "
        "coalesce(sum(f), 0) AS fsum FROM ("
        "  SELECT date_trunc('{u}', o_orderdate + INTERVAL '{n}' DAY) AS t,"
        "         extract({f} FROM o_orderdate) AS f"
        "  FROM {tab})"
    )
    s = spark.sql(
        body_t.format(u=unit, n=shift, f=s_field, tab="orders_diff")
    ).collect()[0]
    d = duck.execute(
        body_t.format(u=unit, n=shift, f=d_field, tab="orders")
    ).fetchone()
    assert (s["nd"], int(s["fsum"])) == (d[0], int(d[1])), (unit, field, shift)


@pytest.mark.parametrize("seed", range(10))
def test_random_rank_bucket_specs_agree(spark, duck, seed):
    """Random order-statistic bucketing (the events_equidepth_hist /
    winsorize class): random bucket count B and random rank points over
    a random partition key — bucket counts and rank-selected cutoff
    values must agree exactly (integer rank arithmetic, no
    interpolation)."""
    rng = random.Random(7000 + seed)
    B = rng.randint(2, 8)
    part = rng.choice(["o_orderstatus", "o_orderpriority", "o_custkey % 5"])
    p = rng.choice([0.01, 0.1, 0.25, 0.5, 0.9, 0.99])
    body = (
        "WITH r AS ("
        "  SELECT {p} AS pk, o_orderkey, o_totalprice,"
        "         row_number() OVER (PARTITION BY {p}"
        "            ORDER BY round(o_totalprice, 4), o_orderkey) AS rn,"
        "         count(*) OVER (PARTITION BY {p}) AS n"
        "  FROM {t})"
        "SELECT pk, CAST(1 + (((rn - 1) * {B}) / n) AS INT) AS bucket,"
        "       count(*) AS cnt,"
        "       max(CASE WHEN rn = GREATEST(CAST(1 AS BIGINT),"
        "             CAST(ceil({q} * n) AS BIGINT)) THEN round(o_totalprice, 4)"
        "           END) AS cut"
        " FROM r GROUP BY 1, 2"
    ).replace("{B}", str(B)).replace("{p}", part).replace("{q}", str(p))
    # integer division spelling differs: Spark DIV, DuckDB //
    s_rows = {
        (r[0], r[1], r[2], r[3])
        for r in spark.sql(
            body.format(t="orders_diff").replace(f"* {B}) / n", f"* {B}) DIV n")
        ).collect()
    }
    d_rows = {
        (r[0], r[1], r[2], r[3])
        for r in duck.execute(
            body.format(t="orders").replace(f"* {B}) / n", f"* {B}) // n")
        ).fetchall()
    }
    assert s_rows == d_rows, (B, part, p)


@pytest.mark.parametrize("seed", range(8))
def test_random_session_gap_specs_agree(spark, duck, seed):
    """Random sessionization gaps (1 min .. 3 days) over random keys:
    session counts and max session length must agree — the lag->flag->
    cumsum rewrite is gap-invariant."""
    rng = random.Random(8000 + seed)
    gap = rng.choice([1, 5, 30, 120, 720, 1440, 4320])
    part = rng.choice(["o_custkey % 50", "o_custkey % 7"])
    body = (
        "WITH flagged AS ("
        "  SELECT {p} AS pk, o_orderdate,"
        "    CASE WHEN o_orderdate - lag(o_orderdate) OVER ("
        "      PARTITION BY {p} ORDER BY o_orderdate, o_orderkey)"
        f"      > INTERVAL '{{g}}' MINUTE THEN 1 ELSE 0 END AS ns"
        "  FROM {t}), numbered AS ("
        "  SELECT pk, sum(ns) OVER (PARTITION BY pk ORDER BY o_orderdate"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq"
        "  FROM flagged)"
        "SELECT pk, count(DISTINCT seq) AS n_sessions,"
        "       max(cnt) AS longest FROM ("
        "  SELECT pk, seq, count(*) AS cnt FROM numbered GROUP BY 1, 2)"
        " GROUP BY 1"
    ).replace("{p}", part).replace("{g}", str(gap))
    s_rows = {tuple(r) for r in spark.sql(body.format(t="orders_diff")).collect()}
    d_rows = {tuple(r) for r in duck.execute(body.format(t="orders")).fetchall()}
    assert s_rows == d_rows, (gap, part)


# ---------------------------------------------------------------------------
# Higher-order array functions: random transform/filter/sort/slice
# chains over integer arrays built from orders columns, rendered into
# each engine's lambda dialect (Spark transform/filter/slice vs DuckDB
# list_transform/list_filter/list_slice) and compared by order-safe
# integer checksums. Integer-only so sums are exact in any fold order.


def _hof_chain(rng: random.Random) -> list[tuple]:
    ops = []
    for _ in range(rng.randint(1, 3)):
        ops.append(rng.choice([
            ("map_add", rng.randint(1, 9)),
            ("map_mul", rng.randint(2, 5)),
            ("filter_mod", rng.randint(2, 5), rng.randint(0, 1)),
            ("sort",),
            ("rev",),
            ("slice", rng.randint(1, 2), rng.randint(1, 3)),
        ]))
    return ops


def _hof_render(ops: list[tuple], dialect: str) -> str:
    if dialect == "spark":
        e = ("array(o_orderkey % 7, o_custkey % 5, "
             "CAST(length(o_orderpriority) AS BIGINT), o_orderkey % 3)")
    else:
        e = ("[o_orderkey % 7, o_custkey % 5, "
             "CAST(length(o_orderpriority) AS BIGINT), o_orderkey % 3]")
    for op in ops:
        if op[0] == "map_add":
            fn = "transform" if dialect == "spark" else "list_transform"
            e = f"{fn}({e}, x -> x + {op[1]})"
        elif op[0] == "map_mul":
            fn = "transform" if dialect == "spark" else "list_transform"
            e = f"{fn}({e}, x -> x * {op[1]})"
        elif op[0] == "filter_mod":
            fn = "filter" if dialect == "spark" else "list_filter"
            e = f"{fn}({e}, x -> x % {op[1]} = {op[2]})"
        elif op[0] == "sort":
            fn = "array_sort" if dialect == "spark" else "list_sort"
            e = f"{fn}({e})"
        elif op[0] == "rev":
            fn = "reverse" if dialect == "spark" else "list_reverse"
            e = f"{fn}({e})"
        elif op[0] == "slice":
            start, n = op[1], op[2]
            if dialect == "spark":
                e = f"slice({e}, {start}, {n})"
            else:  # DuckDB list_slice end is 1-based inclusive
                e = f"list_slice({e}, {start}, {start + n - 1})"
    return e


@pytest.mark.parametrize("seed", range(40))
def test_random_higher_order_array_chains_agree(spark, duck, seed):
    rng = random.Random(40_000 + seed)
    ops = _hof_chain(rng)
    s_arr = _hof_render(ops, "spark")
    d_arr = _hof_render(ops, "duck")
    s_body = (
        "SELECT coalesce(sum(aggregate(v, 0L, (a, x) -> a + x)), 0) AS vs, "
        "coalesce(sum(size(v)), 0) AS ls, "
        "coalesce(sum(CAST(try_element_at(v, 1) AS BIGINT)), 0) AS h "
        f"FROM (SELECT {s_arr} AS v FROM orders_diff)"
    )
    d_body = (
        "SELECT coalesce(sum(coalesce(list_sum(v), 0)), 0) AS vs, "
        "coalesce(sum(len(v)), 0) AS ls, "
        "coalesce(sum(CAST(v[1] AS BIGINT)), 0) AS h "
        f"FROM (SELECT {d_arr} AS v FROM orders)"
    )
    s = spark.sql(s_body).collect()[0]
    d = duck.execute(d_body).fetchone()
    assert (int(s["vs"]), int(s["ls"]), int(s["h"])) == (
        int(d[0]), int(d[1]), int(d[2])), (ops, s_arr, d_arr)


# ---------------------------------------------------------------------------
# DOUBLE -> DECIMAL cast rounding: the parity the oracle registry's
# convention ("computed floats go through CAST(x AS DECIMAL(p,s)) on
# both sides") stands on — and its exact boundary, which THIS FAMILY
# FOUND while being built:
#
# - For values whose decimal expansion is EXACT in the double
#   (integer-derived dyadics k/2, k/8, k/16 — at most 4 exact decimal
#   digits), every rounding boundary is a true binary half and both
#   engines round half-AWAY-FROM-ZERO (0.5 -> 1, -0.5 -> -1,
#   2.5 -> 3): full agreement, pinned below. Note even "dyadic
#   scaling" of a MEASURE column (price * 0.25) is NOT safe: the
#   scaling is exact wrt the stored double, but the stored double is
#   already an inexact decimal, so the scale-2 boundary digits are
#   repr-vs-binary sensitive.
# - For doubles NOT exactly representable at the scale (e.g.
#   o_totalprice * 0.3 -> ...11499999999), the engines DIVERGE on
#   ~0.2% of rows: Spark casts via the shortest decimal repr
#   (BigDecimal(Double.toString) + HALF_UP) while DuckDB converts the
#   value differently — 112115.11499999999 casts to .11 in Spark and
#   .12 in DuckDB. Pinned in
#   test_double_to_decimal_cast_divergence_on_inexact_values. This is
#   WHY the registry only ever decimal-casts raw measure columns (and
#   why round() carries the same warning in queries/registry.py).
# - DuckDB's decimal-LITERAL -> decimal cast truncates instead of
#   rounding — the family only ever casts double COLUMNS.


@pytest.mark.parametrize("seed", range(30))
def test_random_double_to_decimal_casts_agree(spark, duck, seed):
    rng = random.Random(70_000 + seed)
    s = rng.randint(0, 4)
    base = rng.choice([
        "o_orderkey / 2.0",
        "o_orderkey / 8.0",
        "o_orderkey / 16.0",
        "-(o_orderkey / 2.0)",
        "o_orderkey / 4.0 + o_custkey / 16.0",
        "o_custkey / 4.0 - o_orderkey / 2.0",
    ])
    body = (
        "SELECT "
        f"coalesce(sum(CAST(CAST(v AS DECIMAL(27,{s})) * {10**s} AS BIGINT)), 0)"
        " AS ticks, "
        "count(DISTINCT CAST(v AS DECIMAL(27,%d))) AS nd "
        "FROM (SELECT CAST(%s AS DOUBLE) AS v FROM {t})" % (s, base)
    )
    srow = spark.sql(body.format(t="orders_diff")).collect()[0]
    drow = duck.execute(body.format(t="orders")).fetchone()
    assert (int(srow["ticks"]), int(srow["nd"])) == (
        int(drow[0]), int(drow[1])), (base, s)


def test_double_to_decimal_cast_divergence_on_inexact_values(spark, duck):
    """Pin the divergence the family found (it is the boundary of the
    registry's cast convention, so it must stay visible): over doubles
    NOT exactly representable at the target scale (price * 0.3), the
    engines' DOUBLE->DECIMAL casts disagree on a fraction of rows
    (observed ~0.2%: e.g. 112115.11499999999 -> .11 in Spark's
    shortest-repr HALF_UP, .12 in DuckDB). The pin runs the DATA path
    (parquet doubles — literal constant folding takes a different
    arithmetic in both engines) and asserts the checksums DIFFER; if
    they ever agree, an engine changed rounding and the registry
    conventions need re-auditing."""
    body = (
        "SELECT sum(CAST(CAST(o_totalprice * 0.3 AS DECIMAL(27,2)) * 100"
        " AS BIGINT)) AS ticks FROM {t}"
    )
    s_val = int(spark.sql(body.format(t="orders_diff")).collect()[0]["ticks"])
    d_val = int(duck.execute(body.format(t="orders")).fetchone()[0])
    assert s_val != d_val


# ---------------------------------------------------------------------------
# JSON path extraction: random nested documents + random paths, Spark
# get_json_object vs DuckDB json_extract_string. Scalar leaves only
# (strings / ints / bools / null): float rendering and object/array
# re-serialization are documented dialect differences, exactly like
# the registry's events_json_props oracle which also extracts scalars.
# A JSON null leaf is ALSO excluded — building this family found that
# Spark's get_json_object returns the 4-char STRING 'null' for it
# while DuckDB's json_extract_string returns SQL NULL (pinned below);
# a missing path returns SQL NULL in both.


def _json_doc(rng: random.Random, depth: int = 0):
    if depth >= 2:
        return rng.choice([
            rng.randint(-999, 999), "s" + str(rng.randint(0, 99)),
            True, False,
        ])
    d = {}
    for k in range(rng.randint(1, 4)):
        key = f"k{k}"
        roll = rng.random()
        if roll < 0.35:
            d[key] = _json_doc(rng, depth + 1)
        elif roll < 0.55:
            d[key] = [_json_doc(rng, 2) for _ in range(rng.randint(1, 3))]
        else:
            d[key] = _json_doc(rng, 2)
    return d


def _json_paths(doc, prefix="$"):
    out = []
    if isinstance(doc, dict):
        for k, v in doc.items():
            out.extend(_json_paths(v, f"{prefix}.{k}"))
    elif isinstance(doc, list):
        for i, v in enumerate(doc):
            out.extend(_json_paths(v, f"{prefix}[{i}]"))
    else:
        out.append(prefix)
    return out


@pytest.mark.parametrize("seed", range(25))
def test_random_json_path_extraction_agrees(spark, duck, seed):
    import json as _json

    import pandas as pd

    rng = random.Random(90_000 + seed)
    docs = [_json_doc(rng) for _ in range(30)]
    rows = [(i, _json.dumps(d)) for i, d in enumerate(docs)]
    # one random EXISTING scalar path per seed + one missing path
    all_paths = sorted({p for d in docs for p in _json_paths(d)})
    path = rng.choice(all_paths)
    pdf = pd.DataFrame(rows, columns=["id", "doc"])
    spark.createDataFrame(pdf).createOrReplaceTempView("json_diff")
    duck.register("json_docs", pdf)
    try:
        s_rows = spark.sql(
            f"SELECT id, get_json_object(doc, '{path}') AS v, "
            f"get_json_object(doc, '$.nope.missing') AS m FROM json_diff"
        ).collect()
        d_rows = duck.execute(
            f"SELECT id, json_extract_string(doc, '{path}') AS v, "
            f"json_extract_string(doc, '$.nope.missing') AS m "
            f"FROM json_docs"
        ).fetchall()
        s_m = {r["id"]: (r["v"], r["m"]) for r in s_rows}
        d_m = {r[0]: (r[1], r[2]) for r in d_rows}
        assert s_m == d_m, path
    finally:
        duck.unregister("json_docs")


def test_json_null_leaf_rendering_divergence_pinned(spark, duck):
    """Pin the dialect difference the family found — and its
    surprising context-dependence in Spark: a null OBJECT value
    extracts as SQL NULL in both engines, but a null ARRAY ELEMENT
    extracts as the 4-char STRING 'null' in Spark while DuckDB stays
    SQL NULL. The reason oracles must never compare extracted JSON
    nulls."""
    import pandas as pd

    pdf = pd.DataFrame(
        [(1, '{"a": null, "arr": [7, null]}')], columns=["id", "doc"]
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("json_null_diff")
    duck.register("json_null_docs", pdf)
    try:
        s_row = spark.sql(
            "SELECT get_json_object(doc, '$.a') AS obj, "
            "get_json_object(doc, '$.arr[1]') AS arr FROM json_null_diff"
        ).collect()[0]
        d_row = duck.execute(
            "SELECT json_extract_string(doc, '$.a'), "
            "json_extract_string(doc, '$.arr[1]') FROM json_null_docs"
        ).fetchone()
        assert s_row["obj"] is None and d_row[0] is None
        assert s_row["arr"] == "null"      # Spark: literal string
        assert d_row[1] is None            # DuckDB: SQL NULL
    finally:
        duck.unregister("json_null_docs")


# ---------------------------------------------------------------------------
# Date-interval RANGE frames: ORDER BY a timestamp with
# RANGE BETWEEN INTERVAL n DAY PRECEDING AND CURRENT ROW — interval
# arithmetic + peer-tie semantics the numeric frame family can't reach.


@pytest.mark.parametrize("seed", range(15))
def test_random_interval_range_frames_agree(spark, duck, seed):
    rng = random.Random(110_000 + seed)
    n = rng.randint(1, 120)
    part = rng.choice(["o_orderstatus", "o_orderpriority", "o_custkey % 5"])
    agg = rng.choice([
        "count(*)",
        "sum(o_orderkey % 1000)",
        "min(o_orderkey)",
    ])
    body = (
        "SELECT coalesce(sum(w % 100003), 0) AS cs, count(*) AS n FROM ("
        f"  SELECT {agg} OVER ("
        f"    PARTITION BY {part} ORDER BY o_orderdate"
        f"    RANGE BETWEEN INTERVAL {n} DAY PRECEDING AND CURRENT ROW"
        "  ) AS w FROM {t})"
    )
    s_row = spark.sql(body.format(t="orders_diff")).collect()[0]
    d_row = duck.execute(body.format(t="orders")).fetchone()
    assert (int(s_row["cs"]), s_row["n"]) == (int(d_row[0]), d_row[1]), (
        n, part, agg)


# ---------------------------------------------------------------------------
# Regex extraction: random pattern compositions in the dialect-shared
# subset (no backslash classes — Spark SQL string literals process
# backslash escapes, DuckDB's do not, so '\\d' is not shared text;
# bracket classes express the same thing portably), Spark's Java regex
# vs DuckDB's RE2 over the documents corpus. Probing while building
# found full agreement on the subset including empty-match enumeration
# ('a*' yields len+1 matches on both engines).


@pytest.fixture(scope="module")
def documents_views(spark, sf_dir, duck):
    from dynamic_etl_pipeline_spark.catalog import load_table

    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_diff")
    duck.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )


def _regex_pattern(rng: random.Random) -> str:
    atom = lambda: rng.choice([  # noqa: E731
        "[a-z]", "[aeiou]", "[a-z0-9]", "[^ ]", "[b-df-hj-np-tv-z]",
        "e", "t", "a", ".",
    ])
    piece = lambda: atom() + rng.choice(  # noqa: E731
        ["", "+", "*", "?", "{2}", "{1,3}", "{2,}"]
    )
    pat = "".join(piece() for _ in range(rng.randint(1, 4)))
    if rng.random() < 0.3:
        pat = f"({pat}|{piece()})"
    if rng.random() < 0.2:
        pat = "^" + pat
    elif rng.random() < 0.2:
        pat = pat + "$"
    if rng.random() < 0.2:
        pat = "(?i)" + pat
    return pat


@pytest.mark.parametrize("seed", range(25))
def test_random_regex_extraction_agrees(spark, duck, documents_views, seed):
    rng = random.Random(130_000 + seed)
    pat = _regex_pattern(rng).replace("'", "")
    body = (
        "SELECT coalesce(sum(@L(regexp_extract_all(text, '%s', 0))), 0)"
        " AS n_matches, "
        "coalesce(sum(length(regexp_extract(text, '%s', 0))), 0)"
        " AS first_len, "
        "count(*) FILTER (WHERE @M) AS n_docs "
        "FROM @T" % (pat, pat)
    )
    s_body = (body.replace("@L", "size").replace("@T", "documents_diff")
              .replace("@M", "text RLIKE '%s'" % pat))
    d_body = (body.replace("@L", "len").replace("@T", "documents")
              .replace("@M", "regexp_matches(text, '%s')" % pat))
    s_row = spark.sql(s_body).collect()[0]
    d_row = duck.execute(d_body).fetchone()
    assert (int(s_row["n_matches"]), int(s_row["first_len"]),
            int(s_row["n_docs"])) == (
        int(d_row[0]), int(d_row[1]), int(d_row[2])), pat


# ---------------------------------------------------------------------------
# As-of join: random (left type, right type, direction, strict) specs,
# the engine's union/sort/last-carry asof_join operator vs DuckDB's
# native ASOF JOIN. The right side is pre-deduplicated per (key, ts)
# (min value) because BOTH implementations pick an unspecified row
# among exact (key, ts) ties — the dedup makes every spec total.


@pytest.fixture(scope="module")
def events_views(spark, sf_dir, duck):
    from dynamic_etl_pipeline_spark.catalog import load_table

    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events_diff")
    duck.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )


@pytest.mark.parametrize("seed", range(12))
def test_random_asof_specs_agree(spark, duck, events_views, seed):
    from dynamic_etl_pipeline_spark.operators.asof import asof_join

    rng = random.Random(150_000 + seed)
    lt, rt = rng.sample(["signup", "click", "error", "view", "purchase"], 2)
    direction = rng.choice(["backward", "forward"])
    strict = rng.random() < 0.3
    op = {("backward", False): ">=", ("backward", True): ">",
          ("forward", False): "<=", ("forward", True): "<"}[
        (direction, strict)]

    left = spark.table("events_diff").filter(
        F.col("event_type") == lt
    ).select("event_id", "user_id", "ts")
    right = (
        spark.table("events_diff").filter(F.col("event_type") == rt)
        .groupBy("user_id", "ts").agg(F.min("value").alias("value"))
    )
    joined = asof_join(left, right, on="user_id", value_cols=["value"],
                       direction=direction, strict=strict)
    s_row = joined.agg(
        F.count("*").alias("n"),
        F.count("value_asof").alias("m"),
        F.sum(F.col("value_asof").cast("decimal(27,4)"))
        .cast("double").alias("s"),
    ).collect()[0]

    d_row = duck.execute(f"""
        WITH l AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = '{lt}'),
        r AS (SELECT user_id, ts, min(value) AS value FROM events
              WHERE event_type = '{rt}' GROUP BY 1, 2)
        SELECT count(*) AS n, count(r.value) AS m,
               CAST(sum(CAST(r.value AS DECIMAL(27,4))) AS DOUBLE) AS s
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts {op} r.ts
    """).fetchone()
    assert (s_row["n"], s_row["m"]) == (d_row[0], d_row[1]), (
        lt, rt, direction, strict)
    sa, sb = s_row["s"], d_row[2]
    assert (sa is None and sb is None) or sa == sb, (
        lt, rt, direction, strict)


# ---------------------------------------------------------------------------
# IGNORE NULLS / RESPECT NULLS window navigation over NULL-injected
# data: both engines support the semantics natively but place the
# modifier differently — Spark after the call (lag(x, 2) IGNORE NULLS
# OVER ...), DuckDB inside the argument list (lag(x, 2 IGNORE NULLS)
# OVER ...) — so the spec renders per dialect. The windowed value is
# an integer that is NULL exactly where the injected o_totalprice
# NULLs sit, so every pick path is exercised.


@pytest.mark.parametrize("seed", range(18))
def test_random_ignore_nulls_navigation_agrees(spark, duck, null_tables,
                                               seed):
    rng = random.Random(170_000 + seed)
    ignore = rng.random() < 0.6
    part = rng.choice(["o_orderstatus", "o_custkey % 7",
                       "o_orderpriority IS NULL"])
    name, extra, framed = rng.choice([
        ("lag", str(rng.randint(1, 3)), False),
        ("lead", str(rng.randint(1, 3)), False),
        ("first_value", None, True),
        ("last_value", None, True),
        ("nth_value", str(rng.randint(1, 4)), True),
    ])
    args = "x" + (f", {extra}" if extra else "")
    s_fn = f"{name}({args})" + (" IGNORE NULLS" if ignore else "")
    d_fn = f"{name}({args}" + (" IGNORE NULLS)" if ignore else ")")
    frame = ""
    if framed:
        a, b = rng.randint(0, 5), rng.randint(0, 5)
        frame = f" ROWS BETWEEN {a} PRECEDING AND {b} FOLLOWING"
    body = (
        "SELECT coalesce(sum(v % 100003), 0) AS cs, count(v) AS nv FROM ("
        "  SELECT @F OVER ("
        f"    PARTITION BY {part} ORDER BY o_orderkey{frame}) AS v"
        "  FROM (SELECT o_orderkey, o_custkey, o_orderstatus,"
        "               o_orderpriority,"
        "               CASE WHEN o_totalprice IS NULL THEN NULL"
        "                    ELSE o_orderkey END AS x FROM @T))"
    )
    s_row = spark.sql(
        body.replace("@F", s_fn).replace("@T", "orders_nulls_diff")
    ).collect()[0]
    d_row = duck.execute(
        body.replace("@F", d_fn).replace("@T", "orders_nulls")
    ).fetchone()
    assert (int(s_row["cs"]), s_row["nv"]) == (int(d_row[0]), d_row[1]), (
        s_fn, part, frame)


# ---------------------------------------------------------------------------
# Integer-exact PQ-ADC: random hyperparameters vs the generated oracle
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def embeddings_duck_view(sf_dir, duck):
    duck.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )


@pytest.mark.parametrize("seed", [3, 17, 29])
def test_random_pq_exact_specs_agree(spark, duck, embeddings_duck_view,
                                     sf_dir, seed):
    """The integer-exact PQ pipeline under RANDOM hyperparameters must
    match the parameterized oracle generator bit-for-bit — the gate
    pins one (m, ksub, iters) configuration; this catches bugs that
    only appear at other subspace widths / codebook sizes / iteration
    counts (slice indexing, seed windows, empty-cell carry)."""
    import random as _random

    from dynamic_etl_pipeline_spark.operators.knn import pq_exact_topk
    from dynamic_etl_pipeline_spark.queries.northstar import _pq_oracle

    rng = _random.Random(seed)
    m = rng.choice([4, 8, 16])
    ksub = rng.choice([4, 8, 16])
    iters = rng.choice([1, 2, 3])
    k = rng.choice([3, 10])

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["vec_id"]): (r["d2"], r["rn"])
        for r in pq_exact_topk(
            e, queries, k=k, m=m, ksub=ksub, dim=64, iters=iters
        ).collect()
    }
    want = {
        (q, v): (d2, rn)
        for q, v, d2, rn in duck.execute(
            _pq_oracle(k=k, m=m, ksub=ksub, dim=64, iters=iters)
        ).fetchall()
    }
    assert got == want, (m, ksub, iters, k)


def test_pq_exact_tiny_corpus_fewer_vectors_than_codebook(spark, sf_dir):
    """Corpus smaller than ksub: only as many centroids exist as seed
    rows — the engine must not rank against zero-padded phantom
    centroids the oracle never materializes (regression: the codebook
    array was preallocated at ksub)."""
    from dynamic_etl_pipeline_spark.operators.knn import pq_exact_topk
    from dynamic_etl_pipeline_spark.queries.northstar import _pq_oracle

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 6
    )
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["vec_id"]): (r["d2"], r["rn"])
        for r in pq_exact_topk(
            e, queries, k=3, m=8, ksub=16, dim=64, iters=2
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') WHERE vec_id < 6"
    )
    want = {
        (q, v): (d2, rn)
        for q, v, d2, rn in con.execute(
            _pq_oracle(k=3, m=8, ksub=16, dim=64, iters=2)
        ).fetchall()
    }
    con.close()
    assert got == want


@pytest.mark.parametrize("seed", [5, 23])
def test_random_kmeans_exact_specs_agree(spark, duck, embeddings_duck_view,
                                         sf_dir, seed):
    """The exact k-means chain under RANDOM (k, iters) — the registered
    query pins one configuration and the IVF/PQ oracles exercise two
    more, all fixed; this fuzzes the parameterized CTE generator
    itself (seed-window width, iteration unrolling, empty-cluster
    carry at small k / high iters)."""
    import random as _random

    from dynamic_etl_pipeline_spark.operators.knn import kmeans_exact_assign
    from dynamic_etl_pipeline_spark.queries.vectors import _km_cte_chain

    rng = _random.Random(seed)
    k = rng.choice([2, 5, 12])
    iters = rng.choice([1, 3, 4])

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_exact_assign(
            e, n_centroids=k, iters=iters
        ).select("vec_id", "cluster_id").collect()
    }
    want = dict(duck.execute(
        _km_cte_chain(k=k, iters=iters)
        + "SELECT vec_id, cluster_id FROM af"
    ).fetchall())
    assert got == want, (k, iters)


@pytest.mark.parametrize("seed", [11, 41])
def test_random_mmr_specs_agree(spark, duck, embeddings_duck_view,
                                sf_dir, seed):
    """Greedy MMR under RANDOM (k, pool, lam): the oracle unrolls the
    selection into k argmax CTEs from the same parameters — fuzzing
    the generator catches unroll-depth and lambda-literal bugs beyond
    the registered query's single (10, 32, 0.7) configuration."""
    import random as _random

    from dynamic_etl_pipeline_spark.operators.knn import mmr_rerank
    from dynamic_etl_pipeline_spark.queries.northstar import _mmr_oracle

    rng = _random.Random(seed)
    k = rng.choice([2, 4, 7])
    pool = rng.choice([8, 16, 24])
    lam = rng.choice([0.3, 0.5, 0.9])

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["mmr_rank"]): (r["vec_id"], r["cos_sim"],
                                         r["mmr_score"])
        for r in mmr_rerank(e, queries, k=k, pool=pool, lam=lam).collect()
    }
    want = {
        (q, rk): (v, cs, sc)
        for q, v, cs, rk, sc in duck.execute(
            _mmr_oracle(k=k, pool=pool, lam=lam)
        ).fetchall()
    }
    assert got == want, (k, pool, lam)


@pytest.mark.parametrize("seed", [13, 37])
def test_random_pca_topk_specs_agree(spark, duck, embeddings_duck_view,
                                     sf_dir, seed):
    """Deflated power iteration under RANDOM (k, iters): every pc value
    must be bit-identical to the oracle generated from the same
    parameters — fuzzing the deflation unroll beyond the registered
    (2, 8) configuration."""
    import random as _random

    from dynamic_etl_pipeline_spark.operators.pca import power_iteration_topk
    from dynamic_etl_pipeline_spark.queries.vectors import _pca_topk_oracle

    rng = _random.Random(seed)
    k = rng.choice([1, 3])
    iters = rng.choice([2, 5, 8])

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cols = [f"pc{i + 1}" for i in range(k)]
    got = {
        r["vec_id"]: tuple(r[c] for c in cols)
        for r in power_iteration_topk(e, k=k, iters=iters).collect()
    }
    # oracle selects (vec_id, label, pc1..pck) — drop the label column
    want = {
        row[0]: tuple(row[2:])
        for row in duck.execute(_pca_topk_oracle(k=k, iters=iters)).fetchall()
    }
    assert got == want, (k, iters)


@pytest.mark.parametrize("seed", [7, 31])
def test_random_ivf_exact_specs_agree(spark, duck, embeddings_duck_view,
                                      sf_dir, seed):
    """Integer-exact IVF under RANDOM (k, n_centroids, n_probe, iters):
    quantizer training, probe selection and rounded-cosine ranking all
    re-derived by the oracle at the same parameters."""
    import random as _random

    from dynamic_etl_pipeline_spark.operators.knn import ivf_exact_topk
    from dynamic_etl_pipeline_spark.queries.northstar import _ivf_oracle

    rng = _random.Random(seed)
    k = rng.choice([3, 10])
    n_centroids = rng.choice([4, 8, 16])
    n_probe = rng.choice([1, 2, min(4, n_centroids)])
    iters = rng.choice([1, 3])

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["rn"]): (r["vec_id"], r["cos_sim"])
        for r in ivf_exact_topk(
            e, queries, k=k, n_centroids=n_centroids,
            n_probe=n_probe, iters=iters,
        ).collect()
    }
    want = {
        (q, rn): (v, cs)
        for q, v, cs, rn in duck.execute(_ivf_oracle(
            k=k, n_centroids=n_centroids, n_probe=n_probe, iters=iters,
        )).fetchall()
    }
    assert got == want, (k, n_centroids, n_probe, iters)


@pytest.mark.parametrize("seed", [11, 47, 83, 129])
def test_random_sessionize_gap_specs_agree(spark, duck, events_views, seed):
    """Skew-safe sessionization under RANDOM inactivity gaps and bucket
    granularities vs DuckDB running the serial lag/cumsum formulation —
    the decomposition must be invariant to both parameters."""
    from dynamic_etl_pipeline_spark.operators.sessionize import (
        sessionize_events,
    )

    rng = random.Random(160_000 + seed)
    gap_min = rng.choice([2, 11, 45, 180])
    bucket = rng.choice([None, F.date_trunc("hour", F.col("ts"))])

    ev = spark.table("events_diff")
    got = {
        (r["user_id"], r["s"], r["e"], r["n"])
        for r in sessionize_events(ev, f"{gap_min} minutes", bucket=bucket)
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"),
             F.count("*").alias("n"))
        .collect()
    }
    want = {
        tuple(row)
        for row in duck.execute(f"""
            WITH flagged AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL '{gap_min} minutes'
                          THEN 1 ELSE 0 END AS new_session
              FROM events
            ), numbered AS (
              SELECT user_id, ts,
                     sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_seq
              FROM flagged
            )
            SELECT user_id, min(ts), max(ts), count(*)
            FROM numbered GROUP BY user_id, session_seq
        """).fetchall()
    }
    assert got == want and got, (gap_min, bucket is None)
