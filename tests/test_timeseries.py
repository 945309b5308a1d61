"""Edge-case tests for the round-3 time-series / robust-stat queries
(queries/timeseries.py) and the PPJoin prefix-filter pair join
(queries/text.py::jaccard_prefix_filter_pairs) — semantics the fixture
tables can't exercise: single-event users, tiny winsorize groups, docs
at exactly the Jaccard threshold."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from dynamic_etl_pipeline_spark.queries import QUERIES


def _write_events(spark, tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = tmp_path / "sf_events"
    sf.mkdir(exist_ok=True)
    spark.createDataFrame(df).coalesce(1).write.mode("overwrite").parquet(
        str(sf / "events.parquet")
    )
    return str(sf)


T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def test_decay_ewma_single_event_is_quantized_value(spark, tmp_path):
    """A user with one event gets decayed_sum == round(value*100)/100
    (weight 2^0 = 1) — the cent-quantization contract stated in the
    docstring, and n_terms == 1."""
    sf = _write_events(spark, tmp_path, [
        (1, T0, 7, "click", 12.34, "{}"),
    ])
    [r] = QUERIES["events_decay_ewma"](spark, sf).collect()
    assert r["n_terms"] == 1
    assert r["decayed_sum"] == pytest.approx(12.34, abs=1e-12)


def test_decay_ewma_halving_weights(spark, tmp_path):
    """Three equal-value events: the last one's decayed sum is
    v + v/2 + v/4."""
    sf = _write_events(spark, tmp_path, [
        (i, T0 + dt.timedelta(minutes=i), 1, "click", 8.0, "{}")
        for i in range(3)
    ])
    rows = {r["event_id"]: r for r in
            QUERIES["events_decay_ewma"](spark, sf).collect()}
    assert rows[0]["decayed_sum"] == pytest.approx(8.0)
    assert rows[1]["decayed_sum"] == pytest.approx(8.0 + 4.0)
    assert rows[2]["decayed_sum"] == pytest.approx(8.0 + 4.0 + 2.0)
    assert rows[2]["n_terms"] == 3


def test_decay_ewma_band_is_bounded(spark, tmp_path):
    """More events than DECAY_DEPTH+1: n_terms caps at the band width —
    the join is O(n * depth), never a full per-user cross join."""
    from dynamic_etl_pipeline_spark.queries.timeseries import DECAY_DEPTH

    n = DECAY_DEPTH + 10
    sf = _write_events(spark, tmp_path, [
        (i, T0 + dt.timedelta(seconds=i), 1, "click", 1.0, "{}")
        for i in range(n)
    ])
    rows = QUERIES["events_decay_ewma"](spark, sf).collect()
    assert max(r["n_terms"] for r in rows) == DECAY_DEPTH + 1
    assert len(rows) == n


def test_user_hour_quota_split(spark, tmp_path):
    """5 events for one user in one hour -> 3 kept, 2 dropped; a second
    user with 2 events keeps both."""
    rows = [
        (i, T0 + dt.timedelta(minutes=i), 1, "click", 1.0, "{}")
        for i in range(5)
    ] + [
        (10 + i, T0 + dt.timedelta(minutes=i), 2, "view", 1.0, "{}")
        for i in range(2)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r["event_type"]: r for r in
           QUERIES["events_user_hour_quota"](spark, sf).collect()}
    assert got["click"]["kept"] == 3 and got["click"]["dropped"] == 2
    assert got["view"]["kept"] == 2 and got["view"]["dropped"] == 0


def test_winsorized_stats_small_group(spark, tmp_path):
    """n=4 values: lo rank = max(1, ceil(0.04)) = 1, hi rank = ceil(3.96)
    = 4 — cutoffs are the min and max, so the winsorized mean equals the
    plain mean; NULL values are excluded up front."""
    vals = [10.0, 20.0, 30.0, 40.0, None]
    sf = _write_events(spark, tmp_path, [
        (i, T0 + dt.timedelta(minutes=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ])
    [r] = QUERIES["events_winsorized_stats"](spark, sf).collect()
    assert r["n_values"] == 4
    assert r["lo_cut"] == 10.0 and r["hi_cut"] == 40.0
    assert r["winsorized_mean"] == pytest.approx(25.0)


def _write_docs(spark, tmp_path, texts):
    docs = pd.DataFrame({
        "doc_id": list(range(1, len(texts) + 1)),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
        "n_chars": [len(t or "") for t in texts],
    })
    sf = tmp_path / "sf_docs"
    sf.mkdir(exist_ok=True)
    spark.createDataFrame(docs).coalesce(1).write.mode("overwrite").parquet(
        str(sf / "documents.parquet")
    )
    return str(sf)


def test_prefix_filter_exact_threshold_pair(spark, tmp_path):
    """Two docs engineered to sit exactly AT Jaccard 0.6 (3 shared of 5
    union 5-gram shingles: 8*3 == 3*(4+4)) must be emitted — the >=
    boundary — while a clearly-below pair must not."""
    # doc1: 8 tokens -> shingles {abcde,bcdef,cdefg,defgh} (4)
    # doc2: same first 7 tokens, last differs -> inter=3, union=5, J=0.6
    d1 = "a b c d e f g h"
    d2 = "a b c d e f g x"
    d3 = "q r s t u v w y"
    sf = _write_docs(spark, tmp_path, [d1, d2, d3])
    pairs = {(r["doc_a"], r["doc_b"]): r for r in
             QUERIES["jaccard_prefix_filter_pairs"](spark, sf).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)]["n_common"] == 3
    assert pairs[(1, 2)]["n_union"] == 5
    assert len(pairs) == 1


def test_prefix_filter_identical_and_degenerate_docs(spark, tmp_path):
    """Identical docs pair up (J=1); empty/short/NULL docs neither pair
    nor crash."""
    t = "spark makes joins easy enough today"
    sf = _write_docs(spark, tmp_path, [t, t, "", "one two", None])
    pairs = QUERIES["jaccard_prefix_filter_pairs"](spark, sf).collect()
    assert len(pairs) == 1
    [p] = pairs
    assert (p["doc_a"], p["doc_b"]) == (1, 2)
    assert p["n_common"] == p["n_union"]


def test_user_day_streaks_gaps(spark, tmp_path):
    """User active on days 1,2,3, 5, 10,11 -> longest 3, n_streaks 3."""
    days = [1, 2, 3, 5, 10, 11]
    sf = _write_events(spark, tmp_path, [
        (i, dt.datetime(2024, 1, d, 9, 0, 0), 1, "click", 1.0, "{}")
        for i, d in enumerate(days)
    ])
    [r] = QUERIES["events_user_day_streaks"](spark, sf).collect()
    assert r["longest_streak"] == 3
    assert r["n_streaks"] == 3
    assert r["first_active_day"] == dt.datetime(2024, 1, 1)


def test_jaro_winkler_matches_duckdb_fuzz():
    """The pandas-UDF kernel reproduces DuckDB's jaro_winkler_similarity
    bit-for-bit over random strings (including empty/equal/prefix-heavy
    shapes) — the property the part_name_jw_pairs oracle relies on."""
    import random

    import duckdb

    from dynamic_etl_pipeline_spark.functions.strsim import jaro_winkler

    rng = random.Random(42)
    alpha = "abcdef \u00e9\u00f6\u65e5"  # incl. multi-byte: byte-level matching
    cases = [("", ""), ("", "a"), ("abc", "abc"), ("a" * 30, "a" * 29 + "b")]
    for _ in range(4496):  # 4500 total with the fixed shapes (COVERAGE.md)
        n1, n2 = rng.randint(0, 12), rng.randint(0, 12)
        s1 = "".join(rng.choice(alpha) for _ in range(n1))
        s2 = "".join(rng.choice(alpha) for _ in range(n2))
        if rng.random() < 0.3 and s1:
            # near-duplicates: perturb one char
            li = list(s1)
            li[rng.randrange(len(li))] = rng.choice(alpha)
            s2 = "".join(li)
        cases.append((s1, s2))
    con = duckdb.connect()
    for s1, s2 in cases:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [s1, s2]
        ).fetchone()[0]
        got = jaro_winkler(s1, s2)
        assert got == want, (s1, s2, got, want)


def test_window_exclude_current_nulls_and_singletons(spark, tmp_path):
    """EXCLUDE CURRENT ROW emulation 3VL: a single-row partition has an
    empty neighbor frame -> NULL (not 0); a NULL current row still sums
    its neighbors; all-NULL neighbors -> NULL. Verified against DuckDB's
    native EXCLUDE CURRENT ROW on the same frame."""
    import duckdb

    rows = [
        # type 'solo': single row -> NULL
        (1, T0, 1, "solo", 5.0, "{}"),
        # type 'mix': NULL current rows among non-null neighbors
        (2, T0, 1, "mix", None, "{}"),
        (3, T0 + dt.timedelta(minutes=1), 1, "mix", 7.0, "{}"),
        (4, T0 + dt.timedelta(minutes=2), 1, "mix", None, "{}"),
        # type 'allnull': every value NULL -> NULL everywhere
        (5, T0, 1, "allnull", None, "{}"),
        (6, T0 + dt.timedelta(minutes=1), 1, "allnull", None, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r["event_id"]: r["neighbor_cents"] for r in
           QUERIES["window_exclude_current"](spark, sf).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{sf}/events.parquet/*.parquet')"
    )
    from dynamic_etl_pipeline_spark.queries import ORACLES

    want = {int(r[0]): (None if r[1] is None else int(r[1]))
            for r in con.execute(ORACLES["window_exclude_current"]).fetchall()}
    assert got == want
    assert got[1] is None and got[5] is None and got[6] is None
    assert got[2] == 700 and got[4] == 700


def test_ols_trend_perfect_line(spark, tmp_path):
    """y = 2.00 + 0.50*t_minutes (cents: 200 + 50*idx per 60s step):
    slope_num/slope_den must reduce to 50/60 cents per second and the
    intercept (sum_y - slope*sum_x)/n to 200 cents."""
    from fractions import Fraction

    sf = _write_events(spark, tmp_path, [
        (i, T0 + dt.timedelta(minutes=i), 1, "click", 2.0 + 0.5 * i, "{}")
        for i in range(10)
    ])
    [r] = QUERIES["events_ols_trend"](spark, sf).collect()
    slope = Fraction(int(r["slope_num"]), int(r["slope_den"]))
    assert slope == Fraction(50, 60)
    intercept = (Fraction(r["sum_y"]) - slope * Fraction(r["sum_x"])) / r["n_points"]
    assert intercept == 200
    assert r["n_points"] == 10


def test_mode_tie_break_smallest_bucket(spark, tmp_path):
    """Two buckets tie on count -> the smaller bucket wins (the
    deterministic contract both engines follow)."""
    vals = [3.0, 3.2, 7.0, 7.4]  # buckets 3,3,7,7 -> tie, expect 3
    sf = _write_events(spark, tmp_path, [
        (i, T0 + dt.timedelta(minutes=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ])
    [r] = QUERIES["events_mode_value_per_type"](spark, sf).collect()
    assert r["mode_bucket"] == 3 and r["mode_count"] == 2


def test_equidepth_hist_quartiles(spark, tmp_path):
    """8 rows -> 4 buckets of exactly 2; edges are the order statistics."""
    vals = [float(v) for v in [1, 2, 3, 4, 5, 6, 7, 8]]
    sf = _write_events(spark, tmp_path, [
        (i, T0 + dt.timedelta(minutes=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ])
    rows = {r["bucket"]: r for r in
            QUERIES["events_equidepth_hist"](spark, sf).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert all(r["n_rows"] == 2 for r in rows.values())
    assert rows[1]["lo"] == 1.0 and rows[1]["hi"] == 2.0
    assert rows[4]["lo"] == 7.0 and rows[4]["hi"] == 8.0


def test_pareto_frontier_semantics(spark, tmp_path):
    """Hand-built 2D skyline: only non-dominated (cheap, big) points
    survive; a point dominated on both axes is dropped even when it is
    the unique holder of one value."""
    import pandas as pd

    parts = pd.DataFrame({
        "p_partkey": [1, 2, 3, 4, 5],
        "p_name": ["a", "b", "c", "d", "e"],
        "p_brand": ["B"] * 5,
        "p_type": ["T"] * 5,
        # (price, size): 1:(10,5) 2:(20,9) 3:(15,5) 4:(30,9) 5:(12,7)
        "p_size": [5, 9, 5, 9, 7],
        "p_retailprice": [10.0, 20.0, 15.0, 30.0, 12.0],
    })
    sf = tmp_path / "sf_parts"
    sf.mkdir()
    spark.createDataFrame(parts).coalesce(1).write.mode("overwrite").parquet(
        str(sf / "part.parquet")
    )
    keys = {r["p_partkey"] for r in
            QUERIES["part_pareto_frontier"](spark, str(sf)).collect()}
    # 3 dominated by 1 (cheaper, same size); 4 dominated by 2
    assert keys == {1, 2, 5}


def test_quantile_normalize_two_sources(spark, tmp_path):
    """Two types with disjoint ranges map onto the same global ladder:
    each type's max maps to the global max, and a type's median lands at
    its relative rank in the global ordering."""
    vals_a = [1.0, 2.0, 3.0, 4.0]       # low-range source
    vals_b = [101.0, 102.0, 103.0, 104.0]  # high-range source
    rows = [(i, T0 + dt.timedelta(minutes=i), 1, "a", v, "{}")
            for i, v in enumerate(vals_a)]
    rows += [(10 + i, T0 + dt.timedelta(minutes=i), 2, "b", v, "{}")
             for i, v in enumerate(vals_b)]
    sf = _write_events(spark, tmp_path, rows)
    got = {r["event_id"]: r["norm_value"] for r in
           QUERIES["events_quantile_normalize"](spark, sf).collect()}
    # global sorted ladder: 1,2,3,4,101,102,103,104 (gn=8); per-type n=4
    # idx = ceil(rn*8/4) = 2,4,6,8 for both types
    assert got[0] == 2.0 and got[1] == 4.0
    assert got[2] == 102.0 and got[3] == 104.0
    assert got[10] == 2.0 and got[13] == 104.0


def test_session_paths_null_event_type_and_singletons(spark, tmp_path):
    """NULL event_type elements drop out of the path join on BOTH
    engines (concat_ws and string_agg both skip NULLs) and a
    single-event session yields a 1-step path."""
    rows = [
        (1, T0, 1, "a", 1.0, "{}"),
        (2, T0 + dt.timedelta(minutes=1), 1, None, 1.0, "{}"),
        (3, T0 + dt.timedelta(minutes=2), 1, "b", 1.0, "{}"),
        # user 2: one lone event, new session far away
        (4, T0, 2, "z", 1.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r["path"]: r["n_sessions"] for r in
           QUERIES["events_session_paths"](spark, sf).collect()}
    assert got == {"a>b": 1, "z": 1}


def test_max_concurrent_sessions_overlap(spark, tmp_path):
    """Three users with overlapping sessions: peak concurrency is 3 at
    the overlap, and a zero-duration (single-event) session still
    registers."""
    rows = [
        # user 1: 09:00-09:10
        (1, T0, 1, "a", 1.0, "{}"),
        (2, T0 + dt.timedelta(minutes=10), 1, "a", 1.0, "{}"),
        # user 2: 09:05-09:15
        (3, T0 + dt.timedelta(minutes=5), 2, "a", 1.0, "{}"),
        (4, T0 + dt.timedelta(minutes=15), 2, "a", 1.0, "{}"),
        # user 3: single event at 09:07 (zero-duration session)
        (5, T0 + dt.timedelta(minutes=7), 3, "a", 1.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    [r] = QUERIES["events_max_concurrent_sessions"](spark, sf).collect()
    assert r["peak_concurrent"] == 3


def test_benford_excludes_nonpositive(spark, tmp_path):
    """Zero, negative, and NULL values are excluded; digits come from
    cent-quantized integers (0.05 -> cents 5 -> digit 5)."""
    vals = [0.0, -12.3, None, 0.05, 123.45, 9.99]
    sf = _write_events(spark, tmp_path, [
        (i, T0 + dt.timedelta(minutes=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ])
    got = {r["first_digit"]: r["n"] for r in
           QUERIES["events_benford_profile"](spark, sf).collect()}
    assert got == {5: 1, 1: 1, 9: 1}


def test_autocorr_lag1_perfect_and_none(spark, tmp_path):
    """A strictly increasing sequence has lag-1 Pearson r == 1 exactly
    (cov^2 == var_y * var_lag); a constant sequence has zero variance
    numerators."""
    from fractions import Fraction

    rows = [(i, T0 + dt.timedelta(minutes=i), 1, "inc", float(i + 1), "{}")
            for i in range(6)]
    rows += [(10 + i, T0 + dt.timedelta(minutes=i), 1, "flat", 5.0, "{}")
             for i in range(4)]
    sf = _write_events(spark, tmp_path, rows)
    got = {r["event_type"]: r for r in
           QUERIES["events_autocorr_lag1"](spark, sf).collect()}
    inc = got["inc"]
    cov, vy, vl = (int(inc["cov_num"]), int(inc["var_y_num"]),
                   int(inc["var_lag_num"]))
    assert Fraction(cov * cov, vy * vl) == 1 and cov > 0
    flat = got["flat"]
    assert int(flat["var_y_num"]) == 0 and int(flat["cov_num"]) == 0
