"""Corpus-curation quality rules (SURVEY §2.12 north star): the
published pre-training filters — Gopher-style repetition/shape signals
(Rae et al. 2021, "Scaling Language Models", appendix A1) and
cross-document boilerplate n-gram detection (the CCNet/C4 shared-line
idea at n-gram granularity, since the fixture texts are single-line).

All deterministic, DuckDB-oracle-checkable, and shuffle-light: the
per-document signals are MAP-ONLY (array higher-order functions, no
explode, no shuffle — at 100 TB this runs at scan speed), and the
boilerplate pass is one explode + one shuffle keyed by the n-gram plus
a broadcast join back, the same inverted-index shape as
text.py::ngram_jaccard_pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..materialize import materialize
from ..catalog import load_table
from ..operators.shingles import drop_stop_shingles, word_ngram_arrays
from ..operators.twolevel import two_level_running_sum
from ._helpers import spread
from .registry import query

# Gopher-flavored gates, adapted to the fixture corpus (synthetic
# space-separated word soup: no newlines, no punctuation, 8-100 words).
_MIN_WORDS, _MAX_WORDS = 10, 100_000
_MIN_MWL, _MAX_MWL = 2.0, 12.0       # mean word length (Gopher: 3-10)
_TOP2_MAX = 0.20                     # frac tokens in most-frequent 2-gram
_DUP3_MAX = 0.60                     # frac of 3-gram positions duplicated


@query("doc_gopher_quality", oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), g AS (
  SELECT doc_id, toks, len(toks) AS n_words,
         CASE WHEN len(toks) >= 2 THEN
           list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i+1])
         ELSE [] END AS g2,
         CASE WHEN len(toks) >= 3 THEN
           list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ELSE [] END AS g3
  FROM t
), s AS (
  SELECT doc_id, n_words,
         CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
           / n_words AS mean_word_len,
         CASE WHEN len(g2) = 0 THEN 0.0 ELSE
           CAST(2 * list_max(list_transform(list_distinct(g2),
                  d -> len(list_filter(g2, x -> x = d)))) AS DOUBLE) / n_words
         END AS top2gram_frac,
         CASE WHEN len(g3) = 0 THEN 0.0 ELSE
           1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
         END AS dup3gram_frac
  FROM g
)
SELECT doc_id, CAST(n_words AS INT) AS n_words,
       round(mean_word_len, 6) AS mean_word_len,
       round(top2gram_frac, 6) AS top2gram_frac,
       round(dup3gram_frac, 6) AS dup3gram_frac,
       (n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS}
        AND mean_word_len BETWEEN {_MIN_MWL} AND {_MAX_MWL}
        AND top2gram_frac < {_TOP2_MAX}
        AND dup3gram_frac < {_DUP3_MAX}) AS keep
FROM s
""")
def doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document quality gates: word count bounds, mean
    word length, fraction of tokens inside the most-frequent word
    2-gram, and duplicated-3-gram fraction — the repetition signals
    that catch looping/boilerplate generations exact dedup misses.

    Everything is computed INSIDE the row with array higher-order
    functions (transform / filter / array_max over the token array):
    map-only, zero shuffles, zero UDFs — the filter runs at parquet
    scan speed no matter the corpus size. The most-frequent-2-gram
    multiplicity is O(distinct x total) per doc, bounded by document
    length, not corpus size."""
    # spread(): the fixture's 1-row-group parquet scans as ONE task; the
    # per-doc 2-gram multiplicity fold is the compute-heavy narrow stage
    # this repartition parallelizes (production many-file input makes it
    # a no-op knob)
    return gopher_signals(spread(load_table(spark, sf_dir, "documents")))


def gopher_signals(d: DataFrame) -> DataFrame:
    """The query body over any (doc_id, text) frame — factored out so
    edge cases the fixture lacks (empty text, 1-2 token docs) are
    directly testable (tests/test_curation.py)."""
    toks = F.split("text", " ")
    n = F.size("toks")

    def grams(k: int):
        # guarded: sequence(1, n-k+1) is only evaluated when n >= k, so
        # the descending-sequence trap (ADVICE r01) can't fire
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(F.col("toks"), i + j) for j in range(k)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    top2 = F.when(F.size("g2") == 0, F.lit(0.0)).otherwise(
        2.0
        * F.array_max(
            F.transform(
                F.array_distinct("g2"),
                lambda d_: F.size(F.filter(F.col("g2"), lambda x: x == d_)),
            )
        ).cast("double")
        / F.col("n_words")
    )
    dup3 = F.when(F.size("g3") == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct("g3")).cast("double") / F.size("g3")
    )
    mwl = (
        F.aggregate(
            F.transform("toks", F.length), F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).cast("double")
        / F.col("n_words")
    )
    keep = (
        F.col("n_words").between(_MIN_WORDS, _MAX_WORDS)
        & F.col("mean_word_len").between(_MIN_MWL, _MAX_MWL)
        & (F.col("top2gram_frac") < _TOP2_MAX)
        & (F.col("dup3gram_frac") < _DUP3_MAX)
    )
    return (
        d.select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks", n.cast("int").alias("n_words"),
                grams(2).alias("g2"), grams(3).alias("g3"))
        .select("doc_id", "n_words",
                F.round(mwl, 6).alias("mean_word_len"),
                F.round(top2, 6).alias("top2gram_frac"),
                F.round(dup3, 6).alias("dup3gram_frac"))
        .select("doc_id", "n_words", "mean_word_len", "top2gram_frac",
                "dup3gram_frac", keep.alias("keep"))
    )


_BOILER_N = 5      # boilerplate n-gram width (words)
_BOILER_DF = 20    # appears in >= this many distinct docs => boilerplate


@query("corpus_boilerplate_ngrams", oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= {_BOILER_N}
), pos AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) - {_BOILER_N} + 2),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                || ' ' || toks[i+3] || ' ' || toks[i+4])) AS gram
  FROM t
), df AS (
  SELECT gram, count(DISTINCT doc_id) AS n_docs FROM pos GROUP BY gram
), boiler AS (
  SELECT gram FROM df WHERE n_docs >= {_BOILER_DF}
)
SELECT doc_id,
       count(*) AS n_grams,
       CAST(count(*) FILTER (WHERE boiler.gram IS NOT NULL) AS BIGINT)
         AS n_boiler,
       round(CAST(count(*) FILTER (WHERE boiler.gram IS NOT NULL) AS DOUBLE)
             / count(*), 6) AS boiler_frac
FROM pos LEFT JOIN boiler USING (gram)
GROUP BY doc_id
""")
def corpus_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection: a word-{n}-gram occurring
    in >= {df} distinct documents is boilerplate (headers, disclaimers,
    navigation chrome — the C4/CCNet shared-line filter at n-gram
    granularity); each document reports what fraction of its n-gram
    positions are boilerplate, the signal used to drop template pages.

    Shape: one explode keyed by the gram -> distinct-doc count, then
    the surviving boilerplate set joins back onto the position stream
    — no self-join, no quadratic stage. Gram keys are NOT uniform (a
    true boilerplate gram appears in millions of docs — that's the
    definition), but the df count dedupes within-doc repeats MAP-SIDE
    (array_distinct before the explode), so count(*) by gram equals
    count(DISTINCT doc_id) in a single exchange whose map-side
    partials deliver at most one row per gram per partition — no task
    ever holds a hot gram's full posting list. The broadcast-back is
    bounded by |positions| / df_threshold grams; at corpus scale raise
    the threshold (boilerplate by definition has high df) or drop the
    hint and let AQE pick a shuffle join — both sides stay linear."""
    return boilerplate_ngrams(load_table(spark, sf_dir, "documents"))


def boilerplate_ngrams(d: DataFrame, n: int = _BOILER_N,
                       df_threshold: int = _BOILER_DF) -> DataFrame:
    """The query body over any (doc_id, text) frame (testable with
    synthetic corpora; the registered query uses the fixture defaults)."""
    toks = F.split("text", " ")
    base = (
        d.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= n)
    )
    pos = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at(F.col("toks"), i + j)
                      for j in range(n)],
                ),
            )
        ).alias("gram"),
    )
    # Distinct-doc counts via map-side per-doc dedup: array_distinct
    # collapses a gram's within-doc repeats BEFORE the explode, so a
    # plain count(*) by gram equals count(DISTINCT doc_id) — one
    # exchange with map-side partial counts instead of countDistinct's
    # two (the (gram, doc_id) expand + the gram re-agg). Hot grams stay
    # safe: partial aggregation delivers at most one row per gram per
    # map partition, so no task ever holds a hot gram's posting list.
    df_ = (
        base.select(
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                        lambda i: F.concat_ws(
                            " ",
                            *[F.element_at(F.col("toks"), i + j)
                              for j in range(n)],
                        ),
                    )
                )
            ).alias("gram")
        )
        .groupBy("gram")
        .agg(F.count("*").alias("n_docs"))
    )
    boiler = df_.filter(F.col("n_docs") >= df_threshold).select(
        "gram", F.lit(True).alias("is_boiler")
    )
    return (
        pos.join(F.broadcast(boiler), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("is_boiler"), 1).otherwise(0))
            .cast("bigint").alias("n_boiler"),
            F.round(
                F.sum(F.when(F.col("is_boiler"), 1).otherwise(0))
                .cast("double") / F.count("*"), 6,
            ).alias("boiler_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Boilerplate REMOVAL (the rewrite step that follows detection): drop
# every token covered by a cross-document boilerplate n-gram and
# re-assemble the document. Fixture texts are unique word soup, so the
# corpus is augmented with a synthetic shared footer on even doc_ids
# (the doc_pii_redact convention) — the footer's interior 5-grams recur
# across ~half the corpus and trip the df threshold; 5-grams spanning
# the original-text boundary stay unique and survive.
_FOOTER = " all rights reserved click here to unsubscribe"


@query("corpus_boilerplate_strip", oracle=f"""
WITH corpus AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 2 = 0 THEN '{_FOOTER}' ELSE '' END AS body
  FROM documents
), t AS (
  SELECT doc_id, string_split(body, ' ') AS toks FROM corpus
), pos AS (
  SELECT doc_id, CAST(i AS INT) AS i,
         toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT)+1] || ' '
           || toks[CAST(i AS INT)+2] || ' ' || toks[CAST(i AS INT)+3]
           || ' ' || toks[CAST(i AS INT)+4] AS gram
  FROM t, unnest(range(1, len(toks) - 3)) AS r(i)
  WHERE len(toks) >= {_BOILER_N}
), df AS (
  SELECT gram, count(DISTINCT doc_id) AS n_docs FROM pos GROUP BY gram
), boiler AS (
  SELECT gram FROM df WHERE n_docs >= {_BOILER_DF}
), covered AS (
  SELECT DISTINCT pos.doc_id, CAST(p AS INT) AS p
  FROM pos JOIN boiler USING (gram),
       unnest(range(pos.i, pos.i + {_BOILER_N})) AS c(p)
), toks_pos AS (
  SELECT doc_id, CAST(i AS INT) AS p, toks[CAST(i AS INT)] AS tok
  FROM t, unnest(range(1, len(toks) + 1)) AS r(i)
), kept AS (
  SELECT tp.doc_id, tp.p, tp.tok
  FROM toks_pos tp LEFT JOIN covered c
    ON tp.doc_id = c.doc_id AND tp.p = c.p
  WHERE c.p IS NULL
), rebuilt AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY p) AS text_clean
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(toks) - coalesce(n_kept, 0) AS INT) AS n_removed,
       coalesce(text_clean, '') AS text_clean
FROM t LEFT JOIN rebuilt USING (doc_id)
""")
def corpus_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate span removal: tokens covered by any >=df-document
    5-gram are deleted and the document re-assembled in original token
    order — the C4 'remove the shared line, keep the page' rewrite at
    n-gram granularity.

    Scale shape — two shuffles total: (1) the gram-df inverted-index
    aggregate (same as corpus_boilerplate_ngrams), (2) collecting each
    document's boilerplate START positions into one array row. The
    rewrite itself is then MAP-ONLY: a higher-order ``filter`` keeps
    token i unless some start s covers it (exists s in [i-n+1, i]),
    and the document re-assembles with array_join — no per-position
    explode, no anti join, no order-restoring re-aggregation, so the
    only thing ever shuffled is n-gram stats and the (doc, starts)
    hit list, both vocabulary/hit-sized rather than corpus-sized.
    Fully-stripped documents stay in the output as empty strings,
    preserving corpus row identity for downstream audits. (The DuckDB
    oracle spells the same semantics with the explicit position
    anti-join, pinning the rewrite's equivalence.)"""
    n, thr = _BOILER_N, _BOILER_DF
    # spread (r12 opt): both 5-gram explode branches below are
    # compute-heavy narrow chains; without the row shuffle they run on
    # the scan's partitioning (one task per fixture row group).
    # Measured x0.74 at sf0.1 (3.32 -> 2.47 s best-of-4).
    d = spread(load_table(spark, sf_dir, "documents"))
    corpus = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(_FOOTER)).otherwise(""),
        ).alias("body"),
    )
    t = corpus.select("doc_id", F.split("body", " ").alias("toks"))
    pos = t.filter(F.size("toks") >= n).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("i"),
                    F.concat_ws(
                        " ",
                        *[F.element_at(F.col("toks"), i + j) for j in range(n)],
                    ).alias("gram"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.i", "s.gram")
    # df-count branch: dedupe grams WITHIN each doc map-side
    # (array_distinct over the per-doc gram array), then a plain
    # count(*) by gram — count-distinct-docs without countDistinct's
    # second exchange, and with map-side partial aggregation the
    # (gram, doc_id) expand never gets. This branch also skips the
    # positional struct entirely; positions are only materialized on
    # the (much smaller post-broadcast-filter) hits path below.
    boiler = (
        t.filter(F.size("toks") >= n)
        .select(
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                        lambda i: F.concat_ws(
                            " ",
                            *[F.element_at(F.col("toks"), i + j)
                              for j in range(n)],
                        ),
                    )
                )
            ).alias("gram")
        )
        .groupBy("gram")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= thr)
        .select("gram")
    )
    hits = (
        pos.join(F.broadcast(boiler), "gram")
        .groupBy("doc_id")
        .agg(F.collect_list("i").alias("starts"))
    )
    kept = F.filter(
        F.col("toks"),
        lambda x, i: ~F.coalesce(
            F.exists(
                F.col("starts"),
                # token index i is 0-based; start s covers tokens
                # [s, s+n-1] 1-based, i.e. i+1 in [s, s+n-1]
                lambda s_: (i + 1 >= s_) & (i + 1 <= s_ + (n - 1)),
            ),
            F.lit(False),
        ),
    )
    return (
        t.join(F.broadcast(hits), "doc_id", "left")
        .withColumn("_kept", kept)
        .select(
            "doc_id",
            (F.size("toks") - F.size("_kept")).cast("int").alias("n_removed"),
            F.array_join(F.col("_kept"), " ").alias("text_clean"),
        )
    )


# ---------------------------------------------------------------------------
# Round-3 additions: vocabulary pruning / OOV scoring, token-budget
# data selection, and directional n-gram containment — three more
# standard pre-training curation steps, each DuckDB-oracle-exact.
# ---------------------------------------------------------------------------

_VOCAB_MIN_FREQ = 2


@query("doc_vocab_oov_rate", oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), wc AS (
  SELECT word, count(*) AS freq FROM tok GROUP BY word
), vocab AS (
  SELECT word FROM wc WHERE freq >= {_VOCAB_MIN_FREQ}
)
SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (WHERE v.word IS NULL) AS BIGINT) AS n_oov,
       round(CAST(count(*) FILTER (WHERE v.word IS NULL) AS DOUBLE)
             / count(*), 6) AS oov_rate
FROM tok LEFT JOIN vocab v USING (word)
GROUP BY tok.doc_id
""")
def doc_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-pruned vocabulary + per-document out-of-vocabulary
    rate — the tokenizer-coverage signal: a doc whose words mostly
    fall outside the corpus vocabulary (freq >= {min_freq}) is noise,
    another language, or mojibake, and OOV rate is the standard gate.

    Shape: one word-count aggregate (map-side combining, word-keyed),
    one token->vocab join (word-keyed; vocab is the FILTERED word set
    — broadcastable into the ~100M-distinct-terms regime, shuffle
    join beyond, see SCALING.md), one per-doc aggregate. All three
    shuffles linear in tokens; no windows, no collects.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    vocab = (
        tok.groupBy("word").agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= _VOCAB_MIN_FREQ)
        .select("word", F.lit(True).alias("_in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint").alias("n_oov"),
            F.round(
                F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
                .cast("double") / F.count("*"), 6,
            ).alias("oov_rate"),
        )
    )


_TOKEN_BUDGET = 20_000


@query("corpus_token_budget_fill", oracle=f"""
WITH t AS (
  SELECT doc_id, source, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), w AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM w WHERE cum_tokens - n_tokens < {_TOKEN_BUDGET}
""")
def corpus_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data selection: fill a per-source token budget
    ({budget} tokens) greedily, preferring longer documents
    (n_chars DESC, doc_id tie-break) — the "select the best N tokens
    per domain" step every mixture-building pipeline runs before
    packing. A document is taken while the budget is not yet full
    when it starts (the last doc may overflow, standard fill rule).

    Shape: source cardinality is small (a per-source window holds the
    whole domain in one task), so the running sum goes through the
    two-level bucketed prefix sum (operators/twolevel.py) partitioned
    by source: the bucket is -n_chars DIV 256 — monotone ascending in
    the (n_chars DESC, doc_id) order — so per-bucket local cumsums +
    broadcast bucket offsets reproduce the greedy fill exactly with
    no source-sized sort in a single task.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    t = d.select(
        "doc_id", "source", "n_chars",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    return (
        two_level_running_sum(
            t, val="n_tokens",
            order_cols=[F.desc("n_chars"), F.asc("doc_id")],
            bucket=F.floor(-F.col("n_chars") / F.lit(256)).cast("long"),
            out_col="cum_tokens", part_cols=["source"],
        )
        .filter(F.col("cum_tokens") - F.col("n_tokens") < _TOKEN_BUDGET)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


_CONTAIN_MIN = 0.5


@query("doc_ngram_containment_pairs", oracle=f"""
WITH tk AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), shingled AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
  FROM tk
), counts AS (
  SELECT doc_id, count(*) AS n_sh FROM shingled GROUP BY doc_id
), hot AS (
  -- mirror of the engine's stop-shingle cap (operators/shingles.py)
  SELECT shingle FROM shingled GROUP BY shingle
  HAVING count(*) > greatest(100, CAST(floor(least(
    0.05 * (SELECT count(DISTINCT doc_id) FROM shingled),
    10.0 * sqrt((SELECT count(DISTINCT doc_id) FROM shingled))))
    AS BIGINT))
), capped AS (
  SELECT * FROM shingled ANTI JOIN hot USING (shingle)
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM capped a JOIN capped b USING (shingle)
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
       CAST(n_common AS DOUBLE) / ca.n_sh AS containment
FROM pairs JOIN counts ca ON ca.doc_id = doc_a
WHERE CAST(n_common AS DOUBLE) / ca.n_sh >= {_CONTAIN_MIN}
""")
def doc_ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional n-gram containment C(A,B) = |sh(A) ∩ sh(B)| /
    |sh(A)|: near-dup detection's asymmetric twin — catches a short
    doc embedded inside a longer one (quote farms, scraped excerpts),
    which symmetric Jaccard under-scores exactly when the size ratio
    is large. Emits (doc_a, doc_b) when A is >= {c}% contained in B;
    both directions can appear, by design.

    Same inverted-index shape as ngram_jaccard_pairs (shingle-keyed
    self-join, never a doc cross join); the division is by the LEFT
    doc's shingle count only. Hot-shingle skew is bounded by the
    stop-shingle cap (operators/shingles.py::drop_stop_shingles,
    default-on): shingles in > max(100, 5% of docs) documents carry
    no dedup signal and are dropped from the JOIN SIDES before the
    self-join; the per-doc counts (the containment denominator) stay
    uncapped. When the cap triggers, a surviving pair's n_common (and
    hence containment) is a LOWER BOUND of the exact value — it loses
    only the boilerplate grams' contribution; on corpora below the
    threshold (all fixtures) the result is exact.
    """
    d = load_table(spark, sf_dir, "documents")
    # doc-level arrays as the checkpointed form (r12 opt — see
    # ngram_jaccard_pairs): counts become map-side size(shingles)
    arrs = word_ngram_arrays(spread(d), 3).transform(materialize)
    shingled = arrs.select("doc_id", F.explode("shingles").alias("shingle"))
    counts = arrs.select(
        "doc_id", F.size("shingles").cast("long").alias("n_sh")
    )
    capped = drop_stop_shingles(shingled, label="doc_ngram_containment_pairs")
    # Size pre-filter (r12, the keep-best pattern one-sided): the final
    # test n_common / n_a >= 0.5 together with n_common <= n_b (common
    # shingles of B are a subset of B's, capped or not) forces
    # 2*n_b >= n_a — so carrying the exact per-doc counts onto the
    # postings lets the join drop (big A, sub-half B) directions BEFORE
    # the (doc_a, doc_b) aggregate shuffle. Provably lossless: the
    # final containment filter is unchanged and any pair passing it
    # passes the size test. The counts broadcast is |docs|-row — same
    # documented ~100M-row bound as dedup_keep_best_exact's.
    a = (
        capped.join(F.broadcast(counts), "doc_id")
        .select(F.col("doc_id").alias("doc_a"),
                F.col("n_sh").alias("_na"), "shingle")
    )
    b = (
        capped.join(F.broadcast(counts), "doc_id")
        .select(F.col("doc_id").alias("doc_b"),
                F.col("n_sh").alias("_nb"), "shingle")
    )
    pairs = (
        a.join(b, "shingle")
        .filter(
            (F.col("doc_a") != F.col("doc_b"))
            & (2 * F.col("_nb") >= F.col("_na"))
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_common"),
             F.first("_na").alias("n_sh"))
    )
    return (
        pairs.withColumn(
            "containment",
            F.col("n_common").cast("double") / F.col("n_sh"),
        )
        .filter(F.col("containment") >= _CONTAIN_MIN)
        .select("doc_a", "doc_b", "n_common", "containment")
    )


# Pinned quality model (r4 judge item #4): distilled from a
# train_logreg run over the planted corpus at sf0.01 (12 iters, lr=2.0,
# binary hashed features — the run is reproduced bit-exactly by
# tests/test_classifier.py since gradients accumulate in decimal).
# Each marker token's learned bucket weight was -2.851392 (the three
# markers always co-occur, so their gradients are identical); the bias
# is the trained model's MEDIAN CLEAN-DOC MARGIN (4.746412), i.e. the
# distillation collapses the diffuse soup-token mass into a constant.
_QC_MARKERS = ("clickspam", "winnow", "prize")
_QC_W = -2.851392
_QC_B = 4.746412


@query("doc_quality_classifier", oracle=f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' clickspam winnow prize clickspam prize'
              ELSE text END AS text,
         CAST(doc_id % 3 <> 0 AS DOUBLE) AS label
  FROM documents
), m AS (
  SELECT doc_id, label,
         {_QC_B} + {_QC_W} * (
           {" + ".join(f"CAST(list_contains(string_split(text, ' '), '{t}') AS INT)" for t in _QC_MARKERS)}
         ) AS margin
  FROM aug
)
SELECT doc_id, label,
       round(1.0 / (1.0 + exp(-margin)), 4) AS prob,
       CAST(1.0 / (1.0 + exp(-margin)) >= 0.5 AS INT) AS pred
FROM m
""")
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier SCORING pass with pinned distilled weights —
    the production shape of the CCNet/LLaMA curation stage: the model
    is trained offline (operators/classifier.py — hashed bag-of-words
    + full-batch logistic regression as DataFrame aggregations, its
    training loop pinned bit-deterministic and perfectly separating in
    tests/test_classifier.py) and applied to the corpus as a constant.

    Pinning the weights (provenance above) makes the query map-only —
    one array_contains + sigmoid per row at scan speed, no shuffle, no
    iteration — and exactly DuckDB-oracle-checkable, which an in-query
    GD loop can never be (and which also removes the 13.6 s in-query
    training cost the r4 sweep flagged). The planted spam convention
    (doc_id % 3 == 0 gets a marker phrase) provides labels; the pinned
    model separates them perfectly at every SF.
    """
    d = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    spam = F.col("doc_id") % 3 == 0
    corpus = d.select(
        "doc_id",
        F.when(
            spam,
            F.concat_ws(" ", "text",
                        F.lit("clickspam winnow prize clickspam prize")),
        ).otherwise(F.col("text")).alias("text"),
        (~spam).cast("double").alias("label"),
    )
    toks = F.split("text", " ")
    n_markers = sum(
        F.array_contains(toks, t).cast("int") for t in _QC_MARKERS
    )
    margin = F.lit(_QC_B) + F.lit(_QC_W) * n_markers
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return corpus.select(
        "doc_id", "label",
        F.round(prob, 4).alias("prob"),
        (prob >= 0.5).cast("int").alias("pred"),
    )


_SPAN_K = 8  # duplicated-substring granularity (tokens)


@query("doc_duplicate_spans", oracle=f"""
WITH tk AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sized AS (
  SELECT doc_id, toks, len(toks) AS n FROM tk WHERE len(toks) >= {_SPAN_K}
), win AS (
  SELECT doc_id, n,
         unnest(range(1, n - {_SPAN_K} + 2)) AS pos
  FROM sized
), keyed AS (
  SELECT w.doc_id, w.n, w.pos,
         md5(array_to_string(s.toks[w.pos : w.pos + {_SPAN_K} - 1], ' '))
           AS whash
  FROM win w JOIN sized s USING (doc_id)
), dup AS (
  SELECT whash FROM keyed GROUP BY whash
  HAVING count(DISTINCT doc_id) >= 2
), d AS (
  SELECT k.doc_id, k.n, k.pos,
         CASE WHEN k.pos > lag(k.pos) OVER (
                PARTITION BY k.doc_id ORDER BY k.pos) + {_SPAN_K}
              OR lag(k.pos) OVER (
                PARTITION BY k.doc_id ORDER BY k.pos) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM keyed k JOIN dup USING (whash)
), isl AS (
  SELECT doc_id, n, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM d
), spans AS (
  SELECT doc_id, n, island,
         min(pos) AS s, max(pos) + {_SPAN_K} - 1 AS e
  FROM isl GROUP BY 1, 2, 3
)
SELECT doc_id,
       CAST(count(*) AS INT) AS n_spans,
       CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens,
       CAST(max(n) AS INT) AS n_tokens,
       CAST(sum(e - s + 1) AS DOUBLE) / max(n) AS dup_frac
FROM spans GROUP BY doc_id
""")
def doc_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-duplication spans at {k}-token granularity
    (the tractable fixed-width form of Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": suffix-array exact
    spans ≈ merged runs of duplicated k-token windows): every k-token
    window occurring in ≥ 2 distinct documents is duplicated; per
    document, overlapping/adjacent duplicated windows merge into spans
    (gaps-and-islands over window positions) and the query reports
    span count, covered tokens, and the duplicated-token fraction —
    the signal span-level dedup trims on.

    Scale shape: one explode keyed by the window fingerprint (md5 of
    the window text — engine-portable, and the shuffle carries a
    16-byte key instead of k words), one map-side-combining distinct-
    doc count, an equi-join back, and doc-partitioned island windows.
    Never a document cross join; hot boilerplate windows cost
    |postings| join rows, not |postings|^2, because the dup-decision
    is an AGGREGATE (count >= 2), not a pair enumeration."""
    k = _SPAN_K
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    sized = (
        spread(d).select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= k)
        .withColumn("n", F.size("toks"))
    )
    keyed = sized.select(
        "doc_id", "n",
        F.explode(F.sequence(F.lit(1), F.col("n") - (k - 1))).alias("pos"),
        "toks",
    ).select(
        "doc_id", "n", "pos",
        F.md5(
            F.concat_ws(" ", F.slice("toks", F.col("pos"), k)).cast("binary")
        ).alias("whash"),
    )
    dup = (
        keyed.groupBy("whash")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("whash")
    )
    hits = keyed.join(dup, "whash")
    w_ord = Window.partitionBy("doc_id").orderBy("pos")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = (
        hits.withColumn("_lag", F.lag("pos").over(w_ord))
        .withColumn(
            "brk",
            F.when(
                F.col("_lag").isNull() | (F.col("pos") > F.col("_lag") + k),
                1,
            ).otherwise(0),
        )
        .withColumn("island", F.sum("brk").over(w_run))
    )
    spans = isl.groupBy("doc_id", "n", "island").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + (k - 1)).alias("e"),
    )
    return spans.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("dup_tokens"),
        F.max("n").cast("int").alias("n_tokens"),
        (
            F.sum(F.col("e") - F.col("s") + 1).cast("double") / F.max("n")
        ).alias("dup_frac"),
    )
