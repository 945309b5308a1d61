"""Text-analysis + dedup operators over the documents table (SURVEY
§2.12 / the BASELINE north star): token stats, quality scoring,
fingerprinting, word frequency, exact dedup, n-gram Jaccard near-dup.

All deterministic and DuckDB-oracle-checkable. The probabilistic /
hash-based variants (MinHash-LSH, SimHash) live in
``dynamic_etl_pipeline_spark.operators.dedup`` with rows-only checks,
since their hash functions are engine-specific.

Scale stance: everything here is explode -> shuffle-on-key -> aggregate;
the n-gram self-join joins on the shingle (high cardinality, uniform),
never a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..materialize import materialize
from ..catalog import load_table
from ..operators.shingles import drop_stop_shingles, word_ngram_arrays
from ._helpers import davg, spread
from .registry import query


@query("doc_token_stats", oracle="""
SELECT doc_id, lang,
       CAST(length(text) AS INT) AS n_chars_measured,
       CAST(len(string_split_regex(text, '\\s+')) AS INT) AS n_tokens,
       CAST(len(list_distinct(string_split_regex(text, '\\s+'))) AS INT)
         AS n_unique_tokens,
       CAST(len(list_distinct(string_split_regex(text, '\\s+'))) AS DOUBLE)
         / len(string_split_regex(text, '\\s+')) AS ttr
FROM documents
""")
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts + type-token ratio (all codegen'd
    builtins; the int/int division is bit-deterministic, no rounding)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    return d.select(
        "doc_id", "lang",
        F.length("text").cast("int").alias("n_chars_measured"),
        n_tok.cast("int").alias("n_tokens"),
        n_uniq.cast("int").alias("n_unique_tokens"),
        (n_uniq.cast("double") / n_tok).alias("ttr"),
    )


# GPT-2-style pre-tokenizer regex (simplified to the RE2 ∩ java.util.regex
# dialect: no lookahead): contraction suffixes, space-prefixed word /
# number / punctuation runs, residual spaces. Same pattern text on both
# engines; both RE2 (DuckDB) and java.util.regex pick alternatives
# leftmost-first, so the token streams are identical.
_BPE_PAT = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"
_BPE_PAT_SQL = _BPE_PAT.replace("'", "''")


@query("doc_bpe_token_stats", oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '{_BPE_PAT_SQL}')) AS n_bpe,
         len(string_split_regex(text, '\\s+')) AS n_ws
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
       CAST(CAST(sum(n_bpe) AS DOUBLE) / sum(n_ws) AS DOUBLE)
         AS bpe_per_word
FROM t GROUP BY lang
""")
def doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-style pre-tokenizer regex (the
    whitespace count in doc_token_stats underestimates LLM token cost;
    this is the standard GPT-2 pre-split granularity). Per-language
    totals + tokens-per-word expansion factor. Pure codegen'd
    regexp_extract_all — no UDF."""
    d = load_table(spark, sf_dir, "documents")
    n_bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), 0))
    n_ws = F.size(F.split("text", r"\s+"))
    return (
        d.select("lang", n_bpe.alias("n_bpe"), n_ws.alias("n_ws"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bpe").cast("bigint").alias("total_bpe_tokens"),
            (F.sum("n_bpe").cast("double") / F.sum("n_ws"))
            .cast("double").alias("bpe_per_word"),
        )
    )


@query("doc_stats_by_lang", oracle="""
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(CAST(n_chars AS DECIMAL(27,4))) AS DOUBLE) / count(n_chars)
         AS avg_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents
GROUP BY lang, source
""")
def doc_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile by language x source."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            davg("n_chars").alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@query("doc_fingerprint", oracle="""
SELECT doc_id,
       md5(text) AS content_hash,
       substring(md5(text), 1, 8) AS short_key,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes
FROM documents
""")
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting: md5 hashes identically on both engines
    (UTF-8 bytes), making it the engine-portable dedup key."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("text").cast("binary"))
    return d.select(
        "doc_id",
        h.alias("content_hash"),
        F.substring(h, 1, 8).alias("short_key"),
        F.octet_length("text").cast("int").alias("n_bytes"),
    )


@query("word_freq_top20", oracle="""
SELECT tok, count(*) AS freq
FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM documents)
GROUP BY tok
ORDER BY freq DESC, tok
LIMIT 20
""")
def word_freq_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide term frequency, top-20. Partial aggregation collapses
    the exploded tokens map-side before the single shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("tok"))
        .limit(20)
    )


@query("doc_tf_idf_top", oracle="""
WITH tokens AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM tokens GROUP BY doc_id, tok
), df AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM tokens GROUP BY tok
), n AS (
  SELECT count(*) AS n_docs FROM documents
)
SELECT doc_id, tok,
       round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
FROM tf JOIN df USING (tok) CROSS JOIN n
WHERE doc_id < 10
""")
def doc_tf_idf_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: explode -> tf per (doc, term) -> df per term -> join.

    Document frequency is DERIVED from the tf aggregate (a (doc, tok)
    row exists iff the doc contains the tok, so df = count over tf) —
    the token explode and the (doc_id, tok) shuffle happen once and the
    df branch is a ReusedExchange, not a second pass over the corpus.
    The df side is tiny (vocabulary-sized) and broadcast; n_docs is a
    scalar broadcast. ln() differs in the last ulp between JVM and C
    libm, hence round(6) on both sides.
    """
    d = load_table(spark, sf_dir, "documents")
    tokens = spread(d).select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    )
    tf = tokens.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    # n_docs as a broadcast 1-row frame (r12 opt): the old d.count()
    # was a separate scan job per execution purely to inline a literal;
    # the oracle's own CROSS JOIN n shape does it inside the one plan.
    # Same double: ln(n/df) is the identical IEEE division either way.
    n = d.agg(F.count("*").cast("double").alias("_scalar_gate_n_docs"))
    return (
        tf.join(F.broadcast(df), "tok")
        .filter(F.col("doc_id") < 10)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "tok",
            F.round(F.col("tf") * F.log(F.col("_scalar_gate_n_docs") / F.col("df")), 6)
            .alias("tfidf"),
        )
    )


@query("doc_quality_score", oracle="""
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks, text FROM documents
)
SELECT doc_id,
       CAST(len(list_filter(toks, w -> w IN ('the','a','and','of','to','in','is')))
            AS INT) AS n_stopwords,
       CAST(len(list_filter(toks, w -> w IN ('the','a','and','of','to','in','is')))
            AS DOUBLE) / len(toks) AS stopword_ratio,
       CAST(length(text) AS DOUBLE) / len(toks) AS avg_token_span,
       CAST(length(text) >= 100 AND length(text) <= 1000 AS BOOLEAN) AS len_ok
FROM t
""")
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals (stopword ratio, token span, length
    gate) — the quality-annotation idea of the reference's
    validate_record (app.py:267-276) re-aimed at LLM corpus filtering."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    stop = F.size(F.filter(
        toks, lambda w: w.isin("the", "a", "and", "of", "to", "in", "is")
    ))
    return d.select(
        "doc_id",
        stop.cast("int").alias("n_stopwords"),
        (stop.cast("double") / F.size(toks)).alias("stopword_ratio"),
        (F.length("text").cast("double") / F.size(toks)).alias("avg_token_span"),
        (F.length("text").between(100, 1000)).alias("len_ok"),
    )


@query("exact_dedup", oracle="""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
)
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
FROM all_docs
GROUP BY md5(text)
""")
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, keep-first: hash-groupBy on content hash.

    The fixture texts are all distinct, so duplicates are synthesized by
    re-unioning every third doc under a shifted id — the dedup then has
    real work to do. At 100 TB this is the canonical one-shuffle dedup:
    group on a 128-bit content hash, never on the full text (shuffle
    carries 16 bytes + ids per row instead of the document body).
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = (
        d.filter(F.col("doc_id") % 3 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return (
        d.unionByName(dups)
        .groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


@query("ngram_jaccard_pairs", oracle="""
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
  -- the engine's stop-shingle cap, expressed identically (df >
  -- max(100, floor(min(0.05 * n_docs, 10 * sqrt(n_docs))))) so engine
  -- and oracle share semantics on ANY corpus, not just fixtures below
  -- the threshold (r7: sqrt auto-scale bounds single-shingle join
  -- mass to 100 * n_docs — linear — above the 40k-doc crossover)
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
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       CAST(ca.n_sh + cb.n_sh - n_common AS BIGINT) AS n_union,
       CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) AS jaccard
FROM pairs
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) >= 0.01
""")
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by exact word-3-gram Jaccard.

    Shingle -> explode -> self-join **on the shingle key** (inverted
    index), never an O(n^2) document cross join: only documents that
    actually share a shingle ever meet. This is the exact-verification
    stage of the MinHash-LSH pipeline in operators/dedup.py, and is the
    scale-correct shape on its own (shuffle keyed by shingle, uniform).
    Jaccard is an int/int division — bit-deterministic, no rounding.

    The per-doc shingle COUNTS come from the UNCAPPED postings (they
    define the Jaccard denominator); only the join sides go through
    ``drop_stop_shingles``, so a capped pair's jaccard is a lower
    bound of the exact value (capped pairs ⊆ exact pairs — the fuzz
    property in tests/test_differential.py).
    """
    d = load_table(spark, sf_dir, "documents")
    # Doc-level shingle ARRAYS are the materialized representation
    # (r12 opt, the jaccard_prefix_filter_pairs shape): one checkpoint
    # row per document, per-doc counts as a map-side size(shingles)
    # instead of a doc_id count shuffle, and the inverted-index form
    # recovered with a free explode for the join sides. At cluster
    # scale: persist the array frame (or reuse the stored signature
    # table) instead of an executor-local checkpoint.
    arrs = word_ngram_arrays(spread(d), 3).transform(materialize)
    shingled = arrs.select("doc_id", F.explode("shingles").alias("shingle"))
    counts = arrs.select(
        "doc_id", F.size("shingles").cast("long").alias("n_sh")
    )
    capped = drop_stop_shingles(shingled, label="ngram_jaccard_pairs")
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    n_union = F.col("n_a") + F.col("n_b") - F.col("n_common")
    jaccard = F.col("n_common").cast("double") / n_union
    return (
        pairs.join(ca, "doc_a").join(cb, "doc_b")
        .select(
            "doc_a", "doc_b", "n_common",
            n_union.cast("bigint").alias("n_union"),
            jaccard.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.01)
    )


@query("source_token_divergence", oracle="""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
), src_tot AS (
  SELECT source, count(*) AS n_src FROM tok GROUP BY source
), corp AS (
  SELECT term, count(*) AS n_term FROM tok GROUP BY term
), corp_tot AS (SELECT count(*) AS n_all FROM tok),
per AS (
  SELECT tok.source, tok.term, count(*) AS n_st FROM tok GROUP BY 1, 2
)
SELECT per.source,
       round(CAST(sum(CAST(
         (CAST(n_st AS DOUBLE) / n_src)
         * ln((CAST(n_st AS DOUBLE) / n_src)
              / (CAST(n_term AS DOUBLE) / n_all))
         AS DECIMAL(27,12))) AS DOUBLE), 6) AS kl_divergence
FROM per
JOIN src_tot USING (source)
JOIN corp USING (term)
CROSS JOIN corp_tot
GROUP BY per.source
""")
def source_token_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's token distribution from the
    whole-corpus distribution — the drifted-source detector a corpus
    pipeline runs per ingestion batch. Support is per-source terms, so
    q(term) > 0 wherever p(term) > 0 by construction and the sum is
    well-defined. Per-term contributions are deterministic scalars
    (counts + ln), summed in decimal.

    Shape: one tokenize pass feeds three aggregations (per-source-term,
    per-term, totals); the joins fan the small per-term frame back onto
    the per-source-term frame — all equi-joins on term/source, with
    the 1-row corpus total cross-joined (broadcast)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("term"))
    src_tot = tok.groupBy("source").agg(F.count("*").alias("n_src"))
    corp = tok.groupBy("term").agg(F.count("*").alias("n_term"))
    n_all = tok.agg(F.count("*").alias("n_all"))
    per = tok.groupBy("source", "term").agg(F.count("*").alias("n_st"))
    p = F.col("n_st").cast("double") / F.col("n_src")
    q = F.col("n_term").cast("double") / F.col("n_all")
    contrib = (p * F.log(p / q)).cast("decimal(27,12)")
    return (
        per.join(src_tot, "source")
        .join(F.broadcast(corp), "term")
        .crossJoin(F.broadcast(n_all))
        .groupBy("source")
        .agg(
            F.round(F.sum(contrib).cast("double"), 6).alias("kl_divergence")
        )
    )


@query("dup_rate_by_source", oracle="""
WITH hashed AS (
  SELECT source, md5(text) AS h FROM documents
), ranked AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY h ORDER BY source) AS rn
  FROM hashed
)
SELECT source,
       count(*) AS n_docs,
       CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dups,
       round(CAST(count(*) FILTER (WHERE rn > 1) AS DOUBLE) / count(*), 6)
         AS dup_rate
FROM ranked GROUP BY source
""")
def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per ingestion source: content-hash the
    text, keep-first within each hash group (source as the
    deterministic survivor order), count survivors vs casualties per
    source — the per-source quality panel a curation run reports.
    One shuffle on the content hash (uniform by construction), then a
    small per-source aggregate."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("h").orderBy("source")
    return (
        d.select("source", F.md5("text").alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
            .cast("bigint").alias("n_dups"),
            F.round(
                F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
                .cast("double") / F.count("*"),
                6,
            ).alias("dup_rate"),
        )
    )


_WIN_K = 5          # char k-gram width
_WIN_W = 4          # winnowing window (selects one min hash per window)
_WIN_B = 257        # polynomial base
_WIN_M = 1000000007  # modulus (int64-safe: acc*B + 255 < 2^63)


@query("doc_winnow_fingerprint", oracle=f"""
WITH h AS (
  SELECT doc_id,
         list_transform(range(1, length(text) - {_WIN_K} + 2),
           i -> list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(range(0, {_WIN_K}),
                      j -> CAST(ascii(substring(text, CAST(i + j AS INT), 1))
                                AS BIGINT))),
                  (acc, c) -> (acc * {_WIN_B} + c) % {_WIN_M})) AS hs
  FROM documents
)
SELECT DISTINCT doc_id,
       unnest(list_distinct(
         list_transform(range(1, len(hs) - {_WIN_W} + 2),
                        i -> list_min(hs[i:i+{_WIN_W}-1])))) AS fp
FROM h
""")
def doc_winnow_fingerprint(spark: SparkSession, sf_dir: str,
                           arrow: bool = True) -> DataFrame:
    """Winnowing fingerprints (MOSS-style): a polynomial ROLLING hash
    over character 5-grams, then the minimum hash of every 4-hash
    window, deduplicated — the guarantee is any shared substring of
    length >= k + w - 1 = 8 chars yields at least one shared
    fingerprint, so joining on `fp` finds partial-overlap/plagiarized
    spans that whole-content hashing (doc_fingerprint) cannot.

    All arithmetic is int64 mod-space — bit-exact on any engine — and
    the whole computation is JVM higher-order functions (transform /
    aggregate / slice / array_min): map-only, no UDF, no shuffle until
    the final distinct. Output (doc_id, fp) is the inverted-index key
    for an overlap join, same posting shape as ngram_jaccard_pairs.

    Docs shorter than k + w - 1 chars have no complete winnowing window;
    the oracle's range() yields no rows for them, and Spark's sequence()
    would instead produce a DESCENDING sequence (then slice(..., 0, ...)
    throws), so they are filtered out up front.

    Access-cost note (r9): the k-gram hashes index CHARACTERS, and
    ``substring(text, i, 1)`` on a UTF8String is O(i) — it byte-scans
    to find char i — so hashing every position straight off the string
    made the per-document cost O(len^2 * k); r9 dropped that to
    O(len*k) via a once-exploded char-code array + ``element_at``
    (172 -> ~75 s at the 100x corpus).

    Arrow kernel (r10): even at O(len*k) the remaining wall was
    interpreted lambda DISPATCH — transform/aggregate evaluate per
    position x k-gram step, the same per-cell cost profile the sqrt-k
    k-means assignment hit (SCALING.md r10). The hash + window-min +
    distinct now run vectorized in one mapInPandas kernel: the
    polynomial fold is k numpy passes over the position vector with
    mod applied EVERY step (``h = (h * B + codes[j:]) % M`` — the
    identical left-fold sequence per position, int64-exact since
    (M-1)*B + 255 < 2^39), the winnow min is w np.minimum passes, and
    np.unique replaces array_distinct. Code points come from a
    utf-32-le frombuffer view (r11 — identical to ``ord()`` per code
    point, the r9 split+ascii parity carries over, and it removes the
    kernel's last per-character Python loop); bit-parity against the
    retained HOF expression form — incl. non-ASCII — is pinned in
    tests/test_text_kernels.py, and the HOF twin stays available as
    doc_winnow_fingerprint(..., arrow=False) for that test."""
    d = spread(
        load_table(spark, sf_dir, "documents").filter(
            F.length("text") >= _WIN_K + _WIN_W - 1
        )
    )
    if not arrow:
        hashes = F.expr(f"""
          transform(sequence(1, size(cs) - {_WIN_K} + 1),
                    i -> aggregate(sequence(0, {_WIN_K} - 1), 0L,
                                   (acc, j) -> (acc * {_WIN_B}
                                     + element_at(cs, i + j))
                                     % {_WIN_M}))
        """)
        fps = F.expr(
            f"array_distinct(transform(sequence(1, size(hs) - {_WIN_W} + 1),"
            f" i -> array_min(slice(hs, i, {_WIN_W}))))"
        )
        return (
            d.select(
                "doc_id",
                F.expr(
                    "transform(split(text, ''), c -> cast(ascii(c) as bigint))"
                ).alias("cs"),
            )
            .select("doc_id", hashes.alias("hs"))
            .select("doc_id", F.explode(fps).alias("fp"))
            .distinct()
        )

    def winnow(batches):
        import numpy as np
        import pandas as pd

        k, w, bb, mm = _WIN_K, _WIN_W, _WIN_B, _WIN_M
        for pdf in batches:
            ids, fps_out = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # UTF-32-LE is exactly one uint32 per code point, so
                # this equals [ord(c) for c in text] with no Python
                # per-character loop — the last interpreted loop in
                # this kernel (VERDICT r10 item 4). Parquet strings are
                # valid UTF-8, so the encode cannot hit lone
                # surrogates; parity incl. astral plane is pinned in
                # tests/test_text_kernels.py.
                # '<u4' (explicit little-endian) not np.uint32: the
                # buffer is explicitly LE, so a native-endian view
                # would silently misread code points on a big-endian
                # host (ADVICE r11).
                codes = np.frombuffer(
                    text.encode("utf-32-le"), dtype="<u4"
                ).astype(np.int64)
                npos = codes.size - k + 1
                h = np.zeros(npos, dtype=np.int64)
                for j in range(k):
                    h = (h * bb + codes[j:j + npos]) % mm
                nwin = npos - w + 1
                m = h[:nwin].copy()
                for t in range(1, w):
                    np.minimum(m, h[t:t + nwin], out=m)
                fp = np.unique(m)
                ids.append(np.full(fp.size, doc_id, dtype=np.int64))
                fps_out.append(fp)
            if ids:
                yield pd.DataFrame({
                    "doc_id": np.concatenate(ids),
                    "fp": np.concatenate(fps_out),
                })

    return (
        d.select("doc_id", "text")
        .mapInPandas(winnow, "doc_id long, fp long")
        .distinct()
    )


_CDC_D = 64  # boundary divisor: expected chunk length ~64 chars


@query("doc_cdc_chunks", oracle=f"""
WITH h AS (
  SELECT doc_id, text,
         list_transform(range(1, length(text) - {_WIN_K} + 2),
           i -> list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(range(0, {_WIN_K}),
                      j -> CAST(ascii(substring(text, CAST(i + j AS INT), 1))
                                AS BIGINT))),
                  (acc, c) -> (acc * {_WIN_B} + c) % {_WIN_M})) AS hs
  FROM documents
  WHERE doc_id < 100 AND length(text) >= {_WIN_K}
), c AS (
  SELECT doc_id, text,
         list_transform(
           list_filter(range(1, len(hs) + 1), i -> hs[i] % {_CDC_D} = 0),
           i -> CAST(i + {_WIN_K} - 1 AS BIGINT)) AS cuts
  FROM h
), bounds AS (
  SELECT doc_id, text,
         list_concat(list_concat([CAST(0 AS BIGINT)], cuts),
                     [CAST(length(text) AS BIGINT)]) AS bs
  FROM c
), expl AS (
  SELECT doc_id, text, bs,
         unnest(generate_series(1, len(bs) - 1)) AS j
  FROM bounds
)
SELECT doc_id, CAST(j AS INT) AS chunk_no,
       CAST(bs[j+1] - bs[j] AS INT) AS chunk_len,
       md5(substring(text, CAST(bs[j] + 1 AS INT),
                     CAST(bs[j+1] - bs[j] AS INT))) AS chunk_md5
FROM expl
WHERE bs[j+1] > bs[j]
""")
def doc_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (FastCDC/rsync-style): cut each document
    where the rolling k-gram hash hits 0 mod {D}. Because boundaries
    depend only on LOCAL content, an insertion early in a document
    shifts at most one chunk's hash — the property that makes
    chunk-level dedup robust to edits, where fixed-size blocks would
    re-hash everything downstream. Shares the winnowing rolling hash
    (same mod-space polynomial, bit-exact on both engines); md5 chunk
    ids are the dedup join key. Map-only + a bounded explode. r9: the
    hash reads a once-exploded char-code array with O(1) element_at
    instead of O(i) per-position substring scans (same math — see
    doc_winnow_fingerprint's access-cost note)."""
    d = spread(
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 100) & (F.length("text") >= _WIN_K))
    )
    hashes = F.expr(f"""
      transform(sequence(1, size(cs) - {_WIN_K} + 1),
                i -> aggregate(sequence(0, {_WIN_K} - 1), 0L,
                               (acc, j) -> (acc * {_WIN_B}
                                 + element_at(cs, i + j))
                                 % {_WIN_M}))
    """)
    cuts = F.expr(
        f"transform(filter(sequence(1, size(hs)),"
        f" i -> element_at(hs, i) % {_CDC_D} = 0),"
        f" i -> cast(i + {_WIN_K} - 1 AS bigint))"
    )
    bs = F.concat(
        F.array(F.lit(0).cast("bigint")),
        F.col("cuts"),
        F.array(F.length("text").cast("bigint")),
    )
    lo = F.element_at("bs", F.col("j"))
    hi = F.element_at("bs", F.col("j") + 1)
    return (
        d.select(
            "doc_id", "text",
            F.expr("transform(split(text, ''), c -> cast(ascii(c) as bigint))")
            .alias("cs"),
        )
        .select("doc_id", "text", hashes.alias("hs"))
        .select("doc_id", "text", cuts.alias("cuts"))
        .select("doc_id", "text", bs.alias("bs"))
        .select(
            "doc_id", "text", "bs",
            F.explode(F.expr("sequence(1, size(bs) - 1)")).alias("j"),
        )
        .filter(hi > lo)
        .select(
            "doc_id",
            F.col("j").cast("int").alias("chunk_no"),
            (hi - lo).cast("int").alias("chunk_len"),
            F.md5(F.substring(F.col("text"), lo.cast("int") + 1, (hi - lo).cast("int"))).alias("chunk_md5"),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge-step pair counting: the inner loop of BPE tokenizer TRAINING
# (Sennrich et al. 2016). One merge iteration = count adjacent symbol
# pairs across the word-frequency table and pick the most frequent.
_BPE_TOP = 30


@query("bpe_merge_pairs", oracle=f"""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
), wf AS (
  SELECT word, count(*) AS freq FROM w WHERE length(word) >= 2 GROUP BY word
), pairs AS (
  SELECT substr(word, CAST(i AS INT), 1) AS left_sym,
         substr(word, CAST(i AS INT) + 1, 1) AS right_sym,
         freq
  FROM wf, unnest(range(1, length(word))) AS t(i)
)
SELECT left_sym, right_sym, CAST(sum(freq) AS BIGINT) AS pair_count
FROM pairs
GROUP BY left_sym, right_sym
ORDER BY pair_count DESC, left_sym, right_sym
LIMIT {_BPE_TOP}
""")
def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training iteration: adjacent character-pair frequencies
    over the corpus vocabulary, weighted by word frequency — the argmax
    row is the next merge a BPE tokenizer would learn.

    Scale shape: pair counting runs over the DISTINCT-WORD table, not
    the corpus (the classic BPE trick — corpus size only matters for
    the one word-count groupBy; everything after is vocabulary-sized).
    The per-word pair explode is partition-local; the final pair
    groupBy aggregates at most |alphabet|^2 groups, so the reduce side
    is tiny no matter the corpus. Iterating k merges = re-running this
    plan on a re-segmented vocab table (vocab-sized, not corpus-sized,
    work per iteration)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    wf = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") >= 2)
        .groupBy("word").agg(F.count("*").alias("freq"))
    )
    pairs = wf.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> struct(substr(word, i, 1) AS left_sym,"
                "             substr(word, i + 1, 1) AS right_sym))"
            )
        ).alias("p"),
        "freq",
    ).select("p.left_sym", "p.right_sym", "freq")
    return (
        pairs.groupBy("left_sym", "right_sym")
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(_BPE_TOP)
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) with deterministic
# md5-derived hash rows — buildable, mergeable, and probe-able entirely
# in SQL, so the sketch itself is engine-portable (unlike Spark's
# built-in count_min_sketch binary, whose layout is JVM-specific).
_CMS_D = 4     # hash rows
_CMS_W = 256   # buckets per row (2 hex digits of md5)


def _cms_bucket(row: int) -> str:
    """Portable bucket expr: 2 hex digits of md5(row || word)."""
    s = f"md5(concat('{row}#', word))"
    return (
        f"(instr('0123456789abcdef', substr({s}, 1, 1)) - 1) * 16"
        f" + (instr('0123456789abcdef', substr({s}, 2, 1)) - 1)"
    )


_CMS_ROWS_SQL = " UNION ALL ".join(
    f"SELECT word, cnt, {j} AS j, CAST({_cms_bucket(j)} AS INT) AS b FROM wc"
    for j in range(_CMS_D)
)


def _cms_word_probes(d: DataFrame, text_col: str = "text"):
    """(wc, probes) for the portable CMS: the word-count aggregate is
    materialized ONCE (vocab-sized — bounded at any corpus scale), and
    the d probe rows come from one posexplode instead of a d-way
    union (r13 opt). The pre-r13 shape re-planned the whole corpus
    tokenize + word count under EVERY union branch of BOTH consumers
    (8 scan subtrees in the plan; runtime exchange reuse still paid
    the vocab-sized final aggregate per branch); now the corpus is
    tokenized once per run and the probes read checkpoint blocks.
    Same rows, same values — j is the posexplode position, the bucket
    expressions are unchanged."""
    wc = materialize(
        d.select(F.explode(F.split(text_col, " ")).alias("word"))
        .groupBy("word").agg(F.count("*").alias("cnt"))
    )
    probes = wc.select(
        "word", "cnt",
        F.posexplode(F.array(*[
            F.expr(_cms_bucket(j)).cast("int") for j in range(_CMS_D)
        ])).alias("j", "b"),
    )
    return wc, probes


@query("word_count_min_sketch", oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
), wc AS (
  SELECT word, count(*) AS cnt FROM tok GROUP BY word
), probes AS ({_CMS_ROWS_SQL}),
sketch AS (
  SELECT j, b, sum(cnt) AS cell FROM probes GROUP BY j, b
), est AS (
  SELECT p.word, max(p.cnt) AS true_count, min(s.cell) AS cms_estimate
  FROM probes p JOIN sketch s ON p.j = s.j AND p.b = s.b
  GROUP BY p.word
)
SELECT word, CAST(true_count AS BIGINT) AS true_count,
       CAST(cms_estimate AS BIGINT) AS cms_estimate
FROM est
ORDER BY true_count DESC, word
LIMIT 20
""")
def word_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy-hitter estimation: a 4x256
    counter grid (bucket = md5-derived, deterministic) built in one
    aggregation, probed for the top-20 true words. cms_estimate >=
    true_count always (collisions only inflate), and the sketch is a
    fixed {_CMS_D * _CMS_W}-cell frame REGARDLESS of corpus size — the
    point at 100 TB: the sketch shuffle moves ~1k rows where the exact
    word count moves the vocabulary; sketches from disjoint corpus
    shards merge by cell-wise sum.

    Here the exact counts ride along (the fixture is small) so the
    estimate/truth gap is itself the test; production would build only
    the sketch side."""
    wc, probes = _cms_word_probes(
        spread(load_table(spark, sf_dir, "documents"))
    )
    sketch = probes.groupBy("j", "b").agg(F.sum("cnt").alias("cell"))
    est = (
        probes.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("word")
        .agg(
            F.max("cnt").alias("true_count"),
            F.min("cell").alias("cms_estimate"),
        )
    )
    return (
        est.select(
            "word",
            F.col("true_count").cast("bigint").alias("true_count"),
            F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
        )
        .orderBy(F.col("true_count").desc(), "word")
        .limit(20)
    )


# Heavy-hitter support threshold as an integer ratio (1/200 = 0.5% of
# the token stream) so the comparison stays in exact integers — no
# float support fraction to disagree on.
_HH_DENOM = 200


def _hh_cms_oracle(src: str = "documents") -> str:
    """DuckDB oracle for :func:`heavy_hitters_cms` over table ``src``
    (templated so the random-corpus fuzz can point it at an injected
    view, same pattern as the minhash oracle builders)."""
    return f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM {src}
), wc AS (
  SELECT word, count(*) AS cnt FROM tok GROUP BY word
), probes AS ({_CMS_ROWS_SQL}),
sketch AS (
  SELECT j, b, sum(cnt) AS cell FROM probes GROUP BY j, b
), est AS (
  SELECT p.word, max(p.cnt) AS true_count, min(s.cell) AS cms_estimate
  FROM probes p JOIN sketch s ON p.j = s.j AND p.b = s.b
  GROUP BY p.word
), tot AS (
  SELECT sum(cnt) AS n FROM wc
)
SELECT word,
       CAST(true_count AS BIGINT) AS true_count,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST(CASE WHEN true_count * {_HH_DENOM} >= n THEN 1 ELSE 0 END
            AS INT) AS is_true_hh
FROM est CROSS JOIN tot
WHERE cms_estimate * {_HH_DENOM} >= n
"""


def heavy_hitters_cms(d: DataFrame, text_col: str = "text") -> DataFrame:
    """CMS heavy hitters over any (…, text) frame — the construction
    word_heavy_hitters_cms registers; see its docstring."""
    wc, probes = _cms_word_probes(d, text_col)
    sketch = probes.groupBy("j", "b").agg(F.sum("cnt").alias("cell"))
    est = (
        probes.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("word")
        .agg(
            F.max("cnt").alias("true_count"),
            F.min("cell").alias("cms_estimate"),
        )
    )
    # _scalar_gate prefix = the plan-audit marker for a deliberate
    # 1-row broadcast stat frame (plans/inspect.py exempts its BNLJ)
    tot = wc.agg(F.sum("cnt").alias("_scalar_gate_n"))
    n = F.col("_scalar_gate_n")
    return (
        est.crossJoin(F.broadcast(tot))
        .filter(F.col("cms_estimate") * _HH_DENOM >= n)
        .select(
            "word",
            F.col("true_count").cast("bigint").alias("true_count"),
            F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
            F.when(
                F.col("true_count") * _HH_DENOM >= n, F.lit(1)
            ).otherwise(F.lit(0)).cast("int").alias("is_true_hh"),
        )
    )


@query("word_heavy_hitters_cms", oracle=_hh_cms_oracle())
def word_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent items above a support threshold via the portable
    count-min sketch — the exact-oracled twin of
    word_freq_items_approx's engine-native KPS sketch, mirroring the
    word_count_min_sketch construction (r6 verdict item 1). Same
    contract as df.stat.freqItems: because cms_estimate >= true_count
    always, the returned set is a SUPERSET of every word at >= 1/200
    of the token stream (is_true_hh marks the exact members, making
    the false-positive margin part of the checked output). Thresholding
    compares integer products (cnt * 200 >= N), so there is no float
    support fraction for the engines to disagree on.

    At 100 TB the sketch is the same fixed 4x256-cell frame as
    word_count_min_sketch — the only vocabulary-sized object is the
    candidate probe set, and production would keep only candidates
    from a first heavy pass (or the stream's distinct keys) rather
    than the full vocab ridden along here for the oracle.

    Random-corpus parity (not just fixture parity) is fuzzed in
    tests/test_portable_hash_fuzz.py via the templated oracle."""
    return heavy_hitters_cms(spread(load_table(spark, sf_dir, "documents")))


@query("doc_bigram_lm_score", oracle="""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), vocab AS (
  SELECT count(DISTINCT term) AS v
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
), big AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 1, 1)) AS i
        FROM tok)
), c2 AS (
  SELECT w1, w2, count(*) AS n2 FROM big GROUP BY 1, 2
), c1 AS (
  SELECT w1, CAST(sum(n2) AS BIGINT) AS n1 FROM c2 GROUP BY 1
)
SELECT big.doc_id, count(*) AS n_bigrams,
       round(CAST(sum(CAST(
         -ln((n2 + 0.5) / (n1 + 0.5 * v)) AS DECIMAL(27,12))) AS DOUBLE)
         / count(*), 6) AS avg_neg_logp
FROM big
JOIN c2 USING (w1, w2)
JOIN c1 USING (w1)
CROSS JOIN vocab
GROUP BY big.doc_id
""")
def doc_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style statistical-LM quality scoring: train an add-0.5
    smoothed bigram model on the corpus itself, then score every doc by
    its average negative log-likelihood (low = fluent/common phrasing,
    high = outlier text — the perplexity-bucket signal web-corpus
    pipelines filter on).

    One tokenize pass feeds the bigram frame; counts roll up to the
    model tables (c2 = transitions, c1 = history mass derived FROM c2,
    so there is no second tokenize); scoring is two equi-joins of the
    bigram frame against the model and a per-doc decimal-summed
    average. Self-scoring guarantees every (w1, w2) hits the model, so
    the joins stay inner. At 100 TB the model tables are vocab-bounded
    (<< corpus) and AQE picks broadcast vs shuffle per stats; the
    per-term -ln contribution is a deterministic scalar of integer
    counts, so the decimal sum is bit-identical on both engines.

    Short-doc guard (ADVICE r1): slice length is clamped with
    greatest(.., 0) so 0/1-token docs yield no bigrams, matching the
    oracle's empty generate_series.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_pairs = F.greatest(F.size("toks") - 1, F.lit(0))
    # one spread frame feeds BOTH the bigram explode and the vocab
    # count (r12 opt): the vocab branch previously re-tokenized the
    # corpus on the raw single-row-group scan (one task); sharing the
    # repartitioned frame parallelizes it and lets Catalyst reuse the
    # spread exchange between the branches.
    sd = spread(d)
    big = (
        sd.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice("toks", 1, n_pairs),
                    F.slice(F.col("toks"), 2, n_pairs),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    vocab = (
        sd.select(F.explode(toks).alias("term"))
        .agg(F.countDistinct("term").alias("v"))
    )
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("n2"))
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    neg_logp = -F.log(
        (F.col("n2") + 0.5) / (F.col("n1") + 0.5 * F.col("v"))
    )
    # Precompute the per-bigram contribution on the VOCAB-sized model
    # (c2 x c1 x v), then ONE equi-join attaches it to the occurrence
    # stream (r13 opt): the old shape joined the token-level bigram
    # frame twice (c2 on (w1,w2), then c1 on w1) plus a crossJoin —
    # per-occurrence probe work x3 where the log-ratio is a function
    # of the bigram TYPE alone. Same decimal per occurrence, same sum.
    # Measured ~neutral at sf0.1 (focused A/Bs x0.94 and x1.08 — the
    # model join is vocab-sized there); kept for the structural
    # per-occurrence claim, which grows with the corpus. A
    # materialized c2 was measured on top and rejected (no consistent
    # further gain — exchange reuse already dedupes the c2 shuffle).
    model = (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("w1", "w2", neg_logp.alias("_lp"))
    )
    return (
        big.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.sum(F.col("_lp").cast("decimal(27,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_neg_logp"),
        )
    )


@query("doc_token_entropy", oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), cnt AS (
  SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2
), tot AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_types
  FROM cnt GROUP BY doc_id
)
SELECT cnt.doc_id, tot.n AS n_tokens, tot.n_types,
       round(CAST(sum(CAST(
         -(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)
         AS DECIMAL(27,12))) AS DOUBLE), 6) AS token_entropy,
       round(CAST(n_types AS DOUBLE) / n, 6) AS type_token_ratio
FROM cnt JOIN tot USING (doc_id)
GROUP BY cnt.doc_id, tot.n, tot.n_types
""")
def doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy + type-token ratio per doc —
    the repetitiveness signal (low entropy = looping/boilerplate text)
    that complements the Gopher n-gram repetition gates. One tokenize
    pass, per-doc counts, decimal-summed -p*ln(p) so both engines add
    identical scalars in exact arithmetic; all shuffles key on doc_id.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = spread(d).select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    cnt = tok.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count("*").alias("n_types")
    )
    p = F.col("c").cast("double") / F.col("n")
    return (
        cnt.join(tot, "doc_id")
        .groupBy("doc_id", "n", "n_types")
        .agg(
            F.round(
                F.sum((-p * F.log(p)).cast("decimal(27,12)")).cast("double"), 6
            ).alias("token_entropy"),
            F.round(
                F.first(F.col("n_types").cast("double") / F.col("n")), 6
            ).alias("type_token_ratio"),
        )
        .select(
            "doc_id", F.col("n").alias("n_tokens"), "n_types",
            "token_entropy", "type_token_ratio",
        )
    )


@query("dedup_keep_best_exact", oracle="""
WITH RECURSIVE tk AS (
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
  -- mirror of the engine's stop-shingle cap (see ngram_jaccard_pairs)
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
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
), edges AS (
  SELECT doc_a, doc_b FROM pairs
  JOIN counts ca ON ca.doc_id = doc_a JOIN counts cb ON cb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) >= 0.6
), bidir AS (
  SELECT doc_a AS src, doc_b AS dst FROM edges
  UNION ALL SELECT doc_b, doc_a FROM edges
), cc AS (
  SELECT DISTINCT src AS id, src AS comp FROM bidir
  UNION
  SELECT b.dst AS id, cc.comp FROM cc JOIN bidir b ON b.src = cc.id
  WHERE cc.comp < b.dst
), comp AS (
  SELECT id AS doc_id, min(comp) AS component FROM cc GROUP BY id
)
SELECT c.doc_id, c.component, d.n_chars,
       (row_number() OVER (
          PARTITION BY c.component
          ORDER BY d.n_chars DESC, c.doc_id) = 1) AS keep
FROM comp c JOIN documents d USING (doc_id)
""")
def dedup_keep_best_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION step, end to end and exactly verifiable:
    exact 3-gram-Jaccard edges (>= 0.6) -> connected components ->
    keep the best document per duplicate cluster (longest, doc_id
    tie-break). Output is one row per DUPLICATED doc with its cluster
    id and the keep/drop verdict — the thing a curation pipeline
    actually joins back onto the corpus.

    The DuckDB oracle computes the same components with a recursive
    CTE (min-label transitive closure), making this one of the few
    places an iterative distributed algorithm
    (operators/dedup.py::connected_components, O(log n) rounds of two
    equi-join shuffles) is checked value-exact against a declarative
    fixpoint, not just property-tested.
    """
    from ..operators.dedup import connected_components

    d = load_table(spark, sf_dir, "documents")
    # doc-level arrays as the checkpointed form (r12 opt — see
    # ngram_jaccard_pairs): counts become map-side size(shingles)
    arrs = word_ngram_arrays(spread(d), 3).transform(materialize)
    shingled = arrs.select("doc_id", F.explode("shingles").alias("shingle"))
    cnt = arrs.select(
        "doc_id", F.size("shingles").cast("long").alias("n_sh")
    )
    # stop-shingle cap on the join sides only (counts stay exact): when
    # it triggers, n_common undercounts by the boilerplate grams, so
    # edges are CONSERVATIVE (missed edge = docs similar mostly via
    # boilerplate — the pairs exact dedup should not merge anyway);
    # below the threshold (all fixtures) output is exact
    capped = drop_stop_shingles(shingled, label="dedup_keep_best_exact")
    # Size-ratio pre-filter (r12, VERDICT r11 item 4): J(a,b) >= 0.6
    # forces 5*min(na,nb) >= 3*max(na,nb) (J <= min/max for sets), so
    # carrying each side's exact shingle count onto the postings lets
    # the pair join drop ratio-impossible pairs BEFORE the
    # (doc_a, doc_b) aggregate shuffle. Measured at the 100x corpus:
    # the 113.1M-pair intermediate (25,200 surviving edges — 99.98%
    # discarded post-aggregate before this change) costs 31-37 s to
    # aggregate unfiltered vs 16-17 s with the pre-filter, identical
    # edges (SCALING.md r12). Provably lossless: any pair passing the
    # final (unchanged) Jaccard test passes the ratio test. The count
    # broadcast is |docs|-sized — same documented ~100M-row bound as
    # jaccard_prefix_filter_pairs' df/counts broadcasts, where the
    # hint comes off and this becomes a doc_id shuffle join.
    a = (
        capped.join(F.broadcast(cnt), "doc_id")
        .select(F.col("doc_id").alias("doc_a"),
                F.col("n_sh").alias("_na"), "shingle")
    )
    b = (
        capped.join(F.broadcast(cnt), "doc_id")
        .select(F.col("doc_id").alias("doc_b"),
                F.col("n_sh").alias("_nb"), "shingle")
    )
    pairs = (
        a.join(b, "shingle")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (5 * F.col("_na") >= 3 * F.col("_nb"))
            & (5 * F.col("_nb") >= 3 * F.col("_na"))
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"),
             F.first("_na").alias("_na"), F.first("_nb").alias("_nb"))
    )
    edges = (
        pairs.filter(
            F.col("n_common").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("n_common")) >= 0.6
        )
        .select("doc_a", "doc_b")
    )
    comp = connected_components(edges, "doc_a", "doc_b").select(
        F.col("id").alias("doc_id"), "component"
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        comp.join(d.select("doc_id", "n_chars"), "doc_id")
        .withColumn("keep", F.row_number().over(w) == 1)
        .select("doc_id", "component", "n_chars", "keep")
    )


@query("jaccard_prefix_filter_pairs", oracle="""
WITH tk AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 5
), shingled AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(toks) - 3),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS shingle
  FROM tk
), counts AS (
  SELECT doc_id, count(*) AS n_sh FROM shingled GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shingled a JOIN shingled b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       CAST(ca.n_sh + cb.n_sh - n_common AS BIGINT) AS n_union
FROM pairs
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE 8 * n_common >= 3 * (ca.n_sh + cb.n_sh)
""")
def jaccard_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with word-5-gram-shingle Jaccard >= 0.6, found by
    PREFIX FILTERING (PPJoin, Xiao et al. 2008) instead of a full
    inverted-index join.

    The prefix lemma: order every doc's shingle set by one global total
    order (here: ascending document frequency, then shingle text — the
    rarest-first order that minimizes candidates) and keep only the
    first ``p = n - ceil(t*n) + 1`` shingles; any pair with Jaccard >=
    t MUST share a prefix shingle. So the candidate join touches only
    the prefix inverted index — by construction built from each doc's
    RAREST shingles, which bounds posting-list lengths and removes the
    hot-key risk a full shingle join has on boilerplate-heavy corpora.
    Verification then counts intersections candidate-driven (join the
    two full shingle sets of each candidate pair only).

    The threshold test is integer cross-multiplication
    (``8*inter >= 3*(na+nb)``  <=>  ``inter/union >= 0.6``) — exact,
    no floats anywhere. The DuckDB oracle runs the brute-force
    inverted-index join with the same integer test, so the comparison
    proves the prefix filter is LOSSLESS, not just plausible.

    Scale: df table is vocabulary-sized (shuffle on shingle, uniform);
    the per-doc prefix selection is a window partitioned by doc_id;
    candidates are pair-keyed — no global window, no driver state.
    """
    t_num, t_den = 3, 5  # tau = 0.6 = t_num/t_den
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = spread(d).select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 5)
    # doc-level shingle ARRAYS are the primary representation: the
    # exploded (doc, shingle) form exists only where an inverted index
    # is genuinely needed (df counts, prefix candidate join);
    # verification works on the arrays, so the full shingle frame is
    # never shuffled for it (the round-3 5.7s -> ~3s rework)
    arrs = base.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 4),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("toks"), i),
                    F.element_at(F.col("toks"), i + 1),
                    F.element_at(F.col("toks"), i + 2),
                    F.element_at(F.col("toks"), i + 3),
                    F.element_at(F.col("toks"), i + 4),
                ),
            )
        ).alias("shingles"),
    ).transform(materialize)
    shingled = arrs.select("doc_id", F.explode("shingles").alias("shingle"))
    counts = arrs.select("doc_id", F.size("shingles").alias("n_sh"))
    df_tbl = shingled.groupBy("shingle").agg(F.count("*").alias("df"))
    # Per-doc prefix: the p rarest shingles under the global (df, shingle)
    # order; p = n - ceil(tau*n) + 1, with ceil(tau*n) = ceil(n*t_num/t_den)
    # computed in integers: -floordiv(-n*t_num, t_den).
    # df table is vocabulary-sized: broadcast it (SCALING.md documents
    # the ~100M-term bound where this hint comes off), so the prefix
    # pipeline costs ONE shuffle of the exploded frame (the per-doc
    # window) instead of three
    ranked = (
        shingled.join(F.broadcast(df_tbl), "shingle")
        .join(F.broadcast(counts), "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
        .withColumn(
            "prefix_len",
            F.col("n_sh") - (-F.floor((-F.col("n_sh") * t_num) / t_den)) + 1,
        )
    )
    prefix = ranked.filter(F.col("rn") <= F.col("prefix_len")).select(
        "doc_id", "shingle"
    )
    pa = prefix.select(F.col("doc_id").alias("doc_a"), "shingle")
    pb = prefix.select(F.col("doc_id").alias("doc_b"), "shingle")
    cand = (
        pa.join(pb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    aa = arrs.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("_sa"))
    ab = arrs.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("_sb"))
    inter = (
        cand.join(aa, "doc_a")
        .join(ab, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("_sa", "_sb")).cast("bigint")
            .alias("n_common"),
            F.size("_sa").alias("_na"), F.size("_sb").alias("_nb"),
        )
    )
    return (
        inter.filter(
            (t_den + t_num) * F.col("n_common")
            >= t_num * (F.col("_na") + F.col("_nb"))
        )
        .select(
            "doc_a", "doc_b", "n_common",
            (F.col("_na") + F.col("_nb") - F.col("n_common"))
            .cast("bigint").alias("n_union"),
        )
    )
