"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristics, document fingerprinting.

These are the training-data-pipeline text ops (BASELINE.json north star).
Everything is built-in Spark SQL expressions — JVM-side, codegen'd, no
Python UDFs — so the same pipeline runs unchanged over 100 TB of documents:
per-row narrow transforms, no shuffle except the final aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.plans.materialize import materialize
from pgcp_spark.registry import register
from pgcp_spark.sources import load_table, load_table_parallel

# Shared stopword list (tiny, deterministic; see oracle strings below).
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
_SW_SQL = "', '".join(STOPWORDS)

# A BPE-ish word/number/punctuation segmenter: runs of letters, runs of
# digits, or single non-alphanumeric marks — the classic pre-tokenizer split.
BPE_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register(
    "text_token_stats",
    oracle=f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{BPE_REGEX}')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_token
FROM documents
ORDER BY doc_id
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    segmenter (letter runs / digit runs / single marks)."""
    d = load_table(spark, sf_dir, "documents")
    ws_tokens = F.split("text", " ")
    bpe_tokens = F.regexp_extract_all(F.lower("text"), F.lit(BPE_REGEX), 0)
    return (
        d.select(
            "doc_id",
            F.size(ws_tokens).cast("long").alias("n_ws_tokens"),
            F.size(bpe_tokens).cast("long").alias("n_bpe_tokens"),
            F.length("text").cast("long").alias("n_chars"),
            (F.length("text").cast("double") / F.size(ws_tokens)).alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_quality_score",
    oracle=f"""
SELECT doc_id, n_tokens, stopword_ratio, mean_token_len,
       0.5 * stopword_ratio + 0.5 * (mean_token_len / 10.0) AS quality_score
FROM (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks, t -> t IN ('{_SW_SQL}'))) AS DOUBLE) / len(toks) AS stopword_ratio,
         CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks) AS mean_token_len
  FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents)
)
ORDER BY doc_id
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring from stopword ratio + mean token length — the
    fastText-style cheap quality filter shape. Both engines evaluate the
    identical IEEE expression tree, so doubles match exactly."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    sw = F.array([F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("double") / n_tokens
    )
    mean_tok_len = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / n_tokens
    )
    return (
        d.select(
            "doc_id",
            n_tokens.cast("long").alias("n_tokens"),
            stop_ratio.alias("stopword_ratio"),
            mean_tok_len.alias("mean_token_len"),
            (F.lit(0.5) * stop_ratio + F.lit(0.5) * (mean_tok_len / F.lit(10.0))).alias(
                "quality_score"
            ),
        )
        .orderBy("doc_id")
    )


# Marker vocabularies for the n-gram/stopword language-ID heuristic. The
# synthetic corpus is English-vocab word salad, so real-language markers are
# illustrative; the *operator shape* (per-language marker hit count → argmax
# with deterministic precedence) is what a production langid does.
LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "y", "una"),
}


def _marker_sql(lang: str) -> str:
    marks = "', '".join(LANG_MARKERS[lang])
    return f"CAST(len(list_filter(toks, t -> t IN ('{marks}'))) AS BIGINT)"


@register(
    "text_langid_markers",
    oracle=f"""
SELECT doc_id, lang AS labeled_lang, en_hits, de_hits, fr_hits, es_hits,
       CASE
         WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits AND en_hits > 0 THEN 'en'
         WHEN de_hits >= fr_hits AND de_hits >= es_hits AND de_hits > 0 THEN 'de'
         WHEN fr_hits >= es_hits AND fr_hits > 0 THEN 'fr'
         WHEN es_hits > 0 THEN 'es'
         ELSE 'und'
       END AS predicted_lang
FROM (
  SELECT doc_id, lang,
         {_marker_sql("en")} AS en_hits,
         {_marker_sql("de")} AS de_hits,
         {_marker_sql("fr")} AS fr_hits,
         {_marker_sql("es")} AS es_hits
  FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks FROM documents)
)
ORDER BY doc_id
""",
)
def text_langid_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via per-language marker-word hit counts with a fixed
    argmax precedence (en > de > fr > es, 'und' when no hits)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")

    def hits(lang: str):
        marks = F.array([F.lit(m) for m in LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(marks, t))).cast("long")

    base = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        hits("en").alias("en_hits"),
        hits("de").alias("de_hits"),
        hits("fr").alias("fr_hits"),
        hits("es").alias("es_hits"),
    )
    pred = (
        F.when(
            (F.col("en_hits") >= F.col("de_hits"))
            & (F.col("en_hits") >= F.col("fr_hits"))
            & (F.col("en_hits") >= F.col("es_hits"))
            & (F.col("en_hits") > 0),
            "en",
        )
        .when(
            (F.col("de_hits") >= F.col("fr_hits"))
            & (F.col("de_hits") >= F.col("es_hits"))
            & (F.col("de_hits") > 0),
            "de",
        )
        .when((F.col("fr_hits") >= F.col("es_hits")) & (F.col("fr_hits") > 0), "fr")
        .when(F.col("es_hits") > 0, "es")
        .otherwise("und")
    )
    return base.withColumn("predicted_lang", pred).orderBy("doc_id")


@register(
    "text_fingerprint_groups",
    oracle="""
SELECT fingerprint, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc
FROM (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fingerprint
  FROM documents
)
GROUP BY fingerprint
HAVING COUNT(*) >= 1
ORDER BY n_docs DESC, fingerprint
""",
)
def text_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized lowercase
    text, grouped into identity clusters (the exact-dedup fingerprint).
    md5 is identical across engines, so the oracle checks real hashes."""
    d = load_table(spark, sf_dir, "documents")
    normalized = F.trim(F.regexp_replace(F.lower("text"), " +", " "))
    return (
        d.select("doc_id", F.md5(normalized).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_doc"))
        .orderBy(F.desc("n_docs"), "fingerprint")
    )


@register(
    "text_source_lang_profile",
    oracle="""
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents
GROUP BY source, lang
ORDER BY source, lang
""",
)
def text_source_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling: per (source, lang) doc counts and size stats —
    the first query every pipeline runs on a new crawl dump."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        )
        .orderBy("source", "lang")
    )


WINNOW_GRAM = 3  # token k-gram width
WINNOW_WINDOW = 4  # minima window over consecutive gram hashes


@register(
    "text_winnow_fingerprints",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), ' +', ' ', 'g')), ' ') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_transform(range(1, len(t) - {WINNOW_GRAM - 2}),
                        i -> md5(concat_ws(' ', t[i], t[i+1], t[i+2]))) AS g
  FROM toks WHERE len(t) >= {WINNOW_GRAM + WINNOW_WINDOW - 1}
),
winnow AS (
  SELECT doc_id,
         UNNEST(list_distinct(list_transform(range(1, len(g) - {WINNOW_WINDOW - 2}),
                                             j -> list_min(g[j:j+{WINNOW_WINDOW - 1}])))) AS fp
  FROM grams
)
SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc
FROM winnow
GROUP BY fp
HAVING COUNT(*) >= 2
ORDER BY n_docs DESC, fp
""",
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (the rolling-hash document-fingerprint
    scheme): hash every token 3-gram, slide a 4-wide window over the hash
    sequence keeping each window's minimum, and dedupe — a document is
    represented by its set of local-minimum hashes, so two documents
    sharing ANY sufficiently-long run share a fingerprint regardless of
    offset. Output = fingerprints shared by ≥2 docs (the plagiarism /
    near-dup index).

    All array ops are JVM expressions (transform/slice/array_min); md5 hex
    strings order identically in both engines, so the winnow minima are
    cross-engine exact. Scale: per-doc work is linear; the only shuffle is
    the fingerprint groupBy, and hot fingerprints (boilerplate) would get
    a document-frequency cap like hot shingles in dedup.py.
    """
    d = load_table_parallel(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), " +", " ")), " ")
    d = d.select("doc_id", toks.alias("t")).filter(
        F.size("t") >= WINNOW_GRAM + WINNOW_WINDOW - 1
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("t") - (WINNOW_GRAM - 1)),
        lambda i: F.md5(
            F.concat_ws(
                " ",
                F.element_at("t", i),
                F.element_at("t", i + 1),
                F.element_at("t", i + 2),
            )
        ),
    )
    d = d.select("doc_id", grams.alias("g"))
    winnow = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("g") - (WINNOW_WINDOW - 1)),
            lambda j: F.array_min(F.slice("g", j, WINNOW_WINDOW)),
        )
    )
    return (
        d.select("doc_id", F.explode(winnow).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_doc"))
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), "fp")
    )


TFIDF_TOP = 3


@register(
    "text_tfidf_top_terms",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(trim(regexp_replace(lower(text), ' +', ' ', 'g')), ' ')) AS tok
  FROM documents
),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS n,
         CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS tf
  FROM toks GROUP BY doc_id, tok
),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
n_docs AS (SELECT COUNT(DISTINCT doc_id) AS n FROM toks),
scored AS (
  SELECT t.doc_id, t.tok,
         ROUND(t.tf * ln((SELECT n FROM n_docs) / CAST(d.df AS DOUBLE)), 6) AS tfidf
  FROM tf t JOIN df d ON t.tok = d.tok
),
ranked AS (
  SELECT doc_id, tok, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rnk
  FROM scored
)
SELECT doc_id, tok, tfidf, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {TFIDF_TOP} AND doc_id < 100
ORDER BY doc_id, rnk
""",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational TF-IDF: term frequency per doc (window-normalized),
    document frequency per term (one aggregate), idf = ln(N/df), top-3
    terms per doc. Scores round to 1e-6 before ranking so ties and hashes
    agree across engines.

    Scale: ONE corpus scan + ONE token explode feed a single
    (doc_id, tok, n) aggregate, materialized once (localCheckpoint — the
    same discipline as the MinHash signature table; production would
    persist it to the lake as the standard inverted-index artifact). Both
    branches read the materialized frame: tf normalizes it per doc, and
    df derives from it by counting rows per term — the rows are already
    distinct (doc, term) pairs, so count(*) ≡ countDistinct(doc_id)
    without re-exploding the corpus or shuffling token-granularity
    (tok, doc_id) pairs. (Without the checkpoint, per-branch column
    pruning builds two non-identical aggregate subplans, defeats
    ReusedExchange, and the corpus scans + explodes TWICE — measured in
    the formatted plan.) n_docs = COUNT(DISTINCT doc_id) like the oracle,
    computed on the already-materialized doc_term frame (a distinct +
    count over (doc, term) rows — zero extra corpus scans); counting raw
    non-NULL-text rows instead would silently diverge on a lake with
    duplicate doc_id rows. Then a broadcast of the df table (|vocab| rows)
    back onto
    the term stream; the per-doc top-k is the standard window + filter.
    No Python anywhere.
    """
    from pyspark.sql import Window

    d = load_table_parallel(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.regexp_replace(F.lower("text"), " +", " ")), " ")).alias(
            "tok"
        ),
    )
    doc_term = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("n")).transform(materialize)
    tf = doc_term.withColumn(
        "tf",
        F.col("n").cast("double") / F.sum("n").over(Window.partitionBy("doc_id")),
    )
    df = doc_term.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = doc_term.select("doc_id").distinct().count()
    scored = tf.join(F.broadcast(df), "tok").select(
        "doc_id",
        "tok",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")), 6).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "tok")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter((F.col("rnk") <= TFIDF_TOP) & (F.col("doc_id") < 100))
        .select("doc_id", "tok", "tfidf", "rnk")
        .orderBy("doc_id", "rnk")
    )


# ---------------------------------------------------------------------------
# Repetition-based quality filtering (Gopher-style)
# ---------------------------------------------------------------------------

TOP_TOKEN_FRAC_MAX = 0.30  # reject docs dominated by one token
DUP_BIGRAM_FRAC_MAX = 0.60  # reject docs that are mostly repeated bigrams


@register(
    "text_repetition_quality",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(COALESCE(text, '')), ' +', ' ', 'g')), ' ') AS toks
  FROM documents
),
s AS (
  SELECT doc_id, len(toks) AS n_tokens,
         list_max(list_transform(list_distinct(toks),
                                 x -> len(list_filter(toks, y -> y = x)))) AS top_n,
         list_transform(range(len(toks) - 1),
                        i -> concat_ws(' ', toks[i+1], toks[i+2])) AS bigrams
  FROM t
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(top_n AS BIGINT) AS top_token_n,
       CAST(top_n AS DOUBLE) / n_tokens AS top_token_frac,
       CASE WHEN len(bigrams) = 0 THEN CAST(0 AS DOUBLE)
            ELSE 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams)
       END AS dup_bigram_frac,
       CAST(CASE WHEN CAST(top_n AS DOUBLE) / n_tokens <= {TOP_TOKEN_FRAC_MAX}
                  AND (CASE WHEN len(bigrams) = 0 THEN CAST(0 AS DOUBLE)
                            ELSE 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams)
                       END) <= {DUP_BIGRAM_FRAC_MAX}
                 THEN 1 ELSE 0 END AS INT) AS passes_repetition_filter
FROM s
ORDER BY doc_id
""",
)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: most-frequent-token fraction
    and duplicate-bigram fraction per doc, with a pass/reject flag.

    Everything is ROW-LOCAL array arithmetic (no explode, no shuffle):
    per-token counts come from filter() over the doc's own token array —
    O(distinct × n) per row on ~10²-token docs — so the operator scales
    linearly with corpus size and parallelizes per-partition.
    """
    d = load_table_parallel(spark, sf_dir, "documents")
    # NULL text scores as empty text (both sides COALESCE) so every doc
    # gets a fully-defined quality row instead of NULL-poisoned metrics
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.coalesce(F.col("text"), F.lit(""))), " +", " ")),
        " ",
    )
    top_n = F.array_max(
        F.transform(
            F.array_distinct(F.col("toks")),
            lambda x: F.size(F.filter(F.col("toks"), lambda y: y == x)),
        )
    )
    # sub-2-token docs (empty/whitespace/NULL text) have zero bigrams;
    # without the guard sequence(0, -1) runs DESCENDING and element_at
    # indexes past the array (ANSI error)
    bigrams = F.when(
        F.size(F.col("toks")) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(F.col("toks")) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("toks"), i + 1), F.element_at(F.col("toks"), i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dup_frac = F.when(F.size(F.col("bigrams")) == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(F.col("bigrams"))).cast("double") / F.size(F.col("bigrams"))
    )
    top_frac = F.col("top_token_n").cast("double") / F.col("n_tokens")
    return (
        d.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.size(F.col("toks")).cast("long").alias("n_tokens"),
            top_n.cast("long").alias("top_token_n"),
            bigrams.alias("bigrams"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "top_token_n",
            top_frac.alias("top_token_frac"),
            dup_frac.alias("dup_bigram_frac"),
        )
        .withColumn(
            "passes_repetition_filter",
            (
                (F.col("top_token_frac") <= TOP_TOKEN_FRAC_MAX)
                & (F.col("dup_bigram_frac") <= DUP_BIGRAM_FRAC_MAX)
            ).cast("int"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_source_token_entropy",
    oracle="""
WITH tok AS (
  SELECT source, UNNEST(string_split(trim(regexp_replace(lower(text), ' +', ' ', 'g')), ' ')) AS token
  FROM documents
),
counts AS (
  SELECT source, token, COUNT(*) AS c FROM tok GROUP BY 1, 2
),
totals AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS n_distinct
           FROM counts GROUP BY 1)
SELECT t.source, t.n_tokens,
       CAST(t.n_distinct AS BIGINT) AS n_distinct,
       ROUND(-SUM((c.c / CAST(t.n_tokens AS DOUBLE))
                  * ln(c.c / CAST(t.n_tokens AS DOUBLE))), 6) AS token_entropy
FROM counts c JOIN totals t ON c.source = t.source
GROUP BY t.source, t.n_tokens, t.n_distinct
ORDER BY t.source
""",
)
def text_source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the token distribution per source — the corpus
    diversity/health metric (a collapsing or template-dominated source
    shows as an entropy drop). Rounded to 1e-6: the Σ p·ln p terms sum in
    engine-specific order and ln is correctly-rounded in both engines, so
    only ~1e-12 associativity noise needs absorbing.

    Two hash aggregates (token counts, per-source totals) + a broadcast-
    sized join back — token explode is the only row-multiplying step and
    partial aggregation collapses it map-side. The (source, token, c)
    aggregate is vocabulary-sized and feeds both the totals branch and
    the entropy join, so it is materialized once (per-branch column
    pruning otherwise builds two non-identical subplans, defeats
    ReusedExchange, and the corpus scans + tokenizes TWICE — verified in
    the formatted plan).
    """
    d = load_table_parallel(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), " +", " ")), " ")
    counts = (
        d.select("source", F.explode(toks).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("c"))
        .transform(materialize)
    )
    totals = counts.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"), F.count("*").alias("n_distinct")
    )
    p = F.col("c") / F.col("n_tokens").cast("double")
    return (
        counts.join(totals, "source")
        .groupBy("source", "n_tokens", F.col("n_distinct").cast("long").alias("n_distinct"))
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("token_entropy"))
        .select("source", "n_tokens", "n_distinct", "token_entropy")
        .orderBy("source")
    )


BIGRAM_MIN_COUNT = 5
BIGRAM_TOP_K = 50


@register(
    "text_bigram_lift_top",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), ' +', ' ', 'g')), ' ') AS t
  FROM documents
),
uni AS (
  SELECT UNNEST(t) AS tok FROM toks
),
ucount AS (SELECT tok, COUNT(*) AS n FROM uni GROUP BY tok),
utotal AS (SELECT CAST(SUM(n) AS BIGINT) AS big_n FROM ucount),
bi AS (
  SELECT t[i.i] AS x, t[i.i + 1] AS y
  FROM toks, UNNEST(range(1, len(t))) AS i(i)
),
bcount AS (SELECT x, y, COUNT(*) AS n_xy FROM bi GROUP BY x, y),
btotal AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS big_b FROM bcount)
SELECT b.x, b.y, b.n_xy, ux.n AS n_x, uy.n AS n_y,
       CAST(b.n_xy AS DOUBLE) * ut.big_n * ut.big_n
         / (CAST(bt.big_b AS DOUBLE) * ux.n * uy.n) AS lift
FROM bcount b
JOIN ucount ux ON b.x = ux.tok
JOIN ucount uy ON b.y = uy.tok
CROSS JOIN utotal ut CROSS JOIN btotal bt
WHERE b.n_xy >= {BIGRAM_MIN_COUNT}
ORDER BY b.n_xy DESC, b.x, b.y
LIMIT {BIGRAM_TOP_K}
""",
)
def text_bigram_lift_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram association statistics: observed bigram count vs the count
    expected under unigram independence (lift = P(xy) / P(x)P(y), the
    exp(PMI)) — the collocation/template detector behind phrase mining and
    boilerplate discovery in corpus analysis.

    Cross-engine exactness without rounding: lift is a pure scalar
    expression over exact integers (counts and totals), evaluated in the
    same left-to-right binary64 order on both engines — unlike the entropy
    aggregate there is no float reduction whose order could differ, so the
    doubles are bit-identical. Ranking and selection use only integer
    counts (n_xy, then lexicographic tie-break).

    Scale: token explode → two hash aggregates (unigrams, bigrams) with
    map-side partial aggregation, then joins keyed on token — the unigram
    table is vocabulary-sized (sublinear in corpus), and the two totals are
    single-row broadcasts. No all-pairs work anywhere. Both aggregates are
    materialized once (localCheckpoint): each feeds TWO consumers (its
    total and a join side), and per-consumer column pruning otherwise
    builds non-identical subplans, defeats ReusedExchange, and re-scans +
    re-tokenizes the corpus once per consumer — four full passes, verified
    in the formatted plan. Materialized, the corpus is read exactly twice
    (once per n-gram order), and what persists is vocabulary-sized.
    """
    d = load_table_parallel(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), " +", " ")), " ")
    t = d.select("doc_id", toks.alias("t"))
    uni = t.select(F.explode("t").alias("tok"))
    ucount = uni.groupBy("tok").agg(F.count("*").alias("n")).transform(materialize)
    # consecutive pairs, array-local (no positional window shuffle)
    pairs = t.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t) - 1)").alias("x"),
                F.expr("slice(t, 2, size(t) - 1)").alias("y"),
            )
        ).alias("p")
    ).select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    bcount = pairs.groupBy("x", "y").agg(F.count("*").alias("n_xy")).transform(materialize)
    big_n = ucount.agg(F.sum("n").cast("long").alias("big_n"))
    big_b = bcount.agg(F.sum("n_xy").cast("long").alias("big_b"))
    ux = ucount.select(F.col("tok").alias("x"), F.col("n").alias("n_x"))
    uy = ucount.select(F.col("tok").alias("y"), F.col("n").alias("n_y"))
    lift = (F.col("n_xy").cast("double") * F.col("big_n") * F.col("big_n")) / (
        F.col("big_b").cast("double") * F.col("n_x") * F.col("n_y")
    )
    return (
        bcount.filter(F.col("n_xy") >= BIGRAM_MIN_COUNT)
        .join(ux, "x")
        .join(uy, "y")
        .crossJoin(F.broadcast(big_n))
        .crossJoin(F.broadcast(big_b))
        .select("x", "y", "n_xy", "n_x", "n_y", lift.alias("lift"))
        .orderBy(F.desc("n_xy"), "x", "y")
        .limit(BIGRAM_TOP_K)
    )


RARE_DF_MAX = 3


@register(
    "text_rarity_score",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(trim(regexp_replace(lower(text), ' +', ' ', 'g')), ' ')) AS token
  FROM documents
),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_toks,
       CAST(SUM(d.df) AS BIGINT) AS sum_df,
       CAST(SUM(d.df) AS DOUBLE) / COUNT(*) AS avg_token_df,
       CAST(SUM(CASE WHEN d.df <= {RARE_DF_MAX} THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS rare_frac
FROM tok t JOIN df d ON t.token = d.token
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency rarity profile per document: mean document
    frequency of the doc's tokens (with multiplicity) and the fraction of
    near-hapax tokens (df ≤ {RARE_DF_MAX}) — the frequency-based quality
    signal behind CCNet-style perplexity filtering, expressed in exact
    integer arithmetic (no language model, no logs) so both engines agree
    bit-for-bit: integer sums divided once in binary64.

    A doc of common vocabulary scores high avg_token_df (likely fluent /
    also likely boilerplate); a doc dominated by rare garbage tokens shows
    high rare_frac — both tails get review in a real pipeline.

    Scale: ONE corpus scan + ONE explode feed a (doc_id, token, n)
    aggregate, materialized once (the standard inverted-index artifact —
    same discipline as the TF-IDF query above; without it the df branch
    and the join stream each re-scan + re-explode the corpus, verified in
    the formatted plan). df derives from it by counting rows per token
    (the rows are already distinct (doc, token) pairs, so count(*) ≡
    countDistinct(doc_id)), and the per-doc sums weight each distinct
    token by its in-doc multiplicity n — exact integer arithmetic, and
    the token-keyed join now streams distinct doc-term pairs instead of
    every token occurrence.
    """
    d = load_table_parallel(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), " +", " ")), " ")
    tok = d.select("doc_id", F.explode(toks).alias("token"))
    doc_term = tok.groupBy("doc_id", "token").agg(F.count("*").alias("n")).transform(materialize)
    df = doc_term.groupBy("token").agg(F.count("*").alias("df"))
    n_toks = F.sum("n")
    sum_df = F.sum(F.col("n") * F.col("df"))
    return (
        doc_term.join(df, "token")
        .groupBy("doc_id")
        .agg(
            n_toks.cast("long").alias("n_toks"),
            sum_df.cast("long").alias("sum_df"),
            (sum_df.cast("double") / n_toks).alias("avg_token_df"),
            (
                F.sum(F.when(F.col("df") <= RARE_DF_MAX, F.col("n")).otherwise(0)).cast(
                    "double"
                )
                / n_toks
            ).alias("rare_frac"),
        )
        .orderBy("doc_id")
    )


SPAN_FP_DF_CAP = 20  # drop boilerplate fingerprints shared by too many docs
SPAN_MIN_SHARED = 3  # pairs must share at least this many winnow minima


@register(
    "text_repeated_span_pairs",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), ' +', ' ', 'g')), ' ') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_transform(range(1, len(t) - {WINNOW_GRAM - 2}),
                        i -> md5(concat_ws(' ', t[i], t[i+1], t[i+2]))) AS g
  FROM toks WHERE len(t) >= {WINNOW_GRAM + WINNOW_WINDOW - 1}
),
winnow AS (
  SELECT doc_id,
         UNNEST(list_distinct(list_transform(range(1, len(g) - {WINNOW_WINDOW - 2}),
                                             j -> list_min(g[j:j+{WINNOW_WINDOW - 1}])))) AS fp
  FROM grams
),
kept AS (
  SELECT doc_id, fp FROM winnow
  WHERE fp IN (SELECT fp FROM winnow GROUP BY fp HAVING COUNT(*) <= {SPAN_FP_DF_CAP})
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM winnow GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.n_shared,
       CAST(p.n_shared AS DOUBLE) / LEAST(sa.sz, sb.sz) AS containment
FROM pairs p
JOIN sizes sa ON p.doc_a = sa.doc_id
JOIN sizes sb ON p.doc_b = sb.doc_id
WHERE p.n_shared >= {SPAN_MIN_SHARED}
ORDER BY p.doc_a, p.doc_b
""",
)
def text_repeated_span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span detection: document pairs sharing
    ≥ SPAN_MIN_SHARED winnowing fingerprints, scored by containment
    (shared minima / smaller doc's fingerprint set) — the substring-level
    near-dup signal that whole-doc Jaccard misses (a paragraph pasted into
    an otherwise-unrelated document). This is the pairwise companion of
    ``text_winnow_fingerprints``.

    Scale: inverted-index self-join on fingerprint (only docs sharing a
    winnow minimum ever meet — never all-pairs), with boilerplate
    fingerprints dropped by a document-frequency cap BEFORE the join
    (SPAN_FP_DF_CAP, the same skew mitigation as the hot-shingle-capped
    Jaccard). Containment divides two exact integers once in binary64, so
    the DuckDB comparison is bit-exact. Sizes are computed from the
    UNCAPPED sets (capping only prunes candidate generation, not the
    denominator semantics).
    """
    d = load_table_parallel(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), " +", " ")), " ")
    d = d.select("doc_id", toks.alias("t")).filter(
        F.size("t") >= WINNOW_GRAM + WINNOW_WINDOW - 1
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("t") - (WINNOW_GRAM - 1)),
        lambda i: F.md5(
            F.concat_ws(
                " ",
                F.element_at("t", i),
                F.element_at("t", i + 1),
                F.element_at("t", i + 2),
            )
        ),
    )
    winnow_set = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("g") - (WINNOW_WINDOW - 1)),
            lambda j: F.array_min(F.slice("g", j, WINNOW_WINDOW)),
        )
    )
    fps = (
        d.select("doc_id", grams.alias("g"))
        .select("doc_id", F.explode(winnow_set).alias("fp"))
        .transform(materialize)  # feeds sizes, the df-cap, and both join sides
    )
    sizes = fps.groupBy("doc_id").agg(F.count("*").alias("sz"))
    rare = fps.groupBy("fp").agg(F.count("*").alias("df")).filter(
        F.col("df") <= SPAN_FP_DF_CAP
    )
    kept = fps.join(rare.select("fp"), "fp")
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= SPAN_MIN_SHARED)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            (F.col("n_shared").cast("double") / F.least("sz_a", "sz_b")).alias("containment"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (keyword search over the corpus)
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("vector", "join", "scan")
BM25_TOP = 20
_BM25_Q_SQL = "', '".join(BM25_QUERY)


# Shared with functions/text_index.py's stored-index query — ONE source
# of truth for the cross-engine float contract both paths must satisfy.
BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(trim(regexp_replace(lower(text), ' +', ' ', 'g')), ' ')) AS tok
  FROM documents
),
doc_term AS (SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY doc_id, tok),
dl AS (SELECT doc_id, SUM(n) AS dl FROM doc_term GROUP BY doc_id),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total FROM dl),
qdf AS (
  SELECT tok, COUNT(*) AS df FROM doc_term WHERE tok IN ('{_BM25_Q_SQL}') GROUP BY tok
),
w AS (
  SELECT t.doc_id,
         CAST(ROUND(
           ln(1 + (CAST(s.n_docs AS DOUBLE) - q.df + 0.5) / (CAST(q.df AS DOUBLE) + 0.5)) *
           ((t.n * CAST(2.2 AS DOUBLE)) /
            (t.n + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * d.dl / (CAST(s.total AS DOUBLE) / s.n_docs)))),
           6) AS DECIMAL(18,6)) AS wgt
  FROM doc_term t
  JOIN qdf q ON t.tok = q.tok
  JOIN dl d ON t.doc_id = d.doc_id
  CROSS JOIN stats s
),
scored AS (SELECT doc_id, CAST(SUM(wgt) AS DOUBLE) AS score FROM w GROUP BY doc_id),
ranked AS (
  SELECT doc_id, score, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
  FROM scored
)
SELECT doc_id, score, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {BM25_TOP}
ORDER BY rnk
"""


@register("text_bm25_search_topk", oracle=BM25_ORACLE)
def text_bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval: top-{BM25_TOP} documents for a fixed keyword
    query, Okapi BM25 (k1=1.2, b=0.75) over whitespace tokens.

    This is the missing retrieval half of the corpus toolkit: TF-IDF
    ranks a doc's own terms, BM25 ranks DOCS for a query — the op a
    training-data curator runs to pull topical slices out of a 100 TB
    corpus ("give me the docs about X"), and the relevance baseline every
    embedding retriever is measured against.

    Scale: ONE corpus scan + ONE token explode feed the same materialized
    (doc_id, tok, n) aggregate as TF-IDF (production persists it to the
    lake as the inverted index; sharing the artifact is the point). From
    that frame everything is post-aggregation-sized: doc lengths are one
    row per doc (materialized — feeds both the corpus stats and the score
    join), corpus stats are ONE row carried by a broadcast nested-loop
    (no driver collect), per-term df is |query| rows broadcast back onto
    the term stream, and only rows whose token is IN the query survive to
    the score join — the fact-sized token stream is pruned by the query
    terms BEFORE any join. Final top-k is orderBy+limit →
    TakeOrderedAndProject (per-partition heaps, no global sort), with
    row_number assigned on the already-k-sized result.

    Cross-engine determinism follows the TF-IDF recipe: identical
    floating-point expression shapes on both sides, per-term weights
    rounded to 1e-6 then summed as DECIMAL(18,6) (order-independent), the
    decimal total cast to DOUBLE at the end; ties broken by doc_id.
    """
    from pyspark.sql import Window

    d = load_table_parallel(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.regexp_replace(F.lower("text"), " +", " ")), " ")).alias(
            "tok"
        ),
    )
    doc_term = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("n")).transform(materialize)
    dl = doc_term.groupBy("doc_id").agg(F.sum("n").alias("dl")).transform(materialize)
    stats = dl.agg(F.count("*").alias("n_docs"), F.sum("dl").alias("total"))
    qterms = doc_term.filter(F.col("tok").isin(*BM25_QUERY))
    qdf = qterms.groupBy("tok").agg(F.count("*").alias("df"))
    avgdl = F.col("total").cast("double") / F.col("n_docs")
    idf = F.log(F.lit(1) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    tf_w = (F.col("n") * F.lit(BM25_K1 + 1.0)) / (
        F.col("n") + F.lit(BM25_K1) * (F.lit(1 - BM25_B) + F.lit(BM25_B) * F.col("dl") / avgdl)
    )
    w = (
        qterms.join(F.broadcast(qdf), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(idf * tf_w, 6).cast("decimal(18,6)").alias("wgt"))
    )
    scored = w.groupBy("doc_id").agg(F.sum("wgt").cast("double").alias("score"))
    topk = scored.orderBy(F.desc("score"), "doc_id").limit(BM25_TOP)
    rnk = F.row_number().over(Window.orderBy(F.desc("score"), "doc_id"))
    return topk.withColumn("rnk", rnk).select("doc_id", "score", "rnk").orderBy("rnk")


# --- bigram-LM perplexity quality scoring (round 10) ---------------------
# Train/eval split by the repo's multiplicative doc_id hash (RNG-free,
# cross-engine identical — functions/sampling.py); half the corpus trains
# the model, every doc is scored.
LM_KNUTH = 2654435761  # 2^32 / golden ratio (sampling.py's constant)
LM_MOD = 4294967296  # 2^32


@register(
    "text_lm_perplexity_score",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), ' +', ' ', 'g')), ' ') AS t,
         ((doc_id * {LM_KNUTH}) % {LM_MOD}) < {LM_MOD // 2} AS is_train
  FROM documents
),
vocab AS (
  SELECT COUNT(DISTINCT tok) + 1 AS v
  FROM (SELECT UNNEST(t) AS tok FROM d WHERE is_train)
),
bi AS (
  SELECT doc_id, is_train, t[i.i] AS x, t[i.i + 1] AS y
  FROM d, UNNEST(range(1, len(t))) AS i(i)
),
bcount AS (SELECT x, y, COUNT(*) AS c_xy FROM bi WHERE is_train GROUP BY x, y),
ccount AS (SELECT x, SUM(c_xy) AS c_x FROM bcount GROUP BY x),
scored AS (
  SELECT e.doc_id, COALESCE(b.c_xy, 0) AS c_xy, COALESCE(c.c_x, 0) AS c_x
  FROM bi e
  LEFT JOIN bcount b ON e.x = b.x AND e.y = b.y
  LEFT JOIN ccount c ON e.x = c.x
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CASE WHEN s.c_xy = 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS unseen_frac,
       ROUND(-SUM(LN(CAST(s.c_xy + 1 AS DOUBLE) / CAST(s.c_x + v.v AS DOUBLE)))
             / COUNT(*), 6) AS cross_entropy
FROM scored s CROSS JOIN vocab v
GROUP BY s.doc_id
ORDER BY s.doc_id
""",
)
def text_lm_perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model perplexity quality filtering, the CCNet recipe
    (Wenzek et al. LREC 2020): train an n-gram LM on a reference slice,
    score every document by cross-entropy, and gate/bucket on the score —
    the standard "does this read like the reference corpus" signal that
    complements the model-free rarity profile (``text_rarity_score``).
    Here the LM is an add-one-smoothed BIGRAM model trained on the
    deterministic half-corpus hash split (``(doc_id·K) mod 2^32 <
    2^31`` — the repo's RNG-free sampling hash), with OOV handled by the
    count tables themselves: an out-of-vocab or unseen event reads
    c=0 through the left joins and scores (0+1)/(c_x+V), the same value
    an explicit UNK token would get, so no token rewriting pass is
    needed. V = distinct train tokens + 1 (the UNK slot).

    Cross-engine exactness: ln() is correctly rounded on identical
    doubles in both engines; only the per-doc summation order differs, so
    the final divide is rounded at 1e-6 (the ``text_source_token_entropy``
    discipline). n_bigrams and unseen_frac are exact integers/ratios.
    Docs with fewer than two tokens have no bigrams and drop out on both
    engines.

    Scale: the corpus is read twice (token pass for the vocab size,
    bigram pass for everything else — the ``text_bigram_lift_top``
    two-pass shape). The bigram frame is materialized ONCE and feeds both
    the train-count branch and the eval join (per-branch pruning would
    otherwise rebuild + re-tokenize per consumer). Model tables are
    bigram-TYPE-sized (sublinear in corpus), the joins are token-keyed
    hash joins with map-side partial aggregation upstream, V is a one-row
    broadcast. At 100 TB the model tables are the only shuffled state —
    the scoring pass is embarrassingly parallel.
    """
    d = load_table_parallel(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), " +", " ")), " ")
    base = d.select(
        "doc_id",
        toks.alias("t"),
        ((F.col("doc_id") * F.lit(LM_KNUTH)) % F.lit(LM_MOD) < F.lit(LM_MOD // 2)).alias(
            "is_train"
        ),
    )
    vocab = (
        base.filter("is_train")
        .select(F.explode("t").alias("tok"))
        .agg((F.countDistinct("tok") + 1).alias("v"))
    )
    bi = base.select(
        "doc_id",
        "is_train",
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t) - 1)").alias("x"),
                F.expr("slice(t, 2, size(t) - 1)").alias("y"),
            )
        ).alias("p"),
    ).select(
        "doc_id", "is_train", F.col("p.x").alias("x"), F.col("p.y").alias("y")
    ).transform(materialize)
    bcount = (
        bi.filter("is_train")
        .groupBy("x", "y")
        .agg(F.count("*").alias("c_xy"))
        .transform(materialize)  # feeds ccount AND the eval join
    )
    ccount = bcount.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    scored = (
        bi.join(bcount, ["x", "y"], "left")
        .join(ccount, ["x"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.coalesce(F.col("c_xy"), F.lit(0)).alias("c_xy"),
            F.coalesce(F.col("c_x"), F.lit(0)).alias("c_x"),
            "v",
        )
    )
    n = F.count("*")
    logp = F.log((F.col("c_xy") + 1).cast("double") / (F.col("c_x") + F.col("v")).cast("double"))
    return (
        scored.groupBy("doc_id")
        .agg(
            n.cast("long").alias("n_bigrams"),
            (F.sum((F.col("c_xy") == 0).cast("int")).cast("double") / n).alias(
                "unseen_frac"
            ),
            F.round(-F.sum(logp) / n, 6).alias("cross_entropy"),
        )
        .orderBy("doc_id")
    )
