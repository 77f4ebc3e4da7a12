"""Corpus-shaping operators for LLM training pipelines: chunking,
deterministic split assignment, token-budget packing.

These sit downstream of dedup/quality (functions/dedup.py, pipeline.py) in
a real data-prep DAG: documents are chunked to context-window-sized pieces,
assigned to train/val/test deterministically (reproducible across reruns
and engines — no RNG), and packed into fixed token budgets.

All three are pure column/window expressions — no UDFs, no collect — so
they parallelize per-partition and survive 100 TB: chunking is a row-local
explode (output rows ∝ tokens), the split is a stateless hash, and packing
is one window cumsum per language partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgcp_spark.registry import register
from pgcp_spark.sources import load_table, load_table_parallel

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16
_STEP = CHUNK_TOKENS - CHUNK_OVERLAP

# same multiplicative-hash split as functions/pipeline.py — deterministic
# and reproducible in ANY engine (no RNG, no engine-specific hash)
KNUTH = 2654435761
MOD = 2**32
TRAIN_PCT, VAL_PCT = 80, 10

PACK_BUDGET = 512  # tokens per packed sequence


@register(
    "corpus_chunk_fixed_tokens",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tokens,
         len(string_split(text, ' ')) AS n_tok
  FROM documents WHERE doc_id < 50
),
chunks AS (
  SELECT doc_id,
         CAST(g.i AS BIGINT) AS chunk_idx,
         array_to_string(tokens[(g.i * {_STEP} + 1):(g.i * {_STEP} + {CHUNK_TOKENS})], ' ') AS chunk_text
  FROM toks, LATERAL (
    SELECT UNNEST(generate_series(0, CAST(CEIL(GREATEST(n_tok - {CHUNK_OVERLAP}, 1) / {_STEP}.0) AS BIGINT) - 1)) AS i
  ) g
)
SELECT doc_id, chunk_idx, chunk_text,
       CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS chunk_tokens
FROM chunks
ORDER BY doc_id, chunk_idx
""",
)
def corpus_chunk_fixed_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap: each doc explodes into
    ⌈(n_tok − overlap)/step⌉ chunks of ≤64 tokens overlapping by 16 — the
    context-window shaping step of a pretraining pipeline.

    Row-local: tokenization, the chunk-index sequence, and the slices are
    all computed per input row (explode fans out in the same task, no
    shuffle); the only exchange is the final presentation sort.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    tokens = F.split("text", " ")
    n_tok = F.size(tokens)
    n_chunks = F.ceil(F.greatest(n_tok - CHUNK_OVERLAP, F.lit(1)) / F.lit(float(_STEP)))
    return (
        d.select(
            "doc_id",
            tokens.alias("tokens"),
            F.posexplode(F.sequence(F.lit(0), (n_chunks - 1).cast("long"))).alias(
                "_p", "chunk_idx"
            ),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.array_join(
                F.slice("tokens", F.col("chunk_idx").cast("int") * _STEP + 1, CHUNK_TOKENS),
                " ",
            ).alias("chunk_text"),
        )
        .withColumn("chunk_tokens", F.size(F.split("chunk_text", " ")).cast("long"))
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "corpus_train_val_test_split",
    oracle=f"""
SELECT lang, split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT lang, n_chars,
         CASE WHEN (doc_id * {KNUTH}) % {MOD} < {TRAIN_PCT / 100} * {MOD} THEN 'train'
              WHEN (doc_id * {KNUTH}) % {MOD} < {(TRAIN_PCT + VAL_PCT) / 100} * {MOD} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
GROUP BY lang, split
ORDER BY lang, split
""",
)
def corpus_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by multiplicative
    hash of doc_id — reproducible across engines/reruns (no RNG), stable
    under corpus growth (a doc's split never changes), and stateless (no
    shuffle until the reporting aggregate).
    """
    d = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(KNUTH)) % F.lit(MOD)
    split = (
        F.when(h < F.lit(int(TRAIN_PCT / 100 * MOD)), "train")
        .when(h < F.lit(int((TRAIN_PCT + VAL_PCT) / 100 * MOD)), "val")
        .otherwise("test")
    )
    return (
        d.select("lang", "n_chars", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang", "split")
    )


@register(
    "corpus_pack_token_budget",
    oracle=f"""
WITH sized AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
  FROM documents
),
packed AS (
  SELECT doc_id, lang, n_tok,
         CAST(FLOOR(
           (SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
           / {PACK_BUDGET}.0) AS BIGINT) AS bin_id
  FROM sized
)
SELECT lang, bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
FROM packed
GROUP BY lang, bin_id
ORDER BY lang, bin_id
""",
)
def corpus_pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: stream docs (per language, doc_id order) into
    ~512-token bins — bin id = ⌊cumulative-tokens-before/budget⌋, the
    streaming first-fit used to batch variable-length docs into fixed
    context windows without padding waste.

    One window cumsum per lang partition + one reporting aggregate; the
    window and the groupBy share the lang-keyed exchange.
    """
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_before = F.sum("n_tok").over(w) - F.col("n_tok")
    return (
        d.select("doc_id", "lang", n_tok.alias("n_tok"))
        .withColumn("bin_id", F.floor(cum_before / float(PACK_BUDGET)).cast("long"))
        .groupBy("lang", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("bin_tokens"),
        )
        .orderBy("lang", "bin_id")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

EVAL_SOURCE = "src0"  # held-out benchmark/eval slice of the corpus
DECON_THRESHOLD = 0.5  # flag training docs with ≥50% shingle overlap vs eval


@register(
    "corpus_decontaminate_eval_overlap",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, source, UNNEST(list_distinct(list_transform(
           range(len(t) - 2),
           i -> concat_ws(' ', t[i+1], t[i+2], t[i+3])))) AS shingle
  FROM (SELECT doc_id, source,
               string_split(trim(regexp_replace(lower(text), ' +', ' ', 'g')), ' ') AS t
        FROM documents)
),
eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE source = '{EVAL_SOURCE}'),
train AS (SELECT doc_id, shingle FROM sh WHERE source <> '{EVAL_SOURCE}'),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY 1),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_matched
  FROM train t JOIN eval_sh e ON t.shingle = e.shingle
  GROUP BY 1
)
SELECT s.doc_id,
       CAST(s.n_shingles AS BIGINT) AS n_shingles,
       CAST(COALESCE(h.n_matched, 0) AS BIGINT) AS n_matched,
       CAST(COALESCE(h.n_matched, 0) AS DOUBLE) / s.n_shingles AS contam_frac,
       CAST(CASE WHEN CAST(COALESCE(h.n_matched, 0) AS DOUBLE) / s.n_shingles
                      >= {DECON_THRESHOLD} THEN 1 ELSE 0 END AS INT) AS is_contaminated
FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
ORDER BY s.doc_id
""",
)
def corpus_decontaminate_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: word-3-gram overlap of every training doc
    against the held-out eval slice (source = src0); docs whose distinct
    shingles are ≥50% covered by eval shingles are flagged contaminated.

    Scale shape: the eval/benchmark set is FIXED-SIZE in production (a few
    MB of benchmark prompts — not sf-proportional), so its distinct-shingle
    set is genuinely broadcastable; the train side streams through a
    broadcast-hash semi-join with no shuffle of the corpus. The only wide
    exchanges are the two per-doc count aggregates on doc_id.
    """
    from pgcp_spark.functions.dedup import _normalized, _shingles

    d = load_table_parallel(spark, sf_dir, "documents")
    # shingle once, feed both the eval and train branches (disjoint filters
    # over the same expensive shingling scan → materialize it once)
    sh = d.select(
        "doc_id", "source", F.explode(_shingles(F.split(_normalized(), " "))).alias("shingle")
    ).localCheckpoint()
    eval_sh = sh.filter(F.col("source") == EVAL_SOURCE).select("shingle").distinct()
    train = sh.filter(F.col("source") != EVAL_SOURCE).select("doc_id", "shingle")
    sizes = train.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        train.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matched"))
    )
    frac = F.coalesce(F.col("n_matched"), F.lit(0)).cast("double") / F.col("n_shingles")
    return (
        sizes.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.coalesce(F.col("n_matched"), F.lit(0)).cast("long").alias("n_matched"),
            frac.alias("contam_frac"),
            (frac >= DECON_THRESHOLD).cast("int").alias("is_contaminated"),
        )
        .orderBy("doc_id")
    )


NEG_PER_DOC = 4
_NEG_STEP = 40503  # odd constant decorrelating the per-pair index


@register(
    "corpus_contrastive_negatives",
    oracle=f"""
WITH mx AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
cand AS (
  SELECT d.doc_id,
         CAST(i.i AS INT) AS pair_idx,
         (d.doc_id * {KNUTH} + i.i * {_NEG_STEP}) % mx.n AS neg_doc_id
  FROM documents d, mx, UNNEST(range({NEG_PER_DOC})) AS i(i)
)
SELECT c.doc_id, c.pair_idx, c.neg_doc_id, n.source AS neg_source, n.lang AS neg_lang
FROM cand c JOIN documents n ON c.neg_doc_id = n.doc_id
WHERE c.neg_doc_id <> c.doc_id
ORDER BY c.doc_id, c.pair_idx
""",
)
def corpus_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative-pair sampling for contrastive training: each
    document draws NEG_PER_DOC pseudo-random partner docs via the same
    multiplicative-hash scheme as the split assignment — reproducible
    across reruns and engines (no RNG), so the pairing is stable under
    retries and incremental rebuilds, which real training pipelines
    require. Self-pairs are dropped; candidate ids that don't exist in the
    corpus simply fail the inner join (no dense-id assumption, no global
    row_number window).

    Scale: a row-local explode (×NEG_PER_DOC) and one equi-join back to
    documents on the sampled id — both shuffle-bounded by corpus size;
    nothing quadratic, nothing driver-side.
    """
    d = load_table(spark, sf_dir, "documents")
    n = d.agg((F.max("doc_id") + 1).alias("n"))
    cand = (
        d.select("doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.explode(F.array(*[F.lit(i) for i in range(NEG_PER_DOC)])).alias("pair_idx"),
            F.col("n"),
        )
        .select(
            "doc_id",
            "pair_idx",
            ((F.col("doc_id") * KNUTH + F.col("pair_idx") * _NEG_STEP) % F.col("n")).alias(
                "neg_doc_id"
            ),
        )
    )
    neg = d.select(
        F.col("doc_id").alias("neg_doc_id"),
        F.col("source").alias("neg_source"),
        F.col("lang").alias("neg_lang"),
    )
    return (
        cand.join(neg, "neg_doc_id")
        .filter(F.col("neg_doc_id") != F.col("doc_id"))
        .select("doc_id", "pair_idx", "neg_doc_id", "neg_source", "neg_lang")
        .orderBy("doc_id", "pair_idx")
    )


@register(
    "corpus_mix_rebalance",
    oracle=f"""
WITH stats AS (
  SELECT source, COUNT(*) AS n_before FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(n_before) AS BIGINT) AS n, COUNT(*) AS n_sources FROM stats),
rates AS (
  SELECT s.source, s.n_before,
         LEAST(1.0, (CAST(t.n AS DOUBLE) / t.n_sources) / s.n_before) AS rate
  FROM stats s CROSS JOIN tot t
)
SELECT r.source, r.n_before, r.rate,
       CAST(SUM(CASE WHEN (d.doc_id * {KNUTH}) % {MOD} < r.rate * {MOD}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_after
FROM documents d JOIN rates r ON d.source = r.source
GROUP BY r.source, r.n_before, r.rate
ORDER BY r.source
""",
)
def corpus_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix rebalancing: compute per-source down-sampling rates that
    equalize each source's share of the corpus (rate_s = min(1, target/n_s)
    with target = N/n_sources), then apply them with the deterministic
    multiplicative-hash coin — the domain-weighting pass every training
    mix runs, reproducible across engines and reruns (no RNG).

    Exactness: rates are one double division over exact integers and the
    keep decision compares an exact integer hash against rate*2^32 — both
    sides evaluate the same binary64 expression, so counts match the
    oracle bit-for-bit.

    Scale: one aggregate for the per-source histogram (materialized at
    |sources| rows — it feeds both the grand total and the rates join,
    and without the checkpoint each consumer re-scanned the corpus for
    its own copy of the aggregate), a broadcast join of the rates back
    onto documents, and a second aggregate — the sampled subset never
    materializes driver-side.
    """
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("source").agg(F.count("*").alias("n_before")).localCheckpoint()
    tot = stats.agg(
        F.sum("n_before").cast("long").alias("n"), F.count("*").alias("n_sources")
    )
    rates = (
        stats.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_before",
            F.least(
                F.lit(1.0),
                (F.col("n").cast("double") / F.col("n_sources")) / F.col("n_before"),
            ).alias("rate"),
        )
    )
    keep = (F.col("doc_id") * KNUTH) % MOD < F.col("rate") * MOD
    return (
        d.join(F.broadcast(rates), "source")
        .groupBy("source", "n_before", "rate")
        .agg(F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_after"))
        .orderBy("source")
    )
