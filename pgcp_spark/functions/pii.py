"""PII redaction for training corpora: typed pattern scrubbing.

Every production LLM-data pipeline scrubs emails / phone numbers / IPs /
SSN-shaped ids before training; this is that pass, Spark-first: one
chained ``regexp_replace`` per PII type (JVM-side, whole-stage codegen —
no Python in the hot path) plus per-type raw hit counts for the
compliance ledger. The patterns are deliberately written in the
REGULAR-language subset both engines implement identically (no
backreferences, no lookaround), so the DuckDB oracle replays the exact
pipeline and the driver hash proves redaction parity byte for byte.

Counting convention: per-type counts are measured on the RAW text
(``size(split(text, pat)) - 1`` — both engines keep trailing empty
fields), independent of replacement order; the redacted text applies the
rules IN ORDER (email → SSN → phone → IPv4), which is load-bearing —
the IPv4 pattern would otherwise match inside a dotted phone number.
NULL text stays NULL through both the redaction and the counts (ANSI),
and zero-match text round-trips unchanged.

Scale: row-local string work — embarrassingly parallel, no shuffle, no
UDF. Public-method anchor: the C4/Gopher-style cleanup passes describe
regex scrubbing of contact strings (Raffel et al. JMLR 2020 §2.2 applies
line filters of the same family); the placeholder-token convention
(``<EMAIL>``) follows common open-data practice (e.g. the Pile's
preprocessing scripts).

Reference anchor: none — north-star training-data surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.registry import register
from pgcp_spark.sources import load_table

# (name, pattern, placeholder) — pattern syntax restricted to the
# Java-regex ∩ RE2 regular subset; ORDER MATTERS for redaction (module
# docstring). Patterns favor precision over recall (the usual PII-scrub
# trade: a false positive deletes training signal silently).
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact_text(col: Column | str) -> Column:
    """Typed placeholder redaction, rules applied in ``PII_RULES`` order."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column | str) -> list[Column]:
    """Raw per-type hit counts (aliased ``n_<type>``), measured on the
    un-redacted text so they are replacement-order-independent."""
    src = F.col(col) if isinstance(col, str) else col
    return [
        (F.size(F.split(src, pat)) - 1).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_RULES
    ]


def _sql_redact(expr: str) -> str:
    for _, pat, repl in PII_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


def _sql_counts(expr: str) -> str:
    return ", ".join(
        f"CAST(length(regexp_split_to_array({expr}, '{pat}')) - 1 AS BIGINT)"
        f" AS n_{name}"
        for name, pat, _ in PII_RULES
    )


# The synthetic corpus is PII-free word salad, so the registered query
# INJECTS deterministic PII first (every 7th doc an email derived from
# its id, every 11th an IP, every 13th an SSN shape, every 17th a dotted
# phone), mirrored verbatim in the oracle — the hash then proves real
# redactions, not a no-op pass. The injection is demo harness; the
# operators above are the product and take any text column.
_INJECT_SQL = (
    "text"
    " || CASE WHEN doc_id % 7 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)"
    " || '.0.1 inbound' ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN ' id 123-45-6789' ELSE '' END"
    " || CASE WHEN doc_id % 17 = 0 THEN ' call 555.123.4567' ELSE '' END"
)


def _injected(d: DataFrame) -> DataFrame:
    did = F.col("doc_id").cast("string")
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit(" reach user"), did, F.lit("@example.com now")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" from 10."),
                    (F.col("doc_id") % 200).cast("string"),
                    F.lit(".0.1 inbound"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0, F.lit(" id 123-45-6789")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 17 == 0, F.lit(" call 555.123.4567")).otherwise(
                F.lit("")
            ),
        ).alias("t"),
    )


@register(
    "text_pii_redaction",
    oracle=f"""
WITH injected AS (
  SELECT doc_id, {_INJECT_SQL} AS t FROM documents
)
SELECT doc_id,
       {_sql_redact("t")} AS redacted,
       {_sql_counts("t")}
FROM injected
ORDER BY doc_id
""",
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed PII scrub over the documents corpus (deterministic injected
    PII — see module comment), returning the redacted text plus the
    per-type compliance counts; hash-checked against DuckDB replaying
    the identical regex pipeline."""
    d = _injected(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        redact_text("t").alias("redacted"),
        *pii_counts("t"),
    ).orderBy("doc_id")
