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
fields), independent of replacement order. Because some patterns
genuinely overlap (a separated E.164 number CONTAINS a bare 3-3-4 phone
match), raw counts are per-pattern hit counts, not a disjoint
attribution — a "+1 555 123 4567" raw hit counts once under e164 and
once under phone, identically on both engines.

The redacted text applies the rules IN ORDER, and for one pair the
order is genuinely load-bearing: ``phone_e164`` must run BEFORE the
bare ``phone`` rule, because the bare rule matches the 3-3-4 tail
inside a separated E.164 number and would leave "+1 <PHONE>" behind
(pinned in tests/test_pii.py). The remaining rules are mutually
non-overlapping — in particular the IPv4 pattern can never match inside
a dotted phone (an IPv4 needs three dots and 1-3-digit octets; a dotted
phone has two separators and a 4-digit tail), so their relative order is
free. NULL text stays NULL through both the redaction and the counts
(ANSI), and zero-match text round-trips unchanged.

Recall tiers (round 12 broadened the round-11 precision-first set; round
13 added tier 3 — financial/international): the paren / space-separated
/ E.164 phone shapes and the ``user at example dot com`` obfuscated-
email tier trade some precision for recall — word salad can legitimately
contain " at X dot yz" — the standard corpus-scrub trade (a false
positive deletes a little training signal; a false negative leaks PII).
Tier 3 covers grouped payment-card numbers (16-19 in 4-4-4-(1..4) and
amex 4-6-5 — shape only, Luhn is not a regular language), compact IBANs,
and the UK 0xxxx-xxxxxx national phone family; the tier-3 shapes were
checked pairwise disjoint from every phone rule (card digit groups are
4/6/5 wide, a phone match needs a 3-digit group at a word boundary —
pinned in tests), so only the r12 e164-before-phone order pin remains
load-bearing. The compact-E.164 rule was simultaneously TIGHTENED
(round 13): left context restricted to start-of-string/whitespace via a
consumed-and-restored group (RE2 has no lookbehind) and the digit floor
raised 7→10, so '+'-prefixed dates/IDs like "+20250101" are no longer
deleted from the corpus. All patterns stay inside the Java∩RE2
replayable subset.

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
# Java-regex ∩ RE2 regular subset. ORDER: phone_e164 before phone is
# load-bearing (module docstring); the rest are non-overlapping.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # obfuscated tier: "user at example dot com" (one literal-word hop
    # per separator; recall over precision — docstring)
    (
        "email_obf",
        r"[A-Za-z0-9._%+-]+ at [A-Za-z0-9-]+ dot [A-Za-z]{2,}\b",
        "<EMAIL>",
    ),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # E.164, separated ("+1 555 123 4567", "+44-555-123-4567",
    # "+1.555.123.4567") — MUST precede the bare phone rule, whose 3-3-4
    # shape matches its tail; the separator class matches the bare
    # rule's exactly, else a dot-separated E.164 slips past this rule
    # and half-redacts to "+1.<PHONE>" (the hole the review found)
    ("phone_e164", r"\+\d{1,3}[-. ]\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    # E.164, compact ("+15551234567"). RE2 has no lookbehind, so the
    # left context is a CONSUMED group kept through the replacement ($1 —
    # Java syntax; _sql_redact rewrites it to RE2's \1). Floor raised
    # 7→10 digits (round 13): \+\d{7,15} redacted any '+'-prefixed
    # integer ('+20250101', a signed date/ID), deleting non-PII numeric
    # signal — real compact E.164 numbers carry a country code +
    # subscriber number and run 10+ digits. The context excludes ONLY a
    # preceding word character (an identifier-glued '+digits' is a
    # literal, not a number someone wrote down) — 'tel:+15551234567',
    # '(+447911123456)' and quoted forms still redact; a whitespace-only
    # context silently leaked every punctuation-adjacent number, and a
    # false negative is the costly direction here.
    ("phone_e164c", r"(^|[^\w])\+\d{10,15}\b", "$1<PHONE>"),
    # US paren shape "(555) 123-4567"
    ("phone_paren", r"\(\d{3}\) ?\d{3}[-. ]\d{4}\b", "<PHONE>"),
    # payment-card shapes (round 13, tier 3): 13-19 digits grouped
    # 4-4-4-(1..4), the long 4-4-4-4-(1..3) grouping (17-19 digit
    # Visa/UnionPay), and the amex 4-6-5 grouping, space or dash
    # separated. The LONG alternative comes first — Java and RE2
    # alternation are both leftmost-FIRST, so a 19-digit card must not
    # half-match as its 16-digit prefix and strand ' 567'. Shape-only
    # (no Luhn — a checksum is not expressible as a regular language);
    # grouped-only for precision: a bare 13-19 digit run is usually an
    # ID, not a card. Checked disjoint from every phone rule: a phone
    # match needs a 3-digit group at a word boundary followed by a
    # separator, and card digit groups are 4/6/5 wide (the 1-3 tail is
    # separator-bound to a 4-wide group), so neither can match inside
    # the other (pinned in tests/test_pii.py).
    (
        "ccard",
        r"\b(?:\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{1,3}"
        r"|\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{1,4}"
        r"|\d{4}[- ]\d{6}[- ]\d{5})\b",
        "<CC>",
    ),
    # bare 3-3-4 with -, ., or space separators
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    # one non-NANP national family (round 13, tier 3): UK 0xxxx xxxxxx
    # (leading trunk 0 + 4 digits, separator, 6 digits) — disjoint from
    # the NANP shapes (5-digit first group) and from ccard (4/6/5 groups)
    ("phone_uk", r"\b0\d{4}[ -]\d{6}\b", "<PHONE>"),
    # IBAN, compact form: country code + 2 check digits + 11-30
    # alphanumerics (ISO 13616 length bounds across registries)
    ("iban", r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b", "<IBAN>"),
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
    un-redacted text so they are replacement-order-independent (and
    therefore per-pattern, not disjoint — module docstring)."""
    src = F.col(col) if isinstance(col, str) else col
    return [
        (F.size(F.split(src, pat)) - 1).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_RULES
    ]


def _sql_redact(expr: str) -> str:
    for _, pat, repl in PII_RULES:
        # replacement backreference syntax differs per engine: Java
        # (Spark) writes $1, RE2 (DuckDB) writes \1 — same semantics
        duck_repl = repl.replace("$1", "\\1")
        expr = f"regexp_replace({expr}, '{pat}', '{duck_repl}', 'g')"
    return expr


def _sql_counts(expr: str) -> str:
    return ", ".join(
        f"CAST(length(regexp_split_to_array({expr}, '{pat}')) - 1 AS BIGINT)"
        f" AS n_{name}"
        for name, pat, _ in PII_RULES
    )


# The synthetic corpus is PII-free word salad, so the registered query
# INJECTS deterministic PII first — one shape per small prime slice of
# doc_id, mirrored verbatim in the oracle — the hash then proves real
# redactions of EVERY rule (injected hits > 0 per type at sf0.01), not a
# no-op pass. The injection is demo harness; the operators above are the
# product and take any text column.
_INJECT_SQL = (
    "text"
    " || CASE WHEN doc_id % 7 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)"
    " || '.0.1 inbound' ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN ' id 123-45-6789' ELSE '' END"
    " || CASE WHEN doc_id % 17 = 0 THEN ' call 555.123.4567' ELSE '' END"
    " || CASE WHEN doc_id % 19 = 0 THEN ' desk (555) 123-4567 ok' ELSE '' END"
    " || CASE WHEN doc_id % 23 = 0 THEN ' intl +1 555 123 4567 line' ELSE '' END"
    " || CASE WHEN doc_id % 29 = 0 THEN ' cell +447911123456 end' ELSE '' END"
    " || CASE WHEN doc_id % 31 = 0 THEN ' mail bob"
    " at example dot com soon' ELSE '' END"
    " || CASE WHEN doc_id % 37 = 0 THEN ' card 4111 1111 1111 1111 on file'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 41 = 0 THEN ' amex 3714-496353-98431 backup'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 43 = 0 THEN ' iban DE89370400440532013000 ref'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 47 = 0 THEN ' ring 07911 123456 today' ELSE '' END"
    " || CASE WHEN doc_id % 53 = 0 THEN ' tel:+15551234567 now' ELSE '' END"
    " || CASE WHEN doc_id % 59 = 0 THEN ' card 6212 3456 7890 1234 567 ok'"
    " ELSE '' END"
)


def _injected(d: DataFrame) -> DataFrame:
    did = F.col("doc_id").cast("string")

    def when_mod(m: int, *parts) -> Column:
        return F.when(F.col("doc_id") % m == 0, F.concat(*parts)).otherwise(
            F.lit("")
        )

    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            when_mod(7, F.lit(" reach user"), did, F.lit("@example.com now")),
            when_mod(
                11,
                F.lit(" from 10."),
                (F.col("doc_id") % 200).cast("string"),
                F.lit(".0.1 inbound"),
            ),
            when_mod(13, F.lit(" id 123-45-6789")),
            when_mod(17, F.lit(" call 555.123.4567")),
            when_mod(19, F.lit(" desk (555) 123-4567 ok")),
            when_mod(23, F.lit(" intl +1 555 123 4567 line")),
            when_mod(29, F.lit(" cell +447911123456 end")),
            when_mod(31, F.lit(" mail bob at example dot com soon")),
            when_mod(37, F.lit(" card 4111 1111 1111 1111 on file")),
            when_mod(41, F.lit(" amex 3714-496353-98431 backup")),
            when_mod(43, F.lit(" iban DE89370400440532013000 ref")),
            when_mod(47, F.lit(" ring 07911 123456 today")),
            when_mod(53, F.lit(" tel:+15551234567 now")),
            when_mod(59, F.lit(" card 6212 3456 7890 1234 567 ok")),
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
    PII covering every rule — see module comment), returning the
    redacted text plus the per-type compliance counts; hash-checked
    against DuckDB replaying the identical regex pipeline."""
    d = _injected(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        redact_text("t").alias("redacted"),
        *pii_counts("t"),
    ).orderBy("doc_id")
