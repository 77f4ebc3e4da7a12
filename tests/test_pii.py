"""PII redaction contracts (``functions/pii.py``): completeness (no
typed pattern survives redaction), GENUINE rule-order dependence (the
bare phone rule matches the 3-3-4 tail inside a separated E.164 number —
e164-first is load-bearing, and swapping the pair demonstrably corrupts
the output), per-shape recall of the round-12 broadened tiers, count
semantics on raw text, and NULL/empty safety."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from pgcp_spark.functions.pii import (
    PII_RULES,
    pii_counts,
    redact_text,
    text_pii_redaction,
)
from tests.conftest import SF_DIR


def test_redaction_is_complete_and_counts_positive(spark):
    rows = text_pii_redaction(spark, SF_DIR).collect()
    assert rows
    pats = {name: re.compile(pat) for name, pat, _ in PII_RULES}
    totals = {name: 0 for name in pats}
    for r in rows:
        for name, cre in pats.items():
            assert not cre.search(r.redacted), (name, r.redacted)
            totals[name] += r[f"n_{name}"]
    # the deterministic injection guarantees every type actually fired
    for name, total in totals.items():
        assert total > 0, f"no {name} injected/redacted"


def test_rule_order_e164_before_bare_phone_is_load_bearing(spark):
    """The one genuinely overlapping pair: '+1 555 123 4567' contains the
    bare 3-3-4 match '555 123 4567'. In PII_RULES order the whole number
    becomes one <PHONE>; with the pair swapped, the bare rule eats the
    tail first and leaves '+1 <PHONE>' — proving the ordering test means
    something (the round-11 ipv4-inside-dotted-phone rationale was false:
    an IPv4 needs three dots and 1-3-digit octets, a dotted phone has
    two separators and a 4-digit tail — those two can never overlap)."""
    df = spark.createDataFrame([("intl +1 555 123 4567 line",)], ["t"])
    assert (
        df.select(redact_text("t").alias("r")).collect()[0].r
        == "intl <PHONE> line"
    )
    # swapped order: bare phone first — demonstrably different (wrong)
    swapped = F.col("t")
    for name, pat, repl in sorted(
        PII_RULES, key=lambda r: {"phone": 0, "phone_e164": 1}.get(r[0], 2)
    ):
        swapped = F.regexp_replace(swapped, pat, repl)
    assert (
        df.select(swapped.alias("r")).collect()[0].r == "intl +1 <PHONE> line"
    )


def test_dotted_phone_is_phone_never_ip(spark):
    """Behavioral pin (order-independent — the patterns cannot overlap):
    a dotted phone redacts as <PHONE>, a real IPv4 as <IP>."""
    df = spark.createDataFrame(
        [("call 555.123.4567 now", 1), ("host 10.1.2.3 up", 2)], ["t", "i"]
    )
    got = {r.i: r.red for r in df.select("i", redact_text("t").alias("red")).collect()}
    assert got[1] == "call <PHONE> now"
    assert got[2] == "host <IP> up"


def test_broadened_shapes_redact(spark):
    """Round-12 recall tiers: paren phone, space-separated bare phone,
    separated + compact E.164, obfuscated email — each redacts fully and
    a near-miss stays untouched."""
    cases = {
        1: ("desk (555) 123-4567 ok", "desk <PHONE> ok"),
        2: ("raw 555 123 4567 ok", "raw <PHONE> ok"),
        3: ("cell +447911123456 end", "cell <PHONE> end"),
        7: ("fax +1.555.123.4567 sent", "fax <PHONE> sent"),  # dot-separated
        #    E.164 must redact WHOLE, never half to '+1.<PHONE>' (review fix)
        4: ("mail bob at example dot com soon", "mail <EMAIL> soon"),
        # near-misses: 3-2-4 with spaces is not a phone (nor an SSN —
        # SSN requires dashes); a short +digits run is not E.164
        5: ("code 555 12 4567 left", "code 555 12 4567 left"),
        6: ("plus +123456 short", "plus +123456 short"),
    }
    df = spark.createDataFrame([(t, i) for i, (t, _) in cases.items()], ["t", "i"])
    got = {r.i: r.red for r in df.select("i", redact_text("t").alias("red")).collect()}
    for i, (_, want) in cases.items():
        assert got[i] == want, (i, got[i])


def test_tier3_shapes_redact(spark):
    """Round-13 tier 3: grouped payment cards (4-4-4-4 and amex 4-6-5),
    compact IBAN, UK national phone — each redacts fully; shape
    near-misses (bare 16-digit run, too-short IBAN tail, UK number with
    a 4-digit trunk group) stay untouched."""
    cases = {
        1: ("card 4111 1111 1111 1111 on file", "card <CC> on file"),
        2: ("amex 3714-496353-98431 backup", "amex <CC> backup"),
        3: ("iban DE89370400440532013000 ref", "iban <IBAN> ref"),
        4: ("ring 07911 123456 today", "ring <PHONE> today"),
        # near-misses: bare digit runs are IDs, not cards (grouped-only
        # precision rule); IBAN needs >= 11 alnum after the check digits;
        # UK trunk group is exactly 0+4 digits
        5: ("id 4111111111111111 raw", "id 4111111111111111 raw"),
        6: ("ref DE8912345 short", "ref DE8912345 short"),
        7: ("num 0791 123456 odd", "num 0791 123456 odd"),
    }
    df = spark.createDataFrame([(t, i) for i, (t, _) in cases.items()], ["t", "i"])
    got = {r.i: r.red for r in df.select("i", redact_text("t").alias("red")).collect()}
    for i, (_, want) in cases.items():
        assert got[i] == want, (i, got[i])


def test_e164_compact_tightened_left_context_and_floor(spark):
    """Round-13 ADVICE fix: the compact rule no longer fires on
    '+'-prefixed short integers or on '+' glued to a preceding word, and
    the consumed whitespace left-context is restored by the replacement
    (no character deleted around the placeholder)."""
    cases = {
        1: ("on +20250101 we", "on +20250101 we"),  # 8 digits: signed date
        2: ("sum +123456789 t", "sum +123456789 t"),  # 9 digits: below floor
        3: ("id x+12345678901 t", "id x+12345678901 t"),  # glued to a word
        4: ("cell +12345678901 t", "cell <PHONE> t"),  # space restored
        5: ("+12345678901 leads", "<PHONE> leads"),  # start-of-string
        # review fix: the context excludes only WORD chars — punctuation-
        # adjacent compact numbers must still redact (a whitespace-only
        # context silently leaked all of these)
        6: ("tel:+15551234567 now", "tel:<PHONE> now"),
        7: ("(+447911123456) t", "(<PHONE>) t"),
        8: ('she said "+15551234567"', 'she said "<PHONE>"'),
    }
    df = spark.createDataFrame([(t, i) for i, (t, _) in cases.items()], ["t", "i"])
    got = {r.i: r.red for r in df.select("i", redact_text("t").alias("red")).collect()}
    for i, (_, want) in cases.items():
        assert got[i] == want, (i, got[i])


def test_card_and_phone_rules_are_mutually_disjoint(spark):
    """The load-bearing check for the tier-3 order: card digit groups
    are 4/6/5 wide and a phone match needs a 3-digit group at a word
    boundary, so neither family can match INSIDE the other's shape —
    the ccard-before-phone order in PII_RULES is free, and this pin
    proves it by applying each family alone."""
    card_texts = ["4111 1111 1111 1111", "3714-496353-98431", "1234 5678 9012 345"]
    phone_texts = ["555 123 4567", "555.123.4567", "07911 123456"]
    rules = {name: (pat, repl) for name, pat, repl in PII_RULES}
    phone_pats = [
        re.compile(rules[n][0]) for n in ("phone", "phone_paren", "phone_uk")
    ]
    card_pat = re.compile(rules["ccard"][0])
    for t in card_texts:
        for p in phone_pats:
            assert not p.search(t), (t, p.pattern)
    for t in phone_texts:
        assert not card_pat.search(t), t


def test_counts_on_raw_text_and_null_safety(spark):
    df = spark.createDataFrame(
        [
            ("a@b.com and c@d.org", 1),
            ("", 2),
            (None, 3),
            ("no pii here", 4),
            # raw-count convention: the separated E.164 hits BOTH e164
            # and the bare phone pattern on raw text (module docstring)
            ("intl +1 555 123 4567 line", 5),
        ],
        ["t", "i"],
    )
    out = {
        r.i: (r.red, r.n_email, r.n_phone_e164, r.n_phone)
        for r in df.select(
            "i", redact_text("t").alias("red"), *pii_counts("t")
        ).collect()
    }
    assert out[1] == ("<EMAIL> and <EMAIL>", 2, 0, 0)
    assert out[2] == ("", 0, 0, 0)
    assert out[3] == (None, None, None, None)  # ANSI: NULL stays NULL
    assert out[4] == ("no pii here", 0, 0, 0)
    assert out[5] == ("intl <PHONE> line", 0, 1, 1)


def test_long_card_groupings_redact_whole(spark):
    """Review fix: 17-19 digit grouped cards (4-4-4-4-(1..3)) redact as
    ONE token — the 16-digit prefix must not half-match and strand the
    tail group (leftmost-first alternation, long form first)."""
    cases = {
        1: ("c 6212 3456 7890 1234 567 ok", "c <CC> ok"),  # 19-digit
        2: ("c 5019-7170-1010-3742-00 ok", "c <CC> ok"),  # 18-digit dashes
        3: ("c 4111 1111 1111 1111 ok", "c <CC> ok"),  # 16 still whole
        4: ("c 4111 1111 1111 1 ok", "c <CC> ok"),  # 13-digit 4-4-4-1
    }
    df = spark.createDataFrame([(t, i) for i, (t, _) in cases.items()], ["t", "i"])
    got = {r.i: r.red for r in df.select("i", redact_text("t").alias("red")).collect()}
    for i, (_, want) in cases.items():
        assert got[i] == want, (i, got[i])
