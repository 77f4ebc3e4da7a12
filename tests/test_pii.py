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
