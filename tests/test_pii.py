"""PII redaction contracts (``functions/pii.py``): completeness (no
typed pattern survives redaction), rule-order correctness (a dotted
phone must become <PHONE>, never a half-eaten <IP>), count semantics on
raw text, and NULL/empty safety."""

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


def test_rule_order_dotted_phone_not_ip(spark):
    """The IPv4 pattern matches inside a dotted phone; applying phone
    BEFORE ipv4 is what keeps '555.123.4567' a <PHONE>."""
    df = spark.createDataFrame(
        [("call 555.123.4567 now", 1), ("host 10.1.2.3 up", 2)], ["t", "i"]
    )
    got = {r.i: r.red for r in df.select("i", redact_text("t").alias("red")).collect()}
    assert got[1] == "call <PHONE> now"
    assert got[2] == "host <IP> up"


def test_counts_on_raw_text_and_null_safety(spark):
    df = spark.createDataFrame(
        [
            ("a@b.com and c@d.org", 1),
            ("", 2),
            (None, 3),
            ("no pii here", 4),
        ],
        ["t", "i"],
    )
    out = {
        r.i: (r.red, r.n_email)
        for r in df.select(
            "i", redact_text("t").alias("red"), *pii_counts("t")
        ).collect()
    }
    assert out[1] == ("<EMAIL> and <EMAIL>", 2)
    assert out[2] == ("", 0)
    assert out[3] == (None, None)  # ANSI: NULL text stays NULL throughout
    assert out[4] == ("no pii here", 0)
