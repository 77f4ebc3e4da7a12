"""Unit contracts for the parallel-read predicate generator
(``pg/partition.py``): probe boundedness, numeric strides, sampled
text/uuid boundaries (exhaustive + disjoint by construction, boundary
dedup under heavy duplication, thin-sample escalation), and the
orchestration fallbacks. Live end-to-end coverage (real uuid-PK copy,
skew balance) lives in tests/test_pg_live.py."""

from __future__ import annotations

import re

from pgcp_spark.pg import catalog as cat
from pgcp_spark.pg.partition import (
    numeric_range_predicates,
    partition_predicates,
    pk_leading_column,
    probe_is_small,
    sampled_range_predicates,
)

COLS = [
    cat.ColumnDef("id", "uuid", False),
    cat.ColumnDef("n", "bigint", False),
    cat.ColumnDef("t", "text", True),
]
PK_UUID = [cat.IndexDef("p", ("id",), unique=True, primary=True)]
PK_NUM = [cat.IndexDef("p", ("n", "id"), unique=True, primary=True)]


class FakeFetch:
    """Answers the three query shapes partition.py issues; records SQL."""

    def __init__(
        self, probe_n=10**6, bounds=(1, 100), sample=None, full=None, relpages=10**6
    ):
        self.probe_n, self.bounds = probe_n, bounds
        self.sample, self.full = sample or [], full or []
        self.relpages = relpages
        self.calls: list[str] = []

    def __call__(self, sql: str) -> list:
        s = " ".join(sql.split())
        self.calls.append(s)
        if "LIMIT" in s and "COUNT(*)" in s and "probe" in s:
            return [(self.probe_n,)]
        if "relpages FROM pg_class" in s:
            return [(self.relpages,)]
        if s.startswith("SELECT MIN("):
            return [self.bounds]
        if "percentile_disc" in s and "TABLESAMPLE" in s:
            # a healthy sample unless the test provides a thin one
            n = 10_000 if len(self.sample) > 1 else len(self.sample)
            return [(lit, n) for lit in self.sample]
        if "percentile_disc" in s:
            return [(lit, 10**6) for lit in self.full]
        raise AssertionError(f"unexpected fetch: {s}")


def _covers_all_and_disjoint(preds, values):
    """Every value lands in exactly one predicate (predicates are simple
    enough to eval with a tiny interpreter)."""
    def hits(pred, v):
        n = 0
        for clause in [pred]:
            lit = f"'{v}'"
            m = re.fullmatch(r"id < '([^']*)'", clause)
            if m:
                return v < m.group(1)
            m = re.fullmatch(r"id >= '([^']*)' AND id < '([^']*)'", clause)
            if m:
                return m.group(1) <= v < m.group(2)
            m = re.fullmatch(r"id >= '([^']*)'", clause)
            if m:
                return v >= m.group(1)
            raise AssertionError(clause)
        return n
    for v in values:
        assert sum(1 for p in preds if hits(p, v)) == 1, (v, preds)


def test_probe_is_bounded_limit_not_full_count():
    f = FakeFetch(probe_n=501)
    assert not probe_is_small(f, "s.t", None, 500)
    assert "LIMIT 501" in f.calls[0]
    f2 = FakeFetch(probe_n=400)
    assert probe_is_small(f2, "s.t", "x > 0", 500)
    assert "WHERE x > 0" in f2.calls[0]


def test_numeric_strides_cover_range():
    f = FakeFetch(bounds=(1, 100))
    preds = numeric_range_predicates(f, "s.t", "n", 4, None)
    assert len(preds) == 4
    # exhaustive + disjoint over [1, 100]
    for v in (1, 25, 26, 50, 99, 100):
        assert sum(1 for p in preds if eval(p.replace("n", str(v)).replace("AND", "and"))) == 1
    # degenerate bounds → None (single stream)
    assert numeric_range_predicates(FakeFetch(bounds=(7, 7)), "s.t", "n", 4, None) is None
    assert numeric_range_predicates(FakeFetch(bounds=(None, None)), "s.t", "n", 4, None) is None


def test_sampled_boundaries_exhaustive_disjoint_and_deduped():
    f = FakeFetch(sample=["'g'", "'g'", "'p'"])  # duplicated boundary
    preds = sampled_range_predicates(f, "s.t", "id", 4, None)
    # dedup: 2 distinct boundaries → 3 ranges, open ends both sides
    assert preds == ["id < 'g'", "id >= 'g' AND id < 'p'", "id >= 'p'"]
    _covers_all_and_disjoint(preds, ["a", "g", "gz", "p", "pz", "zz", ""])


def test_thin_sample_escalates_to_exact_percentiles():
    f = FakeFetch(sample=["'x'"], full=["'b'", "'m'", "'t'"])
    preds = sampled_range_predicates(f, "s.t", "id", 4, None)
    assert preds[0] == "id < 'b'" and preds[-1] == "id >= 't'"
    assert len(preds) == 4
    assert any("TABLESAMPLE" in c for c in f.calls)
    assert any("percentile_disc" in c and "TABLESAMPLE" not in c for c in f.calls)


def test_orchestration_small_table_and_no_pk_fall_back():
    assert pk_leading_column([], COLS) is None
    assert pk_leading_column(PK_UUID, COLS) == ("id", False)
    assert pk_leading_column(PK_NUM, COLS) == ("n", True)
    # small table → None regardless of PK type
    f = FakeFetch(probe_n=10)
    assert partition_predicates(f, "s.t", "id", False, 8, None, 100) is None
    # n < 2 → None without any query
    f2 = FakeFetch()
    assert partition_predicates(f2, "s.t", "id", False, 1, None, 100) is None
    assert f2.calls == []
    # probe disabled (0) goes straight to boundary sampling
    f3 = FakeFetch(sample=["'m'"] + ["'x'"] * 0, full=["'m'"])
    preds = partition_predicates(f3, "s.t", "id", False, 2, None, 0)
    assert preds == ["id < 'm'", "id >= 'm'"]
    assert not any("probe" in c for c in f3.calls)


def test_degenerate_key_returns_none():
    # every sampled boundary identical and the exact pass agrees → after
    # dedup one boundary still yields 2 ranges; a fully empty boundary
    # set yields None
    f = FakeFetch(sample=[], full=[])
    assert sampled_range_predicates(f, "s.t", "id", 4, None) is None


def test_small_relpages_goes_straight_to_exact_percentiles():
    """SYSTEM sampling is page-level: on a small table one sampled page
    yields boundaries from a contiguous key cluster (badly unbalanced
    ranges). Below the exact threshold no TABLESAMPLE query is issued."""
    f = FakeFetch(full=["'b'", "'m'", "'t'"], relpages=100)
    preds = sampled_range_predicates(f, "s.t", "id", 4, None)
    assert len(preds) == 4
    assert not any("TABLESAMPLE" in c for c in f.calls)
