"""Property-based tests (Hypothesis) for the ingest literal pipeline:
arbitrary values survive dump-format serialization → parse → coercion.
Mirrors the reference's literal subset (number/string/bool/NULL + unary
minus, /root/reference/src/line_parser.rs:229–258) but proves it over the
whole space instead of one fixture."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mysqldump_to_parquet_spark.sources.mysqldump import (
    iter_statements,
    parse_insert,
)


def _sql_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "''")


texts = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\x00", exclude_categories=("Cs",)
    ),
    max_size=60,
)
values = st.one_of(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    texts,
    st.booleans(),
    st.none(),
)


def _to_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + _sql_escape(v) + "'"
    return repr(v)


@given(st.lists(st.lists(values, min_size=1, max_size=8), min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_insert_roundtrip(rows):
    # all rows padded to the widest row so it's a well-formed INSERT
    width = max(len(r) for r in rows)
    rows = [r + [None] * (width - len(r)) for r in rows]
    stmt = "INSERT INTO `t` VALUES " + ", ".join(
        "(" + ", ".join(_to_literal(v) for v in r) + ")" for r in rows
    ) + ";"
    table, parsed = parse_insert(stmt)
    assert table == "t"
    assert len(parsed) == len(rows)
    for got, want in zip(parsed, rows):
        for g, w in zip(got, want):
            if isinstance(w, float):
                assert isinstance(g, float) and (g == w or abs(g - w) < 1e-300)
            else:
                assert g == w, (g, w)


@given(texts)
@settings(max_examples=100, deadline=None)
def test_statement_reassembly_single_insert(s):
    stmt = f"INSERT INTO `t` VALUES ('{_sql_escape(s)}');"
    # newlines inside literals are escaped in real dumps; feed as one line
    out = list(iter_statements([stmt]))
    if "\n" not in stmt:
        assert out == [stmt]
