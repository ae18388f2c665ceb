"""Differential harness mirroring the driver's t2 check: every
``queries()`` entry with an ``oracle_sql()`` twin must match DuckDB on
row count, column names, and an order-insensitive value multiset.

Floats are compared after rounding to 6 significant decimals — double
aggregation order differs legitimately between engines; anything beyond
that tolerance is a real bug.  Keys without an oracle get a rows-only
sanity check (runs, ≥0 rows, stable schema).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entrypoint

_QUERIES = entrypoint.queries()
_ORACLE = entrypoint.oracle_sql()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    """Comparable form of a cell; floats stay floats (tolerance-compared)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _sort_key_cell(v):
    """Cell form used only for row ordering: floats rounded hard so both
    engines order identically despite last-ulp differences."""
    if isinstance(v, float):
        return f"{v:.4e}"
    return repr(v)


def _cells_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-6)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = tuple(cols[i] for i in order)
    data = [tuple(_norm_cell(row[i]) for i in order) for row in rows]
    data.sort(key=lambda r: tuple(_sort_key_cell(c) for c in r))
    return names, data


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, sf_dir):
    sdf = _QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    if name not in _ORACLE:
        assert isinstance(scols, list) and len(scols) > 0
        assert len(srows) >= 0
        return

    con = _duck(sf_dir)
    res = con.execute(_ORACLE[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()

    s_names, s_data = _normalize(scols, srows)
    d_names, d_data = _normalize(dcols, drows)

    assert s_names == d_names, f"{name}: column names differ: {s_names} vs {d_names}"
    assert len(s_data) == len(d_data), (
        f"{name}: row count {len(s_data)} (spark) vs {len(d_data)} (duckdb)"
    )
    mismatches = [
        (i, a, b)
        for i, (a, b) in enumerate(zip(s_data, d_data))
        if not _cells_equal(a, b)
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row diffs; first: {mismatches[0]}"


def test_entry_smoke(spark):
    df = entrypoint.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"
