#!/usr/bin/env python
"""Driver-faithful correctness simulation: run every (or a chosen subset
of) ``queries()`` entry against its ``oracle_sql()`` twin at sf0.01 and
compare canonical values the way the driver does — through the *pandas*
conversion path (``spark_df.toPandas()`` vs ``duckdb .df()``), not
``collect()``.

Why pandas, not collect: round 3 proved the driver canonicalizes via a
pandas path where engine-specific dtype conversions bite.  Two red
driver rows passed the old collect()-based sim:

* ``q_src_dump_datasource`` — DuckDB's ``.df()`` converts DECIMAL to
  float64 (``120.5``) while Spark's ``toPandas()`` keeps
  ``Decimal('120.50')``; stringified, those hash differently even
  though ``collect()`` values were identical.
* ``q_sessionize`` — ``ROUND(SUM(double))`` is order-sensitive near a
  rounding boundary; the local run happened to match, the driver's
  partitioning did not.

This sim therefore runs TWO checks per key:

1. **pandas-canonical equality** — both sides converted to pandas and
   stringified per-cell with NO type bridging (a Decimal stays
   ``str(Decimal)``, a float stays ``repr(float)``); any dtype drift
   between the engines' pandas bridges surfaces as a failure.
2. **partition-stability** — the Spark query is re-run under a
   deliberately different layout (different ``shuffle.partitions``,
   AQE coalescing flipped) and the canonical output must be
   bit-identical.  Order-sensitive float accumulation that happens to
   match the oracle under one layout fails here.

Also flags any array/map/struct/binary column in an oracle-paired
query (unhashable in the driver canonicalizer).

Usage::

    python tools/driver_sim.py              # all never-driver-verified keys
    python tools/driver_sim.py --all        # every oracle-paired key
    python tools/driver_sim.py --fast       # skip the stability re-run
    python tools/driver_sim.py q_foo q_bar  # specific keys
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon_cell(v) -> str:
    """Stringify one pandas cell with no cross-type bridging.

    Deliberately does NOT unify Decimal with float or int with float:
    if the two engines' pandas bridges produce different dtypes for the
    same logical value, that is exactly the mismatch the driver hashes
    on, and it must surface here.
    """
    if v is None or v is pd.NaT:
        return "<NULL>"
    if isinstance(v, float):
        return "<NULL>" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        return "decimal:" + str(v)
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "<NULL>"
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%dT00:00:00.000000")
    try:
        if pd.isna(v):
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_pdf(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """Sorted canonical rows of a pandas frame, columns sorted by name."""
    cols = sorted(pdf.columns)
    out = [
        tuple(canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    out.sort()
    return out


def spark_canon(
    q, spark, sf: str, *, oracle_paired: bool = True
) -> tuple[list[tuple[str, ...]], list[str]]:
    """(canonical rows, column names) — one build per call: iterative
    builders (BPE, kmeans, weighted-median sketch) execute real Spark
    jobs at build time, so the caller must never rebuild just to read
    ``.columns``.

    The complex-type guard (array/map/struct/binary is unhashable in the
    driver canonicalizer) is hard only for oracle-paired keys: the
    driver's rows-only check counts rows without hashing values, so a
    complex column there is a warning, not a failure (ADVICE r4)."""
    from pyspark.sql import types as T

    sdf = q(spark, sf)
    complex_types = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
    for f in sdf.schema.fields:
        if isinstance(f.dataType, complex_types):
            msg = (
                f"column {f.name!r} is {f.dataType.simpleString()} — "
                "unhashable in the driver canonicalizer; serialize it"
            )
            if oracle_paired:
                raise TypeError(msg)
            print(f"warn {msg} (rows-only key: driver counts rows only)")
    return canon_pdf(sdf.toPandas()), list(sdf.columns)


def main() -> int:
    from mysqldump_to_parquet_spark.session import get_spark

    import __spark_entry__ as ep

    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    fast = "--fast" in sys.argv
    q, o = ep.queries(), ep.oracle_sql()
    if args:
        names = args
    elif "--all" in sys.argv:
        names = list(q)
    else:
        names = [k for k in q if k not in ep._VERIFIED]

    spark = get_spark(app_name="driver-sim")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    fails = 0
    for name in names:
        try:
            if name not in o:
                # rows-only key: the driver still RUNS it (a raising
                # query is a red row) — execute; complex-typed output is
                # a warning here, not a failure (driver counts rows only)
                s, _ = spark_canon(q[name], spark, sf, oracle_paired=False)
                print(f"ok   {name} (rows-only, {len(s)} rows)")
                continue
            s, columns = spark_canon(q[name], spark, sf)
            cols = sorted(columns)
            sel = ", ".join(f'"{c}"' for c in cols)  # "offset" etc. are
            d = canon_pdf(                           # reserved words
                con.execute(f"SELECT {sel} FROM ({o[name]}) t").df()
            )
            if s != d:
                fails += 1
                bad = next(
                    ((x, y) for x, y in zip(s, d) if x != y),
                    ("row-count", (len(s), len(d))),
                )
                print(f"FAIL {name} (pandas-canon): {str(bad)[:300]}")
                continue
            if not fast:
                # stability re-run: different partitioning must not
                # change a single canonical byte
                alt = dict(
                    [("spark.sql.shuffle.partitions", "7"),
                     ("spark.sql.adaptive.coalescePartitions.enabled",
                      "false"),
                     # small scan splits: different file-partition layout
                     # → different accumulation order at the SOURCE, not
                     # just across the shuffle
                     ("spark.sql.files.maxPartitionBytes", "1m")]
                )
                saved = {k: spark.conf.get(k) for k in alt}
                try:
                    for k, v in alt.items():
                        spark.conf.set(k, v)
                    s2, _ = spark_canon(q[name], spark, sf)
                finally:
                    for k, v in saved.items():
                        spark.conf.set(k, v)
                if s2 != s:
                    fails += 1
                    bad = next(
                        ((x, y) for x, y in zip(s2, s) if x != y),
                        ("row-count", (len(s2), len(s))),
                    )
                    print(f"FAIL {name} (partition-unstable): {str(bad)[:300]}")
                    continue
            print(f"ok   {name} ({len(s)} rows)")
        except Exception as e:  # noqa: BLE001 — report and continue
            fails += 1
            print(f"ERR  {name}: {str(e)[:200]}")
    print(f"\nchecked {len(names)}, failures {fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
