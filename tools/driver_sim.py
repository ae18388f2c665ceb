#!/usr/bin/env python
"""Driver-faithful correctness simulation: run every (or a chosen subset
of) ``queries()`` entry against its ``oracle_sql()`` twin at sf0.01 and
compare EXACT canonical values — no float rounding tolerance, None/NaN
unified, temporal types normalized to ISO strings.

This is the pre-submission gate that catches the two failure classes the
local pytest harness historically let through to the driver:

* float-accumulation hash drift (q_sessionize, round 2) — floats here are
  compared by ``repr`` (bit-exact);
* unhashable complex-typed output columns (q_embed_centroids, round 2) —
  any array/map/struct/binary column in an oracle-paired query is flagged
  before the driver ever sees it.

Usage::

    python tools/driver_sim.py              # all never-driver-verified keys
    python tools/driver_sim.py --all        # every oracle-paired key
    python tools/driver_sim.py q_foo q_bar  # specific keys
"""

from __future__ import annotations

import datetime
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


def canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return repr(v)  # bit-exact — the driver hashes exact values
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%dT00:00:00.000000")
    try:
        if pd.isna(v):
            return "<NULL>"
    except Exception:
        pass
    return str(v)


def main() -> int:
    from pyspark.sql import types as T

    from mysqldump_to_parquet_spark.session import get_spark

    import __spark_entry__ as ep

    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    q, o = ep.queries(), ep.oracle_sql()
    if args:
        names = args
    elif "--all" in sys.argv:
        names = [k for k in q if k in o]
    else:
        names = [k for k in q if k not in ep._VERIFIED and k in o]

    spark = get_spark(app_name="driver-sim")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    complex_types = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
    fails = 0
    for name in names:
        try:
            sdf = q[name](spark, sf)
            for f in sdf.schema.fields:
                if isinstance(f.dataType, complex_types):
                    raise TypeError(
                        f"column {f.name!r} is {f.dataType.simpleString()} — "
                        "unhashable in the driver canonicalizer; serialize it"
                    )
            cols = sorted(sdf.columns)
            s = sorted(tuple(canon(r[c]) for c in cols) for r in sdf.collect())
            sel = ", ".join(f'"{c}"' for c in cols)  # "offset" etc. are
            d = sorted(                              # reserved words
                tuple(canon(v) for v in row)
                for row in con.execute(
                    f"SELECT {sel} FROM ({o[name]}) t"
                ).fetchall()
            )
            if s != d:
                fails += 1
                bad = next(
                    ((x, y) for x, y in zip(s, d) if x != y),
                    ("row-count", (len(s), len(d))),
                )
                print(f"FAIL {name}: {str(bad)[:300]}")
            else:
                print(f"ok   {name} ({len(s)} rows)")
        except Exception as e:  # noqa: BLE001 — report and continue
            fails += 1
            print(f"ERR  {name}: {str(e)[:200]}")
    print(f"\nchecked {len(names)}, failures {fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
