#!/usr/bin/env python
"""Dump .explain("formatted") for bench queries into plans/<round>/.

    python tools/dump_plans.py r16 before           # all bench queries
    python tools/dump_plans.py r16 after q_foo ...  # just the named ones

Plans are captured lazily (no execution) at the bench's sf0.1 / 32-core
configuration so Exchange counts, join strategies and PushedFilters match
what bench.py actually runs.  Unknown query names are reported against
the registry up front (ADVICE r15) instead of dying on a KeyError
mid-dump.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysqldump_to_parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit("usage: dump_plans.py <round> <suffix> [names...]")
    rnd, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]

    import __spark_entry__ as entrypoint
    from bench import BENCH_QUERY_NAMES

    registry = entrypoint.queries()
    if names:
        unknown = [n for n in names if n not in registry]
        if unknown:
            raise SystemExit(
                f"unknown query names (not in the registry): {unknown}"
            )
    else:
        names = [n for n in BENCH_QUERY_NAMES if n in registry]

    spark = get_spark(
        app_name="dump-plans", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        rnd,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = registry[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
